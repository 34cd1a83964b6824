"""Tokenizer parity: our WordPiece == transformers.BertTokenizerFast.

With no network, the real bert-base-uncased vocab.txt can't be shipped; this
proves the ALGORITHM is identical on a local fixture vocab, so dropping in
the real vocab.txt (UNINEXT_BERT_VOCAB) reproduces the reference's
tokenization (uninext_img.py:134) exactly — ids, truncation, and the char
offsets that build positive maps."""
import os

import numpy as np
import pytest

from uninext_tpu.data.tokenizer import BertTokenizer

FIXTURE_WORDS = [
    "the", "a", "person", "cat", "dog", "##s", "play", "##ing", "run",
    "##ner", "bi", "##cy", "##cle", "with", "red", "um", "##brella", ".",
    ",", "?", "!", "woman", "man", "on", "left", "right", "holding",
    "frisbee", "bear", "zebra", "giraffe", "skate", "##board", "surf",
    "traffic", "light", "fire", "hyd", "##rant", "stop", "sign", "parking",
    "meter", "bench", "bird", "horse", "sheep", "cow", "elephant", "in",
    "wearing", "blue", "shirt", "jacket", "second", "from", "##e", "##d",
    "##n", "##t", "##r", "##er", "guy", "girl", "boy", "kid", "middle",
    "front", "behind", "next", "to", "of", "white", "black", "green",
    "tennis", "racket", "##et", "bottle", "wine", "glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot", "pizza", "donut", "cake", "chair", "couch",
    "potted", "plant", "bed", "dining", "table", "toilet", "tv", "laptop",
    "mouse", "remote", "keyboard", "cell", "phone", "microwave", "oven",
    "toaster", "sink", "refrigerator", "book", "clock", "vase", "scissors",
    "teddy", "hair", "drier", "toothbrush", "##风", "风",
]


@pytest.fixture(scope="module")
def vocabs(tmp_path_factory):
    vocab = (["[PAD]"] + [f"[unused{i}]" for i in range(99)]
             + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"] + FIXTURE_WORDS)
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(vocab))
    from transformers import BertTokenizerFast
    hf = BertTokenizerFast(vocab_file=str(p), do_lower_case=True)
    ours = BertTokenizer(vocab_file=str(p))
    return hf, ours


PROMPTS = [
    "person. cat. dog. traffic light. fire hydrant. stop sign.",
    "A woman holding a red umbrella on the left",
    "the guy in the blue shirt playing tennis",
    "bicycles, skateboards and surfboards!",
    "second person from the right wearing a black jacket",
    "runner with    extra   spaces",
    "CaT and DOG?",
    "unknownword xyzzyqq then cat",
    "café person",                      # accent stripping
    "风 cat 风",                         # CJK isolation
    "word" * 40 + " cat",               # >100-char word -> UNK
    ". , ? ! cat",
    "",
    "   ",
]


@pytest.mark.parametrize("text", PROMPTS)
def test_ids_match_hf(vocabs, text):
    hf, ours = vocabs
    enc_hf = hf(text, max_length=64, padding="max_length", truncation=True)
    enc = ours(text, max_length=64)
    assert enc["input_ids"].tolist() == enc_hf["input_ids"], text
    assert enc["attention_mask"].tolist() == enc_hf["attention_mask"], text


@pytest.mark.parametrize("text", PROMPTS)
def test_offsets_match_hf(vocabs, text):
    hf, ours = vocabs
    enc_hf = hf(text, max_length=64, padding="max_length", truncation=True,
                return_offsets_mapping=True)
    enc = ours(text, max_length=64)
    n = int(np.sum(enc["attention_mask"]))
    got = [tuple(o) for o in enc["offsets"][:n]]
    want = [tuple(o) for o in enc_hf["offset_mapping"][:n]]
    assert got == want, (text, got, want)


def test_char_to_token_positive_map(vocabs):
    """char_to_token covers exactly each token's span — the GLIP positive-map
    contract (create_positive_map uses char_to_token(beg), (end-1))."""
    hf, ours = vocabs
    text = "the woman on the left holding a red umbrella"
    enc = ours(text, max_length=64)
    # "umbrella" spans chars 36..44 -> tokens for 'um' and '##brella'
    beg = text.index("umbrella")
    t0 = enc["char_to_token"][beg]
    t1 = enc["char_to_token"][beg + len("umbrella") - 1]
    assert t0 > 0 and t1 >= t0
    ids = enc["input_ids"]
    hf_tokens = hf.convert_ids_to_tokens([ids[t0], ids[t1]])
    assert hf_tokens == ["um", "##brella"]


def test_truncation_matches_hf(vocabs):
    hf, ours = vocabs
    text = " ".join(["person cat dog"] * 40)
    enc_hf = hf(text, max_length=32, padding="max_length", truncation=True)
    enc = ours(text, max_length=32)
    assert enc["input_ids"].tolist() == enc_hf["input_ids"]
