"""Self-contained BERT-style WordPiece tokenizer (host-side, no network).

Replaces the reference's HuggingFace AutoTokenizer("bert-base-uncased")
(uninext_img.py:134). Implements the standard BERT basic+wordpiece algorithm
with `char_to_token` tracking (needed for positive-map construction,
coco_dataset_mapper_uni.py:687).

Vocab: pass a real bert-base-uncased vocab.txt for checkpoint parity. With no
vocab file (this sandbox has no network), a deterministic hash vocab is used:
every whole word maps to a stable id in [1000, vocab_size) — fine for
training-from-scratch and for all pipeline/shape correctness, NOT for loading
pretrained BERT weights meaningfully.
"""
from __future__ import annotations

import hashlib
import os
import unicodedata
from typing import Dict, List, Optional, Tuple

import numpy as np

PAD, CLS, SEP, UNK, MASK = "[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"
SPECIAL_IDS = {PAD: 0, UNK: 100, CLS: 101, SEP: 102, MASK: 103}


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


class BertTokenizer:
    def __init__(self, vocab_file: Optional[str] = None,
                 vocab_size: int = 30522, lowercase: bool = True):
        self.lowercase = lowercase
        self.vocab_size = vocab_size
        self.vocab: Optional[Dict[str, int]] = None
        if vocab_file is None:
            vocab_file = os.environ.get("UNINEXT_BERT_VOCAB")
        if vocab_file and os.path.exists(vocab_file):
            with open(vocab_file) as f:
                self.vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}

    # -- basic tokenization with char offsets -------------------------------
    def _basic(self, text: str) -> List[Tuple[str, int, int]]:
        """Whitespace+punct split -> [(token, char_start, char_end)]."""
        out = []
        i = 0
        n = len(text)
        while i < n:
            ch = text[i]
            if ch.isspace():
                i += 1
                continue
            if _is_punct(ch):
                out.append((ch, i, i + 1))
                i += 1
                continue
            j = i
            while j < n and not text[j].isspace() and not _is_punct(text[j]):
                j += 1
            out.append((text[i:j], i, j))
            i = j
        return out

    def _wordpiece(self, word: str) -> List[str]:
        if self.vocab is None:
            return [word]     # hash vocab: whole words
        pieces = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def _piece_id(self, piece: str) -> int:
        if self.vocab is not None:
            return self.vocab.get(piece, SPECIAL_IDS[UNK])
        if piece in SPECIAL_IDS:
            return SPECIAL_IDS[piece]
        h = int(hashlib.md5(piece.encode()).hexdigest()[:8], 16)
        return 1000 + h % (self.vocab_size - 1000)

    def __call__(self, text: str, max_length: int = 256):
        """Returns dict with input_ids, attention_mask (np.int32 arrays of
        length max_length) and char_to_token mapping."""
        if self.lowercase:
            text = text.lower()
        words = self._basic(text)
        ids = [SPECIAL_IDS[CLS]]
        # char_to_token[c] = token index covering char c (or -1)
        char_to_token = np.full(max(len(text), 1), -1, np.int64)
        for word, s, e in words:
            pieces = self._wordpiece(word)
            # distribute the word's char span across its pieces (approximates
            # HF's exact per-piece offsets; identical for 1-piece words)
            k = len(pieces)
            for pi, piece in enumerate(pieces):
                if len(ids) >= max_length - 1:
                    break
                ps = s + (e - s) * pi // k
                pe = s + (e - s) * (pi + 1) // k if pi < k - 1 else e
                char_to_token[ps:pe] = len(ids)
                ids.append(self._piece_id(piece))
        ids.append(SPECIAL_IDS[SEP])
        ids = ids[:max_length]
        attn = [1] * len(ids)
        pad = max_length - len(ids)
        input_ids = np.array(ids + [0] * pad, np.int32)
        attention_mask = np.array(attn + [0] * pad, np.int32)
        return {"input_ids": input_ids, "attention_mask": attention_mask,
                "char_to_token": char_to_token}
