"""Checkpoint converter: synthetic reference-named state_dict -> our tree."""
import numpy as np
import jax
import pytest

from test_model import small_cfg, make_batch
from uninext_tpu.engine.convert import convert_checkpoint
from uninext_tpu.models.detr import UninextDETR


@pytest.fixture(scope="module")
def param_tree():
    cfg = small_cfg()
    model = UninextDETR(cfg)
    images, img_mask, sizes, tids, tmask, targets = make_batch(0)
    params = jax.eval_shape(
        lambda r: model.init({"params": r, "dn": jax.random.PRNGKey(1)},
                             images, img_mask, sizes, tids, tmask,
                             task="detection", targets=targets, train=True),
        jax.random.PRNGKey(0))
    return jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                        params)["params"]


def test_convert_lands_values(param_tree):
    rng = np.random.RandomState(0)
    tree = param_tree

    def t_lin(dst_kernel):  # torch linear weight for a flax kernel
        return rng.randn(*dst_kernel.shape[::-1]).astype(np.float32)

    sd = {}
    # encoder layer 0 ffn
    k = tree["transformer"]["encoder_layer_0"]["linear1"]["kernel"]
    sd["detr.detr.transformer.encoder.layers.0.linear1.weight"] = t_lin(k)
    sd["detr.detr.transformer.encoder.layers.0.norm1.weight"] = rng.randn(
        *tree["transformer"]["encoder_layer_0"]["norm1"]["scale"].shape
    ).astype(np.float32)
    # decoder self-attn in_proj
    q = tree["transformer"]["decoder_layer_0"]["self_attn"]["q_proj"]["kernel"]
    d = q.shape[0]
    sd["detr.detr.transformer.decoder.layers.0.self_attn.in_proj_weight"] = \
        rng.randn(3 * d, d).astype(np.float32)
    sd["detr.detr.transformer.decoder.layers.0.self_attn.in_proj_bias"] = \
        rng.randn(3 * d).astype(np.float32)
    sd["detr.detr.transformer.decoder.layers.0.norm1.weight"] = rng.randn(
        d).astype(np.float32)
    # class embed 0 (per-layer) + a final entry so index detection sees the
    # real layout where the LAST class_embed is the encoder proposal head
    sd["detr.detr.class_embed.0.log_scale"] = np.array([0.7], np.float32)
    eb = tree["enc_class_embed"]["body"]["kernel"]
    sd["detr.detr.class_embed.1.body.weight"] = t_lin(eb)
    # input proj conv 0
    ck = tree["input_proj_0"]["kernel"]          # (kh, kw, in, out)
    sd["detr.detr.input_proj.0.0.weight"] = rng.randn(
        ck.shape[3], ck.shape[2], ck.shape[0], ck.shape[1]).astype(np.float32)
    # backbone stem
    sk = tree["backbone"]["stem_conv"]["kernel"]
    sd["detr.detr.backbone.0.backbone.stem.conv1.weight"] = rng.randn(
        sk.shape[3], sk.shape[2], sk.shape[0], sk.shape[1]).astype(np.float32)
    sd["detr.detr.backbone.0.backbone.stem.conv1.norm.running_mean"] = \
        rng.randn(sk.shape[3]).astype(np.float32)
    # bert layer 0 query
    bq = tree["bert"]["layer_0"]["attention"]["query"]["kernel"]
    sd["text_encoder.body.model.encoder.layer.0.attention.self.query.weight"] \
        = t_lin(bq)
    # controller layer 0
    cl = tree["controller"]["layer_0"]["kernel"]
    sd["detr.controller.layers.0.weight"] = t_lin(cl)

    new_tree, report = convert_checkpoint(sd, {"params": tree})
    tr = new_tree["params"] if "params" in new_tree else new_tree
    assert report["loaded"] >= 10, report
    assert not report["shape_mismatch"], report["shape_mismatch"]
    np.testing.assert_allclose(
        tr["transformer"]["encoder_layer_0"]["linear1"]["kernel"],
        sd["detr.detr.transformer.encoder.layers.0.linear1.weight"].T)
    np.testing.assert_allclose(
        tr["class_embed_0"]["log_scale"], [0.7])
    np.testing.assert_allclose(
        tr["input_proj_0"]["kernel"],
        sd["detr.detr.input_proj.0.0.weight"].transpose(2, 3, 1, 0))
    wq_expected = np.split(
        sd["detr.detr.transformer.decoder.layers.0.self_attn.in_proj_weight"],
        3, axis=0)[0].T
    np.testing.assert_allclose(
        tr["transformer"]["decoder_layer_0"]["self_attn"]["q_proj"]["kernel"],
        wq_expected)


def test_hash_vocab_refuses_converted_bert(tmp_path, monkeypatch):
    """load_torch_checkpoint must HARD-ERROR when a checkpoint carries a
    BERT word-embedding table but only the hash-vocab tokenizer is
    available (VERDICT r4 #8; divergence #4 in docs/PARITY.md)."""
    import torch

    from uninext_tpu.engine.convert import (_require_real_vocab_for,
                                            load_torch_checkpoint)

    monkeypatch.delenv("UNINEXT_BERT_VOCAB", raising=False)
    monkeypatch.delenv("UNINEXT_ALLOW_HASH_VOCAB", raising=False)
    sd = {"text_encoder.body.model.embeddings.word_embeddings.weight":
          torch.zeros(30522, 768)}
    path = tmp_path / "ckpt.pth"
    torch.save(sd, str(path))
    with pytest.raises(RuntimeError, match="vocab"):
        load_torch_checkpoint(str(path), {"params": {}})

    # escape hatch for synthetic fixtures
    monkeypatch.setenv("UNINEXT_ALLOW_HASH_VOCAB", "1")
    _require_real_vocab_for(sd)                        # no raise

    # a real vocab file also satisfies the gate
    monkeypatch.delenv("UNINEXT_ALLOW_HASH_VOCAB", raising=False)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the"]))
    monkeypatch.setenv("UNINEXT_BERT_VOCAB", str(vocab))
    _require_real_vocab_for(sd)                        # no raise

    # checkpoints WITHOUT a language tower never trip the gate
    monkeypatch.delenv("UNINEXT_BERT_VOCAB", raising=False)
    _require_real_vocab_for({"detr.detr.backbone.0.x": None})
