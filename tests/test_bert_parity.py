"""BERT encoder parity vs HuggingFace torch BertModel with converted weights.

Validates both models/bert.py and the engine/convert.py BERT mapping: a
randomly-initialized torch BertModel's weights are converted into our tree;
outputs must match on the same token ids.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from uninext_tpu.config import LanguageConfig
from uninext_tpu.engine.convert import convert_checkpoint
from uninext_tpu.models.bert import BertEncoder


def test_bert_matches_huggingface():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(vocab_size=500, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=64,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    torch_model = BertModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = LanguageConfig(vocab_size=500, hidden_dim=32, num_layers=2,
                         num_heads=4, intermediate_dim=64, max_len=16,
                         max_position_embeddings=64)
    model = BertEncoder(cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 500, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[0, 10:] = 0
    params = model.init(jax.random.PRNGKey(0), jnp.array(ids),
                        jnp.array(mask))

    # convert torch weights (prefixed like the reference text encoder)
    sd = {f"text_encoder.body.model.{k}": v
          for k, v in torch_model.state_dict().items()}
    tree = {"params": {"bert": jax.tree.map(np.asarray,
                                            params["params"])}}
    new_tree, report = convert_checkpoint(sd, tree)
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert report["loaded"] >= 30, report

    out = model.apply({"params": new_tree["params"]["bert"]
                       if "bert" in new_tree["params"] else
                       new_tree["params"]},
                      jnp.array(ids), jnp.array(mask))

    with torch.no_grad():
        ref = torch_model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                          attention_mask=torch.from_numpy(
                              mask.astype(np.int64)))
    ref_h = ref.last_hidden_state.numpy()
    ours = np.asarray(out["hidden"])
    # compare only valid positions (masked positions may diverge freely)
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref_h[m], atol=2e-4, rtol=1e-3)


def test_roberta_matches_huggingface():
    """roberta-base variant (bert_model.py:21-26): position-id scheme from
    pad mask, LN eps 1e-5, single token type."""
    from transformers import RobertaConfig, RobertaModel
    hf_cfg = RobertaConfig(vocab_size=500, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, max_position_embeddings=66,
                           type_vocab_size=1, pad_token_id=1,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    torch_model = RobertaModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = LanguageConfig(model_type="roberta-base", vocab_size=500,
                         hidden_dim=32, num_layers=2, num_heads=4,
                         intermediate_dim=64, max_len=16,
                         max_position_embeddings=66, type_vocab_size=1,
                         layer_norm_eps=1e-5, pad_token_id=1)
    model = BertEncoder(cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(4, 500, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    ids[0, 10:] = 1                       # roberta pad token
    mask[0, 10:] = 0
    params = model.init(jax.random.PRNGKey(0), jnp.array(ids),
                        jnp.array(mask))
    sd = {f"text_encoder.body.model.{k}": v
          for k, v in torch_model.state_dict().items()}
    tree = {"params": {"bert": jax.tree.map(np.asarray, params["params"])}}
    new_tree, report = convert_checkpoint(sd, tree)
    assert not report["shape_mismatch"], report["shape_mismatch"]

    out = model.apply({"params": new_tree["params"]["bert"]},
                      jnp.array(ids), jnp.array(mask))
    with torch.no_grad():
        ref = torch_model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                          attention_mask=torch.from_numpy(
                              mask.astype(np.int64)))
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out["hidden"])[m],
                               ref.last_hidden_state.numpy()[m],
                               atol=2e-4, rtol=1e-3)
