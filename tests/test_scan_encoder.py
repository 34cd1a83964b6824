"""Scan-encoder parity: stacked-scan layers == unrolled layers numerically."""
import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from test_model import small_cfg, make_batch
from uninext_tpu.models.detr import UninextDETR


def test_scan_matches_unrolled():
    base = small_cfg()
    tcfg = dataclasses.replace(base.transformer, enc_layers=3)
    cfg_scan = dataclasses.replace(base, transformer=tcfg, scan_encoder=True)
    cfg_unroll = dataclasses.replace(base, transformer=tcfg,
                                     scan_encoder=False)
    images, img_mask, sizes, tids, tmask, _ = make_batch(0)

    m_u = UninextDETR(cfg_unroll)
    p_u = jax.tree.map(np.asarray, jax.jit(lambda r: m_u.init(
        {"params": r}, images, img_mask, sizes, tids, tmask,
        task="detection", train=False))(jax.random.PRNGKey(0)))
    m_s = UninextDETR(cfg_scan)

    tr_u = p_u["params"]["transformer"]
    stacked = jax.tree.map(lambda *xs: np.stack(xs),
                           *[tr_u[f"encoder_layer_{i}"] for i in range(3)])
    p_s = copy.deepcopy(p_u)
    tr_s = p_s["params"]["transformer"]
    for i in range(3):
        tr_s.pop(f"encoder_layer_{i}")
    tr_s["encoder_scan"] = {"layer": stacked}

    out_u = jax.jit(lambda p: m_u.apply(p, images, img_mask, sizes, tids,
                                        tmask, task="detection",
                                        train=False))(p_u)
    out_s = jax.jit(lambda p: m_s.apply(p, images, img_mask, sizes, tids,
                                        tmask, task="detection",
                                        train=False))(p_s)
    np.testing.assert_allclose(np.asarray(out_u["pred_boxes"]),
                               np.asarray(out_s["pred_boxes"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_u["pred_logits"]),
                               np.asarray(out_s["pred_logits"]),
                               atol=2e-4, rtol=1e-3)
