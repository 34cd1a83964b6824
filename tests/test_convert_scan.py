"""Converter: torch per-layer encoder weights stack into the scan layout."""
import dataclasses

import jax
import numpy as np

from test_model import small_cfg, make_batch
from uninext_tpu.engine.convert import convert_checkpoint
from uninext_tpu.models.detr import UninextDETR


def test_encoder_weights_stack_into_scan_layout():
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, transformer=dataclasses.replace(cfg.transformer, enc_layers=3))
    model = UninextDETR(cfg)
    images, img_mask, sizes, tids, tmask, _ = make_batch(0)
    params = jax.eval_shape(lambda r: model.init(
        {"params": r}, images, img_mask, sizes, tids, tmask,
        task="detection", train=False), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: np.zeros(x.shape, np.float32), params)
    assert "encoder_scan" in params["params"]["transformer"]

    rng = np.random.RandomState(0)
    d = cfg.transformer.d_model
    dff = cfg.transformer.dim_feedforward
    sd = {}
    per_layer_w = []
    for i in range(3):
        w = rng.randn(dff, d).astype(np.float32)
        per_layer_w.append(w)
        lp = f"detr.detr.transformer.encoder.layers.{i}"
        sd[f"{lp}.norm1.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{lp}.linear1.weight"] = w
        sd[f"{lp}.linear1.bias"] = rng.randn(dff).astype(np.float32)

    new_params, report = convert_checkpoint(sd, params)
    assert not report["shape_mismatch"], report["shape_mismatch"]
    got = new_params["params"]["transformer"]["encoder_scan"]["layer"][
        "linear1"]["kernel"]
    assert got.shape == (3, d, dff)
    for i in range(3):
        np.testing.assert_allclose(got[i], per_layer_w[i].T)
