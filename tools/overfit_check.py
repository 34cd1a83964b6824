#!/usr/bin/env python
"""Sanity: overfit the tiny model on one synthetic batch; losses must drop.

The fastest end-to-end proof that matching, losses, gradients and the
optimizer cooperate. Run on CPU: python tools/overfit_check.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    from uninext_tpu.config import tiny_test_config
    from uninext_tpu.engine.train import create_train_state, make_train_step

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, transformer=dataclasses.replace(cfg.transformer, enc_layers=1,
                                             dec_layers=2, num_queries=40),
        solver=dataclasses.replace(cfg.solver, base_lr=5e-4, warmup_iters=10,
                                   grad_clip=1.0))
    B, H, W, T, G = 2, 64, 96, 16, cfg.data.max_insts
    rng = np.random.RandomState(0)
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    pm = np.zeros((B, G, T), bool)
    for b in range(B):
        for g in range(3):
            boxes[b, g] = (0.25 + 0.2 * g, 0.4 + 0.1 * b, 0.18, 0.25)
            valid[b, g] = True
            pm[b, g, 2 + g] = True
    masks = np.zeros((B, G, H // 4, W // 4), np.float32)
    for b in range(B):
        for g in range(3):
            cx, cy, bw, bh = boxes[b, g]
            x0, x1 = int((cx - bw / 2) * W / 4), int((cx + bw / 2) * W / 4)
            y0, y1 = int((cy - bh / 2) * H / 4), int((cy + bh / 2) * H / 4)
            masks[b, g, y0:y1, x0:x1] = 1.0
    batch = {
        "images": jnp.array(rng.randn(B, H, W, 3), jnp.float32),
        "img_mask": jnp.zeros((B, H, W), bool),
        "image_sizes": jnp.array([[H, W]] * B, jnp.int32),
        "text_ids": jnp.array(rng.randint(0, 1000, (B, T)), jnp.int32),
        "text_mask": jnp.ones((B, T), jnp.int32),
        "targets": {"boxes": jnp.array(boxes), "valid": jnp.array(valid),
                    "positive_map": jnp.array(pm), "masks": jnp.array(masks)},
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, task="detection", mesh=None)
    rngk = jax.random.PRNGKey(1)
    first = last = None
    for it in range(60):
        rngk, sk = jax.random.split(rngk)
        state, metrics = step(state, batch, sk)
        tot = float(metrics["total_loss"])
        if it == 0:
            first = tot
        last = tot
        if it % 10 == 0:
            print(f"it {it:3d} total={tot:8.3f} ce={float(metrics['loss_ce']):.3f} "
                  f"bbox={float(metrics['loss_bbox']):.3f} "
                  f"giou={float(metrics['loss_giou']):.3f} "
                  f"mask={float(metrics['loss_mask']):.3f}", flush=True)
    print(f"first={first:.3f} last={last:.3f} "
          f"ratio={last / first:.3f}")
    assert last < first * 0.7, "losses did not decrease enough"
    print("OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main()
