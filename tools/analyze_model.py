#!/usr/bin/env python
"""Parameter / FLOPs analysis of the flagship model.

Parity: reference tools/analyze_model.py (fvcore FlopCountAnalysis) — here
via jax's compiled-computation cost analysis, which reports exact XLA FLOPs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="image_joint_r50")
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1216)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from uninext_tpu import config as config_mod
    from uninext_tpu.models.detr import UninextDETR

    cfg = getattr(config_mod, args.config)()
    model = UninextDETR(cfg)
    H, W, T = args.height, args.width, cfg.data.max_text_len
    rng = np.random.RandomState(0)
    inputs = (jnp.array(rng.randn(1, H, W, 3), jnp.float32),
              jnp.zeros((1, H, W), bool), jnp.array([[H, W]], jnp.int32),
              jnp.array(rng.randint(0, 30000, (1, T)), jnp.int32),
              jnp.ones((1, T), jnp.int32))
    params = jax.eval_shape(
        lambda r: model.init({"params": r}, *inputs, task="detection",
                             train=False), jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))
    print(f"parameters: {n_params / 1e6:.2f} M")

    # per-top-module breakdown
    tree = params["params"]
    for k in sorted(tree):
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree[k]))
        if n > 1e5:
            print(f"  {k:28s} {n / 1e6:8.2f} M")

    lowered = jax.jit(lambda p, *a: model.apply(
        p, *a, task="detection", train=False)).lower(params, *inputs)
    cost = lowered.compile().cost_analysis()
    if cost and "flops" in cost:
        print(f"forward FLOPs @ {H}x{W}: {cost['flops'] / 1e9:.1f} G")
        if "bytes accessed" in cost:
            print(f"bytes accessed: {cost['bytes accessed'] / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
