#!/usr/bin/env python
"""Fine-grained breakdown of the detection serving frame (round 4).

Marginal-cost method: time the FULL forward under config variants and
difference them (the encoder scan makes per-layer costs linear in layer
count):

  base           enc=6 dec=6 fusion=on   (the shipping image_joint_r50)
  enc1           enc=1                   -> encoder layer marginal x5
  dec1           dec=1                   -> decoder layer marginal x5
  nofuse         use_early_fusion=False  -> VLFuse (hoisted, runs once)

plus op-level microbenches at both scales:

  msda_enc       ms_deform_attn, Lq=S (encoder scale)
  msda_gather    the per-level gathers alone (fold replaced by a sum)
  msda_dec       ms_deform_attn, Lq=900 (decoder cross-attn scale)
  msda_dec_unp   unpacked formulation at Lq=900 (no table pack)

Each figure is an in-graph fori_loop of N iterations with perturbed input
(bench.py methodology), overhead-subtracted, min of 2 reps.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from uninext_tpu.config import image_joint_r50
from uninext_tpu.models.detr import UninextDETR, init_all_paths, \
    feature_shapes

N = 30
H, W, T = 800, 1216, 256


def overhead():
    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((256, 256))
    float(f(x))
    s = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(x + i + 1))
        s.append(time.perf_counter() - t0)
    return min(s)


def timeit(name, loop, *args, n=N):
    ov = overhead()
    t0 = time.perf_counter()
    float(loop(*args))
    compile_s = time.perf_counter() - t0
    best = None
    for r in range(2):
        pert = tuple(a * (1 + (r + 1) * 1e-6)
                     if isinstance(a, jnp.ndarray)
                     and jnp.issubdtype(a.dtype, jnp.floating) else a
                     for a in args)
        t0 = time.perf_counter()
        float(loop(*pert))
        dt = (time.perf_counter() - t0 - ov) / n
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best * 1e3:8.2f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return best


def full_fwd_time(cfg, tag):
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(1, H, W, 3), jnp.float32)
    img_mask = jnp.zeros((1, H, W), bool)
    sizes = jnp.array([[H, W]], jnp.int32)
    tids = jnp.array(rng.randint(0, 30000, (1, T)), jnp.int32)
    tmask = jnp.ones((1, T), jnp.int32)
    lang = jax.jit(lambda p, a, b: model.apply(
        p, a, b, method=UninextDETR.encode_text))(params, tids, tmask)

    @jax.jit
    def loop(p, im, msk, sz, lg):
        def body(i, acc):
            out = model.apply(p, im + i * 1e-9, msk, sz, tids, tmask,
                              task="detection", train=False, lang_dict=lg)
            return acc + out["pred_logits"].astype(jnp.float32).mean() \
                + out["pred_boxes"].mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    return timeit(tag, loop, params, images, img_mask, sizes, lang)


def msda_inputs(Lq, seed=0):
    from uninext_tpu.models.detr import feature_shapes
    shapes = feature_shapes(4, H, W)
    S = sum(h * w for h, w in shapes)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    make = jax.jit(lambda k1, k2, k3: (
        jax.random.normal(k1, (1, S, 8, 32), jnp.bfloat16),
        jax.random.uniform(k2, (1, Lq, 8, 4, 4, 2), jnp.bfloat16),
        jax.nn.softmax(jax.random.normal(
            k3, (1, Lq, 8, 4, 4), jnp.bfloat16).reshape(1, Lq, 8, 16)
        ).reshape(1, Lq, 8, 4, 4).astype(jnp.bfloat16)))
    value, loc, att = make(*ks)
    return shapes, value, loc, att


def bench_msda(Lq, tag, fn=None):
    from uninext_tpu.ops import msda as M
    fn = fn or M.ms_deform_attn
    shapes, value, loc, att = msda_inputs(Lq)

    @jax.jit
    def loop(v, l, a):
        def body(i, acc):
            out = fn(v + i * jnp.bfloat16(1e-9), tuple(shapes), l, a)
            return acc + out.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    return timeit(tag, loop, value, loc, att)


def bench_gather_only(Lq, tag):
    """The per-level packed gathers with the fold replaced by a flat sum —
    isolates emitter time from fold time (the sum still reads all bytes,
    so this slightly OVERSTATES pure gather)."""
    from uninext_tpu.ops import msda as M
    shapes, value, loc, att = msda_inputs(Lq)
    B, S, Mh, D = value.shape

    def gather_sum(v, l, a):
        Lq_pad, pad_q, BMLq = M._pad_q_layout(B, Mh, Lq)
        value_t = jnp.transpose(v, (0, 2, 1, 3))
        packed = M._pack_levels(value_t, shapes)
        locT = jnp.transpose(l, (0, 2, 1, 3, 4, 5))
        attT = jnp.transpose(a, (0, 2, 1, 3, 4))
        idxs, _ = M._indices_weights(shapes, locT, attT)
        acc = jnp.float32(0)
        for lvl in range(len(shapes)):
            Rl = packed[lvl].shape[2]
            buf = packed[lvl].reshape(B * Mh * Rl, 4 * D)
            gidx = M._gather_index(idxs[lvl], Rl, pad_q)
            g = buf.at[gidx].get(mode="promise_in_bounds")
            acc = acc + g.astype(jnp.float32).sum()
        return acc

    @jax.jit
    def loop(v, l, a):
        def body(i, z):
            return z + gather_sum(v + i * jnp.bfloat16(1e-9), l, a)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    return timeit(tag, loop, value, loc, att)


def main():
    which = os.environ.get("PROFILE_PARTS", "micro,variants").split(",")
    if "micro" in which:
        from uninext_tpu.ops import msda as M
        t_enc = bench_msda(20224, "msda enc-scale (packed)")
        bench_gather_only(20224, "msda enc gathers only")
        bench_msda(900, "msda dec-scale (packed)")
        bench_msda(900, "msda dec-scale (unpacked)",
                   fn=M.ms_deform_attn_unpacked)
        print(f"{'-> 6 encoder MSDA calls':28s} {t_enc * 6e3:8.2f} ms",
              flush=True)
    if "variants" in which:
        cfg = image_joint_r50()
        t_base = full_fwd_time(cfg, "full fwd base (6/6/VL)")
        t_enc1 = full_fwd_time(dataclasses.replace(
            cfg, transformer=dataclasses.replace(
                cfg.transformer, enc_layers=1)), "full fwd enc_layers=1")
        t_dec1 = full_fwd_time(dataclasses.replace(
            cfg, transformer=dataclasses.replace(
                cfg.transformer, dec_layers=1)), "full fwd dec_layers=1")
        t_nof = full_fwd_time(dataclasses.replace(
            cfg, transformer=dataclasses.replace(
                cfg.transformer, use_early_fusion=False)),
            "full fwd no VLFuse")
        enc_l = (t_base - t_enc1) / 5
        dec_l = (t_base - t_dec1) / 5
        print(f"{'-> encoder layer marginal':28s} {enc_l * 1e3:8.2f} ms "
              f"(x6 = {enc_l * 6e3:.2f})")
        print(f"{'-> decoder layer marginal':28s} {dec_l * 1e3:8.2f} ms "
              f"(x6 = {dec_l * 6e3:.2f})")
        print(f"{'-> VLFuse (once)':28s} {(t_base - t_nof) * 1e3:8.2f} ms")
        print(f"{'-> residual (bb+prop+heads)':28s} "
              f"{(t_base - enc_l * 6 - dec_l * 6 - (t_base - t_nof)) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
