#!/usr/bin/env python
"""2-process multi-host smoke: jax.distributed.initialize on localhost CPU.

Exercises the exact multi-host path tools/train_net.py --coordinator uses
(reference anchor: detectron2/engine/launch.py:98 multi-node rendezvous):
two OS processes rendezvous at a local coordinator, form ONE global mesh
(2 processes x 2 virtual CPU devices), build per-host batch shards with
`jax.make_array_from_process_local_data`, and run one real jitted train
step over the global ("data",) axis — XLA GSPMD inserts the cross-process
gradient all-reduce that replaces DDP.

Run with no args: spawns both ranks, waits, prints both outputs and PASS.
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(coordinator: str, num_processes: int, process_id: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")   # axon plugin ignores the env
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".xla_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.distributed.initialize(coordinator, num_processes, process_id)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from uninext_tpu.config import tiny_test_config
    from uninext_tpu.engine.train import create_train_state, make_train_step
    from uninext_tpu.parallel.mesh import create_mesh, shard_batch

    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, transformer=dataclasses.replace(
            cfg.transformer, enc_layers=1, dec_layers=1, num_queries=24,
            dn_number=4))

    B_local, H, W, T, G = n_local, 48, 64, 32, cfg.data.max_insts
    rng = np.random.RandomState(0)

    def local_batch(seed):
        r = np.random.RandomState(seed)
        boxes = np.zeros((B_local, G, 4), np.float32)
        valid = np.zeros((B_local, G), bool)
        pm = np.zeros((B_local, G, T), bool)
        boxes[:, :3] = [0.4, 0.5, 0.2, 0.3]
        valid[:, :3] = True
        pm[:, :3, 2] = True
        return {
            "images": r.randn(B_local, H, W, 3).astype(np.float32),
            "img_mask": np.zeros((B_local, H, W), bool),
            "image_sizes": np.array([[H, W]] * B_local, np.int32),
            "text_ids": r.randint(0, 1000, (B_local, T)).astype(np.int32),
            "text_mask": np.ones((B_local, T), np.int32),
            "targets": {
                "boxes": boxes, "valid": valid, "positive_map": pm,
                "masks": (r.rand(B_local, G, H // 4, W // 4) > 0.7
                          ).astype(np.float32),
            },
        }

    mesh = create_mesh(1)                       # global ("data", "model")
    sharding = shard_batch(mesh)
    local = local_batch(100 + process_id)       # DIFFERENT data per host
    global_batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local)

    # init from a host-local (replicated) sample batch — identical on ranks
    sample = jax.tree.map(lambda x: x[:1], local_batch(0))
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), sample)
    step = make_train_step(model, cfg, task="detection", mesh=mesh)
    state, metrics = step(state, global_batch, jax.random.PRNGKey(1))
    total = float(metrics["total_loss"])
    assert np.isfinite(total)
    print(f"RANK {process_id}: processes={jax.process_count()} "
          f"global_devices={n_global} local={n_local} "
          f"step_loss={total:.6f} step={int(state.step)}", flush=True)


def spawn(num_processes: int, port: int):
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(num_processes),
             "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs, rcs = [], []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        rcs.append(p.returncode)
    losses = set()
    for pid, (out, rc) in enumerate(zip(outs, rcs)):
        tail = [l for l in out.splitlines() if l.startswith("RANK")]
        print(tail[-1] if tail else f"rank {pid} FAILED rc={rc}:\n{out[-2000:]}")
        for l in tail:
            losses.add(l.split("step_loss=")[1].split()[0])
    ok = all(rc == 0 for rc in rcs) and len(losses) == 1
    print("MULTIHOST SMOKE", "PASS" if ok else "FAIL",
          f"(replicated loss agrees across ranks: {sorted(losses)})")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=12391)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(spawn(args.num_processes, args.port))
    worker(args.coordinator, args.num_processes, args.process_id)
