"""Device mesh + sharding rules.

The reference's only parallelism is data parallelism over NCCL DDP
(detectron2/engine/launch.py:27-123, SURVEY.md §2.5). The TPU-native
equivalent: one jax Mesh with a ("data", "model") layout; batches are sharded
over "data"; the "model" axis carries sequence parallelism of the encoder
(transformer.sp_encoder) and Megatron-style tensor parallelism of the heavy
towers (parallel/sharding.py — ViT-H/BERT column/row-parallel linears with
sharded Adam state). Gradient all-reduce and the TP collectives are inserted
by XLA GSPMD from the sharding annotations — there is no explicit collective
in the train step.

Multi-host: call `jax.distributed.initialize()` before `create_mesh`; the
mesh spans all processes and data loading shards per host
(engine/input pipeline uses `jax.process_index()`).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(model_parallel_size: int = 1,
                devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel_size == 0
    arr = np.asarray(devices).reshape(n // model_parallel_size,
                                      model_parallel_size)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh):
    """Sharding for batch pytrees: leading dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
