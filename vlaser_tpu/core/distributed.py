"""Multi-host wiring: jax.distributed init + per-process data -> global batch.

Replaces the reference's launcher zoo (internvl/dist_utils.py:32-104 —
torchrun/slurm/mpi rank derivation + deepspeed.init_distributed('nccl') — and
slurm/train_internvl.sh:10-26, 4 nodes x 8 GPUs) with the TPU-native shape:

- one `jax.distributed.initialize()` call per process (coordinator + rank
  derived from env: explicit JAX_* vars, slurm, or single-process no-op);
- data is sharded per process (PackedDataset.shard / RLDS shard) and each
  process feeds only its local slice;
- `put_global_batch` assembles the logical global batch with
  `jax.make_array_from_process_local_data`, so the jitted train step sees one
  global array sharded over the full (data, fsdp, tensor) mesh — GSPMD inserts
  all cross-host collectives over ICI/DCN;
- checkpointing stays orbax (multihost-aware once jax.distributed is live).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np


def _slurm_coordinator() -> Optional[str]:
    nodelist = os.environ.get("SLURM_STEP_NODELIST") or os.environ.get(
        "SLURM_NODELIST"
    )
    if not nodelist:
        return None
    # "host[12-15,20],other" -> "host12" (dist_utils.py:54-66 scontrol parity,
    # without shelling out)
    m = re.match(r"([^\[,]+)(?:\[(\d+)[-,\]])?", nodelist)
    if not m:
        return None
    host = m.group(1) + (m.group(2) or "")
    return host


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    port: int = 8476,
) -> bool:
    """Initialize jax.distributed from args or environment; returns True if a
    multi-process runtime was started, False for the single-process fallback.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    JAX_PROCESS_ID > slurm (SLURM_NTASKS/SLURM_PROCID/node list). Safe to call
    twice (subsequent calls no-op).
    """
    if getattr(initialize, "_done", False):
        return getattr(initialize, "_multi", False)

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
        if coordinator_address is None:
            host = _slurm_coordinator()
            coordinator_address = f"{host}:{port}" if host else None

    multi = bool(num_processes and num_processes > 1)
    if multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    initialize._done = True
    initialize._multi = multi
    return multi


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def put_global_batch(batch: dict, mesh, shardings=None) -> dict:
    """Host-local numpy batch (this process's slice) -> global jax.Arrays.

    Single-process: a plain device_put onto the mesh shardings. Multi-process:
    jax.make_array_from_process_local_data assembles the logical global array
    whose leading dim is process_count x local_batch, sharded over the mesh's
    batch axes. Scalars/unshardable leaves replicate.
    """
    from . import mesh as mesh_lib

    if shardings is None:
        shardings = mesh_lib.shard_batch(batch, mesh)

    if jax.process_count() == 1:
        return jax.device_put(batch, shardings)

    def one(x, sharding):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(one, batch, shardings)


def shard_for_process(dataset, *, num_shards: Optional[int] = None,
                      index: Optional[int] = None):
    """Give each process a disjoint slice of the data stream.

    Works with PackedDataset (has .shard) and tf.data pipelines (have .shard);
    anything else is returned unchanged for process 0-only semantics.
    """
    n = num_shards if num_shards is not None else jax.process_count()
    i = index if index is not None else jax.process_index()
    if n <= 1:
        return dataset
    if hasattr(dataset, "shard"):
        return dataset.shard(n, i)
    raise ValueError(
        f"{type(dataset).__name__} is not shardable; wrap it or slice upstream"
    )


def respect_platform_env() -> None:
    """Honor JAX_PLATFORMS=cpu under TPU plugins that ignore the env var
    (the axon plugin does; see tests/conftest.py). Call before first backend
    touch in entry scripts."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
