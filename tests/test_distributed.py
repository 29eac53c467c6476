"""Multi-host wiring tests (single-process semantics + data sharding).

True multi-process runs need a cluster; these pin the invariants the
multi-host path relies on: (a) put_global_batch is an exact device_put in the
1-process case (so single-host training is unchanged), (b) per-process data
sharding partitions the stream disjointly and completely, (c) slurm env
parsing derives the coordinator like dist_utils.py:54-66.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vlaser_tpu.core import mesh as mesh_lib
from vlaser_tpu.core.distributed import (
    _slurm_coordinator,
    initialize,
    put_global_batch,
    shard_for_process,
)


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize() is False  # single-process fallback
    assert initialize() is False  # idempotent


def test_slurm_coordinator_parsing(monkeypatch):
    cases = {
        "node01": "node01",
        "node[12-15]": "node12",
        "gpu-a[3,7,9]": "gpu-a3",
        "host12,host13": "host12",
    }
    for nodelist, want in cases.items():
        monkeypatch.setenv("SLURM_NODELIST", nodelist)
        assert _slurm_coordinator() == want, nodelist


def test_put_global_batch_single_process_matches_device_put():
    mesh = mesh_lib.make_mesh(dp=-1, fsdp=2, tp=1)
    batch = {
        "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "ids": np.arange(8, dtype=np.int32),
    }
    out = put_global_batch(batch, mesh)
    ref = jax.device_put(batch, mesh_lib.shard_batch(batch, mesh))
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
        assert out[k].sharding == ref[k].sharding


def test_put_global_batch_feeds_train_step_loss_unchanged():
    """Assembled global batch gives bit-identical loss to plain device_put."""
    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.losses import make_sft_loss

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(0)
    B, N = 8, 16
    ids = rng.integers(1, 300, (B, N)).astype(np.int32)
    ids[:, 1] = cfg.img_context_token_id
    img = cfg.vision.image_size
    batch = {
        "input_ids": ids,
        "labels": ids.copy(),
        "loss_weight": np.ones((B, N), np.float32),
        "seg_ids": np.ones((B, N), np.int32),
        "pixel_values": rng.standard_normal((B, img, img, 3)).astype(np.float32),
        "image_flags": np.ones((B,), np.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids[:1]),
        jnp.asarray(batch["pixel_values"][:1]), jnp.ones((1,), jnp.int32),
    )
    loss_fn = make_sft_loss(model)
    mesh = mesh_lib.make_mesh(dp=-1, fsdp=2, tp=2)
    g = put_global_batch(batch, mesh)
    l_global = float(loss_fn(params, g, jax.random.PRNGKey(1)))
    l_plain = float(loss_fn(
        params, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1)))
    # sharded execution reorders the reduction; fp32-noise equality
    np.testing.assert_allclose(l_global, l_plain, rtol=1e-6)


def test_shard_for_process_partitions_packed_order():
    from vlaser_tpu.data.chat_dataset import PackedDataset

    class Dummy:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            raise AssertionError("not iterated in this test")

    shards = []
    for idx in range(3):
        p = PackedDataset(Dummy(), shuffle_seed=7)
        p = shard_for_process(p, num_shards=3, index=idx)
        shards.append(list(p.order))
    flat = sorted(sum(shards, []))
    assert flat == list(range(13))  # disjoint + complete
    assert all(len(s) in (4, 5) for s in shards)
