"""Tensor-parallel serving engine: the TP-sharded ContinuousBatchingEngine
on an 8-device virtual mesh must be token-identical to the single-device
engine (reference parity surface: the QA/eval engine runs vLLM at
tensor_parallel_size=2 — data-pipeline/RoboTwin-QA/GroundingQA.py:158,
GeneralQA.yaml:10). GSPMD inserts the collectives; the scheduler, slot
logic, prefix caching, and sampling must all be sharding-invisible."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.core.mesh import make_mesh
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.serve.engine import ContinuousBatchingEngine, Request

EOS = [3]


@pytest.fixture(scope="module")
def vlm():
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(0)
    npt = cfg.num_image_token
    ids = rng.integers(1, 400, (1, 8 + npt))
    ids[0, 2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(pixels),
        jnp.asarray([1], np.int32),
    )
    return cfg, model, params


def _mixed_requests(cfg, rng):
    """Text + image + sampled rows across staggered lengths (slot reuse,
    grouped admission, and the sampled chunk all under GSPMD)."""
    npt = cfg.num_image_token
    reqs = []
    for i, n in enumerate((4, 9, 5, 13, 7, 3, 11)):
        reqs.append(Request(uid=i, input_ids=rng.integers(
            1, 400, (n,)).astype(np.int32), max_new_tokens=5))
    ids = rng.integers(1, 400, (6 + npt,)).astype(np.int32)
    ids[2 : 2 + npt] = cfg.img_context_token_id
    px = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    reqs.append(Request(uid=7, input_ids=ids, pixel_values=px,
                        max_new_tokens=5))
    return reqs


def _run(model, params, reqs, mesh=None):
    engine = ContinuousBatchingEngine(
        model, params, num_slots=3, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16, 32), cache_dtype=jnp.float32,
        chunk_size=4, mesh=mesh,
    )
    return {c.uid: c.token_ids for c in engine.run(reqs)}


def test_tp_engine_token_identity(vlm):
    cfg, model, params = vlm
    reqs = _mixed_requests(cfg, np.random.default_rng(5))
    want = _run(model, params, reqs)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    got = _run(model, params, reqs, mesh=mesh)
    assert sorted(got) == sorted(want)
    for uid in want:
        assert got[uid] == want[uid], f"request {uid} diverged under TP"


def test_tp_engine_params_actually_sharded(vlm):
    cfg, model, params = vlm
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    engine = ContinuousBatchingEngine(
        model, params, num_slots=2, max_len=64, eos_token_ids=EOS,
        pad_token_id=0, prefill_buckets=(16,), cache_dtype=jnp.float32,
        mesh=mesh,
    )
    leaves = jax.tree_util.tree_leaves(engine.params)
    assert any(not l.sharding.is_fully_replicated for l in leaves), (
        "TP engine left every param replicated"
    )


def test_tp_engine_prefix_cached_identity(vlm):
    """register_prefix + tail admission under the mesh: the stored prefix
    KV is a GSPMD-sharded array; the broadcast suffix prefill must still
    be token-identical to the single-device cached path."""
    cfg, model, params = vlm
    rng = np.random.default_rng(11)
    npt = cfg.num_image_token
    pfx = rng.integers(1, 400, (4 + npt,)).astype(np.int32)
    pfx[2 : 2 + npt] = cfg.img_context_token_id
    px = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    tails = [rng.integers(1, 400, (m,)).astype(np.int32) for m in (3, 6, 4)]

    def cached(mesh):
        engine = ContinuousBatchingEngine(
            model, params, num_slots=2, max_len=64, eos_token_ids=EOS,
            pad_token_id=0, prefill_buckets=(8, 32),
            cache_dtype=jnp.float32, mesh=mesh,
        )
        pid = engine.register_prefix(pfx, px)
        return {
            c.uid: c.token_ids
            for c in engine.run([
                Request(uid=i, input_ids=t, prefix_id=pid, max_new_tokens=4)
                for i, t in enumerate(tails)
            ])
        }

    want = cached(None)
    got = cached(make_mesh(dp=1, fsdp=2, tp=4))
    for uid in want:
        assert got[uid] == want[uid], f"tail {uid} diverged under TP"
