"""Trainer loop tests (tiny models, 8-CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core import mesh as mesh_lib
from vlaser_tpu.core.config import tiny_vla
from vlaser_tpu.policy.pizero import PiZeroVLA
from vlaser_tpu.train.metrics import action_accuracy
from vlaser_tpu.train.model_averaging import AveragingConfig, ModelAveraging
from vlaser_tpu.train.optim import cosine_warmup_restarts
from vlaser_tpu.train.trainer import VLATrainConfig, VLATrainer, _vla_param_groups


def test_cosine_warmup_restarts_shape():
    sched = cosine_warmup_restarts(
        1e-3, first_cycle_steps=100, warmup_steps=10, min_lr=1e-6
    )
    lrs = np.array([float(sched(s)) for s in [0, 5, 10, 50, 99, 100, 105, 150]])
    assert lrs[0] < lrs[1] < lrs[2]  # warmup rising
    assert abs(lrs[2] - 1e-3) / 1e-3 < 0.05  # peak near max_lr
    assert lrs[3] < lrs[2] and lrs[4] < lrs[3]  # cosine falling
    assert lrs[6] > lrs[4]  # restart warms up again


def test_action_accuracy_all_dims_rule():
    gt = jnp.zeros((2, 2, 3))
    pred = jnp.array([
        [[0.05, 0.0, 0.0], [0.5, 0.0, 0.0]],
        [[0.0, 0.0, 0.0], [0.05, 0.05, 0.05]],
    ])
    accs = action_accuracy(gt, pred, thresholds=(0.1,))
    # steps: [ok, fail(0.5)], [ok, ok] -> 3/4
    np.testing.assert_allclose(accs, [0.75])


def test_model_averaging_ema_swa():
    p = {"w": jnp.ones(3)}
    ema = ModelAveraging(AveragingConfig(mode="ema", start=1, ema_decay=0.5))
    ema.update(0, p)  # before start: no-op
    assert ema.avg_params is None
    ema.update(1, p)
    ema.update(2, {"w": jnp.zeros(3)})
    np.testing.assert_allclose(ema.avg_params["w"], 0.5)

    swa = ModelAveraging(AveragingConfig(mode="swa", start=0, freq=1))
    swa.update(0, {"w": jnp.zeros(3)})
    swa.update(1, {"w": jnp.ones(3) * 2})
    np.testing.assert_allclose(swa.avg_params["w"], 1.0)  # mean(0, 2)


def _vla_batch(cfg, B, rng):
    S = cfg.max_image_text_tokens
    ids = rng.integers(1, 400, (B, S))
    ids[:, 2] = cfg.vlm.img_context_token_id
    return {
        "input_ids": ids.astype(np.int32),
        "pixel_values": rng.standard_normal(
            (B, cfg.vlm.vision.image_size, cfg.vlm.vision.image_size, 3)
        ).astype(np.float32),
        "text_mask": np.ones((B, S), np.int32),
        "proprios": rng.standard_normal((B, cfg.cond_steps, cfg.proprio_dim)).astype(np.float32),
        "actions": rng.standard_normal((B, cfg.num_action_tokens, cfg.action_dim)).astype(np.float32),
    }


def test_vla_trainer_two_groups_and_eval():
    cfg = tiny_vla(max_image_text_tokens=16)
    model = PiZeroVLA(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    rng = np.random.default_rng(0)
    batch = _vla_batch(cfg, 4, rng)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["input_ids"][:1]), jnp.asarray(batch["pixel_values"][:1]),
        jnp.asarray(batch["text_mask"][:1]), jnp.asarray(batch["proprios"][:1]),
        jnp.asarray(batch["actions"][:1]), jnp.zeros((1,)),
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    labels = _vla_param_groups(params, train_vlm=False)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    lab = {"/".join(str(getattr(k, "key", k)) for k in path): v for path, v in flat}
    assert any("expert" in k and v == "action" for k, v in lab.items())
    assert any("vision_model" in k and v == "frozen" for k, v in lab.items())

    tcfg = VLATrainConfig(
        train_vlm=True, log_every=1,
        averaging=AveragingConfig(mode="ema", start=1, ema_decay=0.9),
        mesh_fsdp=2, mesh_tp=2,
    )
    trainer = VLATrainer(model, params, tcfg)
    state = trainer.train_steps(iter([_vla_batch(cfg, 8, rng) for _ in range(3)]), 3)
    assert int(state.step) == 3
    assert trainer.averaging.avg_params is not None

    res = trainer.evaluate(_vla_batch(cfg, 2, rng))
    assert res["action_accuracy"].shape == (2,)
    assert np.isfinite(res["l1"])


def test_beta_flow_time_sampler_statistics():
    """The reference's own statistical oracle (scripts/tests/sampling.py):
    beta(1.5,1) flipped/shifted -> t = t_max*(1-z); E[z]=alpha/(alpha+beta)=0.6
    so E[t] ~= 0.3996; support [0, t_max]."""
    from vlaser_tpu.policy.flow import sample_fm_time

    t = sample_fm_time(jax.random.PRNGKey(0), 20000, "beta", 1.5, 1.0, 0.999)
    t = np.asarray(t)
    assert t.min() >= 0.0 and t.max() <= 0.999
    np.testing.assert_allclose(t.mean(), 0.999 * (1 - 1.5 / 2.5), atol=0.01)
    # uniform-stratified variant covers [0,1) evenly
    u = np.asarray(sample_fm_time(jax.random.PRNGKey(1), 1000, "uniform"))
    assert u.min() >= 0 and u.max() < 1
    np.testing.assert_allclose(u.mean(), 0.5, atol=0.02)


def test_chunked_ce_matches_full():
    """chunked_weighted_ce == weighted_ce_loss in value and gradients (tied
    and untied heads), without materializing [N, V] logits."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.losses import (
        make_sft_loss, make_sft_loss_chunked,
    )

    for tie in (False, True):
        cfg = tiny_vlm()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, tie_word_embeddings=tie))
        model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                                  attn_impl="reference")
        rng = np.random.default_rng(0)
        B, N = 2, 21  # deliberately not a multiple of the chunk
        ids = rng.integers(1, 300, (B, N)).astype(np.int32)
        ids[:, 1] = cfg.img_context_token_id
        labels = ids.copy()
        labels[:, :3] = -100
        img = cfg.vision.image_size
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "loss_weight": jnp.asarray(
                rng.uniform(0.5, 1.5, (B, N)).astype(np.float32)),
            "seg_ids": jnp.ones((B, N), jnp.int32),
            "pixel_values": jnp.asarray(
                rng.standard_normal((B, img, img, 3)).astype(np.float32)),
            "image_flags": jnp.ones((B,), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                            batch["pixel_values"], batch["image_flags"])
        full = make_sft_loss(model)
        chunked = make_sft_loss_chunked(model, chunk=8)
        lf, gf = jax.value_and_grad(lambda p: full(p, batch, None))(params)
        lc, gc = jax.value_and_grad(lambda p: chunked(p, batch, None))(params)
        np.testing.assert_allclose(float(lc), float(lf), rtol=1e-6)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gc),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-6, err_msg=str(pa))


def test_metrics_writer_jsonl(tmp_path):
    import json as _json

    from vlaser_tpu.utils.monitoring import MetricsWriter

    p = tmp_path / "m" / "metrics.jsonl"
    w = MetricsWriter(str(p), process_index=0)
    w.write(1, loss=2.5, grad_norm=0.7)
    w.write(10, loss=1.25)
    w.close()
    rows = [_json.loads(l) for l in open(p)]
    assert rows[0] == {"step": 1, "loss": 2.5, "grad_norm": 0.7}
    assert rows[1]["step"] == 10
    # non-main process writes nothing
    w2 = MetricsWriter(str(tmp_path / "n.jsonl"), process_index=1)
    w2.write(1, loss=0.0)
    w2.close()
    assert not (tmp_path / "n.jsonl").exists()
