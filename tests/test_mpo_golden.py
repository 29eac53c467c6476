"""Numeric goldens for the MPO loss math and the pretrain freeze masks.

The MPO oracles reimplement, in torch, the exact formulas the reference
trains with — trl's DPOTrainer.dpo_loss 'sigmoid' and 'bco_pair' branches
and DPOTrainer.get_batch_logps, as driven by the reference's
MultimodalDPOTrainer (internvl_chat/internvl/train/trainer_dpo.py:99
concatenated_forward; :29 bco_pair handling; dpo shell recipes set
loss_type 'sigmoid,bco_pair'). Our jax losses must match to float
tolerance on random inputs, not merely prefer-chosen directionally."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vlaser_tpu.train.mpo import (
    IGNORE_TOKEN_ID,
    RunningMoments,
    bco_pair_loss,
    dpo_sigmoid_loss,
    sequence_logprobs,
)


def _torch_dpo_sigmoid(pc, pr, rc, rr, beta, label_smoothing=0.0):
    """trl DPOTrainer.dpo_loss, loss_type='sigmoid'."""
    logits = (pc - pr) - (rc - rr)
    losses = (
        -F.logsigmoid(beta * logits) * (1 - label_smoothing)
        - F.logsigmoid(-beta * logits) * label_smoothing
    )
    return losses.mean()


def _torch_bco_pair(pc, pr, rc, rr, beta, delta):
    """trl DPOTrainer.dpo_loss, loss_type='bco_pair' (delta = running
    mean of rewards, trainer_dpo.py RunningMoments)."""
    chosen_rewards = beta * (pc - rc)
    rejected_rewards = beta * (pr - rr)
    chosen_losses = -F.logsigmoid(chosen_rewards - delta)
    rejected_losses = -F.logsigmoid(-(rejected_rewards - delta))
    return chosen_losses.mean() + rejected_losses.mean()


def _torch_get_batch_logps(logits, labels, average=False):
    """trl DPOTrainer.get_batch_logps: shift-by-one, -100 masked,
    per-sequence sum (or mean) of response-token log-probs."""
    logits = logits[:, :-1]
    labels = labels[:, 1:].clone()
    mask = labels != IGNORE_TOKEN_ID
    labels[~mask] = 0
    per_tok = torch.gather(
        logits.log_softmax(-1), 2, labels.unsqueeze(2)
    ).squeeze(2)
    s = (per_tok * mask).sum(-1)
    if average:
        return s / mask.sum(-1)
    return s


@pytest.mark.parametrize("label_smoothing", [0.0, 0.1])
def test_dpo_sigmoid_matches_trl_formula(label_smoothing):
    rng = np.random.default_rng(0)
    pc, pr, rc, rr = (rng.normal(-20, 5, (6,)).astype(np.float32)
                      for _ in range(4))
    want = float(_torch_dpo_sigmoid(
        *(torch.tensor(v) for v in (pc, pr, rc, rr)), beta=0.1,
        label_smoothing=label_smoothing,
    ))
    got = float(dpo_sigmoid_loss(
        jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(rc), jnp.asarray(rr),
        beta=0.1, label_smoothing=label_smoothing,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bco_pair_matches_trl_formula():
    rng = np.random.default_rng(1)
    pc, pr, rc, rr = (rng.normal(-20, 5, (6,)).astype(np.float32)
                      for _ in range(4))
    delta = 0.37
    want = float(_torch_bco_pair(
        *(torch.tensor(v) for v in (pc, pr, rc, rr)), beta=0.1, delta=delta
    ))
    got, rewards = bco_pair_loss(
        jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(rc), jnp.asarray(rr),
        beta=0.1, delta=jnp.asarray(delta),
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)
    # rewards feed RunningMoments exactly as the trainer records them
    want_rewards = np.concatenate([0.1 * (pc - rc), 0.1 * (pr - rr)])
    np.testing.assert_allclose(np.asarray(rewards), want_rewards, rtol=1e-5)


def test_sequence_logprobs_matches_get_batch_logps():
    rng = np.random.default_rng(2)
    B, N, V = 3, 12, 50
    logits = rng.normal(0, 2, (B, N, V)).astype(np.float32)
    labels = rng.integers(0, V, (B, N))
    labels[:, :5] = IGNORE_TOKEN_ID  # prompt tokens
    labels[0, 9:] = IGNORE_TOKEN_ID  # padding tail
    for average in (False, True):
        want = _torch_get_batch_logps(
            torch.tensor(logits), torch.tensor(labels), average=average
        ).numpy()
        got = np.asarray(sequence_logprobs(
            jnp.asarray(logits), jnp.asarray(labels), average=average
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_running_moments_matches_reference_update():
    """RunningMoments tracks the plain running mean the reference shifts
    BCO rewards by (trainer_dpo.py RunningMoments usage)."""
    rm = RunningMoments()
    vals = [np.array([1.0, 3.0]), np.array([5.0]), np.array([-2.0, 0.0])]
    flat = np.concatenate(vals)
    for v in vals:
        last = rm.update(v)
    np.testing.assert_allclose(last, flat.mean(), rtol=1e-6)


# -- pretrain stage freeze masks (scripts/pretrain.py STAGE_DEFAULTS) -------

def _one_update(frozen_patterns):
    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.optim import make_optimizer

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(5)
    npt = cfg.num_image_token
    ids = rng.integers(1, 400, (1, 8 + npt))
    ids[0, 2 : 2 + npt] = cfg.img_context_token_id
    pixels = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(pixels), jnp.asarray([1], np.int32))
    tx = make_optimizer(1e-2, frozen_patterns=frozen_patterns, params=params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    import optax

    upd, _ = tx.update(grads, tx.init(params), params)
    new = optax.apply_updates(params, upd)
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_leaves(new)
    moved = {}
    for (path, old), nv in zip(flat_old, flat_new):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        moved[key] = bool(np.any(np.asarray(old) != np.asarray(nv)))
    return moved


def test_pretrain_stage_freeze_masks():
    """Stage 1 (projector warmup): ONLY mlp1 moves — ViT and LLM params are
    bit-identical after an optimizer update with all-ones grads. Stage 1.5:
    the LLM moves too, the ViT still does not. Mirrors the reference's
    freeze flags in the pretrain recipes (internvl_chat pretrain shells:
    freeze_llm/freeze_backbone)."""
    stage1 = _one_update((r"vision_model/", r"language_model/"))
    assert any(m for k, m in stage1.items() if "mlp1" in k)
    assert not any(m for k, m in stage1.items() if "vision_model" in k)
    assert not any(m for k, m in stage1.items() if "language_model" in k)

    stage15 = _one_update((r"vision_model/",))
    assert any(m for k, m in stage15.items() if "mlp1" in k)
    assert any(m for k, m in stage15.items() if "language_model" in k)
    assert not any(m for k, m in stage15.items() if "vision_model" in k)
