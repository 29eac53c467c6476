"""MPO (Mixed Preference Optimization): DPO + BCO quality + SFT losses.

Parity surface: internvl/train/internvl_chat_mpo.py (loss_type
'sigmoid,bco_pair' with sigmoid_loss_weight / bco_pair_loss_weight, plus SFT
CE on the chosen response) and trainer_dpo.py MultimodalDPOTrainer
(concatenated chosen/rejected forward :99, RunningMoments reward shift for
BCO). All losses are functional over per-sequence log-probs; the reference
(frozen) policy's log-probs come from a stop-gradient forward with the same
model and reference params.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

IGNORE_TOKEN_ID = -100


@dataclass(frozen=True)
class MPOConfig:
    beta: float = 0.1
    sigmoid_loss_weight: float = 0.8
    bco_pair_loss_weight: float = 0.2
    sft_loss_weight: float = 1.0
    label_smoothing: float = 0.0


def sequence_logprobs(
    logits: jax.Array,  # [B, N, V]
    labels: jax.Array,  # [B, N] with -100 on non-response tokens
    average: bool = False,
) -> jax.Array:
    """Sum (or mean) of response-token log-probs, shift-by-one."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_TOKEN_ID
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    tok = tok * valid
    s = jnp.sum(tok, axis=-1)
    if average:
        return s / jnp.maximum(jnp.sum(valid, axis=-1), 1)
    return s


def dpo_sigmoid_loss(
    policy_chosen_lp, policy_rejected_lp, ref_chosen_lp, ref_rejected_lp,
    beta: float, label_smoothing: float = 0.0,
):
    """trl sigmoid DPO."""
    logits = (policy_chosen_lp - policy_rejected_lp) - (
        ref_chosen_lp - ref_rejected_lp
    )
    return jnp.mean(
        -jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
        - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
    )


def bco_pair_loss(
    policy_chosen_lp, policy_rejected_lp, ref_chosen_lp, ref_rejected_lp,
    beta: float, delta: jax.Array,
):
    """BCO pair loss with running reward shift `delta` (trl bco_pair)."""
    chosen_r = beta * (policy_chosen_lp - ref_chosen_lp)
    rejected_r = beta * (policy_rejected_lp - ref_rejected_lp)
    loss = jnp.mean(-jax.nn.log_sigmoid(chosen_r - delta)) + jnp.mean(
        -jax.nn.log_sigmoid(-(rejected_r - delta))
    )
    return loss, jnp.concatenate([chosen_r, rejected_r])


class RunningMoments:
    """Running mean of rewards for the BCO shift (trainer_dpo.py:30)."""

    def __init__(self):
        self.mean = 0.0
        self.count = 1e-8

    def update(self, values) -> float:
        import numpy as np

        v = np.asarray(values)
        n = v.size
        self.mean = (self.mean * self.count + v.sum()) / (self.count + n)
        self.count += n
        return float(self.mean)


def make_mpo_loss(model, cfg: MPOConfig):
    """loss_fn(params, ref_params, batch, delta) -> (loss, metrics).

    batch: chosen_/rejected_ {input_ids, labels, seg_ids} + shared
    pixel_values/image_flags (chosen and rejected share the images; the
    forward runs on the concatenated batch like concatenated_forward:99).
    """

    def forward_lp(params, ids, labels, seg, pixels, flags):
        logits, _, _ = model.apply(params, ids, pixels, flags, seg_ids=seg)
        return sequence_logprobs(logits, labels), logits

    def loss_fn(params, ref_params, batch, delta):
        ids = jnp.concatenate(
            [batch["chosen_input_ids"], batch["rejected_input_ids"]], 0
        )
        labels = jnp.concatenate(
            [batch["chosen_labels"], batch["rejected_labels"]], 0
        )
        seg = jnp.concatenate([batch["chosen_seg_ids"], batch["rejected_seg_ids"]], 0)
        pixels = jnp.concatenate([batch["pixel_values"], batch["pixel_values"]], 0)
        flags = jnp.concatenate([batch["image_flags"], batch["image_flags"]], 0)
        b = batch["chosen_input_ids"].shape[0]

        lp, logits = forward_lp(params, ids, labels, seg, pixels, flags)
        ref_lp, _ = forward_lp(
            jax.lax.stop_gradient(ref_params), ids, labels, seg, pixels, flags
        )
        ref_lp = jax.lax.stop_gradient(ref_lp)
        pc, pr = lp[:b], lp[b:]
        rc, rr = ref_lp[:b], ref_lp[b:]

        l_dpo = dpo_sigmoid_loss(pc, pr, rc, rr, cfg.beta, cfg.label_smoothing)
        l_bco, rewards = bco_pair_loss(pc, pr, rc, rr, cfg.beta, delta)
        # SFT on chosen responses
        from .losses import weighted_ce_loss

        l_sft = weighted_ce_loss(logits[:b], batch["chosen_labels"])
        loss = (
            cfg.sigmoid_loss_weight * l_dpo
            + cfg.bco_pair_loss_weight * l_bco
            + cfg.sft_loss_weight * l_sft
        )
        metrics = {
            "dpo_loss": l_dpo,
            "bco_loss": l_bco,
            "sft_loss": l_sft,
            "reward_margin": jnp.mean(cfg.beta * ((pc - rc) - (pr - rr))),
            "reward_accuracy": jnp.mean(((pc - rc) > (pr - rr)).astype(jnp.float32)),
            "rewards": rewards,
        }
        return loss, metrics

    return loss_fn


class MPOTrainer:
    """Runnable MPO loop (internvl_chat_mpo.py recipe): frozen reference
    params copy, jitted concatenated-forward step, BCO running reward shift
    updated host-side between steps."""

    def __init__(self, model, params, cfg: MPOConfig, train_cfg=None, mesh=None):
        import optax

        from ..core import mesh as mesh_lib
        from ..train.optim import make_optimizer, warmup_cosine
        from ..train.train_step import TrainState, shard_train_state

        from .trainer import TrainConfig  # local import to avoid cycle

        self.model = model
        self.cfg = cfg
        self.train_cfg = train_cfg or TrainConfig()
        tc = self.train_cfg
        schedule = warmup_cosine(tc.learning_rate, tc.total_steps, tc.warmup_ratio)
        frozen = [r"vision_model/"] if tc.freeze_vision else []
        self.tx = make_optimizer(
            schedule, weight_decay=tc.weight_decay, grad_clip=tc.grad_clip,
            frozen_patterns=tuple(frozen), params=params,
        )
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            fsdp=tc.mesh_fsdp, tp=tc.mesh_tp
        )
        state = TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))
        self.state, _ = shard_train_state(state, self.mesh)
        # frozen reference policy = a REAL copy of the initial params
        # (device_put would alias the live buffers, which the donating step
        # then invalidates — f(donate(a), a))
        self.ref_params = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t)
        )(self.state.params)
        self.running = RunningMoments()

        loss_fn = make_mpo_loss(model, cfg)

        def step_fn(state, ref_params, batch, delta, rng):
            import optax as _optax

            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_fn(p, ref_params, batch, delta), has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = _optax.apply_updates(state.params, updates)
            metrics = dict(metrics, loss=loss,
                           grad_norm=_optax.global_norm(grads))
            return TrainState(new_params, new_opt, state.step + 1), metrics

        self._step = jax.jit(step_fn, donate_argnums=(0,))

    def train(self, batches, num_steps: int):
        import logging

        import numpy as np

        from ..core.distributed import put_global_batch

        logger = logging.getLogger("vlaser_tpu.train")
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(batches):
            if i >= num_steps:
                break
            batch = put_global_batch(batch, self.mesh)
            rng, sub = jax.random.split(rng)
            delta = jnp.asarray(self.running.mean, jnp.float32)
            self.state, metrics = self._step(
                self.state, self.ref_params, batch, delta, sub
            )
            self.running.update(np.asarray(metrics.pop("rewards")))
            step = i + 1
            if step == 1 or step % self.train_cfg.log_every == 0 or step == num_steps:
                logger.info(
                    "mpo step %d loss %.4f dpo %.4f bco %.4f sft %.4f acc %.3f",
                    step, float(metrics["loss"]), float(metrics["dpo_loss"]),
                    float(metrics["bco_loss"]), float(metrics["sft_loss"]),
                    float(metrics["reward_accuracy"]),
                )
        return self.state
