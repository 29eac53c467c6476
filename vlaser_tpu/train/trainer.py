"""Trainer loops: VLM SFT and VLA flow-matching.

Replaces the reference's three control loops with two mesh-aware drivers:
- SFTTrainer ~ HF Trainer wiring (internvl_chat_finetune.py:1029-1057):
  freeze policy (ViT frozen for the Vlaser recipe), cosine warmup schedule,
  packing or padded batching, periodic orbax checkpoints with data-stream
  resume.
- VLATrainer ~ TrainAgent (src/agent/train.py:49-345): two optimizer groups
  (action expert + VLM) with separate lrs via optax.multi_transform,
  cosine-warmup-restarts, beta flow-time sampling, grad accumulation,
  EMA/SWA, eval = action accuracy @ thresholds + L1.

Distribution is entirely GSPMD: shard_train_state + shard_batch; no DDP/ZeRO
machinery. Loops are host-side thin; each step is one jit call.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import mesh as mesh_lib
from ..core.distributed import put_global_batch
from ..policy.flow import make_flow_loss
from ..train.losses import make_sft_loss
from ..train.metrics import action_accuracy, action_l1
from ..train.model_averaging import AveragingConfig, ModelAveraging
from ..train.optim import cosine_warmup_restarts, make_optimizer, warmup_cosine
from ..train.train_step import TrainState, make_train_step, shard_train_state
from ..utils.monitoring import Timer, log

logger = logging.getLogger("vlaser_tpu.train")


@dataclass
class TrainConfig:
    learning_rate: float = 2e-5
    total_steps: int = 1000
    warmup_ratio: float = 0.03
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    accum_steps: int = 1
    freeze_vision: bool = True  # Vlaser SFT recipe: ViT frozen
    freeze_llm: bool = False
    log_every: int = 10
    save_every: int = 500
    checkpoint_dir: Optional[str] = None
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    # context parallelism (ring attention): shard the sequence over a
    # 'context' mesh axis. Requires the model's
    # LLMConfig.context_parallel_axis="context" (scripts/train_sft.py --cp
    # wires both). Capability beyond the reference — SURVEY §5.
    mesh_cp: int = 1
    # router load-balancing coefficient for MoE backbones (models/moe.py;
    # HF qwen3_moe router_aux_loss_coef is 1e-3)
    moe_aux_coef: float = 0.0
    # capture a device trace (XLA/TensorBoard format) over
    # [profile_start, profile_start+profile_steps) — the reference's
    # torch.profiler/nsys role (SURVEY §5 profiling); view with
    # tensorboard --logdir or xprof
    profile_dir: Optional[str] = None
    profile_start: int = 5
    profile_steps: int = 3
    # JSONL scalar log (utils/monitoring.MetricsWriter) — the reference's
    # wandb/tensorboard role
    metrics_path: Optional[str] = None


class SFTTrainer:
    def __init__(self, model, params, cfg: TrainConfig, mesh=None):
        self.model = model
        self.cfg = cfg
        frozen = []
        if cfg.freeze_vision:
            frozen.append(r"vision_model/")
        if cfg.freeze_llm:
            frozen.append(r"language_model/")
        schedule = warmup_cosine(cfg.learning_rate, cfg.total_steps, cfg.warmup_ratio)
        self.tx = make_optimizer(
            schedule, weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip,
            frozen_patterns=tuple(frozen), params=params,
        )
        state = TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            fsdp=cfg.mesh_fsdp, tp=cfg.mesh_tp, cp=cfg.mesh_cp
        )
        self.state, _ = shard_train_state(state, self.mesh)
        self.step_fn = make_train_step(
            make_sft_loss(model, moe_aux_coef=cfg.moe_aux_coef), self.tx,
            accum_steps=cfg.accum_steps,
        )
        self.rng = jax.random.PRNGKey(0)

    def _mesh_ctx(self):
        # ring attention's shard_map needs the ambient mesh at trace time;
        # plain GSPMD paths don't, so only enter it when a context axis
        # exists (3-axis meshes stay exactly as before)
        import contextlib

        if self.mesh.shape.get(mesh_lib.CONTEXT_AXIS, 1) > 1:
            return jax.set_mesh(self.mesh)
        return contextlib.nullcontext()

    def train(self, batches: Iterator[Dict[str, np.ndarray]],
              data_state_fn: Optional[Callable[[], Dict]] = None,
              preemption_guard=None):
        """preemption_guard: an entered utils.preemption.PreemptionGuard —
        when its signal fires the loop finishes the current step, writes a
        final checkpoint (if checkpoint_dir is set) and returns, instead of
        dying mid-run with everything since the last periodic save lost."""
        cfg = self.cfg
        timer = Timer()
        profiling = False
        writer = None
        if cfg.metrics_path:
            from ..utils.monitoring import MetricsWriter

            writer = MetricsWriter(cfg.metrics_path)
        for i, batch in enumerate(batches):
            if i >= cfg.total_steps:
                break
            if cfg.profile_dir and i == cfg.profile_start:
                try:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                except Exception:  # tunnel/backends without profiler support
                    logger.warning("profiler trace unavailable", exc_info=True)
            # local slice -> global array (multihost-aware; core/distributed)
            batch = put_global_batch(batch, self.mesh)
            self.rng, sub = jax.random.split(self.rng)
            with self._mesh_ctx():
                self.state, metrics = self.step_fn(self.state, batch, sub)
            step = i + 1
            if profiling and i + 1 == cfg.profile_start + cfg.profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                logger.info("profiler trace written to %s", cfg.profile_dir)
            if step == 1 or step % cfg.log_every == 0 or step == cfg.total_steps:
                logger.info(
                    "step %d loss %.4f gnorm %.3f (%.2fs/it)",
                    step, float(metrics["loss"]), float(metrics["grad_norm"]),
                    timer() / cfg.log_every,
                )
                if writer is not None:
                    writer.write(step, loss=float(metrics["loss"]),
                                 grad_norm=float(metrics["grad_norm"]))
            if cfg.checkpoint_dir and step % cfg.save_every == 0:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(
                    cfg.checkpoint_dir, step, self.state,
                    data_state=data_state_fn() if data_state_fn else None,
                )
            if preemption_guard is not None and preemption_guard.should_stop():
                logger.warning("preemption: checkpointing at step %d and "
                               "stopping", step)
                if cfg.checkpoint_dir and step % cfg.save_every != 0:
                    from ..utils.checkpoint import save_checkpoint

                    save_checkpoint(
                        cfg.checkpoint_dir, step, self.state,
                        data_state=data_state_fn() if data_state_fn else None,
                    )
                break
        if profiling:  # loop ended inside the profile window
            jax.profiler.stop_trace()
        if writer is not None:
            writer.close()
        return self.state


@dataclass
class VLATrainConfig:
    lr_action: float = 5e-5  # slurm/train_internvl.sh: lr 5e-5 both groups
    lr_vlm: float = 5e-5
    first_cycle_steps: int = 10_000_000
    warmup_steps: int = 100
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    accum_steps: int = 1
    train_vlm: bool = True
    flow_sampling: str = "beta"
    optimizer_8bit: bool = False  # bnb AdamW8bit parity (train/optim8bit.py)
    averaging: AveragingConfig = field(default_factory=AveragingConfig)
    log_every: int = 10
    save_every: int = 1000
    eval_thresholds: Sequence[float] = (0.1, 0.2)
    checkpoint_dir: Optional[str] = None
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    metrics_path: Optional[str] = None  # JSONL scalar log (MetricsWriter)


def _vla_param_groups(params, train_vlm: bool):
    """Label tree: 'action' = expert + encoders/decoder, 'vlm' = everything
    else (train.py:251-294 two-optimizer split)."""

    def one(path, _):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if any(
            s in p
            for s in ("expert", "action_encoder", "action_decoder",
                      "proprio_encoder", "expert_norm")
        ):
            return "action"
        return "vlm" if train_vlm else "frozen"

    return jax.tree_util.tree_map_with_path(one, params)


class VLATrainer:
    def __init__(self, model, params, cfg: VLATrainConfig, mesh=None):
        self.model = model
        self.cfg = cfg
        sched_a = cosine_warmup_restarts(
            cfg.lr_action, cfg.first_cycle_steps, warmup_steps=cfg.warmup_steps
        )
        sched_v = cosine_warmup_restarts(
            cfg.lr_vlm, cfg.first_cycle_steps, warmup_steps=cfg.warmup_steps
        )
        if cfg.optimizer_8bit:
            from .optim8bit import adamw8bit

            mk = lambda sched: optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                adamw8bit(sched, weight_decay=cfg.weight_decay),
            )
        else:
            mk = lambda sched: optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adamw(sched, weight_decay=cfg.weight_decay),
            )
        labels = _vla_param_groups(params, cfg.train_vlm)
        self.tx = optax.multi_transform(
            {"action": mk(sched_a), "vlm": mk(sched_v),
             "frozen": optax.set_to_zero()},
            labels,
        )
        state = TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            fsdp=cfg.mesh_fsdp, tp=cfg.mesh_tp
        )
        self.state, _ = shard_train_state(state, self.mesh)
        self.step_fn = make_train_step(
            make_flow_loss(model, cfg.flow_sampling), self.tx,
            accum_steps=cfg.accum_steps,
        )
        self.averaging = ModelAveraging(cfg.averaging)
        self.rng = jax.random.PRNGKey(0)

        def eval_fn(params, batch, noise):
            pred = model.apply(
                params, batch["input_ids"], batch["pixel_values"],
                batch["text_mask"], batch["proprios"], noise,
                method=model.infer_action,
            )
            gt = batch["actions"][:, -model.cfg.horizon_steps :]
            return action_accuracy(gt, pred, cfg.eval_thresholds), action_l1(gt, pred)

        self._eval_fn = jax.jit(eval_fn)

    def train_steps(self, batches: Iterator[Dict[str, np.ndarray]],
                    num_steps: int):
        cfg = self.cfg
        timer = Timer()
        writer = None
        if cfg.metrics_path:
            from ..utils.monitoring import MetricsWriter

            writer = MetricsWriter(cfg.metrics_path)
        for i, batch in enumerate(batches):
            if i >= num_steps:
                break
            # local slice -> global array (multihost-aware; core/distributed)
            batch = put_global_batch(batch, self.mesh)
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = self.step_fn(self.state, batch, sub)
            step = int(i + 1)
            self.averaging.update(step, self.state.params)
            if step % cfg.log_every == 0:
                logger.info(
                    "vla step %d loss %.4f gnorm %.3f (%.2fs/it)",
                    step, float(metrics["loss"]), float(metrics["grad_norm"]),
                    timer() / cfg.log_every,
                )
                if writer is not None:
                    writer.write(step, loss=float(metrics["loss"]),
                                 grad_norm=float(metrics["grad_norm"]))
            if cfg.checkpoint_dir and step % cfg.save_every == 0:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(cfg.checkpoint_dir, step, self.state)
        if writer is not None:
            writer.close()
        return self.state

    def evaluate(self, batch: Dict[str, np.ndarray], rng=None) -> Dict[str, Any]:
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        b = batch["input_ids"].shape[0]
        noise = jax.random.normal(
            rng, (b, self.model.cfg.num_action_tokens, self.model.cfg.action_dim)
        )
        params = self.averaging.params_for_eval(self.state.params)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        accs, l1 = self._eval_fn(params, batch, noise)
        return {
            "action_accuracy": np.asarray(accs),
            "l1": float(l1),
        }
