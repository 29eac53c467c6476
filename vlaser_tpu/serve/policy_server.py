"""Closed-loop policy serving: the reference's EvalAgent hot loop
(eval.py:69-193, SURVEY.md §3.4) re-built as a resident-cache device server.

Per control step: host camera preprocess (adapter) -> one jitted device call
(ViT prefill + joint prefix + denoise scan) -> host postprocess. The jitted
step is compiled once for fixed shapes (static instruction length via
max_seq_len padding); instruction tokenization is cached per episode; noise
comes from a threaded PRNG key. Device dispatch is asynchronous, so the next
frame's host preprocessing overlaps the current device step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..image.tiling import normalize_uint8


def shard_policy_params(variables, mesh):
    """Tensor-parallel (+fsdp) sharding of policy variables for multi-chip
    serving latency scaling: QKV/MLP columns over the 'tensor' axis via the
    same path rules as training (core/mesh.default_param_rules — the int8
    'quant' collection shards identically: kernel_q follows its kernel's
    spec, [L,1,N] scales degrade to per-column). GSPMD inserts the
    all-reduces; there is no separate serving runtime (SURVEY §2.8 TP row).
    """
    from ..core.mesh import default_param_rules, tree_shardings

    shardings = tree_shardings(variables, mesh, default_param_rules())
    return jax.device_put(variables, shardings)


class PolicyServer:
    def __init__(self, model, params, adapter, processor, act_steps: int = 4,
                 seed: int = 0, mesh=None, fused: bool = False):
        """mesh: optional (data, fsdp, tensor) mesh — params are TP-sharded
        and the jitted step runs under GSPMD. fused: batch-1 single-chip
        serving through the fused int8 denoise path (policy/fused_infer.py;
        requires int8-quantized params).

        Serving default for `params`: quantize with
        core.quant.quantize_for_serving(variables, target="policy") — the
        POLICY_W8A8_* collection (int8 weight streaming on the denoise
        GEMVs, w8a8 int8-MXU on the joint prefix + fused ViT), the
        measured-best single-chip config (docs/STATUS.md round 4;
        bench.py's headline control step is exactly this collection)."""
        self.model = model
        self.params = (shard_policy_params(params, mesh) if mesh is not None
                       else params)
        self.adapter = adapter
        self.processor = processor
        self.act_steps = act_steps
        self.cfg = model.cfg
        self._rng = jax.random.PRNGKey(seed)
        self._instruction: Optional[str] = None
        self._cached_inputs: Optional[Dict[str, np.ndarray]] = None

        # Mesh-aware dispatch: the fused denoise path is one pallas_call per
        # step and does not partition under GSPMD, so on a >1-device mesh we
        # fall back to the XLA infer_action (which GSPMD TP-shards via the
        # params' NamedShardings). Explicit, logged, and tested
        # (tests/test_tp_serving.py) rather than a silent wrong-result path.
        if fused and mesh is not None and mesh.size > 1:
            import logging

            logging.getLogger(__name__).warning(
                "fused serving path is single-chip; mesh has %d devices -> "
                "falling back to the GSPMD (XLA) infer_action path",
                mesh.size,
            )
            fused = False
        self.serving_path = "fused" if fused else "xla"
        if fused:
            from ..policy.fused_infer import make_fused_infer_action

            self._infer = make_fused_infer_action(model)
        else:
            def infer(params, input_ids, pixel_values, text_mask, proprios,
                      noise):
                return model.apply(
                    params, input_ids, pixel_values, text_mask, proprios,
                    noise, method=model.infer_action,
                )

            self._infer = jax.jit(infer)

    def reset(self, instruction: str):
        self.adapter.reset()
        self._instruction = instruction
        proc = self.processor(
            [instruction],
            np.zeros((1, 1, *self.adapter.image_size[::-1], 3), np.uint8),
        )
        self._cached_inputs = {
            "input_ids": jnp.asarray(proc["input_ids"]),
            "text_mask": jnp.asarray(proc["attention_mask"]),
        }

    def step(self, obs: Dict, image: np.ndarray) -> np.ndarray:
        """obs: env observation dict; image: raw camera frame HxWx3 uint8.
        Returns [act_steps, 7] env-space actions."""
        assert self._cached_inputs is not None, "call reset(instruction) first"
        pre = self.adapter.preprocess(obs, image)
        pixels = normalize_uint8(pre["image"][None]).astype(np.float32)
        proprios = pre["proprio"][None, None]  # [1, cond, dim]
        self._rng, sub = jax.random.split(self._rng)
        noise = jax.random.normal(
            sub, (1, self.cfg.num_action_tokens, self.cfg.action_dim), jnp.float32
        )
        actions = self._infer(
            self.params,
            self._cached_inputs["input_ids"],
            jnp.asarray(pixels),
            self._cached_inputs["text_mask"],
            jnp.asarray(proprios),
            noise,
        )
        chunk = np.asarray(actions[0])  # [horizon, action_dim]
        env_actions = self.adapter.postprocess(chunk)
        return env_actions[: self.act_steps]
