"""Per-device HBM budget arithmetic for training recipes.

Proves (without allocating anything) that a train-state layout fits a target
chip: jax.eval_shape gives exact param shapes/dtypes, core/mesh.tree_shardings
gives each leaf's PartitionSpec, and the shard byte count follows. The
reference's equivalent knob is its ZeRO-1 recipe
(zero_stage1_config.json, internvl3_2b_dynamic_res_2nd_finetune_full.sh:67);
here ZeRO == sharding params/grads/moments over the 'fsdp' axis.

Used by tests/test_memory_budget.py (fails if a sharding-rule change breaks
the v5e-8 full-parameter fit) and the table in docs/STATUS.md.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np

from ..core import mesh as mesh_lib


def _shard_denominator(spec, shape, mesh) -> int:
    """How many ways the leaf is split (validated like tree_shardings)."""
    denom = 1
    for d, names in enumerate(tuple(spec)[: len(shape)]):
        if names is None:
            continue
        names_t = names if isinstance(names, tuple) else (names,)
        size = int(np.prod([mesh.shape[n] for n in names_t]))
        if shape[d] % size == 0:
            denom *= size
    return denom


def sharded_bytes_per_device(shapes_tree, mesh, rules) -> int:
    """Total bytes/device of a pytree of ShapeDtypeStructs under path rules."""
    total = 0

    def one(path, leaf):
        nonlocal total
        spec = mesh_lib.spec_for(mesh_lib._path_str(path), rules)
        nbytes = int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
        total += nbytes // _shard_denominator(spec, leaf.shape, mesh)

    jax.tree_util.tree_map_with_path(one, shapes_tree)
    return total


def count_params(shapes_tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes_tree))


def vla_train_budget(
    dp: int,
    fsdp: int,
    tp: int,
    per_device_batch: int = 1,
    param_bytes: int = 4,
    frozen_patterns: Sequence[str] = (),
    model_size: str = "2b",  # '2b' | '8b'
) -> Dict[str, float]:
    """Full-parameter Vlaser-2B/8B-VLA AdamW budget on a dp x fsdp x tp mesh.

    Returns GiB per device for params / grads / adam moments / a remat
    activation estimate, plus the total. Train state mirrors
    scripts/train_vla.py: fp32 params (param_bytes=4), fp32 grads+moments
    (optax.adamw), bf16 compute with per-layer remat. frozen_patterns remove
    grads+moments for matching paths (e.g. the frozen ViT recipe).

    The activation term is analytic, not compiled: with nn.remat over the
    joint scan, the live set at the backward of layer i is the checkpointed
    per-layer stream inputs (all layers) + one layer's internals
    (qkv/attention probs/mlp hidden in bf16), plus the un-remat'd ViT
    forward. It over-counts attention (flash kernel never materializes S^2)
    — a deliberate safety margin.
    """
    import re

    import jax.numpy as jnp

    from ..core.config import vlaser_2b_vla, vlaser_8b, action_expert_8b, VLAConfig
    from ..policy.pizero import PiZeroVLA

    if model_size == "8b":
        cfg = VLAConfig(vlm=vlaser_8b(151674 + 256), expert=action_expert_8b())
    else:
        cfg = vlaser_2b_vla()
    model = PiZeroVLA(cfg, param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    B, S = 1, cfg.max_image_text_tokens
    img = cfg.vlm.vision.image_size
    A = cfg.num_action_tokens

    def init():
        ids = jnp.zeros((B, S), jnp.int32)
        return model.init(
            jax.random.PRNGKey(0), ids,
            jnp.zeros((B, img, img, 3), jnp.float32),
            jnp.ones((B, S), jnp.int32),
            jnp.zeros((B, cfg.cond_steps, cfg.proprio_dim), jnp.float32),
            jnp.zeros((B, A, cfg.action_dim), jnp.float32),
            jnp.zeros((B,), jnp.float32),
            jnp.zeros((B, A, cfg.action_dim), jnp.float32),
        )

    shapes = jax.eval_shape(init)
    mesh = _abstract_mesh(dp, fsdp, tp)
    rules = mesh_lib.default_param_rules()

    def cast(tree, dtype_bytes):
        dt = {4: np.float32, 2: jnp.bfloat16}[dtype_bytes]
        return jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct(l.shape, dt), tree
        )

    def drop_frozen(tree):
        if not frozen_patterns:
            return tree
        flat = jax.tree_util.tree_flatten_with_path(tree)
        kept = {}
        for path, leaf in flat[0]:
            ps = mesh_lib._path_str(path)
            if not any(re.search(p, ps) for p in frozen_patterns):
                kept[ps] = leaf
        return kept  # flat dict: paths preserved for rule matching

    params_b = sharded_bytes_per_device(cast(shapes, param_bytes), mesh, rules)
    trainable = drop_frozen(shapes)
    grads_b = sharded_bytes_per_device(cast(trainable, 4), mesh, rules)
    moments_b = 2 * grads_b

    # activation estimate (bf16 = 2 bytes), per device batch
    b = per_device_batch
    L = cfg.vlm.llm.num_layers
    h_v, h_e = cfg.vlm.llm.hidden_size, cfg.expert.hidden_size
    q_heads, hd = cfg.vlm.llm.num_heads, cfg.vlm.llm.head_dim
    Spa = cfg.num_proprio_tokens + A
    ckpt = L * b * (S * h_v + Spa * h_e) * 2  # remat'd per-layer stream inputs
    S_tot = S + Spa
    layer_live = b * (
        3 * S_tot * q_heads * hd  # q/k/v
        + q_heads * S_tot * S_tot  # attention probs (over-count vs flash)
        + 2 * S * cfg.vlm.llm.intermediate_size  # vlm mlp gate/up
        + 2 * Spa * cfg.expert.intermediate_size
    ) * 2
    vcfg = cfg.vlm.vision
    S_vit = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
    vit_live = (
        vcfg.num_layers * b * S_vit * vcfg.hidden_size * 2 * 3
    )  # un-remat'd ViT forward (x, attn out, mlp) per layer
    acts_b = ckpt + layer_live + vit_live

    GiB = 1024**3
    out = {
        "mesh": f"{dp}x{fsdp}x{tp}",
        "n_params": count_params(shapes),
        "params_gib": params_b / GiB,
        "grads_gib": grads_b / GiB,
        "moments_gib": moments_b / GiB,
        "acts_gib": acts_b / GiB,
    }
    out["total_gib"] = sum(v for k, v in out.items() if k.endswith("_gib"))
    return out


def _abstract_mesh(dp: int, fsdp: int, tp: int, pp: int = 1):
    """A mesh-shaped stand-in usable off-device (only .shape is consulted)."""

    class _M:
        shape = {
            mesh_lib.DATA_AXIS: dp,
            mesh_lib.FSDP_AXIS: fsdp,
            mesh_lib.TENSOR_AXIS: tp,
            mesh_lib.STAGE_AXIS: pp,
        }

    return _M()


def vlm_sft_budget(
    dp: int,
    fsdp: int,
    tp: int,
    pp: int = 1,
    cp: int = 1,
    per_device_batch: int = 1,
    seq_len: int = 4096,
    n_microbatches: int = 8,
    param_bytes: int = 4,
    frozen_patterns: Sequence[str] = (),
    model_size: str = "38b",  # '2b'|'8b'|'30b-a3b'|'38b'|'78b'|'100b'
    offload_optimizer: bool = False,
) -> Dict[str, float]:
    """Full-parameter VLM SFT AdamW budget on a dp x fsdp x (pp) x tp mesh.

    The 34B+ tier (internvl3_38b: InternViT-6B + Qwen2.5-32B — the tier the
    reference serves with zero_stage3_config.json) adds the stage axis:
    scanned layer params/grads/moments split over `pp` stages
    (core/mesh.stageify_rules + train/pipeline.py), composing with fsdp
    inside each stage. Activation arithmetic assumes the pipeline's GPipe
    schedule: per-layer remat checkpoints for the local L/pp layers across
    the whole per-device batch, plus one microbatch's layer internals
    (flash attention is O(S) — no S^2 probs term here, unlike the
    deliberately-overcounting VLA estimate above).

    offload_optimizer is the analogue of the reference's
    zero_stage3_config_100b_1e7_offload.json (`offload_optimizer:
    device=cpu`): the Adam moments live in host RAM (the sharded update
    streams them through the chip per step instead of residing in HBM);
    the device total then excludes them and `host_offload_gib` reports the
    per-host bill (moments of the local shard).
    """
    import re

    import jax.numpy as jnp

    from ..core.config import (
        internvl3_5_30b_a3b, internvl3_38b, internvl3_78b,
        internvl_100b_class, vlaser_2b, vlaser_8b,
    )
    from ..models.vlm import InternVLChatModel

    cfg = {"2b": vlaser_2b, "8b": vlaser_8b, "38b": internvl3_38b,
           "30b-a3b": internvl3_5_30b_a3b, "78b": internvl3_78b,
           "100b": internvl_100b_class}[model_size]()
    model = InternVLChatModel(cfg, param_dtype=jnp.float32,
                              compute_dtype=jnp.bfloat16)
    npt = cfg.num_image_token

    def init():
        ids = jnp.zeros((1, max(seq_len // 8, npt + 2)), jnp.int32)
        img = cfg.vision.image_size
        return model.init(
            jax.random.PRNGKey(0), ids,
            jnp.zeros((1, img, img, 3), jnp.float32),
            jnp.ones((1,), jnp.int32),
        )

    shapes = jax.eval_shape(init)
    mesh = _abstract_mesh(dp, fsdp, tp, pp)
    rules = mesh_lib.default_param_rules()
    if pp > 1:
        rules = mesh_lib.stageify_rules(rules)

    def cast(tree, dtype_bytes):
        dt = {4: np.float32, 2: jnp.bfloat16}[dtype_bytes]
        return jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct(l.shape, dt), tree
        )

    def drop_frozen(tree):
        if not frozen_patterns:
            return tree
        flat = jax.tree_util.tree_flatten_with_path(tree)
        kept = {}
        for path, leaf in flat[0]:
            ps = mesh_lib._path_str(path)
            if not any(re.search(p, ps) for p in frozen_patterns):
                kept[ps] = leaf
        return kept

    params_b = sharded_bytes_per_device(cast(shapes, param_bytes), mesh, rules)
    trainable = drop_frozen(shapes)
    grads_b = sharded_bytes_per_device(cast(trainable, 4), mesh, rules)
    moments_b = 2 * grads_b

    # context parallelism (kernels/ring_attention.py) shards the sequence
    # over the cp axis: every per-token activation term divides by cp (the
    # ring holds one visiting K/V chunk at a time — O(S/cp) per chip)
    b, S = per_device_batch, seq_len // cp
    llm = cfg.llm
    L_local = llm.num_layers // pp if pp > 1 else llm.num_layers
    mb = max(1, b // n_microbatches) if pp > 1 else b
    ckpt = L_local * b * S * llm.hidden_size * 2
    # sparse MoE: each token activates k experts of moe_intermediate width
    mlp_width = (
        llm.num_experts_per_tok * (llm.moe_intermediate_size
                                   or llm.intermediate_size)
        if llm.num_experts > 0 else llm.intermediate_size
    )
    layer_live = mb * S * (
        3 * llm.num_heads * llm.head_dim  # q + attention O(S) live
        + 2 * llm.num_kv_heads * llm.head_dim
        + 2 * mlp_width  # gate/up
    ) * 2
    vcfg = cfg.vision
    S_vit = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
    vit_live = vcfg.num_layers * b * S_vit * vcfg.hidden_size * 2 * 3
    acts_b = ckpt + layer_live + vit_live

    GiB = 1024**3
    out = {
        "mesh": f"{dp}x{fsdp}x{pp}x{cp}x{tp}",
        "n_params": count_params(shapes),
        "params_gib": params_b / GiB,
        "grads_gib": grads_b / GiB,
        "moments_gib": 0.0 if offload_optimizer else moments_b / GiB,
        "acts_gib": acts_b / GiB,
    }
    out["total_gib"] = sum(v for k, v in out.items() if k.endswith("_gib"))
    if offload_optimizer:
        # per-host bill: the local shard's moments (a v5e host drives 8
        # chips, so 8 device-shards of moments live in that host's RAM)
        out["host_offload_gib"] = 8 * moments_b / GiB
    return out
