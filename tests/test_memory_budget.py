"""Memory-budget arithmetic: the full-parameter Vlaser-2B-VLA AdamW recipe
must fit a 16 GiB v5e chip on the fsdp meshes (reference recipe: ZeRO-1,
zero_stage1_config.json + internvl3_2b_dynamic_res_2nd_finetune_full.sh).
Fails if a sharding-rule change silently breaks the fit (e.g. round 1's dead
'vit_layers/' rules leaving the 0.3B ViT replicated)."""

import jax
import jax.numpy as jnp

from vlaser_tpu.core import mesh as mesh_lib
from vlaser_tpu.utils.memory_budget import vla_train_budget

V5E_GIB = 16.0
HEADROOM_GIB = 4.0  # XLA scratch, collectives buffers, host transfers


def test_full_param_2b_fits_v5e8_fsdp():
    r = vla_train_budget(dp=1, fsdp=8, tp=1)
    assert r["n_params"] > 2.4e9  # the real model, not a tiny stand-in
    assert r["total_gib"] < V5E_GIB - HEADROOM_GIB, r
    # dp2 x fsdp4 (the throughput-preferred shape) must also fit
    r2 = vla_train_budget(dp=2, fsdp=4, tp=1)
    assert r2["total_gib"] < V5E_GIB - HEADROOM_GIB, r2


def test_fsdp_sharding_actually_engages():
    """fsdp-8 params/device must be well under half the replicated bytes —
    catches dead rules that leave large submodules replicated."""
    flat = vla_train_budget(dp=8, fsdp=1, tp=1)
    sharded = vla_train_budget(dp=1, fsdp=8, tp=1)
    assert sharded["params_gib"] < flat["params_gib"] / 4, (
        sharded["params_gib"], flat["params_gib"],
    )


def test_vit_encoder_rules_match_real_paths():
    """The ViT rules must hit the actual 'vision_model/encoder/...' paths."""
    rules = mesh_lib.default_param_rules()
    spec = mesh_lib.spec_for("vision_model/encoder/attn/qkv/kernel", rules)
    assert spec == jax.sharding.PartitionSpec(
        None, mesh_lib.FSDP_AXIS, mesh_lib.TENSOR_AXIS
    )
    spec2 = mesh_lib.spec_for("vision_model/encoder/mlp/fc2/kernel", rules)
    assert spec2 == jax.sharding.PartitionSpec(
        None, mesh_lib.TENSOR_AXIS, mesh_lib.FSDP_AXIS
    )
    # the projector stays off the fsdp contracting dim (remat regression)
    mlp1 = mesh_lib.spec_for("mlp1/fc2/kernel", rules)
    assert mlp1 == jax.sharding.PartitionSpec(None, mesh_lib.TENSOR_AXIS)


def test_frozen_vit_recipe_is_cheaper():
    full = vla_train_budget(dp=1, fsdp=8, tp=1)
    frozen = vla_train_budget(dp=1, fsdp=8, tp=1,
                              frozen_patterns=(r"vision_model/",))
    assert frozen["grads_gib"] < full["grads_gib"]
    assert frozen["moments_gib"] < full["moments_gib"]
    assert frozen["params_gib"] == full["params_gib"]


def test_8b_recipes():
    """Vlaser-8B-VLA (7.94B params): full-parameter fp32 AdamW needs a
    v5e-32 (2x16 mesh, ~8.1 GiB/chip); the v5e-8 recipes that fit are
    bf16-param variants. The reference trains 8B on 4x8 GPUs
    (slurm/train_internvl.sh:23-42) — same arithmetic."""
    pod32 = vla_train_budget(dp=2, fsdp=16, tp=1, model_size="8b")
    assert pod32["n_params"] > 7.5e9
    assert pod32["total_gib"] < V5E_GIB - HEADROOM_GIB, pod32
    v5e8_fp32 = vla_train_budget(dp=1, fsdp=8, tp=1, model_size="8b")
    assert v5e8_fp32["total_gib"] > V5E_GIB - HEADROOM_GIB  # documented no-fit
    v5e8_bf16 = vla_train_budget(dp=1, fsdp=8, tp=1, model_size="8b",
                                 param_bytes=2,
                                 frozen_patterns=(r"vision_model/",))
    assert v5e8_bf16["total_gib"] < V5E_GIB - 2.0, v5e8_bf16
