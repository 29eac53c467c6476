"""Memory-budget arithmetic: the full-parameter Vlaser-2B-VLA AdamW recipe
must fit a 16 GiB v5e chip on the fsdp meshes (reference recipe: ZeRO-1,
zero_stage1_config.json + internvl3_2b_dynamic_res_2nd_finetune_full.sh).
Fails if a sharding-rule change silently breaks the fit (e.g. round 1's dead
'vit_layers/' rules leaving the 0.3B ViT replicated)."""

import jax
import jax.numpy as jnp

from vlaser_tpu.core import mesh as mesh_lib
from vlaser_tpu.utils.memory_budget import vla_train_budget, vlm_sft_budget

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


def test_38b_pipeline_recipes():
    """internvl3_38b (38.4B params: InternViT-6B + Qwen2.5-32B — the tier
    the reference serves with zero_stage3_config.json): full-parameter
    fp32 AdamW fits a v5e-64 both as pure fsdp and as fsdp x stage
    (train/pipeline.py GPipe schedule), and the 16k-seq recipe fits a
    v5e-128; a v5e-32 is a documented no-fit even at bf16 params."""
    pod64_fsdp = vlm_sft_budget(dp=1, fsdp=16, tp=4, pp=1, seq_len=4096)
    assert pod64_fsdp["n_params"] > 38e9
    # tighter headroom than the 2B rows: 38B at 64 chips is the dense-fit
    # frontier (~14.3 GiB + XLA workspace)
    assert pod64_fsdp["total_gib"] < V5E_GIB - 1.5, pod64_fsdp
    pod64_pp = vlm_sft_budget(dp=1, fsdp=16, tp=2, pp=2, seq_len=4096)
    assert pod64_pp["total_gib"] < V5E_GIB - 1.5, pod64_pp
    # stage axis actually shards the layer stack (params shrink vs pp=1
    # at the same fsdp x tp)
    base = vlm_sft_budget(dp=2, fsdp=16, tp=2, pp=1, seq_len=4096)
    assert pod64_pp["params_gib"] < base["params_gib"]
    pod128_16k = vlm_sft_budget(dp=1, fsdp=16, tp=4, pp=2, seq_len=16384)
    assert pod128_16k["total_gib"] < V5E_GIB - 1.0, pod128_16k
    pod32 = vlm_sft_budget(dp=1, fsdp=8, tp=4, pp=1, seq_len=4096,
                           param_bytes=2)
    assert pod32["total_gib"] > V5E_GIB  # documented no-fit


def test_30b_a3b_moe_recipes():
    """internvl3_5_30b_a3b (30.85B params, 128-expert MoE): full-param
    fp32 AdamW fits a v5e-64 at ~8.4 GiB/chip (fsdp x stage x tensor,
    experts sharded over tensor by the EP rules); the v5e-32 row is a
    documented tight no-fit (15.7 + headroom)."""
    pod64 = vlm_sft_budget(dp=1, fsdp=16, tp=2, pp=2, seq_len=4096,
                           model_size="30b-a3b")
    assert pod64["n_params"] > 30e9
    assert pod64["total_gib"] < V5E_GIB - 4.0, pod64
    pod32 = vlm_sft_budget(dp=1, fsdp=8, tp=4, pp=1, seq_len=4096,
                           model_size="30b-a3b")
    assert pod32["total_gib"] > V5E_GIB - 1.0  # no-fit with headroom


def test_78b_tier_recipes():
    """internvl3_78b (78.4B params: InternViT-6B + Qwen2.5-72B — the tier
    the reference provisions with zero_stage3_config_70b.json): full-param
    fp32 AdamW fits a v5e-256 (fsdp32 x pp4 x tp2, ~10.1 GiB/chip); a
    v5e-128 is a documented no-fit unless the Adam moments offload to host
    RAM (the DeepSpeed offload_optimizer analogue)."""
    pod256 = vlm_sft_budget(dp=1, fsdp=32, tp=2, pp=4, seq_len=4096,
                            model_size="78b")
    assert pod256["n_params"] > 78e9
    assert pod256["total_gib"] < V5E_GIB - 4.0, pod256
    pod128 = vlm_sft_budget(dp=1, fsdp=32, tp=2, pp=2, seq_len=4096,
                            model_size="78b")
    assert pod128["total_gib"] > V5E_GIB - 1.5  # documented no-fit
    pod128_off = vlm_sft_budget(dp=1, fsdp=32, tp=2, pp=2, seq_len=4096,
                                model_size="78b", offload_optimizer=True)
    assert pod128_off["total_gib"] < V5E_GIB - 4.0, pod128_off
    assert pod128_off["host_offload_gib"] < 96.0  # fits a v5e host's RAM


def test_100b_tier_offload_recipes():
    """The ~100B class (internvl_100b_class — the reference's
    zero_stage3_config_100b_*.json tier): full-param fp32 AdamW fits a
    v5e-256 plainly, and a v5e-128 ONLY with the optimizer-state host
    offload — the exact role of the reference's _offload config variant
    (zero_stage3_config_100b_1e7_offload.json)."""
    pod256 = vlm_sft_budget(dp=1, fsdp=32, tp=2, pp=4, seq_len=4096,
                            model_size="100b")
    assert pod256["n_params"] > 100e9
    assert pod256["total_gib"] < V5E_GIB - 3.0, pod256
    pod128 = vlm_sft_budget(dp=1, fsdp=32, tp=2, pp=2, seq_len=4096,
                            model_size="100b")
    assert pod128["total_gib"] > V5E_GIB  # no-fit without offload
    pod128_off = vlm_sft_budget(dp=1, fsdp=32, tp=2, pp=2, seq_len=4096,
                                model_size="100b", offload_optimizer=True)
    assert pod128_off["total_gib"] < V5E_GIB - 3.0, pod128_off
    assert pod128_off["moments_gib"] == 0.0
    assert 30.0 < pod128_off["host_offload_gib"] < 96.0


def test_context_parallel_unlocks_128k_seq():
    """CP divides every per-token activation term: 128k-token full-param
    Vlaser-2B SFT does not fit a single v5e chip's activation budget but
    fits with the sequence ring-sharded over 8 (the long-context
    capability the reference lacks — SURVEY §5 caps max_seq at 16384)."""
    no_cp = vlm_sft_budget(dp=1, fsdp=8, tp=1, cp=1, seq_len=131072,
                           model_size="2b")
    with_cp = vlm_sft_budget(dp=1, fsdp=1, tp=1, cp=8, seq_len=131072,
                             model_size="2b")
    assert no_cp["acts_gib"] > V5E_GIB  # activations alone blow the chip
    assert with_cp["acts_gib"] < V5E_GIB / 4
    assert with_cp["acts_gib"] * 7.0 < no_cp["acts_gib"]  # ~7.5x (ViT term is S-independent)
