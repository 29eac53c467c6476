"""Device mesh + sharding-rule engine.

Replaces the reference's NCCL/DeepSpeed/torchrun launcher zoo
(internvl/dist_utils.py:32-104, zero_stage*_config.json) with a single
jax.sharding.Mesh and path-pattern → PartitionSpec rules. ZeRO-1/3 fall out of
sharding params/optimizer state over the 'fsdp' axis; Megatron-style TP is the
'tensor' axis; DP is 'data'. Collectives are inserted by GSPMD — there is no
separate comm runtime.

Axes:
  data    — batch sharding (pure DP)
  fsdp    — param + optimizer-state sharding (ZeRO-equivalent); batch is
            sharded over (data, fsdp) jointly
  tensor  — within-op model parallelism (QKV/MLP columns, vocab)
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
CONTEXT_AXIS = "context"
TENSOR_AXIS = "tensor"
AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)

BATCH_AXES = (DATA_AXIS, FSDP_AXIS)  # activation batch dim shards over both


def make_mesh(
    dp: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    cp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp[, stage][, context], tensor) mesh; dp=-1 uses all
    remaining devices. The context axis (ring attention,
    kernels/ring_attention.py) and the stage axis (GPipe pipeline,
    train/pipeline.py — the >=34B tiers) are only materialized when
    cp/pp > 1 so the 3-axis shape stays the default everywhere else."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (fsdp * tp * cp * pp) == 0, \
            f"{n} devices not divisible by fsdp*tp*cp*pp"
        dp = n // (fsdp * tp * cp * pp)
    assert dp * fsdp * tp * cp * pp == n, \
        f"mesh {dp}x{fsdp}x{pp}x{cp}x{tp} != {n}"
    shape, axes = [dp, fsdp], [DATA_AXIS, FSDP_AXIS]
    if pp > 1:
        shape.append(pp)
        axes.append(STAGE_AXIS)
    if cp > 1:
        shape.append(cp)
        axes.append(CONTEXT_AXIS)
    shape.append(tp)
    axes.append(TENSOR_AXIS)
    return Mesh(np.asarray(devices).reshape(shape), tuple(axes))


# ---------------------------------------------------------------------------
# Sharding rules: regex over param-tree paths -> PartitionSpec
# ---------------------------------------------------------------------------

Rule = Tuple[str, P]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for(path_str: str, rules: Sequence[Rule]) -> P:
    for pat, spec in rules:
        if re.search(pat, path_str):
            return spec
    return P()


def tree_shardings(tree, mesh: Mesh, rules: Sequence[Rule]):
    """Map a pytree of arrays/ShapeDtypeStructs to NamedShardings via rules.

    A matched PartitionSpec is validated against the leaf rank & divisibility;
    non-divisible or rank-mismatched axes degrade to replication on that dim,
    so one rule set covers 2B and tiny test models alike.
    """

    def one(path, leaf):
        spec = spec_for(_path_str(path), rules)
        shape = leaf.shape
        fixed = []
        for d, names in enumerate(tuple(spec) + (None,) * (len(shape) - len(spec))):
            if names is None:
                fixed.append(None)
                continue
            names_t = names if isinstance(names, tuple) else (names,)
            size = int(np.prod([mesh.shape[n] for n in names_t]))
            fixed.append(names if shape[d] % size == 0 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(one, tree)


# Default rules for our transformer stacks. Layers are scanned, so weights have
# a leading [num_layers] dim — specs below start with None for that dim where
# the path contains '/layers/'.
def default_param_rules(fsdp_only: bool = False) -> Sequence[Rule]:
    t = None if fsdp_only else TENSOR_AXIS
    f = FSDP_AXIS
    return [
        # scanned LLM / expert / joint layers: [L, in, out] kernels
        (r"layers/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel", P(None, f, t)),
        (r"layers/.*(o_proj|down_proj)/kernel", P(None, t, f)),
        # sparse MoE (models/moe.py): expert parallelism = the leading [E]
        # dim over the tensor axis (GSPMD inserts the all_to_all between
        # the token-sharded dispatch and the expert-sharded buffers);
        # hidden over fsdp inside each expert. Router stays replicated.
        (r"layers/.*experts_(gate|up)_proj", P(None, t, f, None)),
        (r"layers/.*experts_down_proj", P(None, t, None, f)),
        (r"layers/.*bias", P()),
        (r"layers/.*(norm|layernorm|scale)", P()),
        # ViT scanned layers (InternViT/SigLIP 'encoder' module): qkv fused
        # [L, in, 3*out]. (Round-1 wrote these as 'vit_layers/', which matched
        # nothing — the 0.3B ViT was silently replicated; caught by the
        # memory-budget arithmetic in utils/memory_budget.py.)
        (r"encoder/.*qkv/kernel", P(None, f, t)),
        (r"encoder/.*attn/proj/kernel", P(None, t, f)),
        (r"encoder/.*fc1/kernel", P(None, f, t)),
        (r"encoder/.*fc2/kernel", P(None, t, f)),
        # embeddings / heads
        (r"embed_tokens/embedding", P(t, f)),
        (r"lm_head/kernel", P(f, t)),
        # projector: tensor-parallel columns only. No fsdp on the contracting
        # dim — the ViT output feeding mlp1 is batch-sharded over (data, fsdp),
        # and an fsdp-sharded contracting dim forces GSPMD into an involuntary
        # full rematerialization (replicate-then-repartition) at the
        # vit->mlp1 boundary of the train step (round-1 MULTICHIP gate
        # warning). The projector is ~9M params, so replicating its
        # grads/moments over fsdp is noise next to the 2B stack.
        (r"mlp1/.*kernel", P(None, t)),
        # everything else (biases, norms, small encoders) replicated
    ]


STAGE_AXIS = "stage"


def stageify_rules(rules: Sequence[Rule], axis: str = STAGE_AXIS) -> Sequence[Rule]:
    """Pipeline-parallel variant of a rule set: the leading [L] dim of the
    scanned LLM layer stacks ('layers/' paths) additionally shards over the
    stage axis (train/pipeline.py splits those chunks across stages). The
    ViT ('encoder/') and non-layer params stay on stage 0 semantics —
    fsdp/tensor rules unchanged."""
    out = []
    for pat, spec in rules:
        t = tuple(spec)
        if pat.startswith(r"layers/") and t and t[0] is None:
            spec = P(axis, *t[1:])
        out.append((pat, spec))
    return out


def batch_spec(extra_dims: int = 1) -> P:
    """[batch, ...] activations sharded over (data, fsdp)."""
    return P(BATCH_AXES, *([None] * extra_dims))


def shard_batch(tree, mesh: Mesh):
    def one(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        names = BATCH_AXES
        size = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]
        if leaf.shape[0] % size != 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(names, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(one, tree)
