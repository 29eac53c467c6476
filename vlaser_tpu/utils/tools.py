"""Checkpoint tools: torch VLA checkpoint conversion, pos-emb resize,
ViT/projector extraction.

Parity surface: internvl_chat/tools/ (merge_lora.py -> train.lora.merge_lora;
internvl_hf2custom.py / custom2hf -> utils.hf_convert + this module;
extract scripts; modeling resize_pos_embeddings: modeling_intern_vit.py:378)
and the Simpler VLA single-.pt checkpoint layout (train.py:641-683, including
the '_orig_mod.' torch.compile prefix strip).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .hf_convert import _np, _stack, convert_internvit


def resize_pos_embeddings(
    pos_emb: np.ndarray,  # [1, old_n*old_n + 1, C]
    new_side: int,
) -> np.ndarray:
    """Bicubic-resize the patch grid of a learnable position embedding
    (modeling_intern_vit.py:378-392); CLS slot preserved."""
    from PIL import Image

    cls, patch = pos_emb[:, :1], pos_emb[:, 1:]
    n = int(round(patch.shape[1] ** 0.5))
    c = patch.shape[-1]
    grid = patch.reshape(n, n, c)
    out = np.empty((new_side, new_side, c), np.float32)
    # channel-wise PIL bicubic (float32 'F' mode)
    for ch in range(c):
        img = Image.fromarray(grid[:, :, ch].astype(np.float32), mode="F")
        out[:, :, ch] = np.asarray(
            img.resize((new_side, new_side), Image.BICUBIC)
        )
    return np.concatenate(
        [cls, out.reshape(1, new_side * new_side, c)], axis=1
    )


def strip_compile_prefix(sd: Mapping) -> Dict:
    """Remove the '_orig_mod.' prefix torch.compile adds (train.py:681-683)."""
    return {
        (k[len("_orig_mod."):] if k.startswith("_orig_mod.") else k): v
        for k, v in sd.items()
    }


def extract_vit_and_projector(vlm_params: Dict) -> Dict:
    """tools/extract_* analogue: pull the vision encoder + mlp1 subtree for
    re-use as a standalone encoder init."""
    return {
        "vision_model": vlm_params["vision_model"],
        "mlp1": vlm_params["mlp1"],
    }


def convert_pizero_torch_checkpoint(
    sd: Mapping,
    num_layers: int,
    vision_layers: int = 24,
) -> Dict:
    """Simpler VLA .pt 'model' state dict -> PiZeroVLA flax params.

    Key layout per the reference PiZero module tree (pizero_internvl.py:
    vision_tower.vision_model.*, multi_modal_projector.{0,1,3}, embed_tokens,
    joint_model.mixtures.{vlm,action}.layers.N.* (proprio ties action),
    joint_model.mixtures.{vlm,action}.norm, action_encoder.linear_{1,2,3},
    proprio_encoder, action_decoder).
    """
    sd = strip_compile_prefix(sd)

    def lin(prefix):
        out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def mixture_layers(name):
        p = f"joint_model.mixtures.{name}.layers"
        lay: Dict = {"mlp": {}}
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            entry = {
                "kernel": _stack(sd, f"{p}.{{}}.self_attn.{proj}.weight",
                                 num_layers, True)
            }
            if f"{p}.0.self_attn.{proj}.bias" in sd:
                entry["bias"] = _stack(
                    sd, f"{p}.{{}}.self_attn.{proj}.bias", num_layers
                )
            lay[proj] = entry
        for proj in ("gate_proj", "up_proj", "down_proj"):
            lay["mlp"][proj] = {
                "kernel": _stack(sd, f"{p}.{{}}.mlp.{proj}.weight", num_layers, True)
            }
        for norm in ("input_layernorm", "post_attention_layernorm"):
            lay[norm] = {
                "weight": _stack(sd, f"{p}.{{}}.{norm}.weight", num_layers)
            }
        return lay

    params = {
        "vision_model": convert_internvit(
            sd, vision_layers, "vision_tower.vision_model."
        ),
        "mlp1": {
            "norm": {
                "weight": _np(sd["multi_modal_projector.0.weight"]),
                "bias": _np(sd["multi_modal_projector.0.bias"]),
            },
            "fc1": lin("multi_modal_projector.1"),
            "fc2": lin("multi_modal_projector.3"),
        },
        "embed_tokens": {"embedding": _np(sd["embed_tokens.weight"])},
        "joint": {
            "layers": {
                "vlm": mixture_layers("vlm"),
                "expert": mixture_layers("action"),
            },
            "vlm_norm": {
                "weight": _np(sd["joint_model.mixtures.vlm.norm.weight"])
            },
            "expert_norm": {
                "weight": _np(sd["joint_model.mixtures.action.norm.weight"])
            },
        },
        "action_encoder": {
            "linear_1": lin("action_encoder.linear_1"),
            "linear_2": lin("action_encoder.linear_2"),
            "linear_3": lin("action_encoder.linear_3"),
        },
        "proprio_encoder": lin("proprio_encoder"),
        "action_decoder": lin("action_decoder"),
    }
    return params


def load_torch_checkpoint(path: str) -> Dict:
    """Load a torch .pt on CPU and return the model state dict
    (train.py:641-672 layout: {'model': ..., 'optimizer': ..., ...})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    return ckpt


def ensure_special_tokens(tokenizer):
    """Add the 9 InternVL special tokens if absent; returns (n_added,
    img_context_id, img_start_id, img_end_id).

    Parity: internvl_chat_finetune.py:865-876 — the SFT entry always adds the
    token set and records img_context_token_id on the model."""
    from ..tokenizer.conversation import (
        IMG_CONTEXT_TOKEN, IMG_END_TOKEN, IMG_START_TOKEN, SPECIAL_TOKENS,
    )

    n_added = tokenizer.add_tokens(SPECIAL_TOKENS, special_tokens=True)
    ids = tokenizer.convert_tokens_to_ids(
        [IMG_CONTEXT_TOKEN, IMG_START_TOKEN, IMG_END_TOKEN]
    )
    return n_added, ids[0], ids[1], ids[2]


def resize_token_embeddings(params: Dict, new_vocab: int) -> Dict:
    """Grow every vocab-sized table (embed_tokens/embedding rows,
    lm_head/kernel columns) to new_vocab, initializing new rows/cols with the
    mean of the existing ones.

    Parity: internvl_chat_finetune.py:955-1018 calls
    model.resize_token_embeddings after adding tokens; mean-init keeps the
    softmax over new tokens near-uniform instead of random-logit."""
    import numpy as np

    def walk(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
                continue
            arr = np.asarray(v)
            if (
                path and path[-1] == "embed_tokens" and k == "embedding"
                and arr.shape[0] < new_vocab
            ):
                extra = np.broadcast_to(
                    arr.mean(axis=0, keepdims=True),
                    (new_vocab - arr.shape[0], arr.shape[1]),
                ).astype(arr.dtype)
                arr = np.concatenate([arr, extra], axis=0)
            elif (
                path and path[-1] == "lm_head" and k == "kernel"
                and arr.shape[-1] < new_vocab
            ):
                extra = np.broadcast_to(
                    arr.mean(axis=-1, keepdims=True),
                    (*arr.shape[:-1], new_vocab - arr.shape[-1]),
                ).astype(arr.dtype)
                arr = np.concatenate([arr, extra], axis=-1)
            out[k] = arr
        return out

    return walk(params)
