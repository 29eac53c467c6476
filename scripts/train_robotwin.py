"""RoboTwin parallel-decoding VLA training entry.

Replaces RoboTwin/policy/internvla_2B_parallel_decoding/vla-scripts/
train_mine_new.py:123-462 (accelerate + ZeRO-2): HDF5 episode dataset ->
SequenceBuilder static layout -> ParallelDecodingVLA L1 loss through the
GSPMD train step (frozen ViT per the recipe's no-grad extract_feature).

Usage:
  python scripts/train_robotwin.py --model_path InternVL3-2B/ \
      --data_root robotwin_episodes/ --steps 20000 --batch 64
Offline smoke (synthetic episodes):
  python scripts/train_robotwin.py --tiny --steps 2
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(message)s")

# RoboTwin special tokens added at train time (train_mine_new.py:226-266)
ROBOTWIN_TOKENS = [
    "<soi>", "<eoi>", "<sot>", "<eot>",
    "<left_arm_soa>", "<left_arm_eoa>", "<right_arm_soa>", "<right_arm_eoa>",
    "<left_arm_sost>", "<left_arm_eost>", "<right_arm_sost>", "<right_arm_eost>",
]


def _make_synthetic_episodes(root: str, n: int = 2, t: int = 10):
    import h5py
    import numpy as np

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        with h5py.File(os.path.join(root, f"ep{i}.hdf5"), "w") as h:
            h.create_dataset(
                "observations/head_camera",
                data=rng.integers(0, 255, (t, 32, 32, 3), np.uint8),
            )
            h.create_dataset("qpos", data=rng.uniform(-1, 1, (t, 14)))
            h.create_dataset(
                "action", data=rng.uniform(-1, 1, (t, 14)).astype(np.float32)
            )
            h.attrs["instruction"] = f"move the block {i}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--checkpoint_dir", default=None)
    args = ap.parse_args()

    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.core.distributed import initialize as dist_init, respect_platform_env
    from vlaser_tpu.data.hdf5_dataset import (
        HDF5DatasetConfig, HDF5VLADataset, collate_robotwin,
    )
    from vlaser_tpu.policy.parallel_decoding import (
        ParallelDecodingConfig, ParallelDecodingVLA, SequenceBuilder,
    )
    from vlaser_tpu.train.optim import make_optimizer, warmup_cosine
    from vlaser_tpu.train.train_step import (
        TrainState, make_train_step, shard_train_state,
    )
    from vlaser_tpu.core import mesh as mesh_lib
    from vlaser_tpu.core.distributed import put_global_batch

    respect_platform_env()
    dist_init()
    assert args.tiny or (args.model_path and args.data_root), \
        "need --model_path and --data_root (or --tiny)"

    from vlaser_tpu.tokenizer.conversation import IMG_CONTEXT_TOKEN

    if args.tiny:
        from vlaser_tpu.core.config import tiny_vlm
        from vlaser_tpu.tokenizer.byte_tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer()
        n_state = 32
        tokenizer.add_tokens(ROBOTWIN_TOKENS + [IMG_CONTEXT_TOKEN])
        state_start = len(tokenizer)
        tokenizer.add_tokens([f"<state_{i}>" for i in range(n_state)])
        vlm = tiny_vlm()
        vlm = dataclasses.replace(
            vlm,
            llm=dataclasses.replace(vlm.llm, vocab_size=len(tokenizer)),
            img_context_token_id=tokenizer.convert_tokens_to_ids(
                IMG_CONTEXT_TOKEN),
        )
        cfg = ParallelDecodingConfig(
            vlm=vlm, action_chunk=4, action_dim=14, state_dim=14,
            state_vocab_size=n_state, max_text_tokens=16, head_hidden=32,
        )
        data_root = args.data_root or tempfile.mkdtemp(prefix="robotwin_tiny_")
        if not any(f.endswith(".hdf5") for f in os.listdir(data_root)):
            _make_synthetic_episodes(data_root)
    else:
        from transformers import AutoTokenizer

        from vlaser_tpu.core.config import vlaser_2b

        tokenizer = AutoTokenizer.from_pretrained(
            args.model_path, use_fast=False, trust_remote_code=True
        )
        n_state = 512  # train_mine_new.py: 512 <state_i> tokens
        tokenizer.add_tokens(ROBOTWIN_TOKENS + [IMG_CONTEXT_TOKEN],
                             special_tokens=True)
        state_start = len(tokenizer)
        tokenizer.add_tokens([f"<state_{i}>" for i in range(n_state)],
                             special_tokens=True)
        vlm = vlaser_2b(vocab_size=len(tokenizer))
        # RoboTwin runs the ViT at 224px with select_layer=-2 (model/load.py)
        vlm = dataclasses.replace(
            vlm,
            vision=dataclasses.replace(vlm.vision, image_size=224),
            select_layer=-2,
            img_context_token_id=tokenizer.convert_tokens_to_ids(
                IMG_CONTEXT_TOKEN),
        )
        cfg = ParallelDecodingConfig(
            vlm=vlm, action_chunk=args.chunk, action_dim=14, state_dim=14,
            state_vocab_size=n_state,
        )
        data_root = args.data_root

    tok_ids = {
        "bos": 1, "eos": 2,
        "img_context": tokenizer.convert_tokens_to_ids(IMG_CONTEXT_TOKEN),
    }
    for t in ROBOTWIN_TOKENS:
        tok_ids[t.strip("<>")] = tokenizer.convert_tokens_to_ids(t)
    builder = SequenceBuilder(cfg, tok_ids, state_token_start=state_start,
                              pad_token_id=0)

    model = ParallelDecodingVLA(cfg, compute_dtype=jnp.bfloat16,
                                attn_impl="reference" if args.tiny else "auto")

    ds = HDF5VLADataset(HDF5DatasetConfig(
        data_root=data_root, chunk_size=cfg.action_chunk,
        image_size=cfg.vlm.vision.image_size,
    ))

    def normalize(images):  # uint8 -> ImageNet-normalized float
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (images.astype(np.float32) / 255.0 - mean) / std

    def batches():
        i = 0
        while True:
            chunk = [ds[(i + j) % len(ds)] for j in range(args.batch)]
            i += args.batch
            yield collate_robotwin(chunk, builder, tokenizer, normalize)

    b0 = next(batches())
    if args.tiny:
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(b0["input_ids"][:1]),
            jnp.asarray(b0["pixel_values"][:1]), jnp.asarray(b0["text_mask"][:1]),
        )
    else:
        from vlaser_tpu.utils.hf_convert import (
            convert_internvl_chat, load_safetensors_dir,
        )
        from vlaser_tpu.utils.tools import resize_token_embeddings

        raw = convert_internvl_chat(
            load_safetensors_dir(args.model_path), cfg.vlm.vision.num_layers,
            cfg.vlm.llm.num_layers,
        )
        raw = resize_token_embeddings(raw, len(tokenizer))
        # init to get the action-head params, then graft the VLM weights
        p0 = model.init(
            jax.random.PRNGKey(0), jnp.asarray(b0["input_ids"][:1]),
            jnp.asarray(b0["pixel_values"][:1]), jnp.asarray(b0["text_mask"][:1]),
        )
        p0["params"]["vision_model"] = raw["vision_model"]
        p0["params"]["mlp1"] = raw["mlp1"]
        p0["params"]["language_model"] = raw["language_model"]["model"]
        p0["params"]["embed_tokens"] = raw["language_model"]["embed_tokens"]
        params = p0

    def loss_fn(p, batch, rng):
        return model.apply(
            p, batch["input_ids"], batch["pixel_values"], batch["text_mask"],
            batch["actions"], method=model.loss,
        )

    schedule = warmup_cosine(args.lr, args.steps, 0.03)
    # ViT frozen (reference: no-grad extract_feature, train_mine_new.py:683)
    tx = make_optimizer(schedule, frozen_patterns=(r"vision_model/",),
                        params=params)
    mesh = mesh_lib.make_mesh(fsdp=args.fsdp)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, _ = shard_train_state(state, mesh)
    step = make_train_step(loss_fn, tx)
    logger = logging.getLogger("vlaser_tpu.train")
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(batches()):
        if i >= args.steps:
            break
        batch = put_global_batch(batch, mesh)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        s = i + 1
        if s == 1 or s % 10 == 0 or s == args.steps:
            logger.info("robotwin step %d l1_loss %.4f gnorm %.3f",
                        s, float(metrics["loss"]), float(metrics["grad_norm"]))
        if args.checkpoint_dir and s % 500 == 0:
            from vlaser_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.checkpoint_dir, s, state)


if __name__ == "__main__":
    main()
