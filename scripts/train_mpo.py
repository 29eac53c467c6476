"""MPO (Mixed Preference Optimization) training entry.

Replaces internvl/train/internvl_chat_mpo.py: preference-pair jsonl
({image?, question, chosen, rejected}) -> DPO sigmoid + BCO-pair + SFT losses
against a frozen reference-params copy.

Usage:
  python scripts/train_mpo.py --model_path Vlaser-2B/ --data pairs.jsonl \
      --image_root images/ --steps 2000 --batch 4
Offline smoke:
  python scripts/train_mpo.py --tiny --data pairs.jsonl --steps 2
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(message)s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--data", required=True, help="preference-pair jsonl")
    ap.add_argument("--image_root", default="")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-6)
    ap.add_argument("--beta", type=float, default=0.1)
    ap.add_argument("--max_seq", type=int, default=4096)
    ap.add_argument("--fsdp", type=int, default=1)
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from vlaser_tpu.core.distributed import initialize as dist_init, respect_platform_env
    from vlaser_tpu.data.preference_dataset import (
        PreferenceDataset, PreferenceDatasetConfig, preference_collate,
    )
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.mpo import MPOConfig, MPOTrainer
    from vlaser_tpu.train.trainer import TrainConfig
    from vlaser_tpu.utils.tools import ensure_special_tokens, resize_token_embeddings

    respect_platform_env()
    dist_init()
    assert args.tiny or args.model_path, "need --model_path (or --tiny)"
    if args.tiny:
        from vlaser_tpu.tokenizer.byte_tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer()
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            args.model_path, use_fast=False, trust_remote_code=True
        )
    n_added, img_ctx_id, img_start_id, img_end_id = ensure_special_tokens(tokenizer)

    if args.tiny:
        import jax

        from vlaser_tpu.core.config import tiny_vlm

        cfg = tiny_vlm()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=len(tokenizer)))
    else:
        from vlaser_tpu.core.config import vlaser_2b

        cfg = vlaser_2b(vocab_size=len(tokenizer))
    cfg = dataclasses.replace(
        cfg, img_context_token_id=img_ctx_id, img_start_token_id=img_start_id,
        img_end_token_id=img_end_id,
        pad_token_id=tokenizer.pad_token_id or cfg.pad_token_id,
    )
    model = InternVLChatModel(cfg, compute_dtype=jnp.bfloat16, remat=not args.tiny)
    if args.tiny:
        import jax
        import numpy as np

        img = cfg.vision.image_size
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(np.full((1, 8), 1, np.int32)),
            jnp.zeros((1, img, img, 3), jnp.float32), jnp.ones((1,), jnp.int32),
        )
    else:
        from vlaser_tpu.utils.hf_convert import (
            convert_internvl_chat, load_safetensors_dir,
        )

        raw = convert_internvl_chat(
            load_safetensors_dir(args.model_path), cfg.vision.num_layers,
            cfg.llm.num_layers,
        )
        if n_added:
            raw = resize_token_embeddings(raw, len(tokenizer))
        params = {"params": raw}

    ds = PreferenceDataset(
        PreferenceDatasetConfig(
            jsonl_path=args.data, image_root=args.image_root,
            num_image_token=cfg.num_image_token,
            image_size=cfg.vision.image_size, max_seq_length=args.max_seq,
        ),
        tokenizer,
    )

    def batches():
        i = 0
        while True:
            chunk = [ds[(i + j) % len(ds)] for j in range(args.batch)]
            i += args.batch
            yield preference_collate(chunk, cfg.pad_token_id)

    trainer = MPOTrainer(
        model, params, MPOConfig(beta=args.beta),
        TrainConfig(learning_rate=args.lr, total_steps=args.steps,
                    mesh_fsdp=args.fsdp),
    )
    trainer.train(batches(), args.steps)


if __name__ == "__main__":
    main()
