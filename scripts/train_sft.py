"""VLM SFT entry point (the Vlaser-2B/8B recipe).

Replaces shell/internvl3.0/2nd_finetune/internvl3_2b_dynamic_res_2nd_finetune_
full.sh + internvl_chat_finetune.py: ViT frozen, lr 2e-5 cosine, bf16 compute,
sequence packing, orbax checkpoints with data-stream resume.

Usage:
  python scripts/train_sft.py --model_path Vlaser-2B/ --data train.jsonl \
      --image_root images/ --steps 5000 --batch 4 --fsdp 4 [--packed]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True, help="HF checkpoint dir")
    ap.add_argument("--data", required=True, help="conversation jsonl")
    ap.add_argument("--image_root", default="")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--max_seq", type=int, default=8192)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--freeze_vision", action="store_true", default=True)
    ap.add_argument("--checkpoint_dir", default="checkpoints/sft")
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vlaser_tpu.core.config import vlaser_2b
    from vlaser_tpu.data.chat_dataset import (
        ChatDatasetConfig, ConversationDataset, PackedDataset, pad_collate,
    )
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.trainer import SFTTrainer, TrainConfig
    from vlaser_tpu.utils.hf_convert import convert_internvl_chat, load_safetensors_dir

    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False,
                                              trust_remote_code=True)
    cfg = vlaser_2b(vocab_size=len(tokenizer))
    model = InternVLChatModel(cfg, compute_dtype=jnp.bfloat16, remat=True)
    params = {"params": convert_internvl_chat(
        load_safetensors_dir(args.model_path), cfg.vision.num_layers,
        cfg.llm.num_layers,
    )}

    ds_cfg = ChatDatasetConfig(
        jsonl_path=args.data, image_root=args.image_root,
        num_image_token=cfg.num_image_token, max_seq_length=args.max_seq,
    )
    dataset = ConversationDataset(ds_cfg, tokenizer)
    if args.packed:
        packed = PackedDataset(dataset, max_packed_tokens=args.max_seq,
                               pad_token_id=cfg.pad_token_id)
        batches = iter(packed)
        data_state = packed.state_dict
    else:
        def gen():
            i = 0
            while True:
                samples = [dataset[(i + j) % len(dataset)] for j in range(args.batch)]
                i += args.batch
                yield pad_collate(samples, cfg.pad_token_id)

        batches = gen()
        data_state = None

    trainer = SFTTrainer(
        model, params,
        TrainConfig(learning_rate=args.lr, total_steps=args.steps,
                    freeze_vision=args.freeze_vision, mesh_fsdp=args.fsdp,
                    mesh_tp=args.tp, checkpoint_dir=args.checkpoint_dir),
    )
    trainer.train(batches, data_state_fn=data_state)


if __name__ == "__main__":
    main()
