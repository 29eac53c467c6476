"""VLM SFT entry point (the Vlaser-2B/8B recipe).

Replaces shell/internvl3.0/2nd_finetune/internvl3_2b_dynamic_res_2nd_finetune_
full.sh + internvl_chat_finetune.py: ViT frozen, lr 2e-5 cosine, bf16 compute,
sequence packing, orbax checkpoints with data-stream resume.

Usage (single dataset):
  python scripts/train_sft.py --model_path Vlaser-2B/ --data train.jsonl \
      --image_root images/ --steps 5000 --batch 4 --fsdp 4 [--packed]
Usage (multi-dataset metafile, internvl_chat_finetune.py:701-783 format —
  {"name": {"root": ..., "annotation": ..., "repeat_time": ..,
            "max_dynamic_patch": ..}, ...}):
  python scripts/train_sft.py --model_path Vlaser-2B/ --meta meta.json --packed
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
    ap.add_argument("--model_path", default=None, help="HF checkpoint dir")
    ap.add_argument("--tiny", action="store_true",
                    help="offline smoke mode: tiny random-init model + byte "
                         "tokenizer (no checkpoint/network needed)")
    ap.add_argument("--data", default=None, help="conversation jsonl")
    ap.add_argument("--meta", default=None,
                    help="multi-dataset metafile json (overrides --data)")
    ap.add_argument("--image_root", default="")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--max_seq", type=int, default=8192)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--cp", type=int, default=1,
                    help="context-parallel degree: shard max_seq over a "
                         "'context' mesh axis via ring attention "
                         "(kernels/ring_attention.py) — long-context "
                         "capability the reference lacks")
    ap.add_argument("--freeze_vision", action="store_true", default=True)
    ap.add_argument("--freeze_llm", action="store_true",
                    help="projector-only training (pretrain stage 1)")
    ap.add_argument("--checkpoint_dir", default="checkpoints/sft")
    ap.add_argument("--profile_dir", default=None,
                    help="capture an XLA device trace over steps 5-7 "
                         "(view with tensorboard/xprof)")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vlaser_tpu.core.config import vlaser_2b
    from vlaser_tpu.data.chat_dataset import (
        ChatDatasetConfig, ConversationDataset, PackedDataset, build_datasets,
        pad_collate,
    )
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.train.trainer import SFTTrainer, TrainConfig
    from vlaser_tpu.utils.hf_convert import convert_internvl_chat, load_safetensors_dir
    from vlaser_tpu.utils.tools import ensure_special_tokens, resize_token_embeddings

    # multi-host: no-op single-process; slurm/JAX_* env-driven otherwise
    # (replaces init_dist + deepspeed.init_distributed, dist_utils.py:32-104)
    import jax

    from vlaser_tpu.core.distributed import initialize as dist_init, respect_platform_env
    respect_platform_env()
    dist_init()

    assert args.data or args.meta, "need --data or --meta"
    assert args.tiny or args.model_path, "need --model_path (or --tiny)"
    if args.tiny:
        from vlaser_tpu.tokenizer.byte_tokenizer import ByteTokenizer

        tokenizer = ByteTokenizer()
    else:
        tokenizer = AutoTokenizer.from_pretrained(
            args.model_path, use_fast=False, trust_remote_code=True
        )
    # the 9 InternVL tokens + embedding resize (finetune.py:865-876, 955-1018)
    n_added, img_ctx_id, img_start_id, img_end_id = ensure_special_tokens(tokenizer)
    if args.tiny:
        from vlaser_tpu.core.config import tiny_vlm

        cfg = tiny_vlm()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=len(tokenizer)))
    else:
        cfg = vlaser_2b(vocab_size=len(tokenizer))
    cfg = dataclasses.replace(
        cfg, img_context_token_id=img_ctx_id, img_start_token_id=img_start_id,
        img_end_token_id=img_end_id,
        pad_token_id=tokenizer.pad_token_id or cfg.pad_token_id,
    )
    if args.cp > 1:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(
                cfg.llm, context_parallel_axis="context"))
    model = InternVLChatModel(cfg, compute_dtype=jnp.bfloat16, remat=True)
    import contextlib

    mesh = None
    if args.cp > 1:
        from vlaser_tpu.core import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(fsdp=args.fsdp, tp=args.tp, cp=args.cp)

    def mesh_ctx():
        # ring attention needs the ambient mesh at trace time
        return jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    if args.tiny:
        import jax
        import numpy as _np

        img = cfg.vision.image_size
        _ids = _np.full((1, 8), 1, _np.int32)
        with mesh_ctx():
            params = model.init(
                jax.random.PRNGKey(0), jnp.asarray(_ids),
                jnp.zeros((1, img, img, 3), jnp.float32),
                jnp.ones((1,), jnp.int32),
            )
    else:
        raw = convert_internvl_chat(
            load_safetensors_dir(args.model_path), cfg.vision.num_layers,
            cfg.llm.num_layers,
        )
        if n_added:
            raw = resize_token_embeddings(raw, len(tokenizer))
        params = {"params": raw}

    # packed mode may keep samples up to 4x the pack size — the packer splits
    # them at non-image boundaries instead of truncating
    ds_cfg = ChatDatasetConfig(
        jsonl_path=args.data or "", image_root=args.image_root,
        num_image_token=cfg.num_image_token, image_size=cfg.vision.image_size,
        max_seq_length=args.max_seq * (4 if args.packed else 1),
    )
    if args.meta:
        dataset = build_datasets(args.meta, tokenizer, ds_cfg)
    else:
        dataset = ConversationDataset(ds_cfg, tokenizer)
    if args.packed:
        if args.cp > 1:
            # ring attention shards the sequence dim: packed batches are
            # fixed max_seq-long, which must divide 2*cp (zigzag headroom)
            assert args.max_seq % (2 * args.cp) == 0, (
                f"--packed with --cp {args.cp} needs max_seq divisible by "
                f"{2 * args.cp}, got {args.max_seq}"
            )
        packed = PackedDataset(dataset, max_packed_tokens=args.max_seq,
                               pad_token_id=cfg.pad_token_id,
                               img_start_id=img_start_id, img_end_id=img_end_id,
                               num_image_token=cfg.num_image_token,
                               image_size=cfg.vision.image_size)
        if jax.process_count() > 1:
            packed = packed.shard(jax.process_count(), jax.process_index())
        from vlaser_tpu.data.prefetch import PrefetchIterator

        batches = PrefetchIterator(iter(packed), buffer_size=4)
        data_state = packed.state_dict
    else:
        # length-grouped batching (train_sampler_patch.py:54-125) + threaded
        # item loading (DataLoader-workers equivalent)
        from vlaser_tpu.data.chat_dataset import (
            estimate_lengths, length_grouped_indices, tokenized_lengths,
        )
        from vlaser_tpu.data.prefetch import map_prefetch

        # reference-exact tokenized lengths (internvl_chat_finetune.py:361-382)
        # when the dataset exposes a tokenizer; chars/4 heuristic otherwise
        try:
            lengths = tokenized_lengths(dataset)
        except Exception:
            lengths = estimate_lengths(dataset)
        if lengths:
            order = length_grouped_indices(lengths, args.batch)
        else:  # ConcatDataset: fall back to sequential order
            order = list(range(len(dataset)))

        def cycle():
            while True:
                yield from order

        batches = map_prefetch(
            dataset, cycle(),
            collate=lambda xs: pad_collate(
                xs, cfg.pad_token_id,
                pad_multiple=2 * args.cp if args.cp > 1 else None,
            ),
            batch_size=args.batch, num_threads=4,
        )
        data_state = None

    with mesh_ctx():
        trainer = SFTTrainer(
            model, params,
            TrainConfig(learning_rate=args.lr, total_steps=args.steps,
                        freeze_vision=args.freeze_vision,
                        freeze_llm=args.freeze_llm, mesh_fsdp=args.fsdp,
                        mesh_tp=args.tp, mesh_cp=args.cp,
                        checkpoint_dir=args.checkpoint_dir,
                        profile_dir=args.profile_dir),
            mesh=mesh,
        )
        trainer.train(batches, data_state_fn=data_state)


if __name__ == "__main__":
    main()
