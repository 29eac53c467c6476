"""VLA flow-matching training entry point (slurm/train_internvl.sh analogue).

RLDS bridge/fractal mixture -> InternVLAProcessor inputs -> VLATrainer
(two optimizer groups, EMA, beta flow-time sampling) over a GSPMD mesh.

Usage:
  python scripts/train_vla.py --model_path Vlaser-2B/ --rlds_dir gs://... \
      --datasets bridge_dataset fractal20220817_data --batch 32 --steps 20000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--rlds_dir", required=True)
    ap.add_argument("--datasets", nargs="+", default=["bridge_dataset"])
    ap.add_argument("--weights", nargs="+", type=float, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--horizon", type=int, default=4)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--adam8bit", action="store_true",
                    help="8-bit optimizer state (bnb AdamW8bit parity)")
    ap.add_argument("--strong_aug", action="store_true",
                    help="use_strong_data_aug augmentation variant")
    ap.add_argument("--shuffle_buffer", type=int, default=200_000)
    ap.add_argument("--checkpoint_dir", default="checkpoints/vla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoTokenizer

    from vlaser_tpu.core.distributed import initialize as dist_init, respect_platform_env
    respect_platform_env()
    dist_init()  # no-op single-process (core/distributed.py)

    from vlaser_tpu.core.config import vlaser_2b_vla
    from vlaser_tpu.data.rlds import (
        AUGMENT_KWARGS_PRIMARY, AUGMENT_KWARGS_PRIMARY_STRONG,
        OXE_STANDARDIZATION_TRANSFORMS, RLDSDatasetConfig,
        RLDSInterleavedIterator, apply_frame_transforms,
        apply_trajectory_transforms, make_dataset_from_rlds,
        make_interleaved_dataset,
    )
    from vlaser_tpu.policy.pizero import PiZeroVLA
    from vlaser_tpu.policy.processing import InternVLAProcessor
    from vlaser_tpu.train.trainer import VLATrainConfig, VLATrainer
    from vlaser_tpu.utils.tools import convert_pizero_torch_checkpoint

    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False,
                                              trust_remote_code=True)
    cfg = vlaser_2b_vla(vocab_size=len(tokenizer))
    model = PiZeroVLA(cfg, compute_dtype=jnp.bfloat16, remat=True)
    processor = InternVLAProcessor(
        tokenizer, num_image_tokens=cfg.vlm.num_image_token,
        max_seq_len=cfg.max_image_text_tokens,
    )

    frames = []
    for name in args.datasets:
        d_cfg = RLDSDatasetConfig(
            name=name, data_dir=args.rlds_dir,
            standardize_fn=OXE_STANDARDIZATION_TRANSFORMS[name],
            norm_mask=[True] * 6 + [False],
            statistics_path=f"stats/{name}.json",
        )
        traj, _ = make_dataset_from_rlds(d_cfg, train=True)
        f = apply_trajectory_transforms(
            traj, window_size=cfg.cond_steps, action_horizon=args.horizon,
            subsample_length=100, skip_unlabeled=True,
        )
        aug = (AUGMENT_KWARGS_PRIMARY_STRONG if args.strong_aug
               else AUGMENT_KWARGS_PRIMARY)
        frames.append(apply_frame_transforms(
            f, resize=(args.image_size, args.image_size), train=True,
            image_augment_kwargs=aug))
    # per-process slice of the stream; the trainer reassembles the global
    # batch with jax.make_array_from_process_local_data
    local_batch = args.batch // jax.process_count()
    mixed = make_interleaved_dataset(
        frames, args.weights, batch_size=local_batch,
        shuffle_buffer_size=args.shuffle_buffer,
    )
    if jax.process_count() > 1:
        mixed = mixed.shard(jax.process_count(), jax.process_index())

    def batches():
        for raw in RLDSInterleavedIterator(mixed):
            imgs = raw["observation"]["image_primary"][:, -1]  # latest frame
            texts = [t.decode() for t in raw["language_instruction"]]
            proc = processor(texts, imgs[:, None])
            yield {
                "input_ids": proc["input_ids"],
                "pixel_values": proc["pixel_values"],
                "text_mask": proc["attention_mask"],
                "proprios": raw["observation"]["proprio"][:, -1:][..., :cfg.proprio_dim],
                "actions": raw["action"][:, : cfg.num_action_tokens],
            }

    # params: converted torch VLA ckpt or fresh init handled by the caller;
    # here we init fresh if no .pt given
    import jax

    b0 = next(batches())
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["input_ids"][:1]), jnp.asarray(b0["pixel_values"][:1]),
        jnp.asarray(b0["text_mask"][:1]), jnp.asarray(b0["proprios"][:1]),
        jnp.asarray(b0["actions"][:1]), jnp.zeros((1,)),
        jnp.zeros((1, cfg.num_action_tokens, cfg.action_dim)),
    )
    trainer = VLATrainer(
        model, params,
        VLATrainConfig(lr_action=args.lr, lr_vlm=args.lr, mesh_fsdp=args.fsdp,
                       optimizer_8bit=args.adam8bit,
                       checkpoint_dir=args.checkpoint_dir),
    )
    trainer.train_steps(batches(), args.steps)


if __name__ == "__main__":
    main()
