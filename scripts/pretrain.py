"""InternVL-style pretrain entry (stage 1 / 1.5).

Replaces internvl/train/internvl_chat_pretrain.py (1,116 LoC): the pretrain
recipes are the SFT machinery with different freeze masks and learning rates
over caption/conversation jsonl data:
  stage 1   — train the mlp1 projector only (ViT + LLM frozen), high lr
  stage 1.5 — train projector + LLM (ViT frozen), lower lr
(stage 2 IS the SFT recipe — use scripts/train_sft.py.)

Usage:
  python scripts/pretrain.py --model_path InternVL-init/ --meta pretrain.json \
      --stage 1 --steps 40000 --batch 32 [--packed]
Offline smoke:
  python scripts/pretrain.py --tiny --data captions.jsonl --stage 1 --steps 2
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(message)s")

STAGE_DEFAULTS = {
    # lr per stage (shell/internvl3.0 pretrain recipes: projector-only warms
    # at a higher lr than full-LLM pretraining)
    "1": dict(lr=1e-3, freeze_vision=True, freeze_llm=True),
    "1.5": dict(lr=2e-5, freeze_vision=True, freeze_llm=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--data", default=None)
    ap.add_argument("--meta", default=None)
    ap.add_argument("--image_root", default="")
    ap.add_argument("--stage", choices=["1", "1.5"], default="1")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the stage default lr")
    ap.add_argument("--max_seq", type=int, default=4096)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--checkpoint_dir", default="checkpoints/pretrain")
    args = ap.parse_args()

    # the pretrain loop is train_sft with stage presets; delegate through the
    # same code path so data/packing/multihost behavior stays identical
    stage = STAGE_DEFAULTS[args.stage]
    import scripts.train_sft as sft

    argv = [
        "train_sft.py",
        "--steps", str(args.steps), "--batch", str(args.batch),
        "--lr", str(args.lr if args.lr is not None else stage["lr"]),
        "--max_seq", str(args.max_seq), "--fsdp", str(args.fsdp),
        "--checkpoint_dir", args.checkpoint_dir,
    ]
    if args.model_path:
        argv += ["--model_path", args.model_path]
    if args.tiny:
        argv += ["--tiny"]
    if args.data:
        argv += ["--data", args.data]
    if args.meta:
        argv += ["--meta", args.meta]
    if args.image_root:
        argv += ["--image_root", args.image_root]
    if args.packed:
        argv += ["--packed"]
    if stage["freeze_llm"]:
        argv += ["--freeze_llm"]

    sys.argv = argv
    sft.main()


if __name__ == "__main__":
    main()
