"""QA data generation driven by our own TPU chat model
(data-pipeline/slurm/data_generator.sh analogue, minus vLLM).

Usage:
  python scripts/generate_qa.py --model_path Vlaser-2B/ --episodes_dir eps/ \
      --kind general --out qa.jsonl [--filter --threshold 6]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vlaser_tpu.core.distributed import respect_platform_env
    respect_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--episodes_dir", required=True,
                    help="dir of .hdf5 episodes or image files")
    ap.add_argument("--kind",
                    choices=["general", "grounding", "spatial", "all"],
                    default="general",
                    help="'all' generates every QA kind per frame; with "
                         "--engine the frame's image block prefills once "
                         "and all kind-prompts share it (engine prefix "
                         "caching)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--images_dir", default="qa_images")
    ap.add_argument("--max_frames", type=int, default=1000)
    ap.add_argument("--filter", action="store_true")
    ap.add_argument("--threshold", type=float, default=6.0)
    ap.add_argument("--engine", action="store_true",
                    help="batch generation through the continuous-batching "
                         "engine (serve/engine.py — the vLLM role the "
                         "reference's GeneralQA.py fills with vllm_tp)")
    ap.add_argument("--offline", action="store_true",
                    help="like --engine but the whole batch schedule "
                         "compiles onto the device (serve/offline.py): one "
                         "host dispatch per batch, greedy only. API-parity "
                         "mode — the engine is measured faster on mixed "
                         "workloads")
    ap.add_argument("--num_slots", type=int, default=16)
    ap.add_argument("--spec_draft", type=int, default=0,
                    help="speculative decode through the engine (prompt-"
                         "lookup drafts; greedy token-identical, --engine "
                         "only)")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature for QA generation "
                         "(engine mode: per-request sampling params)")
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--quantize", choices=("none", "int8", "w8a8"),
                    default="w8a8",
                    help="serving quantization (core/quant."
                         "quantize_for_serving): w8a8 is the measured-"
                         "best serving collection (docs/STATUS.md)")
    args = ap.parse_args()

    import json

    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoTokenizer

    from vlaser_tpu.core.config import vlaser_2b
    from vlaser_tpu.data.qa_generation import QAGenConfig, QAGenerator, quality_filter
    from vlaser_tpu.image.tiling import load_image_tiles
    from vlaser_tpu.inference.chat import VlaserChat
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.utils.hf_convert import convert_internvl_chat, load_safetensors_dir

    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False,
                                              trust_remote_code=True)
    cfg = vlaser_2b(vocab_size=len(tokenizer))
    model = InternVLChatModel(cfg, param_dtype=jnp.bfloat16)
    params = {"params": convert_internvl_chat(
        load_safetensors_dir(args.model_path), cfg.vision.num_layers,
        cfg.llm.num_layers,
    )}
    if args.quantize != "none":
        from vlaser_tpu.core.quant import quantize_for_serving

        params = quantize_for_serving(params, target="vlm",
                                      mode=args.quantize)
    if args.engine or args.offline:
        from vlaser_tpu.serve.engine_chat import EngineChat

        assert not (args.offline and args.temperature > 0.0), (
            "--offline is greedy-only; sampled generation uses --engine"
        )
        chat = EngineChat(model, params, tokenizer, max_new_tokens=512,
                          num_slots=args.num_slots,
                          temperature=args.temperature, top_p=args.top_p,
                          backend="offline" if args.offline else "engine",
                          speculative_draft_len=args.spec_draft)
    else:
        assert args.temperature == 0.0, (
            "sampled QA generation runs through --engine (per-request "
            "sampling params)"
        )
        chat = VlaserChat(model, params, tokenizer, max_new_tokens=512)

    def generate_fn(images, prompts):
        from PIL import Image

        tile_list = [
            load_image_tiles(Image.fromarray(img), cfg.vision.image_size,
                             max_num=1, use_thumbnail=False, dynamic=False)
            for img in images
        ]
        if args.engine or args.offline:
            # one engine run over the whole batch: requests decode
            # in-flight, short answers free their slots early
            pixels = np.concatenate(tile_list, axis=0)
            return chat.batch_chat(list(prompts), pixels,
                                   [t.shape[0] for t in tile_list])
        return [chat.chat(p, t) for p, t in zip(prompts, tile_list)]

    def frames():
        n = 0
        hdf5s = sorted(glob.glob(os.path.join(args.episodes_dir, "**/*.hdf5"),
                                 recursive=True))
        if hdf5s:
            import h5py

            for f in hdf5s:
                with h5py.File(f, "r") as h:
                    instr = h.attrs.get("instruction", "complete the task")
                    if isinstance(instr, bytes):
                        instr = instr.decode()
                    imgs = h["observations/head_camera"]
                    for t in range(0, imgs.shape[0], 10):
                        if n >= args.max_frames:
                            return
                        yield {"image": np.asarray(imgs[t]), "instruction": str(instr)}
                        n += 1
        else:
            from PIL import Image

            for f in sorted(glob.glob(os.path.join(args.episodes_dir, "*.jpg"))
                            + glob.glob(os.path.join(args.episodes_dir, "*.png"))):
                if n >= args.max_frames:
                    return
                yield {"image": np.asarray(Image.open(f).convert("RGB")),
                       "instruction": "complete the task"}
                n += 1

    shared_image_fn = None
    if args.engine and args.kind == "all":
        def shared_image_fn(prompts, image):
            from PIL import Image

            tiles = load_image_tiles(
                Image.fromarray(image), cfg.vision.image_size, max_num=1,
                use_thumbnail=False, dynamic=False,
            )
            return chat.batch_chat_shared_image(list(prompts), tiles)

    gen = QAGenerator(generate_fn, QAGenConfig(kind=args.kind,
                                               images_dir=args.images_dir),
                      shared_image_fn=shared_image_fn)
    n = gen.generate(frames(), args.out)
    print(f"wrote {n} items to {args.out}")

    if args.filter:
        items = [json.loads(l) for l in open(args.out)]
        kept = quality_filter(
            items,
            score_fn=lambda prompts: [chat.chat(p, None) for p in prompts],
            threshold=args.threshold,
        )
        with open(args.out, "w") as f:
            for it in kept:
                f.write(json.dumps(it) + "\n")
        print(f"kept {len(kept)}/{len(items)} after filtering")


if __name__ == "__main__":
    main()
