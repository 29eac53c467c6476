"""OpenAI-compatible VLM chat server (the vLLM API-server role).

Usage:
  python scripts/serve_vlm.py --model_path Vlaser-2B/ --port 8000 \
      [--engine] [--quantize w8a8] [--max_new_tokens 256] [--tp 2]

Then point any OpenAI client at http://host:port/v1 (chat completions
with text + data:/file: image URLs). Reference role: the QA pipeline's
vLLM serving (data-pipeline/RoboTwin-QA/GeneralQA.py:3-8 + the slurm
OpenAI-server scripts).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vlaser_tpu.core.distributed import respect_platform_env
    respect_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_new_tokens", type=int, default=256)
    ap.add_argument("--max_tiles", type=int, default=12)
    ap.add_argument("--engine", action="store_true",
                    help="serve through the continuous-batching engine "
                         "(serve/engine_chat.EngineChat) instead of the "
                         "static VlaserChat path")
    ap.add_argument("--num_slots", type=int, default=16)
    ap.add_argument("--quantize", choices=("none", "int8", "w8a8"),
                    default="w8a8")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (--engine only)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vlaser_tpu.core.config import vlaser_2b
    from vlaser_tpu.core.quant import quantize_for_serving
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.serve.chat_server import ChatHTTPServer
    from vlaser_tpu.utils.hf_convert import (
        convert_internvl_chat, load_safetensors_dir,
    )

    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False,
                                              trust_remote_code=True)
    cfg = vlaser_2b(vocab_size=len(tokenizer))
    model = InternVLChatModel(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16)
    params = {"params": convert_internvl_chat(
        load_safetensors_dir(args.model_path), cfg.vision.num_layers,
        cfg.llm.num_layers,
    )}
    if args.quantize != "none":
        params = quantize_for_serving(params, target="vlm",
                                      mode=args.quantize)
    if args.engine:
        from vlaser_tpu.serve.engine_chat import EngineChat

        mesh = None
        if args.tp > 1:
            from vlaser_tpu.core.mesh import make_mesh

            mesh = make_mesh(dp=1, fsdp=1, tp=args.tp)
        chat = EngineChat(model, params, tokenizer,
                          max_new_tokens=args.max_new_tokens,
                          num_slots=args.num_slots, mesh=mesh)
    else:
        from vlaser_tpu.inference.chat import VlaserChat

        assert args.tp == 1, "--tp requires --engine"
        chat = VlaserChat(model, params, tokenizer,
                          max_new_tokens=args.max_new_tokens)

    srv = ChatHTTPServer(chat, host=args.host, port=args.port,
                         model_name=os.path.basename(
                             args.model_path.rstrip("/")) or "vlaser-tpu",
                         max_tiles=args.max_tiles)
    print(f"serving on http://{args.host}:{srv.port}/v1 "
          f"(backend={'engine' if args.engine else 'static'}, "
          f"quantize={args.quantize})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
