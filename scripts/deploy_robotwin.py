"""Serve the RoboTwin parallel-decoding policy over HTTP.

Replaces RoboTwin vla-scripts/deploy.py (FastAPI/uvicorn): POST /act with
{"image": <json-numpy uint8 HxWx3>, "instruction": str, "qpos": [14]} returns
{"action": <chunk x 14 joint deltas>}. Client helper:
vlaser_tpu.serve.deploy_server.act_request.

Usage:
  python scripts/deploy_robotwin.py --model_path InternVL3-2B/ --port 8000
Offline smoke (tiny random-init policy):
  python scripts/deploy_robotwin.py --tiny --port 8000
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
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlaser_tpu.core.distributed import respect_platform_env
    from vlaser_tpu.eval.robotwin_eval import RoboTwinPolicy
    from vlaser_tpu.policy.parallel_decoding import (
        ParallelDecodingConfig, ParallelDecodingVLA, SequenceBuilder,
    )
    from vlaser_tpu.serve.deploy_server import PolicyHTTPServer
    from vlaser_tpu.tokenizer.conversation import IMG_CONTEXT_TOKEN

    respect_platform_env()

    from scripts.train_robotwin import ROBOTWIN_TOKENS

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
    else:
        from transformers import AutoTokenizer

        from vlaser_tpu.core.config import vlaser_2b

        tokenizer = AutoTokenizer.from_pretrained(
            args.model_path, use_fast=False, trust_remote_code=True
        )
        n_state = 512
        tokenizer.add_tokens(ROBOTWIN_TOKENS + [IMG_CONTEXT_TOKEN],
                             special_tokens=True)
        state_start = len(tokenizer)
        tokenizer.add_tokens([f"<state_{i}>" for i in range(n_state)],
                             special_tokens=True)
        vlm = vlaser_2b(vocab_size=len(tokenizer))
        vlm = dataclasses.replace(
            vlm,
            vision=dataclasses.replace(vlm.vision, image_size=224),
            select_layer=-2,
            img_context_token_id=tokenizer.convert_tokens_to_ids(
                IMG_CONTEXT_TOKEN),
        )
        cfg = ParallelDecodingConfig(vlm=vlm, action_dim=14, state_dim=14,
                                     state_vocab_size=n_state)

    tok_ids = {
        "bos": 1, "eos": 2,
        "img_context": tokenizer.convert_tokens_to_ids(IMG_CONTEXT_TOKEN),
    }
    for t in ROBOTWIN_TOKENS:
        tok_ids[t.strip("<>")] = tokenizer.convert_tokens_to_ids(t)
    builder = SequenceBuilder(cfg, tok_ids, state_token_start=state_start,
                              pad_token_id=0)
    model = ParallelDecodingVLA(
        cfg, compute_dtype=jnp.bfloat16,
        attn_impl="reference" if args.tiny else "auto",
    )

    img = cfg.vlm.vision.image_size
    if args.tiny:
        text = np.zeros((1, cfg.max_text_tokens), np.int64)
        ids0, mask0 = builder.build(text, np.zeros((1, cfg.state_dim)))
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ids0),
            jnp.zeros((1, img, img, 3), jnp.float32), jnp.asarray(mask0),
        )
    else:
        assert args.ckpt, "need --ckpt (orbax) for real serving"
        from vlaser_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt)

    def normalize(images):
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (images.astype(np.float32) / 255.0 - mean) / std

    policy = RoboTwinPolicy(model, params, builder, tokenizer, normalize)

    def policy_fn(image, instruction, qpos):
        if image.shape[0] != img:
            from PIL import Image as PILImage

            image = np.asarray(
                PILImage.fromarray(image.astype(np.uint8)).resize(
                    (img, img), PILImage.BICUBIC)
            )
        qpos = (np.zeros((cfg.state_dim,), np.float32)
                if qpos is None else np.asarray(qpos, np.float32))
        return policy.get_actions(image, qpos, instruction)

    srv = PolicyHTTPServer(policy_fn, host=args.host, port=args.port)
    logging.getLogger("vlaser_tpu.serve").info(
        "serving on %s:%d (POST /act)", args.host, srv.port)
    print(f"READY port={srv.port}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
