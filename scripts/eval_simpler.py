"""Closed-loop SimplerEnv evaluation (slurm/eval_simpler_bridge.sh analogue).

Usage:
  python scripts/eval_simpler.py --model_path Vlaser-2B/ --ckpt vla.pt \
      --task widowx_carrot_on_plate --stats config/bridge_statistics.json \
      --episodes 240 [--robot fractal] [--variant_aggregation]
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
    ap.add_argument("--ckpt", required=True, help="torch .pt or orbax dir")
    ap.add_argument("--task", default="widowx_carrot_on_plate")
    ap.add_argument("--stats", required=True, help="dataset statistics json")
    ap.add_argument("--episodes", type=int, default=240)
    ap.add_argument("--act_steps", type=int, default=4)
    ap.add_argument("--robot", choices=["bridge", "fractal"], default="bridge")
    ap.add_argument("--variant_aggregation", action="store_true")
    ap.add_argument("--visual_matching", action="store_true")
    ap.add_argument("--video_dir", default=None)
    ap.add_argument("--results", default=None)
    ap.add_argument("--fused", action="store_true", default=True,
                    help="int8-quantize the policy and serve through the "
                         "fused denoise/ViT kernels (batch-1, ~180 act/s "
                         "on v5e vs ~145 XLA); --no-fused for the XLA path")
    ap.add_argument("--no-fused", dest="fused", action="store_false")
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vlaser_tpu.core.config import vlaser_2b_vla
    from vlaser_tpu.envs.adapters import BridgeSimplerAdapter, EDRSimplerAdapter
    from vlaser_tpu.eval.simpler_eval import (
        EvalConfig, EvalRunner, run_fractal_protocol,
    )
    from vlaser_tpu.policy.pizero import PiZeroVLA
    from vlaser_tpu.policy.processing import InternVLAProcessor
    from vlaser_tpu.serve.policy_server import PolicyServer
    from vlaser_tpu.utils.tools import (
        convert_pizero_torch_checkpoint, load_torch_checkpoint,
    )

    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False,
                                              trust_remote_code=True)
    cfg = vlaser_2b_vla(vocab_size=len(tokenizer))
    model = PiZeroVLA(cfg, param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    if args.ckpt.endswith(".pt"):
        params = {"params": convert_pizero_torch_checkpoint(
            load_torch_checkpoint(args.ckpt), cfg.vlm.llm.num_layers,
            cfg.vlm.vision.num_layers,
        )}
    else:
        raise SystemExit("orbax VLA restore: use utils.checkpoint.restore_checkpoint")

    adapter_cls = BridgeSimplerAdapter if args.robot == "bridge" else EDRSimplerAdapter
    img = cfg.vlm.vision.image_size
    adapter = adapter_cls(dataset_statistics_path=args.stats, image_size=(img, img))
    processor = InternVLAProcessor(
        tokenizer, num_image_tokens=cfg.vlm.num_image_token,
        max_seq_len=cfg.max_image_text_tokens,
    )
    if args.fused:
        from vlaser_tpu.core.quant import POLICY_PATTERNS, quantize_variables

        params = quantize_variables(params, POLICY_PATTERNS)
    server = PolicyServer(model, params, adapter, processor, args.act_steps,
                          fused=args.fused)
    ecfg = EvalConfig(task=args.task, n_eval_episode=args.episodes,
                      act_steps=args.act_steps, record_video_dir=args.video_dir,
                      results_path=args.results)
    if args.variant_aggregation:
        print(run_fractal_protocol(ecfg, server, args.task, protocol="va"))
    elif args.visual_matching:
        print(run_fractal_protocol(ecfg, server, args.task, protocol="vm"))
    else:
        print(EvalRunner(ecfg, server).run())


if __name__ == "__main__":
    main()
