"""HF-parity chat API: chat / batch_chat over the jitted generate loop.

Parity surface: modeling_internvl_chat.py chat (:343-398) and batch_chat
(:293-341): conversation-template prompt assembly, <image> -> <img> +
N*<IMG_CONTEXT> + </img> expansion, eos from the template separator, response
split at the separator. TPU specifics: prompts are right-padded to bucketed
lengths (multiples of `bucket`) so repeated calls reuse compiled programs; the
decode loop itself is inference/sampling.py's prefill + lax.scan.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenizer.conversation import build_chat_query, get_conv_template
from .sampling import make_generate_fn, trim_output


def _llm_is_quantized(params) -> bool:
    """True when the variable tree carries an int8 LLM decode stack
    (core/quant DEFAULT_PATTERNS layout) — the precondition for the fused
    serving runner (inference/fused_runner.pack_qwen2_stack)."""
    try:
        q = params["quant"]["language_model"]
        return ("embedding_q" in q["embed_tokens"]
                and "kernel_q" in
                q["model"]["layers"]["self_attn"]["q_proj"])
    except (KeyError, TypeError):
        return False


def build_batch_queries(
    template: str,
    questions: Sequence[str],
    num_patches_list,
    num_image_token: int,
    system_message: Optional[str] = None,
) -> List[str]:
    """batch_chat prompt assembly (modeling_internvl_chat.py:293-341):
    per-question template render with <image> -> <img> + N*<IMG_CONTEXT> +
    </img> expansion. num_patches_list: one entry per question — an int
    (tile count of a single image) or a list of ints (per-image counts for
    multi-image/video prompts, one per <image> tag)."""
    queries = []
    for i, q in enumerate(questions):
        entry = num_patches_list[i] if i < len(num_patches_list) else 0
        if isinstance(entry, (list, tuple)):
            per_img = [n for n in entry if n]
        else:
            per_img = [entry] if entry else []
        if per_img and "<image>" not in q:
            q = "<image>\n" + q
        queries.append(
            build_chat_query(
                template, q, per_img, num_image_token,
                system_message=system_message,
            )
        )
    return queries


class VlaserChat:
    def __init__(
        self,
        model,  # InternVLChatModel (flax)
        params,
        tokenizer,
        *,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        num_beams: int = 1,
        speculative_draft_len: int = 0,
        bucket: int = 256,
        system_message: Optional[str] = None,
        cache_dtype=jnp.bfloat16,
        use_fused="auto",
    ):
        """num_beams > 1 selects the jitted beam searcher (greedy beams);
        repetition_penalty follows HF semantics — the generation_config
        surface of modeling_internvl_chat.py:400-438. use_fused:
        "auto" | True | False — see the fused-routing comment below."""
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.cfg = model.cfg
        self.bucket = bucket
        self.system_message = system_message
        template = get_conv_template(self.cfg.template)
        sep = template.sep.strip()
        self.eos_token_id = tokenizer.convert_tokens_to_ids(sep)
        self.sep = sep
        if speculative_draft_len > 0:
            # prompt-lookup speculative decoding (inference/speculative.py):
            # greedy-exact, single-stream (chat(), not batch_chat)
            from .speculative import make_speculative_generate_fn

            assert num_beams == 1 and temperature == 0.0 and \
                repetition_penalty == 1.0, (
                    "speculative decode is greedy (no beams/penalty/sampling)"
                )
            self._gen = make_speculative_generate_fn(
                model,
                max_new_tokens=max_new_tokens,
                eos_token_ids=[self.eos_token_id],
                pad_token_id=self.cfg.pad_token_id,
                draft_len=speculative_draft_len,
                cache_dtype=cache_dtype,
            )
        elif num_beams > 1:
            from .beam_search import make_beam_generate_fn

            assert temperature == 0.0, "beam search is greedy (do_sample=False)"
            beam_gen = make_beam_generate_fn(
                model,
                max_new_tokens=max_new_tokens,
                num_beams=num_beams,
                eos_token_ids=[self.eos_token_id],
                pad_token_id=self.cfg.pad_token_id,
                cache_dtype=cache_dtype,
            )
            self._gen = lambda params, ids, seg, pix, rng: beam_gen(
                params, ids, seg, pix
            )
        else:
            self._gen = make_generate_fn(
                model,
                max_new_tokens=max_new_tokens,
                eos_token_ids=[self.eos_token_id],
                pad_token_id=self.cfg.pad_token_id,
                temperature=temperature,
                top_k=top_k,
                repetition_penalty=repetition_penalty,
                cache_dtype=cache_dtype,
            )
        # int8/w8a8-quantized params route single-stream greedy chat()
        # through the fused serving runner (inference/fused_runner.py):
        # decode steps run the fused int8 stack kernel and <=13-tile
        # prompts run the w8a8 fused ViT — the measured-best serving path
        # (docs/STATUS.md round 4: ViT 47.2 vs 70.9 ms at 13 tiles) now
        # reachable from the standard chat entry, not only from bench.py
        # (round-4 VERDICT #2). batch_chat / sampled / beam / penalty
        # requests keep the XLA generator. use_fused "auto" routes only on
        # a real TPU backend (off-TPU the Pallas kernels would run in
        # interpret mode — orders of magnitude slower than the XLA path)
        # and only at the kernel's bf16 KV-cache dtype (the fused decode
        # stack does not honor a custom cache_dtype); True forces it
        # (tests/interpret), False disables.
        self._fused_gen = None
        fused_ok = (use_fused is True) or (
            use_fused == "auto"
            and jax.default_backend() == "tpu"
            and cache_dtype == jnp.bfloat16
        )
        if (fused_ok and temperature == 0.0 and repetition_penalty == 1.0
                and num_beams == 1 and speculative_draft_len == 0
                and _llm_is_quantized(params)):
            from .fused_runner import make_fused_generate_fn

            self._fused_gen = make_fused_generate_fn(
                model,
                max_new_tokens=max_new_tokens,
                eos_token_ids=[self.eos_token_id],
                pad_token_id=self.cfg.pad_token_id,
            )
        self._rng = jax.random.PRNGKey(0)

    def _encode(self, queries: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        all_ids = [
            self.tokenizer(q, add_special_tokens=False)["input_ids"] for q in queries
        ]
        max_len = max(len(i) for i in all_ids)
        max_len = ((max_len + self.bucket - 1) // self.bucket) * self.bucket
        b = len(all_ids)
        ids = np.full((b, max_len), self.cfg.pad_token_id, np.int32)
        seg = np.zeros((b, max_len), np.int32)
        for i, row in enumerate(all_ids):
            ids[i, : len(row)] = row
            seg[i, : len(row)] = 1
        return jnp.asarray(ids), jnp.asarray(seg)

    def _generate(self, queries, pixel_values) -> List[str]:
        ids, seg = self._encode(queries)
        pix = None if pixel_values is None else jnp.asarray(pixel_values)
        self._rng, sub = jax.random.split(self._rng)
        gen = self._gen
        if self._fused_gen is not None and ids.shape[0] == 1:
            gen = self._fused_gen  # single-stream greedy: fused serving path
        tokens, num = gen(self.params, ids, seg, pix, sub)
        outs = trim_output(tokens, num, [self.eos_token_id])
        texts = []
        for row in outs:
            text = self.tokenizer.decode(row, skip_special_tokens=True)
            texts.append(text.split(self.sep)[0].strip())
        return texts

    def chat(
        self,
        question: str,
        pixel_values: Optional[np.ndarray] = None,  # [T, H, W, 3] tiles
        history: Optional[List[Tuple[str, str]]] = None,
        num_patches_list: Optional[List[int]] = None,
        return_history: bool = False,
    ):
        if num_patches_list is None:
            num_patches_list = (
                [pixel_values.shape[0]] if pixel_values is not None else []
            )
        if history is None and pixel_values is not None and "<image>" not in question:
            question = "<image>\n" + question
        query = build_chat_query(
            self.cfg.template, question, num_patches_list,
            self.cfg.num_image_token, history=history,
            system_message=self.system_message,
        )
        response = self._generate([query], pixel_values)[0]
        if return_history:
            return response, (history or []) + [(question, response)]
        return response

    def batch_chat(
        self,
        questions: Sequence[str],
        pixel_values: Optional[np.ndarray] = None,  # concat tiles across batch
        num_patches_list: Optional[List] = None,
    ) -> List[str]:
        """num_patches_list: one entry per question — an int (tile count of
        that sample's single image) or a list of ints (per-image tile counts
        for multi-image/video prompts, one per <image> tag; the reference
        expresses this through chat()'s num_patches_list,
        modeling_internvl_chat.py:343-376)."""
        if num_patches_list is None:
            num_patches_list = (
                [pixel_values.shape[0]] if pixel_values is not None else [0] * 0
            )
        queries = build_batch_queries(
            self.cfg.template, questions, num_patches_list,
            self.cfg.num_image_token, system_message=self.system_message,
        )
        return self._generate(queries, pixel_values)
