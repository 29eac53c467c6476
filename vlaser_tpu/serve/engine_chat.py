"""Engine-backed chat surface: VlaserChat's chat/batch_chat API served
through the continuous-batching engine.

The reference's eval/QA surfaces reach their model two ways: static HF
`batch_chat` (modeling_internvl_chat.py:293-341) or a vLLM server
(data-pipeline/RoboTwin-QA/GeneralQA.py:3-8). This class is the second
way for the TPU build: identical prompt assembly and decode-output
handling to inference/chat.VlaserChat, but generation rides
serve/engine.ContinuousBatchingEngine — mixed-length batches decode
in-flight instead of padding to the longest row, and per-request
sampling params pass straight through. Drop-in for any benchmark runner
written against VlaserChat (scripts/eval_vlm.py --engine,
scripts/generate_qa.py --engine).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..inference.chat import build_batch_queries
from ..tokenizer.conversation import build_chat_query, get_conv_template
from .engine import ContinuousBatchingEngine, Request


class EngineChat:
    """chat()/batch_chat() with the engine as the decode backend."""

    def __init__(
        self,
        model,
        params,
        tokenizer,
        *,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        num_slots: int = 16,
        max_len: int = 4096,
        prefill_buckets: Optional[Sequence[int]] = None,
        tile_buckets: Optional[Sequence[int]] = (1, 2, 4, 7, 13),
        system_message: Optional[str] = None,
        cache_dtype=jnp.bfloat16,
        chunk_size: int = 64,
        backend: str = "engine",
        speculative_draft_len: int = 0,
        mesh=None,
        pipeline_depth: int = 1,
        quantize: Optional[str] = None,
    ):
        """backend: "engine" = host-driven continuous batching (per-chunk
        host sync; supports per-request sampling) — the FASTER mode on
        mixed workloads (docs/STATUS.md round 5: ~1019-1103 vs ~860
        tok/s). "offline" = the one-jit on-device schedule
        (serve/offline.py — the vLLM LLM.generate(prompts) API-parity
        mode): greedy only, one host dispatch per batch — pick it for the
        dispatch shape (a host thread that must not babysit decode), not
        for throughput; sampled requests fall back to the engine.

        num_slots / chunk_size / pipeline_depth default to the round-4
        on-chip scheduling sweep's winning config (16 / 64 / 1,
        docs/STATUS.md) so product callers get the measured-best schedule
        without touching serve/engine.py (round-4 VERDICT #8).

        quantize: None (params served as passed), "w8a8" or "int8" —
        builds the serving quant collection in place via
        core/quant.quantize_for_serving, so the CLI / QA-generation
        surfaces reach the measured-best w8a8 config with one flag
        (round-4 VERDICT #2). Already-quantized params pass through."""
        assert backend in ("engine", "offline"), backend
        self.backend = backend
        if quantize is not None:
            from ..core.quant import quantize_for_serving

            params = quantize_for_serving(params, target="vlm",
                                          mode=quantize)
        self.params = params
        self.model = model
        self.tokenizer = tokenizer
        self.cfg = model.cfg
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.system_message = system_message
        template = get_conv_template(self.cfg.template)
        self.sep = template.sep.strip()
        self.eos_token_id = tokenizer.convert_tokens_to_ids(self.sep)
        self.engine = ContinuousBatchingEngine(
            model, params,
            num_slots=num_slots, max_len=max_len,
            eos_token_ids=[self.eos_token_id],
            pad_token_id=self.cfg.pad_token_id,
            prefill_buckets=prefill_buckets,
            tile_buckets=tile_buckets,
            cache_dtype=cache_dtype,
            chunk_size=chunk_size,
            speculative_draft_len=speculative_draft_len,
            mesh=mesh,
            pipeline_depth=pipeline_depth,
        )
        # the engine TP-shards its own param copy; offline fallback and
        # prompt assembly reuse the sharded tree
        self.params = self.engine.params
        self._uid = 0

    def _run(self, reqs, on_token=None):
        # streaming needs per-chunk host commits — the one-jit offline
        # schedule has none, so a streamed call rides the engine
        if self.backend == "offline" and self.temperature == 0.0 \
                and on_token is None:
            from .offline import run_offline

            return run_offline(
                self.model, self.params, reqs,
                num_slots=self.engine.num_slots,
                max_len=self.engine.max_len,
                eos_token_ids=[self.eos_token_id],
                pad_token_id=self.cfg.pad_token_id,
                chunk_size=self.engine.chunk_size,
                cache_dtype=self.engine.cache_dtype,
                prefill_buckets=self.engine.prefill_buckets,
            )
        return self.engine.run(reqs, on_token=on_token)

    def _requests(self, queries, pixel_chunks,
                  max_new_list=None) -> List[Request]:
        reqs = []
        for i, (q, px) in enumerate(zip(queries, pixel_chunks)):
            ids = np.asarray(
                self.tokenizer(q, add_special_tokens=False)["input_ids"],
                np.int32,
            )
            mn = self.max_new_tokens
            if max_new_list is not None and max_new_list[i] is not None:
                # per-request decode budget (OpenAI max_tokens), clamped
                # to the configured length — the engine honors per-row
                # max_new_tokens natively
                mn = max(1, min(int(max_new_list[i]), mn))
            reqs.append(Request(
                uid=self._uid, input_ids=ids, pixel_values=px,
                max_new_tokens=mn,
                temperature=self.temperature, top_k=self.top_k,
                top_p=self.top_p, seed=self._uid,
            ))
            self._uid += 1
        return reqs

    def _decode_texts(self, completions, uids) -> List[str]:
        by_uid = {c.uid: c for c in completions}
        texts = []
        for uid in uids:
            row = by_uid[uid].token_ids
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
        if history is None and pixel_values is not None \
                and "<image>" not in question:
            question = "<image>\n" + question
        query = build_chat_query(
            self.cfg.template, question, num_patches_list,
            self.cfg.num_image_token, history=history,
            system_message=self.system_message,
        )
        reqs = self._requests([query], [pixel_values])
        response = self._decode_texts(self._run(reqs), [reqs[0].uid])[0]
        if return_history:
            return response, (history or []) + [(question, response)]
        return response

    def chat_many(self, items: Sequence[tuple],
                  on_token=None) -> List[str]:
        """Independent chat() calls served as ONE engine batch: items are
        (question, pixel_values | None, history | None) triples — or
        5-tuples adding (num_patches_list | None, max_new | None) for
        per-item multi-image tile counts and a per-request decode budget
        (the OpenAI max_tokens, clamped to the configured length) — each
        with its own template render (incl. multi-turn history —
        batch_chat's surface has no history). This is the cross-request batching hook
        for serve/chat_server.py: concurrent HTTP clients collect into one
        continuous-batching admission instead of serializing (the vLLM
        API-server's request-level batching). Responses are positionally
        aligned with `items` and identical to per-item chat() (engine
        identity, tests/test_engine.py).

        on_token: optional `(item_index, token_id)` streaming callback —
        the engine's per-commit stream re-keyed from internal uids to the
        caller's item positions (serve/chat_server.py SSE streaming)."""
        queries, pixel_chunks, max_new_list = [], [], []
        for it in items:
            question, pixel_values, history = it[0], it[1], it[2]
            npl = it[3] if len(it) > 3 and it[3] is not None else None
            max_new_list.append(it[4] if len(it) > 4 else None)
            if npl is None:
                npl = ([pixel_values.shape[0]]
                       if pixel_values is not None else [])
            if history is None and pixel_values is not None \
                    and "<image>" not in question:
                question = "<image>\n" + question
            queries.append(build_chat_query(
                self.cfg.template, question, npl,
                self.cfg.num_image_token, history=history,
                system_message=self.system_message,
            ))
            pixel_chunks.append(pixel_values)
        reqs = self._requests(queries, pixel_chunks, max_new_list)
        cb = None
        if on_token is not None:
            idx_of = {r.uid: i for i, r in enumerate(reqs)}
            cb = lambda uid, tok: on_token(idx_of[uid], tok)
        return self._decode_texts(self._run(reqs, on_token=cb),
                                  [r.uid for r in reqs])

    def batch_chat(
        self,
        questions: Sequence[str],
        pixel_values: Optional[np.ndarray] = None,  # concat tiles across batch
        num_patches_list: Optional[List] = None,
    ) -> List[str]:
        """Same signature/semantics as VlaserChat.batch_chat; pixel_values
        is the tile concat across the batch, split per request here so each
        request prefills only its own tiles."""
        if num_patches_list is None:
            num_patches_list = (
                [pixel_values.shape[0]] if pixel_values is not None else []
            )
        queries = build_batch_queries(
            self.cfg.template, questions, num_patches_list,
            self.cfg.num_image_token, system_message=self.system_message,
        )
        chunks: List[Optional[np.ndarray]] = []
        off = 0
        for i in range(len(questions)):
            entry = num_patches_list[i] if i < len(num_patches_list) else 0
            n = sum(entry) if isinstance(entry, (list, tuple)) else int(entry)
            if n and pixel_values is not None:
                chunks.append(np.asarray(pixel_values[off:off + n]))
                off += n
            else:
                chunks.append(None)
        reqs = self._requests(queries, chunks)
        uids = [r.uid for r in reqs]
        return self._decode_texts(self._run(reqs), uids)

    def batch_chat_shared_image(
        self,
        questions: Sequence[str],
        pixel_values: Optional[np.ndarray] = None,  # ONE image's tiles
    ) -> List[str]:
        """QA-generation fast path: N questions about the SAME image
        (data-pipeline's per-frame general/spatial/grounding prompt sets).
        The common prompt head — system turn + <img> block, found as the
        longest common prefix of the TOKENIZED queries, so tokenizer merge
        boundaries can't split it wrong — prefills once via
        engine.register_prefix; each question admits only its tail tokens.
        Output is token-identical to batch_chat (pinned in
        tests/test_engine_chat.py)."""
        num_patches = (
            [pixel_values.shape[0]] if pixel_values is not None else []
        )
        queries = []
        for q in questions:
            if pixel_values is not None and "<image>" not in q:
                q = "<image>\n" + q
            queries.append(build_chat_query(
                self.cfg.template, q, num_patches,
                self.cfg.num_image_token, system_message=self.system_message,
            ))
        ids = [
            np.asarray(
                self.tokenizer(q, add_special_tokens=False)["input_ids"],
                np.int32,
            )
            for q in queries
        ]
        lcp = min(len(a) for a in ids) - 1  # every tail keeps >= 1 token
        for a in ids[1:]:
            n = min(lcp, len(a))
            diff = np.nonzero(a[:n] != ids[0][:n])[0]
            if diff.size:
                lcp = int(diff[0])
        if pixel_values is not None:
            # the pixel scatter happens in the prefix prefill, so the whole
            # <IMG_CONTEXT> block must sit inside the common prefix
            want = self.cfg.num_image_token * pixel_values.shape[0]
            got = int((ids[0][:lcp] == self.cfg.img_context_token_id).sum())
            if got != want:
                raise ValueError(
                    f"shared-image prefix covers {got}/{want} image tokens; "
                    "questions must not diverge before the <image> block"
                )
        pid = self.engine.register_prefix(ids[0][:lcp], pixel_values)
        try:
            reqs = []
            for a in ids:
                reqs.append(Request(
                    uid=self._uid, input_ids=a[lcp:], prefix_id=pid,
                    max_new_tokens=self.max_new_tokens,
                    temperature=self.temperature, top_k=self.top_k,
                    top_p=self.top_p, seed=self._uid,
                ))
                self._uid += 1
            uids = [r.uid for r in reqs]
            return self._decode_texts(self.engine.run(reqs), uids)
        finally:
            self.engine.release_prefix(pid)
