"""Batched VLM benchmark evaluation (the embodied-reasoning sweep).

Parity surface: Vlaser_VLM/internvl_chat/eval/* — the reference ships one
script per benchmark (vqa, mmbench, pope, ERQA, EgoPlan, VSI, ... 23 dirs,
SURVEY.md §2.3); they all share the same skeleton: jsonl/dataset iteration ->
dynamic tiling -> model.chat -> answer extraction -> accuracy. Here that
skeleton is one harness with pluggable answer extractors:

- multiple-choice (mmbench/ERQA/EgoPlan/VSI style): first A-E letter match
- exact / substring match (VQA style)
- point grounding lives in eval/point_eval.py

Items are batched through VlaserChat.batch_chat with tile-count bucketing so
repeated batches reuse compiled programs.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np


def extract_mc_answer(response: str, choices: Sequence[str] = "ABCDE") -> Optional[str]:
    """First standalone choice letter (eval scripts' common post-processing)."""
    m = re.search(rf"\b([{''.join(choices)}])\b", response.strip().upper())
    return m.group(1) if m else None


def exact_match(response: str, answer: str) -> bool:
    return response.strip().lower() == answer.strip().lower()


def substring_match(response: str, answer: str) -> bool:
    return answer.strip().lower() in response.strip().lower()


@dataclass
class BenchmarkItem:
    question: str
    answer: str
    image: Optional[object] = None  # PIL image or None
    choices: Optional[List[str]] = None


def load_jsonl_benchmark(path: str, image_root: str = "") -> List[BenchmarkItem]:
    import os

    from PIL import Image

    items = []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            img = None
            if d.get("image"):
                img = Image.open(os.path.join(image_root, d["image"])).convert("RGB")
            items.append(
                BenchmarkItem(
                    question=d["question"], answer=str(d["answer"]),
                    image=img, choices=d.get("choices"),
                )
            )
    return items


def format_mc_question(item: BenchmarkItem) -> str:
    q = item.question
    if item.choices:
        opts = "\n".join(
            f"{chr(ord('A') + i)}. {c}" for i, c in enumerate(item.choices)
        )
        q = f"{q}\n{opts}\nAnswer with the option's letter from the given choices directly."
    return q


def evaluate_benchmark(
    chat,  # inference.chat.VlaserChat
    items: Sequence[BenchmarkItem],
    *,
    mode: str = "multiple_choice",  # multiple_choice | exact | substring
    batch_size: int = 8,
    max_tiles: int = 12,
    image_size: int = 448,
) -> Dict[str, float]:
    from ..image.tiling import load_image_tiles

    correct = total = 0
    responses = []
    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        questions, tiles_list, num_patches = [], [], []
        for it in chunk:
            q = format_mc_question(it) if mode == "multiple_choice" else it.question
            if it.image is not None:
                tiles = load_image_tiles(it.image, image_size, max_num=max_tiles)
                tiles_list.append(tiles)
                num_patches.append(len(tiles))
                q = "<image>\n" + q
            else:
                num_patches.append(0)
            questions.append(q)
        pixel_values = (
            np.concatenate(tiles_list, axis=0) if tiles_list else None
        )
        outs = chat.batch_chat(questions, pixel_values, num_patches_list=num_patches)
        for it, resp in zip(chunk, outs):
            responses.append(resp)
            total += 1
            if mode == "multiple_choice":
                ok = extract_mc_answer(resp) == it.answer.strip().upper()
            elif mode == "exact":
                ok = exact_match(resp, it.answer)
            else:
                ok = substring_match(resp, it.answer)
            correct += int(ok)
    return {
        "accuracy": correct / max(total, 1),
        "num_evaluated": total,
        "responses": responses,
    }
