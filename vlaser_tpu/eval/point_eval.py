"""Point-grounding evaluation (Pixmo-Points / Paco-Lavis protocol).

Parity surface: Vlaser_VLM/internvl_chat/eval/evaluate_point_pixmo.py —
point_in_radius (:24, radius 25px), <ref>...</ref> expression parsing, [x, y]
point extraction from model output, accuracy = fraction of predictions within
radius of any GT point.
"""

from __future__ import annotations

import json
import re
from math import sqrt
from typing import Dict, List, Optional, Sequence, Tuple


def point_in_radius(
    pred: Tuple[float, float],
    targets: Sequence[Tuple[float, float]],
    radius: float = 25.0,
) -> bool:
    for tgt in targets:
        if sqrt((pred[0] - tgt[0]) ** 2 + (pred[1] - tgt[1]) ** 2) <= radius:
            return True
    return False


def parse_points(text: str) -> List[Tuple[int, int]]:
    """Extract [x, y] integer points from a model response."""
    return [(int(x), int(y)) for x, y in re.findall(
        r"\[\s*(\d+)\s*,\s*(\d+)\s*\]", text)]


def parse_ref_expression(text: str) -> Optional[str]:
    m = re.search(r"<ref>(.*?)</ref>", text)
    return m.group(1) if m else None


def load_gt_points(jsonl_path: str) -> Dict[Tuple[str, str], List[Tuple[int, int]]]:
    """(image, expression) -> GT points, from conversation-format jsonl."""
    gt = {}
    with open(jsonl_path) as f:
        for line in f:
            item = json.loads(line.strip())
            image = item["image"]
            for conv in item["conversations"]:
                if conv["from"] == "gpt":
                    expr = parse_ref_expression(conv["value"])
                    points = parse_points(conv["value"])
                    if expr and points:
                        gt[(image, expr)] = points
    return gt


def evaluate_points(
    predictions: Sequence[Dict],  # {image, expression, response, width, height}
    gt: Dict[Tuple[str, str], List[Tuple[int, int]]],
    radius: float = 25.0,
    normalized_scale: Optional[float] = None,  # e.g. 1000 if model emits 0-1000
) -> Dict[str, float]:
    correct = total = 0
    for p in predictions:
        targets = gt.get((p["image"], p["expression"]))
        if targets is None:
            continue
        total += 1
        pts = parse_points(p["response"])
        if not pts:
            continue
        x, y = pts[0]
        if normalized_scale:
            x = x / normalized_scale * p["width"]
            y = y / normalized_scale * p["height"]
        if point_in_radius((x, y), targets, radius):
            correct += 1
    return {
        "accuracy": correct / max(total, 1),
        "num_evaluated": total,
        "num_correct": correct,
    }
