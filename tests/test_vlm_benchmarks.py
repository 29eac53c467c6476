"""Generic VLM benchmark harness tests (mock chat)."""

import json

import numpy as np
import pytest

from vlaser_tpu.eval.vlm_benchmarks import (
    BenchmarkItem,
    evaluate_benchmark,
    exact_match,
    extract_mc_answer,
    format_mc_question,
    load_jsonl_benchmark,
    substring_match,
)


def test_mc_extraction():
    assert extract_mc_answer("The answer is B.") == "B"
    assert extract_mc_answer("b") == "B"
    assert extract_mc_answer("I think (C) is right") == "C"
    assert extract_mc_answer("no letters here") is None
    # does not match letters inside words
    assert extract_mc_answer("cabbage") is None


def test_matchers():
    assert exact_match(" Yes ", "yes")
    assert substring_match("the red cup is on the left", "red cup")
    assert not exact_match("yes indeed", "yes")


def test_format_mc():
    it = BenchmarkItem(question="Which object?", answer="B",
                       choices=["cup", "plate", "fork"])
    q = format_mc_question(it)
    assert "A. cup" in q and "B. plate" in q and "C. fork" in q
    assert "letter" in q


class MockChat:
    """Answers correctly for even-indexed items."""

    def __init__(self):
        self.i = 0

    def batch_chat(self, questions, pixel_values, num_patches_list=None):
        outs = []
        for _ in questions:
            outs.append("B" if self.i % 2 == 0 else "A")
            self.i += 1
        return outs


def test_evaluate_benchmark(tmp_path):
    from PIL import Image

    img = tmp_path / "x.png"
    Image.new("RGB", (64, 64)).save(img)
    items = []
    with open(tmp_path / "bench.jsonl", "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "question": f"q{i}", "answer": "B",
                "choices": ["a", "b", "c"], "image": "x.png",
            }) + "\n")
    loaded = load_jsonl_benchmark(str(tmp_path / "bench.jsonl"), str(tmp_path))
    assert len(loaded) == 4 and loaded[0].image is not None
    res = evaluate_benchmark(MockChat(), loaded, batch_size=2, max_tiles=1,
                             image_size=64)
    assert res["num_evaluated"] == 4
    assert res["accuracy"] == 0.5
