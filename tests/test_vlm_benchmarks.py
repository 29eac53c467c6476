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


def test_point_precision_reference_semantics():
    """evaluate_point_pixmo.py:166-186 counting: every predicted point is
    judged; unparsable predictions count 1 in the denominator."""
    from vlaser_tpu.eval.point_eval import evaluate_points_precision

    gt = {("im.png", "the mug"): [(100, 100)]}
    preds = [
        # two points, one inside radius -> 1/2
        {"image": "im.png", "expression": "the mug", "width": 200, "height": 200,
         "response": "<point>[[500, 500], [10, 10]]</point>"},
        # no parsable point -> 0/1
        {"image": "im.png", "expression": "the mug", "width": 200, "height": 200,
         "response": "somewhere on the left"},
    ]
    out = evaluate_points_precision(preds, gt, radius=25.0, normalized_scale=1000.0)
    assert out["num_predictions"] == 3
    assert out["num_correct"] == 1
    assert abs(out["precision"] - 1 / 3) < 1e-9


def test_point_prompt_matches_reference():
    from vlaser_tpu.eval.point_eval import build_point_prompt

    p = build_point_prompt("the red block")
    assert p.startswith(" You are InternVL.")
    assert p.endswith(" Please provide the referring points of the red block.")
    assert '"<point>[[x1, y1], [x2, y2],...]</point>"' in p
    assert "normalized to integers between 0 and 1000" in p


def test_vsi_mra():
    from vlaser_tpu.eval.embodied_benchmarks import mra_score, parse_number

    assert mra_score(10.0, 10.0) == 1.0
    assert mra_score(1000.0, 10.0) == 0.0
    # 20% relative error passes thresholds theta < 0.8 -> 6 of 10
    assert abs(mra_score(12.0, 10.0) - 0.6) < 1e-9
    assert parse_number("about 12.5 meters") == 12.5
    assert parse_number("no idea") is None


def test_point_in_mask():
    import numpy as np

    from vlaser_tpu.eval.embodied_benchmarks import point_in_mask

    mask = np.zeros((10, 20), bool)
    mask[5, 7] = True
    assert point_in_mask((7, 5), mask)
    assert not point_in_mask((5, 7), mask)  # (x,y) order matters
    assert not point_in_mask((100, 100), mask)  # out of bounds


def test_mmbench_tsv_loader(tmp_path):
    import base64, io
    from PIL import Image

    from vlaser_tpu.eval.vlm_benchmarks import MMBENCH_PROMPT, load_mmbench_tsv

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (200, 10, 10)).save(buf, format="PNG")
    b64img = base64.b64encode(buf.getvalue()).decode()
    tsv = tmp_path / "mmbench.tsv"
    tsv.write_text(
        "index\tquestion\thint\tA\tB\tC\tD\timage\tanswer\n"
        f"0\tWhat color?\tLook closely.\tred\tblue\tgreen\t\t{b64img}\tA\n"
    )
    items = load_mmbench_tsv(str(tsv))
    assert len(items) == 1
    q = items[0].question
    assert q.startswith("Look closely.\nWhat color?")
    assert "\nA. red" in q and "\nB. blue" in q and "\nC. green" in q
    assert "\nD." not in q  # empty option dropped
    assert q.endswith(MMBENCH_PROMPT["en"])
    assert items[0].answer == "A" and items[0].choices is None


def test_pope_metrics(tmp_path):
    from PIL import Image

    from vlaser_tpu.eval.vlm_benchmarks import evaluate_pope, load_pope, pope_yes_no

    assert pope_yes_no("No, there is not.") == "no"
    assert pope_yes_no("Yes. It is on the table.") == "yes"
    assert pope_yes_no("There is not a dog, only a cat.") == "no"

    Image.new("RGB", (8, 8)).save(tmp_path / "im.png")
    qf = tmp_path / "pope.jsonl"
    with open(qf, "w") as f:
        for i, (q, label) in enumerate([
            ("Is there a dog?", "yes"), ("Is there a cat?", "no"),
            ("Is there a car?", "no"), ("Is there a tree?", "yes"),
        ]):
            f.write(json.dumps({"image": "im.png", "text": q, "label": label}) + "\n")
    items = load_pope(str(qf), str(tmp_path))

    class StubChat:
        def batch_chat(self, qs, pixel_values, num_patches_list=None):
            out = []
            for q in qs:
                # correct on dog/cat, wrong on car (says yes), wrong on tree
                if "dog" in q: out.append("Yes, a dog.")
                elif "cat" in q: out.append("No.")
                elif "car" in q: out.append("Yes, a car.")
                else: out.append("No tree visible.")
            return out

    m = evaluate_pope(StubChat(), items, batch_size=4)
    assert m["accuracy"] == 0.5
    assert abs(m["precision"] - 0.5) < 1e-9  # tp=1 (dog), fp=1 (car)
    assert abs(m["recall"] - 0.5) < 1e-9  # fn=1 (tree)
    assert abs(m["yes_ratio"] - 0.5) < 1e-9
