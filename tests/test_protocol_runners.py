"""End-to-end protocol runners driven by a fake chat (no model): prompt
assembly, batching, answer routing, and metric wiring."""

import json

import numpy as np
import pytest
from PIL import Image

from vlaser_tpu.eval.protocol_runners import (run_caption, run_grounding,
                                              run_mc_benchmark, run_mme,
                                              run_vqa)


class FakeChat:
    """Returns canned responses keyed by substring of the question, and
    records every prompt for assertions."""

    def __init__(self, rules):
        self.rules = rules  # [(substring, response)]
        self.prompts = []

    def batch_chat(self, questions, pixel_values, num_patches_list=None):
        outs = []
        for q in questions:
            self.prompts.append(q)
            for sub, resp in self.rules:
                if sub in q:
                    outs.append(resp)
                    break
            else:
                outs.append("")
        return outs


def _write_img(path):
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 48, 3), np.uint8)
    ).save(path)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_run_mc_benchmark(tmp_path):
    _write_img(tmp_path / "a.jpg")
    data = tmp_path / "mc.jsonl"
    _write_jsonl(data, [
        {"image": "a.jpg", "question": "What animal?",
         "choices": ["cat", "dog"], "answer": "B"},
        {"question": "2+2?", "choices": ["3", "4"], "answer": "B"},
    ])
    chat = FakeChat([("What animal?", "B. dog"), ("2+2?", "3")])
    out = run_mc_benchmark(chat, str(data), str(tmp_path), batch_size=2)
    assert out["accuracy"] == 0.5
    # prompt carries the option lines + the answer-directly instruction
    assert "A. cat\nB. dog" in chat.prompts[0]
    assert chat.prompts[0].startswith("<image>\n")
    assert "letter from the given choices directly" in chat.prompts[0]


def test_run_vqa_score_and_postprocess(tmp_path):
    _write_img(tmp_path / "a.jpg")
    data = tmp_path / "vqa.jsonl"
    _write_jsonl(data, [
        {"image": "a.jpg", "question": "What is it?",
         "annotation": ["cat"] * 10},
    ])
    # free-form response is stripped to the noun by post_process_vqa
    chat = FakeChat([("What is it?", "It is a cat.")])
    out = run_vqa(chat, str(data), str(tmp_path), metric="vqa_score")
    assert out["vqa_score"] == 1.0
    assert "single word or phrase" in chat.prompts[0]


def test_run_vqa_dataset_routing(tmp_path):
    _write_img(tmp_path / "a.jpg")
    data = tmp_path / "chart.jsonl"
    _write_jsonl(data, [
        {"image": "a.jpg", "question": "Value?", "annotation": "100"},
    ])
    chat = FakeChat([("Value?", "104")])  # within 5% relaxed tolerance
    out = run_vqa(chat, str(data), str(tmp_path), dataset="chartqa_human")
    assert out["relaxed_accuracy"] == 1.0


def test_run_grounding(tmp_path):
    _write_img(tmp_path / "a.jpg")
    data = tmp_path / "ref.jsonl"
    _write_jsonl(data, [
        {"image": "a.jpg", "sent": "the red cup",
         "bbox": [100, 100, 300, 300], "width": 1000, "height": 500},
    ])
    chat = FakeChat([("red cup", "[[100, 200, 300, 600]]")])
    out = run_grounding(chat, str(data), str(tmp_path))
    assert out["precision@1"] == 1.0
    assert "<ref>the red cup</ref>" in chat.prompts[0]


def test_run_mme_pairs(tmp_path):
    _write_img(tmp_path / "a.jpg")
    data = tmp_path / "mme.jsonl"
    _write_jsonl(data, [
        {"task": "existence", "image": "a.jpg",
         "question": "Is there a dog?", "answer": "yes"},
        {"task": "existence", "image": "a.jpg",
         "question": "Is there a cat?", "answer": "no"},
    ])
    chat = FakeChat([("dog", "Yes, there is."), ("cat", "No.")])
    out = run_mme(chat, str(data), str(tmp_path))
    assert out["existence_score"] == pytest.approx(200.0)
    assert out["Perception"] == pytest.approx(200.0)


def test_run_caption(tmp_path):
    # two-image corpus: CIDEr idf is degenerate (all-zero) at corpus size 1
    _write_img(tmp_path / "a.jpg")
    _write_img(tmp_path / "b.jpg")
    data = tmp_path / "cap.jsonl"
    _write_jsonl(data, [
        {"image": "a.jpg",
         "references": ["a red ball on green grass today ok",
                        "red ball sits on the grass"]},
        {"image": "b.jpg",
         "references": ["two dogs play in the snow",
                        "dogs playing in deep snow"]},
    ])
    caption = iter(["a red ball on green grass today ok",
                    "two dogs play in the snow"])

    class SeqChat(FakeChat):
        def batch_chat(self, questions, pixel_values, num_patches_list=None):
            self.prompts.extend(questions)
            return [next(caption) for _ in questions]

    chat = SeqChat([])
    out = run_caption(chat, str(data), str(tmp_path))
    assert out["Bleu_4"] > 0.9
    assert out["CIDEr"] > 1.0
    assert "one-sentence caption" in chat.prompts[0]


def test_run_mc_benchmark_multi_image(tmp_path):
    _write_img(tmp_path / "a.jpg")
    _write_img(tmp_path / "b.jpg")
    data = tmp_path / "mi.jsonl"
    _write_jsonl(data, [
        {"images": ["a.jpg", "b.jpg"], "question": "Which changed?",
         "choices": ["left", "right"], "answer": "A"},
    ])
    chat = FakeChat([("Which changed?", "A")])
    out = run_mc_benchmark(chat, str(data), str(tmp_path))
    assert out["accuracy"] == 1.0
    assert chat.prompts[0].startswith("Image-1: <image>\nImage-2: <image>\n")


def test_run_mmvp_pair_accuracy(tmp_path):
    from vlaser_tpu.eval.protocol_runners import run_mmvp

    _write_img(tmp_path / "a.jpg")
    _write_img(tmp_path / "b.jpg")
    data = tmp_path / "mmvp.jsonl"
    # pair 1: both right; pair 2: one wrong -> pair accuracy 0.5
    _write_jsonl(data, [
        {"image": "a.jpg", "question": "Q1", "choices": ["x", "y"],
         "answer": "A"},
        {"image": "b.jpg", "question": "Q2", "choices": ["x", "y"],
         "answer": "B"},
        {"image": "a.jpg", "question": "Q3", "choices": ["x", "y"],
         "answer": "A"},
        {"image": "b.jpg", "question": "Q4", "choices": ["x", "y"],
         "answer": "B"},
    ])
    chat = FakeChat([("Q1", "A"), ("Q2", "B"), ("Q3", "A"), ("Q4", "A")])
    out = run_mmvp(chat, str(data), str(tmp_path))
    assert out["pair_accuracy"] == 0.5
    assert out["question_accuracy"] == 0.75
    assert out["num_pairs"] == 2


def test_chat_batches_passes_per_frame_counts(tmp_path):
    """Multi-image items must reach batch_chat as per-frame count LISTS so
    every <image> tag expands (build_chat_query replaces one tag per
    entry)."""
    from vlaser_tpu.eval.protocol_runners import _chat_batches

    _write_img(tmp_path / "a.jpg")
    _write_img(tmp_path / "b.jpg")

    class RecChat(FakeChat):
        def batch_chat(self, questions, pixel_values, num_patches_list=None):
            self.last_npl = num_patches_list
            return [""] * len(questions)

    chat = RecChat([])
    imgs = [Image.open(tmp_path / "a.jpg"), Image.open(tmp_path / "b.jpg")]
    _chat_batches(chat, ["Image-1: <image>\nImage-2: <image>\nQ"],
                  [imgs], max_tiles=1)
    assert isinstance(chat.last_npl[0], list)
    assert len(chat.last_npl[0]) == 2


def test_batch_chat_expands_every_image_tag():
    """VlaserChat.batch_chat with a per-image list entry must emit one
    IMG_START block per <image> tag (the MVBench/multi-image protocols)."""
    from vlaser_tpu.tokenizer.conversation import (IMG_START_TOKEN,
                                                   build_chat_query)

    q = build_chat_query(
        "internvl2_5", "Frame1: <image>\nFrame2: <image>\nQ?", [2, 3], 4,
    )
    assert q.count(IMG_START_TOKEN) == 2
    assert "<image>" not in q
