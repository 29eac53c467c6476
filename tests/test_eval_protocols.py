"""Benchmark-protocol metrics: VQA-score/ANLS/relaxed, MMMU/MME/MVBench,
RefCOCO grounding, caption BLEU/CIDEr, math_verify.

Each test pins the metric to hand-computed values from the protocol
definitions (reference scripts cited in the modules)."""

import math

import pytest

from vlaser_tpu.eval.caption_metrics import (cider_d, corpus_bleu,
                                             evaluate_captions)
from vlaser_tpu.eval.grounding_bbox import (BBOX_PATTERN,
                                            build_grounding_question,
                                            evaluate_grounding, parse_bbox,
                                            score_grounding)
from vlaser_tpu.eval.math_verify import (extract_answer, mathvista_score,
                                         normalize_extracted_answer,
                                         score_rollouts_math, verify_math)
from vlaser_tpu.eval.mc_protocols import (build_mc_question, mc_post_process,
                                          mme_parse_pred, mme_suite_scores,
                                          mme_task_metrics, mvbench_build_item,
                                          mvbench_check_ans,
                                          mvbench_frame_indices,
                                          mvbench_qa_template)
from vlaser_tpu.eval.vqa_metrics import (EvalAIAnswerProcessor, anls_score,
                                         evaluate_exact_match_accuracy,
                                         evaluate_relaxed_accuracy,
                                         post_process_vqa, relaxed_correctness,
                                         vqa_soft_score)


# ---------------------------------------------------------------- VQA score

def test_evalai_processor_articles_numbers_contractions():
    proc = EvalAIAnswerProcessor()
    assert proc("The two dogs") == "2 dogs"
    assert proc("a cat!") == "cat"
    assert proc("isnt") == "isn't"
    assert proc("Three") == "3"


def test_vqa_soft_score_thirds():
    # pred matches exactly 2 of the other 9 annotators in every leave-one-out
    # fold except when one of the matching two is held out (then 1 match)
    gts = ["cat"] * 2 + ["dog"] * 8
    s = vqa_soft_score("cat", gts)
    # leave-one-out: holding out a 'cat' -> 1/3; holding out a 'dog' -> 2/3
    expected = (2 * (1 / 3) + 8 * (2 / 3)) / 10
    assert abs(s - expected) < 1e-9
    assert vqa_soft_score("dog", gts) == 1.0  # >=3 matches everywhere


def test_vqa_soft_score_requires_ten():
    with pytest.raises(AssertionError):
        vqa_soft_score("x", ["x"] * 9)


def test_anls():
    # 'hello' vs 'hallo': distance 1, len 5 -> 1 - 0.2 = 0.8
    assert abs(anls_score("hello", ["hallo"]) - 0.8) < 1e-9
    # below the 0.5 cutoff -> 0
    assert anls_score("abc", ["xyz"]) == 0.0
    assert anls_score("a", ["a", "zzz"]) == 1.0


def test_relaxed_correctness():
    assert relaxed_correctness("100", "104")  # 4% off
    assert not relaxed_correctness("100", "106")  # 6% off
    assert relaxed_correctness("50%", "0.52")  # percent to float
    assert relaxed_correctness("cat", "CAT")  # non-numeric exact
    # target 0 falls back to exact string compare (reference: `and target_float`)
    assert not relaxed_correctness("0", "0.001")


def test_relaxed_and_exact_entry_apis():
    entries = [
        {"answer": "4", "annotation": "4"},
        {"answer": "10", "annotation": ["9.8", "12"]},
    ]
    assert evaluate_relaxed_accuracy(entries) == 1.0
    assert evaluate_exact_match_accuracy(entries) == 0.5


def test_post_process_vqa():
    assert post_process_vqa("The answer is a red apple.") == "red apple"
    assert post_process_vqa("It is the Eiffel Tower, in Paris.") \
        == "eiffel tower"


# ----------------------------------------------------------- MC protocols

def test_build_mc_question_mmmu_format():
    q, options = build_mc_question("What is shown?", ["cat", "dog"])
    assert q == ("What is shown?\nA. cat\nB. dog\n"
                 "Answer with the option's letter from the given choices "
                 "directly.")
    assert options == {"A": "cat", "B": "dog"}


def test_mc_post_process():
    opts = {"A": "cat", "B": "dog"}
    assert mc_post_process("B", opts) == "B"
    assert mc_post_process("B. dog", opts) == "B"
    assert mc_post_process("it's a dog", opts) == "B"
    assert mc_post_process("unclear", opts) == "unclear"


def test_mme_parse_and_metrics():
    assert mme_parse_pred("Yes, it is") == "yes"
    assert mme_parse_pred("no") == "no"
    assert mme_parse_pred("maybe") == "other"
    pairs = [
        [("yes", "Yes"), ("no", "No")],   # both right -> acc_plus hit
        [("yes", "No"), ("no", "No")],    # one right
    ]
    m = mme_task_metrics(pairs)
    assert m["acc"] == 0.75
    assert m["acc_plus"] == 0.5
    assert m["score"] == (0.75 + 0.5) * 100
    suite = mme_suite_scores({"existence": pairs, "OCR": pairs})
    assert suite["Perception"] == 2 * m["score"]
    assert suite["Cognition"] == 0.0


def test_mvbench_frame_indices_and_template():
    idx = mvbench_frame_indices(32, num_segments=4, first_idx=0)
    assert len(idx) == 4
    assert idx == sorted(idx)
    assert all(0 <= i <= 31 for i in idx)
    # bounded clip at 3 fps
    idx_b = mvbench_frame_indices(100, num_segments=4, bound=(2.0, 10.0))
    assert min(idx_b) >= 6  # round(2*3)
    q, a = mvbench_qa_template(
        {"question": "What moves?", "candidates": ["ball", "cube"],
         "answer": "cube"}
    )
    assert q == "Question: What moves?\nOptions:\n(A) ball\n(B) cube"
    assert a == "(B) cube"


def test_mvbench_check_ans():
    assert mvbench_check_ans("(B) cube", "(b) cube")
    assert mvbench_check_ans("Answer: (A) ball moves", "(a) ball")
    assert not mvbench_check_ans("(A) ball", "(b) cube")


def test_mvbench_build_item(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(1, 13):
        (d / f"{i:05d}.jpg").write_bytes(b"")
    item = mvbench_build_item(
        {"question": "Q?", "candidates": ["x", "y"], "answer": "y"},
        str(d), num_segments=4,
    )
    assert len(item.frame_paths) == 4
    assert item.question.startswith("Frame1: <image>\n")
    assert "Only give the best option." in item.question
    assert item.answer == "(B) y"


# ------------------------------------------------------------- grounding

def test_bbox_parse_variants():
    assert parse_bbox("[[120, 30, 200, 400]]") == (120.0, 30.0, 200.0, 400.0)
    assert parse_bbox("box: [1,2,3,4].") == (1.0, 2.0, 3.0, 4.0)
    assert parse_bbox("no box here") == (0.0, 0.0, 0.0, 0.0)
    assert BBOX_PATTERN.findall("[[1,2,3,4]] and [[5,6,7,8]]")[0] == \
        ("1", "2", "3", "4")


def test_grounding_scoring_thousandths():
    # gt box in pixels on a 1000x500 image (h=500, w=1000)
    gt = [100.0, 100.0, 300.0, 300.0]
    hw = (500.0, 1000.0)
    # normalized-coordinate prediction (x/1000): exactly the gt box
    assert score_grounding("[[100, 200, 300, 600]]", gt, hw)
    # disjoint box
    assert not score_grounding("[[800, 800, 900, 900]]", gt, hw)
    res = evaluate_grounding([
        {"answer": "[[100, 200, 300, 600]]", "gt_bbox": gt, "hw": hw},
        {"answer": "nope", "gt_bbox": gt, "hw": hw},
    ])
    assert res["precision@1"] == 0.5


def test_grounding_prompt():
    assert build_grounding_question("the red cup") == (
        "Please provide the bounding box coordinate of the region this "
        "sentence describes: <ref>the red cup</ref>"
    )


# ---------------------------------------------------------------- caption

def test_bleu_identity_and_zero():
    preds = ["a cat sits on the mat today ok"]
    refs = [["a cat sits on the mat today ok"]]
    assert abs(corpus_bleu(preds, refs) - 1.0) < 1e-9
    assert corpus_bleu(["xyz abc"], [["completely different words here"]]) \
        == 0.0


def test_bleu_brevity_penalty():
    # perfect 4-gram sub-match but half-length -> BP = exp(1 - 2) = e^-1
    preds = ["a b c d"]
    refs = [["a b c d e f g h"]]
    got = corpus_bleu(preds, refs)
    # clipped precisions are all 1.0; BP = exp(1 - 8/4)
    assert abs(got - math.exp(-1.0)) < 1e-9


def test_cider_identity_beats_mismatch():
    preds_good = ["a red ball on green grass", "two dogs play in snow"]
    preds_bad = ["something else entirely", "irrelevant text output"]
    refs = [["a red ball on green grass", "red ball on the grass"],
            ["two dogs play in snow", "dogs playing in the snow"]]
    good = cider_d(preds_good, refs)
    bad = cider_d(preds_bad, refs)
    assert good > bad
    assert good > 1.0  # identity captions score high (max 10)
    out = evaluate_captions([
        {"caption": p, "references": r} for p, r in zip(preds_good, refs)
    ])
    assert out["CIDEr"] == pytest.approx(good)
    assert 0 < out["Bleu_4"] <= 1.0


# ------------------------------------------------------------ math verify

def test_verify_math_numeric_and_symbolic():
    assert verify_math("0.5", "1/2")
    assert verify_math("\\frac{1}{2}", "0.5")
    assert verify_math("2*pi", "6.283185307179586")
    assert verify_math("x**2 - 1", "(x-1)*(x+1)")
    assert not verify_math("3", "4")
    assert verify_math("50%", "0.5")
    assert verify_math("1,234", "1234")
    assert verify_math("(1, 2)", "(1.0, 2.0)")
    assert not verify_math("", "1")


def test_verify_math_latex_forms():
    assert verify_math("\\sqrt{4}", "2")
    assert verify_math("\\boxed{7}", "7")
    assert verify_math("3^{2}", "9")


def test_mathvista_extract_and_score():
    assert extract_answer("Final answer: 42", {}) == "42"
    assert extract_answer('The answer is "B".', {}) == "B"
    # multi-choice normalization: letter -> choice text, fuzzy fallback
    assert normalize_extracted_answer(
        "(b)", ["cat", "dog"], "multi_choice", "text", 2) == "dog"
    assert normalize_extracted_answer(
        "dgo", ["cat", "dog"], "multi_choice", "text", 2) == "dog"
    assert normalize_extracted_answer(
        "3.14159", [], "free_form", "float", 2) == "3.14"
    assert normalize_extracted_answer(
        "7.0", [], "free_form", "integer", 2) == "7"
    res = mathvista_score([
        {"response": "Answer: 3", "question_type": "free_form",
         "answer_type": "integer", "precision": 2, "answer": "3"},
        {"response": "Answer: (A)", "question_type": "multi_choice",
         "answer_type": "text", "choices": ["cat", "dog"], "answer": "dog"},
    ])
    assert res["accuracy"] == 0.5


def test_score_rollouts_math():
    got = score_rollouts_math(
        "1/2", ["reasoning...\nFinal answer: 0.5", "Answer: 0.7", "garbage"]
    )
    assert got == [1, 0, 0]


def test_check_answer_math_verify_mode():
    from vlaser_tpu.data.reasoning_pipeline import check_answer

    assert check_answer("0.5", "1/2", mode="math_verify") == 1
    assert check_answer("0.7", "1/2", mode="math_verify") == 0
    assert check_answer("The cat", "cat", mode="vqa_score") == 1


# ------------------------------------------------------------- data tools

def test_stitch_images_grid():
    import numpy as np
    from PIL import Image

    from vlaser_tpu.utils.tools import stitch_images_grid

    imgs = {c: Image.fromarray(np.full((30, 40, 3), i * 40, np.uint8))
            for i, c in enumerate(["A", "B", "C", "D", "E", "F"])}
    out = stitch_images_grid(imgs, image_size=32)
    # 3x2 grid of (2*32, 32) views (images_stitching.py layout)
    assert out.size == (64 * 3, 32 * 2)


def test_json_to_jsonl(tmp_path):
    import json

    from vlaser_tpu.utils.tools import json_to_jsonl

    jp = tmp_path / "x.json"
    jp.write_text(json.dumps([{"q": 1}, {"id": 9, "q": 2}]))
    n = json_to_jsonl(str(jp), str(tmp_path / "x.jsonl"))
    rows = [json.loads(l) for l in open(tmp_path / "x.jsonl")]
    assert n == 2
    assert rows[0]["id"] == 0 and rows[1]["id"] == 9


def test_video_frame_indices_reference_rounding():
    from vlaser_tpu.utils.tools import video_frame_indices

    # extract_video_frames.py get_index: int(seg/2 + round(seg*i))
    assert video_frame_indices(100, 4) == [12, 37, 62, 86]
    # shorter than num_segments: all frames + last repeated
    assert video_frame_indices(2, 4) == [0, 1, 1, 1]
