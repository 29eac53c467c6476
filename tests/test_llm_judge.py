"""LLM-judge protocols: MMHal rating parse/aggregation, LLaVA-Bench pairwise
review parse + relative score, MM-Vet export format."""

import json

from vlaser_tpu.eval.llm_judge import (build_llava_review_content,
                                       evaluate_llava_bench, evaluate_mmhal,
                                       llava_parse_score, mmhal_parse_rating,
                                       mmvet_dump_results)


def test_mmhal_rating_parse():
    assert mmhal_parse_rating("Short analysis.\nRating: 5, very informative") == 5
    assert mmhal_parse_rating("rating: 0, not informative") == 0
    # ambiguous (two ratings mentioned) -> 0 like the reference
    assert mmhal_parse_rating("Rating: 5 or Rating: 2") == 0
    assert mmhal_parse_rating("no rating here") == 0


def test_evaluate_mmhal_aggregation():
    records = [
        {"image_content": ["Cat"], "question": f"q{i}", "gt_answer": "a",
         "model_answer": "b"}
        for i in range(8)
    ]
    ratings = iter([6, 5, 4, 3, 2, 1, 0, 6])

    def judge(prompt):
        assert "### Image Contents\nCat" in prompt
        assert "impartial and objective judge" in prompt
        return f"Because reasons.\nRating: {next(ratings)}"

    out = evaluate_mmhal(records, judge)
    assert out["average_score"] == (6 + 5 + 4 + 3 + 2 + 1 + 0 + 6) / 8
    # ratings < 3 are hallucinations: 2, 1, 0 -> 3 of 8
    assert out["hallucination_rate"] == 3 / 8
    assert out["scores_each_type"][0] == 6.0


def test_llava_parse_and_relative_score():
    assert llava_parse_score("8 9\nGood answers.") == [8.0, 9.0]
    assert llava_parse_score("garbage") == [-1.0, -1.0]
    rules = {"llava_bench_conv": {"role": "Assistant", "prompt": "Rate both."}}
    items = [
        {"category": "conv", "caption": ["a cat photo"], "question": "Q?",
         "answer1": "ref answer", "answer2": "model answer"},
        {"category": "conv", "caption": "ctx", "question": "Q2?",
         "answer1": "r", "answer2": "m"},
    ]
    reviews = iter(["8 6\nok", "10 9\nok"])

    def judge(content, system=None):
        assert "[Context]" in content and "[End of Assistant 1]" in content
        return next(reviews)

    out = evaluate_llava_bench(items, judge, rules)
    # relative = 100 * (6+9) / (8+10)
    assert abs(out["conv"]["relative_score"] - 100 * 15 / 18) < 1e-9
    assert out["all"]["n"] == 2


def test_build_llava_content_layout():
    rule = {"role": "Assistant", "prompt": "PROMPT"}
    c = build_llava_review_content(["l1", "l2"], "Q", "A1", "A2", rule)
    assert c.startswith("[Context]\nl1\nl2\n\n[Question]\nQ\n\n")
    assert "[Assistant 2]\nA2\n\n[End of Assistant 2]\n\n[System]\nPROMPT" in c


def test_mmvet_dump(tmp_path):
    p = tmp_path / "mmvet.json"
    mmvet_dump_results({"0": "ans a", "1": "ans b"}, str(p))
    d = json.load(open(p))
    assert d == {"v1_0": "ans a", "v1_1": "ans b"}
