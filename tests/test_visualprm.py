"""VisualPRM pipeline: step splitting, MC prefix scoring with early stop,
PRM/ORM conversation construction."""

from vlaser_tpu.data.visualprm_pipeline import (PRM_SYSTEM_PROMPT,
                                                build_process_supervision,
                                                item_to_orm_conversation,
                                                item_to_prm_conversation,
                                                mc_score_steps, split_response)


def test_split_response_regroups_to_max_steps():
    resp = "\n\n".join(f"s{i}" for i in range(7))
    steps = split_response(resp, max_steps=3)
    assert len(steps) <= 3
    assert "\n\n".join(steps) == resp


def test_mc_score_steps_early_stop():
    item = {"question": "1+1?", "answer": "2"}
    response = "First compute.\n\nWrong turn.\n\nNever reached."

    def continue_fn(it, prefix):
        # continuations from the first prefix succeed; later ones never do
        if prefix == "First compute.":
            return "Final answer: 2"
        return "Final answer: 5"

    scored = mc_score_steps(item, response, continue_fn, num_mc_sequences=4)
    assert [s["score"] for s in scored] == [1.0, 0, 0]
    # early stop: the third step was never sampled
    assert scored[2]["num_mc_total"] == 0
    assert scored[1]["num_mc_total"] == 4


def test_build_and_convert_conversations():
    items = [{"image": "a.jpg", "question": "2*3?", "answer": "6"}]
    rollout = lambda it, k: "Multiply.\n\nFinal answer: 6"
    cont = lambda it, prefix: "Final answer: 6"
    rows = build_process_supervision(
        items, rollout, cont, num_return_sequences=2, num_mc_sequences=2,
    )
    assert len(rows) == 2
    assert all(s["score"] == 1.0 for s in rows[0]["steps_with_score"])

    prm = item_to_prm_conversation(rows[0])
    assert prm["conversations"][0] == {
        "from": "system", "value": PRM_SYSTEM_PROMPT,
    }
    assert prm["conversations"][1]["value"].startswith(
        "### Question:\n2*3?\n\n### Solution Process:\n"
    )
    assert prm["conversations"][2]["value"] == "+"
    # human/gpt turns alternate per step
    assert len(prm["conversations"]) == 1 + 2 * 2

    orm = item_to_orm_conversation(rows[0])
    assert orm["conversations"][2]["value"] == "+"
    assert len(orm["conversations"]) == 3


def test_prm_conversation_early_stop_on_bad_step():
    item = {
        "image": "", "question": "q", "answer": "1",
        "steps_with_score": [
            {"step": "good", "score": 1.0},
            {"step": "bad", "score": 0.0},
            {"step": "unreached", "score": 0.0},
        ],
    }
    prm = item_to_prm_conversation(item, early_stop=True)
    # system + 2 steps (the '-' step ends the conversation)
    assert len(prm["conversations"]) == 5
    assert prm["conversations"][-1]["value"] == "-"
    orm = item_to_orm_conversation(item)
    assert orm["conversations"][2]["value"] == "-"
