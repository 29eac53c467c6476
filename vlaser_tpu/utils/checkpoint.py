"""Checkpoint / resume via orbax.

Replaces the reference's three checkpoint systems (SURVEY.md §5): HF Trainer
save_steps + auto-resume, Simpler's single .pt (model + optimizers + scheds +
counters, train.py:641-672), accelerate checkpoint-N dirs. One orbax-backed
store holds sharded params + optax state + step + data-stream state; restore
respects the live mesh sharding.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(
    directory: str,
    step: int,
    state,  # TrainState
    data_state: Optional[Dict[str, Any]] = None,
    max_to_keep: int = 3,
):
    import orbax.checkpoint as ocp

    mgr = _mgr(os.path.abspath(directory), max_to_keep)
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step}
    args = {"state": ocp.args.StandardSave(payload)}
    if data_state is not None:
        args["data"] = ocp.args.JsonSave(data_state)
    mgr.save(step, args=ocp.args.Composite(**args))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str,
    state,  # TrainState template (abstract or concrete) for structure/sharding
    step: Optional[int] = None,
):
    """Returns (TrainState, data_state|None). Auto-resumes the latest step
    (HF get_last_checkpoint analogue, internvl_chat_finetune.py:848-859)."""
    import orbax.checkpoint as ocp

    from ..train.train_step import TrainState

    directory = os.path.abspath(directory)
    mgr = _mgr(directory)
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint under {directory}"
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        template,
    )
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract),
            **(
                {"data": ocp.args.JsonRestore()}
                if os.path.isdir(os.path.join(directory, str(step), "data"))
                else {}
            ),
        ),
    )
    mgr.close()
    data_state = restored.get("data") if hasattr(restored, "get") else None
    st = restored["state"]
    return TrainState(st["params"], st["opt_state"], st["step"]), data_state
