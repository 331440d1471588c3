"""Checkpoint / resume via orbax.

The reference only has ad-hoc best-val `torch.save` of state_dicts and
embedding tensors (`--savemod/--loadmod/--save_gemb/--savex/--loadx`,
NeighborOverlap_large.py:293-303, 334-340) and cannot resume optimizer/epoch
state (SURVEY.md §5).  Here the full TrainState (params, EMA state, schedule
state, optimizer state) round-trips, plus standalone embedding arrays for the
reference's gemb workflow.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _mgr(path: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(path))


def save_state(path: str, state, step: int) -> None:
    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        mgr.save(
            step,
            args=ocp.args.StandardSave(
                {
                    "params": state.params,
                    "ema": state.ema,
                    "sched": state.sched,
                    "opt_state": state.opt_state,
                }
            ),
        )
        mgr.wait_until_finished()


def load_state(path: str, state, step: Optional[int] = None):
    """Restore into the structure of ``state`` (shapes/dtypes as template)."""
    from ocn_tpu.train.loop import TrainState

    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        step = mgr.latest_step() if step is None else step
        template = {
            "params": state.params,
            "ema": state.ema,
            "sched": state.sched,
            "opt_state": state.opt_state,
        }
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return TrainState(
        restored["params"], restored["ema"], restored["sched"],
        restored["opt_state"],
    ), step


def save_embeddings(path: str, h) -> None:
    """`--save_gemb` equivalent (NeighborOverlap_large.py:334-335)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(h))


def load_embeddings(path: str) -> np.ndarray:
    return np.load(path)
