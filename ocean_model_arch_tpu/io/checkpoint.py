"""Checkpoint / resume of the full prognostic state.

The reference's resume capability is minimal (ssh-from-file only,
SURVEY.md §5.4); here the full prognostic tuple (all three time levels of
ssh/u/v, the depth families, tracers) plus the step counter round-trips,
so a run restarts bit-exactly. Plain .npz container (no external deps);
the arrays are host-gathered, so this also works for sharded states.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..core.state import SWState


def save_checkpoint(path: str, state: SWState, step: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is not None:
            arrays[f.name] = np.asarray(v)
    arrays["__step__"] = np.asarray(step, np.int64)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str) -> tuple[SWState, int]:
    with np.load(path) as z:
        step = int(z["__step__"])
        kwargs = {}
        for f in dataclasses.fields(SWState):
            kwargs[f.name] = (jnp.asarray(z[f.name])
                              if f.name in z.files else None)
    return SWState(**kwargs), step
