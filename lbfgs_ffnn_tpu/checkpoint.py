"""Checkpoint / resume for solver state.

The reference has no persistence at all — weights live only in process
memory and the only artifacts are history CSVs (SURVEY.md §5). Here any
solver-state pytree (weights, the (S, Y, rho) curvature ring with its
head/count, SVRG anchors, momentum) round-trips through Orbax, so long runs
can resume mid-optimization with the quasi-Newton memory intact.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str | Path, state: Any) -> None:
    """Save a pytree of arrays (weights, RingState, full solver carry...)."""
    path = Path(path).resolve()
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str | Path, template: Any) -> Any:
    """Restore into the structure of ``template`` (same pytree, any values)."""
    path = Path(path).resolve()
    ckptr = _checkpointer()
    return ckptr.restore(path, template)


def save_weights_npz(path: str | Path, weights) -> None:
    """Minimal dependency-free alternative for a bare flat weight vector."""
    np.savez(str(path), weights=np.asarray(weights))


def load_weights_npz(path: str | Path):
    return np.load(str(path))["weights"]
