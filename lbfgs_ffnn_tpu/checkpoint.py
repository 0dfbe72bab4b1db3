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
    """Restore into the structure of ``template`` (same pytree, any values).

    Migration shim: solver-state NamedTuples may gain fields between
    releases (e.g. the L-BFGS eval counters). If the saved tree's structure
    doesn't match ``template``, the checkpoint is re-read template-free and
    fields missing from it are filled with the template's values, so old
    checkpoints stay resumable.
    """
    path = Path(path).resolve()
    ckptr = _checkpointer()
    try:
        return ckptr.restore(path, template)
    except Exception:
        restored = ckptr.restore(path)
        return _fill_from_template(template, restored)


def _fill_from_template(template: Any, restored: Any) -> Any:
    """Overlay ``restored`` (nested dicts/lists from a template-free Orbax
    read) onto ``template``, keeping template values for missing fields."""
    if hasattr(template, "_fields"):  # NamedTuple
        vals = {}
        for fname in template._fields:
            tv = getattr(template, fname)
            if isinstance(restored, dict) and fname in restored:
                vals[fname] = _fill_from_template(tv, restored[fname])
            else:
                vals[fname] = tv
        return type(template)(**vals)
    if isinstance(template, dict):
        return {
            k: _fill_from_template(v, restored[k])
            if isinstance(restored, dict) and k in restored
            else v
            for k, v in template.items()
        }
    if isinstance(template, (list, tuple)):
        if isinstance(restored, (list, tuple, dict)):
            seq = (
                [restored[str(i)] for i in range(len(template))]
                if isinstance(restored, dict)
                else list(restored)
            )
            if len(seq) == len(template):
                return type(template)(
                    _fill_from_template(t, r) for t, r in zip(template, seq)
                )
        return template
    return restored if restored is not None else template


def save_weights_npz(path: str | Path, weights) -> None:
    """Minimal dependency-free alternative for a bare flat weight vector."""
    np.savez(str(path), weights=np.asarray(weights))


def load_weights_npz(path: str | Path):
    return np.load(str(path))["weights"]
