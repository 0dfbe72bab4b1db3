"""Checkpoint / resume for solver state.

The reference has no persistence at all — weights live only in process
memory and the only artifacts are history CSVs (SURVEY.md §5). Here any
solver-state pytree (weights, the (S, Y, rho) curvature ring with its
head/count, SVRG anchors, momentum) round-trips through Orbax, so long runs
can resume mid-optimization with the quasi-Newton memory intact.
"""

from __future__ import annotations

import warnings
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


def restore_checkpoint(path: str | Path, template: Any, *, allow_partial: bool = False) -> Any:
    """Restore into the structure of ``template`` (same pytree, any values).

    Migration shim: solver-state NamedTuples may gain fields between
    releases (e.g. the L-BFGS eval counters). If the saved tree's structure
    doesn't match ``template`` (and only then — other restore failures
    propagate), the checkpoint is re-read template-free and fields missing
    from it are filled with the template's values, so old checkpoints stay
    resumable.

    Template-filling is only safe for plain counters: a filled *array*
    field (e.g. the L-BFGS carried line prefix) would be inconsistent with
    the restored iterate and silently corrupt the resumed trajectory, so
    that case raises unless ``allow_partial=True`` — and then the caller
    must recompute the derived field before resuming
    (``lbfgs_chunked(..., resume_state=...)`` does this automatically via
    ``problem.line_prefix.init``). Filled scalar fields emit a warning
    naming them.
    """
    path = Path(path).resolve()
    ckptr = _checkpointer()
    try:
        return ckptr.restore(path, template)
    except Exception as e:
        # Structure mismatch between the saved tree and the template — the
        # one failure class the migration shim exists for. Orbax's mismatch
        # error class varies across versions (ValueError/TypeError/KeyError
        # in the pinned one), so additionally treat any exception raised
        # from orbax's own modules as a candidate: the template-free re-read
        # below re-raises genuine I/O/corruption failures anyway. Errors
        # from elsewhere (e.g. OSError) propagate untouched.
        if not _is_structure_mismatch(e):
            raise
        try:
            restored = ckptr.restore(path)
            filled: list[str] = []
            out = _fill_from_template(template, restored, "", filled)
            extras = _has_extras(template, restored)
        except Exception as shim_err:
            # The migration shim itself failed (I/O, or a saved tree too
            # alien for the overlay walk). The ORIGINAL restore error is the
            # diagnosable one — propagate it, with the shim failure attached
            # as the cause instead of replacing it.
            raise e from shim_err
        if not filled and not extras:
            # The template-free read's structure agrees with the template
            # exactly (no missing fields, no extra keys), so the original
            # failure was NOT a structure mismatch — e.g. a genuine
            # value-level corruption that happened to raise ValueError.
            # Propagate it instead of returning a silently re-read tree.
            raise
        if filled:
            non_scalar = [
                p for p, is_scalar in filled_kinds(template, filled) if not is_scalar
            ]
            msg = (
                f"checkpoint at {path} is missing fields filled from the "
                f"template: {sorted(p for p in filled)}"
            )
            if non_scalar and not allow_partial:
                raise ValueError(
                    msg + f". Non-scalar fields {non_scalar} cannot be "
                    "template-filled safely (a stale value would corrupt the "
                    "resumed run) — recompute them from the restored state "
                    "(e.g. prefix = problem.line_prefix.init(state.x, aux)) "
                    "or pass allow_partial=True after doing so."
                )
            warnings.warn(msg, stacklevel=2)
        return out


def _is_structure_mismatch(e: Exception) -> bool:
    """Heuristic for 'the saved tree doesn't match the template': the pinned
    orbax raises ValueError/TypeError/KeyError; other versions raise their
    own classes, identified by the exception type's defining module."""
    if isinstance(e, (ValueError, TypeError, KeyError)):
        return True
    mod = type(e).__module__ or ""
    return mod.startswith("orbax") or mod.startswith("etils")


def _has_extras(template: Any, restored: Any) -> bool:
    """True if the template-free read holds keys/fields/elements the
    template does not — the downgrade half of a structure mismatch (the
    upgrade half is detected by ``_fill_from_template``'s ``filled``)."""
    if hasattr(template, "_fields"):
        if not isinstance(restored, dict):
            return True
        fields = set(template._fields)
        return any(k not in fields for k in restored) or any(
            _has_extras(getattr(template, f), restored[f])
            for f in template._fields if f in restored
        )
    if isinstance(template, dict):
        if not isinstance(restored, dict):
            return True
        return any(k not in template for k in restored) or any(
            _has_extras(v, restored[k]) for k, v in template.items() if k in restored
        )
    if isinstance(template, (list, tuple)):
        if isinstance(restored, dict):
            # Orbax writes sequences as dicts keyed "0", "1", ...; any
            # other key shape means the saved node is NOT a sequence — a
            # genuine structure disagreement, i.e. extras.
            if not all(isinstance(k, str) and k.isdigit() for k in restored):
                return True
            seq = [restored[k] for k in sorted(restored, key=int)]
        elif isinstance(restored, (list, tuple)):
            seq = list(restored)
        else:
            return True
        if len(seq) > len(template):
            return True
        return any(_has_extras(t, r) for t, r in zip(template, seq))
    return False


def filled_kinds(template: Any, paths: list[str]) -> list[tuple[str, bool]]:
    """Classify each filled path as benign-to-fill or not.

    Benign: plain scalars (counters) and EMPTY containers (e.g. the L-BFGS
    ``prefix=()`` placeholder when the problem has no line prefix — there
    is nothing in it to go stale). Anything holding array data is unsafe
    to template-fill."""
    out = []
    for p in paths:
        node = template
        ok = True
        for part in p.split("/"):
            if not part:
                continue
            if hasattr(node, "_fields") and part in node._fields:
                node = getattr(node, part)
            elif isinstance(node, dict) and part in node:
                node = node[part]
            elif isinstance(node, (list, tuple)) and part.isdigit():
                node = node[int(part)]
            else:
                ok = False
                break
        if not ok:
            benign = False
        elif isinstance(node, (list, tuple, dict)):
            benign = len(node) == 0
        else:
            try:
                benign = np.ndim(node) == 0
            except Exception:  # ragged/opaque object: play safe
                benign = False
        out.append((p, benign))
    return out


def _fill_from_template(template: Any, restored: Any, path: str, filled: list[str]) -> Any:
    """Overlay ``restored`` (nested dicts/lists from a template-free Orbax
    read) onto ``template``, keeping template values for missing fields and
    recording their paths in ``filled``."""
    if hasattr(template, "_fields"):  # NamedTuple
        vals = {}
        for fname in template._fields:
            tv = getattr(template, fname)
            sub = f"{path}/{fname}"
            if isinstance(restored, dict) and fname in restored:
                vals[fname] = _fill_from_template(tv, restored[fname], sub, filled)
            else:
                vals[fname] = tv
                filled.append(sub)
        return type(template)(**vals)
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            sub = f"{path}/{k}"
            if isinstance(restored, dict) and k in restored:
                out[k] = _fill_from_template(v, restored[k], sub, filled)
            else:
                out[k] = v
                filled.append(sub)
        return out
    if isinstance(template, (list, tuple)):
        if isinstance(restored, (list, tuple, dict)):
            if isinstance(restored, dict):
                # Sequence-as-dict needs exactly the keys "0".."len-1";
                # anything else is not this sequence — fall through to the
                # template (recorded in ``filled`` so unsafe fills raise).
                seq = (
                    [restored[str(i)] for i in range(len(template))]
                    if all(str(i) in restored for i in range(len(template)))
                    else None
                )
            else:
                seq = list(restored)
            if seq is not None and len(seq) == len(template):
                return type(template)(
                    _fill_from_template(t, r, f"{path}/{i}", filled)
                    for i, (t, r) in enumerate(zip(template, seq))
                )
        filled.append(path)
        return template
    if restored is None:
        filled.append(path)
        return template
    return restored


def save_weights_npz(path: str | Path, weights) -> None:
    """Minimal dependency-free alternative for a bare flat weight vector."""
    np.savez(str(path), weights=np.asarray(weights))


def load_weights_npz(path: str | Path):
    return np.load(str(path))["weights"]
