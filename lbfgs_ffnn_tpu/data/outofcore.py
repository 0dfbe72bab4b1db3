"""Out-of-core evaluation: datasets that stay in HOST memory.

The reference holds the whole training set in CPU RAM and streams it through
cache (full-gradient pass: reference src/minimizer/s_lbfgs.hpp:203-206); the
TPU analogue of "bigger than fast memory" is a dataset that exceeds one
chip's HBM. The in-HBM solvers take ``x``/``y`` as whole traced operands —
the fastest path, and the right one whenever the data fits. This module is
the scaling escape hatch (PARITY.md §2.5): the dataset lives host-side in a
:class:`ChunkStore`, and jitted programs pull device-sized pieces on demand
through ``jax.experimental.io_callback``, so the device-resident footprint
is one chunk (full-gradient accumulation) or one minibatch (stochastic
steps) instead of the whole array.

Two adapters:

* :func:`outofcore_problem` — a full-batch :class:`Problem` whose
  ``fun``/``grad``/``value_and_grad`` accumulate over chunks inside a
  ``lax.fori_loop``. Plug it into any full-gradient solver (``lbfgs``,
  ``gradient_descent``, ...) unchanged: the whole solve stays ONE XLA
  program; each chunk fetch is an unordered host callback.
* ``ChunkStore.fetch_rows`` — host-side gather of sampled minibatch indices,
  used by ``slbfgs(..., store=...)`` for the SVRG inner steps while the
  full-gradient anchor passes accumulate over chunks.

Cost model: every fetch is a host round trip (≈ the axon tunnel RTT when
tunneled), amortized over the chunk's compute — worth it exactly when the
dataset cannot be resident. Trajectories match the in-HBM run up to
summation-order rounding (chunked partial sums vs one flat mean); the f64
parity tests in tests/test_outofcore.py bound the drift.

Autodiff discipline: ``io_callback`` is not differentiable, so every
differentiated function here takes the fetched chunk as an *input* — the
callbacks sit between pre-differentiated pure pieces, never inside them.
Consequently ``Problem.hvp`` (jvp of a grad that contains callbacks) is NOT
supported by the adapter; use the default ``curvature_pairs="grad_diff"``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import io_callback

from lbfgs_ffnn_tpu.types import BatchProblem, Problem, zero_masked_rows


class ChunkStore:
    """Host-resident ``(x, y)`` dataset served to jitted programs in fixed-
    shape pieces.

    ``chunk_rows`` bounds the device-resident slice; the trailing ragged
    chunk is zero-padded and masked. Reuse ONE store object across solver
    calls — adapters built from it key the jit caches by identity.
    """

    def __init__(self, x, y, chunk_rows: int):
        self.x = np.ascontiguousarray(x)
        self.y = np.ascontiguousarray(y)
        if len(self.x) != len(self.y):
            raise ValueError(f"x/y length mismatch: {len(self.x)} vs {len(self.y)}")
        self.n = int(len(self.x))
        self.chunk_rows = int(min(chunk_rows, self.n))
        self.num_chunks = -(-self.n // self.chunk_rows)  # ceil

    # -- host-side callbacks (numpy in, numpy out, fixed shapes) -----------
    def _chunk_np(self, c):
        c = int(c)
        lo = c * self.chunk_rows
        hi = min(lo + self.chunk_rows, self.n)
        rows = self.chunk_rows
        xb = np.zeros((rows,) + self.x.shape[1:], self.x.dtype)
        yb = np.zeros((rows,) + self.y.shape[1:], self.y.dtype)
        xb[: hi - lo] = self.x[lo:hi]
        yb[: hi - lo] = self.y[lo:hi]
        mask = np.zeros((rows,), self.x.dtype)
        mask[: hi - lo] = 1
        return xb, yb, mask

    def _rows_np(self, idx):
        idx = np.asarray(idx)
        return self.x[idx], self.y[idx]

    # -- traced fetchers ----------------------------------------------------
    def fetch_chunk(self, c):
        """``(xb, yb, mask)`` for chunk ``c`` (traced int32), zero-padded."""
        rows = self.chunk_rows
        spec = (
            jax.ShapeDtypeStruct((rows,) + self.x.shape[1:], self.x.dtype),
            jax.ShapeDtypeStruct((rows,) + self.y.shape[1:], self.y.dtype),
            jax.ShapeDtypeStruct((rows,), self.x.dtype),
        )
        return io_callback(self._chunk_np, spec, c)

    def fetch_rows(self, idx):
        """Host-side gather: ``(x[idx], y[idx])`` for a traced index vector —
        the out-of-core counterpart of the in-HBM ``jnp.take``."""
        spec = (
            jax.ShapeDtypeStruct(idx.shape + self.x.shape[1:], self.x.dtype),
            jax.ShapeDtypeStruct(idx.shape + self.y.shape[1:], self.y.dtype),
        )
        return io_callback(self._rows_np, spec, idx)


def accumulate_chunks(store: ChunkStore, contrib, init):
    """``sum_c contrib(xb_c, yb_c, mask_c)`` over all chunks as a
    ``fori_loop`` — one chunk device-resident at a time. ``contrib`` must be
    pure (the fetch happens outside it, keeping autodiff legal)."""

    def body(c, acc):
        xb, yb, mask = store.fetch_chunk(c)
        return jax.tree_util.tree_map(
            lambda a, b: a + b, acc, contrib(xb, yb, mask)
        )

    return lax.fori_loop(0, store.num_chunks, body, init)


def masked_chunk_sums(bp: BatchProblem):
    """``(sum_loss, sum_grad, sum_vag)`` over ONE zero-padded masked chunk.

    The masking discipline lives here and only here: padding rows are
    zeroed before ``per_sample`` (they may hold anything, including NaN —
    see types.zero_masked_rows) and their losses dropped through ``where``,
    so both the value and the cotangents of masked rows are exactly zero.
    Shared by :func:`outofcore_problem` and the S-LBFGS out-of-core anchor
    ops (solvers/slbfgs.py::_outofcore_ops)."""

    def sum_loss(w, xb, yb, mask):
        xb = zero_masked_rows(mask, xb)
        yb = zero_masked_rows(mask, yb)
        ls = bp.per_sample(w, xb, yb)
        return jnp.sum(jnp.where(mask > 0, ls, 0.0))

    return sum_loss, jax.grad(sum_loss), jax.value_and_grad(sum_loss)


def chunked_mean_evals(bp: BatchProblem, store: ChunkStore):
    """``(full_loss, full_grad)`` callables ``(w) -> scalar / (n,)`` that
    accumulate the masked per-chunk sums over the whole store, divide by N
    once, and add the regularizer once — the chunked equivalent of the
    in-HBM ``bp.fun/grad`` over the full dataset."""
    N = store.n
    _sum_loss, _sum_grad, _ = masked_chunk_sums(bp)

    def full_loss(w):
        total = accumulate_chunks(
            store, lambda xb, yb, m: _sum_loss(w, xb, yb, m),
            jnp.zeros((), w.dtype),
        )
        out = total / N
        return out + bp.reg(w) if bp.reg is not None else out

    def full_grad(w):
        g = accumulate_chunks(
            store, lambda xb, yb, m: _sum_grad(w, xb, yb, m),
            jnp.zeros_like(w),
        )
        g = g / N
        return g + jax.grad(bp.reg)(w) if bp.reg is not None else g

    return full_loss, full_grad


def outofcore_problem(bp: BatchProblem, store: ChunkStore) -> Problem:
    """Full-batch :class:`Problem` over a host-resident dataset.

    The objective equals the in-HBM ``bp.fun(w, x, y)`` (mean per-sample
    loss + the regularizer once) up to chunked-summation rounding; the
    ``aux`` slot is unused (pass ``()``). No line restriction is exposed —
    trials are full chunk sweeps — and ``hess``/``hvp`` are unsupported
    (see the module docstring).
    """
    N = store.n

    _sum_loss, _sum_grad, _sum_vag = masked_chunk_sums(bp)
    full_loss, full_grad = chunked_mean_evals(bp, store)

    def fun(w, aux=()):
        return full_loss(w)

    def grad(w, aux=()):
        return full_grad(w)

    def value_and_grad(w, aux=()):
        total, g = accumulate_chunks(
            store, lambda xb, yb, m: _sum_vag(w, xb, yb, m),
            (jnp.zeros((), w.dtype), jnp.zeros_like(w)),
        )
        f, g = total / N, g / N
        if bp.reg is not None:
            rf, rg = jax.value_and_grad(bp.reg)(w)
            f, g = f + rf, g + rg
        return f, g

    return Problem(fun=fun, grad=grad, value_and_grad=value_and_grad)
