"""Shared solver utilities: jit caching and history recording."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lbfgs_ffnn_tpu.types import SolveResult


@functools.lru_cache(maxsize=256)
def cached_jit_solve(builder, problem, opts):
    """Compile-once cache keyed on (solver builder, problem, opts).

    ``problem`` and ``opts`` are hashable NamedTuples; reusing the same
    objects across calls reuses the compiled executable.
    """
    return jax.jit(builder(problem, opts))


def init_history(max_iters: int, dtype):
    return (
        jnp.full((max_iters,), jnp.nan, dtype=dtype),
        jnp.full((max_iters,), jnp.nan, dtype=dtype),
    )


def record(loss_h, gnorm_h, k, loss, gnorm):
    """Write one (loss, gnorm) row at iteration k — the on-device mirror of
    IterationRecorder::record (reference: src/iteration_recorder.hpp:40-47)."""
    return loss_h.at[k].set(loss), gnorm_h.at[k].set(gnorm)


def finalize(x, k, converged, loss, gnorm, loss_h, gnorm_h, metric_h=None,
             n_fevals=None, n_gevals=None) -> SolveResult:
    return SolveResult(
        x=x,
        n_iters=k,
        converged=converged,
        final_loss=loss,
        final_gnorm=gnorm,
        loss_history=loss_h,
        gnorm_history=gnorm_h,
        metric_history=metric_h,
        n_fevals=n_fevals,
        n_gevals=n_gevals,
    )
