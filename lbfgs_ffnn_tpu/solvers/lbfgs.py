"""L-BFGS as one jitted program: direction, line search, update, history.

Two line-search flavors, matching the reference's two backends behaviorally:
  * ``"wolfe"`` — the reference CPU solver: Wolfe bisection search (skipped
    on the first iteration in favor of ``alpha = min(1, 1/||g||)``),
    curvature gate ``y^T s > 1e-10``
    (reference: src/minimizer/lbfgs.hpp:38-99).
  * ``"armijo"`` — the reference CUDA solver: descent-direction check with
    steepest-descent fallback + history reset, Armijo backtracking with
    safeguarded quadratic interpolation keeping the last trial on failure,
    history reset on line-search failure
    (reference: src/cuda/lbfgs.cuh:90-185).

The structural win over the CUDA reference: its two-loop recursion issues
~4m separate cuBLAS calls per iteration, each synchronizing the host
(reference: src/cuda/lbfgs.cuh:236-257) — here the whole solve is a single
XLA program; nothing touches the host until the result is fetched. The
two-loop itself can optionally run as a fused Pallas kernel.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from lbfgs_ffnn_tpu.ops.linesearch import armijo_quad_line_search, wolfe_line_search
from lbfgs_ffnn_tpu.ops.two_loop import RingState, empty_history_state, ring_push, ring_reset, two_loop
from lbfgs_ffnn_tpu.solvers.common import cached_jit_solve, finalize, init_history, record
from lbfgs_ffnn_tpu.types import Problem, SolveResult


class LBFGSOptions(NamedTuple):
    max_iters: int = 1000
    tol: float = 1e-10
    m: int = 16
    line_search: str = "wolfe"  # "wolfe" (CPU-ref) | "armijo" (CUDA-ref)
    ls_max_iters: int = 50
    c1: float = 1e-4
    c2: float = 0.9
    ls_shrink: float = 0.5
    curvature_eps: float = 1e-10
    two_loop_impl: str = "xla"  # "xla" | "pallas"


class _State(NamedTuple):
    k: jax.Array
    x: jax.Array
    f: jax.Array
    g: jax.Array
    gnorm: jax.Array
    hist: RingState
    loss_h: jax.Array
    gnorm_h: jax.Array


def _direction(g, hist, opts: LBFGSOptions):
    if opts.two_loop_impl == "pallas":
        from lbfgs_ffnn_tpu.ops.pallas_two_loop import two_loop_pallas

        return -two_loop_pallas(g, hist)
    return -two_loop(g, hist)


def _build(problem: Problem, opts: LBFGSOptions):
    if opts.line_search not in ("wolfe", "armijo"):
        raise ValueError(f"unknown line_search {opts.line_search!r}")

    def solve(x0, aux):
        f0, g0 = problem.value_and_grad(x0, aux)
        loss_h, gnorm_h = init_history(opts.max_iters, x0.dtype)
        s0 = _State(
            k=jnp.int32(0),
            x=x0,
            f=f0,
            g=g0,
            gnorm=jnp.linalg.norm(g0),
            hist=empty_history_state(opts.m, x0.shape[0], x0.dtype),
            loss_h=loss_h,
            gnorm_h=gnorm_h,
        )

        def cond(s: _State):
            return (s.k < opts.max_iters) & (s.gnorm >= opts.tol)

        def body(s: _State) -> _State:
            p = _direction(s.g, s.hist, opts)
            hist = s.hist
            dg0 = jnp.vdot(s.g, p)

            if opts.line_search == "armijo":
                # Steepest-descent fallback + history reset on non-descent p
                # (reference: src/cuda/lbfgs.cuh:97-104).
                nondescent = dg0 >= 0
                p = jnp.where(nondescent, -s.g, p)
                dg0 = jnp.where(nondescent, -jnp.vdot(s.g, s.g), dg0)
                hist = ring_reset(hist, nondescent)

                alpha0 = jnp.where(
                    s.k == 0,
                    jnp.minimum(jnp.ones_like(s.gnorm), 1.0 / s.gnorm),
                    jnp.ones_like(s.gnorm),
                )
                ls = armijo_quad_line_search(
                    problem.value_and_grad, s.x, p, s.f, dg0, aux,
                    c1=opts.c1, shrink=opts.ls_shrink,
                    max_iters=opts.ls_max_iters, alpha0=alpha0,
                )
                alpha, f_new, g_new = ls.alpha, ls.f_new, ls.g_new
                # History reset on line-search failure (cuda/lbfgs.cuh:147).
                hist = ring_reset(hist, ~ls.ok)
            else:
                # First-iteration heuristic step, no search
                # (reference: src/minimizer/lbfgs.hpp:61-65).
                def first(_):
                    alpha = jnp.minimum(jnp.ones_like(s.gnorm), 1.0 / s.gnorm)
                    f_new, g_new = problem.value_and_grad(s.x + alpha * p, aux)
                    return alpha, f_new, g_new

                def later(_):
                    ls = wolfe_line_search(
                        problem.value_and_grad, s.x, p, s.f, dg0, aux,
                        c1=opts.c1, c2=opts.c2, shrink=opts.ls_shrink,
                        max_iters=opts.ls_max_iters,
                    )

                    def use_ls(_):
                        return ls.alpha, ls.f_new, ls.g_new

                    def reeval(_):
                        f_new, g_new = problem.value_and_grad(s.x + ls.alpha * p, aux)
                        return ls.alpha, f_new, g_new

                    return lax.cond(ls.evaluated, use_ls, reeval, None)

                alpha, f_new, g_new = lax.cond(s.k == 0, first, later, None)

            x_new = s.x + alpha * p
            step = alpha * p
            y = g_new - s.g
            ys = jnp.vdot(y, step)
            accept = ys > opts.curvature_eps
            rho = jnp.where(accept, 1.0 / jnp.where(ys == 0, 1.0, ys), 0.0)
            hist = ring_push(hist, step, y, rho, accept)

            gnorm_new = jnp.linalg.norm(g_new)
            loss_h, gnorm_h = record(s.loss_h, s.gnorm_h, s.k, f_new, gnorm_new)
            return _State(
                k=s.k + 1, x=x_new, f=f_new, g=g_new, gnorm=gnorm_new,
                hist=hist, loss_h=loss_h, gnorm_h=gnorm_h,
            )

        s = lax.while_loop(cond, body, s0)
        return finalize(s.x, s.k, s.gnorm < opts.tol, s.f, s.gnorm, s.loss_h, s.gnorm_h)

    return solve


def lbfgs(
    problem: Problem, x0: jax.Array, aux: Any = (), opts: LBFGSOptions | None = None
) -> SolveResult:
    opts = opts or LBFGSOptions()
    return cached_jit_solve(_build, problem, opts)(x0, aux)
