"""Two-loop direction cost ABOVE the blocked-kernel budget (slope protocol).

Above ``_BLOCKED_ROW_LIMIT`` (2.5M padded f32 elements — the working vector
no longer fits the ~16 MB/core VMEM next to the chunk double-buffers),
``two_loop_pallas`` falls back to the XLA loop form with a *claimed* "runs
near the HBM bound there" (ops/pallas_two_loop.py). This probe measures
that claim at n≈4M, m=50 (VERDICT round 4 item 8; the reference pays ~4m
sequential cuBLAS launches there, src/cuda/lbfgs.cuh:206-261).

Bounds printed for context (v5e HBM ~819 GB/s):
  * 4mn — history rows only (s_i and y_i each read once per pass). This is
    the in-VMEM kernels' bound; UNREACHABLE when q itself must live in HBM.
  * 8mn — history rows + the working vector's read/write per stage with the
    next stage's dot fused into the current stage's axpy sweep (the best a
    q-in-HBM schedule can do; the recursion's global sequential dots forbid
    pair-blocking).
  * 10mn — unfused q-in-HBM: per stage a 2n dot sweep + a 3n axpy sweep.

Every number is a slope — (t_K2 - t_K1)/(K2 - K1) over a jitted chain of K
data-dependent direction computations — so the tunnel RTT and fixed
dispatch overhead difference out (CLAUDE.md timing protocol). The axpy-only
row calibrates (~0).

Usage (real chip):
  python scripts/diag_two_loop_large.py --n 4000000 --m 50
  LBFGS_FORCE_CPU=1 python scripts/diag_two_loop_large.py --n 300000 --k 2 4
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("LBFGS_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import argparse
import time

import jax.numpy as jnp
from jax import lax

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=4_000_000)
parser.add_argument("--m", type=int, default=50)
parser.add_argument("--k", type=int, nargs=2, default=[3, 9],
                    metavar=("K1", "K2"))
parser.add_argument("--reps", type=int, default=3)
parser.add_argument("--impl", nargs="+",
                    default=["xla", "pallas"],
                    choices=["xla", "pallas"],
                    help="'pallas' uses the production dispatch (falls back "
                         "to xla above the blocked budget — the row then "
                         "double-checks the fallback, not a kernel). The "
                         "q-in-HBM 'huge' kernel was measured NOT worth "
                         "building: XLA at n=4M already beats its 8mn "
                         "traffic floor (docs/PERF.md round 5)")
args = parser.parse_args()

from lbfgs_ffnn_tpu.ops.two_loop import (  # noqa: E402
    empty_history_state, ring_push, two_loop,
)

n, m = args.n, args.m
rows = -(-n // 128)
bw = 819e9  # v5e HBM, bytes/s
b4, b8, b10 = (c * m * n * 4 / bw for c in (4, 8, 10))
print(f"# n={n} (rows={rows}), m={m}, backend={jax.default_backend()}; "
      f"HBM bounds @819GB/s: 4mn={b4 * 1e3:.2f} ms, 8mn={b8 * 1e3:.2f} ms, "
      f"10mn={b10 * 1e3:.2f} ms", flush=True)


def make_hist():
    hist = empty_history_state(m, n, jnp.float32)

    def fill(i, h):
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        s = jax.random.normal(key, (n,), jnp.float32)
        yv = s + 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (n,), jnp.float32)
        return ring_push(h, s, yv, 1.0 / jnp.vdot(yv, s), jnp.array(True))
    return lax.fori_loop(0, m, fill, hist)


def make_probe(tl, K):
    def run(v0):
        hist = make_hist()

        def body(i, g):
            d = tl(g, hist)
            return g + 1e-9 * d
        return jnp.sum(lax.fori_loop(0, K, body, v0))
    return run


def make_axpy(K):
    def run(v0):
        def body(i, v):
            return v + 1e-12 * v
        return jnp.sum(lax.fori_loop(0, K, body, v0))
    return run


v = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
k1, k2 = args.k


def slope(name, make_fn):
    fns = {k: jax.jit(make_fn(k)) for k in (k1, k2)}
    for k in (k1, k2):
        _ = float(fns[k](v * (1.0 + 1e-6)))
    best = {k: float("inf") for k in (k1, k2)}
    seeds = jax.random.split(jax.random.PRNGKey(7), args.reps)
    for r in range(args.reps):
        vr = v * (1.0 + 1e-6 * jax.random.uniform(seeds[r]))
        vr.block_until_ready()
        for k in (k1, k2):
            t0 = time.perf_counter()
            _ = float(fns[k](vr))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[k2] - best[k1]) / (k2 - k1)
    print(f"{name:14s} {per * 1e3:10.3f} ms/call   "
          f"(t{k1}={best[k1] * 1e3:.1f} ms, t{k2}={best[k2] * 1e3:.1f} ms; "
          f"{per / b4:.2f}x of 4mn, {per / b8:.2f}x of 8mn)", flush=True)
    return per


slope("axpy-only", make_axpy)
for impl in args.impl:
    if impl == "xla":
        slope("xla", lambda K: make_probe(two_loop, K))
    elif impl == "pallas":
        from lbfgs_ffnn_tpu.ops.pallas_two_loop import (
            pallas_dispatch, two_loop_pallas,
        )
        sel, why = pallas_dispatch(rows * 128, m, jnp.float32)
        print(f"# production dispatch at this size: {sel}"
              + (f" ({why})" if why else ""), flush=True)
        slope(sel, lambda K: make_probe(two_loop_pallas, K))
