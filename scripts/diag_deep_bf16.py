"""Diagnose the deep-net bf16-ring slowdown seen in BENCH_r03.

BENCH_r03 measured the 784-256-128-64-10 m=100 Fashion solve at 1.500
ms/iter f32 but 1.963 with the bf16 ring + bf16 grad-input — while the
traffic model (docs/PERF.md round 3) predicts the bf16 ring should SAVE
~0.25 ms/iter. Two candidate causes:
  (a) the bf16-rounded ring perturbs directions enough to change the
      Armijo trial sequence near the plateau (more trials/iter) — visible
      in the exact n_fevals counter;
  (b) the streaming Pallas kernel is slower with bf16 rows than f32
      (mixed-dtype VPU conversions, or DMA inefficiency) — visible in the
      whole-solve slope with counters equal.

This script separates them: for each config it reports the RTT-free
whole-solve slope (two max_iters values) AND the exact nf/ng counters at
both lengths. Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("LBFGS_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from lbfgs_ffnn_tpu.data.datasets import load_fashion_mnist
from lbfgs_ffnn_tpu.objectives.mlp import mlp_init, mlp_problem, mlp_spec
from lbfgs_ffnn_tpu.solvers import LBFGSOptions, lbfgs

K1, K2 = (int(a) for a in (sys.argv[1:3] or (300, 1000)))
REPS = 3

ds = load_fashion_mnist(train_size=60000, test_size=0)
x, y = jnp.asarray(ds.train_x), jnp.asarray(ds.train_y)
spec = mlp_spec([784, 256, 128, 64, 10], ["relu", "relu", "relu", "linear"])
w0s = [mlp_init(spec, jax.random.PRNGKey(7 + i), dtype=jnp.float32)
       for i in range(REPS + 1)]

impl = "pallas" if jax.default_backend() == "tpu" else "xla"
base = dict(tol=1e-12, m=100, line_search="armijo", ls_max_iters=20,
            two_loop_impl=impl)

U8 = {"grad_input_dtype": "uint8", "line_input_dtype": "uint8"}
U8STACK = {"pair_dtype": "bfloat16", "prefix_dtype": "bfloat16"}
CONFIGS = [
    # hvp curvature pairs: y = H(x_new)@s instead of g_new - g. In f32 the
    # gradient difference cancels catastrophically near the plateau (y is
    # rounding noise), poisoning directions and exhausting the Armijo
    # budget; the exact jvp-of-grad pair has no cancellation. Costs one
    # extra gradient-shaped eval per iteration (ng/iter = 2).
    ("f32+hvp", {}, {"curvature_pairs": "hvp"}),
    ("u8stack+hvp", U8, {**U8STACK, "curvature_pairs": "hvp"}),
]

print(f"# deep 784-256-128-64-10 m=100 N=60000, K1={K1} K2={K2}, "
      f"backend={jax.default_backend()}", flush=True)

for tag, pkw, okw in CONFIGS:
    prob = mlp_problem(spec, **pkw)
    res = {}
    for K in (K1, K2):
        opts = LBFGSOptions(max_iters=K, **base, **okw)

        def run(w0, _p=prob, _o=opts):
            return lbfgs(_p, w0, aux=(x, y), opts=_o)

        r = run(w0s[0])
        _ = float(r.final_loss)  # compile + warm
        best = float("inf")
        for w0 in w0s[1:]:
            t0 = time.perf_counter()
            r = run(w0)
            _ = float(r.final_loss)
            best = min(best, time.perf_counter() - t0)
        res[K] = (best, int(r.n_fevals), int(r.n_gevals),
                  float(r.final_loss))
    slope_ms = (res[K2][0] - res[K1][0]) / (K2 - K1) * 1e3
    d_nf = (res[K2][1] - res[K1][1]) / (K2 - K1)
    d_ng = (res[K2][2] - res[K1][2]) / (K2 - K1)
    print(f"{tag:18s} {slope_ms:6.3f} ms/iter  trials/iter={d_nf - 1:5.2f} "
          f"ng/iter={d_ng:4.2f}  nf@{K2}={res[K2][1]}  "
          f"loss@{K2}={res[K2][3]:.5g}  "
          f"(t{K1}={res[K1][0]:.3f}s t{K2}={res[K2][0]:.3f}s)", flush=True)
