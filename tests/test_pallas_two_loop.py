"""Fused Pallas two-loop kernel vs the XLA reference implementation.

Off-TPU these run the same kernel code in Pallas interpret mode, validating
the DMA/ring/masking logic; on TPU (LBFGS_TPU_TESTS=1) the compiled kernel
runs natively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_ffnn_tpu.ops.pallas_two_loop import two_loop_pallas
from lbfgs_ffnn_tpu.ops.two_loop import empty_history_state, ring_push, two_loop


def make_history(m, n, k, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    hist = empty_history_state(m, n, dtype)
    pushed = 0
    while pushed < k:
        s = rng.normal(size=n)
        y = rng.normal(size=n) + 0.5 * s
        if s @ y > 1e-3:
            s_j = jnp.asarray(s, dtype=dtype)
            y_j = jnp.asarray(y, dtype=dtype)
            rho = 1.0 / jnp.vdot(y_j, s_j)
            hist = ring_push(hist, s_j, y_j, rho, jnp.array(True))
            pushed += 1
    return hist


@pytest.mark.parametrize("m,k", [(5, 0), (5, 3), (5, 5), (4, 9)])
def test_pallas_matches_xla(m, k):
    n = 300  # deliberately unaligned: exercises tile padding
    hist = make_history(m, n, k)
    v = jnp.asarray(np.random.default_rng(1).normal(size=n), dtype=jnp.float32)
    r_xla = two_loop(v, hist)
    r_pallas = two_loop_pallas(v, hist)
    np.testing.assert_allclose(
        np.asarray(r_pallas), np.asarray(r_xla), rtol=2e-5, atol=2e-5
    )


def test_pallas_clamp_gamma_mode():
    n, m = 256, 3
    hist = make_history(m, n, 2, seed=2)
    v = jnp.asarray(np.random.default_rng(3).normal(size=n), dtype=jnp.float32)
    r_xla = two_loop(v, hist, clamp_gamma=True)
    r_pallas = two_loop_pallas(v, hist, clamp_gamma=True)
    np.testing.assert_allclose(
        np.asarray(r_pallas), np.asarray(r_xla), rtol=2e-5, atol=2e-5
    )


def test_pallas_aligned_size():
    n, m = 2048, 6
    hist = make_history(m, n, 4, seed=4)
    v = jnp.asarray(np.random.default_rng(5).normal(size=n), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(two_loop_pallas(v, hist)),
        np.asarray(two_loop(v, hist)),
        rtol=2e-5, atol=2e-5,
    )


def test_pallas_f64_falls_back_to_xla():
    n, m = 64, 3
    hist = make_history(m, n, 2, dtype=jnp.float64)
    v = jnp.asarray(np.random.default_rng(6).normal(size=n))
    r = two_loop_pallas(v, hist)
    np.testing.assert_allclose(np.asarray(r), np.asarray(two_loop(v, hist)))


@pytest.mark.parametrize("m,k", [(6, 4), (6, 9)])
def test_pallas_streaming_path_matches_f64_oracle(m, k):
    """Force the double-buffered streaming kernel (m * n_pad above the
    VMEM-resident limit) and check it against an f64 oracle; the small-n
    tests above exercise the whole-history-resident variant.

    At n=200k the f32 XLA implementation accumulates ~6e-5 abs error against
    the f64 oracle while the kernel's two-level (rows, 128) reduction stays
    at ~5e-7 — so the oracle, not the XLA f32 result, is the right referee
    here."""
    from lbfgs_ffnn_tpu.ops import pallas_two_loop as mod

    if not jax.config.jax_enable_x64:
        pytest.skip("f64 oracle needs x64 (disabled in TPU-native test mode)")
    n = 200_000  # m * n_pad = 6 * 200704 >> _VMEM_RESIDENT_LIMIT
    assert m * ((n + 1023) // 1024) * 1024 > mod._VMEM_RESIDENT_LIMIT
    hist = make_history(m, n, k, seed=2)
    v = jnp.asarray(np.random.default_rng(3).normal(size=n), dtype=jnp.float32)
    hist64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, hist
    )
    oracle = np.asarray(two_loop(v.astype(jnp.float64), hist64))
    r_pallas = np.asarray(two_loop_pallas(v, hist))
    np.testing.assert_allclose(r_pallas, oracle, atol=5e-6, rtol=5e-6)
    # sanity: the f32 XLA path agrees with the oracle at its (looser) scale
    r_xla = np.asarray(two_loop(v, hist))
    np.testing.assert_allclose(r_xla, oracle, atol=5e-4, rtol=5e-4)


def test_pallas_dispatch_reports_impl():
    from lbfgs_ffnn_tpu.ops.pallas_two_loop import (
        _BLOCKED_ROW_LIMIT, _VMEM_RESIDENT_LIMIT, _VMEM_ROW_LIMIT,
        pallas_dispatch,
    )

    impl, _ = pallas_dispatch(1024, 4, jnp.float32)
    assert impl == "pallas-resident"
    impl, _ = pallas_dispatch(_VMEM_ROW_LIMIT, 4, jnp.float32)  # 4x512k > resident limit
    assert impl == "pallas-streaming"
    assert _VMEM_ROW_LIMIT * 4 > _VMEM_RESIDENT_LIMIT
    # past the whole-row budget: the rows-blocked kernel takes over
    impl, _ = pallas_dispatch(_VMEM_ROW_LIMIT + 1024, 4, jnp.float32)
    assert impl == "pallas-blocked"
    impl, _ = pallas_dispatch(1_000_448, 50, jnp.float32)  # the n=1M regime
    assert impl == "pallas-blocked"
    impl, reason = pallas_dispatch(_BLOCKED_ROW_LIMIT + 1024, 4, jnp.float32)
    assert impl == "xla" and "blocked" in reason
    impl, reason = pallas_dispatch(1024, 4, jnp.float64)
    assert impl == "xla" and "dtype" in reason


def test_pallas_fallback_beyond_vmem_budget_warns_and_is_correct():
    """A row length past even the BLOCKED kernel's working-vector budget
    must fall back to XLA (correctly) and say so — no silent policy
    substitution when a solver was configured with two_loop_impl='pallas'
    (VERDICT round 1, item 8)."""
    import warnings as _w

    from lbfgs_ffnn_tpu.ops import pallas_two_loop as ptl

    n = ptl._BLOCKED_ROW_LIMIT + 1024  # first padded size past the budget
    m, k = 3, 2
    hist = make_history(m, n, k, seed=7)
    v = jnp.asarray(np.random.default_rng(8).normal(size=n), dtype=jnp.float32)

    ptl._FALLBACK_WARNED.clear()
    with pytest.warns(UserWarning, match="falling back to the XLA"):
        r = two_loop_pallas(v, hist)
    # At n=525k the f32 loop and GEMM forms differ by reduction order alone;
    # judge both against an f64 oracle rather than against each other.
    if jax.config.jax_enable_x64:
        hist64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a,
            hist,
        )
        oracle = np.asarray(two_loop(v.astype(jnp.float64), hist64))
        # f32 accumulation error at n=2.5M (dots of magnitude ~sqrt(n))
        np.testing.assert_allclose(np.asarray(r), oracle, rtol=5e-3, atol=5e-3)
    else:
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(two_loop(v, hist)), rtol=5e-3, atol=5e-3
        )
    # warned once per (m, n, dtype), not per call
    with _w.catch_warnings():
        _w.simplefilter("error")
        two_loop_pallas(v, hist)


@pytest.mark.parametrize("m,k,n,blk", [
    (5, 0, 3000, 8),    # empty history
    (5, 3, 3000, 8),    # partial fill, even chunks
    (4, 9, 3000, 8),    # wrapped ring
    (5, 4, 3000, 10),   # ragged tail chunk (rows=24, cblk=10, tail=4)
])
def test_pallas_blocked_kernel_matches_xla(m, k, n, blk):
    """Rows-blocked streaming kernel (VERDICT r2 item 2), forced at small n
    via a tiny block size: both gamma policies, ragged tails, ring wrap."""
    from lbfgs_ffnn_tpu.ops.pallas_two_loop import _two_loop_pallas_blocked

    hist = make_history(m, n, k, seed=m + k)
    v = jnp.asarray(np.random.default_rng(1).normal(size=n), dtype=jnp.float32)
    rows = hist.S.shape[1]
    n_pad = rows * 128
    v2 = jnp.zeros((n_pad,), jnp.float32).at[:n].set(v).reshape(rows, 128)
    interpret = jax.default_backend() != "tpu"
    for cg in (False, True):
        out = _two_loop_pallas_blocked(
            v2, hist.S, hist.Y, hist.rho, hist.head, hist.count,
            cg, 1e-6, 1e6, interpret, blk,
        )
        np.testing.assert_allclose(
            np.asarray(out[:n]), np.asarray(two_loop(v, hist, clamp_gamma=cg)),
            rtol=3e-5, atol=3e-5,
        )


def test_pallas_blocked_path_matches_f64_oracle():
    """The wrapper dispatches the >512k regime to the blocked kernel; judge
    it against an f64 oracle at a real above-budget size."""
    from lbfgs_ffnn_tpu.ops import pallas_two_loop as mod

    if not jax.config.jax_enable_x64:
        pytest.skip("f64 oracle needs x64")
    n = mod._VMEM_ROW_LIMIT + 1024  # 525k params: past the whole-row budget
    m, k = 3, 2
    assert mod.pallas_dispatch(n, m, jnp.float32)[0] == "pallas-blocked"
    hist = make_history(m, n, k, seed=9)
    v = jnp.asarray(np.random.default_rng(10).normal(size=n), dtype=jnp.float32)
    hist64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, hist
    )
    oracle = np.asarray(two_loop(v.astype(jnp.float64), hist64))
    r = np.asarray(two_loop_pallas(v, hist))
    # chunk-summed f32 dots land at the same accuracy as the XLA f32 loop
    # at this size (measured: both max-abs ~3.7e-4 vs the oracle)
    np.testing.assert_allclose(r, oracle, atol=1e-3, rtol=1e-3)
    r_xla = np.asarray(two_loop(v, hist))
    assert np.abs(r - oracle).max() < 2.0 * max(np.abs(r_xla - oracle).max(), 1e-6)


@pytest.mark.parametrize("impl", ["xla", "compact", "pallas"])
def test_bf16_pair_ring_matches_f32_ring(impl):
    """pair_dtype="bfloat16" ring (round 3): every implementation must (a)
    agree with the f32-ring result at bf16 rounding tolerance, and (b) agree
    with the XLA form running on the SAME bf16 ring to f32 round-off — the
    rounding happens once, at the push, not per-implementation."""
    from lbfgs_ffnn_tpu.ops.two_loop import two_loop_compact

    m, n, k = 5, 3000, 4
    rng = np.random.default_rng(11)
    h16 = empty_history_state(m, n, jnp.float32, pair_dtype=jnp.bfloat16)
    hf = empty_history_state(m, n, jnp.float32)
    assert h16.S.dtype == jnp.bfloat16 and h16.rho.dtype == jnp.float32
    assert h16.S.shape[1] % 16 == 0  # bf16 sublane-tile-aligned rows
    for _ in range(k):
        s = rng.normal(size=n)
        y = rng.normal(size=n) + 0.5 * s
        sj = jnp.asarray(s, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        rho = 1.0 / jnp.vdot(yj, sj)
        h16 = ring_push(h16, sj, yj, rho, jnp.array(True))
        hf = ring_push(hf, sj, yj, rho, jnp.array(True))
    v = jnp.asarray(rng.normal(size=n), jnp.float32)
    r_f32 = np.asarray(two_loop(v, hf))
    fn = {"xla": two_loop, "compact": two_loop_compact,
          "pallas": two_loop_pallas}[impl]
    r = np.asarray(fn(v, h16))
    assert r.dtype == np.float32  # arithmetic stays in the solver dtype
    scale = np.abs(r_f32).max()
    assert np.abs(r - r_f32).max() / scale < 5e-3      # bf16 storage rounding
    r16_ref = np.asarray(two_loop(v, h16))
    assert np.abs(r - r16_ref).max() / scale < 5e-5    # same-ring consistency


def test_bf16_pair_dispatch_extends_budgets():
    """The byte-based budgets: bf16 pairs keep the streaming kernel past the
    f32 cutoff and double the VMEM-resident reach."""
    from lbfgs_ffnn_tpu.ops.pallas_two_loop import (
        _VMEM_RESIDENT_LIMIT, _VMEM_ROW_LIMIT, pallas_dispatch,
    )

    # f32 pairs at 600k rows: blocked; bf16 pairs: still whole-row streaming
    assert pallas_dispatch(600 * 1024, 10, jnp.float32)[0] == "pallas-blocked"
    assert (
        pallas_dispatch(600 * 1024, 10, jnp.float32, jnp.bfloat16)[0]
        == "pallas-streaming"
    )
    # resident reach doubles: m*n_pad at 1.5x the f32 element limit
    n_pad, m = 2048 * 128, 6  # m * n_pad = 1.57M elements > 1M f32 limit
    assert m * n_pad > _VMEM_RESIDENT_LIMIT
    assert pallas_dispatch(n_pad, m, jnp.float32)[0] == "pallas-streaming"
    assert (
        pallas_dispatch(n_pad, m, jnp.float32, jnp.bfloat16)[0]
        == "pallas-resident"
    )
    # f64 pairs: no kernel
    impl, reason = pallas_dispatch(1024, 4, jnp.float32, jnp.float64)
    assert impl == "xla" and "pair dtype" in reason
    assert _VMEM_ROW_LIMIT == 512 * 1024  # the round-2 f32 cutoff, unchanged


def test_bf16_pair_blocked_kernel():
    """Rows-blocked kernel with a bf16 ring: chunk buffers are bf16 (half
    traffic), accumulation f32; forced small with an explicit block size
    (rounded up to the bf16 16-row tile internally)."""
    from lbfgs_ffnn_tpu.ops.pallas_two_loop import _two_loop_pallas_blocked

    m, n, k = 4, 5000, 6
    rng = np.random.default_rng(21)
    h16 = empty_history_state(m, n, jnp.float32, pair_dtype=jnp.bfloat16)
    for _ in range(k):
        s = rng.normal(size=n)
        y = rng.normal(size=n) + 0.5 * s
        sj = jnp.asarray(s, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        h16 = ring_push(h16, sj, yj, 1.0 / jnp.vdot(yj, sj), jnp.array(True))
    v = jnp.asarray(rng.normal(size=n), jnp.float32)
    rows = h16.S.shape[1]
    n_pad = rows * 128
    v2 = jnp.zeros((n_pad,), jnp.float32).at[:n].set(v).reshape(rows, 128)
    interpret = jax.default_backend() != "tpu"
    out = _two_loop_pallas_blocked(
        v2, h16.S, h16.Y, h16.rho, h16.head, h16.count,
        False, 1e-6, 1e6, interpret, 10,  # 10 -> rounded to 16
    )
    ref = np.asarray(two_loop(v, h16))
    np.testing.assert_allclose(np.asarray(out[:n]), ref, rtol=5e-5, atol=5e-5)


def test_lbfgs_pair_dtype_option():
    """Solver-level bf16 ring: converges like the f32 ring on a small MLP,
    the carried history really is bf16, and the mesh mode runs it too."""
    from lbfgs_ffnn_tpu.objectives.mlp import mlp_init, mlp_problem, mlp_spec
    from lbfgs_ffnn_tpu.solvers.lbfgs import LBFGSOptions, lbfgs

    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.normal(size=(256, 16)), jnp.float32)
    Y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, 256)), 4,
                       dtype=jnp.float32)
    spec = mlp_spec([16, 32, 4], ["relu", "linear"])
    prob = mlp_problem(spec)
    w0 = mlp_init(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    res_f = lbfgs(prob, w0, (X, Y), LBFGSOptions(max_iters=60, m=10))
    res_b = lbfgs(prob, w0, (X, Y),
                  LBFGSOptions(max_iters=60, m=10, pair_dtype="bfloat16"))
    assert float(res_b.final_loss) < 1.10 * float(res_f.final_loss) + 1e-3

    from jax.sharding import Mesh

    # Mesh mode accepts the narrow ring too (rows padded to the bf16 tile,
    # partial dots promote before the psum so accumulation stays f32) —
    # multi-device trajectory parity is pinned in
    # tests/test_parallel.py::test_lbfgs_param_sharded_bf16_ring_full_solver.
    mesh = Mesh(np.array(jax.devices()[:1]), ("model",))
    res_m = lbfgs(prob, w0, (X, Y),
                  LBFGSOptions(max_iters=3, pair_dtype="bfloat16"), mesh=mesh)
    assert int(res_m.n_iters) == 3
