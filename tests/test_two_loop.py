"""Property tests for the two-loop recursion and ring buffer.

The reference has no such tests; SURVEY.md §4 calls for validating the
two-loop against a dense inverse-Hessian oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_ffnn_tpu.ops.two_loop import (
    empty_history_state,
    ring_push,
    ring_reset,
    two_loop,
)


def dense_inverse_hessian(S, Y, n):
    """Oracle: explicit BFGS inverse-Hessian built from (s, y) pairs,
    H_{k+1} = (I - rho s y^T) H_k (I - rho y s^T) + rho s s^T, with
    H_0 = gamma I from the newest pair."""
    pairs = list(zip(S, Y))
    s_last, y_last = pairs[-1]
    gamma = float(s_last @ y_last) / float(y_last @ y_last)
    H = gamma * np.eye(n)
    for s, y in pairs:
        rho = 1.0 / float(y @ s)
        V = np.eye(n) - rho * np.outer(s, y)
        H = V @ H @ V.T + rho * np.outer(s, s)
    return H


def push_pairs(hist, pairs):
    for s, y in pairs:
        rho = 1.0 / jnp.vdot(y, s)
        hist = ring_push(hist, s, y, rho, jnp.array(True))
    return hist


@pytest.mark.parametrize("n,m,k", [(8, 5, 3), (8, 5, 5), (16, 4, 9)])
def test_two_loop_matches_dense_oracle(n, m, k):
    """two_loop(H, g) == dense-H @ g for any fill level, including a wrapped
    ring (k > m keeps only the newest m pairs)."""
    rng = np.random.default_rng(0)
    pairs = []
    while len(pairs) < k:
        s = rng.normal(size=n)
        y = rng.normal(size=n) + 0.5 * s  # bias towards y^T s > 0
        if s @ y > 1e-3:
            pairs.append((s, y))

    hist = empty_history_state(m, n, jnp.float64)
    hist = push_pairs(hist, [(jnp.asarray(s), jnp.asarray(y)) for s, y in pairs])

    g = jnp.asarray(rng.normal(size=n))
    r = two_loop(g, hist)

    H = dense_inverse_hessian(*zip(*pairs[-m:]), n) if k >= m else dense_inverse_hessian(
        *zip(*pairs), n
    )
    np.testing.assert_allclose(np.asarray(r), H @ np.asarray(g), rtol=1e-10, atol=1e-12)


def test_two_loop_empty_history_is_identity():
    hist = empty_history_state(4, 6, jnp.float64)
    g = jnp.arange(6.0)
    np.testing.assert_allclose(np.asarray(two_loop(g, hist)), np.asarray(g))


def test_ring_push_overwrites_oldest():
    n, m = 3, 2
    hist = empty_history_state(m, n, jnp.float64)
    vecs = [jnp.full((n,), float(i + 1)) for i in range(3)]
    for v in vecs:
        hist = ring_push(hist, v, v, jnp.vdot(v, v), jnp.array(True))
    assert int(hist.count) == m
    # slots now hold vecs[2] (head wrapped) and vecs[1]
    vals = sorted(float(hist.S[i, 0, 0]) for i in range(m))
    assert vals == [2.0, 3.0]


def test_ring_push_rejected_pair_is_noop():
    hist = empty_history_state(2, 3, jnp.float64)
    v = jnp.ones((3,))
    hist2 = ring_push(hist, v, v, jnp.asarray(1.0), jnp.array(False))
    assert int(hist2.count) == 0
    np.testing.assert_array_equal(np.asarray(hist2.S), np.asarray(hist.S))


def test_ring_reset():
    hist = empty_history_state(2, 3, jnp.float64)
    v = jnp.ones((3,))
    hist = ring_push(hist, v, v, jnp.asarray(1.0), jnp.array(True))
    hist = ring_reset(hist, jnp.array(True))
    assert int(hist.count) == 0 and int(hist.head) == 0


def test_gamma_clamp_guard():
    """clamp_gamma mode: tiny y^T y -> gamma = 1 (reference s_lbfgs.hpp:119-127)."""
    n, m = 4, 2
    hist = empty_history_state(m, n, jnp.float64)
    s = jnp.ones((n,))
    y = jnp.full((n,), 1e-10)
    hist = ring_push(hist, s, y, 1.0 / jnp.vdot(y, s), jnp.array(True))
    g = jnp.ones((n,))
    r = two_loop(g, hist, clamp_gamma=True)
    assert bool(jnp.all(jnp.isfinite(r)))


def test_compact_matches_loop_form():
    """The GEMM-form compact recursion (the >VMEM-budget fallback) computes
    the same H_k @ v as the loop form across fills, wrap-around and both
    gamma policies."""
    from lbfgs_ffnn_tpu.ops.two_loop import two_loop_compact

    rng = np.random.default_rng(3)
    for n, m, k in [(300, 5, 0), (300, 5, 3), (300, 5, 5), (300, 4, 9),
                    (1500, 8, 6)]:
        hist = empty_history_state(m, n, jnp.float64)
        for _ in range(k):
            s = rng.normal(size=n)
            y = rng.normal(size=n) + 0.5 * s
            if s @ y <= 1e-3:
                continue
            s_j, y_j = jnp.asarray(s), jnp.asarray(y)
            hist = ring_push(hist, s_j, y_j, 1.0 / jnp.vdot(y_j, s_j),
                             jnp.array(True))
        v = jnp.asarray(rng.normal(size=n))
        for cg in (False, True):
            np.testing.assert_allclose(
                np.asarray(two_loop_compact(v, hist, clamp_gamma=cg)),
                np.asarray(two_loop(v, hist, clamp_gamma=cg)),
                rtol=1e-11, atol=1e-11,
            )


def test_gram_push_maintains_exact_gram():
    """GramRing's incremental M == the fresh S.Y^T Gram (physical slots)
    through fills, wrap-around, and a rejected push; yy likewise."""
    from lbfgs_ffnn_tpu.ops.two_loop import GramRing, gram_empty, gram_push

    rng = np.random.default_rng(11)
    n, m = 300, 4
    gr = gram_empty(m, n, jnp.float64)
    pushes = 0
    for t in range(9):
        s = rng.normal(size=n)
        y = rng.normal(size=n) + 0.5 * s
        accept = t != 3  # one rejected push must be a Gram no-op
        gr = gram_push(
            gr, jnp.asarray(s), jnp.asarray(y),
            1.0 / jnp.vdot(jnp.asarray(y), jnp.asarray(s)), jnp.array(accept)
        )
        pushes += accept
        # fresh Gram over the PHYSICAL slots (invalid slots are zero rows,
        # so their fresh entries are 0; M holds garbage there — mask both)
        S2 = np.asarray(gr.ring.S.reshape(m, -1))
        Y2 = np.asarray(gr.ring.Y.reshape(m, -1))
        fresh = S2 @ Y2.T
        cnt = int(gr.ring.count)
        head = int(gr.ring.head)
        valid_phys = [(head - cnt + li) % m for li in range(cnt)]
        got = np.asarray(gr.M)
        for i in valid_phys:
            for j in valid_phys:
                np.testing.assert_allclose(got[i, j], fresh[i, j], rtol=1e-12)
            np.testing.assert_allclose(
                float(gr.yy[i]), float(Y2[i] @ Y2[i]), rtol=1e-12
            )
    assert int(gr.ring.count) == m and pushes > m  # wrapped
