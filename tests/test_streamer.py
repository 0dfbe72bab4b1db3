"""Native prefetching batch streamer + streaming SGD driver tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_ffnn_tpu.runtime import get_lib
from lbfgs_ffnn_tpu.runtime.streamer import BatchStreamer


def _dataset(n=37, xdim=5):
    # x row i = i (broadcast), y row i = [i] — so gathered batches reveal
    # exactly which source rows they came from.
    x = np.tile(np.arange(n, dtype=np.float32)[:, None], (1, xdim))
    y = np.arange(n, dtype=np.float32)[:, None]
    return x, y


def _epoch_ids(st, n, b):
    """Pull one full epoch; return the source ids in stream order."""
    ids = []
    while len(ids) < n:
        xb, yb, count, epoch = st.next()
        assert count <= b
        np.testing.assert_array_equal(xb[:count, 0], yb[:count, 0])
        ids.extend(int(v) for v in yb[:count, 0])
    return ids


@pytest.mark.parametrize("force_fallback", [False, True])
def test_streamer_epoch_is_permutation(force_fallback):
    n, b = 37, 8
    x, y = _dataset(n)
    with BatchStreamer(x, y, b, seed=7, force_fallback=force_fallback) as st:
        if not force_fallback and not st.native:
            pytest.skip("native runtime unavailable")
        ids0 = _epoch_ids(st, n, b)
        ids1 = _epoch_ids(st, n, b)
    assert sorted(ids0) == list(range(n))
    assert sorted(ids1) == list(range(n))
    assert ids0 != ids1  # fresh permutation per epoch (seed folded with epoch)


@pytest.mark.parametrize("force_fallback", [False, True])
def test_streamer_deterministic_under_seed(force_fallback):
    n, b = 21, 4
    x, y = _dataset(n)
    runs = []
    for _ in range(2):
        with BatchStreamer(x, y, b, seed=99, force_fallback=force_fallback) as st:
            if not force_fallback and not st.native:
                pytest.skip("native runtime unavailable")
            runs.append(_epoch_ids(st, n, b))
    assert runs[0] == runs[1]


def test_streamer_trailing_batch_and_drop_last():
    n, b = 10, 4
    x, y = _dataset(n)
    with BatchStreamer(x, y, b, seed=1) as st:
        if not st.native:
            pytest.skip("native runtime unavailable")
        counts = [st.next()[2] for _ in range(3)]
    assert counts == [4, 4, 2]
    with BatchStreamer(x, y, b, seed=1, drop_last=True) as st:
        seen = [st.next() for _ in range(4)]
    assert all(c == 4 for _, _, c, _ in seen)
    assert [e for *_, e in seen] == [0, 0, 1, 1]  # epoch advances early


def test_sgd_streaming_trains():
    from lbfgs_ffnn_tpu.solvers import SGDOptions
    from lbfgs_ffnn_tpu.solvers.sgd import sgd_streaming
    from lbfgs_ffnn_tpu.types import make_batch_problem

    rng = np.random.default_rng(0)
    n, d = 64, 3
    w_true = np.array([1.0, -2.0, 0.5], np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (x @ w_true)[:, None].astype(np.float32)

    prob = make_batch_problem(
        lambda w, xb, yb: 0.5 * (xb @ w - yb[:, 0]) ** 2
    )
    w0 = jnp.zeros(d)
    with BatchStreamer(x, y, batch_size=16, seed=3) as st:
        res = sgd_streaming(prob, w0, st, SGDOptions(epochs=60, step_size=0.1))
    assert int(res.n_iters) == 60
    np.testing.assert_allclose(np.asarray(res.x), w_true, atol=0.05)
    assert np.isfinite(res.loss_history[:60]).all()


def test_streamer_rejects_bad_args():
    x, y = _dataset(8)
    with pytest.raises(ValueError):
        BatchStreamer(x[:4], y, 2)  # mismatched leading dims
    with pytest.raises(ValueError):
        BatchStreamer(x.ravel(), y, 2)  # not 2-D
    # batch_size larger than n clamps rather than failing
    with BatchStreamer(x, y, batch_size=64, seed=0) as st:
        xb, yb, count, epoch = st.next()
        assert count == 8 and st.batch_size == 8


def test_streamer_partial_batch_tail_is_zeroed():
    """Rows past `count` in a trailing partial batch must be zero, not
    uninitialized memory (they flow into masked losses)."""
    n, b = 10, 4
    x, y = _dataset(n)
    x += 1.0  # make all real rows nonzero
    y += 1.0
    with BatchStreamer(x, y, b, seed=5) as st:
        if not st.native:
            pytest.skip("native runtime unavailable")
        for _ in range(3):
            xb, yb, count, _ = st.next()
            if count < b:
                assert (xb[count:] == 0).all()
                assert (yb[count:] == 0).all()
                break
        else:
            pytest.fail("no partial batch seen")


@pytest.mark.parametrize("drop_last", [False, True])
def test_sgd_streaming_epoch_count_indivisible(drop_last):
    """Epoch accounting must follow the streamer's epoch labels even when
    n % batch != 0 (the trailing-batch / drop_last corner)."""
    import jax.numpy as jnp
    from lbfgs_ffnn_tpu.solvers import SGDOptions
    from lbfgs_ffnn_tpu.solvers.sgd import sgd_streaming
    from lbfgs_ffnn_tpu.types import make_batch_problem

    rng = np.random.default_rng(1)
    n, d = 22, 3  # 22 % 8 != 0
    w_true = np.array([0.5, 1.0, -1.5], np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (x @ w_true)[:, None].astype(np.float32)
    prob = make_batch_problem(lambda w, xb, yb: 0.5 * (xb @ w - yb[:, 0]) ** 2)
    with BatchStreamer(x, y, batch_size=8, seed=2, drop_last=drop_last) as st:
        res = sgd_streaming(prob, jnp.zeros(d), st,
                            SGDOptions(epochs=80, step_size=0.15))
    assert int(res.n_iters) == 80
    assert np.isfinite(np.asarray(res.loss_history)).all()
    np.testing.assert_allclose(np.asarray(res.x), w_true, atol=0.1)


def test_sgd_streaming_zero_epochs():
    import jax.numpy as jnp
    from lbfgs_ffnn_tpu.solvers import SGDOptions
    from lbfgs_ffnn_tpu.solvers.sgd import sgd_streaming
    from lbfgs_ffnn_tpu.types import make_batch_problem

    x, y = _dataset(8)
    prob = make_batch_problem(lambda w, xb, yb: 0.5 * (xb @ w - yb[:, 0]) ** 2)
    with BatchStreamer(x, y, 4, seed=0) as st:
        res = sgd_streaming(prob, jnp.zeros(5), st, SGDOptions(epochs=0))
    assert int(res.n_iters) == 0


def test_streamer_concurrent_consumers_deliver_each_batch_once():
    """Multi-consumer safety: concurrent streamer_next calls must never
    deliver the same ring slot twice (each slot is claimed under the mutex
    before the unlocked copy). 4 threads drain 3 epochs; every epoch's
    union of delivered ids must be exactly one permutation — a double-pop
    shows up as a duplicate id, a corrupted ring as a missing one."""
    import threading

    n, b, epochs, workers = 240, 8, 3, 4
    x, y = _dataset(n)
    batches_per_epoch = -(-n // b)
    total = epochs * batches_per_epoch

    with BatchStreamer(x, y, b, seed=11) as st:
        if not st.native:
            pytest.skip("native runtime unavailable")
        lock = threading.Lock()
        popped = []  # (epoch, ids) per batch
        remaining = [total]

        def consume():
            while True:
                with lock:
                    if remaining[0] == 0:
                        return
                    remaining[0] -= 1
                xb, yb, count, epoch = st.next()
                np.testing.assert_array_equal(xb[:count, 0], yb[:count, 0])
                with lock:
                    popped.append((epoch, [int(v) for v in yb[:count, 0]]))

        threads = [threading.Thread(target=consume) for _ in range(workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    assert len(popped) == total
    for e in range(epochs):
        ids = sorted(i for ep, ids in popped if ep == e for i in ids)
        assert ids == list(range(n)), f"epoch {e} delivery not a permutation"


def test_sgd_streaming_full_eval_hook():
    """VERDICT r2 item 9: full_eval_fn records a full-dataset loss and
    gradient norm per epoch (reference recorder semantics, s_gd.hpp:108-131)
    — here built from the out-of-core chunked evaluator, so the streaming
    path emits a reference-comparable history without resident data."""
    from lbfgs_ffnn_tpu.data.outofcore import ChunkStore, outofcore_problem
    from lbfgs_ffnn_tpu.solvers import SGDOptions
    from lbfgs_ffnn_tpu.solvers.sgd import sgd_streaming
    from lbfgs_ffnn_tpu.types import make_batch_problem

    rng = np.random.default_rng(1)
    n, d = 48, 3
    w_true = np.array([1.0, -2.0, 0.5])
    x = rng.normal(size=(n, d))
    y = (x @ w_true)[:, None]

    bp = make_batch_problem(lambda w, xb, yb: 0.5 * (xb @ w - yb[:, 0]) ** 2)
    store = ChunkStore(x, y, chunk_rows=16)
    prob = outofcore_problem(bp, store)

    def full_eval(w):
        f, g = prob.value_and_grad(w, ())
        return f, jnp.linalg.norm(g)

    with BatchStreamer(x.astype(np.float64), y.astype(np.float64),
                       batch_size=16, seed=3) as st:
        res = sgd_streaming(bp, jnp.zeros(d), st,
                            SGDOptions(epochs=8, step_size=0.1),
                            full_eval_fn=full_eval)
    # every epoch has a FULL loss and gnorm entry...
    assert np.isfinite(np.asarray(res.loss_history[:8])).all()
    assert np.isfinite(np.asarray(res.gnorm_history[:8])).all()
    # ...and the last entry is exactly the full evaluation at the final w
    f_ref, g_ref = prob.value_and_grad(res.x, ())
    np.testing.assert_allclose(float(res.loss_history[7]), float(f_ref), rtol=1e-12)
    np.testing.assert_allclose(
        float(res.gnorm_history[7]), float(jnp.linalg.norm(g_ref)), rtol=1e-12
    )
    np.testing.assert_allclose(float(res.final_loss), float(f_ref), rtol=1e-12)
    # full-dataset losses decrease on this convex problem
    lh = np.asarray(res.loss_history[:8])
    assert lh[-1] < lh[0]
