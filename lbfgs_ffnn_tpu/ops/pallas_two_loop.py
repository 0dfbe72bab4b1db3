"""Fused Pallas TPU kernel for the L-BFGS two-loop recursion.

The reference CUDA implementation issues ~4m separate cuBLAS dot/axpy calls
per direction computation, each a host-synchronizing launch
(reference: src/cuda/lbfgs.cuh:206-261) — at m=100 that is ~400 launches and
the dominant per-iteration cost (BASELINE.md: the m=10 -> m=100 gap is
~4.3 ms/iter of almost pure launch/sync latency).

This kernel runs the *entire* recursion — both passes, all dots, axpys, the
gamma scaling — in one Pallas program:

  * q and z live in VMEM for the whole kernel (no HBM round-trips between
    the 2*count sequential stages);
  * the (s_i, y_i) history rows stream HBM -> VMEM with double-buffered
    async DMA, so the next pair's fetch overlaps the current pair's
    dot+axpy;
  * rho, head, count are scalars in SMEM; ring-index arithmetic happens
    in-kernel, so ring state never forces a re-layout of the history.

The recursion is inherently sequential in the history index (q mutates), so
the kernel is HBM-bandwidth-bound: ~4*count*n*4 bytes per call, ~1.1 us per
(pair, pass) stage at v5e's ~819 GB/s for n~100k — versus the reference's
per-launch overhead alone of ~10-20 us.

Three variants by size: whole-history VMEM-resident (small m*n), row
streaming with 6 whole-row buffers (n up to ~500k f32), and rows-BLOCKED
streaming (n up to ~2.5M: only the working vector stays VMEM-resident and
history rows arrive in tile-row chunks through a stage pipeline). The
wrapper falls back to the XLA implementation above the blocked budget.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbfgs_ffnn_tpu.ops.two_loop import RingState, two_loop

# Streaming variant VMEM budget: 3 f32 rows (v in, out, q scratch) + 4
# pair-dtype rows (s/y double buffers). Expressed in BYTES so a narrow
# pair_dtype (bfloat16 ring) extends the reach: the f32 cutoff stays at
# the round-2 value of 512k params/row; bf16 pairs reach ~716k.
_VMEM_ROW_BYTES = 512 * 1024 * 28  # == f32 cutoff 512k * (3*4 + 4*4) B
_VMEM_ROW_LIMIT = _VMEM_ROW_BYTES // 28  # the f32-pair cutoff in elements

# Rows-blocked streaming kernel (n above _VMEM_ROW_LIMIT): only the working
# vector is VMEM-resident; (s_i, y_i) rows stream in tile-row CHUNKS, so the
# budget is one padded vector (~n_pad * 4 B) + two small chunk buffers.
_BLOCKED_ROW_LIMIT = 2_500_000  # f32 elements (~10 MB working vector)
_BLOCKED_VMEM_ELEMS = 3_000_000  # ~12 MB f32: working vector + chunk buffers


def _pick_block_rows(rows: int, pair_itemsize: int = 4) -> int:
    """Chunk size for the blocked kernel: FEW large chunks win — the
    per-stage cost (predicated DMA start/wait + SMEM decode) measured
    ~0.26 us, so v5e n=1M m=50 went 1.82 ms (nblk=16) -> 1.43 (8) -> 1.13
    (4) -> 1.04 (2, the optimum; 1.06x of the 4mn HBM bound) -> 1.05 (1,
    shallower pipeline). Prefer ~2 chunks, capped so the f32 working
    vector plus the two pair-dtype chunk buffers stay inside the ~12 MB
    VMEM budget."""
    budget_b = _BLOCKED_VMEM_ELEMS * 4
    spare = max((budget_b - rows * 128 * 4) // (2 * 128 * pair_itemsize), 64)
    return max(64, min(-(-rows // 2), 4096, spare))

# When the whole (S, Y) history fits comfortably in VMEM, skip per-pair
# streaming entirely: two bulk DMAs bring the stacked arrays on-chip and the
# 2*count sequential stages run with zero DMA latency in the loop. For small
# parameter counts (e.g. the 921-param Burgers PINN, 4 KB/row) the streaming
# kernel is DMA-latency-bound (~2 us per stage for ~8 KB of payload), so
# this path is the difference between ~400 us and ~tens of us at m=100.
_VMEM_RESIDENT_BYTES = 4 * 1024 * 1024  # per stacked array (1M f32 elements)
_VMEM_RESIDENT_LIMIT = _VMEM_RESIDENT_BYTES // 4  # f32-pair cutoff, elements


def _kernel(meta_ref, rho_ref, v_ref, s_hbm, y_hbm, out_ref,
            q_ref, sbuf, ybuf, alphas_ref, scal_ref, s_sem, y_sem,
            *, m: int, clamp_gamma: bool, gamma_min: float, gamma_max: float):
    head = meta_ref[0]
    count = meta_ref[1]

    def start_fetch(slot, i):
        pltpu.make_async_copy(s_hbm.at[i], sbuf.at[slot], s_sem.at[slot]).start()
        pltpu.make_async_copy(y_hbm.at[i], ybuf.at[slot], y_sem.at[slot]).start()

    def wait_fetch(slot, i):
        pltpu.make_async_copy(s_hbm.at[i], sbuf.at[slot], s_sem.at[slot]).wait()
        pltpu.make_async_copy(y_hbm.at[i], ybuf.at[slot], y_sem.at[slot]).wait()

    q_ref[:] = v_ref[:]

    # ---- backward pass: newest -> oldest (j = 0 is the newest pair) ----
    def slot_bwd(j):
        return (head - 1 - j) % m

    @pl.when(count > 0)
    def _():
        start_fetch(0, slot_bwd(0))

    def bwd(j, carry):
        cur = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < count)
        def _():
            start_fetch(nxt, slot_bwd(j + 1))

        i = slot_bwd(j)
        wait_fetch(cur, i)
        s_row = sbuf[cur]
        y_row = ybuf[cur]

        # gamma = (s^T y)/(y^T y) of the newest pair (j == 0); upcast the
        # rows when the ring is stored narrow (pair x pair would sum bf16)
        @pl.when(j == 0)
        def _():
            sf = s_row.astype(q_ref.dtype)
            yf = y_row.astype(q_ref.dtype)
            ys = jnp.sum(sf * yf)
            yy = jnp.sum(yf * yf)
            if clamp_gamma:
                gamma = jnp.where(jnp.abs(yy) < 1e-12, 1.0, ys / jnp.where(yy == 0, 1.0, yy))
                gamma = jnp.clip(gamma, gamma_min, gamma_max)
            else:
                gamma = jnp.where(yy > 0, ys / jnp.where(yy == 0, 1.0, yy), 1.0)
            scal_ref[0] = gamma

        a = rho_ref[i] * jnp.sum(s_row.astype(q_ref.dtype) * q_ref[:])
        alphas_ref[count - 1 - j] = a
        q_ref[:] = q_ref[:] - a * y_row
        return carry

    lax.fori_loop(0, count, bwd, 0)

    @pl.when(count == 0)
    def _():
        scal_ref[0] = jnp.float32(1.0)

    out_ref[:] = scal_ref[0] * q_ref[:]

    # ---- forward pass: oldest -> newest ----
    def slot_fwd(li):
        return (head - count + li) % m

    @pl.when(count > 0)
    def _():
        start_fetch(0, slot_fwd(0))

    def fwd(li, carry):
        cur = li % 2
        nxt = (li + 1) % 2

        @pl.when(li + 1 < count)
        def _():
            start_fetch(nxt, slot_fwd(li + 1))

        i = slot_fwd(li)
        wait_fetch(cur, i)
        s_row = sbuf[cur]
        y_row = ybuf[cur]
        b = rho_ref[i] * jnp.sum(y_row * out_ref[:])
        out_ref[:] = out_ref[:] + (alphas_ref[li] - b) * s_row
        return carry

    lax.fori_loop(0, count, fwd, 0)


def _kernel_resident(meta_ref, rho_ref, v_ref, s_hbm, y_hbm, out_ref,
                     q_ref, s_vmem, y_vmem, alphas_ref, scal_ref, sem,
                     *, m: int, clamp_gamma: bool, gamma_min: float,
                     gamma_max: float):
    """Whole-history-resident variant: two bulk DMAs, then both passes run
    entirely from VMEM (no per-pair DMA latency on the sequential path)."""
    head = meta_ref[0]
    count = meta_ref[1]

    pltpu.make_async_copy(s_hbm, s_vmem, sem.at[0]).start()
    pltpu.make_async_copy(y_hbm, y_vmem, sem.at[1]).start()
    q_ref[:] = v_ref[:]
    pltpu.make_async_copy(s_hbm, s_vmem, sem.at[0]).wait()
    pltpu.make_async_copy(y_hbm, y_vmem, sem.at[1]).wait()

    # ---- backward pass: newest -> oldest ----
    def bwd(j, carry):
        i = (head - 1 - j) % m
        s_row = s_vmem[i]
        y_row = y_vmem[i]

        @pl.when(j == 0)
        def _():
            sf = s_row.astype(q_ref.dtype)
            yf = y_row.astype(q_ref.dtype)
            ys = jnp.sum(sf * yf)
            yy = jnp.sum(yf * yf)
            if clamp_gamma:
                gamma = jnp.where(jnp.abs(yy) < 1e-12, 1.0, ys / jnp.where(yy == 0, 1.0, yy))
                gamma = jnp.clip(gamma, gamma_min, gamma_max)
            else:
                gamma = jnp.where(yy > 0, ys / jnp.where(yy == 0, 1.0, yy), 1.0)
            scal_ref[0] = gamma

        a = rho_ref[i] * jnp.sum(s_row.astype(q_ref.dtype) * q_ref[:])
        alphas_ref[count - 1 - j] = a
        q_ref[:] = q_ref[:] - a * y_row
        return carry

    lax.fori_loop(0, count, bwd, 0)

    @pl.when(count == 0)
    def _():
        scal_ref[0] = jnp.float32(1.0)

    out_ref[:] = scal_ref[0] * q_ref[:]

    # ---- forward pass: oldest -> newest ----
    def fwd(li, carry):
        i = (head - count + li) % m
        b = rho_ref[i] * jnp.sum(y_vmem[i] * out_ref[:])
        out_ref[:] = out_ref[:] + (alphas_ref[li] - b) * s_vmem[i]
        return carry

    lax.fori_loop(0, count, fwd, 0)


def _kernel_blocked(meta_ref, rho_ref, gamma_ref, v_hbm, s_hbm, y_hbm,
                    out_ref, buf, acc_ref, coef_ref, alphas_ref, sems, v_sem,
                    *, m: int, rows: int, cblk: int, nblk: int):
    """Rows-blocked streaming variant for n above the whole-row VMEM budget.

    Only the working vector (tile-padded to ``nblk*cblk`` rows) is
    VMEM-resident; (s_i, y_i) history rows stream in ``cblk``-tile-row
    chunks. The recursion is flattened into one pipeline of
    ``4*count*nblk`` stages — (segment, phase, chunk) with segment =
    bwd pairs newest->oldest then fwd pairs oldest->newest, phase 0 = the
    dot sweep, phase 1 = the axpy sweep — and stage t+1's chunk DMA is
    issued before stage t's compute, so the DMA queue never drains at
    phase or pair boundaries (a bubble per phase would cost ~20-30% at
    n=1M). gamma arrives precomputed (an O(n) XLA reduction outside —
    ~1/(2m) of the kernel's 4mn traffic) so the newest pair's rows are not
    double-fetched.
    """
    head = meta_ref[0]
    count = meta_ref[1]
    tail = rows - (nblk - 1) * cblk  # static, in (0, cblk]

    def decode(t):
        seg = t // (2 * nblk)
        ph = (t // nblk) % 2
        c = t % nblk
        bwd = seg < count
        # physical ring slot: bwd pair j=seg is newest-first; fwd pair
        # li=seg-count is oldest-first
        i = jnp.where(
            bwd, (head - 1 - seg) % m, (head - count + (seg - count)) % m
        )
        use_s = jnp.logical_xor(bwd, ph == 1)  # bwd: S on dot; fwd: S on axpy
        return seg, ph, c, i, bwd, use_s

    def _dma(slot, src, c):
        is_last = c == nblk - 1

        def chunk_copy(full):
            size = cblk if full else tail
            return pltpu.make_async_copy(
                src.at[pl.ds(c * cblk, size)],
                buf.at[slot, pl.ds(0, size)],
                sems.at[slot],
            )

        return chunk_copy, is_last

    def start_fetch(slot, t):
        # decode(t) sees a concrete int for the pipeline-priming stage 0, so
        # predicates must negate via logical_not, not `~` (deprecated on bool)
        _, _, c, i, _, use_s = decode(t)
        for sel, src in ((use_s, s_hbm), (jnp.logical_not(use_s), y_hbm)):
            chunk_copy, is_last = _dma(slot, src.at[i], c)
            if tail == cblk:
                @pl.when(sel)
                def _():
                    chunk_copy(True).start()
            else:
                @pl.when(sel & jnp.logical_not(is_last))
                def _():
                    chunk_copy(True).start()

                @pl.when(sel & is_last)
                def _():
                    chunk_copy(False).start()

    def wait_fetch(slot, t):
        _, _, c, i, _, use_s = decode(t)
        for sel, src in ((use_s, s_hbm), (jnp.logical_not(use_s), y_hbm)):
            chunk_copy, is_last = _dma(slot, src.at[i], c)
            if tail == cblk:
                @pl.when(sel)
                def _():
                    chunk_copy(True).wait()
            else:
                @pl.when(sel & jnp.logical_not(is_last))
                def _():
                    chunk_copy(True).wait()

                @pl.when(sel & is_last)
                def _():
                    chunk_copy(False).wait()
                    # tail rows beyond the history are stale from earlier
                    # full chunks: zero them so unmasked full-width compute
                    # stays exact (the working vector's pad rows are zero)
                    buf[slot, pl.ds(tail, cblk - tail)] = jnp.zeros(
                        (cblk - tail, 128), buf.dtype
                    )

    # ---- init: DMA v into the working vector; zero the pad rows ----------
    vcp = pltpu.make_async_copy(v_hbm, out_ref.at[pl.ds(0, rows)], v_sem)
    vcp.start()
    if nblk * cblk > rows:
        out_ref[pl.ds(rows, nblk * cblk - rows)] = jnp.zeros(
            (nblk * cblk - rows, 128), out_ref.dtype
        )
    acc_ref[0] = jnp.float32(0.0)
    vcp.wait()

    total = count * 4 * nblk

    @pl.when(total > 0)
    def _():
        start_fetch(0, 0)

    def stage(t, carry):
        cur = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < total)
        def _():
            start_fetch(nxt, t + 1)

        wait_fetch(cur, t)
        seg, ph, c, i, bwd, _ = decode(t)
        chunk = buf[cur]
        qc = out_ref[pl.ds(c * cblk, cblk)]

        @pl.when(ph == 0)
        def _():
            acc_ref[0] = acc_ref[0] + jnp.sum(chunk * qc)

        last_c = c == nblk - 1

        @pl.when((ph == 0) & last_c & bwd)
        def _():
            a = rho_ref[i] * acc_ref[0]
            alphas_ref[count - 1 - seg] = a
            coef_ref[0] = -a
            acc_ref[0] = jnp.float32(0.0)

        @pl.when((ph == 0) & last_c & ~bwd)
        def _():
            b = rho_ref[i] * acc_ref[0]
            coef_ref[0] = alphas_ref[seg - count] - b
            acc_ref[0] = jnp.float32(0.0)

        @pl.when(ph == 1)
        def _():
            out_ref[pl.ds(c * cblk, cblk)] = qc + coef_ref[0] * chunk

        # end of the last backward segment: scale by gamma (z = gamma * q)
        @pl.when(t == count * 2 * nblk - 1)
        def _():
            out_ref[:] = gamma_ref[0] * out_ref[:]

        return carry

    lax.fori_loop(0, total, stage, 0)


@functools.partial(
    jax.jit,
    static_argnames=("clamp_gamma", "gamma_min", "gamma_max", "interpret",
                     "block_rows"),
)
def _two_loop_pallas_blocked(
    v2, S3, Y3, rho, head, count,
    clamp_gamma: bool, gamma_min: float, gamma_max: float, interpret: bool,
    block_rows: int = 0,
):
    m, rows, _ = S3.shape
    pd = jnp.dtype(S3.dtype)
    n_pad = rows * 128
    cblk = block_rows if block_rows else _pick_block_rows(rows, pd.itemsize)
    if not block_rows or pd.itemsize < 4:
        # Auto-picked (and all bf16) chunks land on sublane-tile multiples
        # (8 rows f32, 16 bf16); an explicit f32 block_rows is honored
        # exactly (tests use odd sizes to exercise ragged tails).
        tile = 32 // pd.itemsize
        cblk = -(-cblk // tile) * tile
    cblk = min(cblk, rows)
    nblk = -(-rows // cblk)
    meta = jnp.stack([head.astype(jnp.int32), count.astype(jnp.int32)])

    # gamma outside the kernel: one O(n) XLA pass over the newest pair
    # (fused reads), so the pipeline never needs a pair's rows twice.
    # Upcast when the ring is stored narrow (pair x pair would dot bf16).
    last = (head - 1) % m
    s_last = S3[last].astype(v2.dtype)
    y_last = Y3[last].astype(v2.dtype)
    ys = jnp.vdot(s_last, y_last)
    yy = jnp.vdot(y_last, y_last)
    if clamp_gamma:
        gamma = jnp.where(jnp.abs(yy) < 1e-12, 1.0,
                          ys / jnp.where(yy == 0, 1.0, yy))
        gamma = jnp.clip(gamma, gamma_min, gamma_max)
    else:
        gamma = jnp.where(yy > 0, ys / jnp.where(yy == 0, 1.0, yy), 1.0)
    gamma = jnp.where(count > 0, gamma, 1.0).astype(v2.dtype)[None]

    out = pl.pallas_call(
        functools.partial(
            _kernel_blocked, m=m, rows=rows, cblk=cblk, nblk=nblk
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * cblk, 128), v2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rho
            pl.BlockSpec(memory_space=pltpu.SMEM),   # gamma
            pl.BlockSpec(memory_space=pl.ANY),       # v (DMA'd into out)
            pl.BlockSpec(memory_space=pl.ANY),       # S
            pl.BlockSpec(memory_space=pl.ANY),       # Y
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, cblk, 128), S3.dtype),    # chunk double buffer
            pltpu.SMEM((1,), v2.dtype),              # dot accumulator
            pltpu.SMEM((1,), v2.dtype),              # current axpy coefficient
            pltpu.SMEM((m,), v2.dtype),              # alphas
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(meta, rho, gamma, v2, S3, Y3)
    return out.reshape(nblk * cblk * 128)[:n_pad]


@functools.partial(
    jax.jit, static_argnames=("clamp_gamma", "gamma_min", "gamma_max", "interpret")
)
def _two_loop_pallas_padded(
    v2, S3, Y3, rho, head, count,
    clamp_gamma: bool, gamma_min: float, gamma_max: float, interpret: bool,
):
    # S3/Y3 arrive in the ring's native (m, rows, 128) tile shape — NO
    # reshape here: reshaping a loop-carried buffer into a custom-call
    # operand forces XLA to materialize a fresh copy of the whole stack
    # every call (measured 493 -> 223 us at m=100, n=102k without it).
    m, rows, _ = S3.shape
    n_pad = rows * 128
    meta = jnp.stack([head.astype(jnp.int32), count.astype(jnp.int32)])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # meta (head, count)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # rho (m,)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # v
        pl.BlockSpec(memory_space=pl.ANY),    # S (stays off-chip)
        pl.BlockSpec(memory_space=pl.ANY),    # Y
    ]
    if m * n_pad * jnp.dtype(S3.dtype).itemsize <= _VMEM_RESIDENT_BYTES:
        kern = functools.partial(
            _kernel_resident, m=m, clamp_gamma=clamp_gamma,
            gamma_min=gamma_min, gamma_max=gamma_max,
        )
        scratch = [
            pltpu.VMEM((rows, 128), v2.dtype),      # q
            pltpu.VMEM((m, rows, 128), S3.dtype),   # whole S
            pltpu.VMEM((m, rows, 128), S3.dtype),   # whole Y
            pltpu.SMEM((m,), v2.dtype),             # alphas
            pltpu.SMEM((1,), v2.dtype),             # gamma
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(
            _kernel, m=m, clamp_gamma=clamp_gamma,
            gamma_min=gamma_min, gamma_max=gamma_max,
        )
        scratch = [
            pltpu.VMEM((rows, 128), v2.dtype),      # q
            pltpu.VMEM((2, rows, 128), S3.dtype),   # s double buffer
            pltpu.VMEM((2, rows, 128), S3.dtype),   # y double buffer
            pltpu.SMEM((m,), v2.dtype),             # alphas
            pltpu.SMEM((1,), v2.dtype),             # gamma
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, 128), v2.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(meta, rho, v2, S3, Y3)
    return out.reshape(n_pad)


def pallas_dispatch(n_pad: int, m: int, dtype,
                    pair_dtype=None) -> tuple[str, str]:
    """Which implementation :func:`two_loop_pallas` will use for a history of
    padded row length ``n_pad`` / capacity ``m`` / working ``dtype`` /
    (S, Y) storage ``pair_dtype`` (defaults to ``dtype``).

    Returns ``(impl, reason)`` with ``impl`` one of ``"pallas-resident"``,
    ``"pallas-streaming"``, ``"pallas-blocked"``, ``"xla"``. Lets callers
    (and tests) check for a silent policy substitution up front.
    """
    if jnp.dtype(dtype) != jnp.float32:
        return "xla", f"dtype {jnp.dtype(dtype).name} != float32"
    pd = jnp.dtype(pair_dtype) if pair_dtype is not None else jnp.dtype(dtype)
    if pd not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return "xla", f"pair dtype {pd.name} not in (float32, bfloat16)"
    if n_pad > _BLOCKED_ROW_LIMIT:
        return (
            "xla",
            f"padded row length {n_pad} > blocked-kernel budget "
            f"{_BLOCKED_ROW_LIMIT} f32 elements (the VMEM-resident working "
            "vector no longer fits); the XLA loop form runs near the HBM "
            "bound there (measured v5e n=4M m=50: 4.74 ms/call = 1.21x of "
            "the 4mn row bound, within 1.03x of the raised-budget kernel — "
            "scripts/diag_two_loop_large.py, docs/PERF.md round 5)",
        )
    if n_pad * (12 + 4 * pd.itemsize) > _VMEM_ROW_BYTES:
        return "pallas-blocked", ""
    if m * n_pad * pd.itemsize <= _VMEM_RESIDENT_BYTES:
        return "pallas-resident", ""
    return "pallas-streaming", ""


_FALLBACK_WARNED: set[tuple[int, int, str]] = set()


def two_loop_pallas(
    v: jax.Array,
    hist: RingState,
    *,
    clamp_gamma: bool = False,
    gamma_min: float = 1e-6,
    gamma_max: float = 1e6,
) -> jax.Array:
    """Drop-in replacement for :func:`lbfgs_ffnn_tpu.ops.two_loop.two_loop`.

    Dispatches to the fused kernel when the row size fits the VMEM budget
    (interpreted off-TPU so unit tests exercise the same kernel logic);
    falls back to the XLA implementation otherwise — warning once per
    (m, n, dtype) so a solver configured with ``two_loop_impl="pallas"``
    never silently substitutes the policy (use :func:`pallas_dispatch` to
    check ahead of time).
    """
    m, rows, _ = hist.S.shape
    n_pad = rows * 128
    n = v.shape[0]
    impl, reason = pallas_dispatch(n_pad, m, v.dtype, hist.S.dtype)
    if impl == "xla":
        key = (m, n_pad, jnp.dtype(v.dtype).name)
        if key not in _FALLBACK_WARNED:
            _FALLBACK_WARNED.add(key)
            warnings.warn(
                f"two_loop_pallas falling back to the XLA implementation "
                f"for (m={m}, n_pad={n_pad}, dtype={key[2]}): {reason}",
                stacklevel=2,
            )
        return two_loop(v, hist, clamp_gamma=clamp_gamma,
                        gamma_min=gamma_min, gamma_max=gamma_max)
    # v is freshly produced each call — padding/reshaping it is free
    # (unlike the carried S/Y, which must arrive pre-tiled; see above).
    v2 = jnp.zeros((n_pad,), dtype=v.dtype).at[:n].set(v).reshape(rows, 128) \
        if n != n_pad else v.reshape(rows, 128)
    interpret = jax.default_backend() != "tpu"
    if impl == "pallas-blocked":
        out = _two_loop_pallas_blocked(
            v2, hist.S, hist.Y, hist.rho, hist.head, hist.count,
            clamp_gamma, gamma_min, gamma_max, interpret,
        )
    else:
        out = _two_loop_pallas_padded(
            v2, hist.S, hist.Y, hist.rho, hist.head, hist.count,
            clamp_gamma, gamma_min, gamma_max, interpret,
        )
    return out[:n]
