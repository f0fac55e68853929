"""Pallas TPU kernel for the banded pair-alignment DP.

Same recurrence as ops/align_jax.py (and bit-identical outputs — tested),
hand-scheduled for the TPU:

* grid over batch tiles: each program aligns LANES (read, hap) pairs, one
  pair per vector lane; the 8-lane wavefront sits on the sublane axis so
  every state tensor is an [8, LANES] int32 tile — native VPU shape;
* all sequence columns live in VMEM for the whole kernel; the sequential
  antidiagonal loop is pure element-wise min/add/compare plus sublane rolls,
  with no HBM traffic and no cross-sublane reductions inside the loop, and
  is fully unrolled so the compiler schedules across step boundaries;
* sublane shifts are implemented with pltpu.roll + masked select.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align_core import N_LANES, POS_INF

# Lanes (pairs) per grid program.  One native vreg: with the step loop fully
# unrolled the compiler already has cross-step instruction parallelism, and
# 128 lanes keeps register pressure low (measured on v5e: 128 > 256 > 512).
LANES = 128
_N_CHAR = ord("N")


def _shift_up(v, new_row):
    """Row k takes row k-1; row 0 takes new_row ([8, B] tensors)."""
    rolled = pltpu.roll(v, shift=1, axis=0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(row_ids == 0, new_row, rolled)


def _shift_down(v, new_row):
    rolled = pltpu.roll(v, shift=N_LANES - 1, axis=0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(row_ids == N_LANES - 1, new_row, rolled)


def _band_align_kernel(n_steps: int, gapextend: int, nucprior: int,
                       interpret: bool,
                       hap_ref, go_ref, read_ref, qual_ref, rlen_ref, out_ref):
    B = LANES
    ge = jnp.int32(4 * gapextend)
    npr = jnp.int32(4 * nucprior)
    pos_inf = jnp.int32(POS_INF)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N_LANES, B), 0)

    read_len = rlen_ref[0, :]  # [B]

    m0 = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    s1w = hap_ref[0:N_LANES, :]
    gow = go_ref[0:N_LANES, :]
    s2w = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    q2w = jnp.full((N_LANES, B), 64 * 4, jnp.int32)
    # Per-column exit tracking: exactly one sublane row (s2 - read_len) holds
    # the exit cell on any step where the wavefront crosses the read's end, so
    # a masked elementwise min into an [8, B] accumulator (reduced across
    # sublanes ONCE after the loop) is equivalent to reducing every step —
    # and keeps the sequential loop free of cross-sublane reductions.
    minacc = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    # row index at which each column's wavefront exits, relative to s2.
    exit_row = read_len[None, :]  # [1, B]; exit mask is row_ids == s2 - exit_row

    def step(s2, carry):
        m1, i1, d1, m2, i2, d2, s1w, gow, s2w, q2w, minacc = carry
        # nq (the 'hap base is N → mismatch free' column) is derived from s1w
        # elementwise instead of carried: one select beats a sublane roll.
        nq = jnp.where(s1w == _N_CHAR, 0, POS_INF).astype(jnp.int32)

        new_seq2 = read_ref[pl.ds(s2, 1), :][0, :]
        new_qual2 = qual_ref[pl.ds(s2, 1), :][0, :]
        hap_c = hap_ref[pl.ds(N_LANES + s2, 1), :][0, :]
        go_c = go_ref[pl.ds(N_LANES + s2, 1), :][0, :]

        # ---- even phase ------------------------------------------------
        s2w = _shift_up(s2w, new_seq2)
        q2w = _shift_up(q2w, new_qual2)

        init = row_ids == s2
        m1 = jnp.where(init, jnp.int32(-0x8000), m1)
        m2 = jnp.where(init, jnp.int32(-0x8000), m2)

        m1 = jnp.minimum(m1, jnp.minimum(i1, d1))

        exit_mask = row_ids == s2 - exit_row  # true in ≤1 row per column
        minacc = jnp.where(exit_mask, jnp.minimum(minacc, m1), minacc)

        sub = jnp.minimum(jnp.where(s2w == s1w, 0, q2w), nq)
        m1 = m1 + sub
        d1_new = jnp.minimum(d2 + ge, jnp.minimum(m2, i2) + _shift_down(gow, jnp.int32(0)))
        d1 = _shift_up(d1_new, jnp.full((B,), POS_INF, jnp.int32))
        i1 = jnp.minimum(i2 + ge, m2 + gow) + npr

        # ---- odd phase -------------------------------------------------
        s1w = _shift_down(s1w, hap_c)
        nq = jnp.where(s1w == _N_CHAR, 0, POS_INF).astype(jnp.int32)
        gow = _shift_down(gow, go_c)

        m2 = jnp.minimum(m2, jnp.minimum(i2, d2))
        minacc = jnp.where(exit_mask, jnp.minimum(minacc, m2), minacc)

        sub2 = jnp.minimum(jnp.where(s2w == s1w, 0, q2w), nq)
        m2 = m2 + sub2
        d2 = jnp.minimum(d1 + ge, jnp.minimum(m1, i1) + gow)
        i2 = jnp.minimum(_shift_down(i1, pos_inf) + ge, _shift_down(m1, pos_inf) + gow) + npr
        i2 = jnp.where(row_ids == N_LANES - 1, pos_inf, i2)

        return m1, i1, d1, m2, i2, d2, s1w, gow, s2w, q2w, minacc

    carry = (m0, m0, m0, m0, m0, m0, s1w, gow, s2w, q2w, minacc)
    def scan_body(carry, _):
        s2, inner = carry
        return (s2 + 1, step(s2, inner)), None
    # Fully unrolling the antidiagonal loop lets Mosaic schedule across step
    # boundaries (~+30% on v5e); Pallas-TPU lowering only supports unroll=1
    # or full unroll, so cap the program size for very long read buckets.
    # Interpret mode (CPU testing) keeps the rolled loop — unrolled tracing
    # is quadratically slow there and has no scheduler to feed.
    unroll = n_steps if (n_steps <= 256 and not interpret) else 1
    (_, carry), _ = jax.lax.scan(scan_body, (jnp.int32(0), carry), None,
                                 length=n_steps, unroll=unroll)
    minacc = carry[-1]
    minsc = jnp.min(minacc, axis=0)
    out_ref[0, :] = (minsc + 0x8000) >> 2


def _use_interpret() -> bool:
    # Interpret mode on non-TPU backends so the kernel is testable on CPU.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Traceback variant: backpointers + exit step for --calculateFlankScore / HLA
# ---------------------------------------------------------------------------

def _band_align_tb_kernel(n_steps: int, gapextend: int, nucprior: int,
                          interpret: bool,
                          hap_ref, go_ref, read_ref, qual_ref, rlen_ref,
                          score_ref, idx_ref, bp_ref):
    """Traceback-mode wavefront (align.c:96-586 with traceback compiled
    in): identical to _band_align_kernel except the low two bits of every
    DP score carry the predecessor-state label (so scores differ by up to
    3 quarter-units — exactly like the reference), the per-step label
    words stream to bp_ref (even phase in bits 0-7, odd phase in bits
    8-15, one [8, B] row block per antidiagonal pair), and the exit step
    index of the minimum is tracked for the host-side backtrace."""
    B = LANES
    ge = jnp.int32(4 * gapextend)
    npr = jnp.int32(4 * nucprior)
    pos_inf = jnp.int32(POS_INF)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N_LANES, B), 0)

    read_len = rlen_ref[0, :]  # [B]

    m0 = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    s1w = hap_ref[0:N_LANES, :]
    gow = go_ref[0:N_LANES, :]
    s2w = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    q2w = jnp.full((N_LANES, B), 64 * 4, jnp.int32)
    # Exit-cell candidates: each column's wavefront crosses the read end in
    # exactly one sublane row per antidiagonal pair, so every (row, column)
    # records its even-phase and odd-phase candidate exactly once; the
    # global first-strict-minimum (rows ascending == steps ascending, even
    # before odd) is resolved after the loop.
    val_e = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    val_o = jnp.full((N_LANES, B), POS_INF, jnp.int32)
    exit_row = read_len[None, :]

    def step(s2, carry):
        m1, i1, d1, m2, i2, d2, s1w, gow, s2w, q2w, val_e, val_o = carry
        nq = jnp.where(s1w == _N_CHAR, 0, POS_INF).astype(jnp.int32)

        new_seq2 = read_ref[pl.ds(s2, 1), :][0, :]
        new_qual2 = qual_ref[pl.ds(s2, 1), :][0, :]
        hap_c = hap_ref[pl.ds(N_LANES + s2, 1), :][0, :]
        go_c = go_ref[pl.ds(N_LANES + s2, 1), :][0, :]

        # ---- even phase ------------------------------------------------
        s2w = _shift_up(s2w, new_seq2)
        q2w = _shift_up(q2w, new_qual2)

        init = row_ids == s2
        m1 = jnp.where(init, jnp.int32(-0x8000), m1)
        m2 = jnp.where(init, jnp.int32(-0x8000), m2)

        m1 = jnp.minimum(m1, jnp.minimum(i1, d1))

        exit_mask = row_ids == s2 - exit_row
        val_e = jnp.where(exit_mask, m1, val_e)

        sub = jnp.minimum(jnp.where(s2w == s1w, 0, q2w), nq)
        m1 = m1 + sub
        d1_new = jnp.minimum(d2 + ge, jnp.minimum(m2, i2) + _shift_down(gow, jnp.int32(0)))
        d1 = _shift_up(d1_new, jnp.full((B,), POS_INF, jnp.int32))
        i1 = jnp.minimum(i2 + ge, m2 + gow) + npr

        # Label words + low-bit stamping (align.c traceback mode: M=..00,
        # I=..01, D=..11 in the low two bits of every score).
        bp_even = (m1 & 3) | ((i1 & 3) << 2) | ((d1 & 3) << 6)
        m1 = m1 & ~3
        i1 = (i1 & ~3) | 1
        d1 = (d1 & ~3) | 3

        # ---- odd phase -------------------------------------------------
        s1w = _shift_down(s1w, hap_c)
        nq = jnp.where(s1w == _N_CHAR, 0, POS_INF).astype(jnp.int32)
        gow = _shift_down(gow, go_c)

        m2 = jnp.minimum(m2, jnp.minimum(i2, d2))
        val_o = jnp.where(exit_mask, m2, val_o)

        sub2 = jnp.minimum(jnp.where(s2w == s1w, 0, q2w), nq)
        m2 = m2 + sub2
        d2 = jnp.minimum(d1 + ge, jnp.minimum(m1, i1) + gow)
        i2 = jnp.minimum(_shift_down(i1, pos_inf) + ge, _shift_down(m1, pos_inf) + gow) + npr
        i2 = jnp.where(row_ids == N_LANES - 1, pos_inf, i2)

        bp_odd = (m2 & 3) | ((i2 & 3) << 2) | ((d2 & 3) << 6)
        m2 = m2 & ~3
        i2 = (i2 & ~3) | 1
        d2 = (d2 & ~3) | 3

        bp_ref[pl.ds(s2 * N_LANES, N_LANES), :] = bp_even | (bp_odd << 8)

        return m1, i1, d1, m2, i2, d2, s1w, gow, s2w, q2w, val_e, val_o

    carry = (m0, m0, m0, m0, m0, m0, s1w, gow, s2w, q2w, val_e, val_o)
    def scan_body(carry, _):
        s2, inner = carry
        return (s2 + 1, step(s2, inner)), None
    unroll = n_steps if (n_steps <= 256 and not interpret) else 1
    (_, carry), _ = jax.lax.scan(scan_body, (jnp.int32(0), carry), None,
                                 length=n_steps, unroll=unroll)
    val_e = carry[-2]
    val_o = carry[-1]

    # First-strict-minimum across (row asc, even-before-odd) — replicates
    # the scalar loop's `if score < minscore` ordering exactly.
    row_min = jnp.minimum(val_e, val_o)
    row_phase = (val_o < val_e).astype(jnp.int32)
    best = row_min[0, :]
    best_r = jnp.zeros((B,), jnp.int32)
    best_p = row_phase[0, :]
    for r in range(1, N_LANES):
        upd = row_min[r, :] < best
        best = jnp.where(upd, row_min[r, :], best)
        best_r = jnp.where(upd, jnp.int32(r), best_r)
        best_p = jnp.where(upd, row_phase[r, :], best_p)
    score_ref[0, :] = (best + 0x8000) >> 2
    idx_ref[0, :] = 2 * (read_len + best_r) + best_p


@functools.partial(jax.jit, static_argnames=("gapextend", "nucprior", "interpret"))
def band_align_traceback_padded_pallas(
    hap_cols: jnp.ndarray,    # [L1max, B] int32, 'N'-padded
    go4_cols: jnp.ndarray,    # [L1max, B] int32
    read_cols: jnp.ndarray,   # [L2max+8, B] int32, '0'-padded
    qual4_cols: jnp.ndarray,  # [L2max+8, B] int32
    read_len: jnp.ndarray,    # [B] int32
    gapextend: int = 3,
    nucprior: int = 2,
    interpret: bool = None,
):
    """Traceback-mode batched alignment on TPU.

    Returns (scores [B] int32, minidx [B] int32, bp [(L2max+8)*8, B]
    int32): the traceback-mode score (low two bits of every DP cell carry
    state labels, reference align.c semantics), the exit antidiagonal of
    each pair's minimum, and the packed per-step label words (even phase
    bits 0-7, odd phase bits 8-15) — feed a pair's bp column through
    ops.align_core.unpack_backpointers + traceback_from_backpointers for
    the alignment rows."""
    if interpret is None:
        interpret = _use_interpret()
    hap_cols = hap_cols.astype(jnp.int32)
    go4_cols = go4_cols.astype(jnp.int32)
    read_cols = read_cols.astype(jnp.int32)
    qual4_cols = qual4_cols.astype(jnp.int32)
    n_steps, B = read_cols.shape
    L1 = hap_cols.shape[0]
    if B % LANES != 0:
        pad = LANES - B % LANES
        hap_cols = jnp.pad(hap_cols, ((0, 0), (0, pad)), constant_values=_N_CHAR)
        go4_cols = jnp.pad(go4_cols, ((0, 0), (0, pad)))
        read_cols = jnp.pad(read_cols, ((0, 0), (0, pad)), constant_values=ord("0"))
        qual4_cols = jnp.pad(qual4_cols, ((0, 0), (0, pad)), constant_values=64 * 4)
        read_len = jnp.pad(read_len, (0, pad), constant_values=8)
    B_pad = read_cols.shape[1]

    kernel = functools.partial(_band_align_tb_kernel, n_steps, gapextend,
                               nucprior, interpret)
    grid = (B_pad // LANES,)

    score, idx, bp = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_steps * N_LANES, B_pad), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((L1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps * N_LANES, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_steps * LANES * N_LANES * 60,
            bytes_accessed=(2 * L1 + 2 * n_steps + 2 + n_steps * N_LANES) * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hap_cols, go4_cols, read_cols, qual4_cols, read_len.reshape(1, -1))
    return score[0, :B], idx[0, :B], bp[:, :B]


@functools.partial(jax.jit, static_argnames=("gapextend", "nucprior", "interpret"))
def band_align_padded_pallas(
    hap_cols: jnp.ndarray,    # [L1max, B] int32, 'N'-padded
    go4_cols: jnp.ndarray,    # [L1max, B] int32
    read_cols: jnp.ndarray,   # [L2max+8, B] int32, '0'-padded
    qual4_cols: jnp.ndarray,  # [L2max+8, B] int32
    read_len: jnp.ndarray,    # [B] int32
    gapextend: int = 3,
    nucprior: int = 2,
    interpret: bool = None,
) -> jnp.ndarray:
    """Pallas version of ops.align_jax.band_align_padded; same contract."""
    if interpret is None:
        interpret = _use_interpret()
    hap_cols = hap_cols.astype(jnp.int32)
    go4_cols = go4_cols.astype(jnp.int32)
    read_cols = read_cols.astype(jnp.int32)
    qual4_cols = qual4_cols.astype(jnp.int32)
    n_steps, B = read_cols.shape
    L1 = hap_cols.shape[0]
    if B % LANES != 0:
        pad = LANES - B % LANES
        hap_cols = jnp.pad(hap_cols, ((0, 0), (0, pad)), constant_values=_N_CHAR)
        go4_cols = jnp.pad(go4_cols, ((0, 0), (0, pad)))
        read_cols = jnp.pad(read_cols, ((0, 0), (0, pad)), constant_values=ord("0"))
        qual4_cols = jnp.pad(qual4_cols, ((0, 0), (0, pad)), constant_values=64 * 4)
        read_len = jnp.pad(read_len, (0, pad), constant_values=8)
    B_pad = read_cols.shape[1]

    kernel = functools.partial(_band_align_kernel, n_steps, gapextend, nucprior,
                               interpret)
    grid = (B_pad // LANES,)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((L1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_steps * LANES * N_LANES * 50,
            bytes_accessed=(2 * L1 + 2 * n_steps + 2) * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hap_cols, go4_cols, read_cols, qual4_cols, read_len.reshape(1, -1))
    return out[0, :B]
