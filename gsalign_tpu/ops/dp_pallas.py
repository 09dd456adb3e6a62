"""Pallas TPU kernel: fused affine-gap DP forward + traceback.

Same recurrence and direction-byte semantics as ops/dp.py (the exact ksw2
`extz2_sse` + `ksw_backtrack` emulation, reference
src/ksw2_alignment.cpp:25-249) with BOTH passes fused into one kernel: the
u/v/x/y difference rows AND the whole direction matrix stay in VMEM, and
only the op codes leave the chip — the direction matrix (the O(L^2)
traffic of the scan path) never touches HBM.

Kernel-internal direction encoding (4 bits, unlike ksw2's 5): dmain in
{0,1,2} on bits 0-1, the x>0 (E-continue) bit on bit 2, the y>0
(F-continue) bit on bit 3 — ksw2 skips bit 2 (src/ksw2_alignment.cpp:
d = 0x08/0x10), but its backtrack only ever tests "bit for state s", so
the compact layout is behaviorally identical and lets TWO wavefronts pack
into one int8 VMEM cell (low nibble = even r, high = odd r). That halves
the O(L^2) scratch and lifts the in-VMEM bucket bound to L = 256.

Band-phase scheduling: anti-diagonal r only touches DP rows
[max(0, r-L+1), min(r, L-1)], so the first L/2 wavefronts live entirely
in rows [0, L/2) and the last L/2 in [L/2, L). The forward and traceback
loops each run in three statically-windowed phases (lower half / full /
upper half), cutting the per-wavefront vector work by ~25% overall
against the naive full-column schedule.

Mosaic-friendly constructions (this toolchain rejects SMEM scalar-vector
stacks, per-lane scatters/gathers, and any int64 in the kernel — see
CLAUDE.md):
 - problems ride the LANE axis (TB = 128 per tile), DP columns sublanes;
 - the per-wavefront reversed-query window is ONE sublane-dim dynamic
   slice with a scalar start shared by the tile (wavefront index r is
   global: rows past a problem's last anti-diagonal have an empty band);
 - per-problem lengths are ordinary VMEM vector inputs;
 - the forward loop processes wavefront PAIRS (2g, 2g+1), carrying the
   even wavefront's directions in registers and storing one packed
   [rn, TB] int8 plane per pair — one store per two wavefronts;
 - the traceback runs on a GLOBAL anti-diagonal schedule: wavefront r
   decreases one per step and a problem acts only when its i+j == r (an
   M-step skips a wavefront, so the problem idles one step and emits PAD,
   which the host strips anyway). The per-problem direction nibble is a
   masked sublane reduction over the packed wavefront row — no per-lane
   gather. Tail runs (one index exhausted) follow the same schedule since
   D/I steps decrement i+j by exactly one.

Restriction: the packed direction cube is (L, L, TB) int8 in VMEM, so
this kernel serves buckets with L <= MAX_L = 256; larger problems use the
lax.scan path (ops/dp.py) via make_hybrid_dp_fn.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsalign_tpu.ops.dp import (GAP_OPEN, MAX_SC, OP_D, OP_I, OP_M, OP_PAD,
                                QE2, WILDCARD)

MATCH = 1
MISMATCH = -1

MAX_L = 256       # packed d scratch (L, L, TB) int8 must fit VMEM
MAX_L_BIG = 2048  # HBM-staged kernel bound (u/v/x/y + staging must fit VMEM)


def _tile_b(L: int) -> int:
    """Problems per tile (lane axis). 256 lanes trips a Mosaic
    cannot-prove-alignment failure on the dynamic-start query-window load
    (measured on this toolchain), so one native lane group it is."""
    return 128


def _n_steps(L: int) -> int:
    return -(-(2 * L + 2) // 8) * 8          # traceback steps, 8-aligned


def _dp_kernel(q_ref, t_ref, ql_ref, tl_ref, ops_ref,
               u_ref, v_ref, x_ref, y_ref, d_ref, *, L: int, TB: int):
    """One tile: full forward wavefront loop + wavefront-scheduled traceback.

    q_ref: [3L, TB] reversed-padded ksw-query columns (wildcard guards)
    t_ref: [L, TB]  ksw-target columns
    ql_ref/tl_ref: [1, TB] int32 lengths
    ops_ref: [NT, TB] int32 output, reverse-order ops (PAD-interleaved)
    scratch: u/v/x/y [L, TB] int32; packed d [L, L, TB] int8
    """
    i32 = jnp.int32
    zeros = jnp.zeros((L, TB), i32)
    u_ref[:] = zeros
    v_ref[:] = zeros
    x_ref[:] = zeros
    y_ref[:] = zeros

    ql = ql_ref[0, :]                   # [TB]
    tl = tl_ref[0, :]
    half = L // 2

    def wavefront(r, ro, rn):
        """Anti-diagonal r over DP rows [ro, ro+rn); returns its 4-bit
        direction plane [rn, TB]. ro/rn are STATIC; r's live band must be
        contained in the window (band-phase scheduling above)."""
        t_idx = jax.lax.broadcasted_iota(i32, (rn, TB), 0) + i32(ro)
        t_codes = t_ref[ro:ro + rn, :]
        top_val = jnp.where(r > i32(0), i32(GAP_OPEN), i32(0))
        if ro == 0:
            u = u_ref[0:rn, :]
            v = v_ref[0:rn, :]
            x = x_ref[0:rn, :]
            y = y_ref[0:rn, :]
            x1 = jnp.zeros((1, TB), i32)
            v1 = jnp.broadcast_to(top_val, (1, TB)).astype(i32)
            xt1 = jnp.concatenate([x1, x[:-1, :]], axis=0)
            vt1 = jnp.concatenate([v1, v[:-1, :]], axis=0)
        else:
            # upper-half phase: its wavefronts (r >= 3L/2) have
            # st0 = r-ql+1 >= L/2+1, so row ro = L/2 is never in-band and
            # the t-1 boundary row it would read (ro-1, an unaligned
            # sublane offset Mosaic rejects) can be zeros — the value only
            # feeds the masked-out row
            u = u_ref[ro:ro + rn, :]
            v = v_ref[ro:ro + rn, :]
            x = x_ref[ro:ro + rn, :]
            y = y_ref[ro:ro + rn, :]
            zrow = jnp.zeros((1, TB), i32)
            xt1 = jnp.concatenate([zrow, x[:-1, :]], axis=0)
            vt1 = jnp.concatenate([zrow, v[:-1, :]], axis=0)
        st0 = jnp.maximum(i32(0), r - ql + i32(1))[None, :]   # [1, TB]
        en0 = jnp.minimum(r, tl - i32(1))[None, :]

        # boundary pre-sets at t == r (top DP row), masked per problem
        in_top = r <= tl[None, :] - i32(1)
        at_r = t_idx == r
        u = jnp.where(in_top & at_r, top_val, u)
        y = jnp.where(in_top & at_r, i32(0), y)

        # s[t] = score(T[t], Q[r-t]) via the reversed-query window
        start = i32(2 * L - 1 + ro) - r
        qrr = q_ref[pl.ds(start, rn), :]                      # [rn, TB]
        is_wild = (t_codes >= WILDCARD) | (qrr >= WILDCARD)
        s = jnp.where(is_wild, i32(0),
                      jnp.where(t_codes == qrr, i32(MATCH), i32(MISMATCH)))

        z = s + i32(QE2)
        a = xt1 + vt1
        b_ = y + u
        d = jnp.where(a > z, i32(1), i32(0))
        z = jnp.maximum(z, a)
        d = jnp.where(b_ > z, i32(2), d)
        z = jnp.maximum(z, b_)
        z = jnp.minimum(z, i32(MAX_SC))
        u_new = z - vt1
        v_new = z - u
        z2 = z - i32(GAP_OPEN)
        a2 = a - z2
        b2 = b_ - z2
        x_new = jnp.maximum(a2, i32(0))
        y_new = jnp.maximum(b2, i32(0))
        d = d | jnp.where(a2 > 0, i32(4), i32(0))
        d = d | jnp.where(b2 > 0, i32(8), i32(0))

        in_band = (t_idx >= st0) & (t_idx <= en0)
        u_ref[ro:ro + rn, :] = jnp.where(in_band, u_new, u)
        v_ref[ro:ro + rn, :] = jnp.where(in_band, v_new, v)
        x_ref[ro:ro + rn, :] = jnp.where(in_band, x_new, x)
        y_ref[ro:ro + rn, :] = jnp.where(in_band, y_new, y)
        return jnp.where(in_band, d, i32(0))

    def fwd_phase(ro, rn):
        def body(g, _):
            # two wavefront pairs (4g..4g+3) per loop step — Mosaic only
            # supports unroll=1, so the unroll is manual — with one packed
            # int8 store per pair. r = 2L-1 (the final pad slot) has an
            # empty band everywhere (r > ql+tl-2 for ql,tl <= L): harmless,
            # keeps loops square.
            p0 = i32(2) * g
            d0 = wavefront(i32(2) * p0, ro, rn)
            d1 = wavefront(i32(2) * p0 + i32(1), ro, rn)
            d_ref[pl.ds(p0, 1), ro:ro + rn] = \
                (d0 | (d1 << i32(4))).astype(jnp.int8)[None]
            d2 = wavefront(i32(2) * p0 + i32(2), ro, rn)
            d3 = wavefront(i32(2) * p0 + i32(3), ro, rn)
            d_ref[pl.ds(p0 + i32(1), 1), ro:ro + rn] = \
                (d2 | (d3 << i32(4))).astype(jnp.int8)[None]
            return i32(0)
        return body

    # pairs in [0, L/4): r < L/2 lives in rows [0, L/2); pairs in
    # [3L/4, L): r >= 3L/2 lives in rows [L/2, L); the middle needs the
    # full column. Loop index g covers TWO pairs, so bounds are /2.
    q8 = L // 8
    jax.lax.fori_loop(i32(0), i32(q8), fwd_phase(0, half), i32(0))
    jax.lax.fori_loop(i32(q8), i32(3 * q8), fwd_phase(0, L), i32(0))
    jax.lax.fori_loop(i32(3 * q8), i32(4 * q8), fwd_phase(half, half),
                      i32(0))

    # ---- traceback on the global anti-diagonal schedule ----
    NT = _n_steps(L)

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, TB), 0)

    def tb_phase(ro, rn):
        t_idx = jax.lax.broadcasted_iota(i32, (rn, TB), 0) + i32(ro)

        def step(g, carry):
            ii, jj, st, buf = carry              # [1, TB] int32 (+buf [8,TB])
            r = i32(2 * L - 2) - g
            both = (ii >= 0) & (jj >= 0)
            act = ((ii + jj) == r) & ((ii >= 0) | (jj >= 0))

            row = d_ref[jnp.maximum(r >> 1, i32(0)),
                        ro:ro + rn]              # [rn, TB] packed int8
            pick = t_idx == jnp.clip(ii, i32(ro), i32(ro + rn - 1))
            tmp = jnp.sum(jnp.where(pick, row.astype(i32), i32(0)),
                          axis=0, keepdims=True, dtype=i32)   # [1, TB]
            tmp = (tmp >> ((r & i32(1)) * i32(4))) & i32(0xF)  # r's nibble
            tmp = jnp.where(act & both, tmp, i32(0))

            s1 = jnp.where(st == 0, tmp & i32(3),
                           jnp.where(((tmp >> (st + i32(1))) & i32(1)) == 0,
                                     i32(0), st))
            s2 = jnp.where(s1 == 0, tmp & i32(3), s1)
            is_m = s2 == 0
            is_d = (s2 == 1) | (s2 == 3)
            op_main = jnp.where(is_m, i32(OP_M),
                                jnp.where(is_d, i32(OP_D), i32(OP_I)))
            op_tail = jnp.where(ii >= 0, i32(OP_D),
                                jnp.where(jj >= 0, i32(OP_I), i32(OP_PAD)))
            op = jnp.where(act, jnp.where(both, op_main, op_tail),
                           i32(OP_PAD))
            di = jnp.where(both, jnp.where(is_m | is_d, i32(1), i32(0)),
                           jnp.where(ii >= 0, i32(1), i32(0)))
            dj = jnp.where(both, jnp.where(is_m | ~is_d, i32(1), i32(0)),
                           jnp.where((ii < 0) & (jj >= 0), i32(1), i32(0)))
            acti = act.astype(i32)
            # int8 single-sublane dynamic stores are rejected by Mosaic:
            # buffer eight steps in registers, store aligned (8, TB) tiles
            buf = jnp.where(iota8 == (g & i32(7)), op, buf)
            return (ii - di * acti, jj - dj * acti,
                    jnp.where(act & both, s2, st), buf)

        def body(h, carry):
            # two traceback steps per loop iteration (manual unroll); the
            # flush lands on the odd sub-step when it completes a tile of 8
            g1 = i32(2) * h + i32(1)
            carry = step(i32(2) * h, carry)
            carry = step(g1, carry)

            @pl.when((g1 & i32(7)) == i32(7))
            def _flush():
                ops_ref[pl.ds((g1 >> i32(3)) * i32(8), 8), :] = carry[3]
            return carry
        return body

    ii0 = (tl - i32(1))[None, :]
    jj0 = (ql - i32(1))[None, :]
    st0_ = jnp.zeros((1, TB), i32)
    buf0 = jnp.full((8, TB), i32(OP_PAD), i32)
    # step g walks r = 2L-2-g: r >= 3L/2 (g <= L/2-2) stays in the upper
    # half; r < L/2 (g >= 3L/2-1) in the lower. Phase bounds snap to the
    # 8-step flush grid INSIDE those safe ranges; loop index h covers TWO
    # steps, so bounds are /2 (still multiples of the 4-h flush period).
    G1 = ((L // 2 - 1) // 8) * 8
    G2 = -(-(3 * L // 2 - 1) // 8) * 8
    carry = (ii0, jj0, st0_, buf0)
    carry = jax.lax.fori_loop(i32(0), i32(G1 // 2),
                              tb_phase(half, half), carry)
    carry = jax.lax.fori_loop(i32(G1 // 2), i32(G2 // 2),
                              tb_phase(0, L), carry)
    jax.lax.fori_loop(i32(G2 // 2), i32(NT // 2), tb_phase(0, half), carry)


@partial(jax.jit, static_argnames=("L", "interpret"))
def dp_align_batch_pallas(q_codes, t_codes, ql, tl, L: int,
                          interpret: bool = False):
    """Drop-in for ops/dp.dp_align_batch: returns reverse-order op codes
    with interleaved OP_PAD (callers strip PADs), uint8 [B, NT].

    q_codes/t_codes: int32 [B, L] (pad 4); B is padded to a TB multiple
    internally. Requires L <= MAX_L and L a multiple of 16 (the band-phase
    and flush grids) — align_fragments' power-of-two buckets qualify.
    """
    assert L <= MAX_L, f"pallas DP bucket limit is {MAX_L}, got {L}"
    assert L % 16 == 0, f"pallas DP bucket must be 16-aligned, got {L}"
    TB = _tile_b(L)
    q_codes = q_codes.astype(jnp.int32)   # int8 on the wire (see ops/dp.py)
    t_codes = t_codes.astype(jnp.int32)
    B0 = q_codes.shape[0]
    B = -(-B0 // TB) * TB
    if B != B0:
        padq = jnp.full((B - B0, L), WILDCARD, q_codes.dtype)
        q_codes = jnp.concatenate([q_codes, padq])
        t_codes = jnp.concatenate([t_codes, padq])
        one = jnp.ones(B - B0, ql.dtype)
        ql = jnp.concatenate([ql, one])
        tl = jnp.concatenate([tl, one])
    NT = _n_steps(L)

    qrev = q_codes[:, ::-1]
    pad = jnp.full((B, L), WILDCARD, jnp.int32)
    qrev_pad = jnp.concatenate([pad, qrev, pad], axis=1)   # [B, 3L]
    # problems on lanes: [3L, B], [L, B]
    qT = qrev_pad.T.astype(jnp.int32)
    tT = t_codes.T.astype(jnp.int32)
    ql2 = ql.astype(jnp.int32)[None, :]
    tl2 = tl.astype(jnp.int32)[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((3 * L, TB), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TB), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NT, TB), lambda i: (i * 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, L, TB), jnp.int8),
        ],
    )
    ops = pl.pallas_call(
        partial(_dp_kernel, L=L, TB=TB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, B), jnp.int32),
        interpret=interpret,
    )(qT, tT, ql2, tl2)
    return ops.T.astype(jnp.uint8)[:B0]          # [B0, NT]


def make_dp_fn(interpret: bool = False):
    """dp_fn for ops/dp.align_fragments (same call signature)."""
    def fn(q, t, ql, tl, L):
        return dp_align_batch_pallas(q, t, ql, tl, L, interpret=interpret)
    return fn


# ---------------------------------------------------------------------------
# HBM-staged kernels for 256 < L <= MAX_L_BIG (buckets 512/1024/2048): the
# packed direction cube (L, L, TB) int8 no longer fits VMEM (8 MB at L=256,
# 4x per doubling), so it lives in HBM between TWO pallas_calls and the
# PIPELINE EMITTER does all the staging — manual make_async_copy is not an
# option on this toolchain (any sliced-ref or scratch-sourced DMA crashes
# the Mosaic compile helper; probed round 4):
#  - the FORWARD kernel runs with grid=(NC,) over CP-plane chunks; its
#    output block (CP, L, TB) is auto-double-buffered to HBM while the
#    next chunk's wavefronts compute; u/v/x/y persist in VMEM scratch
#    across the sequential grid steps.
#  - the TRACEBACK kernel walks grid steps of 2*CP anti-diagonal steps;
#    the cube arrives as TWO input views of the same array (chunk
#    NC-1-k and its successor NC-2-k — plane index decreases one per two
#    steps, so each grid step touches exactly those two chunks, at rows
#    that are STATIC per unrolled sub-step), auto-prefetched ahead;
#    (ii, jj, state) persist in VMEM scratch.
# Everything else — recurrence, band-phase windows, packed nibbles, the
# global anti-diagonal traceback — matches _dp_kernel above (and ops/dp.py,
# the ksw2 emulation of src/ksw2_alignment.cpp:25-249).
# ---------------------------------------------------------------------------


def _chunk_pairs(L: int) -> int:
    """Pair-planes per pipeline chunk: the cube blocks are CP*L*TB bytes of
    VMEM (x2-buffered by the pipeline, x2 input views in the traceback),
    so halve CP at L=2048 to stay inside the ~16 MB budget."""
    return 4 if L > 1024 else 8


def _wavefront_big(q_ref, t_ref, u_ref, v_ref, x_ref, y_ref,
                   ql, tl, r, ro: int, rn: int, L: int, TB: int,
                   boundary=None):
    """Anti-diagonal r over DP rows [ro, ro+rn): identical math to
    _dp_kernel.wavefront but against the [2L, TB] query layout (L/2
    wildcard pads each side; buf[j] = Q[3L/2-1-j], so the window start is
    (3L/2-1+ro) - r). Returns the 4-bit direction plane [rn, TB].

    boundary: optional ([1,TB], [1,TB]) pre-update (x, v) values of row
    ro-1 — used when a full-column wavefront is SPLIT into two windows
    (L=2048: an rn=2048 vector body overflows this toolchain's compile
    helper, probed round 4); None keeps the upper-phase zero rows (row
    ro is then never in-band, see _dp_kernel.wavefront)."""
    i32 = jnp.int32
    t_idx = jax.lax.broadcasted_iota(i32, (rn, TB), 0) + i32(ro)
    t_codes = t_ref[ro:ro + rn, :]
    top_val = jnp.where(r > i32(0), i32(GAP_OPEN), i32(0))
    if ro == 0:
        u = u_ref[0:rn, :]
        v = v_ref[0:rn, :]
        x = x_ref[0:rn, :]
        y = y_ref[0:rn, :]
        x1 = jnp.zeros((1, TB), i32)
        v1 = jnp.broadcast_to(top_val, (1, TB)).astype(i32)
        xt1 = jnp.concatenate([x1, x[:-1, :]], axis=0)
        vt1 = jnp.concatenate([v1, v[:-1, :]], axis=0)
    else:
        u = u_ref[ro:ro + rn, :]
        v = v_ref[ro:ro + rn, :]
        x = x_ref[ro:ro + rn, :]
        y = y_ref[ro:ro + rn, :]
        if boundary is None:
            xb = jnp.zeros((1, TB), i32)
            vb = xb
        else:
            xb, vb = boundary
        xt1 = jnp.concatenate([xb, x[:-1, :]], axis=0)
        vt1 = jnp.concatenate([vb, v[:-1, :]], axis=0)
    st0 = jnp.maximum(i32(0), r - ql + i32(1))[None, :]
    en0 = jnp.minimum(r, tl - i32(1))[None, :]

    in_top = r <= tl[None, :] - i32(1)
    at_r = t_idx == r
    u = jnp.where(in_top & at_r, top_val, u)
    y = jnp.where(in_top & at_r, i32(0), y)

    start = i32(3 * L // 2 - 1 + ro) - r
    qrr = q_ref[pl.ds(start, rn), :]
    is_wild = (t_codes >= WILDCARD) | (qrr >= WILDCARD)
    s = jnp.where(is_wild, i32(0),
                  jnp.where(t_codes == qrr, i32(MATCH), i32(MISMATCH)))

    z = s + i32(QE2)
    a = xt1 + vt1
    b_ = y + u
    d = jnp.where(a > z, i32(1), i32(0))
    z = jnp.maximum(z, a)
    d = jnp.where(b_ > z, i32(2), d)
    z = jnp.maximum(z, b_)
    z = jnp.minimum(z, i32(MAX_SC))
    u_new = z - vt1
    v_new = z - u
    z2 = z - i32(GAP_OPEN)
    a2 = a - z2
    b2 = b_ - z2
    x_new = jnp.maximum(a2, i32(0))
    y_new = jnp.maximum(b2, i32(0))
    d = d | jnp.where(a2 > 0, i32(4), i32(0))
    d = d | jnp.where(b2 > 0, i32(8), i32(0))

    in_band = (t_idx >= st0) & (t_idx <= en0)
    u_ref[ro:ro + rn, :] = jnp.where(in_band, u_new, u)
    v_ref[ro:ro + rn, :] = jnp.where(in_band, v_new, v)
    x_ref[ro:ro + rn, :] = jnp.where(in_band, x_new, x)
    y_ref[ro:ro + rn, :] = jnp.where(in_band, y_new, y)
    return jnp.where(in_band, d, i32(0))


def _dp_fwd_kernel(q_ref, t_ref, ql_ref, tl_ref, cube_ref,
                   u_ref, v_ref, x_ref, y_ref, de_ref,
                   *, L: int, TB: int, CP: int):
    """Forward pass, grid step = one CP-plane chunk of the direction cube.

    cube_ref is the (CP, L, TB) output block for chunk c = program_id(0):
    the pipeline emitter double-buffers it to HBM behind the next chunk's
    compute. u/v/x/y persist across the sequential grid steps. Rows of a
    plane outside its band-phase window are left unwritten (garbage in
    HBM); the traceback masks every read to the in-band cell."""
    i32 = jnp.int32
    c = pl.program_id(0)
    NC = L // CP

    @pl.when(c == 0)
    def _init():
        zeros = jnp.zeros((L, TB), i32)
        u_ref[:] = zeros
        v_ref[:] = zeros
        x_ref[:] = zeros
        y_ref[:] = zeros

    ql = ql_ref[0, :]
    tl = tl_ref[0, :]
    half = L // 2

    def wf(r, ro, rn, boundary=None):
        return _wavefront_big(q_ref, t_ref, u_ref, v_ref, x_ref, y_ref,
                              ql, tl, r, ro, rn, L, TB, boundary)

    # pairs loop: static unroll at L=512 (faster: 5.1 vs 4.4 Gcells/s),
    # fori above (several unrolled rn>=1024 bodies overflow this
    # toolchain's compile helper — probed round 4; the cube store's
    # leading-dim dynamic index is fine)
    def run_phase(ro, rn):
        if L <= 512:
            for kp in range(CP):
                p = c * i32(CP) + i32(kp)
                d0 = wf(i32(2) * p, ro, rn)
                d1 = wf(i32(2) * p + i32(1), ro, rn)
                cube_ref[kp:kp + 1, ro:ro + rn] = \
                    (d0 | (d1 << i32(4))).astype(jnp.int8)[None]
            return

        def body(kp, _):
            p = c * i32(CP) + kp
            d0 = wf(i32(2) * p, ro, rn)
            d1 = wf(i32(2) * p + i32(1), ro, rn)
            cube_ref[pl.ds(kp, 1), ro:ro + rn] = \
                (d0 | (d1 << i32(4))).astype(jnp.int8)[None]
            return i32(0)
        jax.lax.fori_loop(i32(0), i32(CP), body, i32(0))

    def run_full_split():
        # L=2048: an rn=L vector body overflows the compile helper, AND
        # 3+ mixed-window wavefront bodies in one straight-line sequence
        # crash it too (probed round 4) — so the full column runs as two
        # half-windows with ONE wavefront per fori iteration (exactly one
        # lower + one upper body inline). The sublane shift across the
        # split reads the PRE-update boundary row (an aligned 8-row load
        # before the lower half mutates it); the even wavefront's
        # directions park in de_ref until the odd one packs the nibbles.
        def body(w, _):
            r = c * i32(2 * CP) + w
            xb = x_ref[half - 8:half, :][7:8]
            vb = v_ref[half - 8:half, :][7:8]
            dl = wf(r, 0, half)
            du = wf(r, half, half, boundary=(xb, vb))

            @pl.when((w & i32(1)) == i32(0))
            def _park():
                de_ref[0:half, :] = dl.astype(jnp.int8)
                de_ref[half:L, :] = du.astype(jnp.int8)

            @pl.when((w & i32(1)) == i32(1))
            def _pack():
                kp = w >> 1
                el = de_ref[0:half, :].astype(i32)
                eu = de_ref[half:L, :].astype(i32)
                cube_ref[pl.ds(kp, 1), 0:half] = \
                    (el | (dl << i32(4))).astype(jnp.int8)[None]
                cube_ref[pl.ds(kp, 1), half:L] = \
                    (eu | (du << i32(4))).astype(jnp.int8)[None]
            return i32(0)
        jax.lax.fori_loop(i32(0), i32(2 * CP), body, i32(0))

    # chunk c holds pairs [c*CP, (c+1)*CP); CP | L/4, so chunks never
    # straddle a band-phase boundary (same grouping as _dp_kernel)
    NC4 = NC // 4

    @pl.when(c < i32(NC4))
    def _lower():
        run_phase(0, half)

    @pl.when((c >= i32(NC4)) & (c < i32(3 * NC4)))
    def _full():
        if L > 1024:
            run_full_split()
        else:
            run_phase(0, L)

    @pl.when(c >= i32(3 * NC4))
    def _upper():
        run_phase(half, half)


def _dp_tb_kernel(ca_ref, cb_ref, ql_ref, tl_ref, ops_ref,
                  ii_ref, jj_ref, st_ref, *, L: int, TB: int, CP: int):
    """Traceback, grid step k = 2*CP anti-diagonal steps (descending r).

    ca_ref / cb_ref are two input views of the SAME cube: chunk NC-1-k and
    chunk NC-2-k (clamped) — sub-step s reads plane row CP-1-(s>>1) of
    ca for even s / odd s below the chunk top, and cb's top plane on the
    last odd sub-step; all rows STATIC per unrolled s. (ii, jj, state)
    carry across grid steps in scratch; op rows buffer in registers and
    flush as aligned (8, TB) tiles."""
    i32 = jnp.int32
    k = pl.program_id(0)
    NC = L // CP
    half = L // 2

    ql = ql_ref[0, :]
    tl = tl_ref[0, :]

    @pl.when(k == 0)
    def _init():
        ii_ref[:] = (tl - i32(1))[None, :]
        jj_ref[:] = (ql - i32(1))[None, :]
        st_ref[:] = jnp.zeros((1, TB), i32)

    iota8 = jax.lax.broadcasted_iota(i32, (8, TB), 0)

    def run_phase(ro, rn):
        t_idx = jax.lax.broadcasted_iota(i32, (rn, TB), 0) + i32(ro)
        ii = ii_ref[0:1, :]
        jj = jj_ref[0:1, :]
        st = st_ref[0:1, :]
        buf = jnp.full((8, TB), i32(OP_PAD), i32)

        for s in range(2 * CP):                   # static unroll
            g = k * i32(2 * CP) + i32(s)
            r = i32(2 * L - 2) - g
            m = s >> 1
            if s % 2 == 0:
                row = ca_ref[CP - 1 - m, ro:ro + rn]
                shift = i32(0)                    # r even: low nibble
            elif m < CP - 1:
                row = ca_ref[CP - 2 - m, ro:ro + rn]
                shift = i32(4)                    # r odd: high nibble
            else:
                row = cb_ref[CP - 1, ro:ro + rn]
                shift = i32(4)

            both = (ii >= 0) & (jj >= 0)
            act = ((ii + jj) == r) & ((ii >= 0) | (jj >= 0))
            pick = t_idx == jnp.clip(ii, i32(ro), i32(ro + rn - 1))
            tmp = jnp.sum(jnp.where(pick, row.astype(i32), i32(0)),
                          axis=0, keepdims=True, dtype=i32)   # [1, TB]
            tmp = (tmp >> shift) & i32(0xF)
            tmp = jnp.where(act & both, tmp, i32(0))

            s1 = jnp.where(st == 0, tmp & i32(3),
                           jnp.where(((tmp >> (st + i32(1))) & i32(1)) == 0,
                                     i32(0), st))
            s2 = jnp.where(s1 == 0, tmp & i32(3), s1)
            is_m = s2 == 0
            is_d = (s2 == 1) | (s2 == 3)
            op_main = jnp.where(is_m, i32(OP_M),
                                jnp.where(is_d, i32(OP_D), i32(OP_I)))
            op_tail = jnp.where(ii >= 0, i32(OP_D),
                                jnp.where(jj >= 0, i32(OP_I), i32(OP_PAD)))
            op = jnp.where(act, jnp.where(both, op_main, op_tail),
                           i32(OP_PAD))
            di = jnp.where(both, jnp.where(is_m | is_d, i32(1), i32(0)),
                           jnp.where(ii >= 0, i32(1), i32(0)))
            dj = jnp.where(both, jnp.where(is_m | ~is_d, i32(1), i32(0)),
                           jnp.where((ii < 0) & (jj >= 0), i32(1), i32(0)))
            acti = act.astype(i32)
            buf = jnp.where(iota8 == i32(s & 7), op, buf)
            ii = ii - di * acti
            jj = jj - dj * acti
            st = jnp.where(act & both, s2, st)
            if s & 7 == 7:
                ops_ref[(s // 8) * 8:(s // 8) * 8 + 8, :] = buf
                buf = jnp.full((8, TB), i32(OP_PAD), i32)
        ii_ref[:] = ii
        jj_ref[:] = jj
        st_ref[:] = st

    # grid steps wholly inside the top band run the [half, L) window, the
    # tail ones [0, half); boundary-straddling steps use the full column
    K1 = (L // 2 - 1) // (2 * CP)
    K2 = (3 * L // 2 - 2) // (2 * CP) + 1

    @pl.when(k < i32(K1))
    def _upper():
        run_phase(half, half)

    @pl.when((k >= i32(K1)) & (k < i32(K2)))
    def _full():
        run_phase(0, L)

    @pl.when(k >= i32(K2))
    def _lower():
        run_phase(0, half)


@partial(jax.jit, static_argnames=("L", "interpret"))
def dp_align_batch_pallas_big(q_codes, t_codes, ql, tl, L: int,
                              interpret: bool = False):
    """HBM-staged variant of dp_align_batch_pallas for 256 < L <= MAX_L_BIG.
    Same contract: reverse-order op codes with interleaved OP_PAD, uint8
    [B, 2L]. Requires L a multiple of 32 (chunk/phase grids)."""
    assert MAX_L < L <= MAX_L_BIG, f"big-kernel bucket range violated: {L}"
    assert L % 32 == 0, f"big-kernel bucket must be 32-aligned, got {L}"
    TB = _tile_b(L)
    CP = _chunk_pairs(L)
    NC = L // CP
    q_codes = q_codes.astype(jnp.int32)
    t_codes = t_codes.astype(jnp.int32)
    B0 = q_codes.shape[0]
    B = -(-B0 // TB) * TB
    if B != B0:
        padq = jnp.full((B - B0, L), WILDCARD, q_codes.dtype)
        q_codes = jnp.concatenate([q_codes, padq])
        t_codes = jnp.concatenate([t_codes, padq])
        one = jnp.ones(B - B0, ql.dtype)
        ql = jnp.concatenate([ql, one])
        tl = jnp.concatenate([tl, one])

    qrev = q_codes[:, ::-1]
    pad = jnp.full((B, L // 2), WILDCARD, jnp.int32)
    qrev_pad = jnp.concatenate([pad, qrev, pad], axis=1)   # [B, 2L]
    qT = qrev_pad.T.astype(jnp.int32)
    tT = t_codes.T.astype(jnp.int32)
    ql2 = ql.astype(jnp.int32)[None, :]
    tl2 = tl.astype(jnp.int32)[None, :]

    fwd = pl.pallas_call(
        partial(_dp_fwd_kernel, L=L, TB=TB, CP=CP),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((2 * L, TB), lambda c: (c * 0, c * 0)),
            pl.BlockSpec((L, TB), lambda c: (c * 0, c * 0)),
            pl.BlockSpec((1, TB), lambda c: (c * 0, c * 0)),
            pl.BlockSpec((1, TB), lambda c: (c * 0, c * 0)),
        ],
        out_specs=pl.BlockSpec((CP, L, TB), lambda c: (c, c * 0, c * 0)),
        out_shape=jax.ShapeDtypeStruct((L, L, TB), jnp.int8),
        scratch_shapes=[pltpu.VMEM((L, TB), jnp.int32) for _ in range(4)]
        + [pltpu.VMEM((L, TB), jnp.int8)],
        interpret=interpret,
    )
    tb = pl.pallas_call(
        partial(_dp_tb_kernel, L=L, TB=TB, CP=CP),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((CP, L, TB),
                         lambda k: (NC - 1 - k, k * 0, k * 0)),
            pl.BlockSpec((CP, L, TB),
                         lambda k: (jnp.maximum(NC - 2 - k, k * 0),
                                    k * 0, k * 0)),
            pl.BlockSpec((1, TB), lambda k: (k * 0, k * 0)),
            pl.BlockSpec((1, TB), lambda k: (k * 0, k * 0)),
        ],
        out_specs=pl.BlockSpec((2 * CP, TB), lambda k: (k, k * 0)),
        out_shape=jax.ShapeDtypeStruct((2 * L, TB), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, TB), jnp.int32) for _ in range(3)],
        interpret=interpret,
    )
    outs = []
    for ti in range(B // TB):                     # unrolled under jit
        sl = slice(ti * TB, (ti + 1) * TB)
        cube = fwd(qT[:, sl], tT[:, sl], ql2[:, sl], tl2[:, sl])
        outs.append(tb(cube, cube, ql2[:, sl], tl2[:, sl]))
    ops = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return ops.T.astype(jnp.uint8)[:B0]          # [B0, 2L]


_HW_OK = None


def hw_ok() -> bool:
    """Cached compile-probe of the kernel on the current backend."""
    global _HW_OK
    if _HW_OK is None:
        _HW_OK = probe()
    return _HW_OK


_BAD_L: set = set()     # bucket sizes whose Pallas build failed this process
_OK_L: set = set()      # bucket sizes that completed one blocking call


def make_hybrid_dp_fn():
    """dp_fn for align_fragments: Pallas for buckets with L <= MAX_L,
    lax.scan otherwise.

    hw_ok()'s probe only compiles L=128; a larger bucket's build can still
    fail independently (the packed direction cube is L^2*TB bytes of VMEM,
    4x bigger at L=256), so each bucket's first Pallas call is guarded and
    a failure pins that L to the lax.scan path for the process instead of
    crashing mid-align. The FIRST call at each L is block_until_ready'd
    inside the guard so asynchronous device-side failures (not just
    trace/compile errors) also pin the bucket rather than crashing later
    at FragmentAligner.finish()'s fetch; subsequent calls stay async. The
    scan fallback is op-code-identical so results don't depend on the
    route."""
    from gsalign_tpu.ops.dp import dp_align_batch

    def fn(q, t, ql, tl, L):
        small = L <= MAX_L and L % 16 == 0
        big = MAX_L < L <= MAX_L_BIG and L % 32 == 0
        if (small or big) and L not in _BAD_L:
            try:
                kernel = dp_align_batch_pallas if small \
                    else dp_align_batch_pallas_big
                out = kernel(q, t, ql, tl, L)
                if L not in _OK_L:
                    out.block_until_ready()
                    _OK_L.add(L)
                return out
            except Exception as e:
                import sys
                sys.stderr.write(
                    f"[dp_pallas] L={L} Pallas build/run failed, bucket "
                    f"pinned to the lax.scan path: {e}\n")
                _BAD_L.add(L)
        return dp_align_batch(q, t, ql, tl, L)
    return fn


def probe(L: int = 128, interpret: bool = False) -> bool:
    """Compile-and-run probe; False if the toolchain cannot build the
    kernel (callers then fall back to the lax.scan path)."""
    try:
        rng = np.random.default_rng(0)
        q = rng.integers(0, 4, (8, L)).astype(np.int32)
        t = q.copy()
        t[:, 5] = (t[:, 5] + 1) % 4
        ql = np.full(8, L, np.int32)
        out = np.asarray(dp_align_batch_pallas(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
            jnp.asarray(ql), L, interpret=interpret))
        return out.shape == (8, _n_steps(L))
    except Exception:
        return False
