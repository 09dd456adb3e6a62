"""Pallas TPU wavefront kernel for the batched affine-gap DP.

Same recurrence and direction-byte semantics as ops/dp.py (the exact ksw2
`extz2_sse` emulation, reference src/ksw2_alignment.cpp:70-249) but fused
into ONE kernel per problem tile: the anti-diagonal loop, the direction
matrix, and the lockstep traceback all stay in VMEM, so a whole DP bucket is
a single device launch and only the op codes leave the chip.

Grid: one program per tile of TB problems. Scratch: u/v/x/y rows [TB, L]
int32 and the direction matrix [2L-1, TB, L] uint8 (VMEM-resident; buckets
with L <= ~1024 — larger problems fall back to ops/dp.py's lax.scan path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsalign_tpu.ops.dp import (GAP_OPEN, MAX_SC, OP_D, OP_I, OP_M, OP_PAD,
                                QE2, WILDCARD)

MATCH = 1
MISMATCH = -1


def _dp_kernel(ql_all, tl_all, q_ref, t_ref, ops_ref,
               u_ref, v_ref, x_ref, y_ref, d_ref, L: int, TB: int):
    """One tile: forward wavefront then lockstep traceback.

    ql_all/tl_all: [B] int32 scalar-prefetch (SMEM, whole batch)
    q_ref: [TB, 3L] reversed-padded ksw-query rows (wildcard guards)
    t_ref: [TB, L]  ksw-target rows
    ops_ref: [TB, 2L] uint8 output, reverse-order ops
    """
    i32 = jnp.int32

    u_ref[:] = jnp.zeros((TB, L), i32)
    v_ref[:] = jnp.zeros((TB, L), i32)
    x_ref[:] = jnp.zeros((TB, L), i32)
    y_ref[:] = jnp.zeros((TB, L), i32)

    tile = pl.program_id(0)
    # SMEM only serves scalar loads: read the tile's lengths one by one
    ql = jnp.stack([ql_all[tile * TB + b] for b in range(TB)])
    tl = jnp.stack([tl_all[tile * TB + b] for b in range(TB)])
    t_codes = t_ref[:]                  # [TB, L]
    t_idx = jax.lax.broadcasted_iota(i32, (TB, L), 1)

    def row_body(r, _):
        u = u_ref[:]
        v = v_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        r_eff = jnp.minimum(r, ql + tl - 2)            # [TB]
        st0 = jnp.maximum(0, r_eff - ql + 1)
        en0 = jnp.minimum(r_eff, tl - 1)

        # boundary pre-sets at t = r_eff (top DP row), masked per problem
        in_top = (r_eff <= tl - 1)[:, None]
        at_r = t_idx == r_eff[:, None]
        u = jnp.where(in_top & at_r,
                      jnp.where(r_eff[:, None] > 0, GAP_OPEN, 0), u)
        y = jnp.where(in_top & at_r, 0, y)

        # s[t] = score(T[t], Q[r-t]) via the reversed-query gather
        qrr = jnp.zeros((TB, L), i32)
        for b in range(TB):
            start = 2 * L - 1 - r_eff[b]
            qrr = qrr.at[b, :].set(q_ref[b, pl.ds(start, L)])
        is_wild = (t_codes >= WILDCARD) | (qrr >= WILDCARD)
        s = jnp.where(is_wild, 0,
                      jnp.where(t_codes == qrr, MATCH, MISMATCH)).astype(i32)

        # shifted previous-row values
        x1 = jnp.zeros((TB, 1), i32)
        v1 = jnp.where(r_eff[:, None] > 0, i32(GAP_OPEN), 0)
        xt1 = jnp.concatenate([x1, x[:, :-1]], axis=1)
        vt1 = jnp.concatenate([v1, v[:, :-1]], axis=1)

        z = s + QE2
        a = xt1 + vt1
        b_ = y + u
        d = jnp.where(a > z, 1, 0).astype(jnp.uint8)
        z = jnp.maximum(z, a)
        d = jnp.where(b_ > z, jnp.uint8(2), d)
        z = jnp.maximum(z, b_)
        z = jnp.minimum(z, MAX_SC)
        u_new = z - vt1
        v_new = z - u
        z2 = z - GAP_OPEN
        a2 = a - z2
        b2 = b_ - z2
        x_new = jnp.maximum(a2, 0)
        y_new = jnp.maximum(b2, 0)
        d = d | jnp.where(a2 > 0, jnp.uint8(8), jnp.uint8(0))
        d = d | jnp.where(b2 > 0, jnp.uint8(0x10), jnp.uint8(0))

        in_band = (t_idx >= st0[:, None]) & (t_idx <= en0[:, None])
        u_ref[:] = jnp.where(in_band, u_new, u)
        v_ref[:] = jnp.where(in_band, v_new, v)
        x_ref[:] = jnp.where(in_band, x_new, x)
        y_ref[:] = jnp.where(in_band, y_new, y)
        d_ref[r, :, :] = jnp.where(in_band, d, jnp.uint8(0))
        return 0

    jax.lax.fori_loop(0, 2 * L - 1, row_body, 0)

    # ---- lockstep traceback (ksw_backtrack, full band: no forcing) ----
    ops_ref[:] = jnp.full((TB, 2 * L), OP_PAD, jnp.uint8)

    def tb_body(step, carry):
        ii, jj, state = carry          # [TB] each
        both = (ii >= 0) & (jj >= 0)
        r = jnp.clip(ii + jj, 0, 2 * L - 2)
        ic = jnp.clip(ii, 0, L - 1)
        tmp = jnp.zeros((TB,), i32)
        for b in range(TB):
            tmp = tmp.at[b].set(
                d_ref[pl.ds(r[b], 1), b, pl.ds(ic[b], 1)][0, 0].astype(i32))
        tmp = jnp.where(both, tmp, 0)
        s1 = jnp.where(state == 0, tmp & 7,
                       jnp.where(((tmp >> (state + 2)) & 1) == 0, 0, state))
        s2 = jnp.where(s1 == 0, tmp & 7, s1)
        is_m = s2 == 0
        is_d = (s2 == 1) | (s2 == 3)
        op_main = jnp.where(is_m, OP_M, jnp.where(is_d, OP_D, OP_I))
        op_tail = jnp.where(ii >= 0, OP_D, jnp.where(jj >= 0, OP_I, OP_PAD))
        op = jnp.where(both, op_main, op_tail).astype(jnp.uint8)
        di = jnp.where(both, jnp.where(is_m | is_d, 1, 0),
                       jnp.where(ii >= 0, 1, 0))
        dj = jnp.where(both, jnp.where(is_m | ~is_d, 1, 0),
                       jnp.where((ii < 0) & (jj >= 0), 1, 0))
        col = jax.lax.broadcasted_iota(i32, (TB, 2 * L), 1)
        ops_ref[:] = jnp.where(col == step, op[:, None], ops_ref[:])
        return ii - di, jj - dj, jnp.where(both, s2, state)

    jax.lax.fori_loop(0, 2 * L, tb_body,
                      (tl - 1, ql - 1, jnp.zeros((TB,), i32)))


@partial(jax.jit, static_argnames=("L", "TB", "interpret"))
def dp_align_batch_pallas(q_codes, t_codes, ql, tl, L: int, TB: int = 8,
                          interpret: bool = False):
    """Drop-in replacement for ops/dp.dp_align_batch (identical outputs).

    q_codes/t_codes: int32 [B, L] (pad 4); B must be a multiple of TB.
    Returns uint8 [B, 2L] reverse-order op codes.
    """
    B = q_codes.shape[0]
    assert B % TB == 0
    qrev = q_codes[:, ::-1]
    pad = jnp.full((B, L), WILDCARD, jnp.int32)
    qrev_pad = jnp.concatenate([pad, qrev, pad], axis=1)   # [B, 3L]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, 3 * L), lambda i, *_: (i, 0)),
            pl.BlockSpec((TB, L), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TB, 2 * L), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((TB, L), jnp.int32),
            pltpu.VMEM((TB, L), jnp.int32),
            pltpu.VMEM((TB, L), jnp.int32),
            pltpu.VMEM((TB, L), jnp.int32),
            pltpu.VMEM((2 * L - 1, TB, L), jnp.uint8),
        ],
    )
    return pl.pallas_call(
        partial(_dp_kernel, L=L, TB=TB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2 * L), jnp.uint8),
        interpret=interpret,
    )(ql.astype(jnp.int32), tl.astype(jnp.int32),
      qrev_pad, t_codes.astype(jnp.int32))


def make_dp_fn(TB: int = 8, interpret: bool = False):
    """dp_fn for ops/dp.align_fragments: pads the batch to a TB multiple."""
    def fn(q, t, ql, tl, L):
        B = q.shape[0]
        want = -(-B // TB) * TB
        if want != B:
            padq = jnp.full((want - B, L), WILDCARD, q.dtype)
            q = jnp.concatenate([q, padq])
            t = jnp.concatenate([t, padq])
            one = jnp.ones(want - B, ql.dtype)
            ql = jnp.concatenate([ql, one])
            tl = jnp.concatenate([tl, one])
        out = dp_align_batch_pallas(q, t, ql, tl, L, TB=TB,
                                    interpret=interpret)
        return out[:B]
    return fn
