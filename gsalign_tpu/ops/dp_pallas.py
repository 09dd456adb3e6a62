"""Pallas TPU wavefront kernel for the batched affine-gap DP forward pass.

Same recurrence and direction-byte semantics as ops/dp.py (the exact ksw2
`extz2_sse` emulation, reference src/ksw2_alignment.cpp:70-249) but with
the whole anti-diagonal loop fused into one kernel: the u/v/x/y difference
rows live in VMEM scratch across all 2L-1 wavefronts and only the
direction matrix streams out to HBM (the lockstep traceback then runs as
the existing XLA pass, ops/dp._traceback_single).

Mosaic-friendly layout (the first attempt died on SMEM scalar-vector
stacks, per-lane `.at` scatters and scalar-indexed readback): problems
ride the LANE axis (TB = 128 per tile) and DP columns ride sublanes, so
 - the per-wavefront reversed-query window is ONE sublane-dim dynamic
   slice `q_ref[pl.ds(start, L), :]` with a scalar start shared by the
   whole tile (r is global: rows past a problem's last anti-diagonal have
   an empty band and write only zeros),
 - per-problem lengths are ordinary VMEM vector inputs ([1, TB] blocks),
 - all writes are full-block or leading-dim dynamic-slice stores.
The grid is (tiles, row-chunks); scratch persists across the inner
row-chunk steps, so the direction-matrix output block stays small (RC
wavefronts) and any bucket L fits VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsalign_tpu.ops.dp import (GAP_OPEN, MAX_SC, QE2, WILDCARD,
                                _traceback_single)

MATCH = 1
MISMATCH = -1

TB = 128          # problems per tile (lane axis)
RC = 64           # wavefronts per grid step (direction-matrix block rows)


def _dp_fwd_kernel(q_ref, t_ref, ql_ref, tl_ref, d_ref,
                   u_ref, v_ref, x_ref, y_ref, *, L: int, n_rows: int):
    """One (tile, row-chunk) grid step: RC wavefronts of the recurrence.

    q_ref: [3L, TB] reversed-padded ksw-query columns (wildcard guards)
    t_ref: [L, TB]  ksw-target columns
    ql_ref/tl_ref: [1, TB] int32 lengths
    d_ref: [1, RC, L, TB] int8 direction-byte output block
    scratch u/v/x/y: [L, TB] int32, persistent across row-chunks
    """
    i32 = jnp.int32
    rc = pl.program_id(1)

    @pl.when(rc == 0)
    def _init():
        zeros = jnp.zeros((L, TB), i32)
        u_ref[:] = zeros
        v_ref[:] = zeros
        x_ref[:] = zeros
        y_ref[:] = zeros

    ql = ql_ref[0, :]                   # [TB]
    tl = tl_ref[0, :]
    t_codes = t_ref[:]                  # [L, TB]
    t_idx = jax.lax.broadcasted_iota(i32, (L, TB), 0)

    def row_body(k, _):
        r = rc.astype(i32) * i32(RC) + k   # global wavefront index (scalar)
        u = u_ref[:]
        v = v_ref[:]
        x = x_ref[:]
        y = y_ref[:]
        st0 = jnp.maximum(i32(0), r - ql + i32(1))[None, :]   # [1, TB]
        en0 = jnp.minimum(r, tl - i32(1))[None, :]

        # boundary pre-sets at t == r (top DP row), masked per problem
        in_top = r <= tl[None, :] - i32(1)
        at_r = t_idx == r
        top_val = jnp.where(r > i32(0), i32(GAP_OPEN), i32(0))
        u = jnp.where(in_top & at_r, top_val, u)
        y = jnp.where(in_top & at_r, i32(0), y)

        # s[t] = score(T[t], Q[r-t]) via the reversed-query window
        start = i32(2 * L - 1) - r
        qrr = q_ref[pl.ds(start, L), :]                    # [L, TB]
        is_wild = (t_codes >= WILDCARD) | (qrr >= WILDCARD)
        s = jnp.where(is_wild, i32(0),
                      jnp.where(t_codes == qrr, i32(MATCH), i32(MISMATCH)))

        # shifted previous-row values (t-1 lives one sublane up)
        x1 = jnp.zeros((1, TB), i32)
        v1 = jnp.broadcast_to(top_val, (1, TB)).astype(i32)
        xt1 = jnp.concatenate([x1, x[:-1, :]], axis=0)
        vt1 = jnp.concatenate([v1, v[:-1, :]], axis=0)

        z = s + i32(QE2)
        a = xt1 + vt1
        b_ = y + u
        # direction bits stay int32 in-register; the store narrows to int8
        # (Mosaic's int32->uint8 convert lowers into an infinite
        # _convert_helper recursion on this toolchain; int8 works)
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
        d = d | jnp.where(a2 > 0, i32(8), i32(0))
        d = d | jnp.where(b2 > 0, i32(0x10), i32(0))

        in_band = (t_idx >= st0) & (t_idx <= en0)
        u_ref[:] = jnp.where(in_band, u_new, u)
        v_ref[:] = jnp.where(in_band, v_new, v)
        x_ref[:] = jnp.where(in_band, x_new, x)
        y_ref[:] = jnp.where(in_band, y_new, y)
        d_ref[0, k] = jnp.where(in_band, d, i32(0)).astype(jnp.int8)
        return i32(0)

    # int32 loop bounds: under the repo-global x64 mode a default fori_loop
    # carries an int64 induction variable, and int64 inside the kernel sends
    # Mosaic's convert_element_type lowering into infinite recursion
    jax.lax.fori_loop(i32(0), i32(RC), row_body, i32(0), unroll=False)


def _fwd_kernel_fixed(q_ref, t_ref, ql_ref, tl_ref, d_ref,
                      u_ref, v_ref, x_ref, y_ref, *, L: int, n_rows: int):
    # wrapper kept for clarity of partial() naming
    _dp_fwd_kernel(q_ref, t_ref, ql_ref, tl_ref, d_ref,
                   u_ref, v_ref, x_ref, y_ref, L=L, n_rows=n_rows)


@partial(jax.jit, static_argnames=("L", "interpret"))
def dp_align_batch_pallas(q_codes, t_codes, ql, tl, L: int,
                          interpret: bool = False):
    """Drop-in replacement for ops/dp.dp_align_batch (identical outputs).

    q_codes/t_codes: int32 [B, L] (pad 4); B is padded to a TB multiple
    internally. Returns uint8 [B, 2L] reverse-order op codes.
    """
    B0 = q_codes.shape[0]
    B = -(-B0 // TB) * TB
    if B != B0:
        padq = jnp.full((B - B0, L), WILDCARD, q_codes.dtype)
        q_codes = jnp.concatenate([q_codes, padq])
        t_codes = jnp.concatenate([t_codes, padq])
        one = jnp.ones(B - B0, ql.dtype)
        ql = jnp.concatenate([ql, one])
        tl = jnp.concatenate([tl, one])
    n_rows = 2 * L - 1
    n_rc = -(-n_rows // RC)

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
        grid=(B // TB, n_rc),
        # index maps derive every constant from the grid index: under the
        # repo-global x64 mode a literal 0 traces as i64 and the mixed
        # (i64, i32) index-map return crashes the remote Mosaic compiler
        in_specs=[
            pl.BlockSpec((3 * L, TB), lambda i, r: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TB), lambda i, r: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i, r: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i, r: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RC, L, TB),
                               lambda i, r: (i, r, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, TB), jnp.int32),
            pltpu.VMEM((L, TB), jnp.int32),
        ],
    )
    d_all = pl.pallas_call(
        partial(_fwd_kernel_fixed, L=L, n_rows=n_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B // TB, n_rc * RC, L, TB),
                                       jnp.int8),
        interpret=interpret,
    )(qT, tT, ql2, tl2)

    # [B//TB, n_rc*RC, L, TB] -> [B, 2L-1, L]
    d_all = d_all[:, :n_rows]
    d_all = jnp.transpose(d_all, (0, 3, 1, 2)).reshape(B, n_rows, L)
    ops = jax.vmap(lambda d, a, b: _traceback_single(d, a, b, L))(
        d_all, ql.astype(jnp.int32), tl.astype(jnp.int32))
    return ops[:B0]


def make_dp_fn(interpret: bool = False):
    """dp_fn for ops/dp.align_fragments (same call signature)."""
    def fn(q, t, ql, tl, L):
        return dp_align_batch_pallas(q, t, ql, tl, L, interpret=interpret)
    return fn


def probe(interpret: bool = False) -> bool:
    """Compile-and-run probe on a tiny batch; False if the toolchain cannot
    build the kernel (callers then fall back to the lax.scan path)."""
    try:
        rng = np.random.default_rng(0)
        L = 64
        q = rng.integers(0, 4, (8, L)).astype(np.int32)
        t = q.copy()
        t[:, 5] = (t[:, 5] + 1) % 4
        ql = np.full(8, L, np.int32)
        out = dp_align_batch_pallas(jnp.asarray(q), jnp.asarray(t),
                                    jnp.asarray(ql), jnp.asarray(ql), L,
                                    interpret=interpret)
        return np.asarray(out).shape == (8, 2 * L)
    except Exception:
        return False
