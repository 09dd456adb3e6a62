"""Masked per-row DMA gather: pay per NEEDED row, not per table sweep.

XLA lowers a TPU gather as a whole-table scan/select: every call costs
~table_bytes / 500 GB/s regardless of how few rows it reads (measured, see
README "gather cost model"). The seeding scan needs ONE suffix-array word
per lane, only on the iteration a lane's interval becomes unique — but the
ride-along slot in the comb_pairs gather made every iteration sweep the
whole SA plane (~800 MB at 100 Mb scale, the single largest per-iteration
cost). This kernel instead issues one scalar-core DMA per needed row and
skips masked-off rows for free, so the cost tracks the handful of
direct-mode entries per iteration instead of the table size.

Mosaic constraints shape the design: 1-D HBM refs slice at 1024-element
granularity, so each DMA fetches the aligned 1024-word block containing its
element into a VMEM scratch row (4 KB each, waves of 8 in flight), and the
wanted words are picked post-loop with one vectorized one-hot select. The
caller compacts the needy lanes to the fixed K slots (see seeding). All
in-kernel indices are pinned int32 (x64 literals break Mosaic lowering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WAVE = 8
_BLK = 1024          # 1-D HBM slice granularity (int32 words)


def _kernel(idx_smem, idx_vec, table_ref, out_ref, scratch, sems):
    # table/scratch are 3-D (blocks, 8, 128): the (8, 128) minor dims
    # satisfy VMEM/HBM tiling, and single-BLOCK slices ride the free
    # leading dim (1-D refs may only slice at 1024-word granularity and
    # 2-D rows break the 8-row tile).
    i32 = jnp.int32
    K = out_ref.shape[0]

    def wave(w, _):
        base = w * i32(_WAVE)

        def get_dma(k):
            i = base + i32(k)
            ix = idx_smem[i]
            blk = jnp.maximum(ix, i32(0)) // i32(_BLK)
            return ix, pltpu.make_async_copy(
                table_ref.at[blk], scratch.at[i], sems.at[i32(k)])

        for k in range(_WAVE):
            ix, dma = get_dma(k)

            @pl.when(ix >= 0)
            def _(dma=dma):
                dma.start()
        for k in range(_WAVE):
            ix, dma = get_dma(k)

            @pl.when(ix >= 0)
            def _(dma=dma):
                dma.wait()
        return i32(0)

    jax.lax.fori_loop(0, i32(K // _WAVE), wave, i32(0), unroll=False)
    cols3 = idx_vec[:]                                      # [K, 8, 128] i32
    sub = jax.lax.broadcasted_iota(i32, (K, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(i32, (K, 8, 128), 2)
    j = cols3 & i32(_BLK - 1)
    # validity folds into the one-hot (cols3 < 0 rows pick nothing), so no
    # 1-D vector compare or (K,1,1) broadcast is needed (Mosaic rejects
    # both the reshape and multi-axis reductions)
    hit = (cols3 >= 0) & (sub == (j >> i32(7))) & (lane == (j & i32(127)))
    picked = jnp.sum(jnp.sum(jnp.where(hit, scratch[:], i32(0)), axis=2,
                             dtype=jnp.int32), axis=1, dtype=jnp.int32)
    out_ref[:] = picked


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_row_gather(table: jnp.ndarray, idx: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """out[i] = table[idx[i]] where idx[i] >= 0 else 0. int32 only.

    idx length K must be a multiple of 8; table length must be a multiple
    of 1024 with every valid idx < len(table) (pad tables with pad_table).
    """
    assert table.dtype == jnp.int32 and idx.dtype == jnp.int32
    K = idx.shape[0]
    assert K % _WAVE == 0 and table.shape[0] % _BLK == 0
    t3d = table.reshape(-1, 8, 128)
    cols3 = jnp.broadcast_to(idx[:, None, None], (K, 8, 128))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((K,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, 8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((_WAVE,))],
        interpret=interpret,
    )(idx, cols3, t3d)


def pad_table(arr, dtype=None):
    """Pad a 1-D array to the kernel's 1024-word block granularity."""
    import numpy as np
    n = arr.shape[0]
    want = -(-n // _BLK) * _BLK
    if dtype is None:
        dtype = arr.dtype
    if want == n and arr.dtype == dtype:
        return np.ascontiguousarray(arr, dtype=dtype)
    out = np.zeros(want, dtype=dtype)
    out[:n] = arr
    return out


_probe_result = None


def probe() -> bool:
    """Can the masked gather compile AND run on the current backend?"""
    global _probe_result
    if _probe_result is None:
        try:
            import numpy as np
            t = jnp.arange(4096, dtype=jnp.int32)
            ix = jnp.asarray([5, -1, 4000, 7, -1, 0, 1023, 1024], jnp.int32)
            out = np.asarray(masked_row_gather(t, ix))
            _probe_result = bool(
                (out == np.asarray([5, 0, 4000, 7, 0, 0, 1023, 1024])).all())
        except Exception:
            _probe_result = False
    return _probe_result
