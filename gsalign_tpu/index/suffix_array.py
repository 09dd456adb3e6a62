"""Suffix array construction by prefix doubling.

Replaces the reference's incremental BWT-SW builder + Larsson-Sadakane sorter
(src/BWT_Index/bwt_gen.c, src/BWT_Index/QSufSort.c) with a device-friendly
prefix-doubling build: O(log n) rounds of (stable sort by (rank, rank[i+h]),
re-rank), which is the natural XLA formulation — each round is one large sort
plus elementwise scans, all static shapes. The incremental-merge design of
bwt_gen.c exists only to bound 2008-era RAM and is deliberately not ported.

The returned suffix array is over T$ (text plus a unique smallest sentinel):
sa[0] == n always, and sa has n+1 entries.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _initial_rank_np(t: np.ndarray, k: int = 8) -> np.ndarray:
    """Rank of the k-gram starting at each position (3 bits per symbol)."""
    n = t.shape[0]
    key = np.zeros(n, dtype=np.int64)
    for j in range(min(k, n)):
        shifted = np.zeros(n, dtype=np.int64)
        shifted[: n - j] = t[j:]
        key = (key << 3) | shifted
    order = np.argsort(key, kind="stable")
    ks = key[order]
    neq = np.zeros(n, dtype=np.int64)
    neq[1:] = ks[1:] != ks[:-1]
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.cumsum(neq)
    return rank


def build_suffix_array_np(codes: np.ndarray) -> np.ndarray:
    """Numpy prefix-doubling suffix array of codes+sentinel. Returns int64[n+1]."""
    n = int(codes.shape[0]) + 1
    t = np.zeros(n, dtype=np.int64)
    t[:-1] = codes.astype(np.int64) + 1
    rank = _initial_rank_np(t, k=8)
    h = 8
    order = np.argsort(rank, kind="stable")
    while rank[order[-1]] != n - 1:
        key2 = np.zeros(n, dtype=np.int64)
        key2[: n - h] = rank[h:]
        order = np.lexsort((key2, rank))
        r_s, k_s = rank[order], key2[order]
        neq = np.zeros(n, dtype=np.int64)
        neq[1:] = (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.cumsum(neq)
        h *= 2
    return order.astype(np.int64)


def _build_sa_jax(t: jnp.ndarray) -> jnp.ndarray:
    """JIT-compiled prefix doubling over int32 ranks (n+1 < 2^31)."""
    n = t.shape[0]
    key = jnp.zeros(n, dtype=jnp.int64)
    for j in range(min(8, n)):
        shifted = jnp.zeros(n, dtype=jnp.int64).at[: n - j].set(t[j:].astype(jnp.int64))
        key = (key << 3) | shifted
    order = jnp.argsort(key)
    ks = key[order]
    neq = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           (ks[1:] != ks[:-1]).astype(jnp.int32)])
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.cumsum(neq, dtype=jnp.int32))

    def cond(state):
        rank, order, h = state
        return rank[order[-1]] != n - 1

    def body(state):
        rank, order, h = state
        idx = jnp.arange(n, dtype=jnp.int32) + h
        key2 = jnp.where(idx < n, rank[jnp.minimum(idx, n - 1)], 0)
        combined = rank.astype(jnp.int64) * jnp.int64(n + 1) + key2.astype(jnp.int64)
        order = jnp.argsort(combined)
        cs = combined[order]
        neq = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               (cs[1:] != cs[:-1]).astype(jnp.int32)])
        rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.cumsum(neq, dtype=jnp.int32))
        return rank, order, h * 2

    state = (rank, order, jnp.int32(8))
    _, order, _ = jax.lax.while_loop(cond, body, state)
    return order


def build_suffix_array_jax(codes: np.ndarray) -> np.ndarray:
    """Device prefix-doubling suffix array. Returns int64[n+1] on host.

    Uses int32 ranks + int64 combined sort keys; valid for n+1 < 2^31
    (fwd+RC text up to ~1 Gbp genomes — larger genomes need the sharded
    multi-host build, see parallel/).
    """
    n = int(codes.shape[0]) + 1
    if n >= (1 << 31):
        raise NotImplementedError("single-device SA build limited to n < 2^31")
    t = np.zeros(n, dtype=np.int32)
    t[:-1] = codes.astype(np.int32) + 1
    order = np.asarray(jax.jit(_build_sa_jax)(jnp.asarray(t)))
    return order.astype(np.int64)


def build_suffix_array_native(codes: np.ndarray):
    """O(n) SA-IS via the native library (native/sais.cpp); None if absent."""
    from gsalign_tpu import native_lib
    n = int(codes.shape[0])
    t = np.empty(n + 1, dtype=np.uint8)
    t[:n] = codes + 1
    t[n] = 0
    return native_lib.sais(t)


def build_suffix_array(codes: np.ndarray, prefer_device: bool = True) -> np.ndarray:
    """Preference order: native SA-IS (fastest, O(n), any size) -> device
    prefix doubling -> numpy prefix doubling."""
    sa = build_suffix_array_native(codes)
    if sa is not None:
        return sa
    if prefer_device and codes.shape[0] >= (1 << 16):
        try:
            return build_suffix_array_jax(codes)
        except NotImplementedError:
            pass
    return build_suffix_array_np(codes)
