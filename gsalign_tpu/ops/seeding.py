"""Batched LMEM seeding.

The reference walks each 10 kb query chunk sequentially, extending an exact
match through the FM-index one base at a time and restarting after each
emitted seed (src/GSAlign.cpp:51-107, src/bwt_search.cpp:141-185). Chunks are
mutually independent (extension is clipped at the chunk boundary:
BWT_Search's `stop`), so chunks become device lanes here: every lane runs the
same one-base state machine per iteration of a lax.while_loop, and a batched
occ4 pair serves all lanes at once.

Lane state machine (exact emulation of IdentifyLocalMEM + BWT_Search):
  INIT: read code[cursor]; ambiguous -> cursor+1; else start extension.
  EXT:  extend by one base; on boundary/ambiguous/dead-end finalize:
        len = ext_pos - ext_start;
        hit iff len >= min_seed_length and 0 < freq <= max_seed_freq;
        hit  -> emit (qPos, len, rank_start, freq); cursor = ext_start +
                (sensitive ? 5 : len+1)
        miss -> cursor = ext_start + 1.
Lane done when cursor >= stop in INIT phase.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsalign_tpu.ops import rank as rank_ops
from gsalign_tpu.ops.rank import DeviceFMIndex

PHASE_INIT = 0
PHASE_EXT = 1


@partial(jax.jit, static_argnames=("min_seed_length", "max_seed_freq",
                                   "sensitive", "max_out"))
def _seed_scan(dfm: DeviceFMIndex,
               qcodes: jnp.ndarray,      # uint8/int32 [Lpad] (pad value 4)
               starts: jnp.ndarray,      # int32 [B]
               stops: jnp.ndarray,       # int32 [B]
               min_seed_length: int,
               max_seed_freq: int,
               sensitive: bool,
               max_out: int):
    B = starts.shape[0]
    i32 = jnp.int32
    qcodes = qcodes.astype(i32)
    Lpad = qcodes.shape[0]

    def code_at(pos):
        return qcodes[jnp.clip(pos, 0, Lpad - 1)]

    init_state = dict(
        phase=jnp.zeros(B, i32),
        cursor=starts.astype(i32),
        ext_start=jnp.zeros(B, i32),
        ext_pos=jnp.zeros(B, i32),
        ik0=jnp.zeros(B, i32), ik1=jnp.zeros(B, i32), ik2=jnp.zeros(B, i32),
        out=jnp.zeros((B, max_out, 4), i32),     # (qPos, len, k0, freq)
        out_n=jnp.zeros(B, i32),
    )

    def lane_done(s):
        return (s["phase"] == PHASE_INIT) & (s["cursor"] >= stops)

    def cond(s):
        return ~jnp.all(lane_done(s))

    def body(s):
        phase, cursor = s["phase"], s["cursor"]
        ext_start, ext_pos = s["ext_start"], s["ext_pos"]
        ik0, ik1, ik2 = s["ik0"], s["ik1"], s["ik2"]

        in_init = (phase == PHASE_INIT) & (cursor < stops)
        in_ext = phase == PHASE_EXT

        # ---- INIT step ----
        c0 = code_at(cursor)
        init_amb = c0 > 3
        n_ik0, n_ik1, n_ik2 = rank_ops.init_interval(dfm, jnp.clip(c0, 0, 3))

        # ---- EXT step: one forward extension (computed for all lanes) ----
        nt = code_at(ext_pos)
        e_ik0, e_ik1, e_ik2 = rank_ops.extend_forward(
            dfm, ik0, ik1, ik2, jnp.clip(nt, 0, 3))
        hit_boundary = ext_pos >= stops
        hit_amb = nt > 3
        dead_end = e_ik2 == 0
        finalize = in_ext & (hit_boundary | hit_amb | dead_end)
        ext_ok = in_ext & ~finalize

        # ---- finalize ----
        length = ext_pos - ext_start
        freq = ik2
        is_hit = finalize & (length >= min_seed_length) & (freq > 0) & \
            (freq <= max_seed_freq)
        advance = jnp.where(
            is_hit,
            ext_start + (5 if sensitive else 0) +
            (0 if sensitive else 1) * (length + 1),
            ext_start + 1)

        # emit into per-lane buffers (one packed scatter)
        slot = jnp.minimum(s["out_n"], max_out - 1)
        do_emit = is_hit & (s["out_n"] < max_out)
        rows = jnp.arange(B)
        record = jnp.stack([ext_start, length, ik0, freq], axis=1)  # [B,4]
        old = s["out"][rows, slot]
        out = s["out"].at[rows, slot].set(
            jnp.where(do_emit[:, None], record, old))
        out_n = s["out_n"] + do_emit.astype(i32)

        # ---- state updates ----
        start_ext = in_init & ~init_amb
        new_phase = jnp.where(start_ext, PHASE_EXT,
                              jnp.where(finalize, PHASE_INIT, phase))
        new_cursor = jnp.where(in_init & init_amb, cursor + 1,
                               jnp.where(finalize, advance, cursor))
        new_ext_start = jnp.where(start_ext, cursor, ext_start)
        new_ext_pos = jnp.where(start_ext, cursor + 1,
                                jnp.where(ext_ok, ext_pos + 1, ext_pos))
        new_ik0 = jnp.where(start_ext, n_ik0, jnp.where(ext_ok, e_ik0, ik0))
        new_ik1 = jnp.where(start_ext, n_ik1, jnp.where(ext_ok, e_ik1, ik1))
        new_ik2 = jnp.where(start_ext, n_ik2, jnp.where(ext_ok, e_ik2, ik2))

        return dict(
            phase=new_phase, cursor=new_cursor,
            ext_start=new_ext_start, ext_pos=new_ext_pos,
            ik0=new_ik0, ik1=new_ik1, ik2=new_ik2,
            out=out, out_n=out_n,
        )

    final = jax.lax.while_loop(cond, body, init_state)
    o = final["out"]
    return o[:, :, 0], o[:, :, 1], o[:, :, 2], o[:, :, 3], final["out_n"]


def find_seeds_all(dfm: DeviceFMIndex,
                   codes_list,
                   min_seed_length: int = 15,
                   max_seed_freq: int = 100,
                   sensitive: bool = False,
                   chunk: int = 10000,
                   mesh=None):
    """Seed ALL query chromosomes in one device scan.

    Each chromosome occupies a chunk-aligned region of one concatenated
    lane space; per-lane stops enforce the chromosome boundary so results
    are identical to per-chromosome calls. Returns a list of
    (q_pos, r_pos, length) tuples, one per chromosome, each sorted by
    (PosDiff, qPos)."""
    offs = []
    lane_starts = []
    lane_stops = []
    off = 0
    for codes in codes_list:
        L = int(codes.shape[0])
        n_lanes = max(1, -(-L // chunk))
        offs.append(off)
        s = off + np.arange(n_lanes, dtype=np.int64) * chunk
        lane_starts.append(s)
        lane_stops.append(np.minimum(s + chunk, off + L))
        off += n_lanes * chunk
    total = off
    qc = np.full(total, 4, dtype=np.uint8)
    for codes, o in zip(codes_list, offs):
        qc[o:o + len(codes)] = codes
    starts = np.concatenate(lane_starts).astype(np.int32)
    stops = np.concatenate(lane_stops).astype(np.int32)
    if mesh is not None:
        from gsalign_tpu.parallel import mesh as mesh_lib
        n_dev = mesh.devices.size
        want = mesh_lib.pad_to_multiple(len(starts), n_dev)
        if want != len(starts):
            pad = np.full(want - len(starts), total, dtype=np.int32)
            starts = np.concatenate([starts, pad - 1])
            stops = np.concatenate([stops, pad - 1])
        dfm = mesh_lib.shard_index(dfm, mesh)
        qc_dev = jax.device_put(jnp.asarray(qc), mesh_lib.replicated(mesh))
        starts_dev = mesh_lib.shard_lanes(starts, mesh, 0)
        stops_dev = mesh_lib.shard_lanes(stops, mesh, 0)
    else:
        qc_dev = jnp.asarray(qc)
        starts_dev = jnp.asarray(starts)
        stops_dev = jnp.asarray(stops)

    max_out = chunk // (5 if sensitive else (min_seed_length + 1)) + 2
    out_q, out_len, out_k0, out_freq, out_n = _seed_scan(
        dfm, qc_dev, starts_dev, stops_dev,
        min_seed_length=min_seed_length, max_seed_freq=max_seed_freq,
        sensitive=sensitive, max_out=max_out)
    q_pos, r_pos, length = _expand_hits(dfm, out_q, out_len, out_k0,
                                        out_freq, out_n)
    # split back per chromosome and rebase q_pos
    results = []
    for codes, o in zip(codes_list, offs):
        L = int(codes.shape[0])
        m = (q_pos >= o) & (q_pos < o + L)
        qp = q_pos[m] - o
        rp = r_pos[m]
        ln = length[m]
        pd = rp - qp
        order = np.lexsort((qp, pd))
        results.append((qp[order], rp[order], ln[order]))
    return results


def _expand_hits(dfm, out_q, out_len, out_k0, out_freq, out_n):
    """Flatten per-lane hit buffers and resolve occurrence positions."""
    out_q = np.asarray(out_q)
    out_len = np.asarray(out_len)
    out_k0 = np.asarray(out_k0)
    out_freq = np.asarray(out_freq)
    out_n = np.asarray(out_n)
    lane_idx, slot_idx = np.nonzero(
        np.arange(out_q.shape[1])[None, :] < out_n[:, None])
    if lane_idx.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    qs = out_q[lane_idx, slot_idx]
    ls = out_len[lane_idx, slot_idx]
    k0 = out_k0[lane_idx, slot_idx]
    fr = out_freq[lane_idx, slot_idx]
    total = int(fr.sum())
    rep = np.repeat(np.arange(qs.shape[0]), fr)
    offset = np.arange(total) - np.repeat(np.cumsum(fr) - fr, fr)
    ranks = (k0[rep] + offset).astype(np.int32)
    # pad to a power of two so resolve_sa compiles once per size class
    want = 1 << max(6, int(np.ceil(np.log2(total))))
    ranks_pad = np.full(want, ranks[0], dtype=np.int32)
    ranks_pad[:total] = ranks
    r_pos = np.asarray(rank_ops.resolve_sa(
        dfm, jnp.asarray(ranks_pad)))[:total].astype(np.int64)
    return qs[rep].astype(np.int64), r_pos, ls[rep].astype(np.int64)


def find_seeds(dfm: DeviceFMIndex,
               query_codes: np.ndarray,
               min_seed_length: int = 15,
               max_seed_freq: int = 100,
               sensitive: bool = False,
               chunk: int = 10000,
               pad_to: int | None = None,
               mesh=None,
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Find all LMEM seeds of one query chromosome.

    Returns (q_pos, r_pos, length) int64 arrays sorted by
    (PosDiff, qPos) — the order SeedVec holds after the locked merge in
    IdentifyLocalMEM (src/GSAlign.cpp:95-104, CompByPosDiff).

    With a mesh, the lane axis is sharded over its "frag" axis and the
    FM-index is replicated (see parallel/mesh.py).
    """
    L = int(query_codes.shape[0])
    n_lanes = max(1, -(-L // chunk))
    if pad_to is not None:
        n_lanes = max(n_lanes, -(-pad_to // chunk))
    if mesh is not None:
        from gsalign_tpu.parallel import mesh as mesh_lib
        n_lanes = mesh_lib.pad_to_multiple(n_lanes, mesh.devices.size)
    Lpad = n_lanes * chunk
    qc = np.full(Lpad, 4, dtype=np.uint8)
    qc[:L] = query_codes
    starts = np.arange(n_lanes, dtype=np.int32) * chunk
    stops = np.minimum(starts + chunk, L).astype(np.int32)
    stops = np.maximum(stops, starts)  # lanes past L: empty

    if mesh is not None:
        from gsalign_tpu.parallel import mesh as mesh_lib
        dfm = mesh_lib.shard_index(dfm, mesh)
        qc_dev = jax.device_put(jnp.asarray(qc), mesh_lib.replicated(mesh))
        starts_dev = mesh_lib.shard_lanes(starts, mesh, 0)
        stops_dev = mesh_lib.shard_lanes(stops, mesh, 0)
    else:
        qc_dev = jnp.asarray(qc)
        starts_dev = jnp.asarray(starts)
        stops_dev = jnp.asarray(stops)

    max_out = chunk // (5 if sensitive else (min_seed_length + 1)) + 2
    out = _seed_scan(
        dfm, qc_dev, starts_dev, stops_dev,
        min_seed_length=min_seed_length, max_seed_freq=max_seed_freq,
        sensitive=sensitive, max_out=max_out)
    q_pos, r_pos, length = _expand_hits(dfm, *out)
    pos_diff = r_pos - q_pos
    order = np.lexsort((q_pos, pos_diff))
    return q_pos[order], r_pos[order], length[order]
