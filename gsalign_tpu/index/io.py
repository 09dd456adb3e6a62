"""Index artifact persistence.

One .npz + JSON manifest replaces the reference's five-file format
(.pac/.ann/.amb/.bwt/.sa — src/BWT_Index/bntseq.c:59-89, bwt.c:174-196).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np

from gsalign_tpu.genome.packing import Genome, Hole
from gsalign_tpu.index.fmindex import FMIndex

FORMAT_VERSION = 7     # v7: small-genome indexes omit the c12 planes


def save_index(fm: FMIndex, prefix: str) -> None:
    g = fm.genome
    if g is None:
        raise ValueError("FMIndex has no genome attached")
    # A per-build nonce is stored in BOTH files and cross-checked at load:
    # overwriting an existing index is two renames, so a reader (or crash)
    # between them could otherwise pair the new .npz with the old manifest.
    nonce = uuid.uuid4().hex
    manifest = {
        "format_version": FORMAT_VERSION,
        "build_nonce": nonce,
        "seq_len": fm.seq_len,
        "primary": fm.primary,
        "sa_intv": fm.sa_intv,
        "names": g.names,
        "seed": g.seed,
        "holes": [[h.offset, h.length, h.amb] for h in g.holes],
    }
    # The c12 jump table is [4^12, 2] int64 = 268 MB regardless of genome
    # size; its starts column is cumsum(counts) plus <= 13 short-suffix +1
    # steps (fmindex._build_c12), so persist only the counts (uint32 unless
    # a single 12-mer exceeds 2^32 occurrences) and the step positions.
    # Small-genome indexes carry no c12 at all (fmindex.build_fmindex skips
    # it below INIT12_MIN_SEQLEN); its absence from the .npz round-trips.
    extra = {}
    if fm.c12 is not None:
        from gsalign_tpu.index.fmindex import c12_step_keys
        counts = fm.c12[:, 1]
        extra["c12_steps"] = c12_step_keys(fm.c12)
        cdt = (np.int64 if counts.size and int(counts.max()) >= 2 ** 32
               else np.uint32)
        nz = np.nonzero(counts)[0]
        if nz.size * 2 < counts.size:   # sparse beats a dense 4 B/key plane
            extra["c12_idx"] = nz.astype(np.int32)
            extra["c12_val"] = counts[nz].astype(cdt)
        else:
            extra["c12_sz"] = counts.astype(cdt)
    # Atomic publish: the .npz write takes minutes at 250 Mb+ scale and a
    # concurrent reader gates loadability on the manifest, so write both
    # files to UNIQUE tmp names (two concurrent writers on one prefix must
    # not clobber each other's tmp) and rename — npz first, manifest LAST.
    # A reader then sees either the complete new artifact or none of it;
    # the nonce cross-check at load catches the overwrite race above.
    tmp_npz = f"{prefix}.tmp.{nonce}.npz"   # ends in .npz so savez won't rename
    np.savez(
        tmp_npz,
        build_nonce=np.frombuffer(nonce.encode(), dtype=np.uint8),
        l2=fm.l2, bwt_packed=fm.bwt_packed, occ_cp=fm.occ_cp,
        sa_samples=fm.sa_samples, codes_fwd=g.codes_fwd,
        lengths=g.lengths, offsets=g.offsets,
        t3_packed=fm.t3_packed, t3_cp=fm.t3_cp, c64=fm.c64,
        t3_exc_pos=fm.t3_exc_pos, t3_exc_chr=fm.t3_exc_chr, c8=fm.c8,
        **extra,
    )
    os.replace(tmp_npz, prefix + ".npz")
    tmp_json = f"{prefix}.json.tmp.{nonce}"
    with open(tmp_json, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp_json, prefix + ".json")


def index_exists(prefix: str) -> bool:
    return os.path.exists(prefix + ".json") and os.path.exists(prefix + ".npz")


def index_loadable(prefix: str) -> bool:
    """index_exists AND the artifact is the CURRENT format version — callers
    that silently rebuild caches (bench, profiling) use this so a format
    bump reads as "absent"; the CLI keeps index_exists + load so a stale
    user index still aborts with the informative format error."""
    if not index_exists(prefix):
        return False
    try:
        with open(prefix + ".json") as fh:
            return json.load(fh).get("format_version") == FORMAT_VERSION
    except (OSError, ValueError):
        return False


def load_index(prefix: str) -> FMIndex:
    with open(prefix + ".json") as fh:
        manifest = json.load(fh)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported index format {manifest['format_version']}")
    data = np.load(prefix + ".npz")
    npz_nonce = (bytes(data["build_nonce"]).decode()
                 if "build_nonce" in data else None)
    if npz_nonce != manifest.get("build_nonce"):
        raise ValueError(
            f"index artifact mismatch at {prefix!r}: the .npz and .json "
            f"manifest come from different builds (interrupted overwrite?); "
            f"rebuild the index")
    genome = Genome(
        names=list(manifest["names"]),
        lengths=data["lengths"],
        offsets=data["offsets"],
        holes=[Hole(*h) for h in manifest["holes"]],
        codes_fwd=data["codes_fwd"],
        seed=manifest["seed"],
    )
    return FMIndex(
        seq_len=manifest["seq_len"],
        primary=manifest["primary"],
        l2=data["l2"],
        bwt_packed=data["bwt_packed"],
        occ_cp=data["occ_cp"],
        sa_samples=data["sa_samples"],
        sa_intv=manifest["sa_intv"],
        genome=genome,
        t3_packed=data["t3_packed"],
        t3_cp=data["t3_cp"],
        c64=data["c64"],
        t3_exc_pos=data["t3_exc_pos"],
        t3_exc_chr=data["t3_exc_chr"],
        c8=data["c8"],
        c12=(_unpack_c12(data, data["c12_steps"])
             if "c12_steps" in data else None),
    )


def _unpack_c12(data, steps: np.ndarray) -> np.ndarray:
    """Rebuild the [4^12, 2] int64 jump table from its persisted form
    (dense counts plane, or sparse (idx, val) when few 12-mers occur)."""
    if "c12_sz" in data:
        counts = data["c12_sz"]
    else:
        counts = np.zeros(4 ** 12, dtype=np.int64)
        counts[data["c12_idx"]] = data["c12_val"]
    n = counts.shape[0]
    out = np.zeros((n, 2), dtype=np.int64)
    out[:, 1] = counts
    if n > 1:
        np.cumsum(counts[:-1].astype(np.int64), out=out[1:, 0])
    for lb in steps:
        out[lb:, 0] += 1
    return out
