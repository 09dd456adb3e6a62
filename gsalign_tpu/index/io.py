"""Index artifact persistence.

One .npz + JSON manifest replaces the reference's five-file format
(.pac/.ann/.amb/.bwt/.sa — src/BWT_Index/bntseq.c:59-89, bwt.c:174-196).
"""

from __future__ import annotations

import json
import os

import numpy as np

from gsalign_tpu.genome.packing import Genome, Hole
from gsalign_tpu.index.fmindex import FMIndex

FORMAT_VERSION = 5


def save_index(fm: FMIndex, prefix: str) -> None:
    g = fm.genome
    if g is None:
        raise ValueError("FMIndex has no genome attached")
    manifest = {
        "format_version": FORMAT_VERSION,
        "seq_len": fm.seq_len,
        "primary": fm.primary,
        "sa_intv": fm.sa_intv,
        "names": g.names,
        "seed": g.seed,
        "holes": [[h.offset, h.length, h.amb] for h in g.holes],
    }
    with open(prefix + ".json", "w") as fh:
        json.dump(manifest, fh)
    np.savez(
        prefix + ".npz",
        l2=fm.l2, bwt_packed=fm.bwt_packed, occ_cp=fm.occ_cp,
        sa_samples=fm.sa_samples, codes_fwd=g.codes_fwd,
        lengths=g.lengths, offsets=g.offsets,
        t3_packed=fm.t3_packed, t3_cp=fm.t3_cp, c64=fm.c64,
        t3_exc_pos=fm.t3_exc_pos, t3_exc_chr=fm.t3_exc_chr, c8=fm.c8,
        c12=fm.c12,
    )


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
        c12=data["c12"],
    )
