"""Coordinate mapping over the fwd+RC concatenated genome space.

Vectorized equivalent of the reference's ChrLocMap + GenCoordinateInfo
(src/GetData.cpp:3-6, src/bwt_index.cpp:241-253, src/tools.cpp:120-140):
positions in [0, N) are forward-strand, [N, 2N) reverse-strand; each strand
segment ends at a sorted key and lower_bound gives the chromosome index.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from gsalign_tpu.genome.packing import Genome


@dataclasses.dataclass
class Coordinate:
    b_dir: bool          # True: forward strand
    g_pos: int           # 1-based position within the chromosome
    chromosome_idx: int


class ChrLocIndex:
    """Sorted (end_position -> chromosome) lookup over both strands.

    Keys are FowardLocation+len-1 and ReverseLocation+len-1 per chromosome
    (src/bwt_index.cpp:251-252); lookup is lower_bound (first key >= pos),
    done here with np.searchsorted for whole arrays at once.
    """

    def __init__(self, genome: Genome):
        self.genome = genome
        rev = genome.reverse_locations()
        fwd_keys = genome.offsets + genome.lengths - 1
        rev_keys = rev + genome.lengths - 1
        keys = np.concatenate([fwd_keys, rev_keys])
        vals = np.concatenate([np.arange(genome.n_chr), np.arange(genome.n_chr)])
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.vals = vals[order]
        self.fwd_loc = genome.offsets
        self.rev_loc = rev
        self.size = genome.size
        self.two_size = genome.two_size

    def chr_of(self, r_pos: np.ndarray) -> np.ndarray:
        """lower_bound(rPos)->chromosome idx, vectorized."""
        i = np.searchsorted(self.keys, np.asarray(r_pos, dtype=np.int64), side="left")
        return self.vals[np.minimum(i, len(self.keys) - 1)]

    def key_of(self, r_pos: np.ndarray) -> np.ndarray:
        """lower_bound(rPos)->key (segment end position), vectorized."""
        i = np.searchsorted(self.keys, np.asarray(r_pos, dtype=np.int64), side="left")
        return self.keys[np.minimum(i, len(self.keys) - 1)]

    def coordinate(self, r_pos: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized GenCoordinateInfo (src/tools.cpp:120-140).

        Returns (b_dir bool[], g_pos int64[] 1-based, chr_idx int[]).
        """
        r_pos = np.asarray(r_pos, dtype=np.int64)
        chr_idx = self.chr_of(r_pos)
        b_dir = r_pos < self.size
        key = self.key_of(r_pos)
        g_fwd = r_pos + 1 - self.fwd_loc[chr_idx]
        g_rev = key - r_pos + 1
        return b_dir, np.where(b_dir, g_fwd, g_rev), chr_idx


def gen_coordinate_info(index: ChrLocIndex, r_pos: int) -> Coordinate:
    b_dir, g_pos, chr_idx = index.coordinate(np.asarray([r_pos]))
    return Coordinate(bool(b_dir[0]), int(g_pos[0]), int(chr_idx[0]))


def reverse_ref_coordinate(two_size: int, pos1: int, pos2: int) -> Tuple[int, int]:
    """Mirror a [pos1,pos2] interval into the opposite strand
    (src/tools.cpp:305-312)."""
    return two_size - 1 - pos2, two_size - 1 - pos1
