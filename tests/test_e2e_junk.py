"""Robustness: query contigs that produce no alignments.

The reference binary SEGFAULTS on such inputs (SeedGrouping pushes the group
(0,1) even when SeedVec is empty, src/GSAlign.cpp:140, and the group analysis
then reads SeedVec[0] out of bounds). This framework must instead skip the
contig and produce byte-identical output to the clean-query reference run.
"""

import gzip
import os

import numpy as np
import pytest

from gsalign_tpu.config import AlignConfig
from gsalign_tpu.genome.packing import pack_genome
from gsalign_tpu.index.fmindex import build_fmindex
from gsalign_tpu.pipeline.align import compare_genomes
from tests.make_testdata import make_pair

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def golden(name: str) -> bytes:
    with gzip.open(os.path.join(GOLDEN_DIR, name + ".gz"), "rb") as fh:
        return fh.read()


def _strip_ref(text: bytes) -> bytes:
    return b"\n".join(ln for ln in text.split(b"\n")
                      if not ln.startswith(b"##reference="))


def test_unalignable_contigs_are_skipped(tmp_path):
    ref, qry = make_pair(total_len=80_000, seed=321, inversion=False)
    rng = np.random.default_rng(77)
    dna = np.frombuffer(b"ACGT", dtype=np.uint8)
    qry.insert(1, ("chr_junk", dna[rng.integers(0, 4, 5000)]))
    qry.append(("chr_tiny", dna[rng.integers(0, 4, 120)]))

    fm = build_fmindex(pack_genome(ref), prefer_device=False)
    prefix = str(tmp_path / "j")
    stats, collector, _ = compare_genomes(fm, qry, AlignConfig(),
                                          output_prefix=prefix, verbose=False)
    assert stats.local_alignment_num == 2
    assert stats.total_alignment_length == 80108
    # output matches the reference run on the SAME pair without the junk
    # contigs (junk must contribute nothing)
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("gj_clean.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_ref(fh.read()) == _strip_ref(golden("gj_clean.vcf"))
