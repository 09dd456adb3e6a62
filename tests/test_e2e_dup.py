"""Golden parity for duplication handling (-unique, -one, bDup marking).

Fixture: the reference chr1 carries two copies of a 6 kb segment and the
query has a separate contig matching both copies with identical query
extents, which drives the type-1 dedup path (src/GSAlign.cpp:440-446):
one alignment is kept but marked duplicate (MAF score printed as 1),
`-unique` omits it entirely.
"""

import dataclasses
import gzip
import os

import numpy as np
import pytest

from gsalign_tpu.config import AlignConfig
from gsalign_tpu.genome.packing import NT4_TABLE, pack_genome
from gsalign_tpu.index.fmindex import build_fmindex
from gsalign_tpu.pipeline.align import compare_genomes
from tests.make_testdata import DNA, _mutate, make_pair

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def golden(name: str) -> bytes:
    with gzip.open(os.path.join(GOLDEN_DIR, name + ".gz"), "rb") as fh:
        return fh.read()


def _strip_ref(text: bytes) -> bytes:
    return b"\n".join(ln for ln in text.split(b"\n")
                      if not ln.startswith(b"##reference="))


@pytest.fixture(scope="module")
def dup_pair():
    ref, qry = make_pair(total_len=100_000, seed=777, inversion=False)
    name, r_ascii = ref[0]
    seg_ascii = r_ascii[10_000:16_000]
    r2 = np.concatenate([r_ascii[:40_000], seg_ascii, r_ascii[40_000:]])
    ref[0] = (name, r2)
    rng = np.random.default_rng(99)
    seg_mut = _mutate(NT4_TABLE[seg_ascii], rng, 0.004, 0.0004, 8)
    qry.append(("chr_seg", DNA[seg_mut]))
    return ref, qry


@pytest.fixture(scope="module")
def fm(dup_pair):
    return build_fmindex(pack_genome(dup_pair[0]), prefer_device=False)


def run(fm, qry, tmp_path, cfg, tag):
    prefix = str(tmp_path / tag)
    stats, collector, _ = compare_genomes(fm, qry, cfg, output_prefix=prefix,
                                          verbose=False)
    return prefix, stats


def test_duplicate_marking_default(fm, dup_pair, tmp_path):
    prefix, stats = run(fm, dup_pair[1], tmp_path, AlignConfig(), "d")
    assert stats.local_alignment_num == 4
    assert stats.dup_aln_num == 1
    assert stats.total_alignment_length == 106110
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("gd_def.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_ref(fh.read()) == _strip_ref(golden("gd_def.vcf"))


def test_unique_mode(fm, dup_pair, tmp_path):
    cfg = dataclasses.replace(AlignConfig(), allow_duplication=False)
    prefix, _ = run(fm, dup_pair[1], tmp_path, cfg, "u")
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("gd_unique.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_ref(fh.read()) == _strip_ref(golden("gd_unique.vcf"))


def test_one_on_one_mode(fm, dup_pair, tmp_path):
    cfg = dataclasses.replace(AlignConfig(), one_on_one=True)
    prefix, _ = run(fm, dup_pair[1], tmp_path, cfg, "o")
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("gd_one.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_ref(fh.read()) == _strip_ref(golden("gd_one.vcf"))
