"""Golden parity on a repeat-rich genome (40 diverged copies of a 2 kb
unit + transposon-like elements): exercises the repeat-resolution and
outlier-removal chain heuristics densely. Fixture produced by the C
reference (v1.0.22, -t 1) compiled from /root/reference."""

import gzip
import os

import numpy as np
import pytest

from gsalign_tpu.config import AlignConfig
from gsalign_tpu.genome.packing import pack_genome
from gsalign_tpu.index.fmindex import build_fmindex
from gsalign_tpu.pipeline.align import compare_genomes
from tests.make_testdata import _mutate

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
DNA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_repeat_pair():
    rng = np.random.default_rng(424)
    unit = rng.integers(0, 4, 2000).astype(np.uint8)
    tn = rng.integers(0, 4, 500).astype(np.uint8)
    parts = []
    for i in range(40):
        u = unit.copy()
        m = rng.random(2000) < 0.02
        u[m] = (u[m] + rng.integers(1, 4, m.sum())) % 4
        parts.append(u)
        parts.append(rng.integers(0, 4,
                                  rng.integers(500, 3000)).astype(np.uint8))
        if i % 3 == 0:
            t = tn.copy()
            mm = rng.random(500) < 0.01
            t[mm] = (t[mm] + rng.integers(1, 4, mm.sum())) % 4
            parts.append(t)
    ref = np.concatenate(parts)
    qry = _mutate(ref, rng, 0.005, 0.0005, 10)
    return ([("chrR", DNA[ref])], [("chrRm", DNA[qry])])


def golden(name: str) -> bytes:
    with gzip.open(os.path.join(GOLDEN_DIR, name + ".gz")) as fh:
        return fh.read()


def _strip_reference_line(b: bytes) -> bytes:
    return b"\n".join(ln for ln in b.split(b"\n")
                      if not ln.startswith(b"##reference"))


def test_repeat_rich_pair_byte_identical(tmp_path):
    ref, qry = make_repeat_pair()
    fm = build_fmindex(pack_genome(ref))
    out = str(tmp_path / "out")
    compare_genomes(fm, qry, AlignConfig(), output_prefix=out, verbose=False)
    with open(out + ".maf", "rb") as fh:
        assert fh.read() == golden("g_repeat.maf")
    with open(out + ".vcf", "rb") as fh:
        assert _strip_reference_line(fh.read()) == \
            _strip_reference_line(golden("g_repeat.vcf"))
