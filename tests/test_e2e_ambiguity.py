"""Golden parity with ambiguity: N runs in ref (lrand48 replacement + holes)
and in the query (seeding breaks, DP wildcards, variant suppression), plus a
lowercase query region (case-preserving output, case-insensitive matching).
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


@pytest.fixture(scope="module")
def amb_pair():
    ref, qry = make_pair(total_len=100_000, seed=555, inversion=True)
    rng = np.random.default_rng(4)
    name, q = qry[0]
    q = q.copy()
    for _ in range(30):
        p = int(rng.integers(100, len(q) - 100))
        ln = int(rng.integers(1, 12))
        q[p:p + ln] = ord("N")
    lo = slice(30_000, 31_000)
    q[lo] = np.frombuffer(bytes(q[lo]).lower(), dtype=np.uint8)
    qry[0] = (name, q)
    name2, r = ref[1]
    r = r.copy()
    r[5000:5040] = ord("N")
    r[70_000:70_003] = ord("n")
    ref[1] = (name2, r)
    return ref, qry


def test_ambiguity_byte_parity(amb_pair, tmp_path):
    ref, qry = amb_pair
    fm = build_fmindex(pack_genome(ref), prefer_device=False)
    prefix = str(tmp_path / "n")
    stats, collector, _ = compare_genomes(fm, qry, AlignConfig(),
                                          output_prefix=prefix, verbose=False)
    assert stats.total_alignment_length == 90094
    assert (collector.n_snv, collector.n_ins, collector.n_del) == (439, 18, 17)
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("gn_def.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_ref(fh.read()) == _strip_ref(golden("gn_def.vcf"))
