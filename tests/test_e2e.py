"""End-to-end golden parity: byte-identical MAF/ALN/VCF against the C
reference binary (fixtures in tests/golden/, produced by
/tmp-built hsinnan75/GSAlign v1.0.22 with -t 1 on the deterministic pair from
make_testdata.make_pair(total_len=100000)).
"""

import dataclasses
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


@pytest.fixture(scope="module")
def pair():
    return make_pair(total_len=100_000)


@pytest.fixture(scope="module")
def fm(pair):
    ref_records, _ = pair
    return build_fmindex(pack_genome(ref_records), prefer_device=False)


def golden(name: str) -> bytes:
    with gzip.open(os.path.join(GOLDEN_DIR, name + ".gz"), "rb") as fh:
        return fh.read()


def _strip_reference_line(text: bytes) -> bytes:
    return b"\n".join(ln for ln in text.split(b"\n")
                      if not ln.startswith(b"##reference="))


def run(fm, pair, tmp_path, cfg, tag):
    _, qry_records = pair
    prefix = str(tmp_path / tag)
    stats, collector, _ = compare_genomes(fm, qry_records, cfg,
                                          output_prefix=prefix, verbose=False)
    return prefix, stats, collector


def test_default_mode_byte_parity(fm, pair, tmp_path):
    cfg = AlignConfig()
    prefix, stats, collector = run(fm, pair, tmp_path, cfg, "d")
    assert stats.local_alignment_num == 3
    assert stats.total_alignment_length == 90130
    assert (collector.n_snv, collector.n_ins, collector.n_del) == (443, 23, 19)
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("g_default.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_reference_line(fh.read()) == \
            _strip_reference_line(golden("g_default.vcf"))


def test_sensitive_mode_byte_parity(fm, pair, tmp_path):
    cfg = dataclasses.replace(AlignConfig(), sensitive=True)
    prefix, stats, _ = run(fm, pair, tmp_path, cfg, "s")
    assert stats.total_alignment_length == 90129
    with open(prefix + ".maf", "rb") as fh:
        assert fh.read() == golden("g_sen.maf")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_reference_line(fh.read()) == \
            _strip_reference_line(golden("g_sen.vcf"))


def test_aln_format_byte_parity(fm, pair, tmp_path):
    cfg = dataclasses.replace(AlignConfig(), output_format=2)
    prefix, _, _ = run(fm, pair, tmp_path, cfg, "a")
    with open(prefix + ".aln", "rb") as fh:
        assert fh.read() == golden("g_aln.aln")
    with open(prefix + ".vcf", "rb") as fh:
        assert _strip_reference_line(fh.read()) == \
            _strip_reference_line(golden("g_aln.vcf"))


def test_dotplot_smoke(fm, pair, tmp_path):
    """-dp writes a PostScript dotplot per query chromosome."""
    import glob
    cfg = dataclasses.replace(AlignConfig(), show_plot=True)
    prefix, _, _ = run(fm, pair, tmp_path, cfg, "dp")
    plots = glob.glob(prefix + "-*.ps")
    assert len(plots) >= 1
    with open(plots[0], "rb") as fh:
        assert fh.read(4) == b"%!PS"


def test_dotplot_gnuplot_parity(fm, pair, tmp_path):
    """The gnuplot script + data files match OutputDotplot's format
    (src/DotPloting.cpp:36-58), and with a gnuplot present (a stub here)
    the data files are removed after exec, like the reference."""
    import glob
    import stat
    cfg = dataclasses.replace(AlignConfig(), show_plot=True)
    prefix, _, _ = run(fm, pair, tmp_path, cfg, "gp1")
    gp = prefix + ".gp"
    assert os.path.exists(gp)
    with open(gp) as fh:
        script = fh.read()
    assert script.startswith(
        "set terminal postscript color solid 'Courier' 15\n")
    assert "set style line 1 lw 4 pt 0 ps 0.5 lc 'red'\n" in script
    assert "set xrange[1:*]\nset yrange[1:*]\n" in script
    assert "\nplot '" in script and "' with lp ls 1" in script
    data_files = [p for p in glob.glob(prefix + ".*vs*")]
    assert data_files, "no-gnuplot fallback must keep the data files"
    with open(data_files[0]) as fh:
        body = fh.read()
    assert body.startswith("0 0\n0 0\n\n")
    seg = body.split("\n\n")[1].splitlines()
    assert len(seg) == 2 and all(len(l.split()) == 2 for l in seg)

    # stub gnuplot: exec path must invoke it and remove the data files
    stub = tmp_path / "gnuplot"
    stub.write_text("#!/bin/sh\ntouch \"$(dirname $1)/gnuplot_ran\"\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    cfg2 = dataclasses.replace(AlignConfig(), show_plot=True,
                               gnuplot_path=str(stub))
    prefix2, _, _ = run(fm, pair, tmp_path, cfg2, "gp2")
    assert os.path.exists(os.path.join(os.path.dirname(prefix2),
                                       "gnuplot_ran"))
    assert not glob.glob(prefix2 + ".*vs*"), "data files must be removed"
    assert os.path.exists(prefix2 + ".gp")
