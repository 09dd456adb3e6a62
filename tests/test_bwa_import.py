"""Import of the reference five-file index (.pac/.ann/.amb/.bwt/.sa).

Builds a real index with the C reference binary (bin/bwt_index, cached at
/tmp/refbuild) on a FASTA with N runs and lowercase, imports it, and checks
the reconstruction equals packing the FASTA ourselves — plus an end-to-end
alignment over the imported index matching the FASTA-built index's output.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from gsalign_tpu.genome.packing import pack_genome
from gsalign_tpu.index.bwa_import import import_bwa_index, load_bwa_genome

REF_BUILD = "/tmp/refbuild"


def _ref_binary():
    exe = os.path.join(REF_BUILD, "bin", "bwt_index")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir("/root/reference"):
        return None
    try:
        if not os.path.isdir(REF_BUILD):
            shutil.copytree("/root/reference", REF_BUILD)
        subprocess.run(["make", "-C", REF_BUILD], check=True, timeout=300,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except Exception:
        return None
    return exe if os.path.exists(exe) else None


@pytest.fixture(scope="module")
def bwa_index(tmp_path_factory):
    exe = _ref_binary()
    if exe is None:
        pytest.skip("C reference binary unavailable")
    d = tmp_path_factory.mktemp("bwaimp")
    rng = np.random.default_rng(31)
    DNA = b"ACGT"
    recs = []
    lines = []
    for name, n in (("chrA", 30000), ("chrB description here", 20000)):
        seq = bytearray(rng.choice(list(DNA), n).tobytes())
        # an N run and a lowercase stretch (nt4 table parity)
        seq[500:540] = b"N" * 40
        seq[1000:1100] = bytes(seq[1000:1100]).lower()
        recs.append((name.split()[0],
                     np.frombuffer(bytes(seq), dtype=np.uint8)))
        lines.append(f">{name}\n" + bytes(seq).decode() + "\n")
    fa = d / "ref.fa"
    fa.write_text("".join(lines))
    prefix = str(d / "cref")
    subprocess.run([exe, str(fa), prefix], check=True, timeout=120,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return prefix, recs


def test_genome_reconstruction_matches_packer(bwa_index):
    prefix, recs = bwa_index
    g_imp = load_bwa_genome(prefix)
    g_ref = pack_genome(recs)
    assert g_imp.names == g_ref.names
    np.testing.assert_array_equal(g_imp.lengths, g_ref.lengths)
    np.testing.assert_array_equal(g_imp.offsets, g_ref.offsets)
    np.testing.assert_array_equal(g_imp.codes_fwd, g_ref.codes_fwd)
    assert len(g_imp.holes) == len(g_ref.holes)
    for a, b in zip(g_imp.holes, g_ref.holes):
        assert (a.offset, a.length, a.amb) == (b.offset, b.length, b.amb)


def test_import_validates_bwt_header_and_aligns(bwa_index, tmp_path):
    import dataclasses
    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.pipeline.align import compare_genomes

    prefix, recs = bwa_index
    fm_imp = import_bwa_index(prefix)          # raises if .bwt disagrees
    fm_ref = build_fmindex(pack_genome(recs))
    assert fm_imp.primary == fm_ref.primary
    np.testing.assert_array_equal(np.asarray(fm_imp.l2),
                                  np.asarray(fm_ref.l2))

    rng = np.random.default_rng(9)
    qry = fm_ref.genome.codes_fwd[:25000].copy()
    subs = rng.random(len(qry)) < 0.01
    qry[subs] = (qry[subs] + rng.integers(1, 4, subs.sum())) % 4
    DNA = np.frombuffer(b"ACGT", dtype=np.uint8)
    qrecs = [("q1", DNA[qry])]
    cfg = dataclasses.replace(AlignConfig(), thread_num=1)
    outs = []
    for tag, fm in (("imp", fm_imp), ("ref", fm_ref)):
        p = str(tmp_path / tag)
        compare_genomes(fm, qrecs, cfg, output_prefix=p, verbose=False)
        with open(p + ".maf", "rb") as fh:
            outs.append(fh.read())
    assert outs[0] == outs[1] and len(outs[0]) > 1000


def test_import_rejects_mismatched_bwt(bwa_index, tmp_path):
    prefix, _ = bwa_index
    # copy the file set but corrupt the .bwt primary
    for ext in (".pac", ".ann", ".amb", ".bwt"):
        shutil.copy(prefix + ext, str(tmp_path / ("bad" + ext)))
    bad = str(tmp_path / "bad")
    with open(bad + ".bwt", "r+b") as fh:
        fh.write(b"\xff\xff\xff\xff\xff\xff\x00\x00")
    with pytest.raises(ValueError, match="primary"):
        import_bwa_index(bad)
