"""Multi-host (DCN) data parallelism: a real 2-process jax.distributed run
on CPU must produce byte-identical merged MAF/VCF to a single-process run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def _strip_ref_line(b: bytes) -> bytes:
    return b"\n".join(ln for ln in b.split(b"\n")
                      if not ln.startswith(b"##reference"))


@pytest.mark.parametrize("nproc", [2, 3])
def test_two_process_distributed_matches_single(tmp_path, nproc):
    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.genome.packing import pack_genome
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.index.io import save_index
    from gsalign_tpu.pipeline.align import compare_genomes
    from tests.make_testdata import make_pair, write_fasta

    ref, qry = make_pair(total_len=150_000, n_chr=3, seed=55,
                         inversion=False)
    fm = build_fmindex(pack_genome(ref))
    save_index(fm, str(tmp_path / "idx"))
    write_fasta(str(tmp_path / "qry.fa"), qry)

    # single-process reference output
    compare_genomes(fm, qry, AlignConfig(),
                    output_prefix=str(tmp_path / "single"), verbose=False)

    # two real processes against a jax.distributed coordinator
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    coord = "localhost:42655"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(nproc), str(i), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, \
            f"worker failed:\n{out.decode()}\n{err.decode()}"

    for ext in (".maf", ".vcf"):
        with open(tmp_path / ("single" + ext), "rb") as fh:
            single = _strip_ref_line(fh.read())
        with open(tmp_path / ("dist_out" + ext), "rb") as fh:
            dist = _strip_ref_line(fh.read())
        assert single == dist, f"{ext} differs (single vs {nproc}-process)"


def test_four_process_with_zero_alignment_chromosome(tmp_path):
    """4 processes; chromosome 1 (owned by process 1) is unrelated junk
    that produces ZERO alignments — its shard is a marker with no output
    file, and the merge must skip it byte-identically to a single run."""
    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.genome.packing import pack_genome
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.index.io import save_index
    from gsalign_tpu.pipeline.align import compare_genomes
    from tests.make_testdata import DNA, make_pair, write_fasta

    ref, qry = make_pair(total_len=200_000, n_chr=5, seed=77,
                         inversion=False)
    junk = np.random.default_rng(999).integers(0, 4, 40_000)
    qry[1] = (qry[1][0], DNA[junk.astype(np.uint8)])   # ci=1 -> process 1
    fm = build_fmindex(pack_genome(ref))
    save_index(fm, str(tmp_path / "idx"))
    write_fasta(str(tmp_path / "qry.fa"), qry)

    compare_genomes(fm, qry, AlignConfig(),
                    output_prefix=str(tmp_path / "single"), verbose=False)

    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    coord = "localhost:42656"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "4", str(i), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(4)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, \
            f"worker failed:\n{out.decode()}\n{err.decode()}"

    for ext in (".maf", ".vcf"):
        with open(tmp_path / ("single" + ext), "rb") as fh:
            single = _strip_ref_line(fh.read())
        with open(tmp_path / ("dist_out" + ext), "rb") as fh:
            dist = _strip_ref_line(fh.read())
        assert single == dist, f"{ext} differs (single vs 4-process)"
    assert not list(tmp_path.glob("dist_out.part*")), "shards not cleaned"


def test_resume_after_crash_mid_merge(tmp_path, monkeypatch):
    """Crash DURING the merge (after chromosome 0's shard was merged and
    its files removed): a -resume restart must recompute ONLY the
    consumed chromosome and produce byte-identical outputs."""
    import pickle as _pickle

    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.genome.packing import pack_genome
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.parallel import distributed
    from gsalign_tpu.pipeline import align as align_mod
    from gsalign_tpu.pipeline.align import compare_genomes
    from tests.make_testdata import make_pair

    ref, qry = make_pair(total_len=160_000, n_chr=4, seed=91,
                         inversion=False)
    fm = build_fmindex(pack_genome(ref))
    compare_genomes(fm, qry, AlignConfig(),
                    output_prefix=str(tmp_path / "full"), verbose=False)

    # crash on the SECOND merge-loop shard load: chromosome 0 is fully
    # merged and its part files already removed, 1..3 still on disk
    real_load = _pickle.load
    calls = {"n": 0}

    def crashing_load(fh):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-merge")
        return real_load(fh)

    monkeypatch.setattr(distributed.pickle, "load", crashing_load)
    with pytest.raises(RuntimeError, match="mid-merge"):
        distributed.run_distributed(fm, qry, AlignConfig(),
                                    str(tmp_path / "crash"), verbose=False,
                                    resume=True)
    monkeypatch.setattr(distributed.pickle, "load", real_load)
    assert not (tmp_path / "crash.part0.pkl").exists()
    assert (tmp_path / "crash.part1.pkl").exists()

    # restart: only chromosome 0 recomputes; outputs byte-identical
    recomputed = []
    orig_compare = align_mod.compare_genomes

    def counting_compare(fm_, records, *a, **kw):
        recomputed.append(records[0][0])
        return orig_compare(fm_, records, *a, **kw)

    monkeypatch.setattr(align_mod, "compare_genomes", counting_compare)
    distributed.run_distributed(fm, qry, AlignConfig(),
                                str(tmp_path / "crash"), verbose=False,
                                resume=True)
    assert recomputed == [qry[0][0]], \
        f"expected only chromosome 0 recomputed, got {recomputed}"
    for ext in (".maf", ".vcf"):
        with open(tmp_path / ("full" + ext), "rb") as fh:
            a = _strip_ref_line(fh.read())
        with open(tmp_path / ("crash" + ext), "rb") as fh:
            b = _strip_ref_line(fh.read())
        assert a == b, f"{ext} differs after crash-mid-merge resume"
    assert not list(tmp_path.glob("crash.part*")), "shards not cleaned"


def test_threaded_chromosomes_byte_identical(tmp_path):
    """-t host threading over chromosomes: byte-identical to serial."""
    import dataclasses
    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.genome.packing import pack_genome
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.parallel.distributed import run_distributed
    from gsalign_tpu.pipeline.align import compare_genomes
    from tests.make_testdata import make_pair

    ref, qry = make_pair(total_len=150_000, n_chr=4, seed=66,
                         inversion=False)
    fm = build_fmindex(pack_genome(ref))
    compare_genomes(fm, qry, AlignConfig(),
                    output_prefix=str(tmp_path / "serial"), verbose=False)
    cfg = dataclasses.replace(AlignConfig(), thread_num=4)
    run_distributed(fm, qry, cfg, str(tmp_path / "thr"), verbose=False)
    for ext in (".maf", ".vcf"):
        with open(tmp_path / ("serial" + ext), "rb") as fh:
            a = _strip_ref_line(fh.read())
        with open(tmp_path / ("thr" + ext), "rb") as fh:
            b = _strip_ref_line(fh.read())
        assert a == b, f"{ext} differs (serial vs threaded)"
