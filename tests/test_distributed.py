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
