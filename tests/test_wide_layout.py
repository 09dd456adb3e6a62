"""Always-run wide (int64) layout regression: the exact >=2^31 device
layout on a small genome, full pipeline, byte parity vs the narrow run.
(The full-scale >2^31 build lives in test_wide_e2e.py behind GSALIGN_BIG.)
"""

import numpy as np


def test_wide_layout_pipeline_matches_narrow(tmp_path):
    import dataclasses
    from gsalign_tpu.config import AlignConfig
    from gsalign_tpu.genome.packing import Genome
    from gsalign_tpu.index.fmindex import build_fmindex
    from gsalign_tpu.pipeline.align import compare_genomes

    rng = np.random.default_rng(23)
    n = 60_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    DNA = np.frombuffer(b"ACGT", dtype=np.uint8)
    qry = codes.copy()
    subs = rng.random(n) < 0.01
    qry[subs] = (qry[subs] + rng.integers(1, 4, subs.sum())) % 4
    qry_records = [("wq", DNA[qry])]
    cfg = dataclasses.replace(AlignConfig(), thread_num=1)

    outs = {}
    for name, force in (("narrow", False), ("wide", True)):
        g = Genome(names=["wc"], lengths=np.asarray([n]),
                   offsets=np.asarray([0]), holes=[],
                   codes_fwd=codes.copy())
        fm = build_fmindex(g, sa_intv=8, prefer_device=False,
                           force_wide=force)
        assert fm.rank_dtype == (np.int64 if force else np.int32)
        prefix = str(tmp_path / name)
        stats, coll, _ = compare_genomes(fm, qry_records, cfg,
                                         output_prefix=prefix,
                                         verbose=False)
        assert stats.local_alignment_num >= 1
        with open(prefix + ".maf", "rb") as fh:
            maf = fh.read()
        with open(prefix + ".vcf", "rb") as fh:
            vcf = b"".join(l for l in fh.read().splitlines(keepends=True)
                           if not l.startswith(b"##reference"))
        outs[name] = (maf, vcf, coll.n_snv)
    assert outs["wide"][0] == outs["narrow"][0]
    assert outs["wide"][1] == outs["narrow"][1]
    assert outs["wide"][2] == outs["narrow"][2] > 100
