"""DP bucket histogram + seed emit-count distribution for one bench tag.

Runs the warm pipeline once with GSALIGN_DP_STATS=1 (FragmentAligner
prints per-bucket problem/cell counts) and records the seed emit-count
distribution (how full the per-lane emit buffers run — sizes the
max_out/compaction budgets). Usage:
    python tools/exp_dphist.py [tag]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GSALIGN_DP_STATS"] = "1"

import numpy as np                                        # noqa: E402
import gsalign_tpu                                        # noqa: F401,E402
from gsalign_tpu.config import AlignConfig                # noqa: E402
from gsalign_tpu.genome.fasta import read_fasta           # noqa: E402
from gsalign_tpu.index.io import load_index               # noqa: E402
from gsalign_tpu.pipeline.align import compare_genomes    # noqa: E402
from gsalign_tpu.ops import seeding                       # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "human_250mb"
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    qry = read_fasta(os.path.join(d, "qry.fa"))

    counts = []
    orig = seeding._fetch_scan

    def spy(B, raw, max_out, n_shards=1):
        out = orig(B, raw, max_out, n_shards)
        counts.append(np.asarray(out[4][:B]))   # n (hits per lane)
        return out

    seeding._fetch_scan = spy
    try:
        stats, _, _ = compare_genomes(
            fm, qry, AlignConfig(), output_prefix=os.path.join(d, "hist_out"),
            verbose=False)
    finally:
        seeding._fetch_scan = orig
    n = np.concatenate(counts)
    print(f"lanes={n.size} emit-per-lane: mean={n.mean():.1f} "
          f"p50={np.percentile(n, 50):.0f} p90={np.percentile(n, 90):.0f} "
          f"p99={np.percentile(n, 99):.0f} p99.9={np.percentile(n, 99.9):.0f} "
          f"max={n.max()}")
    print("stage_times:", {k: round(v, 3) for k, v in stats.stage_times.items()})


if __name__ == "__main__":
    main()
