"""Seeding A/B harness (true-sync wall-clock on the real TPU).

Usage: python tools/exp_seeding.py <tag> <n_segments> [reps]
  tag: bench config dir under /tmp/gsalign_bench (e.g. yeast_12mb)

find_seeds_all fetches results to host, so wall-clock here is true execution
time (block_until_ready does NOT sync over the axon tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import gsalign_tpu  # noqa: F401,E402
from gsalign_tpu.genome.fasta import read_fasta  # noqa: E402
from gsalign_tpu.genome.packing import chars_to_codes  # noqa: E402
from gsalign_tpu.index.io import load_index  # noqa: E402
from gsalign_tpu.ops.rank import DeviceFMIndex  # noqa: E402
from gsalign_tpu.ops.seeding import find_seeds_all  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "yeast_12mb"
    nseg = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    dfm = DeviceFMIndex.from_host(fm)
    codes = [chars_to_codes(q) for _, q in read_fasta(os.path.join(d, "qry.fa"))]

    res = None
    times = []
    for r in range(reps + 1):
        t0 = time.time()
        res = find_seeds_all(dfm, codes, n_segments=nseg)
        dt = time.time() - t0
        if r > 0:           # rep 0 pays compile
            times.append(dt)
        print(f"  rep{r}: {dt:.3f}s", file=sys.stderr, flush=True)
    n_seeds = sum(int(r[0].shape[0]) for r in res)
    from gsalign_tpu.ops.seeding import _fetch_scan
    fi = getattr(_fetch_scan, "last_finish_iters", None)
    pct = {}
    if fi is not None:
        fi = np.sort(np.asarray(fi))
        pct = {f"p{p}": int(fi[min(len(fi) - 1, int(len(fi) * p / 100))])
               for p in (50, 90, 99, 100)}
    print(json.dumps({
        "tag": tag, "n_segments": nseg,
        "best_s": round(min(times), 3), "all_s": [round(t, 3) for t in times],
        "n_seeds": n_seeds, "finish_iter_pct": pct,
    }))


if __name__ == "__main__":
    main()
