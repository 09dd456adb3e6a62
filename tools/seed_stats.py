"""Seeding-loop diagnostics on the real TPU: per-slab while_loop iteration
counts, lane finish-iteration skew, and wall-clock per slab.

Usage: python tools/seed_stats.py [bench_dir ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import gsalign_tpu  # noqa: E402,F401
from gsalign_tpu.config import AlignConfig  # noqa: E402
from gsalign_tpu.genome.fasta import read_fasta  # noqa: E402
from gsalign_tpu.genome.packing import chars_to_codes  # noqa: E402
from gsalign_tpu.index.io import load_index  # noqa: E402
from gsalign_tpu.ops.rank import DeviceFMIndex  # noqa: E402
from gsalign_tpu.ops import seeding  # noqa: E402

dirs = sys.argv[1:] or ["/tmp/gsalign_bench/ecoli_4.6mb",
                        "/tmp/gsalign_bench/celegans_100mb"]

orig_fetch = seeding._fetch_scan
stats = []


def spy_fetch(B, raw, max_out, starts):
    t0 = time.time()
    out = orig_fetch(B, raw, max_out, starts)
    dt = time.time() - t0
    fi = seeding._fetch_scan.last_finish_iters
    stats.append((B, dt, int(fi.max()), fi.copy()))
    return out


seeding._fetch_scan = spy_fetch
spy_fetch.last_finish_iters = None

cfg = AlignConfig()
for d in dirs:
    fm = load_index(os.path.join(d, "ref_idx"))
    dfm = DeviceFMIndex.from_host(fm)
    qry_records = read_fasta(os.path.join(d, "qry.fa"))
    for rep in range(2):
        stats.clear()
        t0 = time.time()
        for name, qry in qry_records:
            qc = chars_to_codes(qry)
            seeding.find_seeds(dfm, qc,
                               min_seed_length=cfg.min_seed_length,
                               chunk=cfg.seed_exploration_chunk)
        wall = time.time() - t0
        if rep == 0:
            continue            # warm-up (compiles / executable loads)
        print(f"== {os.path.basename(d)} seed wall={wall:.3f}s "
              f"slabs={len(stats)}")
        tot_iters = 0
        for B, dt, mx, fi in stats:
            fi = np.asarray(fi)
            live = fi[fi > 0]
            pct = np.percentile(live, [50, 90, 99]).astype(int) \
                if live.size else [0, 0, 0]
            tot_iters += mx
            print(f"   slab B={B:5d} fetchwait={dt:.3f}s max_iter={mx:5d} "
                  f"p50={pct[0]} p90={pct[1]} p99={pct[2]} lanes={live.size}")
        print(f"   total_max_iters={tot_iters}")
