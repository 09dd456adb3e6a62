"""A/B the seeding scan on the real TPU: INIT-12 on/off, slab size.

INIT-12 rides the 67 MB c12 plane of comb_pairs; per the measured gather
model every scan iteration re-reads it (~134 us/iter), which may cost more
than the iterations it saves at small genome scales. Slab size trades total
while_loop iterations (sum of per-slab maxes) against per-iteration row
costs and the remote execution deadline.

Usage: python tools/exp_seedab.py [ecoli_4.6mb] [celegans_100mb ...]
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

tags = sys.argv[1:] or ["ecoli_4.6mb", "celegans_100mb"]
cfg = AlignConfig()

orig_fetch = seeding._fetch_scan
iters = []


def spy_fetch(B, raw, max_out, starts):
    out = orig_fetch(B, raw, max_out, starts)
    iters.append(int(seeding._fetch_scan.last_finish_iters.max()))
    return out


seeding._fetch_scan = spy_fetch
spy_fetch.last_finish_iters = None


def run(dfm, codes_list, init12, reps=2):
    best = float("inf")
    tot = None
    res = None
    for _ in range(1 + reps):            # first pass absorbs compiles/loads
        iters.clear()
        t0 = time.time()
        res = seeding.find_seeds_all(
            dfm, codes_list, min_seed_length=cfg.min_seed_length,
            chunk=cfg.seed_exploration_chunk, init12=init12)
        dt = time.time() - t0
        if dt < best:
            best, tot = dt, sum(iters)
    return best, tot, res


for tag in tags:
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    dfm = DeviceFMIndex.from_host(fm)
    codes_list = [chars_to_codes(q)
                  for _, q in read_fasta(os.path.join(d, "qry.fa"))]
    base = None
    for init12 in (True, False):
        wall, tot, res = run(dfm, codes_list, init12)
        if base is None:
            base = res
        same = all(np.array_equal(a[i], b[i])
                   for a, b in zip(base, res) for i in range(3))
        print(f"{tag} init12={int(init12)} slab={seeding.MAX_LANES_PER_CALL}"
              f" wall={wall:.3f}s iters={tot} same={same}", flush=True)
    if tag.startswith("celegans"):
        for slab in (8192, 16384):
            seeding.MAX_LANES_PER_CALL = slab
            try:
                wall, tot, res = run(dfm, codes_list, True)
                same = all(np.array_equal(a[i], b[i])
                           for a, b in zip(base, res) for i in range(3))
                print(f"{tag} init12=1 slab={slab} wall={wall:.3f}s "
                      f"iters={tot} same={same}", flush=True)
            except Exception as e:  # noqa: BLE001 (deadline probes)
                print(f"{tag} init12=1 slab={slab} FAILED: {e!r}", flush=True)
        seeding.MAX_LANES_PER_CALL = 4096
