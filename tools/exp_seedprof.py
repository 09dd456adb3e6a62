"""Seed-stage profile: rounds, lanes, iterations, per-iteration cost.

Wraps seeding._run_scan with timing over a real bench config, then reports
per-round lane counts, total while_loop iterations (max finish_iter), and
derived per-iteration cost. Usage:
    python tools/exp_seedprof.py [tag] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                        # noqa: E402
import gsalign_tpu                                        # noqa: F401,E402
from gsalign_tpu.genome.fasta import read_fasta           # noqa: E402
from gsalign_tpu.genome.packing import chars_to_codes     # noqa: E402
from gsalign_tpu.index.io import load_index               # noqa: E402
from gsalign_tpu.ops.rank import DeviceFMIndex            # noqa: E402
from gsalign_tpu.ops import seeding                       # noqa: E402


import contextlib


@contextlib.contextmanager
def _null():
    yield


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "ecoli_4.6mb"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    dfm = DeviceFMIndex.from_host(fm)
    qcodes = [chars_to_codes(q) for _, q in read_fasta(os.path.join(d, "qry.fa"))]
    print(f"tag={tag} seq_len={dfm.seq_len} init_order={dfm.init_order} "
          f"sa_in_comb={dfm.sa_in_comb} direct_ok={dfm.direct_ok}")
    print(f"comb_pairs={dfm.comb_pairs.nbytes/1e6:.1f}MB "
          f"t3_rows={dfm.t3_rows.nbytes/1e6 if hasattr(dfm,'t3_rows') else -1}")
    for name in dfm._fields if hasattr(dfm, "_fields") else []:
        pass
    # table inventory
    for f in ("union_rows", "t3_rows", "major3", "comb_pairs", "text_rows",
              "sa_rows", "sa_samples"):
        a = getattr(dfm, f, None)
        if a is not None and hasattr(a, "nbytes"):
            print(f"  table {f}: {a.nbytes/1e6:8.2f} MB shape={a.shape}")

    orig = seeding._run_scan
    rounds = []

    def wrapped(dfm_, q_rows, starts, *args, **kw):
        t0 = time.time()
        out = orig(dfm_, q_rows, starts, *args, **kw)
        dt = time.time() - t0
        fi = getattr(seeding._fetch_scan, "last_finish_iters", None)
        it = int(fi.max()) if fi is not None and len(fi) else -1
        if fi is not None and len(fi):
            fi = np.asarray(fi)
            # lane-iteration integral: active lanes summed over iterations
            # (= what a perfectly-compacted scan would pay) vs B * max
            integral = int(fi.sum())
            full = len(fi) * it
            qs = np.percentile(fi, [50, 75, 90, 99]).astype(int)
            print(f"    finish_iters: max={it} mean={fi.mean():.0f} "
                  f"p50/75/90/99={list(qs)} "
                  f"integral={integral} ({100.0*integral/max(full,1):.1f}% "
                  f"of B*max)")
        rounds.append((len(starts), it, dt))
        return out

    seeding._run_scan = wrapped
    try:
        from gsalign_tpu.utils.trace import device_trace
        for r in range(reps):
            rounds.clear()
            t0 = time.time()
            # trace only the LAST rep (warm executables) when GSALIGN_TRACE set
            with device_trace() if r == reps - 1 else _null():
                seeds = seeding.find_seeds_all(dfm, qcodes)
            total = time.time() - t0
            n_seeds = sum(len(s[0]) for s in seeds)
            print(f"rep {r}: total={total:.3f}s seeds={n_seeds}")
            for i, (B, it, dt) in enumerate(rounds):
                per = dt / max(it, 1) * 1e6
                print(f"  round {i}: lanes={B:6d} iters={it:6d} "
                      f"wall={dt:.3f}s -> {per:.1f} us/iter")
            overhead = total - sum(r[2] for r in rounds)
            print(f"  host/overhead: {overhead:.3f}s")
    finally:
        seeding._run_scan = orig


if __name__ == "__main__":
    main()
