"""Measure the C reference (hsinnan75/GSAlign) on the bench pairs, in-run.

Builds the reference once (cp -r /root/reference /tmp/refbuild && make),
generates/reuses the bench pair for each tag, times `bwt_index` and
`GSAlign -t <cores>`, and writes /tmp/gsalign_bench/<tag>/ref_baseline.json
{"align_seconds": best-of-N, "index_seconds": s, "threads": t, "reps": N}.
bench.py prefers these measured numbers over its hardcoded constants.

Usage: python tools/measure_baseline.py [tag ...]   (default: all configs)
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = "/tmp/gsalign_bench"
REF_BUILD = "/tmp/refbuild"
TAGS = {
    "ecoli_4.6mb": 4_600_000,
    "yeast_12mb": 12_000_000,
    "celegans_100mb": 100_000_000,
    "human_250mb": 250_000_000,
}
REPS = {"ecoli_4.6mb": 5, "yeast_12mb": 3}


def ensure_binary():
    gsalign = os.path.join(REF_BUILD, "bin", "GSAlign")
    bwt_index = os.path.join(REF_BUILD, "bin", "bwt_index")
    if os.path.exists(gsalign) and os.path.exists(bwt_index):
        return gsalign, bwt_index
    if not os.path.isdir(REF_BUILD):
        shutil.copytree("/root/reference", REF_BUILD)
    subprocess.run(["make", "-C", REF_BUILD], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return gsalign, bwt_index


def main():
    tags = sys.argv[1:] or list(TAGS)
    gsalign, bwt_index = ensure_binary()
    threads = os.cpu_count() or 4
    from bench import ensure_data
    for tag in tags:
        d, ref_fa, qry_fa = ensure_data(tag, TAGS[tag])
        idx = os.path.join(d, "c_idx")
        marker = os.path.join(d, "ref_baseline.json")
        t0 = time.time()
        if not os.path.exists(idx + ".sa"):
            subprocess.run([bwt_index, ref_fa, idx], check=True,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            index_s = round(time.time() - t0, 3)
        else:
            index_s = None
            if os.path.exists(marker):
                with open(marker) as fh:
                    index_s = json.load(fh).get("index_seconds")
        reps = REPS.get(tag, 3)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            subprocess.run(
                [gsalign, "-t", str(threads), "-i", idx, "-q", qry_fa,
                 "-o", os.path.join(d, "c_out")],
                check=True, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            best = min(best, time.time() - t0)
        row = {"align_seconds": round(best, 3), "index_seconds": index_s,
               "threads": threads, "reps": reps}
        with open(marker, "w") as fh:
            json.dump(row, fh)
        print(json.dumps({"tag": tag, **row}), flush=True)


if __name__ == "__main__":
    main()
