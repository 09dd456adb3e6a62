"""Deterministic synthetic genome-pair generator for parity tests/benchmarks.

Generates a reference genome and a mutated query (SNVs, small indels, an
inversion, a translocated duplicate) the way the GSAlign paper evaluates on
simulated mutants. Fixed seeds make outputs reproducible so golden files from
the C reference binary stay valid.
"""

from __future__ import annotations

import numpy as np

DNA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_pair(total_len: int = 300_000, n_chr: int = 2, seed: int = 1234,
              sub_rate: float = 0.005, indel_rate: float = 0.0005,
              max_indel: int = 10, inversion: bool = True):
    """Returns (ref_records, qry_records) as [(name, ascii uint8[])]."""
    rng = np.random.default_rng(seed)
    per = total_len // n_chr
    ref_records = []
    qry_records = []
    for ci in range(n_chr):
        ref = rng.integers(0, 4, per).astype(np.uint8)
        qry = _mutate(ref, rng, sub_rate, indel_rate, max_indel)
        if inversion and ci == 0 and per > 40_000:
            # invert (reverse-complement) a 10 kb interior segment
            s = per // 3
            e = s + 10_000
            seg = qry[s:e]
            qry = np.concatenate([qry[:s], (3 - seg[::-1]).astype(np.uint8),
                                  qry[e:]])
        ref_records.append((f"chr{ci + 1}", DNA[ref]))
        qry_records.append((f"chr{ci + 1}m", DNA[qry]))
    return ref_records, qry_records


def _mutate(ref: np.ndarray, rng: np.random.Generator, sub_rate: float,
            indel_rate: float, max_indel: int) -> np.ndarray:
    out = []
    i = 0
    n = len(ref)
    while i < n:
        r = rng.random()
        if r < sub_rate:
            out.append((int(ref[i]) + int(rng.integers(1, 4))) % 4)
            i += 1
        elif r < sub_rate + indel_rate / 2:
            ln = int(rng.integers(1, max_indel + 1))     # deletion
            i += ln
        elif r < sub_rate + indel_rate:
            ln = int(rng.integers(1, max_indel + 1))     # insertion
            out.extend(rng.integers(0, 4, ln).tolist())
            out.append(int(ref[i]))
            i += 1
        else:
            out.append(int(ref[i]))
            i += 1
    return np.asarray(out, dtype=np.uint8)


def write_fasta(path: str, records, width: int = 70):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            s = seq.tobytes().decode("latin1")
            for i in range(0, len(s), width):
                fh.write(s[i:i + width] + "\n")


if __name__ == "__main__":
    import sys
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "."
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    ref, qry = make_pair(total_len=total)
    write_fasta(f"{out_dir}/ref.fa", ref)
    write_fasta(f"{out_dir}/qry.fa", qry)
    print(f"wrote {out_dir}/ref.fa {out_dir}/qry.fa")
