"""DP parity against the reference ksw2 implementation.

Fixtures were produced by compiling the reference's ksw2_alignment.cpp into
an oracle binary and recording aligned rows for 120 fixed cases (random,
related-with-edits, and N-containing pairs). The device DP (both the
lax.scan path and, if it compiles here, the Pallas kernel) must reproduce
every aligned row byte-for-byte — tie-breaking included.
"""

import gzip
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gsalign_tpu.genome.packing import NT4_TABLE
from gsalign_tpu.ops import dp as dp_ops

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_cases():
    with gzip.open(os.path.join(GOLDEN_DIR, "ksw_oracle_cases.txt.gz"),
                   "rt") as fh:
        cases = [ln.split() for ln in fh.read().strip().splitlines()]
    with gzip.open(os.path.join(GOLDEN_DIR, "ksw_oracle_out.txt.gz"),
                   "rt") as fh:
        outs = [ln.split() for ln in fh.read().strip().splitlines()]
    return cases, outs


def run_batch(cases, dp_fn, L):
    B = len(cases)
    q = np.full((B, L), 4, np.int32)
    t = np.full((B, L), 4, np.int32)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (s1, s2) in enumerate(cases):
        qc = NT4_TABLE[np.frombuffer(s1.encode(), np.uint8)]
        tc = NT4_TABLE[np.frombuffer(s2.encode(), np.uint8)]
        q[i, :len(qc)] = qc
        t[i, :len(tc)] = tc
        ql[i] = len(qc)
        tl[i] = len(tc)
    ops = np.asarray(dp_fn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                           jnp.asarray(tl), L))
    rows = []
    for i, (s1, s2) in enumerate(cases):
        o = ops[i]
        o = o[o != dp_ops.OP_PAD][::-1]
        a1, a2 = dp_ops.ops_to_alignment(
            o, np.frombuffer(s1.encode(), np.uint8),
            np.frombuffer(s2.encode(), np.uint8))
        rows.append((a1.tobytes().decode(), a2.tobytes().decode()))
    return rows


def test_dp_matches_reference_ksw2_oracle():
    cases, outs = load_cases()
    rows = run_batch(cases, dp_ops.dp_align_batch, 256)
    for i, ((e1, e2), (g1, g2)) in enumerate(zip(outs, rows)):
        assert g1 == e1 and g2 == e2, f"case {i}"


def test_hybrid_dp_falls_back_when_pallas_build_fails(monkeypatch):
    """A Pallas build failure on one bucket must degrade to the lax.scan
    path (op-identical), not crash the pipeline: hw_ok() only probes
    L=128, so larger buckets can fail independently (4x VMEM cube)."""
    from gsalign_tpu.ops import dp_pallas

    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("synthetic Mosaic build failure")

    monkeypatch.setattr(dp_pallas, "dp_align_batch_pallas", boom)
    monkeypatch.setattr(dp_pallas, "_BAD_L", set())
    fn = dp_pallas.make_hybrid_dp_fn()
    cases, outs = load_cases()
    keep = [i for i, (s1, s2) in enumerate(cases)
            if max(len(s1), len(s2)) <= 64][:8]
    assert len(keep) >= 4
    rows = run_batch([cases[i] for i in keep], fn, 64)
    for i, (g1, g2) in zip(keep, rows):
        e1, e2 = outs[i]
        assert g1 == e1 and g2 == e2, f"case {i}"
    assert calls == [1]          # tried Pallas once, then pinned to scan
    assert 64 in dp_pallas._BAD_L
    rows2 = run_batch([cases[i] for i in keep], fn, 64)
    assert rows2 == rows and calls == [1]


def test_pallas_dp_matches_oracle_interpret():
    from gsalign_tpu.ops.dp_pallas import MAX_L, make_dp_fn
    cases, outs = load_cases()
    keep = [i for i, (s1, s2) in enumerate(cases)
            if max(len(s1), len(s2)) <= 128][:24]
    rows = run_batch([cases[i] for i in keep], make_dp_fn(interpret=True),
                     128)
    assert len(keep) >= 8
    for i, (g1, g2) in zip(keep, rows):
        e1, e2 = outs[i]
        assert g1 == e1 and g2 == e2, f"case {i}"
