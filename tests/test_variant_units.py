"""Unit tests for the columnar variant-event machinery (round 5): allele
fragment gathers with python-slice edge semantics, the columnar collector
chunks, and the bufpool prime path."""

import numpy as np

from gsalign_tpu.pipeline.variants import (TYPE_DEL, TYPE_INS,
                                           VariantCollector, _gather_frags)


def _desc(cols):
    """[(src, start, len), ...] -> the [3, n] descriptor array."""
    return np.asarray(cols, dtype=np.int64).T.reshape(3, -1)


class TestGatherFrags:
    ref = np.frombuffer(b"ACGTACGT", dtype=np.uint8).copy()
    qry = np.frombuffer(b"TTTTGGGG", dtype=np.uint8).copy()

    def test_basic_both_sources(self):
        buf, offs = _gather_frags(
            _desc([(0, 1, 3), (1, 4, 2)]), self.ref, self.qry)
        assert bytes(buf[offs[0]:offs[1]]) == b"CGT"
        assert bytes(buf[offs[1]:offs[2]]) == b"GG"

    def test_negative_start_is_empty(self):
        # python semantics: chars[-1 : small_stop] == empty slice — arises
        # from the reference's `pos - 1` anchors at position 0
        buf, offs = _gather_frags(
            _desc([(0, -1, 3), (1, 0, 2)]), self.ref, self.qry)
        assert offs.tolist() == [0, 0, 2]
        assert bytes(buf) == b"TT"
        assert bytes(self.ref[-1:3]) == b""          # the emulated behavior

    def test_stop_clamps_at_array_end(self):
        buf, offs = _gather_frags(
            _desc([(0, 6, 5)]), self.ref, self.qry)
        assert bytes(buf) == b"GT"                   # ref[6:11] -> ref[6:8]
        assert offs.tolist() == [0, 2]

    def test_matches_python_slices_random(self):
        rng = np.random.default_rng(3)
        ref = rng.integers(65, 91, 100).astype(np.uint8)
        qry = rng.integers(97, 123, 80).astype(np.uint8)
        cols = [(int(rng.integers(0, 2)), int(rng.integers(-1, 110)),
                 int(rng.integers(0, 15))) for _ in range(200)]
        buf, offs = _gather_frags(_desc(cols), ref, qry)
        for k, (s, st, ln) in enumerate(cols):
            arr = ref if s == 0 else qry
            assert bytes(buf[offs[k]:offs[k + 1]]) == bytes(arr[st:st + ln])


class TestCollectorColumns:
    def _chunk(self, coll, chr_idx, events, seq0):
        # events: (r_raw, typ, ref bytes, alt bytes)
        rb = b"".join(e[2] for e in events)
        ab = b"".join(e[3] for e in events)
        roff = np.concatenate([[0], np.cumsum([len(e[2]) for e in events])])
        aoff = np.concatenate([[0], np.cumsum([len(e[3]) for e in events])])
        coll.add_other_block(
            chr_idx, np.asarray([e[0] for e in events], dtype=np.int64),
            np.asarray([e[1] for e in events], dtype=np.uint8),
            np.arange(seq0, seq0 + len(events)),
            np.frombuffer(rb, dtype=np.uint8), roff,
            np.frombuffer(ab, dtype=np.uint8), aoff)

    def test_counts_and_columns(self):
        c = VariantCollector()
        c.take_seq(2)
        self._chunk(c, 0, [(10, TYPE_DEL, b"ACG", b"A"),
                           (20, TYPE_INS, b"T", b"TGG")], 0)
        self._chunk(c, 1, [(5, TYPE_INS, b"C", b"CC")], 2)
        assert (c.n_ins, c.n_del) == (2, 1)
        c.oth_pos = [r.copy() for r in c.oth_rraw]   # fake finalize
        c._finalized_other = 2
        o_chr, o_pos, o_seq, o_typ, rbuf, roff, abuf, aoff = \
            c.other_columns()
        assert o_chr.tolist() == [0, 0, 1]
        assert o_pos.tolist() == [10, 20, 5]
        assert bytes(rbuf[roff[1]:roff[2]]) == b"T"
        assert bytes(abuf[aoff[2]:aoff[3]]) == b"CC"
        assert o_typ.tolist() == [TYPE_DEL, TYPE_INS, TYPE_INS]

    def test_merge_from_offsets_sequences(self):
        a, b = VariantCollector(), VariantCollector()
        a.take_seq(3)
        self._chunk(a, 0, [(1, TYPE_DEL, b"AC", b"A")], 0)
        a.oth_pos = [r.copy() for r in a.oth_rraw]
        a._finalized_other = 1
        b.take_seq(1)
        self._chunk(b, 0, [(2, TYPE_INS, b"G", b"GT")], 0)
        b.oth_pos = [r.copy() for r in b.oth_rraw]
        b._finalized_other = 1
        a.merge_from(b)
        _, _, o_seq, _, _, _, _, _ = a.other_columns()
        assert o_seq.tolist() == [0, 3]              # b's seq offset by 3
        assert (a.n_ins, a.n_del) == (1, 1)

    def test_variants_property_roundtrip(self):
        c = VariantCollector()
        c.take_seq(1)
        self._chunk(c, 0, [(7, TYPE_DEL, b"ACGT", b"A")], 0)
        c.oth_pos = [r.copy() for r in c.oth_rraw]
        c._finalized_other = 1
        rows = c.variants
        assert rows == [(0, 7, b"ACGT", b"A", TYPE_DEL, 0)]


class TestBufpoolPrime:
    def test_prime_adds_prefaulted_and_skips_covered(self):
        from gsalign_tpu.utils import bufpool
        with bufpool._LOCK:
            saved = bufpool._POOL[:]
            bufpool._POOL.clear()
        try:
            bufpool.prime([1 << 20, 1 << 16])
            with bufpool._LOCK:
                sizes = sorted(b.shape[0] for b in bufpool._POOL)
            assert sizes == [1 << 16, 1 << 20]
            bufpool.prime([1 << 20])     # covered: no growth
            with bufpool._LOCK:
                assert len(bufpool._POOL) == 2
            buf = bufpool.get(1 << 20)
            assert buf.shape[0] >= 1 << 20
        finally:
            with bufpool._LOCK:
                bufpool._POOL.clear()
                bufpool._POOL.extend(saved)
