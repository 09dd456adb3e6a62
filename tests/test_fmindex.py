import numpy as np
import jax.numpy as jnp
import pytest

from gsalign_tpu.genome.packing import Genome
from gsalign_tpu.index.fmindex import (
    build_fmindex, occ4_np, sa_lookup_np, rank64_np, rank1_t3_np,
    extend_rc_t3_np, extend_rc_single_np)
from gsalign_tpu.ops import rank as rank_ops
from tests.helpers import naive_suffix_array, random_genome


def make_genome(codes: np.ndarray) -> Genome:
    return Genome(names=["c"], lengths=np.asarray([len(codes)]),
                  offsets=np.asarray([0]), holes=[], codes_fwd=codes)


@pytest.fixture(scope="module")
def fm():
    rng = np.random.default_rng(7)
    codes = random_genome(rng, 600)
    g = make_genome(codes)
    return build_fmindex(g, sa_intv=8, prefer_device=False)


@pytest.fixture(scope="module")
def sa_full(fm):
    return naive_suffix_array(fm.genome.codes_fwd_rc())


def brute_occ4(text_bwt: np.ndarray, m: int) -> np.ndarray:
    return np.asarray([(text_bwt[:m] == c).sum() for c in range(4)])


def reference_bwt(fm, sa_full):
    text = fm.genome.codes_fwd_rc()
    mask = sa_full > 0
    return text[sa_full[mask] - 1]


def test_l2_and_primary(fm, sa_full):
    text = fm.genome.codes_fwd_rc()
    counts = np.bincount(text, minlength=4)[:4]
    assert fm.l2.tolist() == [0] + np.cumsum(counts).tolist()
    assert sa_full[fm.primary] == 0


def test_occ4_np_vs_brute(fm, sa_full):
    bwt = reference_bwt(fm, sa_full)
    n = fm.seq_len
    for k in [-1, 0, 1, 5, 127, 128, 129, 255, 300, n - 2, n - 1, n]:
        if k == -1:
            expect = np.zeros(4)
        else:
            ka = k - (1 if k >= fm.primary else 0)
            expect = brute_occ4(bwt, ka + 1)
        np.testing.assert_array_equal(occ4_np(fm, k), expect, err_msg=f"k={k}")


def test_sa_lookup_np(fm, sa_full):
    n = fm.seq_len
    for k in range(0, n + 1, 37):
        assert sa_lookup_np(fm, k) == sa_full[k], f"k={k}"


def test_device_occ4_matches_np(fm):
    dfm = rank_ops.DeviceFMIndex.from_host(fm)
    n = fm.seq_len
    ks = np.asarray([-1, 0, 1, 17, 127, 128, 200, n - 1, n], dtype=np.int32)
    got = np.asarray(rank_ops.occ4(dfm, jnp.asarray(ks)))
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(got[i], occ4_np(fm, int(k)),
                                      err_msg=f"k={k}")


def test_device_resolve_sa(fm, sa_full):
    dfm = rank_ops.DeviceFMIndex.from_host(fm)
    n = fm.seq_len
    ks = np.arange(1, n + 1, 13, dtype=np.int32)
    got = np.asarray(rank_ops.resolve_sa(dfm, jnp.asarray(ks)))
    np.testing.assert_array_equal(got, sa_full[ks])


def test_extend_forward_matches_naive(fm, sa_full):
    """Forward extension must track occurrence counts of growing patterns.

    All trials run as lanes of ONE batched extension so the jitted step
    compiles once."""
    import jax
    from tests.helpers import naive_occurrences
    dfm = rank_ops.DeviceFMIndex.from_host(fm)
    text = fm.genome.codes_fwd_rc()
    rng = np.random.default_rng(3)
    n_tr, plen = 16, 20
    starts = rng.integers(0, len(text) - 2 * plen, size=n_tr)
    pats = np.stack([text[s:s + plen] for s in starts]).astype(np.int32)

    step = jax.jit(rank_ops.extend_forward)
    ik0, ik1, ik2 = jax.jit(rank_ops.init_interval)(
        dfm, jnp.asarray(pats[:, 0]))
    freqs = [np.asarray(ik2).copy()]
    k0s = [np.asarray(ik0).copy()]
    for j in range(1, plen):
        nik0, nik1, nik2 = step(dfm, ik0, ik1, ik2, jnp.asarray(pats[:, j]))
        alive = np.asarray(ik2) > 0
        ik0 = jnp.where(alive, nik0, ik0)
        ik1 = jnp.where(alive, nik1, ik1)
        ik2 = jnp.where(alive, nik2, ik2)
        freqs.append(np.asarray(ik2).copy())
        k0s.append(np.asarray(ik0).copy())

    for tr in range(n_tr):
        for j in range(plen):
            expect = len(naive_occurrences(text, pats[tr, :j + 1]))
            got = int(freqs[j][tr])
            if expect == 0:
                # once dead, lanes freeze (may retain stale interval)
                break
            assert got == expect, f"trial={tr} j={j}"
        # occurrence positions via SA ranks for the full surviving pattern
        full = int(freqs[-1][tr])
        if full > 0:
            occ = sorted(naive_occurrences(text, pats[tr]))
            ranks = np.full(64, int(k0s[-1][tr]), dtype=np.int32)
            ranks[:full] = np.arange(int(k0s[-1][tr]),
                                     int(k0s[-1][tr]) + full, dtype=np.int32)
            got_pos = sorted(np.asarray(
                rank_ops.resolve_sa(dfm, jnp.asarray(ranks)))[:full].tolist())
            assert got_pos == occ


def test_rank64_np_vs_brute(fm, sa_full):
    """Triple-symbol strict ranks against a brute count over true contexts."""
    text = fm.genome.codes_fwd_rc()
    n = fm.seq_len
    true_t3 = np.full(n + 1, -1, dtype=np.int64)
    ok = sa_full >= 3
    s = sa_full[ok]
    true_t3[ok] = text[s - 3] * 16 + text[s - 2] * 4 + text[s - 1]
    rng = np.random.default_rng(5)
    for k in [0, 1, 127, 128, 129, 300, n - 1, n, n + 1]:
        for c in rng.integers(0, 64, size=6).tolist():
            expect = int((true_t3[:k] == c).sum())
            assert rank64_np(fm, int(c), k) == expect, f"k={k} c={c}"


def test_rank1_t3_np_vs_brute(fm, sa_full):
    """Single-char strict ranks via the T3 table against true prev chars."""
    text = fm.genome.codes_fwd_rc()
    n = fm.seq_len
    prev1 = np.full(n + 1, -1, dtype=np.int64)
    ok = sa_full >= 1
    prev1[ok] = text[sa_full[ok] - 1]
    for k in [0, 1, 2, 3, 127, 128, 129, 300, n, n + 1]:
        for c in range(4):
            expect = int((prev1[:k] == c).sum())
            assert rank1_t3_np(fm, c, k) == expect, f"k={k} c={c}"


def test_device_occ_t3_matches_np(fm):
    dfm = rank_ops.DeviceFMIndex.from_host(fm)
    n = fm.seq_len
    rng = np.random.default_rng(8)
    ks = rng.integers(0, n + 2, size=32).astype(np.int32)
    ks[:4] = [0, 1, 128, n + 1]
    tri = (np.arange(32) % 2 == 0)
    cls = np.where(tri, rng.integers(0, 64, size=32),
                   rng.integers(0, 4, size=32)).astype(np.int32)
    got = np.asarray(rank_ops.occ_t3(
        dfm, jnp.asarray(ks), jnp.asarray(tri), jnp.asarray(cls)))
    for i in range(32):
        if tri[i]:
            expect = rank64_np(fm, int(cls[i]), int(ks[i]))
        else:
            expect = rank1_t3_np(fm, int(cls[i]), int(ks[i]))
        assert got[i] == expect, f"i={i} k={ks[i]} c={cls[i]} tri={tri[i]}"


def test_extend_rc_t3_np_matches_naive(fm, sa_full):
    """Triple extension tracks occurrence counts of RC-patterns."""
    from tests.helpers import naive_occurrences
    text = fm.genome.codes_fwd_rc()
    rng = np.random.default_rng(4)
    for _ in range(8):
        s = int(rng.integers(0, len(text) - 16))
        pat = text[s:s + 13].astype(int)
        ik1 = int(fm.l2[3 - pat[0]]) + 1
        ik2 = int(fm.l2[pat[0] + 1] - fm.l2[pat[0]])
        j = 1
        while j + 2 < len(pat):
            ik1, ik2 = extend_rc_t3_np(fm, ik1, ik2,
                                       pat[j], pat[j + 1], pat[j + 2])
            j += 3
            expect = len(naive_occurrences(text, pat[:j]))
            assert ik2 == expect, f"j={j}"
        while j < len(pat):
            ik1, ik2 = extend_rc_single_np(fm, ik1, ik2, pat[j])
            j += 1
            expect = len(naive_occurrences(text, pat[:j]))
            assert ik2 == expect, f"j={j} (single)"


class TestWideIndex:
    """int64 ("wide") index layout: forced on a small genome, must agree
    with the narrow path everywhere (the layout the >=2^31 regime uses —
    reference handles those via 64-bit bwtint_t, src/BWT_Index/bwt.h:36-40).
    """

    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.default_rng(17)
        codes = random_genome(rng, 700)
        g = make_genome(codes)
        narrow = build_fmindex(g, sa_intv=8, prefer_device=False)
        g2 = make_genome(codes)
        wide = build_fmindex(g2, sa_intv=8, prefer_device=False,
                             force_wide=True)
        return narrow, wide

    def test_dtypes(self, pair):
        narrow, wide = pair
        assert narrow.rank_dtype == np.int32
        assert wide.rank_dtype == np.int64
        assert wide.sa_samples.dtype == np.int64

    def test_device_occ_t3_agree(self, pair):
        narrow, wide = pair
        dn = rank_ops.DeviceFMIndex.from_host(narrow)
        dw = rank_ops.DeviceFMIndex.from_host(wide)
        assert dw.wide and not dn.wide
        assert dw.t3.shape[1] == rank_ops.T3_ROW_WIDE
        n = narrow.seq_len
        rng = np.random.default_rng(3)
        ks = rng.integers(0, n + 2, size=64).astype(np.int64)
        tri = (np.arange(64) % 2 == 0)
        cls = np.where(tri, rng.integers(0, 64, size=64),
                       rng.integers(0, 4, size=64)).astype(np.int32)
        got_n = np.asarray(rank_ops.occ_t3(
            dn, jnp.asarray(ks, jnp.int32), jnp.asarray(tri),
            jnp.asarray(cls)))
        got_w = np.asarray(rank_ops.occ_t3(
            dw, jnp.asarray(ks, jnp.int64), jnp.asarray(tri),
            jnp.asarray(cls)))
        np.testing.assert_array_equal(got_n.astype(np.int64), got_w)

    def test_wide_carry_bits(self, pair):
        """Simulated huge checkpoints: lows + carries reassemble exactly."""
        _, wide = pair
        import copy
        big = copy.copy(wide)
        big._device_cache = None
        big.t3_cp = wide.t3_cp + (np.int64(3) << 32)   # force carry = 3
        dw = rank_ops.DeviceFMIndex.from_host(big)
        n3 = big.t3_cp.shape[0]
        lo = np.asarray(dw.t3[:, :64]).astype(np.int64)
        cw = np.asarray(dw.t3[:, 64:68])
        carr = ((cw[:, :, None] >> (np.arange(16, dtype=np.uint32) * 2)
                 [None, None, :]) & 3).reshape(n3, 64)
        np.testing.assert_array_equal(lo + (carr.astype(np.int64) << 32),
                                      big.t3_cp)

    def test_device_resolve_sa_wide(self, pair):
        narrow, wide = pair
        dw = rank_ops.DeviceFMIndex.from_host(wide)
        text = wide.genome.codes_fwd_rc()
        sa_full = naive_suffix_array(text)
        n = wide.seq_len
        ks = np.arange(1, n + 1, 7, dtype=np.int64)
        got = np.asarray(rank_ops.resolve_sa(dw, jnp.asarray(ks)))
        np.testing.assert_array_equal(got, sa_full[ks])

    def test_seeding_wide_matches_naive(self, pair):
        from gsalign_tpu.ops.seeding import find_seeds
        from tests.helpers import naive_lmem_seeds
        narrow, wide = pair
        rng = np.random.default_rng(21)
        qry = wide.genome.codes_fwd[:600].copy()
        subs = rng.random(len(qry)) < 0.02
        qry[subs] = (qry[subs] + rng.integers(1, 4, subs.sum())) % 4
        dw = rank_ops.DeviceFMIndex.from_host(wide)
        q_pos, r_pos, length = find_seeds(dw, qry, min_seed_length=12,
                                          chunk=300)
        text = wide.genome.codes_fwd_rc()
        expect = sorted(naive_lmem_seeds(text, qry, min_seed_length=12,
                                         max_seed_freq=100, chunk=300))
        got = sorted(zip(q_pos.tolist(), r_pos.tolist(), length.tolist()))
        assert got == expect
