"""Per-iteration cost breakdown of the CURRENT seeding loop body (real TPU).

Times K iterations of stripped while_loops that add one body piece at a
time over the real index tables of a bench config:
    0 empty-loop floor
    1 + q_rows gather + _meta16 decode
    2 + comb_pairs gather (2B indices)
    3 + occ_t3 (2B queries)
    4 + text_rows gather + _extract256 compare
    5 + emit-plane rewrite (one-hot where)
Usage: python tools/exp_seedcost.py [tag] [B] [K] [max_out]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
import numpy as np                            # noqa: E402
import gsalign_tpu                            # noqa: F401,E402
from gsalign_tpu.genome.fasta import read_fasta          # noqa: E402
from gsalign_tpu.genome.packing import chars_to_codes    # noqa: E402
from gsalign_tpu.index.io import load_index              # noqa: E402
from gsalign_tpu.ops import rank as rank_ops             # noqa: E402
from gsalign_tpu.ops.rank import DeviceFMIndex           # noqa: E402
from gsalign_tpu.ops import seeding                      # noqa: E402

i32 = jnp.int32
u32 = jnp.uint32


def bench(fn, args, K):
    f = jax.jit(fn, static_argnames=("K",))
    r = f(*args, K=K)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = f(*args, K=K)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.time() - t0)
    return best / K * 1e6


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "ecoli_4.6mb"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    max_out = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    dfm = DeviceFMIndex.from_host(fm)
    codes = np.concatenate(
        [chars_to_codes(q) for _, q in read_fasta(os.path.join(d, "qry.fa"))])
    q_rows = seeding._build_qrows(jnp.asarray(codes))
    n_qrow = q_rows.shape[0]
    n_trow = dfm.text_rows.shape[0]
    sl = dfm.seq_len
    order = dfm.init_order
    print(f"tag={tag} B={B} K={K} comb={dfm.comb_pairs.nbytes/1e6:.1f}MB "
          f"t3={dfm.t3.nbytes/1e6:.1f}MB qrows={q_rows.nbytes/1e6:.1f}MB "
          f"text={dfm.text_rows.nbytes/1e6:.1f}MB", flush=True)

    def loop(body, K, st0):
        st0 = dict(st0, k=jnp.zeros((), i32))

        def wrap(s):
            s = body(s)
            return dict(s, k=s["k"] + 1)
        return jax.lax.while_loop(lambda s: s["k"] < K, wrap, st0)

    base_st = dict(
        idx=(jnp.arange(B, dtype=i32) * 9973) % (n_qrow * 256 - 600),
        acc=jnp.zeros(B, i32))

    def mk_look(s):
        return (s["idx"] + s["k"] * 7) % (n_qrow * 256 - 600)

    # 0: floor
    def body0(s):
        return dict(s, acc=s["acc"] + mk_look(s))
    print("0 floor                :",
          round(bench(lambda q, K: loop(body0, K, base_st)["acc"],
                      (q_rows,), K), 1), "us/iter", flush=True)

    # 1: + q_rows gather + meta16
    def qmeta(s, q_rows):
        look = mk_look(s)
        qrows2 = q_rows[jnp.concatenate([look >> 8, look >> 8])]
        cls12, real3, b1ok, real8, amb_w = seeding._meta16(
            qrows2[:B], look & 255)
        return look, qrows2, cls12, real3, b1ok, real8

    def body1(s, q_rows):
        look, _, cls12, real3, b1ok, real8 = qmeta(s, q_rows)
        return dict(s, acc=s["acc"] + cls12 + b1ok.astype(i32))
    print("1 +qrows+meta16        :",
          round(bench(lambda q, K: loop(lambda s: body1(s, q), K,
                                        base_st)["acc"],
                      (q_rows,), K), 1), "us/iter", flush=True)

    # 2: + comb gather
    half = 65536 + 136

    def comb_part(s, q_rows):
        look, qrows2, cls12, real3, b1ok, real8 = qmeta(s, q_rows)
        cls_init = cls12 & ((1 << (2 * order)) - 1)
        cls8 = cls12 & 0xFFFF
        idx_a = jnp.where(b1ok, rank_ops.INIT_OFF + cls_init, cls8)
        idx_b = jnp.where(b1ok, idx_a + 1, idx_a + half)
        vals = dfm.comb_pairs[jnp.concatenate([idx_a, idx_b])]
        return look, qrows2, cls12, vals[:B], vals[B:]

    def body2(s, q_rows):
        look, _, cls12, a, b = comb_part(s, q_rows)
        return dict(s, acc=s["acc"] + (b - a).astype(i32))
    print("2 +comb gather         :",
          round(bench(lambda q, K: loop(lambda s: body2(s, q), K,
                                        base_st)["acc"],
                      (q_rows,), K), 1), "us/iter", flush=True)

    # 3: + occ_t3
    def body3(s, q_rows):
        look, qrows2, cls12, a, b = comb_part(s, q_rows)
        k2 = (look % (sl - 300)).astype(dfm.rdtype)
        cnt = rank_ops.occ_t3(dfm, jnp.concatenate([k2, k2 + 100]),
                              jnp.ones(2 * B, jnp.bool_),
                              jnp.concatenate([cls12 & 63] * 2))
        return dict(s, acc=s["acc"] + (b - a).astype(i32)
                    + cnt[:B].astype(i32))
    print("3 +occ_t3              :",
          round(bench(lambda q, K: loop(lambda s: body3(s, q), K,
                                        base_st)["acc"],
                      (q_rows,), K), 1), "us/iter", flush=True)

    # 4: + text_rows + extract256 compare
    def body4(s, q_rows):
        look, qrows2, cls12, a, b = comb_part(s, q_rows)
        k2 = (look % (sl - 300)).astype(dfm.rdtype)
        cnt = rank_ops.occ_t3(dfm, jnp.concatenate([k2, k2 + 100]),
                              jnp.ones(2 * B, jnp.bool_),
                              jnp.concatenate([cls12 & 63] * 2))
        p = (look * 3) % (n_trow * 256 - 600)
        trow = dfm.text_rows[p >> 8]
        tw = seeding._extract256(trow, p & 255)
        qrow = qrows2[B:]
        qw = seeding._extract256(qrow[:, :32], look & 255)
        x = tw ^ qw
        mm = (x | (x >> u32(1))) & u32(0x55555555)
        clzs = jax.lax.clz(mm.astype(i32)) >> 1
        j16 = jnp.arange(16, dtype=i32)[None, :] * 16
        cand = jnp.where(mm == 0, 4096, j16 + clzs)
        run = jnp.minimum(jnp.min(cand, axis=1), 256)
        return dict(s, acc=s["acc"] + (b - a).astype(i32)
                    + cnt[:B].astype(i32) + run)
    print("4 +text+cmp256         :",
          round(bench(lambda q, K: loop(lambda s: body4(s, q), K,
                                        base_st)["acc"],
                      (q_rows,), K), 1), "us/iter", flush=True)

    # 5: + emit planes
    st5 = dict(base_st,
               out_meta=jnp.zeros((B, max_out), u32),
               out_k0=jnp.zeros((B, max_out), dfm.rdtype),
               out_fr=jnp.zeros((B, max_out), jnp.int8),
               out_n=jnp.zeros(B, i32))

    def body5(s, q_rows):
        look, qrows2, cls12, a, b = comb_part(s, q_rows)
        k2 = (look % (sl - 300)).astype(dfm.rdtype)
        cnt = rank_ops.occ_t3(dfm, jnp.concatenate([k2, k2 + 100]),
                              jnp.ones(2 * B, jnp.bool_),
                              jnp.concatenate([cls12 & 63] * 2))
        p = (look * 3) % (n_trow * 256 - 600)
        trow = dfm.text_rows[p >> 8]
        tw = seeding._extract256(trow, p & 255)
        qrow = qrows2[B:]
        qw = seeding._extract256(qrow[:, :32], look & 255)
        x = tw ^ qw
        mm = (x | (x >> u32(1))) & u32(0x55555555)
        clzs = jax.lax.clz(mm.astype(i32)) >> 1
        j16 = jnp.arange(16, dtype=i32)[None, :] * 16
        cand = jnp.where(mm == 0, 4096, j16 + clzs)
        run = jnp.minimum(jnp.min(cand, axis=1), 256)
        do = (run & 7) == 0
        slot = jnp.minimum(s["out_n"], max_out - 1)
        hot = (jnp.arange(max_out, dtype=i32)[None, :] == slot[:, None]) \
            & do[:, None]
        out_meta = jnp.where(hot, cls12.astype(u32)[:, None], s["out_meta"])
        out_k0 = jnp.where(hot, (a + cnt[:B])[:, None], s["out_k0"])
        out_fr = jnp.where(hot, run.astype(jnp.int8)[:, None], s["out_fr"])
        return dict(s, acc=s["acc"] + (b - a).astype(i32)
                    + cnt[:B].astype(i32) + run,
                    out_meta=out_meta, out_k0=out_k0, out_fr=out_fr,
                    out_n=s["out_n"] + do.astype(i32))
    print("5 +emit planes         :",
          round(bench(lambda q, K: loop(lambda s: body5(s, q), K,
                                        st5)["acc"],
                      (q_rows,), K), 1), "us/iter", flush=True)


if __name__ == "__main__":
    main()
