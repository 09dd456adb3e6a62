"""Per-iteration cost breakdown of the seeding loop body (real TPU).

Times K iterations of stripped while_loops that add one body piece at a
time, over the REAL index tables of a bench config. Usage:
    python tools/exp_loopcost.py [tag] [B] [K]
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


def bench(fn, args, K):
    r = jax.jit(fn, static_argnames=("K",))(*args, K=K)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0])   # true sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = jax.jit(fn, static_argnames=("K",))(*args, K=K)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.time() - t0)
    return best / K * 1e6                          # us/iter


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "yeast_12mb"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    d = os.path.join("/tmp/gsalign_bench", tag)
    fm = load_index(os.path.join(d, "ref_idx"))
    dfm = DeviceFMIndex.from_host(fm)
    codes = np.concatenate(
        [chars_to_codes(q) for _, q in read_fasta(os.path.join(d, "qry.fa"))])
    poslut = seeding._build_poslut(dfm, jnp.asarray(codes))
    q_rows = seeding._build_qrows(jnp.asarray(codes))
    i32 = jnp.int32
    u32 = jnp.uint32
    Lpad = poslut.shape[0]
    n_sa = dfm.sa_samples.shape[0]
    max_out = 128
    sl = dfm.seq_len

    def loop(body, K, extra_state=None):
        st = dict(k=jnp.zeros((), i32),
                  idx=(jnp.arange(B, dtype=i32) * 9973) % (Lpad - 300),
                  acc=jnp.zeros(B, i32))
        if extra_state:
            st.update(extra_state)
        return jax.lax.while_loop(lambda s: s["k"] < K, body, st)

    def mk_idx(s):
        return (s["idx"] + s["k"]) % (Lpad - 300)

    # 1: poslut meta gather + comb pair gather + occ_t3
    def body1(s):
        look = mk_idx(s)
        meta = poslut[look]
        cls8 = (meta & u32(0xFFFF)).astype(i32)
        cls3 = ((meta >> u32(16)) & u32(63)).astype(i32)
        flags = (meta >> u32(22)).astype(i32)
        b1c = 3 - ((flags >> 2) & 3)
        half = i32(65536 + 136)
        idx6 = jnp.concatenate([cls8, 65536 + cls3, 65536 + 64 + b1c,
                                half + cls8, half + 65536 + cls3,
                                half + 65536 + 64 + b1c])
        vals = dfm.comb_pairs[idx6]
        k2 = (look.astype(i32) % (sl - 200)).astype(dfm.rdtype)
        cnt = rank_ops.occ_t3(dfm, jnp.concatenate([k2, k2 + 100]),
                              jnp.concatenate([flags > 0] * 2),
                              jnp.concatenate([cls3] * 2))
        acc = s["acc"] + cnt[:B].astype(i32) + vals[:B].astype(i32)
        return dict(s, k=s["k"] + 1, acc=acc)

    def f1(poslut, K):
        return loop(body1, K)["acc"]

    print("1 poslut+occ           :",
          round(bench(lambda poslut, K: loop(body1, K)["acc"],
                      (poslut,), K), 1), "us/iter", flush=True)

    # 2: + sa riding the comb gather (7th segment)
    def body2(s):
        look = mk_idx(s)
        meta = poslut[look]
        cls8 = (meta & u32(0xFFFF)).astype(i32)
        cls3 = ((meta >> u32(16)) & u32(63)).astype(i32)
        flags = (meta >> u32(22)).astype(i32)
        b1c = 3 - ((flags >> 2) & 3)
        half = i32(65536 + 136)
        # historical probe: the SA no longer rides comb_pairs (round 4
        # xlak split) — stand in a standalone sa_rows gather instead
        sa_look = (look % (sl - 200)).astype(i32)
        idx7 = jnp.concatenate([cls8, 65536 + cls3, 65536 + 64 + b1c,
                                half + cls8, half + 65536 + cls3,
                                half + 65536 + 64 + b1c])
        sa_vals = dfm.sa_rows[sa_look]
        vals = dfm.comb_pairs[idx7]
        k2 = (look.astype(i32) % (sl - 200)).astype(dfm.rdtype)
        cnt = rank_ops.occ_t3(dfm, jnp.concatenate([k2, k2 + 100]),
                              jnp.concatenate([flags > 0] * 2),
                              jnp.concatenate([cls3] * 2))
        acc = (s["acc"] + cnt[:B].astype(i32) + vals[:B].astype(i32)
               + sa_vals.astype(i32))
        return dict(s, k=s["k"] + 1, acc=acc)

    print("2 +sa split gather     :",
          round(bench(lambda poslut, K: loop(body2, K)["acc"],
                      (poslut,), K), 1), "us/iter", flush=True)

    # 3: + text/qrow row gathers
    n_tr = dfm.text_rows.shape[0]
    n_qr = q_rows.shape[0]

    def body3(s):
        s = body2(s)
        p = mk_idx(s)
        trow = dfm.text_rows[(p % n_tr).astype(i32)]
        qrow = q_rows[(p % n_qr).astype(i32)]
        return dict(s, acc=s["acc"] + trow[:, 0].astype(i32)
                    + qrow[:, 0].astype(i32))

    print("3 +text/qrow gathers   :",
          round(bench(lambda poslut, q_rows, K: loop(body3, K)["acc"],
                      (poslut, q_rows), K), 1), "us/iter", flush=True)

    # 4: + extraction + mismatch math
    def body4(s):
        s = body2(s)
        p = mk_idx(s)
        trow = dfm.text_rows[(p % n_tr).astype(i32)]
        qrow = q_rows[(p % n_qr).astype(i32)]
        off = (p & 255)
        tw = seeding._extract256(trow, off)
        qw = seeding._extract256(qrow[:, :32], off)
        aw = seeding._extract256(qrow[:, 32:], off)
        x = tw ^ qw
        mm = ((x | (x >> u32(1))) & u32(0x55555555)) | aw
        clzs = jax.lax.clz(mm.astype(i32)) >> 1
        j16 = jnp.arange(16, dtype=i32)[None, :] * 16
        cand = jnp.where(mm == 0, 4096, j16 + clzs)
        run = jnp.minimum(jnp.min(cand, axis=1), 256)
        return dict(s, acc=s["acc"] + run)

    print("4 +extract+mm          :",
          round(bench(lambda poslut, q_rows, K: loop(body4, K)["acc"],
                      (poslut, q_rows), K), 1), "us/iter", flush=True)

    # 5: + the production packed 3-plane emit (max_out = 128)
    def body5(s):
        s = body4(s)
        slot = s["acc"] % max_out
        hot = (jnp.arange(max_out, dtype=i32)[None, :] == slot[:, None])
        m = jnp.where(hot, s["acc"].astype(u32)[:, None], s["m"])
        c = jnp.where(hot, (s["acc"] * 3).astype(dfm.rdtype)[:, None],
                      s["c"])
        fq = jnp.where(hot, (s["acc"] % 101).astype(jnp.int8)[:, None],
                       s["f"])
        return dict(s, m=m, c=c, f=fq)

    def f5(poslut, q_rows, K):
        st = dict(k=jnp.zeros((), i32),
                  idx=(jnp.arange(B, dtype=i32) * 9973) % (Lpad - 300),
                  acc=jnp.zeros(B, i32),
                  m=jnp.zeros((B, max_out), u32),
                  c=jnp.zeros((B, max_out), dfm.rdtype),
                  f=jnp.zeros((B, max_out), jnp.int8))
        return jax.lax.while_loop(lambda s: s["k"] < K, body5, st)["m"]

    print("5 +packed emit         :",
          round(bench(f5, (poslut, q_rows), K), 1), "us/iter", flush=True)


if __name__ == "__main__":
    main()
