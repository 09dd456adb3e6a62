"""Measure the XLA gather table-sweep cost inside a while_loop (real TPU).

Validates/refreshes the cost model in CLAUDE.md: per gather CALL the cost is
~rows * 40 ns + table_bytes / ~500 GB/s. Prints us/iter for a grid of
(table MB, B rows/iter), plus a two-call split check.

Usage: python tools/exp_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
import numpy as np                            # noqa: E402
import gsalign_tpu                            # noqa: F401,E402

K = 300


def run(fn, state):
    r = fn(state)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = fn(state)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.time() - t0)
    return best / K * 1e6


def main():
    i32 = jnp.int32
    for mb in (8, 32, 64, 128, 256, 512, 1024):
        n = mb * (1 << 20) // 4
        table = jnp.arange(n, dtype=i32)
        for B in (512, 4096, 16384):
            idx0 = jnp.asarray((np.arange(B) * 2654435761) % n, i32)

            @jax.jit
            def loop(idx, table=table, n=n):
                def body(s):
                    k, idx, acc = s
                    v = table[idx]
                    return (k + 1, (idx * 5 + v) % n, acc + v)
                return jax.lax.while_loop(lambda s: s[0] < K, body,
                                          (jnp.zeros((), i32), idx,
                                           jnp.zeros(B, i32)))

            us = run(loop, idx0)
            print(f"table={mb:5d}MB B={B:6d} one-call: {us:9.1f} us/iter",
                  flush=True)
        # split check: same total bytes via two half-size tables
        half = n // 2
        ta, tb = table[:half], table[half:]
        B = 4096
        idx0 = jnp.asarray((np.arange(B) * 2654435761) % half, i32)

        @jax.jit
        def loop2(idx, ta=ta, tb=tb, half=half):
            def body(s):
                k, idx, acc = s
                v = ta[idx] + tb[idx]
                return (k + 1, (idx * 5 + v) % half, acc + v)
            return jax.lax.while_loop(lambda s: s[0] < K, body,
                                      (jnp.zeros((), i32), idx,
                                       jnp.zeros(B, i32)))

        print(f"table={mb:5d}MB B=4096   two-call: {run(loop2, idx0):9.1f} "
              f"us/iter", flush=True)


if __name__ == "__main__":
    main()
