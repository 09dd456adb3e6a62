"""Scalar reference implementation of the ksw2 extz difference recurrence +
backtrack, used to validate the batched device DP kernel.

Mirrors the recurrence and direction-flag semantics of the reference's
ksw_extz2_sse / ksw_backtrack (src/ksw2_alignment.cpp:70-249, :25-68) with
the fixed parameters match=1, mismatch=-1, q=2, e=1, full band. Independent
scalar re-derivation: one cell at a time, previous-row arrays copied.
"""

from __future__ import annotations

import numpy as np

Q, E = 2, 1
QE = Q + E
QE2 = 2 * QE
MAX_SC = 1 + QE2


def ksw_ref_ops(qc, tc):
    """qc: ksw-query codes (ref fragment), tc: ksw-target codes (qry fragment).
    Returns forward-order op list of 'M'/'D'/'I' (D consumes target)."""
    ql, tl = len(qc), len(tc)
    assert ql > 0 and tl > 0
    u = np.zeros(tl, dtype=np.int64)
    v = np.zeros(tl, dtype=np.int64)
    x = np.zeros(tl, dtype=np.int64)
    y = np.zeros(tl, dtype=np.int64)
    d = np.zeros((ql + tl - 1, tl), dtype=np.uint8)

    for r in range(ql + tl - 1):
        st0 = max(0, r - ql + 1)
        en0 = min(r, tl - 1)
        up, vp, xp, yp = u.copy(), v.copy(), x.copy(), y.copy()
        if r <= tl - 1:
            yp[r] = 0
            up[r] = Q if r > 0 else 0
        x1 = 0
        v1 = Q if r > 0 else 0
        for t in range(st0, en0 + 1):
            xt1 = xp[t - 1] if t > 0 else x1
            vt1 = vp[t - 1] if t > 0 else v1
            if qc[r - t] >= 4 or tc[t] >= 4:
                sc = 0
            else:
                sc = 1 if qc[r - t] == tc[t] else -1
            z = sc + QE2
            a = xt1 + vt1
            b = yp[t] + up[t]
            dd = 1 if a > z else 0
            z = max(z, a)
            if b > z:
                dd = 2
            z = max(z, b)
            z = min(z, MAX_SC)
            u[t] = z - vt1
            v[t] = z - up[t]
            z2 = z - Q
            a2 = a - z2
            b2 = b - z2
            x[t] = max(a2, 0)
            y[t] = max(b2, 0)
            if a2 > 0:
                dd |= 0x08
            if b2 > 0:
                dd |= 0x10
            d[r, t] = dd

    # backtrack (src/ksw2_alignment.cpp:25-68); full band -> no force states
    ops = []
    i, j, state = tl - 1, ql - 1, 0
    while i >= 0 and j >= 0:
        tmp = int(d[i + j, i])
        if state == 0:
            state = tmp & 7
        elif not ((tmp >> (state + 2)) & 1):
            state = 0
        if state == 0:
            state = tmp & 7
        if state == 0:
            ops.append("M")
            i -= 1
            j -= 1
        elif state in (1, 3):
            ops.append("D")
            i -= 1
        else:
            ops.append("I")
            j -= 1
    if i >= 0:
        ops.extend("D" * (i + 1))
    if j >= 0:
        ops.extend("I" * (j + 1))
    return ops[::-1]
