"""Reusable big-buffer pool for host row assembly.

On this host a FRESH numpy allocation first-touches at only
~150-300 MB/s (kernel page zeroing of mmap'd arenas; glibc returns
>32 MB blocks to the OS on free), which made the ~genome-sized MAF row
buffers the dominant output-stage cost at 250 Mb. The pool keeps the
largest recently-used uint8 buffers alive so warm runs write into
already-faulted pages. Thread-safe; capped so idle processes don't pin
memory. Buffers are recycled through AsyncSink once their disk writes
complete (the memoryview chunks alias the pooled base array)."""

from __future__ import annotations

import threading

import numpy as np

_POOL: list = []                 # free uint8 base arrays
_LOCK = threading.Lock()
MAX_POOL_BYTES = 6 << 30


def get(n: int) -> np.ndarray:
    """A uint8 buffer of capacity >= n (callers slice to their length)."""
    with _LOCK:
        best = -1
        for i, b in enumerate(_POOL):
            if b.shape[0] >= n and (best < 0
                                    or b.shape[0] < _POOL[best].shape[0]):
                best = i
        if best >= 0:
            return _POOL.pop(best)
    return np.empty(n, dtype=np.uint8)


def prime(sizes) -> None:
    """Pre-fault pool buffers for the given capacities (called on a
    background thread while the device stages run, so the kernel's
    first-touch page zeroing — the dominant output-stage cost on this
    host — overlaps device wait instead of serializing into row
    assembly). Capacities already satisfiable by free pooled buffers are
    skipped; the pool byte cap is respected."""
    with _LOCK:                 # one snapshot; matching is best-effort
        free_sizes = sorted((b.shape[0] for b in _POOL), reverse=True)
        total = sum(free_sizes)
    todo = []
    for n in sorted((int(s) for s in sizes), reverse=True):
        if n <= 0:
            continue
        if free_sizes and free_sizes[0] >= n:   # greedy: largest request
            free_sizes.pop(0)                   # takes largest free buffer
            continue
        todo.append(n)
    for n in todo:
        if total + n > MAX_POOL_BYTES:
            continue
        total += n
        buf = np.empty(n, dtype=np.uint8)
        buf[::4096] = 0                     # touch every page once
        buf[-1] = 0
        put(buf)


def put(buf) -> None:
    """Return a buffer to the pool (accepts the exact arrays handed out by
    get(); anything else is ignored)."""
    if not isinstance(buf, np.ndarray) or buf.dtype != np.uint8 \
            or buf.base is not None:
        return
    with _LOCK:
        total = sum(b.shape[0] for b in _POOL)
        if total + buf.shape[0] <= MAX_POOL_BYTES:
            _POOL.append(buf)
