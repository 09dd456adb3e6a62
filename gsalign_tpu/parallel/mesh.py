"""Multi-chip data parallelism.

The reference has no distributed code (pthreads + one mutex,
src/GSAlign.cpp:8,492-526); this module supplies that dimension TPU-natively:
one mesh axis "frag" shards the two batched device stages — the seeding
lane axis (query chunks) and the DP problem axis — while the FM-index arrays
stay replicated (a 2-bit fwd+RC human genome is ~1.5 GB, well under per-chip
HBM). Merges are host gathers of per-device seed buffers; deterministic
output order is restored by the global (PosDiff, qPos) sort, so results are
bit-stable for any device count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsalign_tpu.ops.rank import DeviceFMIndex

FRAG_AXIS = "frag"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (FRAG_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def frag_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FRAG_AXIS))


def shard_index(dfm: DeviceFMIndex, mesh: Mesh) -> DeviceFMIndex:
    """Replicate the FM-index arrays across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), dfm)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m


def shard_lanes(arr: np.ndarray, mesh: Mesh, pad_value) -> jnp.ndarray:
    """Pad axis 0 to a device-count multiple and shard it over "frag"."""
    n_dev = mesh.devices.size
    n = arr.shape[0]
    want = pad_to_multiple(max(n, 1), n_dev)
    if want != n:
        pad = np.full((want - n,) + arr.shape[1:], pad_value, dtype=arr.dtype)
        arr = np.concatenate([arr, pad], axis=0)
    return jax.device_put(arr, frag_sharded(mesh))
