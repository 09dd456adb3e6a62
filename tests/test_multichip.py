"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from gsalign_tpu.genome.packing import Genome
from gsalign_tpu.index.fmindex import build_fmindex
from gsalign_tpu.ops.rank import DeviceFMIndex
from gsalign_tpu.ops.seeding import find_seeds
from gsalign_tpu.parallel import mesh as mesh_lib
from tests.helpers import random_genome


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    ref = random_genome(rng, 3000)
    g = Genome(names=["c"], lengths=np.asarray([len(ref)]),
               offsets=np.asarray([0]), holes=[], codes_fwd=ref)
    fm = build_fmindex(g, sa_intv=8, prefer_device=False)
    qry = ref.copy()
    subs = rng.random(len(qry)) < 0.02
    qry[subs] = (qry[subs] + 1) % 4
    return fm, qry.astype(np.uint8)


def test_sharded_seeding_matches_unsharded(setup):
    fm, qry = setup
    dfm = DeviceFMIndex.from_host(fm)
    base = find_seeds(dfm, qry, min_seed_length=12, chunk=500)
    mesh = mesh_lib.make_mesh(jax.devices()[:8])
    sharded = find_seeds(dfm, qry, min_seed_length=12, chunk=500, mesh=mesh)
    for a, b in zip(base, sharded):
        np.testing.assert_array_equal(a, b)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(8, len(jax.devices())))
