import numpy as np
import pytest

from gsalign_tpu.index.suffix_array import (build_suffix_array_jax,
                                            build_suffix_array_np)
from tests.helpers import naive_suffix_array, random_genome


@pytest.mark.parametrize("n", [1, 2, 7, 100, 1000])
def test_np_suffix_array_matches_naive(n):
    rng = np.random.default_rng(n)
    codes = random_genome(rng, n)
    np.testing.assert_array_equal(build_suffix_array_np(codes),
                                  naive_suffix_array(codes))


def test_np_suffix_array_repetitive():
    codes = np.tile(np.array([0, 1, 2, 3], dtype=np.uint8), 64)
    np.testing.assert_array_equal(build_suffix_array_np(codes),
                                  naive_suffix_array(codes))
    codes = np.zeros(257, dtype=np.uint8)   # all-A
    np.testing.assert_array_equal(build_suffix_array_np(codes),
                                  naive_suffix_array(codes))


@pytest.mark.parametrize("n", [50, 1000, 20000])
def test_jax_suffix_array_matches_np(n):
    rng = np.random.default_rng(n + 1)
    codes = random_genome(rng, n)
    np.testing.assert_array_equal(build_suffix_array_jax(codes),
                                  build_suffix_array_np(codes))


def test_jax_suffix_array_repetitive():
    codes = np.tile(np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8), 500)
    np.testing.assert_array_equal(build_suffix_array_jax(codes),
                                  build_suffix_array_np(codes))


def test_native_sais_matches_naive():
    from gsalign_tpu.index.suffix_array import build_suffix_array_native
    for n in [1, 7, 100, 3000]:
        rng = np.random.default_rng(n + 5)
        codes = random_genome(rng, n)
        got = build_suffix_array_native(codes)
        if got is None:
            import pytest
            pytest.skip("native lib unavailable")
        np.testing.assert_array_equal(got, naive_suffix_array(codes))
    reps = np.tile(np.array([0, 1, 0], dtype=np.uint8), 500)
    np.testing.assert_array_equal(build_suffix_array_native(reps),
                                  naive_suffix_array(reps))
