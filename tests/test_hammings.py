"""hammings exhaustive sweep vs naive oracle."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.kmer import hammings


def _genome(n, seed, with_sentinels=True):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, n).astype(np.uint8)
    if with_sentinels:
        g[n // 2] = dna.BASE_EOS  # fake a chrom boundary
        g[-1] = dna.BASE_EOG
    return g


@pytest.mark.parametrize("K,n,anti", [(5, 120, False), (5, 120, True),
                                      (8, 300, True)])
def test_exhaustive_matches_oracle(K, n, anti):
    g = _genome(n, seed=K + n)
    got = hammings.hammings_exhaustive(g, K, antisense=anti)
    want = hammings.hammings_oracle(g, K, antisense=anti)
    np.testing.assert_array_equal(got[: n - K + 1], want[: n - K + 1])


def test_node_partition_merge():
    K, n = 6, 200
    g = _genome(n, seed=3)
    full = hammings.hammings_exhaustive(g, K)
    parts = [hammings.hammings_exhaustive(g, K, node=i, numnodes=3)
             for i in range(3)]
    merged = hammings.merge(*parts)
    np.testing.assert_array_equal(merged, full)


def test_with_n_bases():
    K, n = 5, 150
    g = _genome(n, seed=9, with_sentinels=False)
    g[20:24] = dna.BASE_N
    got = hammings.hammings_exhaustive(g, K)
    want = hammings.hammings_oracle(g, K)
    np.testing.assert_array_equal(got[: n - K + 1], want[: n - K + 1])


def test_kernel_interpret_matches_oracle():
    """Experimental Pallas kernel (interpret mode; hardware blocked on
    Mosaic dynamic-rotate support)."""
    from kit4b_tpu.kmer.hammings_kernel import hammings_exhaustive_tpu
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 1200).astype(np.uint8)
    g[600] = dna.BASE_EOS
    got = hammings_exhaustive_tpu(g, 25, tile=512, span=512, interpret=True)
    want = hammings.hammings_oracle(g, 25)
    np.testing.assert_array_equal(got[:1176].astype(int),
                                  want[:1176].astype(int))
