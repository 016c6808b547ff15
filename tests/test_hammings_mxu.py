"""MXU min-matmul hammings engine vs the naive oracle (XLA fallback path,
Pallas interpret path, node-partitioned merge, mesh row sharding)."""
import numpy as np
import pytest

from kit4b_tpu.kmer.hammings import hammings_oracle, merge
from kit4b_tpu.kmer.hammings_mxu import hammings_exhaustive_mxu


def _genome(n=900, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, n).astype(np.uint8)
    g[n // 3] = 7          # EOS chrom separator
    g[rng.integers(0, n, 8)] = 4   # N bases (valid, N==N matches)
    return g


@pytest.mark.parametrize("K", [7, 25])
@pytest.mark.parametrize("anti", [True, False])
def test_mxu_xla_matches_oracle(K, anti):
    g = _genome()
    want = hammings_oracle(g, K, antisense=anti)
    got = hammings_exhaustive_mxu(g, K, antisense=anti, use_pallas=False)
    assert np.array_equal(want, got)


def test_mxu_pallas_interpret_matches_oracle():
    g = _genome(700, seed=5)
    want = hammings_oracle(g, 25)
    got = hammings_exhaustive_mxu(g, 25, use_pallas=True, interpret=True)
    assert np.array_equal(want, got)


def test_mxu_node_partition_merge():
    g = _genome(1100, seed=7)
    full = hammings_exhaustive_mxu(g, 13, use_pallas=False)
    parts = [hammings_exhaustive_mxu(g, 13, use_pallas=False,
                                     node=i, numnodes=3) for i in range(3)]
    assert np.array_equal(full, merge(*parts))


def test_mxu_tiny_and_all_invalid():
    # genome shorter than K
    assert hammings_exhaustive_mxu(np.zeros(5, np.uint8), 9).shape == (5,)
    # all-sentinel genome: everything invalid
    g = np.full(300, 7, np.uint8)
    out = hammings_exhaustive_mxu(g, 9, use_pallas=False)
    assert (out == 0xFFFF).all()
