"""PBA packing semantics and container roundtrip."""
import numpy as np

from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.kmer.pba import (concat_pba, load_pba, pba_from_counts,
                                pba_coverage_wig, save_pba, unpack_pba)


def test_scoring_thresholds():
    counts = np.array([
        [20, 0, 0, 0, 0],     # pure A, cov 20      -> A=3
        [10, 10, 0, 0, 0],    # 50/50 AC, cov 20    -> A=2 C=2
        [15, 4, 1, 0, 0],     # A .75 / C .2 / G .05 -> A=3 C=1 G=0
        [3, 1, 0, 0, 0],      # low cov: A .75 -> 2, C .25 -> 0
        [0, 0, 0, 0, 0],      # no coverage -> 0
        [0, 0, 0, 3, 0],      # low cov pure T -> T=2
    ], np.int64)
    pba = pba_from_counts(counts)
    sc = unpack_pba(pba)
    assert sc[0].tolist() == [3, 0, 0, 0]
    assert sc[1].tolist() == [2, 2, 0, 0]
    assert sc[2].tolist() == [3, 1, 0, 0]
    assert sc[3].tolist() == [2, 0, 0, 0]
    assert sc[4].tolist() == [0, 0, 0, 0]
    assert sc[5].tolist() == [0, 0, 0, 2]
    # bit layout: pure-A cov>=5 -> 0b11000000
    assert pba[0] == 0xC0


def test_container_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    g = Genome(["c1", "c2"], np.array([0, 101]), np.array([100, 50]),
               np.zeros(152, np.uint8))
    pba = rng.integers(0, 256, 152).astype(np.uint8)
    p = tmp_path / "t.pba.npz"
    save_pba(p, g, pba, readset="rs1")
    rs, chroms = load_pba(p)
    assert rs == "rs1"
    np.testing.assert_array_equal(chroms["c1"], pba[:100])
    np.testing.assert_array_equal(chroms["c2"], pba[101:151])
    # coverage wig + concat
    pba_coverage_wig(p, tmp_path / "c.wig")
    assert (tmp_path / "c.wig").read_text().startswith("track")
    concat_pba([p, p], tmp_path / "m.pba.npz")
    _, m = load_pba(tmp_path / "m.pba.npz")
    np.testing.assert_array_equal(m["c1"], chroms["c1"])
