"""Bisulfite alignment (kalign -b capability, two-collapsed-index design)."""
import numpy as np

import conftest  # noqa: F401

from kit4b_tpu import dna
from kit4b_tpu.align.bisulfite import (BsAligner, BsIndex, collapse_ct,
                                       collapse_ga)
from kit4b_tpu.io.fasta import Genome


def _genome(n=120_000, seed=17):
    rng = np.random.default_rng(seed)
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    return Genome(["c1"], np.array([0]), np.array([n]), seq)


def _bis_convert(frag, strand, rng, meth_rate=0.2):
    """Simulate bisulfite chemistry: on the sequenced strand unmethylated
    Cs read as T. frag is watson-orientation genome sequence."""
    if strand == 0:
        r = frag.copy()
    else:
        r = dna.revcomp(frag)          # crick strand sequence
    c = r == 1
    conv = c & (rng.random(len(r)) > meth_rate)
    r = r.copy()
    r[conv] = 3
    return r


def test_collapse_maps():
    x = np.array([0, 1, 2, 3, 4, 15], np.uint8)
    assert list(collapse_ct(x)) == [0, 3, 2, 3, 4, 15]
    assert list(collapse_ga(x)) == [0, 1, 0, 3, 4, 15]


def test_bisulfite_alignment_both_strands():
    g = _genome()
    idx = BsIndex.build(g)
    rng = np.random.default_rng(3)
    reads, truth = [], []
    for i in range(128):
        p = int(rng.integers(0, 119_000))
        s = int(rng.integers(0, 2))
        frag = g.seq[p:p + 100]
        r = _bis_convert(frag, s, rng)
        # a couple of real sequencing errors
        for _ in range(2):
            j = int(rng.integers(0, 100))
            r = r.copy()
            r[j] = (r[j] + 1) % 4
        reads.append(r)
        truth.append((p, s))
    al = BsAligner(idx, batch_size=128)
    raw = al.align_batch_raw(np.stack(reads))
    acc = raw["nar"] == 0
    assert acc.mean() > 0.9, f"only {acc.mean():.0%} accepted"
    ok = sum(1 for i in np.nonzero(acc)[0]
             if (int(raw["pos"][i]), int(raw["strand"][i])) == truth[i])
    assert ok == acc.sum(), f"{acc.sum() - ok} misplaced"


def test_bisulfite_index_roundtrip(tmp_path):
    g = _genome(30_000, seed=4)
    idx = BsIndex.build(g)
    idx.save(tmp_path / "g.kbx")
    idx2 = BsIndex.load(tmp_path / "g.kbx")
    np.testing.assert_array_equal(idx.ct.sa_clean, idx2.ct.sa_clean)
    np.testing.assert_array_equal(idx.ga.lut, idx2.ga.lut)
    assert idx2.lut_k == idx.lut_k
