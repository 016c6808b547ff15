"""FM-index (CFMIndex parity): count/locate/extract."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.index.fm_index import FMIndex


def test_count_locate_extract():
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 4, 3000).astype(np.uint8)
    seq[1000:1012] = seq[200:212]          # planted duplicate
    fm = FMIndex.build(seq)
    pat = seq[200:212]
    assert fm.count(pat) >= 2
    loc = fm.locate(pat)
    assert 200 in loc and 1000 in loc
    # oracle comparison on several random patterns
    for _ in range(10):
        s = int(rng.integers(0, 2950))
        ln = int(rng.integers(8, 25))
        pat = seq[s:s + ln]
        truth = [i for i in range(len(seq) - ln + 1)
                 if np.array_equal(seq[i:i + ln], pat)]
        loc = fm.locate(pat)
        assert loc.tolist() == truth
    # extraction recovers the original text
    got = fm.extract(500, 40)
    assert np.array_equal(got, seq[500:540])


def test_count_absent_and_with_n():
    seq = dna.encode("ACGTACGTNNACGT")
    fm = FMIndex.build(seq)
    assert fm.count(dna.encode("ACGT")) == 3
    assert fm.count(dna.encode("TTTTT")) == 0
