"""benchmark scorer: correct / misaligned / unaligned accounting."""
import numpy as np

from kit4b_tpu.align.benchmark import score_sam
from kit4b_tpu.io.sam import SamAlignment, SamWriter


def _truth_name(i, chrom, start, L, strand, subs=0):
    return f"lcl|{i:08d}|{chrom}|{start}|{start+L-1}|{L}|{strand}|{subs}|0"


def test_scoring(tmp_path):
    p = tmp_path / "t.sam"
    with SamWriter(p, ["c1"], [10_000]) as w:
        # correct
        w.write(SamAlignment(_truth_name(1, "c1", 100, 100, "+"), 0, "c1",
                             101, 254, "100M"))
        # correct reverse
        w.write(SamAlignment(_truth_name(2, "c1", 300, 100, "-"), 16, "c1",
                             301, 254, "100M"))
        # wrong position
        w.write(SamAlignment(_truth_name(3, "c1", 500, 100, "+"), 0, "c1",
                             901, 254, "100M"))
        # wrong strand
        w.write(SamAlignment(_truth_name(4, "c1", 700, 100, "+"), 16, "c1",
                             701, 254, "100M"))
        # unaligned
        w.write(SamAlignment(_truth_name(5, "c1", 900, 100, "+"), 4, "*",
                             0, 0, "*"))
    r = score_sam(p)
    assert r.n_reads == 5
    assert r.n_aligned == 4
    assert r.n_correct == 2
    assert r.n_misaligned == 2
    assert r.n_loci_only == 1
    assert r.n_unaligned == 1
    assert r.bases_match == 200
    assert r.bases_misaligned == 200
    assert r.bases_unaligned == 100
    # default weights: 200*1 + 200*-2 + 100*-1
    assert r.score == 200 - 400 - 100
    s = r.summary()
    assert s["pct_correct_of_aligned"] == 50.0


def test_tolerance(tmp_path):
    p = tmp_path / "t.sam"
    with SamWriter(p, ["c1"], [10_000]) as w:
        w.write(SamAlignment(_truth_name(1, "c1", 100, 100, "+"), 0, "c1",
                             103, 254, "100M"))
    assert score_sam(p).n_correct == 0
    assert score_sam(p, tolerance=5).n_correct == 1
