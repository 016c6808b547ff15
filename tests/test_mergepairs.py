"""mergeoverlaps: overlapping PE pairs merged into full-fragment SE reads."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.assembly.mergepairs import MergeParams, merge_pairs
from kit4b_tpu.io.fasta import SeqRecord


def test_merge_short_inserts():
    rng = np.random.default_rng(6)
    frags = [rng.integers(0, 4, ln).astype(np.uint8)
             for ln in (150, 160, 170, 300)]
    r1, r2 = [], []
    L = 100
    for i, f in enumerate(frags):
        r1.append(SeqRecord(f"p{i}", "", f[:L].copy()))
        r2.append(SeqRecord(f"p{i}", "", dna.revcomp(f[-L:])))
    merged, kept, stats = merge_pairs(r1, r2)
    # fragments 150/160/170 overlap (o=50/40/30); 300 has no overlap... but
    # random 100-mers could still chance-overlap >=16bp? improbable at 5% subs
    assert stats["merged"] == 3
    assert stats["unmerged"] == 1
    by_name = {m.name: m for m in merged}
    for i, f in enumerate(frags[:3]):
        m = by_name[f"p{i}"]
        np.testing.assert_array_equal(m.codes, f)


def test_merge_with_errors_and_quality():
    rng = np.random.default_rng(9)
    f = rng.integers(0, 4, 150).astype(np.uint8)
    L = 100
    c1 = f[:L].copy()
    c2 = dna.revcomp(f[-L:])
    # error in mate1's overlap zone with low quality; mate2 high quality
    c1[80] = (c1[80] + 1) % 4  # position 80 lies in the 50bp overlap
    q1 = np.full(L, 20, np.uint8)
    q2 = np.full(L, 35, np.uint8)
    r1 = [SeqRecord("e", "", c1, q1)]
    r2 = [SeqRecord("e", "", c2, q2)]
    merged, kept, stats = merge_pairs(r1, r2)
    assert stats["merged"] == 1
    np.testing.assert_array_equal(merged[0].codes, f)  # consensus fixed it


def test_adapter_trimming():
    from kit4b_tpu.assembly.contaminants import (DEFAULT_ADAPTERS,
                                                 TrimStats, trim_adapters)
    rng = np.random.default_rng(12)
    ad = dna.encode(DEFAULT_ADAPTERS["TruSeq_R1"])
    recs = []
    # read-through: 70bp genome + full adapter + junk
    body = rng.integers(0, 4, 70).astype(np.uint8)
    recs.append(SeqRecord("rt", "", np.concatenate(
        [body, ad, rng.integers(0, 4, 10).astype(np.uint8)])[:100]))
    # partial adapter at tail (12bp of adapter)
    body2 = rng.integers(0, 4, 88).astype(np.uint8)
    recs.append(SeqRecord("pt", "", np.concatenate([body2, ad[:12]])))
    # clean read
    clean = rng.integers(0, 4, 100).astype(np.uint8)
    recs.append(SeqRecord("cl", "", clean))
    # read that would drop below min_len
    recs.append(SeqRecord("sh", "", np.concatenate(
        [rng.integers(0, 4, 10).astype(np.uint8), ad, ad])[:80]))
    out, st = trim_adapters(recs, min_len=30)
    byname = {r.name: r for r in out}
    assert len(byname["rt"].codes) == 70
    np.testing.assert_array_equal(byname["rt"].codes, body)
    assert len(byname["pt"].codes) == 88
    assert len(byname["cl"].codes) == 100
    assert "sh" not in byname
    assert st.trimmed3 >= 2 and st.dropped == 1
