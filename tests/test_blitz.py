"""blitz local aligner: long queries located correctly."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import blitz
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome, SeqRecord


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(91)
    n = 300_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["cA"], np.array([0]), np.array([n]), seq)
    return SfxIndex.build(g)


def test_blitz_exact_and_divergent(index):
    g = index.genome
    rng = np.random.default_rng(3)
    queries = []
    truths = []
    for i, (start, ln, div, rev) in enumerate(
            [(5_000, 2_000, 0.0, False), (50_000, 5_000, 0.02, False),
             (120_000, 3_000, 0.01, True)]):
        q = g.seq[start:start + ln].copy()
        nmut = int(ln * div)
        if nmut:
            idx = rng.choice(ln, nmut, replace=False)
            q[idx] = (q[idx] + 1) % 4
        if rev:
            q = dna.revcomp(q)
        queries.append(SeqRecord(f"q{i}", "", q))
        truths.append((start, ln, "-" if rev else "+"))
    hits = blitz.blitz_align(index, queries)
    by_q = {}
    for h in hits:
        by_q.setdefault(h.query, []).append(h)
    for i, (start, ln, strand) in enumerate(truths):
        hs = by_q[f"q{i}"]
        best = hs[0]
        assert best.strand == strand
        assert abs(best.t_start - start) < 50
        assert best.matches > 0.9 * ln
        assert best.q_end - best.q_start > 0.9 * ln


def test_blitz_no_hit(index):
    rng = np.random.default_rng(4)
    q = SeqRecord("rand", "", rng.integers(0, 4, 500).astype(np.uint8))
    hits = blitz.blitz_align(index, [q])
    # random 500bp won't chain 3+ seeds on one diagonal
    assert not hits


def test_psl_output(tmp_path, index):
    g = index.genome
    q = SeqRecord("qq", "", g.seq[1000:3000].copy())
    hits = blitz.blitz_align(index, [q])
    blitz.write_psl(tmp_path / "o.psl", hits, {"qq": 2000},
                    {n: int(l) for n, l in zip(g.names, g.lengths)})
    txt = (tmp_path / "o.psl").read_text()
    assert txt.startswith("psLayout version 3")
    assert "\tqq\t" in txt.splitlines()[-1]

def test_blitz_gapped_spans_indel(index):
    """A query with a deletion relative to the target: ungapped chaining
    splits it into two blocks; gapped refinement must produce one hit
    whose blocks bridge the gap and report gap accounting."""
    g = index.genome
    start, ln = 200_000, 3_000
    t = g.seq[start:start + ln]
    # query = target with the middle 40bp deleted (target gap)
    q = np.concatenate([t[:1500], t[1540:]])
    hits = blitz.blitz_align(index, [SeqRecord("gq", "", q)], gapped=True)
    assert hits
    best = hits[0]
    assert best.strand == "+"
    assert abs(best.t_start - start) < 20
    # alignment must span both sides of the deletion
    assert best.t_end - best.t_start > 0.95 * ln
    assert best.q_end - best.q_start > 0.95 * len(q)
    assert best.t_gaps >= 1 and best.t_gap_bases >= 30
    assert best.blocks and len(best.blocks) >= 2
    # blocks are consistent: each block matches target bases
    for qb, tb, bl in best.blocks:
        assert np.array_equal(q[qb:qb + bl], g.seq[tb:tb + bl])


def test_psl_gapped_blocks(tmp_path, index):
    g = index.genome
    t = g.seq[10_000:12_000]
    q = np.concatenate([t[:1000], t[1030:]])
    hits = blitz.blitz_align(index, [SeqRecord("gq", "", q)], gapped=True)
    blitz.write_psl(tmp_path / "o.psl", hits, {"gq": len(q)},
                    {n: int(l) for n, l in zip(g.names, g.lengths)})
    row = (tmp_path / "o.psl").read_text().splitlines()[-1].split("\t")
    # tNumInsert/tBaseInsert columns populated, blockCount >= 2
    assert int(row[6]) >= 1 and int(row[7]) >= 20
    assert int(row[17]) >= 2


import os as _os
import subprocess as _sp

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_REFBIN = _os.path.join(_REPO, ".refbin", "ngskit4b")


@pytest.mark.golden
@pytest.mark.skipif(not _os.path.exists(_REFBIN),
                    reason="reference binary not built (.refbin)")
def test_golden_blitz_indel_query(tmp_path, index):
    """Gapped blitz vs the reference binary on an indel-dense query: both
    must span the deletion as one high-scoring gapped alignment covering
    the same target range (HighScoreSW parity, CBlitz.cpp:1560)."""
    from kit4b_tpu.io.fasta import SeqRecord, write_fasta
    g = index.genome
    # query: 600 bp of target with a 12 bp deletion at 300
    t0 = 5000
    q = np.concatenate([g.seq[t0:t0 + 300], g.seq[t0 + 312:t0 + 612]])
    write_fasta(tmp_path / "q.fa", [SeqRecord("q1", "", q)])
    with open(tmp_path / "t.fa", "w") as f:
        f.write(">c1\n")
        s = "".join("ACGTN"[min(int(b), 4)] for b in g.seq[:-1])
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    _sp.run([_REFBIN, "index", "-i", str(tmp_path / "t.fa"),
             "-o", str(tmp_path / "t.sfx"), "-r", "bz", "-T2"],
            check=True, capture_output=True)
    _sp.run([_REFBIN, "blitz", "-i", str(tmp_path / "q.fa"),
             "-I", str(tmp_path / "t.sfx"),
             "-o", str(tmp_path / "ref.psl"), "-T2"],
            check=True, capture_output=True)
    ref_rows = []
    for line in open(tmp_path / "ref.psl"):
        c = line.rstrip("\n").split("\t")
        if len(c) > 16 and c[0].isdigit():
            ref_rows.append(c)
    assert ref_rows, "reference blitz produced no alignments"
    best = max(ref_rows, key=lambda c: int(c[0]))
    r_tstart, r_tend = int(best[15]), int(best[16])

    hits = blitz.blitz_align(index, [SeqRecord("q1", "", q)], gapped=True)
    assert hits
    h = max(hits, key=lambda x: x.score)
    # same spanned target range (within the SW band margin) and the
    # deletion accounted as target gap bases
    assert abs(h.t_start - r_tstart) <= 16
    assert abs(h.t_end - r_tend) <= 16
    assert h.t_gap_bases >= 10
    assert h.q_end - h.q_start >= 590
