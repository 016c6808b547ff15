"""Splice-junction rescue: two-exon reads align with M..N..M CIGARs."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import kalign
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome, SeqRecord


def test_spliced_reads():
    rng = np.random.default_rng(29)
    n = 200_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    # plant canonical splice sites for a few synthetic introns
    g = Genome(["c1"], np.array([0]), np.array([n]), seq)
    idx_al = None
    recs, truths = [], []
    for i in range(15):
        start = 2_000 + i * 2_000
        split = 30 + (i * 9) % 40
        gap = 200 + i * 37
        # donor GT right after exon1, acceptor AG right before exon2
        seq[start + split] = 2       # G
        seq[start + split + 1] = 3   # T
        seq[start + split + gap - 2] = 0  # A
        seq[start + split + gap - 1] = 2  # G
        r = np.concatenate([seq[start:start + split],
                            seq[start + split + gap:start + split + gap
                                + (100 - split)]])
        recs.append(SeqRecord(f"sj{i}", "", r.copy()))
        truths.append((start, split, gap))
    idx = SfxIndex.build(g)
    al = kalign.KAligner(idx, batch_size=512, splice_max=10_000)
    out = list(al.align_records(recs))
    n_ok = 0
    for (rec, res), (start, split, gap) in zip(out, truths):
        if res.nar != kalign.NAR_ACCEPTED or res.cigar is None:
            continue
        import re
        m = re.fullmatch(r"(\d+)M(\d+)N(\d+)M", res.cigar)
        assert m, res.cigar
        s2, g2, r2 = map(int, m.groups())
        # junction may shift within repeated flanks; verify reconstruction
        recon = np.concatenate([
            g.seq[res.pos:res.pos + s2],
            g.seq[res.pos + s2 + g2:res.pos + s2 + g2 + r2]])
        np.testing.assert_array_equal(recon, rec.codes)
        assert res.pos == start
        n_ok += 1
    assert n_ok >= 12, n_ok
