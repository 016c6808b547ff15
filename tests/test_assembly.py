"""filter -> assemb -> pescaffold pipeline on a simulated genome."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.assembly import assemble as asm
from kit4b_tpu.assembly import filter as filt
from kit4b_tpu.assembly import scaffold as scaf
from kit4b_tpu.assembly.store import SeqStore
from kit4b_tpu.io.fasta import Genome, SeqRecord
from kit4b_tpu.sim import simreads


def _genome(n=20_000, seed=41):
    rng = np.random.default_rng(seed)
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    return Genome(["g1"], np.array([0]), np.array([n]), seq)


def test_store_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arrays = [rng.integers(0, 4, rng.integers(50, 120)).astype(np.uint8)
              for _ in range(20)]
    st = SeqStore.from_arrays(arrays)
    st.save(tmp_path / "st.npz")
    st2 = SeqStore.load(tmp_path / "st.npz")
    for i in range(20):
        np.testing.assert_array_equal(st.get(i), st2.get(i))


def test_dedup():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 4, 80).astype(np.uint8)
    b = rng.integers(0, 4, 80).astype(np.uint8)
    st = SeqStore.from_arrays([a, b, a.copy(), a.copy(), b.copy()])
    n = filt.mark_duplicates(st)
    assert n == 3
    st = st.compact()
    assert len(st) == 2


def test_pe_dedup():
    rng = np.random.default_rng(3)
    a1 = rng.integers(0, 4, 80).astype(np.uint8)
    a2 = rng.integers(0, 4, 80).astype(np.uint8)
    b1 = rng.integers(0, 4, 80).astype(np.uint8)

    class R:
        def __init__(self, c):
            self.codes = c
            self.qual = None

    st = SeqStore.from_records([R(a1), R(a1), R(b1)],
                               [R(a2), R(a2), R(a2)])
    n = filt.mark_duplicates(st, pe=True)
    assert n == 2  # one duplicated pair
    st = st.compact()
    assert len(st) == 4


def test_assemble_recovers_genome():
    g = _genome()
    # perfect 100bp reads tiled every 25bp, both strands
    reads = []
    rng = np.random.default_rng(7)
    for s in range(0, 20_000 - 100 + 1, 25):
        r = g.seq[s:s + 100].copy()
        if rng.random() < 0.5:
            r = dna.revcomp(r)
        reads.append(r)
    st = SeqStore.from_arrays(reads)
    out = asm.assemble(st, asm.AssembleParams(min_overlap=40,
                                              max_passes=12))
    lens = sorted((int(out.lengths[i]) for i in range(len(out))),
                  reverse=True)
    # genome should reassemble into very few contigs covering ~everything
    assert lens[0] > 15_000, lens[:5]
    assert sum(lens) < 1.2 * 20_000
    # the largest contig matches the genome (either strand)
    big = out.get(int(np.argmax(out.lengths)))
    gs = dna.decode(g.seq[:20_000])
    s1 = dna.decode(big)
    s2 = dna.decode(dna.revcomp(big))
    assert s1 in gs or s2 in gs


def test_filter_unsupported():
    g = _genome(5_000, seed=9)
    reads = [g.seq[s:s + 100].copy() for s in range(0, 4_900, 20)]
    rng = np.random.default_rng(5)
    junk = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(10)]
    st = SeqStore.from_arrays(reads + junk)
    p = filt.FilterParams(min_overlap_pct=50)
    n = filt.mark_unsupported(st, p)
    assert n >= 8  # junk reads lack support
    live = st.live_mask()
    assert live[: len(reads)].sum() >= len(reads) - 2


def test_pescaffold(tmp_path):
    # two contigs from one genome region; PE pairs straddling the gap
    g = _genome(6_000, seed=13)
    ctg1 = g.seq[0:2_500]
    ctg2 = g.seq[2_700:5_500]
    from kit4b_tpu.io.fasta import write_fasta
    write_fasta(tmp_path / "ctgs.fa",
                [SeqRecord("ctg1", "", ctg1), SeqRecord("ctg2", "", ctg2)])
    # simulate pairs spanning the junction: mate1 near end of ctg1 (fwd),
    # mate2 near start of ctg2 (rev)
    from kit4b_tpu.io.sam import SamAlignment, SamWriter
    with SamWriter(tmp_path / "pe1.sam", ["ctg1", "ctg2"],
                   [len(ctg1), len(ctg2)]) as w1, \
         SamWriter(tmp_path / "pe2.sam", ["ctg1", "ctg2"],
                   [len(ctg1), len(ctg2)]) as w2:
        for i in range(5):
            w1.write(SamAlignment(f"p{i}", 0x41, "ctg1", 2_300 + i, 254,
                                  "100M"))
            w2.write(SamAlignment(f"p{i}", 0x91, "ctg2", 100 + i, 254,
                                  "100M"))
    paths, recs = scaf.pescaffold(tmp_path / "pe1.sam", tmp_path / "pe2.sam",
                                  tmp_path / "ctgs.fa",
                                  tmp_path / "scaf.fa")
    joined = [p for p in paths if len(p) == 2]
    assert joined, paths
    names = [n for n, _ in joined[0]]
    assert set(names) == {"ctg1", "ctg2"}
    # scaffolded record contains both contigs separated by Ns
    rec = [r for r in recs if len(r.codes) > 5_000][0]
    s = dna.decode(rec.codes)
    assert "N" * 10 in s
