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


def test_scaffold_seq_aware(tmp_path):
    """Sequence-aware scaffold: contigs + raw PE reads (no SAM). Pairs
    sampled from a source genome spanning the inter-contig gap must join
    the contigs in the right order/orientation with an estimated gap."""
    from kit4b_tpu.io.fasta import write_fasta
    g = _genome(12_000, seed=29)
    ctg1 = g.seq[0:5_000]
    ctg2 = g.seq[5_150:11_000]   # 150bp true gap
    write_fasta(tmp_path / "ctgs.fa",
                [SeqRecord("ctg1", "", ctg1), SeqRecord("ctg2", "", ctg2)])
    # PE pairs straddling the junction: mate1 fwd near ctg1's end, mate2
    # revcomp near ctg2's start; true source insert spans the 150bp gap
    rl = 100
    pe1, pe2 = [], []
    for i in range(10):
        p1 = 4_650 + 5 * i             # ctg1 coords (d1 = 5000 - p1)
        p2 = 45 + 5 * i                # ctg2 coords (d2 = p2 + rl)
        pe1.append(SeqRecord(f"p{i}", "", ctg1[p1:p1 + rl].copy()))
        pe2.append(SeqRecord(f"p{i}", "",
                             dna.revcomp(ctg2[p2:p2 + rl])))
    write_fasta(tmp_path / "pe1.fa", pe1)
    write_fasta(tmp_path / "pe2.fa", pe2)
    from kit4b_tpu.assembly.scaffold import ScaffoldParams, scaffold_contigs
    # true source insert: (5150 + p2 + rl) - p1 = 645 for every pair
    paths, recs = scaffold_contigs(
        tmp_path / "ctgs.fa", tmp_path / "pe1.fa", tmp_path / "pe2.fa",
        tmp_path / "scaf.fa", ScaffoldParams(insert_size=645))
    joined = [p for p in paths
              if len([e for e in p if e[0] != ""]) == 2]
    assert joined, paths
    names = [n for n, _ in joined[0] if n != ""]
    assert set(names) == {"ctg1", "ctg2"}
    rec = [r for r in recs if len(r.codes) > 10_000][0]
    s = dna.decode(rec.codes)
    assert "N" * 10 in s
    # gap estimate must recover the true 150bp (all pairs agree exactly)
    gap_len = s.count("N")
    assert 130 <= gap_len <= 170, gap_len
    # orientation: scaffold must equal ctg1 + Ns + ctg2 (both forward)
    assert s.startswith(dna.decode(ctg1)[:200]) or \
        s.endswith(dna.decode(dna.revcomp(ctg1))[-200:]) or \
        dna.decode(ctg1)[:200] in s


def test_near_duplicates():
    """Reads identical up to 2 subs are flagged; distinct reads survive."""
    rng = np.random.default_rng(71)
    base = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(15)]
    reads = []
    n_dups = 0
    for i, b in enumerate(base):
        reads.append(b)
        if i % 3 == 0:          # add a 2-sub near-dup of every third read
            d = b.copy()
            pos = rng.choice(100, 2, replace=False)
            d[pos] = (d[pos] + 1) % 4
            reads.append(d)
            n_dups += 1
    st = SeqStore.from_arrays(reads)
    n = filt.mark_near_duplicates(st, max_subs=2)
    assert n == n_dups, (n, n_dups)
    live = st.live_mask()
    assert live.sum() == len(base)
    # survivors are exactly the originals (lower ids kept)
    for i, b in enumerate(base):
        found = any(live[j] and len(st.get(j)) == 100
                    and np.array_equal(st.get(j), b)
                    for j in range(len(reads)))
        assert found


def test_near_duplicates_spared_when_distant():
    rng = np.random.default_rng(72)
    a = rng.integers(0, 4, 80).astype(np.uint8)
    b = a.copy()
    pos = rng.choice(np.arange(20, 80), 5, replace=False)  # keep seed intact
    b[pos] = (b[pos] + 1) % 4    # 5 subs > max 2
    st = SeqStore.from_arrays([a, b])
    n = filt.mark_near_duplicates(st, max_subs=2)
    assert n == 0
    assert st.live_mask().sum() == 2


def test_merge_pe_to_se():
    """Short-insert PE pairs whose mates overlap merge to full fragments."""
    g = _genome(3_000, seed=91)
    rl, insert = 100, 160   # 40bp mate overlap
    arrays, mate = [], []
    for k, s in enumerate(range(0, 2_000, 200)):
        frag = g.seq[s:s + insert]
        j = len(arrays)
        arrays.append(frag[:rl].copy())
        arrays.append(dna.revcomp(frag[-rl:]))
        mate.extend([j + 1, j])
    st = SeqStore.from_arrays(arrays, mate=np.asarray(mate, np.int64))
    out, n = asm.merge_pe_to_se(st, min_overlap=20)
    assert n == 10
    assert out.mate is None or (out.mate < 0).all()
    assert len(out) == 10
    for i in range(len(out)):
        s = out.get(i)
        assert len(s) == insert
        # merged SE equals the true fragment
        found = any(np.array_equal(s, g.seq[x:x + insert])
                    for x in range(0, 2_000, 200))
        assert found


def test_assemble_pe_aware():
    """PE reads (non-overlapping pairs) still assemble; pairs whose flanks
    grow to overlap are converted to SE during passes."""
    g = _genome(8_000, seed=93)
    rl, insert = 100, 220
    arrays, mate = [], []
    for s in range(0, 8_000 - insert, 30):
        frag = g.seq[s:s + insert]
        j = len(arrays)
        arrays.append(frag[:rl].copy())
        arrays.append(dna.revcomp(frag[-rl:]))
        mate.extend([j + 1, j])
    st = SeqStore.from_arrays(arrays, mate=np.asarray(mate, np.int64))
    out = asm.assemble(st, asm.AssembleParams(min_overlap=40, max_passes=12))
    lens = sorted((int(out.lengths[i]) for i in range(len(out))),
                  reverse=True)
    assert lens[0] > 6_000, lens[:5]
    big = out.get(int(np.argmax(out.lengths)))
    gs = dna.decode(g.seq[:8_000])
    assert dna.decode(big) in gs or dna.decode(dna.revcomp(big)) in gs
