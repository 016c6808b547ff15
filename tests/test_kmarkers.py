"""kmarkers / prekmarkers / pseudogenome."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome, SeqRecord, write_fasta
from kit4b_tpu.kmer import kmarkers


@pytest.fixture(scope="module")
def cultivars(tmp_path_factory):
    """Two cultivars sharing most sequence; cultivar A carries a unique
    inserted segment."""
    d = tmp_path_factory.mktemp("cult")
    rng = np.random.default_rng(55)
    shared = rng.integers(0, 4, 40_000).astype(np.uint8)
    unique = rng.integers(0, 4, 600).astype(np.uint8)
    seq_a = np.concatenate([shared[:20_000], unique, shared[20_000:]])
    # cultivar B: shared sequence with scattered SNPs (~0.5%)
    seq_b = shared.copy()
    snp_idx = rng.choice(len(seq_b), 200, replace=False)
    seq_b[snp_idx] = (seq_b[snp_idx] + 1 + rng.integers(0, 3, 200)) % 4
    write_fasta(d / "a.fa", [SeqRecord("chrA", "", seq_a)])
    write_fasta(d / "b.fa", [SeqRecord("chrB", "", seq_b)])
    return d, seq_a, seq_b, unique


def test_pseudogenome(tmp_path, cultivars):
    d, seq_a, seq_b, unique = cultivars
    g, cc, names = kmarkers.build_pseudogenome(
        {"A": [d / "a.fa"], "B": [d / "b.fa"]})
    assert names == ["A", "B"]
    assert g.names == ["A.chrA", "B.chrB"]
    assert cc.tolist() == [0, 1]
    kmarkers.write_pseudogenome_bed(tmp_path / "pg.bed", g, cc, names)
    lines = (tmp_path / "pg.bed").read_text().splitlines()
    assert lines[0].split("\t")[0] == "A.chrA"
    assert lines[1].split("\t")[3] == "B"


def test_cultivar_markers(cultivars):
    d, seq_a, seq_b, unique = cultivars
    g, cc, names = kmarkers.build_pseudogenome(
        {"A": [d / "a.fa"], "B": [d / "b.fa"]})
    idx = SfxIndex.build(g)
    K = 50
    markers = kmarkers.find_cultivar_markers(
        idx, cc, target_cultivar=0, kmer_len=K, min_hamming=2,
        batch=2048)
    # markers must exist and cluster on the unique insert
    assert markers
    total_marker_bases = sum(m.length for m in markers)
    in_insert = [m for m in markers
                 if 20_000 - K < m.start < 20_600]
    # the unique 600bp insert must be (mostly) marked
    assert sum(m.length for m in in_insert) >= 400
    # no marker may have a <=1-mismatch match inside cultivar B
    gs_b = dna.decode(seq_b)
    for m in markers[:10]:
        s = dna.decode(m.seq[:K])
        assert s not in gs_b
        rc = dna.decode(dna.revcomp(m.seq[:K]))
        assert rc not in gs_b


def test_shared_prefix_markers(cultivars):
    d, seq_a, seq_b, unique = cultivars
    g, cc, names = kmarkers.build_pseudogenome(
        {"A": [d / "a.fa"], "B": [d / "b.fa"]})
    idx = SfxIndex.build(g)
    K = 25
    out = kmarkers.shared_prefix_markers(idx, cc, 2, kmer_len=K,
                                         min_cultivars=2)
    assert len(out) > 30_000  # most shared 25-mers present in both
    # spot check: reported kmers really occur in both cultivars
    gs_a = dna.decode(seq_a)
    gs_b = dna.decode(seq_b)
    for codes, counts in out[:20]:
        s = dna.decode(codes)
        assert counts[0] >= 1 and counts[1] >= 1
        assert s in gs_a and s in gs_b


def test_prefix_counts_match_bruteforce():
    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, 4, 300).astype(np.uint8) for _ in range(2)]
    chunks = []
    for s in seqs:
        chunks.append(s)
        chunks.append(np.array([dna.BASE_EOS], np.uint8))
    seq = np.concatenate(chunks)
    seq[-1] = dna.BASE_EOG
    g = Genome(["c0", "c1"], np.array([0, 301]), np.array([300, 300]), seq)
    idx = SfxIndex.build(g)
    K = 10
    rep, counts = kmarkers.prefix_kmer_counts(idx, np.array([0, 1]), 2,
                                              kmer_len=K)
    # brute force
    from collections import Counter
    want = {}
    for ci, s in enumerate(seqs):
        for i in range(300 - K + 1):
            key = dna.decode(s[i:i + K])
            want.setdefault(key, [0, 0])[ci] += 1
    got = {}
    for p, c in zip(rep, counts):
        got[dna.decode(g.seq[p:p + K])] = list(c)
    assert got == want


def test_snpmarkers(tmp_path):
    """Two cultivars aligned to the same assembly; divergent fixed alleles
    become markers; impure or low-coverage loci do not."""
    from kit4b_tpu.align.snp import SnpCall, write_snps_csv
    from kit4b_tpu.kmer.snpmarkers import find_snp_markers, \
        write_snp_markers_csv

    def call(chrom, loci, ref, counts, tot):
        c = np.zeros(5, np.int64)
        for b, n in counts.items():
            c["ACGTN".index(b)] = n
        nonref = tot - counts.get(ref, 0)
        return SnpCall(chrom, loci, "ACGT".index(ref), c, tot, nonref,
                       0.01, 1e-9)

    # cultivar A: fixed T at 100 (ref A), messy at 200, fixed G at 300
    a = [call("c1", 100, "A", {"T": 19, "A": 1}, 20),
         call("c1", 200, "C", {"G": 10, "C": 10}, 20),
         call("c1", 300, "A", {"G": 18, "A": 2}, 20)]
    # cultivar B: no SNP at 100 (imputed ref) -> divergent vs A's T
    #             fixed T at 300 -> divergent vs A's G
    b = [call("c1", 300, "A", {"T": 20}, 20)]
    pa, pb = tmp_path / "a.csv", tmp_path / "b.csv"
    write_snps_csv(pa, a)
    write_snps_csv(pb, b)
    markers = find_snp_markers({"A": pa, "B": pb})
    got = {(m.chrom, m.loci) for m in markers}
    assert got == {("c1", 100), ("c1", 300)}
    m100 = [m for m in markers if m.loci == 100][0]
    assert m100.alleles["A"][0] == "T" and m100.alleles["B"][0] == "A"
    m300 = [m for m in markers if m.loci == 300][0]
    assert m300.alleles["A"][0] == "G" and m300.alleles["B"][0] == "T"
    write_snp_markers_csv(tmp_path / "mk.csv", markers, ["A", "B"])
    assert len((tmp_path / "mk.csv").read_text().splitlines()) == 3


def test_prefix_counts_antisense():
    """shared_prefix_markers with antisense=True counts revcomp
    occurrences (GenKMerCultsCnts counts both strands)."""
    rng = np.random.default_rng(17)
    s0 = rng.integers(0, 4, 400).astype(np.uint8)
    K = 12
    kmer = s0[50:50 + K]
    # cultivar 1 contains ONLY the revcomp of that kmer
    s1 = rng.integers(0, 4, 400).astype(np.uint8)
    s1[100:100 + K] = dna.revcomp(kmer)
    seq = np.concatenate([s0, [dna.BASE_EOS], s1, [dna.BASE_EOG]])
    g = Genome(["c0", "c1"], np.array([0, 401]), np.array([400, 400]), seq)
    idx = SfxIndex.build(g)
    sense = kmarkers.shared_prefix_markers(idx, np.array([0, 1]), 2,
                                           kmer_len=K, min_cultivars=2,
                                           antisense=False)
    both = kmarkers.shared_prefix_markers(idx, np.array([0, 1]), 2,
                                          kmer_len=K, min_cultivars=2,
                                          antisense=True)
    key = dna.decode(kmer)
    sense_keys = {dna.decode(c) for c, _ in sense}
    both_keys = {dna.decode(c) for c, _ in both}
    # sense-only: the kmer is not shared (cult1 has only revcomp)
    assert key not in sense_keys
    # with antisense counting it becomes shared (or its revcomp does)
    rc_key = dna.decode(dna.revcomp(kmer))
    assert key in both_keys or rc_key in both_keys


def test_shared_prefix_suffix_homozygotic():
    """Homozygotic-constraint prekmarkers (-s/-S): prefixes whose suffix
    variants discriminate cultivars are reported; prefixes where >=2
    cultivars share an identical full prefix+suffix K-mer are rejected,
    verified against a brute-force scan (GenKMerCultsCnts documented
    contract, MarkerKMers.h:91; the reference's non-resetting accumulator
    is deliberately not replicated — see kmarkers docstring)."""
    import itertools

    from kit4b_tpu.kmer.kmarkers import (build_pseudogenome,
                                         shared_prefix_suffix_markers)
    rng = np.random.default_rng(21)
    P, S = 12, 6
    base = rng.integers(0, 4, 3000).astype(np.uint8)
    # cultivar B: same backbone but with SNPs every ~40 bp so most
    # suffixes differ; cultivar C unrelated
    B = base.copy()
    B[np.arange(20, len(B), 40)] = (B[np.arange(20, len(B), 40)] + 1) % 4
    C = rng.integers(0, 4, 3000).astype(np.uint8)
    d = {}
    import tempfile, os
    tmp = tempfile.mkdtemp()
    for nm, s in (("a", base), ("b", B), ("c", C)):
        p = os.path.join(tmp, nm + ".fa")
        with open(p, "w") as f:
            f.write(">" + nm + "\n"
                    + "".join("ACGT"[int(x)] for x in s) + "\n")
        d[nm] = [p]
    g, cc, names = build_pseudogenome(d)
    idx = SfxIndex.build(g, lut_k=8)
    out = shared_prefix_suffix_markers(
        idx, cc, len(names), prefix_len=P, suffix_len=S,
        min_cultivars=2, max_homozygotic=1, antisense=True)
    got = {bytes(codes) for codes, _ in out}

    # brute force of the documented contract
    def windows(seq):
        return {bytes(seq[i:i + P + S]): None
                for i in range(len(seq) - P - S + 1)}

    # variants are SENSE-occurring full K-mers (the reference walks the
    # suffix array); a cultivar is present at a variant when it carries
    # the variant sense-side OR its revcomp sense-side (the reference's
    # IterateExacts(revcomp) antisense lookup)
    from collections import defaultdict
    sense_by_cult = []
    for s in (base, B, C):
        sense_by_cult.append({bytes(s[i:i + P + S])
                              for i in range(len(s) - P - S + 1)})
    all_variants = set().union(*sense_by_cult)
    pref_cults = defaultdict(set)
    pref_maxhomo = defaultdict(int)
    for w in all_variants:
        wrc = bytes(dna.revcomp(np.frombuffer(w, np.uint8)))
        cs = {ci for ci, wins in enumerate(sense_by_cult)
              if w in wins or wrc in wins}
        pref = w[:P]
        pref_cults[pref] |= cs
        pref_maxhomo[pref] = max(pref_maxhomo[pref], len(cs))
    truth = {p for p in pref_cults
             if len(pref_cults[p]) >= 2 and pref_maxhomo[p] <= 1}
    assert got == truth
    assert len(got) > 10
