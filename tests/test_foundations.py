"""Foundations: codecs, fasta/fastq IO, suffix array, index LUT."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.io import fasta
from kit4b_tpu.index.sa_build import build_suffix_array, suffix_array_doubling
from kit4b_tpu.index.sfx_index import SfxIndex, pick_lut_k


def test_codec_roundtrip():
    s = "ACGTNacgtn-"
    codes = dna.encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 6]
    assert dna.decode(codes) == "ACGTNACGTN-"


def test_revcomp():
    assert dna.decode(dna.revcomp(dna.encode("ACGTN"))) == "NACGT"
    assert dna.decode(dna.complement(dna.encode("ACGT"))) == "TGCA"


def test_fasta_roundtrip(tmp_path):
    recs = [
        fasta.SeqRecord("chr1", "descr here", dna.encode("ACGTACGTNNACGT")),
        fasta.SeqRecord("chr2", "", dna.encode("TTTTGGGGCCCCAAAA" * 20)),
    ]
    p = tmp_path / "t.fa"
    fasta.write_fasta(p, recs, wrap=13)
    back = list(fasta.read_fasta(p))
    assert [r.name for r in back] == ["chr1", "chr2"]
    assert back[0].descr == "descr here"
    for a, b in zip(recs, back):
        np.testing.assert_array_equal(a.codes, b.codes)


def test_fastq_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    recs = [
        fasta.SeqRecord(f"r{i}", "", rng.integers(0, 4, 50).astype(np.uint8),
                        rng.integers(2, 40, 50).astype(np.uint8))
        for i in range(5)
    ]
    p = tmp_path / "t.fq.gz"
    fasta.write_fastq(p, recs)
    back = list(fasta.read_fastq(p))
    assert fasta.sniff_format(p) == "fastq"
    for a, b in zip(recs, back):
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.qual, b.qual)


def test_suffix_array_matches_oracle():
    rng = np.random.default_rng(7)
    for n in (1, 2, 50, 500):
        t = rng.integers(0, 5, n).astype(np.uint8)
        sa = build_suffix_array(t)
        oracle = sorted(range(n), key=lambda i: t[i:].tobytes())
        assert sa.tolist() == oracle
        assert suffix_array_doubling(t).tolist() == oracle


def test_genome_concat_and_locate(tmp_path):
    recs = [fasta.SeqRecord("a", "", dna.encode("ACGT")),
            fasta.SeqRecord("b", "", dna.encode("GGGG"))]
    p = tmp_path / "g.fa"
    fasta.write_fasta(p, recs)
    g = fasta.Genome.load(p)
    assert g.names == ["a", "b"]
    assert g.total_len == 8
    assert g.seq[4] == dna.BASE_EOS
    assert g.seq[-1] == dna.BASE_EOG
    ci, off = g.locate(np.array([0, 3, 5, 8]))
    assert ci.tolist() == [0, 0, 1, 1]
    assert off.tolist() == [0, 3, 0, 3]


def test_sfx_index_lut(tmp_path):
    rng = np.random.default_rng(11)
    seq = rng.integers(0, 4, 5000).astype(np.uint8)
    seq[100:110] = dna.BASE_N  # an N run
    recs = [fasta.SeqRecord("c1", "", seq)]
    p = tmp_path / "g.fa"
    fasta.write_fasta(p, recs)
    g = fasta.Genome.load(p)
    idx = SfxIndex.build(g)
    k = idx.lut_k
    assert k == 8  # clamp floor
    # every clean k-mer position must be findable through the LUT
    for pos in [0, 50, 200, 4990 - k]:
        kmer = g.seq[pos:pos + k]
        if (kmer >= 4).any():
            continue
        key = dna.kmer_codes_to_int(kmer)
        lo, hi = int(idx.lut[key]), int(idx.lut[key + 1])
        hits = idx.sa_clean[lo:hi]
        assert pos in hits.tolist()
        # all bucket entries really start with this k-mer
        for h in hits:
            np.testing.assert_array_equal(g.seq[h:h + k], kmer)
    # positions overlapping the N run must not be indexed
    bad = set(range(100 - k + 1, 110))
    assert not (set(idx.sa_clean.tolist()) & bad)


def test_sfx_index_save_load(tmp_path):
    rng = np.random.default_rng(13)
    seq = rng.integers(0, 4, 2000).astype(np.uint8)
    g = fasta.Genome(["x"], np.array([0]), np.array([2000]),
                     np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8))
    idx = SfxIndex.build(g)
    p = tmp_path / "t.kix.npz"
    idx.save(p)
    idx2 = SfxIndex.load(p)
    assert idx2.lut_k == idx.lut_k
    np.testing.assert_array_equal(idx2.sa_clean, idx.sa_clean)
    np.testing.assert_array_equal(idx2.lut, idx.lut)
    np.testing.assert_array_equal(idx2.genome.seq, idx.genome.seq)
    assert idx2.genome.names == ["x"]


def test_pick_lut_k():
    assert pick_lut_k(1000) == 8
    assert pick_lut_k(4_600_000) == 12
    assert pick_lut_k(3_000_000_000) == 13


def test_readstats(tmp_path):
    from kit4b_tpu.align.readstats import compute_readstats, \
        write_readstats_csv
    rng = np.random.default_rng(4)
    recs = [fasta.SeqRecord(f"r{i}", "",
                            rng.integers(0, 4, 80).astype(np.uint8),
                            rng.integers(5, 40, 80).astype(np.uint8))
            for i in range(50)]
    recs.append(fasta.SeqRecord("dup", "", recs[0].codes.copy(),
                                recs[0].qual.copy()))
    st = compute_readstats(recs)
    s = st.summary()
    assert s["reads"] == 51
    assert s["duplicate_reads"] == 1
    assert abs(sum(s["base_fractions_ACGTN"][:4]) - 1.0) < 1e-6
    assert s["max_len"] == 80
    write_readstats_csv(tmp_path / "qc", st)
    assert (tmp_path / "qc.summary.json").exists()
    cyc = (tmp_path / "qc.cycles.csv").read_text().splitlines()
    assert len(cyc) == 81


def test_bucket_index_native_matches_numpy():
    """The native counting-sort bucket index (hostops.cpp bucket_index)
    must be bit-identical to the numpy stable-argsort path — same lut
    boundaries AND the same in-bucket position-ascending order."""
    import kit4b_tpu.index.sfx_index as SI

    rng = np.random.default_rng(77)
    n = 300_000
    seq = rng.integers(0, 4, n).astype(np.uint8)
    seq[5_000:5_040] = dna.BASE_N          # N run
    seq[150_000] = dna.BASE_EOS            # chromosome separator
    # a planted repeat family (non-trivial buckets)
    seq[200_000:200_200] = seq[100_000:100_200]
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = fasta.Genome(["a", "b"], np.array([0, 150_001]),
                     np.array([150_000, n - 150_000]), seq)
    idx_native = SfxIndex.build_buckets(g)
    orig = SI._load_native
    SI._load_native = lambda: None
    try:
        idx_np = SfxIndex.build_buckets(g)
    finally:
        SI._load_native = orig
    assert idx_native.lut_k == idx_np.lut_k
    np.testing.assert_array_equal(idx_native.lut, idx_np.lut)
    np.testing.assert_array_equal(idx_native.sa_clean, idx_np.sa_clean)
