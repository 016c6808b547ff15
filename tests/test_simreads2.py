"""Round-4 simreads parity: composite error profiles, micro-InDels,
adapter artefacts, random reads, region restriction, dedupe — and the
end-to-end loop VERDICT r3 asked for: simulated InDel/artefact reads
flowing through kalign's microInDel / chimeric rescue paths.

Reference anchors: libkit4b/SimReads.cpp:137 (SimInDels), :174
(SimArtefacts), :246-268 (StaticErrProfile + IlluminaSpatialDist), :295
(dynamic profile), :340 (SimSeqRand); ngskit4b/SimReads.cpp:42-43
(default Illumina adapter sequences)."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import kalign
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome, SeqRecord
from kit4b_tpu.sim import simreads


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(7)
    n = 120_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    return Genome(["c1"], np.array([0]), np.array([n]), seq)


def test_truth_subs_exact(genome):
    """Descriptor numsubs equals the true mismatch count vs the genome for
    both strands, composite illumina profile."""
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=800, read_len=100, error_mode="illumina", subs_rate=0.02,
        seed=1))
    g = genome.seq
    for r in recs:
        t = simreads.parse_truth(r.name)
        w = g[t["start"]:t["end"] + 1]
        if t["strand"] == "-":
            w = dna.revcomp(w)
        assert int((w != r.codes).sum()) == t["subs"]


def test_profile_distributions(genome):
    """Counts follow the composite profiles; positions are 3'-skewed by
    default and uniform under -Z."""
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=4000, read_len=100, error_mode="static", seed=2))
    subs = np.array([simreads.parse_truth(r.name)["subs"] for r in recs])
    # static profile is Poisson(1): mean ~1.0, max 8
    assert 0.9 < subs.mean() < 1.15
    assert subs.max() <= 8
    # positional skew: errors in the last decile >> first decile
    g = genome.seq
    pos_hist = np.zeros(100, np.int64)
    for r in recs:
        t = simreads.parse_truth(r.name)
        if t["strand"] != "+":
            continue
        diff = np.nonzero(g[t["start"]:t["end"] + 1] != r.codes)[0]
        pos_hist[diff] += 1
    # reference shape: heavy 3' tail plus a MODERATE 5' rise (bin0 = 40
    # of 500); compare the tail against the first and the low middle
    assert pos_hist[90:].sum() > 2.5 * pos_hist[:10].sum()
    assert pos_hist[90:].sum() > 5 * pos_hist[10:20].sum()
    assert pos_hist[:10].sum() > 2 * pos_hist[10:20].sum()
    recs_u = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=4000, read_len=100, error_mode="static",
        uniform_profile=True, seed=3))
    pos_hist_u = np.zeros(100, np.int64)
    for r in recs_u:
        t = simreads.parse_truth(r.name)
        if t["strand"] != "+":
            continue
        diff = np.nonzero(g[t["start"]:t["end"] + 1] != r.codes)[0]
        pos_hist_u[diff] += 1
    assert pos_hist_u[90:].sum() < 2 * pos_hist_u[:10].sum()


def test_indel_truth_roundtrip(genome):
    """indelsize field: deletion (+s) spans L+s genome bases; insertion
    (-s) spans L-s; the read reconstructs from the genome window."""
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=600, read_len=100, indel_rate=0.6, indel_size=5, seed=4))
    g = genome.seq
    n_del = n_ins = 0
    for r in recs:
        t = simreads.parse_truth(r.name)
        s = t["indel"]
        assert t["end"] == t["start"] + 99 + s
        if t["strand"] != "+" or s == 0:
            continue
        w = g[t["start"]:t["end"] + 1]
        if s > 0:    # deletion of s genome bases somewhere in the read
            hit = any(np.array_equal(
                np.concatenate([w[:p], w[p + s:]]), r.codes)
                for p in range(0, 101))
            assert hit, r.name
            n_del += 1
        else:        # insertion: read minus s inserted bases matches w
            s2 = -s
            hit = any(np.array_equal(
                np.concatenate([r.codes[:p], r.codes[p + s2:]]), w)
                for p in range(0, 101))
            assert hit, r.name
            n_ins += 1
    assert n_del > 30 and n_ins > 30


def test_artefacts(genome):
    """3' artefact = adapter prefix at the read tail; 5' = adapter suffix
    at the read head (SimArtefacts memcpy semantics)."""
    a5 = simreads._artef_codes([simreads.DEFAULT_ARTEF5])[0]
    a3 = simreads._artef_codes([simreads.DEFAULT_ARTEF3])[0]
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=300, read_len=100, artef3_rate=1.0, seed=5))
    for r in recs[:50]:
        assert any(np.array_equal(r.codes[100 - al:], a3[:al])
                   for al in range(1, len(a3) + 1)), r.name
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=300, read_len=100, artef5_rate=1.0, seed=6))
    for r in recs[:50]:
        assert any(np.array_equal(r.codes[:al], a5[len(a5) - al:])
                   for al in range(1, len(a5) + 1)), r.name


def test_random_reads_and_regions_and_dedupe(genome):
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=400, read_len=100, rand_reads=0.25, seed=7))
    n_rand = sum(simreads.parse_truth(r.name)["random"] for r in recs)
    assert 0.15 * 400 < n_rand < 0.35 * 400
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=300, read_len=100, regions=[("c1", 5000, 9000)], seed=8))
    for r in recs:
        t = simreads.parse_truth(r.name)
        assert 5000 <= t["start"] and t["end"] < 9000
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=300, read_len=100, dedupe=True, seed=9))
    assert len({r.codes.tobytes() for r in recs}) == len(recs)


def test_indel_reads_through_kalign(genome):
    """END-TO-END: simreads-generated InDel reads are rescued by kalign's
    microInDel path with the true locus and matching indel length
    (VERDICT r3 'Next round' item 3)."""
    idx = SfxIndex.build(genome)
    al = kalign.KAligner(idx, batch_size=256, micro_indel=9)
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=200, read_len=100, indel_rate=1.0, indel_size=5, seed=10))
    import re
    n_indel = n_acc = n_ok = 0
    for rec, res in al.align_records(recs):
        t = simreads.parse_truth(rec.name)
        if t["indel"] == 0:
            continue
        n_indel += 1
        if res.nar != kalign.NAR_ACCEPTED:
            continue
        n_acc += 1
        if res.cigar is None:
            continue   # edge indels legitimately win as substitutions
        want = "D" if t["indel"] > 0 else "I"
        m = re.findall(r"(\d+)([ID])", res.cigar)
        if (len(m) == 1 and m[0][1] == want
                and int(m[0][0]) == abs(t["indel"])
                and res.pos == t["start"]):
            n_ok += 1
    assert n_indel > 150
    assert n_acc >= 0.9 * n_indel     # aligned (rescue or subs path)
    assert n_ok >= 0.75 * n_indel     # exact indel CIGAR at true locus


def test_artefact_reads_through_chimeric(genome):
    """END-TO-END: 3'-adapter-contaminated reads resolve through kalign's
    chimeric flank-trim path with soft-clipped CIGARs at the true start."""
    idx = SfxIndex.build(genome)
    al = kalign.KAligner(idx, batch_size=256, chimeric_pct=50)
    recs = simreads.sim_reads(genome, simreads.SimParams(
        n_reads=200, read_len=100, artef3_rate=1.0, seed=11))
    n_acc = n_true = 0
    for rec, res in al.align_records(recs):
        t = simreads.parse_truth(rec.name)
        if res.nar != kalign.NAR_ACCEPTED:
            continue
        n_acc += 1
        if t["strand"] == "+" and res.pos == t["start"]:
            n_true += 1
        elif t["strand"] == "-":
            n_true += 1   # '-' strand: trimmed start shifts, locus inexact
    # artefact lengths are uniform 1..33, so many reads still align via
    # the substitutions path; the long-artefact ones need the trim
    assert n_acc >= 0.85 * len(recs)
    assert n_true >= 0.95 * n_acc
