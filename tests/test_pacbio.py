"""pacbiokit4b-equivalent toolkit: banded SW vs full-DP oracle, ecreads
error correction, SMRTbell filter, contig assembly + polish, kmerdist."""
import numpy as np
import pytest

from kit4b_tpu.io.fasta import SeqRecord
from kit4b_tpu.pacbio.sswd import SWScores, banded_sw_batch, sw_oracle

# helper RNG for _mutate; per-test rngs are local so test selection
# and ordering cannot shift each other's streams
rng = np.random.default_rng(11)



def _mutate(s, sub=0.05, ind=0.06):
    out = []
    for b in s:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.extend([b, rng.integers(0, 4)])
        elif r < ind + sub:
            out.append((b + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(b)
    return np.array(out, np.uint8)


def test_banded_sw_matches_oracle():
    rng = np.random.default_rng(3039)
    B, Lp, Lt, W = 4, 100, 140, 128
    probes = np.full((B, Lp), 0x0F, np.uint8)
    targets = np.full((B, Lt), 0x0F, np.uint8)
    plens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    diag0 = np.full(B, 10, np.int32)
    seqs = []
    for b in range(B):
        core = rng.integers(0, 4, 70).astype(np.uint8)
        p = np.concatenate([rng.integers(0, 4, 15), core,
                            rng.integers(0, 4, 15)]).astype(np.uint8)
        t = np.concatenate([rng.integers(0, 4, 20), _mutate(core),
                            rng.integers(0, 4, 20)]).astype(np.uint8)
        probes[b, :len(p)] = p
        targets[b, :len(t)] = t
        plens[b], tlens[b] = len(p), len(t)
        seqs.append((p, t))
    res = banded_sw_batch(probes, plens, targets, tlens, diag0, band=W)
    sc = SWScores()
    for b, (a, (p, t)) in enumerate(zip(res, seqs)):
        assert a.score == sw_oracle(p, t)
        # ops must reconstruct the score and the aligned spans
        s, i, c = 0, a.p_start, a.t_start
        for op, n in a.ops:
            if op == "M":
                for _ in range(n):
                    s += sc.match if p[i] == t[c] else sc.mismatch
                    i += 1
                    c += 1
            elif op == "D":
                s += sc.gap_open + (n - 1) * sc.gap_ext
                i += n
            else:
                s += sc.gap_open + (n - 1) * sc.gap_ext
                c += n
        assert (i, c, s) == (a.p_end, a.t_end, a.score)


def test_ecreads_reduces_errors():
    rng = np.random.default_rng(2876)
    from kit4b_tpu.pacbio.ecreads import ECParams, correct_reads
    ref = rng.integers(0, 4, 3000).astype(np.uint8)
    recs = []
    for i in range(24):
        s = rng.integers(0, 2200)
        recs.append(SeqRecord(f"r{i}", "", _mutate(ref[s:s + 800],
                                                   sub=0.02, ind=0.08)))
    corr = correct_reads(recs, ECParams(min_read_len=300,
                                        min_corrected_len=200,
                                        band=512, batch=8))
    assert len(corr) >= 20

    def err(seq):
        L = len(seq)
        pm = np.full((1, L), 0x0F, np.uint8)
        pm[0, :L] = seq
        t = np.full((1, len(ref)), 0x0F, np.uint8)
        t[0] = ref
        a = banded_sw_batch(pm, np.array([L]), t, np.array([len(ref)]),
                            np.array([1100]), band=4096,
                            scores=SWScores(1, -1, -2, -1))[0]
        return (sum(n for op, n in a.ops if op != "M")
                + a.mismatches) / max(a.p_end - a.p_start, 1)

    raw = np.mean([err(np.asarray(r.codes)) for r in recs[:4]])
    cor = np.mean([err(np.asarray(r.codes)) for r in corr[:4]])
    assert cor < raw / 2, (raw, cor)


def test_pbfilter_splits_hairpin():
    rng = np.random.default_rng(3007)
    from kit4b_tpu.pacbio.pbfilter import FilterParams, filter_reads
    arm = rng.integers(0, 4, 700).astype(np.uint8)
    rc = np.where(arm[::-1] < 4, 3 - arm[::-1], arm[::-1]).astype(np.uint8)
    hairpin = SeqRecord("hp", "", np.concatenate([arm, rc]))
    clean = SeqRecord("ok", "", rng.integers(0, 4, 1200).astype(np.uint8))
    out, stats = filter_reads([hairpin, clean],
                              FilterParams(min_len=300, batch=2))
    names = sorted(r.name for r in out)
    assert stats["hairpins"] == 1
    assert names == ["hp/sub1", "hp/sub2", "ok"]
    subs = {r.name: r for r in out}
    assert abs(len(subs["hp/sub1"].codes) - 700) < 40


def test_pbassemb_and_polish():
    rng = np.random.default_rng(2540)
    from kit4b_tpu.pacbio.ecreads import ECParams
    from kit4b_tpu.pacbio.pbassemb import (AssembParams, assemble,
                                           polish_contigs)
    ref = rng.integers(0, 4, 4000).astype(np.uint8)
    reads = [SeqRecord(f"c{i}", "", ref[s:s + 1200].copy())
             for i, s in enumerate(range(0, 2801, 400))]
    contigs = assemble(reads, AssembParams(
        min_overlap=400, band=256,
        seed=ECParams(min_read_len=0, band=256, min_seed_cores=8)))
    assert len(contigs) == 1
    c = np.asarray(contigs[0].codes)
    assert len(c) == len(ref) and np.array_equal(c, ref)

    # polish: plant errors into the contig, correct with clean reads
    dirty = c.copy()
    pos = rng.choice(len(c) - 100, 25, replace=False) + 50
    dirty[pos] = (dirty[pos] + 1) % 4
    polished = polish_contigs(
        [SeqRecord("ctg", "", dirty)], reads,
        ECParams(min_read_len=0, min_corrected_len=0, band=256,
                 min_seed_cores=8, batch=8))
    p = np.asarray(polished[0].codes)
    assert np.array_equal(p, ref), f"{(p != ref).sum() if len(p)==len(ref) else 'len'} residual"


def test_kmerdist(tmp_path):
    rng = np.random.default_rng(1410)
    from kit4b_tpu.pacbio.kmerdist import kmer_dist, write_kmer_dist
    maf = tmp_path / "t.maf"
    maf.write_text(
        "##maf version=1\n"
        "a score=10\n"
        "s ref.chr1 0 10 + 100 ACGTACGTAC\n"
        "s q.read1  0 10 + 50  ACGTAC-TAC\n"
        "\n"
        "a score=5\n"
        "s ref.chr1 20 5 + 100 AAAAA\n"
        "s q.read2   0 5 + 30  AAAAA\n")
    d = kmer_dist(maf, max_k=5)
    assert d["blocks"] == 2
    # block1: matches at cols 0-5,7-9 (col 6 gap); block2: 5 matches
    assert d["counts"][1] == 9 + 5
    assert d["counts"][5] == 2 + 1  # runs >=5: block1 cols 0,1; block2 col 0
    out = tmp_path / "d.csv"
    write_kmer_dist(out, d)
    assert out.read_text().startswith('"K"')


def test_swservice_scores_match():
    rng = np.random.default_rng(2900)
    from kit4b_tpu.parallel.swservice import SWJob, SWService
    svc = SWService(band=128)
    jobs = []
    pairs = []
    for _ in range(5):
        core = rng.integers(0, 4, 60).astype(np.uint8)
        p = np.concatenate([rng.integers(0, 4, 10), core]).astype(np.uint8)
        t = np.concatenate([rng.integers(0, 4, 15), _mutate(core),
                            rng.integers(0, 4, 5)]).astype(np.uint8)
        jobs.append(SWJob(p, t, 5))
        pairs.append((p, t))
    got = svc.score(jobs)
    for s, (p, t) in zip(got, pairs):
        assert s == sw_oracle(p, t)
