"""SNP phase: planted SNPs recovered, noise rejected, outputs well-formed."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import kalign, snp
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.io.wig import write_wig
from kit4b_tpu.sim import simreads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
    n = 150_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([n]), seq)
    # plant SNPs into a sample genome; reads come from the mutated genome,
    # aligned against the original
    mut, truth = simreads.simulate_snps(g, rate=0.0005, seed=3)
    idx = SfxIndex.build(g)
    reads = simreads.sim_reads(
        mut, simreads.SimParams(n_reads=30_000, read_len=100, seed=11,
                                error_mode="uniform", subs_rate=0.005))
    return g, idx, reads, truth


def test_snp_calls_recover_truth(tmp_path, setup):
    g, idx, reads, truth = setup
    al = kalign.KAligner(idx, batch_size=4096)
    caller = snp.SnpCaller(g)
    stats = kalign.write_sam(tmp_path / "o.sam", idx,
                             al.align_records(reads), snp_caller=caller)
    assert stats[kalign.NAR_ACCEPTED] > 25_000
    calls = caller.call()
    called = {(c.chrom, c.loci) for c in calls}
    truth_set = {(t[0], t[1]) for t in truth}
    # coverage ~20x: essentially all planted SNPs with coverage are called
    covered_truth = set()
    cov = caller.coverage()
    for t in truth_set:
        if cov[t[1]] >= 5:
            covered_truth.add(t)
    assert len(covered_truth) > 0.8 * len(truth_set)
    recall = len(called & covered_truth) / len(covered_truth)
    assert recall >= 0.95, f"recall {recall}"
    # false calls bounded by FDR (q=0.05) — generously 3x
    false = called - truth_set
    assert len(false) <= max(3, 0.15 * len(called)), (
        f"{len(false)} false of {len(called)}")
    # alt alleles match truth
    truth_alt = {(t[0], t[1]): t[3] for t in truth}
    for c in calls:
        if (c.chrom, c.loci) in truth_alt:
            nonref = [b for b in range(4) if b != c.ref_base]
            top = max(nonref, key=lambda b: c.counts[b])
            assert top == truth_alt[(c.chrom, c.loci)]


def test_snp_outputs(tmp_path, setup):
    g, idx, reads, truth = setup
    al = kalign.KAligner(idx, batch_size=4096)
    caller = snp.SnpCaller(g)
    kalign.write_sam(tmp_path / "o.sam", idx, al.align_records(reads),
                     snp_caller=caller)
    calls = caller.call()
    assert calls
    snp.write_snps_csv(tmp_path / "snps.csv", calls)
    snp.write_snps_vcf(tmp_path / "snps.vcf", calls)
    csv_lines = (tmp_path / "snps.csv").read_text().splitlines()
    assert len(csv_lines) == len(calls) + 1
    vcf_lines = [l for l in (tmp_path / "snps.vcf").read_text().splitlines()
                 if not l.startswith("#")]
    assert len(vcf_lines) == len(calls)
    for l in vcf_lines:
        f = l.split("\t")
        assert f[0] == "c1" and f[3] in "ACGT" and f[6] == "PASS"
    write_wig(tmp_path / "cov.wig", g, caller.coverage())
    assert (tmp_path / "cov.wig").read_text().startswith("track type=wiggle")


def test_ref_binomial_quirk():
    # n <= 5000: plain CDF; n > 5000 reproduces the reference's clamp
    assert snp.ref_binomial_cdf(10, 10, 0.5) == 1.0
    assert abs(snp.ref_binomial_cdf(10, 5, 0.5) - 0.623046875) < 1e-9
    big = snp.ref_binomial_cdf(10000, 100, 0.001)
    # clamped: k=int(0.1*100)=10, n=5000, p unchanged
    from scipy.stats import binom
    assert big == float(min(binom.cdf(10, 5000, 0.001), 1.0))


def test_disnp_trisnp(tmp_path, setup):
    g, idx, reads, truth = setup
    al = kalign.KAligner(idx, batch_size=4096)
    caller = snp.SnpCaller(g)
    kalign.write_sam(tmp_path / "o.sam", idx, al.align_records(reads),
                     snp_caller=caller)
    calls = caller.call()
    di = snp.call_multisnps(tmp_path / "o.sam", calls, order=2)
    # truth SNP pairs within 300bp exist at rate=0.0005 over 150kb (~75 SNPs)
    if di:
        chrom, loci, combos = di[0]
        assert chrom == "c1" and len(loci) == 2
        assert sum(combos.values()) > 0
        for allele in combos:
            assert len(allele) == 2 and set(allele) <= set("ACGTN")
    snp.write_multisnps_csv(tmp_path / "di.csv", di, order=2)
    tri = snp.call_multisnps(tmp_path / "o.sam", calls, order=3)
    snp.write_multisnps_csv(tmp_path / "tri.csv", tri, order=3)
    assert (tmp_path / "di.csv").read_text().startswith('"DiSNP_ID"')


def test_snp_centroids_and_markers(tmp_path):
    """Centroid 7-mer context distributions (KAligner.cpp:8100-8131) and
    marker sequence reporting (:7483-7565)."""
    import numpy as np
    from kit4b_tpu import dna
    from kit4b_tpu.align import snp as snpmod
    from kit4b_tpu.io.fasta import Genome

    rng = np.random.default_rng(9)
    G = 2000
    seq = np.concatenate([rng.integers(0, 4, G).astype(np.uint8),
                          [dna.BASE_EOG]])
    g = Genome(["c1"], np.array([0]), np.array([G]), seq)
    caller = snpmod.SnpCaller(g, snpmod.SnpOptions(min_snp_reads=5))

    # 20x coverage of the whole chrom with reads matching the reference,
    # except a SNP at locus 500 where all reads carry the alternate base
    L = 100
    snp_loci = 500
    alt = (int(seq[snp_loci]) + 1) % 4
    reads, poss = [], []
    for start in range(0, G - L + 1, 5):
        r = seq[start:start + L].copy()
        if start <= snp_loci < start + L:
            r[snp_loci - start] = alt
        reads.append(r)
        poss.append(start)
    caller.add_alignments(np.asarray(poss), np.stack(reads))
    calls = caller.call()
    assert len(calls) == 1 and calls[0].loci == snp_loci

    cent = snpmod.snp_centroids(caller, calls)
    # the SNP's 7-mer context row carries its pileup
    ctx = 0
    for o in range(-3, 4):
        ctx = (ctx << 2) | int(seq[snp_loci + o])
    assert cent["num_snps"][ctx] == 1
    assert cent["base_cnts"][ctx][alt] == calls[0].counts[alt]
    # NumInsts counts every covered locus with that context
    assert cent["num_insts"].sum() > 1000
    cpath = tmp_path / "cent.csv"
    snpmod.write_snp_centroids_csv(cpath, cent)
    lines = cpath.read_text().splitlines()
    assert len(lines) == 4 ** 7 + 1
    row = lines[ctx + 1].split(",")
    assert int(row[0]) == ctx + 1 and int(row[3]) == 1

    # marker fasta: SNP site becomes the alt base, flanks the ref bases
    mpath = tmp_path / "markers.fa"
    n = snpmod.report_markers(mpath, caller, calls, marker5_len=10,
                              marker3_len=10)
    assert n == 1
    hdr, mseq = mpath.read_text().splitlines()
    assert hdr == (f">Marker1 c1 {snp_loci-10}|21|{snp_loci}|10|"
                   f"{'ACGT'[alt]}|{'ACGT'[int(seq[snp_loci])]}|0")
    expect = dna.decode(seq[snp_loci-10:snp_loci+11]).replace(
        dna.decode(seq[snp_loci:snp_loci+1]), "", 0)
    assert len(mseq) == 21 and mseq[10] == "ACGT"[alt]
    assert calls[0].marker_id == 1

    # SNP CSV now carries MarkerID / NumPolymorphicSites
    spath = tmp_path / "snps.csv"
    snpmod.write_snps_csv(spath, calls)
    header, row = spath.read_text().splitlines()
    assert header.endswith('"MarkerID","NumPolymorphicSites"')
    assert row.split(",")[-2:] == ["1", "0"]
