"""pbautils processing modes (CPBAutils parity)."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome, SeqRecord
from kit4b_tpu.kmer import pbautils2 as pu
from kit4b_tpu.kmer.pba import save_pba


def _genome(n=500, seed=1):
    rng = np.random.default_rng(seed)
    return Genome.from_records(
        [SeqRecord("c1", "", rng.integers(0, 4, n).astype(np.uint8))])


def test_fasta_pba_roundtrip(tmp_path):
    g = _genome()
    chroms = pu.fasta_to_pba(g)
    fa = tmp_path / "out.fa"
    assert pu.pba_to_fasta(chroms, fa) == 1
    from kit4b_tpu.io.fasta import read_seqs
    rec = next(iter(read_seqs(fa)))
    assert np.array_equal(np.asarray(rec.codes),
                          np.asarray(g.chrom_codes(0)))


def test_pba_to_fasta_iupac(tmp_path):
    # het site A+C -> M; uncovered -> N
    pba = np.array([0xC0, 0xC0 | 0x30, 0x00, 0x03], np.uint8)
    fa = tmp_path / "h.fa"
    pu.pba_to_fasta({"c": pba}, fa)
    seq = fa.read_text().splitlines()[1]
    assert seq == "AMNT"


def test_concordance():
    g = _genome()
    base = pu.fasta_to_pba(g)["c1"]
    s2 = base.copy()
    s2[10:20] = 0                      # uncovered stretch
    s3 = base.copy()
    s3[100] = 0x30 if base[100] != 0x30 else 0x0C   # one discordant
    rows = pu.pba_concordance({"ref": {"c1": base}, "s2": {"c1": s2},
                               "s3": {"c1": s3}})
    r = rows[0]
    assert r["full_coverage"] == 500 - 10
    assert r["concordant"] == 500 - 10 - 1
    assert r["near_concordant"] == 0   # 2/3 < 90%


def test_allelic_and_genotype_vcf(tmp_path):
    g = _genome()
    ref = pu.fasta_to_pba(g)
    smp = {k: v.copy() for k, v in ref.items()}
    # introduce a het variant at 50 and a hom variant at 200
    rb50 = int(np.asarray(g.chrom_codes(0))[50])
    alt50 = (rb50 + 1) % 4
    shifts = [6, 4, 2, 0]
    smp["c1"][50] |= np.uint8(2 << shifts[alt50])
    rb200 = int(np.asarray(g.chrom_codes(0))[200])
    alt200 = (rb200 + 2) % 4
    smp["c1"][200] = np.uint8(3 << shifts[alt200])
    v = tmp_path / "a.vcf"
    n = pu.allelic_vcf(ref, smp, v)
    assert n == 2
    txt = v.read_text()
    assert f"c1\t51\t" in txt and f"c1\t201\t" in txt
    # genotype VCF over two samples
    g2 = tmp_path / "g.vcf"
    n = pu.genotype_vcf(ref, {"s1": smp, "s2": ref}, g2)
    assert n == 2
    lines = [ln for ln in g2.read_text().splitlines()
             if not ln.startswith("#")]
    by_pos = {int(ln.split("\t")[1]): ln.split("\t") for ln in lines}
    assert by_pos[51][9] == "0/1" and by_pos[51][10] == "0/0"
    assert by_pos[201][9] == "1/1"
    # diplotype-only keeps just the het locus
    g3 = tmp_path / "d.vcf"
    n = pu.genotype_vcf(ref, {"s1": smp, "s2": ref}, g3,
                        diplotype_only=True)
    assert n == 1
    # deletion VCF flags uncovered-in-sample loci
    smp2 = {k: v.copy() for k, v in ref.items()}
    smp2["c1"][300:310] = 0
    g4 = tmp_path / "del.vcf"
    n = pu.genotype_vcf(ref, {"s1": smp2}, g4, deletions=True)
    assert n == 10


def test_transcribed_bed(tmp_path):
    pba = np.zeros(100, np.uint8)
    pba[10:30] = 0xC0
    pba[50:60] = 0x30
    bed = tmp_path / "t.bed"
    n = pu.transcribed_bed({"s1": {"c": pba}}, bed)
    assert n == 2
    lines = bed.read_text().splitlines()
    assert lines[0].startswith("c\t10\t30")
    assert lines[1].startswith("c\t50\t60")


def test_pbautils_cli(tmp_path):
    from kit4b_tpu.cli import main
    g = _genome()
    chroms = pu.fasta_to_pba(g)
    p1 = tmp_path / "ref.pba.npz"
    save_pba(p1, g, chroms["c1"], readset="ref")
    smp = chroms["c1"].copy()
    smp[42] = 0x30 if smp[42] != 0x30 else 0x0C
    p2 = tmp_path / "s.pba.npz"
    save_pba(p2, g, smp, readset="s")
    out = tmp_path / "conc.csv"
    assert main(["pbautils", "-m", "2", "-i", str(p1), str(p2),
                 "-o", str(out)]) == 0
    assert "concordant" in out.read_text()
    vcf = tmp_path / "v.vcf"
    assert main(["pbautils", "-m", "4", "-r", str(p1), "-i", str(p2),
                 "-o", str(vcf)]) == 0
    assert "\t43\t" in vcf.read_text()
