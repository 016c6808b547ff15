"""CLI-level tests for rnade, fasta2bed, genpba subcommands."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.cli import main
from kit4b_tpu.io.fasta import Genome, SeqRecord, write_fasta


def _sam(path, recs, chroms):
    with open(path, "w") as f:
        f.write("@HD\tVN:1.4\tSO:unsorted\n")
        for name, ln in chroms:
            f.write(f"@SQ\tSN:{name}\tLN:{ln}\n")
        for i, (chrom, pos, seq) in enumerate(recs):
            f.write(f"r{i}\t0\t{chrom}\t{pos}\t254\t{len(seq)}M\t*\t0\t0"
                    f"\t{seq}\t{'I' * len(seq)}\n")


def test_rnade_cli(tmp_path):
    bed = tmp_path / "genes.bed"
    bed.write_text("c1\t0\t200\tgeneA\t0\t+\nc1\t300\t500\tgeneB\t0\t+\n")
    chroms = [("c1", 600)]
    # geneA: 20 control vs 40 experiment reads (2x up);
    # geneB: 30 vs 30 (flat)
    ctrl = [("c1", 1 + (i * 9) % 150, "ACGT" * 10) for i in range(20)]
    ctrl += [("c1", 301 + (i * 6) % 150, "ACGT" * 10) for i in range(30)]
    expr = [("c1", 1 + (i * 7) % 150, "ACGT" * 10) for i in range(40)]
    expr += [("c1", 301 + (i * 5) % 150, "ACGT" * 10) for i in range(30)]
    _sam(tmp_path / "c.sam", ctrl, chroms)
    _sam(tmp_path / "e.sam", expr, chroms)
    out = tmp_path / "de.csv"
    bins = tmp_path / "bins.csv"
    rc = main(["rnade", "-i", str(tmp_path / "c.sam"),
               "-I", str(tmp_path / "e.sam"), "-g", str(bed),
               "-o", str(out), "-O", str(bins), "-b", "10"])
    assert rc == 0
    lines = out.read_text().splitlines()
    # full CRNA_DE layout (rnade.cpp:4326)
    assert lines[0].startswith('"Classification","Feat"')
    rows = {l.split(",")[1].strip('"'): l.split(",") for l in lines[1:]}
    # library autoscaling: geneA (20 vs 40) is up ~2x relative to
    # geneB (30 vs 30); ObsFoldChange is column 17 (0-based 16)
    foldA = float(rows["geneA"][16])
    foldB = float(rows["geneB"][16])
    assert foldA / max(foldB, 1e-9) > 1.7
    # bin counts file has 10+10 bins per feature
    bl = bins.read_text().splitlines()
    assert len(bl[0].split(",")) == 21
    assert {l.split(",")[0].strip('"') for l in bl[1:]} == {"geneA",
                                                            "geneB"}


def test_fasta2bed_cli(tmp_path):
    fa = tmp_path / "in.fa"
    write_fasta(fa, [SeqRecord("s1", "", dna.encode("ACGTACGT")),
                     SeqRecord("s2", "", dna.encode("GGGCCC"))])
    out = tmp_path / "out.bed"
    assert main(["fasta2bed", "-i", str(fa), "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].split("\t") == ["s1", "0", "8", "s1", "0", "+"]
    assert lines[1].split("\t") == ["s2", "0", "6", "s2", "0", "+"]


def test_genpba_cli(tmp_path):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 4000).astype(np.uint8)
    fa = tmp_path / "g.fa"
    write_fasta(fa, [SeqRecord("chr1", "", codes)])
    assert main(["index", "-i", str(fa),
                 "-o", str(tmp_path / "g.kix")]) == 0
    # 60bp error-free reads tiling the genome
    reads = [SeqRecord(f"rd{i}", "", codes[i * 40:i * 40 + 60])
             for i in range(90)]
    write_fasta(tmp_path / "reads.fa", reads)
    out = tmp_path / "out.pba.npz"
    rc = main(["genpba", "-i", str(tmp_path / "reads.fa"),
               "-I", str(tmp_path / "g.kix"), "-o", str(out),
               "-b", "128"])
    assert rc == 0
    from kit4b_tpu.kmer.pba import load_pba
    _, chroms = load_pba(out)
    assert list(chroms) == ["chr1"]
    pba = chroms["chr1"]
    assert pba.shape[0] == 4000
    # covered loci must call the reference base as the top allele
    covered = pba[100:3500]
    top = np.array([(b >> (2 * (3 - a))) & 3 for b, a in
                    zip(covered, codes[100:3500])])
    assert (top >= 2).mean() > 0.99
