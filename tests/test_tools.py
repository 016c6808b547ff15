"""Long-tail utility subprocesses: ssr, snps2pgsnps, lochap2bed,
markerseqs, repassemb, wigutils, remaploci, xroiseqs (CLI-level where
cheap)."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome, SeqRecord, write_fasta


def _genome(tmp_path, seqs: dict):
    path = tmp_path / "g.fa"
    write_fasta(path, [SeqRecord(n, "", dna.encode(s))
                       for n, s in seqs.items()])
    return Genome.load(path), path


def test_ssr_finds_tandem_repeats(tmp_path):
    from kit4b_tpu.tools.ssr import find_ssrs
    g, _ = _genome(tmp_path, {
        "c1": "ACGTACGT" + "AT" * 8 + "GGCGGATC" + "CAG" * 6 + "TTACG"})
    ssrs = find_ssrs(g, min_unit=2, max_unit=5, min_repeats=5)
    got = {(r.unit, r.repeats) for r in ssrs}
    # phase of the maximal run may start a base early (TA vs AT)
    assert ("AT", 8) in got or ("TA", 8) in got
    assert ("CAG", 6) in got or ("AGC", 6) in got or ("GCA", 6) in got
    # homopolymer runs must not be reported as period-2/3 repeats
    assert not any(len(set(r.unit)) == 1 for r in ssrs)


def test_snp_converters(tmp_path):
    from kit4b_tpu.align.snp import SnpCall, write_snps_csv
    from kit4b_tpu.tools.snpsfmt import (marker_seqs, read_snps_csv,
                                         replace_assembly_alleles,
                                         write_pgsnp)
    g, _ = _genome(tmp_path, {"c1": "ACGTACGTACGTACGTACGT"})
    calls = [SnpCall("c1", 5, dna.BASE_C,
                     np.array([1, 0, 14, 0, 0]), 15, 14, 0.01, 1e-9)]
    csvp = tmp_path / "snps.csv"
    write_snps_csv(csvp, calls)
    snps = read_snps_csv(csvp)
    assert snps[0]["chrom"] == "c1" and snps[0]["loci"] == 5
    pg = tmp_path / "s.pgsnp"
    write_pgsnp(pg, snps)
    lines = pg.read_text().splitlines()
    assert lines[0].startswith("track type=pgSnp")
    f = lines[1].split("\t")
    assert f[:3] == ["c1", "5", "6"] and "G" in f[3]

    m = marker_seqs(g, snps, flank=4)
    assert m[0]["five"] == "CGTA" and m[0]["ref"] == "C"
    assert m[0]["alt"] == "G" and m[0]["three"] == "GTAC"

    n = replace_assembly_alleles(g, snps)
    assert n == 1 and g.seq[5] == dna.BASE_G


def test_lochap2bed(tmp_path):
    from kit4b_tpu.tools.snpsfmt import lochap_to_bed
    src = tmp_path / "dihap.csv"
    src.write_text('"DiSNP_ID","Chrom","Loci","Alleles","Counts"\n'
                   '1,"c1","10|25","AC|GT","7|3"\n')
    out = tmp_path / "h.bed"
    assert lochap_to_bed(src, out) == 1
    assert out.read_text() == "c1\t10\t26\tAC|GT\t7\t+\n"


def test_wigutils_roundtrip_merge(tmp_path):
    from kit4b_tpu.tools.wigutils import (merge_wigs, read_wig, wig_stats,
                                          write_wig_sparse)
    w1 = tmp_path / "a.wig"
    w1.write_text('track type=wiggle_0 name="a"\n'
                  "fixedStep chrom=c1 start=11 step=1 span=3\n4\n"
                  "variableStep chrom=c2\n5 2\n7 9\n")
    t1 = read_wig(w1)
    assert t1["c1"] == {10: 4.0, 11: 4.0, 12: 4.0}
    assert t1["c2"] == {4: 2.0, 6: 9.0}
    m = merge_wigs([t1, t1], op="sum")
    assert m["c1"][10] == 8.0
    st = {r["chrom"]: r for r in wig_stats(m)}
    assert st["c2"]["max"] == 18.0
    w2 = tmp_path / "b.wig"
    write_wig_sparse(w2, m)
    assert read_wig(w2) == m


def test_remaploci_bed_and_sam(tmp_path):
    from kit4b_tpu.tools.remap import remap_bed, remap_sam
    mapbed = tmp_path / "map.bed"
    mapbed.write_text("ctg1\t100\t200\tscaff7\t0\t+\n"
                      "ctg1\t300\t400\tscaff8\t0\t-\n")
    inb = tmp_path / "in.bed"
    inb.write_text("ctg1\t150\t160\tx\t0\t+\nctg1\t350\t360\ty\t0\t+\n"
                   "ctg1\t900\t910\tz\t0\t+\n")
    outb = tmp_path / "out.bed"
    st = remap_bed(inb, mapbed, outb)
    assert st == {"in": 3, "remapped": 2, "dropped": 1}
    lines = outb.read_text().splitlines()
    assert lines[0].split("\t")[:3] == ["scaff7", "50", "60"]
    assert lines[1].split("\t")[:3] == ["scaff8", "49", "59"]

    ins = tmp_path / "in.sam"
    ins.write_text("@HD\tVN:1.6\n@SQ\tSN:ctg1\tLN:1000\n"
                   "r1\t0\tctg1\t151\t60\t10M\t*\t0\t0\tACGTACGTAC\t*\n")
    outs = tmp_path / "out.sam"
    st = remap_sam(ins, mapbed, outs)
    assert st["remapped"] == 1
    body = [l for l in outs.read_text().splitlines()
            if not l.startswith("@")]
    f = body[0].split("\t")
    assert f[2] == "scaff7" and f[3] == "51"


def test_xroiseqs_cli(tmp_path):
    from kit4b_tpu.cli import main
    from kit4b_tpu.io.fasta import read_seqs
    _, gpath = _genome(tmp_path, {"c1": "ACGTACGTACGTACGT"})
    bed = tmp_path / "roi.bed"
    bed.write_text("c1\t2\t6\troi1\t0\t+\nc1\t2\t6\troi2\t0\t-\n")
    out = tmp_path / "roi.fa"
    assert main(["xroiseqs", "-i", str(bed), "-g", str(gpath),
                 "-o", str(out)]) == 0
    recs = {r.name: dna.decode(r.codes) for r in read_seqs(out)}
    assert recs["roi1"] == "GTAC"
    assert recs["roi2"] == "GTAC"  # revcomp of GTAC is GTAC


def test_ngsqc_plot_rendering(tmp_path):
    """ngsqc --plots renders the libBKPLPlot-parity PNG set."""
    import numpy as np
    from kit4b_tpu.align.readstats import (compute_readstats,
                                           render_readstats_plots)
    from kit4b_tpu.io.fasta import SeqRecord
    rng = np.random.default_rng(1)
    recs = [SeqRecord(f"r{i}", "",
                      rng.integers(0, 4, 100).astype(np.uint8),
                      qual=rng.integers(20, 40, 100).astype(np.uint8))
            for i in range(50)]
    st = compute_readstats(recs)
    paths = render_readstats_plots(str(tmp_path / "qc"), st)
    import os
    assert len(paths) >= 3
    for p in paths:
        assert os.path.getsize(p) > 1000
