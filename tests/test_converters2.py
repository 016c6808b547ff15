"""Tests for the round-2 standalone converter/analysis tools."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.io.biobed import (FEAT_CDS, FEAT_INTRON, FEAT_UPSTREAM,
                                 GeneModel, RegionClassifier)
from kit4b_tpu.tools import csvtools


def _el(srcid, chrom, start, end, **kw):
    d = {"srcid": srcid, "type": "el", "species": "sp", "chrom": chrom,
         "start": start, "end": end, "len": end - start + 1,
         "strand": "+"}
    d.update(kw)
    return d


# ------------------------------------------------------------------ biobed

def _gene(chrom="chr1", start=1000, end=2000, strand="+", cds=(1100, 1900),
          exons=((1000, 1300), (1500, 2000))):
    ex_s = np.asarray([a for a, _ in exons], np.int64)
    ex_e = np.asarray([b for _, b in exons], np.int64)
    return GeneModel(chrom, start, end, "g1", strand, cds[0], cds[1],
                     ex_s, ex_e)


def test_region_classifier_bits():
    cls = RegionClassifier([_gene()], reg_len=200)
    assert cls.feature_bits("chr1", 1150, 1160) & FEAT_CDS
    assert cls.feature_bits("chr1", 1350, 1360) & FEAT_INTRON
    assert cls.feature_bits("chr1", 900, 950) & FEAT_UPSTREAM
    assert cls.feature_bits("chr1", 100, 200) == 0
    assert cls.region_ordinal("chr1", 100, 200) == 0     # intergenic
    assert cls.region_ordinal("chr1", 1150, 1160) == 3   # CDS


def test_region_classifier_minus_strand():
    cls = RegionClassifier([_gene(strand="-")], reg_len=200)
    # upstream of a '-' gene is to the right
    assert cls.feature_bits("chr1", 2100, 2150) & FEAT_UPSTREAM


# ---------------------------------------------------------------- csvtools

def test_csv_filter_length_and_region():
    rows = [_el(1, "c", 10, 29), _el(2, "c", 50, 199),
            dict(_el(3, "c", 300, 399), features=0x01, matches=80,
                 mismatches=10, unaligned=10, indels=0,
                 relspecies="r")]
    kept = csvtools.csv_filter(rows, min_len=50)
    assert {e["srcid"] for e in kept} == {2, 3}
    # region filter: remove CDS (ordinal 4 -> bit 0x01); rows 1/2 have
    # region 0 (intergenic) and are kept
    kept_ids = {e["srcid"] for e in csvtools.csv_filter(
        rows, regions_out="4")}
    assert kept_ids == {1, 2}
    # removing intergenic (ordinal 1) keeps only the CDS row
    kept_ids = {e["srcid"] for e in csvtools.csv_filter(
        rows, regions_out="1")}
    assert kept_ids == {3}
    # outspecies identity filter
    kept = csvtools.csv_filter(rows, os_identity=95.0)
    assert all(e["srcid"] != 3 for e in kept if "matches" in e)


def test_csv_filter_overlaps_and_selectn():
    rows = [_el(1, "c", 0, 99), _el(2, "c", 50, 149), _el(3, "c", 500, 599)]
    no_ovl = csvtools.csv_filter(rows, overlaps=True)   # drop overlapped
    assert {e["srcid"] for e in no_ovl} == {3}
    only_ovl = csvtools.csv_filter(rows, no_overlaps=True)
    assert {e["srcid"] for e in only_ovl} == {1, 2}
    sel = csvtools.csv_filter(rows, select_n=2)
    assert len(sel) == 2


def test_csv_merge_modes():
    ref = [_el(1, "c", 0, 99), _el(2, "c", 200, 299)]
    rel = [_el(1, "c", 50, 149)]
    inter = csvtools.csv_merge(ref, rel, mode=csvtools.MERGE_INTERSECT)
    assert [(e["start"], e["end"]) for e in inter] == [(50, 99)]
    refx = csvtools.csv_merge(ref, rel, mode=csvtools.MERGE_REF_EXCLUSIVE)
    assert [(e["start"], e["end"]) for e in refx] == [(0, 49), (200, 299)]
    union = csvtools.csv_merge(ref, rel, mode=csvtools.MERGE_UNION)
    assert [(e["start"], e["end"]) for e in union] == [(0, 149), (200, 299)]
    neither = csvtools.csv_merge(ref, rel, mode=csvtools.MERGE_NEITHER)
    assert [(e["start"], e["end"]) for e in neither] == [(150, 199)]
    joined = csvtools.csv_merge(ref, rel, mode=csvtools.MERGE_UNION,
                                join_distance=60)
    assert [(e["start"], e["end"]) for e in joined] == [(0, 299)]


def test_process_csv_files_modes():
    ref = [_el(1, "c", 0, 99)]
    rel = {"f1": [dict(_el(1, "c", 0, 99), matches=90, mismatches=10,
                       unaligned=0, indels=0, relspecies="r", features=0,
                       score=500)]}
    r0 = csvtools.process_csv_files(ref, rel, mode=0)
    assert r0[0]["identities"]["f1"] == pytest.approx(90.0)
    r1 = csvtools.process_csv_files(ref, rel, mode=1)
    assert r1[0]["identities"]["f1"] == pytest.approx(90.0)
    r3 = csvtools.process_csv_files(ref, rel, mode=3)
    assert r3[0]["identities"]["f1"] == pytest.approx(50.0)


def test_hyper_dropouts():
    ref = [_el(1, "c", 0, 99), _el(2, "c", 500, 599)]
    rel = [_el(1, "c", 0, 89)]
    drop = csvtools.hyper_dropouts(ref, rel, mode=csvtools.HDO_DROPOUTS)
    assert [e["srcid"] for e in drop] == [2]
    inter = csvtools.hyper_dropouts(ref, rel, mode=csvtools.HDO_INTERSECT)
    assert [e["srcid"] for e in inter] == [1]


# --------------------------------------------------------------- bedtools2

def test_bed_filter_and_merge(tmp_path):
    from kit4b_tpu.tools.bedtools2 import bed_filter, bed_merge
    bed = tmp_path / "in.bed"
    bed.write_text("chr1\t0\t10\ta\t0\t+\nchr1\t5\t25\tb\t0\t-\n"
                   "chr2\t0\t8\tc\t0\t+\n")
    out = tmp_path / "out.bed"
    n = bed_filter(bed, out, strand=1, min_len=1, max_len=50)
    assert n == 2
    n = bed_filter(bed, out, strand=0, min_len=15, max_len=50)
    assert n == 1
    merged = tmp_path / "m.bed"
    n = bed_merge([str(bed)], merged, mode=0, min_len=1, join_len=1)
    assert n == 2       # chr1 union [0,25), chr2 [0,8)
    n = bed_merge([str(bed)], merged, mode=1, min_len=1, join_len=1)
    assert n == 3       # strand-dependent keeps a and b apart


def test_gff_gtf_filter(tmp_path):
    from kit4b_tpu.tools.bedtools2 import gff_filter, gtf_filter
    gff = tmp_path / "in.gff"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tgene\t100\t200\t.\t+\t.\tID=g1;Name=G1\n"
        "chr1\tsrc\ttRNA\t300\t350\t.\t+\t.\tID=t1;Name=T1\n")
    out = tmp_path / "out.gff"
    assert gff_filter(gff, out, genes=1) == 1
    assert gff_filter(gff, out, genes=5) == 1
    assert gff_filter(gff, out, genes=5, mode=1) == 1
    assert out.read_text() == "chr1\t299\t350\tT1\t0\t+\n"  # BED 0-based
    gtf = tmp_path / "in.gtf"
    gtf.write_text('ctg1\tsrc\texon\t1\t50\t.\t+\t.\tgene_id "g1";\n')
    cmap = tmp_path / "map.txt"
    cmap.write_text("ctg1 chrX\n")
    out2 = tmp_path / "out.gtf"
    assert gtf_filter(gtf, out2, map_path=cmap) == 1
    assert out2.read_text().startswith("chrX\t")


# ---------------------------------------------------------------- blastpsl

def test_blast2csv_and_psl2csv(tmp_path):
    from kit4b_tpu.tools.blastpsl import blast2csv, psl2csv
    bl = tmp_path / "hits.m8"
    bl.write_text("q1\tchr1\t98.5\t100\t1\t0\t1\t100\t200\t101\t1e-50\t190\n"
                  "q2\tchrM\t90.0\t50\t5\t1\t1\t50\t500\t451\t1e-10\t80\n")
    out = tmp_path / "b.csv"
    assert blast2csv(bl, out, chrom_exclude=["chrM"]) == 1
    lines = out.read_text().splitlines()
    assert len(lines) == 2 and '"q1"' in lines[1] and '"-"' in lines[1]
    psl = tmp_path / "hits.psl"
    psl.write_text("90\t2\t0\t0\t0\t0\t1\t10\t+\tq1\t100\t0\t92\tchr1\t"
                   "5000\t100\t202\t2\t46,46,\t0,46,\t100,156,\n")
    out2 = tmp_path / "p.csv"
    assert psl2csv(psl, out2) == 1
    row = out2.read_text().splitlines()[1]
    assert row.startswith('"q1",100,92,0,92,"chr1","+",5000,102')


# --------------------------------------------------------------- locistats

def test_loci2dist_and_rollups():
    from kit4b_tpu.tools.locistats import genrollups, loci2dist
    loci = [_el(1, "c", 0, 24), _el(2, "c", 100, 124), _el(3, "c", 0, 299)]
    res = loci2dist(loci, min_len=1, max_len=500)
    assert res["dist"][24, 0] == 2 and res["dist"][299, 0] == 1
    rows = genrollups(loci, mode=0, bin_class=2)
    by = {r["range"]: r["total"] for r in rows}
    assert by["20-49"] == 2 and by["300+"] == 1
    rows = genrollups(loci, mode=2, bin_class=2)   # base totals
    by = {r["range"]: r["total"] for r in rows}
    assert by["20-49"] == 50 and by["300+"] == 300


def test_gennucstats():
    from kit4b_tpu.tools.locistats import gennucstats
    bkg = [_el(1, "c", 100, 246), _el(2, "c", 400, 546)]
    smp = [_el(1, "c", 103, 249), _el(2, "c", 900, 1046)]
    res = gennucstats(bkg, smp, wind_dyad=5)
    assert res["n_background"] == 2
    assert res["n_matched"] == 1
    assert res["offset_hist"][-3] == 1


def test_genloci2gene():
    from kit4b_tpu.io.biobed import RegionClassifier
    from kit4b_tpu.tools.locistats import genloci2gene
    genes = [_gene()]
    cls = RegionClassifier(genes, 200)
    loci = [_el(1, "chr1", 1150, 1160),     # intragenic
            _el(2, "chr1", 900, 920),       # upstream
            _el(3, "chr1", 50000, 50010)]   # too far
    rows = genloci2gene(loci, cls, genes, assoc_dist=5000)
    rels = {r["start"]: r["rel"] for r in rows}
    assert rels[1150] == "intragenic"
    assert rels[900] == "upstream"
    assert rels[50000] == "intergenic"


def test_genzygosity_and_candidates():
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import Genome, SeqRecord
    from kit4b_tpu.tools.locistats import genseqcandidates, genzygosity
    rng = np.random.default_rng(7)
    a = rng.integers(0, 4, 4000).astype(np.uint8)
    b = a.copy()                      # duplicate of a
    c = rng.integers(0, 4, 4000).astype(np.uint8)
    g = Genome.from_records([SeqRecord("A", "", a), SeqRecord("B", "", b),
                             SeqRecord("C", "", c)])
    idx = SfxIndex.build(g, lut_k=8)
    res = genzygosity(idx, subseq_len=25, max_subs=0)
    names = res["names"]
    ia, ib, ic = names.index("A"), names.index("B"), names.index("C")
    assert res["zygosity"][ia, ib] > 0.99   # A fully matches B
    assert res["zygosity"][ia, ic] < 0.05
    cand = genseqcandidates(idx, [_el(1, "C", 1000, 1200)],
                            subseq_len=25, block_len=400, min_len=100,
                            trunc_len=400)
    assert cand and cand[0]["n_unique"] > cand[0]["n_multi"]
    cand_a = genseqcandidates(idx, [_el(1, "A", 1000, 1200)],
                              subseq_len=25, block_len=400, min_len=100,
                              trunc_len=400)
    assert cand_a[0]["n_multi"] == cand_a[0]["n_subseqs"]  # A==B dup


def test_fasta_filter(tmp_path):
    from kit4b_tpu.io.fasta import read_seqs
    from kit4b_tpu.tools.locistats import fasta_filter
    fa = tmp_path / "in.fa"
    fa.write_text(">s1\nACGT" + "N" * 20 + "ACGT\n>s1\nGGGG\n")
    out = tmp_path / "out.fa"
    st = fasta_filter(fa, out, max_n_run=3)
    recs = list(read_seqs(out))
    assert st["n_seqs"] == 2
    assert recs[1].name == "s1.1"
    assert (np.asarray(recs[0].codes) >= 4).sum() == 3


# -------------------------------------------------------------- structextra

def test_site_potential():
    from kit4b_tpu.io.fasta import Genome, SeqRecord
    from kit4b_tpu.tools.structextra import site_potential
    rng = np.random.default_rng(3)
    seq = rng.integers(0, 4, 2000).astype(np.uint8)
    g = Genome.from_records([SeqRecord("c", "", seq)])
    reads = [_el(1, "c", 100, 150), _el(2, "c", 200, 250)]
    rows = site_potential(reads, g)
    assert sum(r[2] for r in rows) == 2      # two site octamers counted
    total_gen = sum(r[1] for r in rows)
    assert total_gen == 2000 - 7


def test_predconfnucs_dyads(tmp_path):
    from kit4b_tpu.io.fasta import Genome, SeqRecord
    from kit4b_tpu.tools.structextra import predconfnucs
    # synthetic params: make AA-rich octamers high-groove, others low
    params = {"minorgroove": np.full(65536, 10.0, np.float32),
              "twist": np.full(65536, 34.3, np.float32)}
    # octamers starting with AAAA get elevated groove
    idx = np.arange(65536)
    high = (idx >> 8) == 0          # first 4 bases AAAA
    params["minorgroove"][high] = 12.0
    rng = np.random.default_rng(5)
    seq = rng.integers(1, 4, 600).astype(np.uint8)   # no A's background
    seq[290:310] = 0                                  # poly-A island
    g = Genome.from_records([SeqRecord("c", "", seq)])
    peaks = predconfnucs(g, params, dyad_ratio=1.05, dyad2_ratio=0.99,
                         dyad3_ratio=0.99, mov_avg=0, baseline_win=100)
    assert peaks["c"], "expected at least one dyad call"
    first, last, pk, score = peaks["c"][0]
    assert 285 <= pk <= 315


def test_gencentroidmetrics_and_proc(tmp_path):
    from kit4b_tpu.io.fasta import Genome, SeqRecord
    from kit4b_tpu.tools.structextra import (gencentroidmetrics,
                                             proccentroids,
                                             write_centroid_metrics)
    seq = dna.encode("ACGTACGTACGTACGTACGT")
    g = Genome.from_records([SeqRecord("c", "", seq)])
    res = gencentroidmetrics(None, nmer=3, mode=1, genome=g)
    assert res["counts"].sum() == len(seq) - 2
    f = tmp_path / "cnt.csv"
    write_centroid_metrics(f, res)
    out = tmp_path / "stats.csv"
    n = proccentroids(f, out, nmer=3, mode=3)
    assert n > 0
    txt = out.read_text()
    assert '"A"' in txt


def test_genstructstats(tmp_path):
    from kit4b_tpu.tools.structextra import genstructstats
    params = {"twist": np.arange(65536, dtype=np.float32),
              "minorgroove": np.ones(65536, np.float32)}
    out = tmp_path / "s.csv"
    assert genstructstats(params, out) == 65536


# --------------------------------------------------------------- alignstats

def _mini_malign(tmp_path):
    from kit4b_tpu.io.malign import MAlign
    maf = tmp_path / "t.maf"
    maf.write_text(
        "a score=10\n"
        "s ref.chr1 10 12 + 1000 ACGTACGTACGT\n"
        "s rel.chr9 100 11 + 5000 ACGTAC-TACGA\n"
        "\n"
        "a score=5\n"
        "s ref.chr1 40 8 + 1000 GGGGCCCC\n"
        "s rel.chr9 300 8 + 5000 GGGTCCCC\n\n")
    return MAlign.from_maf(maf, ref_species="ref")


def test_genalignstats_modes(tmp_path):
    from kit4b_tpu.tools.alignstats import genalignconf, genalignstats
    ma = _mini_malign(tmp_path)
    r0 = genalignstats(ma, mode=0)
    assert r0["n_blocks"] == 2
    # block1: 12 cols incl 1 indel; identical = 10 (last col T/A differs,
    # indel col differs); block2: 8 cols, 7 identical
    assert r0["identical_cols"] == 17
    r2 = genalignstats(ma, mode=2)
    assert r2["pairwise"]["rel"]["substitutions"] == 2
    conf = genalignconf(ma, per_chrom=True)
    assert conf[0]["scope"] == "chr1" and conf[0]["n_blocks"] == 2


def test_loci2core_and_ref2relloci(tmp_path):
    from kit4b_tpu.tools.alignstats import loci2core, ref2relloci
    ma = _mini_malign(tmp_path)
    loci = [_el(1, "chr1", 10, 21, len=12)]
    loci[0]["len"] = 12
    rows = loci2core(ma, loci, min_core_len=5, dist_segs=4)
    assert rows and rows[0]["matches"] == 10
    assert rows[0]["mismatches"] == 1           # final T vs A
    mapped = ref2relloci(ma, loci, rel_species="rel", min_len=5)
    assert mapped and mapped[0]["rel_chrom"] == "chr9"
    assert mapped[0]["rel_start"] == 100
    # 11 rel bases mapped (one ref col is a rel indel)
    assert mapped[0]["covered"] == 11
    assert mapped[0]["rel_end"] == 110


# ------------------------------------------------------------------- CLI

def test_cli_new_tools_wired():
    from kit4b_tpu.cli import build_parser
    subs = [a for a in build_parser()._subparsers._group_actions][0].choices
    for name in ("csvfilter", "csvmerge", "csv2feat", "csv2stats",
                 "processcsvfiles", "genhyperdropouts", "bedfilter",
                 "bedmerge", "gfffilter", "gtffilter", "blast2csv",
                 "psl2csv", "loci2dist", "gennucstats", "genloci2gene",
                 "gencomposition", "genrollups", "genseqcandidates",
                 "genzygosity", "fastafilter", "filterreads", "locmarkers",
                 "genstructprofile", "genstructstats", "predconfnucs",
                 "dnasitepotential", "rnasitepotential", "genelementseq",
                 "genelementprofiles", "gencentroidmetrics",
                 "proccentroids", "loci2core", "ref2relloci",
                 "genalignstats", "genalignconf"):
        assert name in subs, f"missing subcommand {name}"


def test_cli_csvfilter_end_to_end(tmp_path):
    from kit4b_tpu.cli import main
    from kit4b_tpu.tools.convert import write_loci_csv
    inp = tmp_path / "in.csv"
    write_loci_csv(inp, [_el(1, "c", 0, 9), _el(2, "c", 0, 99)])
    out = tmp_path / "out.csv"
    rc = main(["csvfilter", "-i", str(inp), "-o", str(out), "-l", "50"])
    assert rc == 0
    assert len(out.read_text().splitlines()) == 1


def test_hypers_region_classification(tmp_path):
    from kit4b_tpu.io.biobed import RegionClassifier
    from kit4b_tpu.tools.hypers import HyperEl, classify_regions
    cls = RegionClassifier([_gene()], reg_len=200)
    els = [HyperEl("chr1", 1150, 1180, 30, 0, 3),    # CDS
           HyperEl("chr1", 100, 160, 60, 0, 3)]      # intergenic
    res = classify_regions(els, cls)
    assert res["per_el"] == [3, 0]
    assert res["counts"]["CDS"] == 1 and res["counts"]["IG"] == 1
