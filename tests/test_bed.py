"""BED parsing, interval queries, maploci."""
import numpy as np

from kit4b_tpu.io.bed import BedFeature, BedFile, map_loci_to_features, \
    write_bed
from kit4b_tpu.io.sam import SamAlignment, SamWriter, read_sam


def test_bed_roundtrip_and_query(tmp_path):
    feats = [
        BedFeature("c1", 100, 200, "geneA", 0, "+"),
        BedFeature("c1", 150, 400, "geneB", 5, "-"),
        BedFeature("c1", 500, 600, "geneC"),
        BedFeature("c2", 0, 50, "geneD"),
    ]
    p = tmp_path / "t.bed"
    write_bed(p, feats)
    bed = BedFile.load(p)
    assert len(bed) == 4
    hits = bed.overlapping("c1", 180, 190)
    assert {h.name for h in hits} == {"geneA", "geneB"}
    assert [h.name for h in bed.overlapping("c1", 450, 520)] == ["geneC"]
    assert bed.overlapping("c1", 400, 500) == []
    assert bed.overlapping("c3", 0, 10) == []
    assert {h.name for h in bed.contains("c1", 150)} == {"geneA", "geneB"}


def test_bed_nonoverlap_after_long_feature(tmp_path):
    # a long early feature must not hide later non-overlaps (maxend walk)
    feats = [BedFeature("c1", 0, 1000, "long"),
             BedFeature("c1", 100, 110, "short")]
    bed = BedFile(feats)
    assert {h.name for h in bed.overlapping("c1", 500, 510)} == {"long"}
    assert {h.name for h in bed.overlapping("c1", 105, 106)} == \
        {"long", "short"}


def test_maploci(tmp_path):
    feats = [BedFeature("c1", 100, 300, "gA"),
             BedFeature("c1", 1000, 1200, "gB")]
    bed = BedFile(feats)
    sp = tmp_path / "t.sam"
    with SamWriter(sp, ["c1"], [5000]) as w:
        w.write(SamAlignment("r1", 0, "c1", 151, 254, "100M",
                             seq="A" * 100))
        w.write(SamAlignment("r2", 0, "c1", 1051, 254, "100M",
                             seq="A" * 100))
        w.write(SamAlignment("r3", 0, "c1", 3001, 254, "100M",
                             seq="A" * 100))
        w.write(SamAlignment("r4", 4, "*", 0, 0, "*", seq="A" * 100))
    counts, miss = map_loci_to_features(bed, read_sam(sp))
    assert counts == {"gA": 1, "gB": 1}
    assert miss == 1


def test_gff_gtf(tmp_path):
    from kit4b_tpu.io.gff import read_gff, to_bed
    gff = tmp_path / "a.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "c1\tsrc\tgene\t100\t500\t.\t+\t.\tID=gene1;Name=abc\n"
        "c1\tsrc\texon\t100\t200\t0.5\t+\t.\tID=exon1;Parent=gene1\n")
    recs = list(read_gff(gff))
    assert len(recs) == 2
    assert recs[0].attrs["ID"] == "gene1"
    assert recs[1].score == 0.5
    gtf = tmp_path / "a.gtf"
    gtf.write_text(
        'c1\tsrc\tgene\t10\t90\t.\t-\t.\tgene_id "g2"; gene_name "xyz";\n')
    recs2 = list(read_gff(gtf))
    assert recs2[0].attrs["gene_id"] == "g2"
    assert recs2[0].strand == "-"
    bed = to_bed(recs, ftype="gene")
    assert len(bed) == 1
    assert bed.features[0].start == 99 and bed.features[0].end == 500
    assert bed.overlapping("c1", 98, 99) == []
    assert len(bed.overlapping("c1", 99, 100)) == 1


def test_locateroi_and_filtchrom(tmp_path):
    from kit4b_tpu.align.regions import (coverage_from_sam,
                                         filter_sam_by_chrom, locate_roi)
    sp = tmp_path / "a.sam"
    with SamWriter(sp, ["c1", "chrM"], [2000, 500]) as w:
        for i in range(20):
            w.write(SamAlignment(f"r{i}", 0, "c1", 101, 254, "100M",
                                 seq="A" * 100))
        w.write(SamAlignment("m", 0, "chrM", 1, 254, "100M", seq="A" * 100))
    cov = coverage_from_sam(sp, {"c1": 2000, "chrM": 500})
    assert cov["c1"][150] == 20
    rois = locate_roi(cov, min_cov=5, min_len=50)
    assert len(rois) == 1
    assert (rois[0].chrom, rois[0].start, rois[0].end) == ("c1", 100, 200)
    out = tmp_path / "f.sam"
    stats = filter_sam_by_chrom(sp, out, exclude=["chrM"])
    assert stats == {"kept": 20, "dropped": 1}
    stats = filter_sam_by_chrom(sp, out, include=["^chrM$"])
    assert stats == {"kept": 1, "dropped": 20}


def test_rnade():
    from kit4b_tpu.align.rnade import (differential_expression, pearson,
                                       write_de_csv)
    samples = ["ctrl", "expt"]
    # balanced library totals (1000 vs 1000) so CPM normalization is neutral
    counts = {"up4x": [100, 400], "down4x": [400, 100],
              "flat": [300, 300], "low": [2, 3], "pad": [198, 197]}
    res = differential_expression(samples, counts, "ctrl", "expt")
    by = {r.feature: r for r in res}
    assert "low" not in by          # below min_counts
    assert by["flat"].fold_bin == 0
    assert by["up4x"].fold_bin == 4
    assert by["down4x"].fold_bin == -4
    assert abs(pearson([1, 2, 3], [2, 4, 6]) - 1.0) < 1e-9
    assert pearson([1, 1], [2, 3]) is None
    import tempfile, os
    d = tempfile.mkdtemp()
    write_de_csv(os.path.join(d, "de.csv"), res)
    assert open(os.path.join(d, "de.csv")).read().startswith('"Feature"')
