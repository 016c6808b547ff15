"""Full rnade engine (CRNA_DE parity): bins, bootstrap, classification."""
import numpy as np

from kit4b_tpu.align import rnade
from kit4b_tpu.io.biobed import GeneModel


def _gene(name="g1", chrom="c", start=0, end=1000, strand="+",
          cds=(100, 900), exons=((0, 400), (600, 1000))):
    ex_s = np.asarray([a for a, _ in exons], np.int64)
    ex_e = np.asarray([b for _, b in exons], np.int64)
    return GeneModel(chrom, start, end, name, strand, cds[0], cds[1],
                     ex_s, ex_e)


def _reads(chrom, positions, strand="+"):
    return [(chrom, int(p), int(p) + 50, strand) for p in positions]


def test_feature_spans():
    g = _gene()
    assert rnade._feature_spans(g, rnade.REGION_TRANSCRIPT) == [(0, 1000)]
    assert rnade._feature_spans(g, rnade.REGION_EXONS) == \
        [(0, 400), (600, 1000)]
    assert rnade._feature_spans(g, rnade.REGION_INTRONS) == [(400, 600)]
    assert rnade._feature_spans(g, rnade.REGION_CDS) == \
        [(100, 400), (600, 900)]
    assert rnade._feature_spans(g, rnade.REGION_5UTR) == [(0, 100)]
    assert rnade._feature_spans(g, rnade.REGION_3UTR) == [(900, 1000)]


def test_classify_lattice():
    # indeterminate
    assert rnade.classify(0.0, 0.0, False) == (0, 0, 0)
    # hi Pearson + no fold change -> congruent, DE score small
    cs, ps, de = rnade.classify(1.0, 0.95, True)
    assert ps == 4 and cs == 4
    # squash: 4*4=16 -> 9
    assert de == 9
    # hi fold + no correlation: 1*1=1
    cs, ps, de = rnade.classify(5.0, 0.0, True)
    assert cs == 1 and ps == 1 and de == 1


def test_rnade_process_detects_de():
    rng = np.random.default_rng(2)
    genes = [_gene("same", exons=((0, 1000),), cds=(0, 1000)),
             _gene("up4x", chrom="c2", exons=((0, 1000),),
                   cds=(0, 1000))]
    # feature "same": equal depth both libraries, strongly peaked
    # correlated profile (exon-like peaks survive Poisson resampling)
    peaks = np.clip(np.concatenate([
        rng.normal(50, 15, 300), rng.normal(450, 15, 200),
        rng.normal(850, 15, 100)]).astype(np.int64), 0, 940)
    ctrl = _reads("c", peaks) + _reads("c2", rng.integers(0, 1000, 150))
    expr = _reads("c", peaks + 3) + \
        _reads("c2", rng.integers(0, 1000, 600))
    feats = rnade.rnade_process(ctrl, expr, genes, num_bins=10,
                                region=rnade.REGION_TRANSCRIPT,
                                max_iters=500, norm_scale=1.0)
    by = {f.feature: f for f in feats}
    assert by["same"].obs_pearson > 0.95          # correlated profiles
    assert by["same"].pearson_score >= 3
    assert by["same"].cnts_score == 4             # no fold change
    assert by["up4x"].fold_median > 1.75          # strong DE
    assert by["up4x"].cnts_score == 1
    assert by["up4x"].obs_fold > 1.75
    # bins populated and CSV writes
    assert by["same"].ctrl_bins.sum() > 0
    import tempfile
    with tempfile.NamedTemporaryFile("r", suffix=".csv") as f:
        rnade.write_rnade_csv(f.name, feats)
        lines = open(f.name).read().splitlines()
        assert len(lines) == 3
        assert lines[0].startswith('"Classification"')


def test_rnade_cli(tmp_path):
    from kit4b_tpu.cli import main
    rng = np.random.default_rng(4)
    bed = tmp_path / "genes.bed"
    bed.write_text("c\t0\t1000\tgA\t0\t+\n")
    # SAM inputs
    for name, n in (("ctrl", 200), ("expr", 600)):
        with open(tmp_path / f"{name}.sam", "w") as f:
            f.write("@SQ\tSN:c\tLN:2000\n")
            for i, p in enumerate(rng.integers(0, 950, n)):
                f.write(f"r{i}\t0\tc\t{p + 1}\t60\t50M\t*\t0\t0\t"
                        + "A" * 50 + "\t*\n")
    out = tmp_path / "de.csv"
    rc = main(["rnade", "-i", str(tmp_path / "ctrl.sam"),
               "-I", str(tmp_path / "expr.sam"),
               "-g", str(bed), "-o", str(out), "-r", "0"])
    assert rc == 0
    rows = out.read_text().splitlines()
    assert len(rows) == 2
    # up ~3x after autonormalisation is disabled? autoscale normalises
    # library sizes, and the whole library is one feature here, so the
    # fold median should be ~1 under autoscaling
    fold_median = float(rows[1].split(",")[17])
    assert 0.5 < fold_median < 2.0