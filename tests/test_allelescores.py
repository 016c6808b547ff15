"""callhaplotypes allelic-association-score modes 7/8/9/11/12
(kmer/allelescores.py) + reference-binary PBA interop + modes 1/2 raw/GWAS
reporting. Golden test vs the reference binary at the bottom."""
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

from kit4b_tpu.kmer import allelescores as asc
from kit4b_tpu.kmer.pba import (load_pba_any, load_pba_ref, save_pba,
                                save_pba_ref)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFBIN = os.path.join(REPO, ".refbin", "ngskit4b")

# conformant PBA bytes (survive the reference's ValidatePBA,
# CallHaplotypes.cpp:3218): 0, pure majors, 2+2 / 2+1 / 1+1 combos
A3, C3, G3, T3 = 0xC0, 0x30, 0x0C, 0x03
AC22, AG22, CT21 = 0xA0 | 0x00, 0x80 | 0x08, 0x20 | 0x01


def test_score_pair_bins_oracle():
    # src  : A3  A3   0  AC22 C3  G3
    # ref  : A3  C3  A3  AC22 0   AG22
    src = np.array([A3, A3, 0, AC22, C3, G3], np.uint8)
    ref = np.array([A3, C3, A3, AC22, 0, AG22], np.uint8)
    (row,) = asc.score_pair_bins(src, ref, 0)
    bid, loci, size, al, ex, bi, pa, nr, es, ps = row
    # loci 0: exact (A3). loci 1: both covered, no shared allele -> nothing
    # but AlignLen counts. loci 2/4: one side uncovered. loci 3: exact,
    # not in the biallelic-3 set. loci 5: G score-bits intersect but src's
    # G=3 (0b11) carries a bit ref's G=2 (0b10) lacks -> NonRef (the
    # reference's ~RefPBA & SrcPBA test is bitwise over score fields,
    # CallHaplotypes.cpp:3689).
    assert (al, ex, bi, pa, nr) == (4, 2, 0, 0, 1)
    assert es == pytest.approx(2 / 4)
    assert ps == pytest.approx((2 + 0.5) / 4)


def test_score_nonref_allele():
    # shared allele C, but src also carries A which ref lacks -> NonRef
    src = np.array([AC22], np.uint8)
    ref = np.array([CT21], np.uint8)
    (row,) = asc.score_pair_bins(src, ref, 0)
    assert row[3:8] == (1, 0, 0, 0, 1)


def test_score_binning():
    src = np.full(10, A3, np.uint8)
    ref = np.concatenate([np.full(7, A3), np.full(3, C3)]).astype(np.uint8)
    rows = asc.score_pair_bins(src, ref, 4)
    assert [(r[0], r[1], r[2]) for r in rows] == [(1, 0, 4), (2, 4, 4),
                                                  (3, 8, 2)]
    assert [r[4] for r in rows] == [4, 3, 0]


def _mk_pbas(rng, n=30_000, n_samples=3, corr=None):
    """Synth PBA chrom dicts; corr[i] = index of sample that sample i
    mimics (with noise), None = independent."""
    alleles = np.array([A3, C3, G3, T3], np.uint8)
    base = alleles[rng.integers(0, 4, n)]
    out = []
    for i in range(n_samples):
        src = alleles[rng.integers(0, 4, n)] if corr is None or \
            corr[i] is None else out[corr[i]]["chr1"].copy()
        p = src.copy()
        noise = rng.random(n) < 0.02
        p[noise] = alleles[rng.integers(0, 4, noise.sum())]
        nocov = rng.random(n) < 0.1
        p[nocov] = 0
        out.append({"chr1": p, "chr2": base[: n // 2].copy()})
    return out


def test_gen_filter_transform_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    pbas = _mk_pbas(rng, n=20_000)
    refs = {f"ref{i}": pbas[i] for i in range(3)}
    out = str(tmp_path / "scores.csv")
    n = asc.gen_allele_scores(refs, {}, out, bin_size=8_000)
    rows = asc.read_score_csv(out)
    assert len(rows) == n
    # refs-vs-refs: 3x3 pairs, chr1 has 3 bins, chr2 has 2
    assert n == 9 * (3 + 2)
    # self-scores are all-exact
    for r in rows:
        if r["src"] == r["ref"] and r["alignlen"]:
            assert r["escore"] == pytest.approx(1.0)

    filt = str(tmp_path / "filt.csv")
    kept = asc.filter_allele_scores(out, filt, src_res=["ref0"],
                                    ref_res=["ref[01]"])
    assert kept == 2 * (3 + 2)
    assert all(r["src"] == "ref0" for r in asc.read_score_csv(filt))

    trans = str(tmp_path / "trans.csv")
    n_out = asc.filter_transform_allele_scores(out, trans,
                                               src_res=["ref0"])
    lines = open(trans).read().rstrip("\n").split("\n")
    hdr = lines[0].split(",")
    assert hdr[:6] == ['"SourcePBA"', '"Value"', '"Chrom"', '"Bin"',
                       '"BinLoci"', '"BinSize"']
    assert hdr[6:] == ['"ref0"', '"ref1"', '"ref2"']
    # 5 (src=ref0) bins x 7 value types
    assert n_out == len(lines) - 1 == 5 * 7


def test_group_allele_scores(tmp_path):
    rng = np.random.default_rng(11)
    # 4 refs; 2 srcs: src0 mimics ref1, src1 mimics ref3
    refs_l = _mk_pbas(rng, n=60_000, n_samples=4)
    refs = {f"ref{i}": refs_l[i] for i in range(4)}

    def noisy(p, rate):
        q = {k: v.copy() for k, v in p.items()}
        for v in q.values():
            m = rng.random(len(v)) < rate
            v[m] = 0
        return q

    srcs = {"src0": noisy(refs_l[1], 0.3), "src1": noisy(refs_l[3], 0.3)}
    scsv = str(tmp_path / "s.csv")
    asc.gen_allele_scores(refs, srcs, scsv, bin_size=12_000)
    res = asc.group_allele_scores(scsv, str(tmp_path / "grp"),
                                  min_unpruned=1, max_unpruned=1)
    assert res["refs"] == ["ref0", "ref1", "ref2", "ref3"]
    sel = res["sel"]
    # every bin of src0 selects ref1, src1 selects ref3
    assert (sel[0] == 1).all()
    assert (sel[1] == 3).all()
    # pruning kept exactly 1 ref per source
    assert (~res["pruned"][0]).sum() == 1 and not res["pruned"][0][1]
    assert (~res["pruned"][1]).sum() == 1 and not res["pruned"][1][3]
    for suffix in (".csv", ".selected.csv", ".imputation.csv",
                   ".imputation.summary.csv"):
        assert os.path.exists(str(tmp_path / "grp") + suffix)
    # grouping matrix: ref1 column counts 1 (src0) in each bin
    lines = open(str(tmp_path / "grp") + ".csv").read().splitlines()
    assert lines[0].split(",")[4:] == ['"ref0"', '"ref1"', '"ref2"',
                                       '"ref3"', '"GrpMembers:0"']
    for ln in lines[1:]:
        f = ln.split(",")
        assert f[4:] == ["0", "1", "0", "1", "0"]


def test_imputation_states(tmp_path):
    # craft scores with a tiny bin (size < 10000) between accepted bins
    hdr = asc.SCORE_HEADER
    rows = [
        # chrom, bin, loci, size, alignlen, escore/pscore
        ("s", "r", "c1", 1, 0, 20000, 15000, 10, 0, 5, 0, 0.8, 0.9),
        ("s", "r", "c1", 2, 20000, 5000, 4000, 9, 0, 4, 0, 0.5, 0.6),
        ("s", "r", "c1", 3, 25000, 20000, 50, 8, 0, 3, 0, 0.4, 0.5),
        ("s", "r", "c1", 4, 45000, 20000, 15000, 7, 0, 2, 0, 0.3, 0.4),
    ]
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write(hdr + "\n")
        for r in rows:
            f.write(f'"{r[0]}","{r[1]}","{r[2]}",' +
                    ",".join(str(v) for v in r[3:11]) +
                    f",{r[11]},{r[12]}\n")
    sb = asc.load_score_bins(p)
    asc.impute_score_bins(sb)
    st = sb.state[0, 0]
    # bin1 accepted; bin2 small -> imputed from bin1; bin3 low prop ->
    # NOT imputable from an imputed bin -> rejected, then retro-imputed
    # when bin4 is accepted
    assert st[0] == asc.ACCEPTED
    assert st[1] == asc.IMPUTED
    assert sb.escore[0, 0, 1] == pytest.approx(0.8)
    assert st[2] == asc.IMPUTED  # retro-imputed from bin 4
    assert sb.escore[0, 0, 2] == pytest.approx(0.3)
    assert st[3] == asc.ACCEPTED


def test_outlier_flip():
    sb = asc.ScoreBins(
        srcs=["s"], refs=["r0", "r1"], chroms=["c"] * 3,
        bin_ids=np.array([1, 2, 3]), bin_loci=np.array([0, 10, 20]),
        bin_sizes=np.array([10] * 3),
        alignlen=np.ones((1, 2, 3), np.int64),
        escore=np.zeros((1, 2, 3)),
        pscore=np.array([[[0.9, 0.1, 0.9], [0.1, 0.9, 0.1]]]))
    sel = asc.select_references(sb, np.zeros((1, 2), np.bool_))
    assert list(sel[0]) == [0, 0, 0]  # middle bin flipped to bracket


def test_pba_ref_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    chroms = {"chr1": rng.integers(0, 256, 1000).astype(np.uint8),
              "chr2": rng.integers(0, 256, 500).astype(np.uint8)}
    p = str(tmp_path / "x.pba")
    save_pba_ref(p, chroms, readset="rs1", experiment="E9",
                 ref_assembly="asm")
    rs, back = load_pba_ref(p)
    assert rs == "rs1"
    assert list(back) == ["chr1", "chr2"]
    for k in chroms:
        np.testing.assert_array_equal(back[k], chroms[k])
    rs2, back2 = load_pba_any(p)
    assert rs2 == "rs1" and list(back2) == ["chr1", "chr2"]


def test_cli_modes_0_1_2(tmp_path):
    from kit4b_tpu.cli import main
    rng = np.random.default_rng(7)
    alleles = np.array([A3, C3, G3, T3], np.uint8)
    n = 40_000

    class G:
        names = ["chr1"]
        starts = np.array([0])
        lengths = np.array([n])

    fa = alleles[rng.integers(0, 4, n)]
    fb = alleles[rng.integers(0, 4, n)]
    # progeny: first half Fa, second half Fb, thin coverage
    prog = np.concatenate([fa[: n // 2], fb[n // 2:]]).copy()
    prog[rng.random(n) < 0.7] = 0
    paths = {}
    for name, arr in (("fa", fa), ("fb", fb), ("prog", prog)):
        p = str(tmp_path / f"{name}.pba.npz")
        save_pba(p, G, arr, readset=name)
        paths[name] = p
    out = str(tmp_path / "hap")
    rc = main(["callhaplotypes", "-m", "2",
               "-c", f"Fa={paths['fa']}", f"Fb={paths['fb']}",
               "-i", f"P1={paths['prog']}", "-o", out])
    assert rc == 0
    for suffix in (".matrix.csv", ".raw.matrix.csv", ".P1.raw.csv",
                   ".P1.raw.gwas", ".P1.imputed.gwas"):
        assert os.path.exists(out + suffix), suffix
    # matrix: first-half bins call Fa (1), second half Fb (2)
    lines = open(out + ".matrix.csv").read().splitlines()
    assert lines[0] == '"Chrom","Loci","P1"'
    calls = [int(ln.split(",")[2]) for ln in lines[1:]]
    assert calls[0] == 1 and calls[-1] == 2
    gwas = open(out + ".P1.imputed.gwas").read().splitlines()
    assert gwas[0] == "CHR BP SNP P"
    assert any(ln.endswith(" 0.3") for ln in gwas[1:])
    assert any(ln.endswith(" 0.9") for ln in gwas[1:])


def test_cli_modes_7_9_11_12(tmp_path):
    from kit4b_tpu.cli import main
    rng = np.random.default_rng(13)
    refs_l = _mk_pbas(rng, n=30_000, n_samples=2)

    class G:
        names = ["chr1", "chr2"]
        starts = np.array([0, 30_000])
        lengths = np.array([30_000, 15_000])

    paths = []
    for i, chroms in enumerate(refs_l):
        p = str(tmp_path / f"r{i}.pba.npz")
        concat = np.concatenate([chroms["chr1"], chroms["chr2"]])
        save_pba(p, G, concat, readset=f"r{i}")
        paths.append(p)
    scores = str(tmp_path / "sc.csv")
    rc = main(["callhaplotypes", "-m", "8", "-g", "12000",
               "-c", f"r0={paths[0]}", f"r1={paths[1]}", "-o", scores])
    assert rc == 0
    rows = asc.read_score_csv(scores)
    assert len(rows) == 4 * (3 + 2)

    filt = str(tmp_path / "filt.csv")
    rc = main(["callhaplotypes", "-m", "11", "-A", scores,
               "-r", "r0", "-o", filt])
    assert rc == 0
    assert all(r["src"] == "r0" for r in asc.read_score_csv(filt))

    trans = str(tmp_path / "tr.csv")
    rc = main(["callhaplotypes", "-m", "12", "-A", scores, "-o", trans])
    assert rc == 0 and os.path.getsize(trans) > 0

    grp = str(tmp_path / "grp")
    rc = main(["callhaplotypes", "-m", "9", "-A", scores, "-o", grp,
               "--minunprunedrefs", "1", "-P", "1"])
    assert rc == 0 and os.path.exists(grp + ".csv")


@pytest.mark.golden
@pytest.mark.skipif(not os.path.exists(REFBIN),
                    reason="reference binary not built")
def test_golden_mode8_scores(tmp_path):
    """Mode 8 refs-vs-refs scores: our CSV vs the reference binary's on
    identical reference-format PBA inputs (trimming disabled)."""
    rng = np.random.default_rng(21)
    pbas = _mk_pbas(rng, n=25_000, n_samples=2)
    # force conformant-only bytes (they already are) and write reference
    # binary PBA containers
    bed = str(tmp_path / "chroms.bed")
    with open(bed, "w") as f:
        f.write("chr1\t0\t25000\tchr1\nchr2\t0\t12500\tchr2\n")
    ref_paths = []
    for i, chroms in enumerate(pbas):
        p = str(tmp_path / f"f{i}.pba")
        save_pba_ref(p, chroms, readset=f"f{i}")
        ref_paths.append(p)
    out_ref = str(tmp_path / "refout")
    r = subprocess.run(
        [REFBIN, "callhaplotypes", "-m", "8", "-y", "0", "-Y", "0",
         "-g", "10000", "-c", bed, "-I", ref_paths[0], "-I", ref_paths[1],
         "-o", out_ref, "-F", str(tmp_path / "log.txt")],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    ref_rows = asc.read_score_csv(out_ref + ".score.csv")
    assert ref_rows, "reference produced no score rows"

    refs = {f"f{i}": pbas[i] for i in range(2)}
    ours_csv = str(tmp_path / "ours.csv")
    asc.gen_allele_scores(refs, {}, ours_csv, bin_size=10_000)
    our_rows = asc.read_score_csv(ours_csv)

    key = lambda r: (r["src"], r["ref"], r["chrom"], r["bin"])  # noqa: E731
    ours_by = {key(r): r for r in our_rows}
    assert len(ours_by) == len(our_rows)
    n_checked = 0
    for rr in ref_rows:
        mine = ours_by[key(rr)]
        for f in ("loci", "size", "alignlen", "exact", "biallelic",
                  "partial", "nonref"):
            assert mine[f] == rr[f], (key(rr), f, mine[f], rr[f])
        assert mine["escore"] == pytest.approx(rr["escore"], abs=1e-6)
        assert mine["pscore"] == pytest.approx(rr["pscore"], abs=1e-6)
        n_checked += 1
    assert n_checked == len(our_rows)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
