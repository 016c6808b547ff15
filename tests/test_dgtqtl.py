"""DGT/QTL allele analysis (CDGTvQTLs parity)."""
import numpy as np

from kit4b_tpu.kmer import dgtqtl


def test_diplotype_txt():
    assert dgtqtl.diplotype_txt(0) == "-/-"
    assert dgtqtl.diplotype_txt(0xC0) == "A/A"
    assert dgtqtl.diplotype_txt(0xC0 | 0x0C) == "A/G"


def test_analyse_qtl_classification(tmp_path):
    L = 100
    ref = np.full(L, 0xC0, np.uint8)          # reference: all A
    samples = {}
    rng = np.random.default_rng(1)
    # 20 samples: locus 10 all G (hom alt), locus 20 half A half C (het),
    # locus 30 mostly uncovered
    for i in range(20):
        p = np.full(L, 0xC0, np.uint8)
        p[10] = 0x0C
        p[20] = 0xC0 if i < 10 else 0x30
        if i < 18:
            p[30] = 0
        samples[f"s{i}"] = {"c": p}
    insts = [{"chrom": "c", "loci": 10, "ref": "A", "alt": "G",
              "qtl": True, "dgt": False},
             {"chrom": "c", "loci": 20, "ref": "A", "alt": "C",
              "qtl": True, "dgt": True},
             {"chrom": "c", "loci": 30, "ref": "A", "alt": "T",
              "qtl": True, "dgt": False}]
    rows = dgtqtl.analyse_dgt_qtls(insts, {"c": ref}, samples, mode=1)
    by = {r["loci"]: r for r in rows}
    assert by[10]["grp1"] == "G/G"
    assert by[10]["homozygous"] == 1
    assert by[10]["samples_ref_mismatch"] == 1
    assert by[10]["mono_allelic"] == 1
    assert by[10]["loci_type"] == 2
    assert by[20]["homozygous"] == 0 and by[20]["heterozygous"] == 1
    assert by[20]["loci_type"] == 3
    assert by[30]["characterised"] == 0      # low coverage
    out = tmp_path / "d.csv"
    dgtqtl.write_dgt_qtl_csv(out, rows)
    assert len(out.read_text().splitlines()) == 4


def test_load_dgts_from_callhaplotypes_csv(tmp_path):
    f = tmp_path / "dgts.csv"
    f.write_text('"RowID","Chrom","Loci","Allele","Group","FMeasure"\n'
                 '1,"c1",100,"A",1,0.95\n2,"c1",200,"G",2,0.93\n')
    insts = dgtqtl.load_dgt_loci(f)
    assert len(insts) == 2
    assert insts[0]["chrom"] == "c1" and insts[0]["loci"] == 100
    assert insts[1]["ref"] == "G"
