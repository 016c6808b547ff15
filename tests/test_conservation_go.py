"""Conservation workflows (genmafalgn/.algn + hypers), GO tools, SQLite
generators, bioseq container."""
import sqlite3

import numpy as np

MAF = """##maf version=1
a score=100
s hg.chr1  10 20 + 1000 ACGTACGTACGTACGTACGT
s mm.chr3   5 20 + 500  ACGTACGTACGTACGTACGT
s rn.chr2   7 20 + 400  ACGTACGTACGAACGTACGT

a score=50
s hg.chr1 100 10 + 1000 AC-GTACGTAC
s mm.chr7  40 11 + 800  ACTGTACGTAC
"""


def test_malign_roundtrip_and_hypers(tmp_path):
    from kit4b_tpu.io.malign import MAlign
    from kit4b_tpu.tools.hypers import find_hypercores, length_distribution
    maf = tmp_path / "t.maf"
    maf.write_text(MAF)
    ma = MAlign.from_maf(maf, ref_species="hg")
    assert len(ma.blocks) == 2
    assert ma.blocks[0].ref_chrom == "chr1"
    assert ma.blocks[0].ref_start == 10
    p = tmp_path / "t.algn.npz"
    ma.save(p)
    ma2 = MAlign.load(p)
    assert len(ma2.blocks) == 2
    assert np.array_equal(ma2.blocks[0].rows, ma.blocks[0].rows)

    # ultra: zero mismatches -> the run up to the rn mismatch at col 11
    els = find_hypercores(ma2, min_core_len=5, max_mismatches=0)
    spans = {(e.start, e.end) for e in els if e.chrom == "chr1"}
    assert (10, 21) in spans       # cols 0..10 conserved (rn col 11 = A)
    assert (22, 30) in spans       # cols 12..19
    # hyper: one mismatch bridges the gap
    els1 = find_hypercores(ma2, min_core_len=15, max_mismatches=1)
    assert any(e.start == 10 and e.end == 30 and e.mismatch_cols == 1
               for e in els1)
    assert length_distribution(els1, num_bins=10)


def test_go_enrichment(tmp_path):
    from kit4b_tpu.tools.go import (enrich, parse_associations, parse_obo,
                                    propagate)
    obo = tmp_path / "go.obo"
    obo.write_text(
        "format-version: 1.2\n\n[Term]\nid: GO:0001\nname: root\n"
        "namespace: biological_process\n\n[Term]\nid: GO:0002\n"
        "name: child\nis_a: GO:0001 ! root\n\n[Term]\nid: GO:0003\n"
        "name: other\n\n[Typedef]\nid: part_of\n")
    terms = parse_obo(obo)
    assert terms["GO:0002"].parents == ["GO:0001"]
    gaf = tmp_path / "assoc.csv"
    gaf.write_text("g1,GO:0002\ng2,GO:0002\ng3,GO:0003\ng4,GO:0003\n"
                   "g5,GO:0003\ng6,GO:0003\n")
    assoc = propagate(parse_associations(gaf), terms)
    assert assoc["g1"] == {"GO:0002", "GO:0001"}
    rows = enrich(["g1", "g2"], list(assoc), assoc, terms)
    best = rows[0]
    assert best.goid in ("GO:0002", "GO:0001")
    assert best.sample_hits == 2 and best.pop_hits == 2
    assert best.pvalue < 0.1
    assert all(0 <= r.fdr <= 1 for r in rows)


def test_sqlite_generators(tmp_path):
    from kit4b_tpu.align.snp import SnpCall, write_snps_csv
    from kit4b_tpu.tools.tosqlite import (de_to_sqlite, psl_to_sqlite,
                                          snps_to_sqlite)
    csvp = tmp_path / "snps.csv"
    write_snps_csv(csvp, [
        SnpCall("c1", 5, 1, np.array([0, 1, 9, 0, 0]), 10, 9, 0.01, 1e-8),
        SnpCall("c2", 9, 0, np.array([2, 0, 0, 8, 0]), 10, 8, 0.02, 1e-6)])
    db = tmp_path / "s.db"
    assert snps_to_sqlite(csvp, db, experiment="e1") == 2
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM TblSnps").fetchone()[0] == 2
    assert con.execute("SELECT COUNT(*) FROM TblSeqs").fetchone()[0] == 2
    con.close()

    dep = tmp_path / "de.csv"
    dep.write_text('"Feature","Classification","FoldChange",'
                   '"PearsonCtrl","PearsonExpr"\n"gene1","up",2.5,0.9,0.8\n')
    assert de_to_sqlite(dep, tmp_path / "de.db") == 1

    psl = tmp_path / "a.psl"
    psl.write_text("90\t5\t0\t0\t0\t0\t0\t0\t+\tq1\t100\t0\t95\tt1\t"
                   "1000\t100\t195\t1\t95,\t0,\t100,\n")
    assert psl_to_sqlite(psl, tmp_path / "p.db") == 1


def test_bioseq_roundtrip(tmp_path):
    from kit4b_tpu import dna
    from kit4b_tpu.io.fasta import Genome, SeqRecord, write_fasta
    fa = tmp_path / "g.fa"
    write_fasta(fa, [SeqRecord("c1", "", dna.encode("ACGTACGT")),
                     SeqRecord("c2", "", dna.encode("TTTTCCCC"))])
    g = Genome.load(fa)
    p = tmp_path / "g.seq.npz"
    g.save_bioseq(p)
    g2 = Genome.load_bioseq(p)
    assert g2.names == ["c1", "c2"]
    assert np.array_equal(g2.seq, g.seq)
    assert np.array_equal(g2.lengths, g.lengths)
