"""Conformation suite + standalone converter tools."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.cli import main
from kit4b_tpu.io.fasta import SeqRecord, write_fasta


def _params_csv(path, n_oct: int = 200, seed: int = 0):
    """Synthetic octamer params file (22 values per row)."""
    rng = np.random.default_rng(seed)
    rows = {}
    with open(path, "w") as f:
        f.write("octamer,twist,roll,tilt,rise,slide,shift,tst,tsr,tss,"
                "tsh,energy,minorgroove,rmsd,qmt,qpt,qmr,qpr,tqmt,tqpt,"
                "tqmr,tqpr,orchid\n")
        for _ in range(n_oct):
            mer = "".join(rng.choice(list("ACGT"), 8))
            if mer in rows:
                continue
            vals = rng.normal(34, 3, 22)
            rows[mer] = vals
            f.write(mer + "," + ",".join(f"{v:.3f}" for v in vals)
                    + "\n")
    return rows


def test_octamer_params_and_profile(tmp_path):
    from kit4b_tpu.tools.conformation import (load_octamer_params,
                                              octamer_indices,
                                              struct_profile)
    p = tmp_path / "oct.csv"
    rows = _params_csv(p)
    params = load_octamer_params(p)
    assert "twist" in params and "energy" in params
    assert params["twist"].shape == (65536,)
    # a listed octamer resolves to its own value
    mer = next(iter(rows))
    codes = dna.encode(mer)
    idx = octamer_indices(codes)
    assert len(idx) == 1
    assert abs(params["twist"][idx[0]] - rows[mer][0]) < 1e-3
    # its reverse complement shares the value unless itself listed
    rc = dna.decode(dna.revcomp(codes))
    if rc not in rows:
        ridx = octamer_indices(dna.encode(rc))
        assert abs(params["twist"][ridx[0]] - rows[mer][0]) < 1e-3
    # profile over seq containing an N is NaN at that step
    seq = dna.encode(mer + "N" + mer)
    prof = struct_profile(seq, params["twist"])
    assert len(prof) == len(seq) - 7
    assert np.isnan(prof[3])
    assert not np.isnan(prof[0])


def test_fasta2struct_fasta2dist_cli(tmp_path):
    rng = np.random.default_rng(4)
    p = tmp_path / "oct.csv"
    _params_csv(p, n_oct=400)
    fa = tmp_path / "seqs.fa"
    write_fasta(fa, [SeqRecord(f"s{i}", "",
                               rng.integers(0, 4, 60).astype(np.uint8))
                     for i in range(3)])
    out = tmp_path / "prof.csv"
    assert main(["fasta2struct", "-i", str(fa), "-I", str(p),
                 "-p", "twist", "-o", str(out)]) == 0
    assert out.read_text().startswith('"Seq","Step","twist"')
    dout = tmp_path / "dist.csv"
    assert main(["fasta2dist", "-i", str(fa), "-I", str(p),
                 "-o", str(dout)]) == 0
    lines = dout.read_text().splitlines()
    assert len(lines) == 4
    d01 = float(lines[1].split(",")[2])
    d10 = float(lines[2].split(",")[1])
    assert abs(d01 - d10) < 1e-6          # symmetric
    assert float(lines[1].split(",")[1]) == 0.0   # zero diagonal


def test_prednucleosomes_dyads():
    from kit4b_tpu.tools.conformation import call_dyads, dyad_scores
    # PE fragments of ~147 centred at 500 and 900 on c1
    alns = []
    for _ in range(12):
        alns.append(("c1", 500 - 73, 75, 147))
        alns.append(("c1", 900 - 70, 75, 141))
    alns.append(("c1", 100, 75, 300))       # wrong TLEN -> ignored
    scores = dyad_scores(alns, {"c1": 2000}, mode=0)
    dyads = call_dyads(scores, min_score=5.0)
    pos = sorted(d.pos for d in dyads)
    assert len(pos) == 2
    assert abs(pos[0] - 500) <= 2 and abs(pos[1] - 900) <= 4


def test_simulate_mnase_prefers_at_cuts(tmp_path):
    from kit4b_tpu.io.fasta import Genome
    from kit4b_tpu.tools.conformation import simulate_mnase
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([50_000]), codes)
    frags = simulate_mnase(g, 300, seed=2)
    assert len(frags) > 150
    cut5 = np.array([codes[s] for _, s, _ in frags])
    at = np.isin(cut5, [0, 3]).mean()
    assert at > 0.9                        # cuts 5' of A/T


def test_converters_roundtrip(tmp_path):
    from kit4b_tpu.tools.convert import read_loci_csv
    bed = tmp_path / "in.bed"
    bed.write_text("c1\t10\t60\tfeatA\t0\t+\nc2\t5\t45\tfeatB\t0\t-\n")
    csvp = tmp_path / "out.csv"
    assert main(["bed2csv", "-i", str(bed), "-o", str(csvp)]) == 0
    loci = read_loci_csv(csvp)
    assert loci[0]["chrom"] == "c1" and loci[0]["start"] == 10
    assert loci[0]["end"] == 59 and loci[1]["strand"] == "-"
    bed2 = tmp_path / "back.bed"
    assert main(["csv2bed", "-i", str(csvp), "-o", str(bed2)]) == 0
    f = bed2.read_text().splitlines()[0].split("\t")
    assert f[0] == "c1" and f[1] == "10" and f[2] == "60"

    # csv2fasta extracts the right subsequence, revcomp on '-'
    rng = np.random.default_rng(1)
    codes1 = rng.integers(0, 4, 100).astype(np.uint8)
    codes2 = rng.integers(0, 4, 100).astype(np.uint8)
    gfa = tmp_path / "g.fa"
    write_fasta(gfa, [SeqRecord("c1", "", codes1),
                      SeqRecord("c2", "", codes2)])
    ofa = tmp_path / "els.fa"
    assert main(["csv2fasta", "-i", str(csvp), "-g", str(gfa),
                 "-o", str(ofa)]) == 0
    from kit4b_tpu.io.fasta import read_seqs
    recs = {r.name: r.codes for r in read_seqs(ofa)}
    assert np.array_equal(recs["element1"], codes1[10:60])
    assert np.array_equal(recs["element2"],
                          dna.revcomp(codes2[5:45]))


def test_quickcount_and_split(tmp_path):
    from kit4b_tpu.tools.convert import quickcount
    recs = [SeqRecord("a", "", dna.encode("ACGTACGT")),
            SeqRecord("b", "", dna.encode("AAAA"))]
    c = quickcount(recs, min_k=1, max_k=2)
    assert c[1]["A"] == 6 and c[1]["C"] == 2
    assert c[2]["AC"] == 2 and c[2]["AA"] == 3
    fa = tmp_path / "multi.fa"
    write_fasta(fa, recs)
    outdir = tmp_path / "split"
    assert main(["splitmultifasta", "-i", str(fa),
                 "-o", str(outdir)]) == 0
    assert sorted(p.name for p in outdir.iterdir()) == ["a.fa", "b.fa"]


def test_gengenomefromagp(tmp_path):
    rng = np.random.default_rng(2)
    c1 = rng.integers(0, 4, 50).astype(np.uint8)
    c2 = rng.integers(0, 4, 40).astype(np.uint8)
    write_fasta(tmp_path / "ctg.fa", [SeqRecord("ctg1", "", c1),
                                      SeqRecord("ctg2", "", c2)])
    agp = tmp_path / "x.agp"
    agp.write_text(
        "chr1\t1\t50\t1\tW\tctg1\t1\t50\t+\n"
        "chr1\t51\t60\t2\tN\t10\tscaffold\tyes\tpaired-ends\n"
        "chr1\t61\t100\t3\tW\tctg2\t1\t40\t-\n")
    out = tmp_path / "asm.fa"
    assert main(["gengenomefromagp", "-i", str(tmp_path / "ctg.fa"),
                 "-I", str(agp), "-o", str(out)]) == 0
    from kit4b_tpu.io.fasta import read_seqs
    rec = next(iter(read_seqs(out)))
    assert rec.name == "chr1" and len(rec.codes) == 100
    assert np.array_equal(rec.codes[:50], c1)
    assert (rec.codes[50:60] == dna.BASE_N).all()
    assert np.array_equal(rec.codes[60:], dna.revcomp(c2))


def test_ufilter_and_usimdiffexpr(tmp_path):
    from kit4b_tpu.tools.convert import write_loci_csv
    loci = [{"srcid": 1, "type": "el", "species": "", "chrom": "c1",
             "start": 0, "end": 99, "len": 100, "strand": "+"},
            {"srcid": 2, "type": "el", "species": "", "chrom": "c1",
             "start": 200, "end": 219, "len": 20, "strand": "-"},
            {"srcid": 3, "type": "el", "species": "", "chrom": "c2",
             "start": 0, "end": 99, "len": 100, "strand": "+"}]
    src = tmp_path / "loci.csv"
    write_loci_csv(src, loci)
    out = tmp_path / "kept.csv"
    assert main(["ufilter", "-i", str(src), "-o", str(out),
                 "-s", "+", "-l", "50", "-Z", "c1"]) == 0
    from kit4b_tpu.tools.convert import read_loci_csv
    kept = read_loci_csv(out)
    assert [e["srcid"] for e in kept] == [1]

    cnts = tmp_path / "cnts.csv"
    de = tmp_path / "de.csv"
    assert main(["usimdiffexpr", "-o", str(cnts), "-t", "200",
                 "-n", "1", "-r", "2", "-e", "20",
                 "-d", str(de)]) == 0
    lines = cnts.read_text().splitlines()
    assert len(lines) == 201
    hdr = lines[0].split(",")
    assert len(hdr) == 5        # Transcript + 2 groups x 2 reps
    n_de = len(de.read_text().splitlines()) - 1
    assert n_de == 40


def test_loci2phylip(tmp_path):
    maf = tmp_path / "t.maf"
    maf.write_text(
        "##maf version=1\n\n"
        "a score=100\n"
        "s hg.chr1 10 8 + 1000 ACGTACGT\n"
        "s mm.chr2  5 8 + 2000 ACCTACGT\n"
        "s rn.chr3  0 8 + 1500 ACGTAAGT\n\n")
    assert main(["genmafalgn", "-i", str(maf),
                 "-o", str(tmp_path / "t.algn.npz")]) == 0
    loci = tmp_path / "roi.bed"
    loci.write_text("chr1\t12\t16\troi1\t0\t+\n")
    out = tmp_path / "out.phy"
    assert main(["loci2phylip", "-i", str(loci),
                 "-I", str(tmp_path / "t.algn.npz"),
                 "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].split() == ["3", "4"]
    seqs = {l.split()[0]: l.split()[1] for l in lines[1:]}
    assert seqs["hg"] == "GTAC" and seqs["mm"] == "CTAC"


def test_gennormwiggle(tmp_path):
    bed = tmp_path / "a.bed"
    bed.write_text("c1\t100\t150\tr1\t0\t+\nc1\t100\t150\tr2\t0\t+\n"
                   "c1\t300\t350\tr3\t0\t+\n")
    out = tmp_path / "n.wig"
    assert main(["gennormwiggle", "-i", str(bed), "-o", str(out)]) == 0
    txt = out.read_text()
    assert "variableStep chrom=c1" in txt
    lines = [l for l in txt.splitlines() if l and l[0].isdigit()]
    vals = {int(l.split()[0]): float(l.split()[1]) for l in lines}
    assert abs(vals[101] - 2e6 / 3) < 1 and abs(vals[301] - 1e6 / 3) < 1
