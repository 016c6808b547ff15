"""MAGIC benchmark (observed-CIGAR regeneration + base-level scoring)."""
import numpy as np

from kit4b_tpu import dna
from kit4b_tpu.align import magicbench as mb
from kit4b_tpu.io.fasta import Genome, SeqRecord


def _genome(n=30000, seed=11):
    rng = np.random.default_rng(seed)
    return Genome.from_records(
        [SeqRecord("chrT", "", rng.integers(0, 4, n).astype(np.uint8))])


def test_cigar_helpers():
    ops = mb.parse_cigar("10=2X3I5D20=")
    assert mb.read_len_of(ops) == 35
    assert mb.ref_len_of(ops) == 37
    assert mb.potential_match_bases(ops) == 32
    loci = mb.expand_ref_loci(ops, 100, 35)
    assert loci[0] == 100 and loci[11] == 111
    assert (loci[12:15] == -1).all()           # insert bases
    assert loci[15] == 117                      # after 5D skip


def _write_sam(path, g, rows):
    with open(path, "w") as f:
        f.write("@HD\tVN:1.4\tSO:unsorted\n")
        f.write(f"@SQ\tSN:chrT\tLN:{int(g.lengths[0])}\n")
        for qname, flag, pos1, cigar, seq in rows:
            f.write(f"{qname}\t{flag}\tchrT\t{pos1}\t60\t{cigar}\t*\t0\t0"
                    f"\t{seq}\t*\n")


def test_gen_obs_cigars_and_roundtrip(tmp_path):
    g = _genome()
    # construct a read: 30 match, 1 mismatch, 19 match at locus 500
    codes = np.array(g.seq[500:550])
    codes[30] = (codes[30] + 1) & 3
    sam = tmp_path / "in.sam"
    _write_sam(sam, g, [("r1", 0, 501, "50M", dna.decode(codes))])
    profs = mb.gen_obs_cigars(sam, g)
    assert len(profs) == 1
    assert profs[0].err_profile == "30=1X19="
    assert profs[0].cigar == "50M"
    f = tmp_path / "obs.csv"
    mb.write_obs_cigars(f, profs)
    loaded, pe = mb.read_obs_cigars(f)
    assert not pe and loaded[0].err_profile == "30=1X19="


def test_sim_reads_and_score(tmp_path):
    g = _genome()
    profs = [mb.ObsProfile(1, 50, "+", "50M", "20=1X29="),
             mb.ObsProfile(2, 50, "-", "50M", "10=2I5D33=")]
    se, _ = mb.sim_reads_from_profiles(g, profs, 40, seed=3)
    assert len(se) == 40
    # ground truth descriptors parse back
    from kit4b_tpu.io.fasta import write_fasta
    fa = tmp_path / "sim.fa"
    write_fasta(fa, se)
    gt = mb.load_ground_truth(fa)
    assert len(gt) == 40
    # a perfect aligner: alignments exactly at ground truth
    rows = []
    for rec in se:
        parts = rec.descr.split()
        start1, strand, cig = int(parts[3]), parts[4], parts[5]
        ops = mb.parse_cigar(cig)
        sam_cig = []
        for n, op in ops:
            sam_cig.append((n, "M" if op in "=X" else op))
        flag = 16 if strand == "-" else 0
        seq = rec.codes if strand != "-" else dna.revcomp(rec.codes)
        # SAM SEQ is the read as aligned to the forward strand
        rows.append((rec.name, flag, start1,
                     mb.cigar_str(sam_cig), dna.decode(
                         dna.revcomp(rec.codes) if strand == "-"
                         else rec.codes)))
    sam = tmp_path / "al.sam"
    _write_sam(sam, g, rows)
    sc = mb.score_alignments(sam, gt)
    m = sc.measures()
    assert sc.n_scored == 40
    assert sc.bases_incorrect == 0
    assert m["precision_bases"] == 1.0
    assert m["recall_bases"] > 0.99
    assert m["fbeta_reads"] == 1.0
    # a misaligner: everything shifted 1000bp
    rows_bad = [(q, f, p + 1000, c, s) for q, f, p, c, s in rows]
    sam2 = tmp_path / "bad.sam"
    _write_sam(sam2, g, rows_bad)
    gt2 = mb.load_ground_truth(fa)
    sc2 = mb.score_alignments(sam2, gt2)
    assert sc2.bases_correct == 0


def test_benchmark_cli_pipeline(tmp_path):
    """gencigars -> simreads -> kalign-free score via CLI."""
    from kit4b_tpu.cli import main
    from kit4b_tpu.io.fasta import write_fasta
    g = _genome()
    gfa = tmp_path / "g.fa"
    recs = [SeqRecord("chrT", "", np.array(g.seq[:int(g.lengths[0])]))]
    write_fasta(gfa, recs)
    # control alignments: 60 clean reads
    rows = []
    rng = np.random.default_rng(5)
    for i in range(60):
        pos = int(rng.integers(0, 20000))
        codes = np.array(g.seq[pos:pos + 50])
        if i % 3 == 0:
            codes[25] = (codes[25] + 1) & 3
        rows.append((f"c{i}", 0, pos + 1, "50M", dna.decode(codes)))
    sam = tmp_path / "ctrl.sam"
    _write_sam(sam, g, rows)
    obs = tmp_path / "obs.csv"
    assert main(["benchmark", "-m", "1", "-i", str(sam), "--refgenome",
                 str(gfa), "--cigarsfile", str(obs)]) == 0
    sim = tmp_path / "sim.fa"
    assert main(["benchmark", "-m", "2", "--cigarsfile", str(obs),
                 "--refgenome", str(gfa), "-o", str(sim),
                 "--maxreads", "50"]) == 0
    # align the simulated reads with the real aligner on CPU
    from kit4b_tpu.align import kalign
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import read_seqs
    idx = SfxIndex.build(g)
    al = kalign.KAligner(idx, batch_size=512)
    outsam = tmp_path / "out.sam"
    kalign.write_sam(outsam, idx, al.align_records(read_seqs(sim)))
    score = tmp_path / "score.json"
    assert main(["benchmark", "-m", "3", "-i", str(outsam),
                 "--groundtruth", str(sim), "-o", str(score)]) == 0
    import json
    res = json.loads(score.read_text())
    assert res["scored"] >= 45
    assert res["fbeta_bases"] > 0.9
