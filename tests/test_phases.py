"""kalign post-alignment phases: autotrim, PCR5 correct, constraints,
multiloci assignment (reference KAligner.cpp:617-:656 phase list)."""
import numpy as np

import conftest  # noqa: F401

from kit4b_tpu import dna
from kit4b_tpu.align import kalign, phases
from kit4b_tpu.align.kalign import NAR_ACCEPTED, NAR_MULTI, AlignResult
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome, SeqRecord


def _genome(n=100_000, seed=5):
    rng = np.random.default_rng(seed)
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    return Genome(["c1"], np.array([0]), np.array([n]), seq)


def test_auto_trim_flanks():
    g = _genome()
    # read matching at pos 1000 with mismatches at both flanks
    r = g.seq[1000:1100].copy()
    r[0] = (r[0] + 1) % 4
    r[1] = (r[1] + 1) % 4
    r[98] = (r[98] + 1) % 4
    rec = SeqRecord("t", "", r)
    res = AlignResult(NAR_ACCEPTED, strand=0, pos=1000, mm=3)
    st = phases.auto_trim_flanks([(rec, res)], g.seq, min_flank_exacts=5)
    assert st["trimmed"] == 1 and st["removed"] == 0
    assert res.trim_left == 2 and res.trim_right == 2
    assert res.pos == 1002 and res.mm == 0
    assert res.cigar == "2S96M2S"
    # untrimmable read (mismatch every 3 bases) is removed
    r2 = g.seq[2000:2100].copy()
    r2[::3] = (r2[::3] + 1) % 4
    res2 = AlignResult(NAR_ACCEPTED, strand=0, pos=2000, mm=34)
    st2 = phases.auto_trim_flanks([(SeqRecord("u", "", r2), res2)], g.seq, 5)
    assert st2["removed"] == 1 and res2.nar == phases.NAR_TRIM


def test_auto_trim_minus_strand():
    g = _genome()
    fwd = g.seq[3000:3100].copy()
    fwd[0] = (fwd[0] + 1) % 4          # genome-coords 5' mismatch
    rec = SeqRecord("m", "", dna.revcomp(fwd))   # read stored reversed
    res = AlignResult(NAR_ACCEPTED, strand=1, pos=3000, mm=1)
    st = phases.auto_trim_flanks([(rec, res)], g.seq, 3)
    assert st["trimmed"] == 1
    assert res.pos == 3001 and res.mm == 0 and res.cigar == "1S99M"


def test_pcr5_primer_correct():
    g = _genome()
    r = g.seq[5000:5100].copy()
    for i in (0, 3, 7):                 # 3 artefact subs in first 12bp
        r[i] = (r[i] + 1) % 4
    rec = SeqRecord("p", "", r)
    res = AlignResult(NAR_ACCEPTED, strand=0, pos=5000, mm=3)
    # target rate 1 sub/100bp -> must correct 2 of the 3
    st = phases.pcr5_primer_correct([(rec, res)], g.seq, max_sub_rate=1,
                                    klen=12)
    assert st["corrected_reads"] == 1 and st["corrected_bases"] == 2
    assert res.mm == 1
    assert np.array_equal(rec.codes[:4], g.seq[5000:5004])  # 0,3 corrected


def test_loci_constraints(tmp_path):
    g = _genome()
    p = tmp_path / "cons.csv"
    base_ok = "ACGT"[int(g.seq[8050])]
    base_bad = "ACGT"[(int(g.seq[7050]) + 1) % 4]
    p.write_text(f'"c1",7050,"{base_bad}"\n"c1",8050,"{base_ok}"\n')
    cons = phases.load_loci_constraints(p, g)
    rec1 = SeqRecord("a", "", g.seq[7000:7100].copy())
    res1 = AlignResult(NAR_ACCEPTED, strand=0, pos=7000, mm=0)
    rec2 = SeqRecord("b", "", g.seq[8000:8100].copy())
    res2 = AlignResult(NAR_ACCEPTED, strand=0, pos=8000, mm=0)
    n = phases.identify_constraint_violations(
        [(rec1, res1), (rec2, res2)], cons)
    assert n == 1
    assert res1.nar == phases.NAR_CONSTRAINED   # base violates constraint
    assert res2.nar == NAR_ACCEPTED             # allowed base at 8050?
    # 8050 constraint allows the reference base -> read 2 stays accepted


def test_assign_multi_matches():
    g = _genome()
    # unique stack at 10_000..10_200, isolated multi locus at 50_000
    aligned = []
    for i in range(30):
        pos = 10_000 + i * 5
        aligned.append((SeqRecord(f"u{i}", "", g.seq[pos:pos + 100].copy()),
                        AlignResult(NAR_ACCEPTED, strand=0, pos=pos, mm=0)))
    mrec = SeqRecord("m", "", g.seq[10_050:10_150].copy())
    mres = AlignResult(NAR_MULTI, mm=0, n_low=2,
                       multi_ids=np.array([10_050 * 2, 50_000 * 2]))
    aligned.append((mrec, mres))
    n = phases.assign_multi_matches(aligned)
    assert n == 1
    assert mres.nar == NAR_ACCEPTED and mres.pos == 10_050


def test_mlmode_rand_and_all():
    mres = AlignResult(NAR_MULTI, mm=1, n_low=2,
                       multi_ids=np.array([100 * 2, 200 * 2 + 1]))
    rec = SeqRecord("r", "", np.zeros(50, np.uint8))
    n = phases.assign_multi_random([(rec, mres)], seed=3)
    assert n == 1 and mres.nar == NAR_ACCEPTED
    assert mres.pos in (100, 200)

    mres2 = AlignResult(NAR_MULTI, mm=1, n_low=2,
                        multi_ids=np.array([100 * 2, 200 * 2 + 1]))
    out = phases.expand_multi_all([(rec, mres2)])
    assert len(out) == 2
    assert out[0][1].nar == NAR_ACCEPTED and not out[0][1].secondary
    assert out[1][1].secondary and out[1][1].pos == 200


def test_cli_kalign_phases(tmp_path):
    """End-to-end: -x autotrim + --mlmode 5 through the CLI."""
    import subprocess, sys, os
    g = _genome(50_000, seed=9)
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">c1\n")
        s = "".join("ACGT"[b] for b in g.seq[:-1])
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    # reads: clean + flank-damaged
    reads = tmp_path / "r.fa"
    with open(reads, "w") as f:
        rng = np.random.default_rng(2)
        for i in range(50):
            p = int(rng.integers(0, 49_000))
            r = g.seq[p:p + 100].copy()
            r[0] = (r[0] + 1) % 4
            f.write(f">rd{i}\n" + "".join("ACGT"[b] for b in r) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    subprocess.run([sys.executable, "-m", "kit4b_tpu", "index", "-i",
                    str(fa), "-o", str(tmp_path / "g.kix")], check=True,
                   env=env, capture_output=True)
    r = subprocess.run([sys.executable, "-m", "kit4b_tpu", "kalign",
                        "-i", str(reads), "-I", str(tmp_path / "g.kix"),
                        "-o", str(tmp_path / "o.sam"), "-x", "3",
                        "--mlmode", "5", "-b", "64"],
                       env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    sam = (tmp_path / "o.sam").read_text()
    assert "1S99M" in sam    # autotrimmed flank


def test_remove_orphan_junctions():
    """Orphan splice/indel junctions (no second read within +/-3 on both
    coords) demote to unaligned (KAligner.cpp:2406/:2501)."""
    from kit4b_tpu.align.kalign import NAR_ACCEPTED, AlignResult
    from kit4b_tpu.align.phases import (NAR_ORPHAN_INDEL,
                                        NAR_ORPHAN_SPLICE,
                                        remove_orphan_junctions)
    from kit4b_tpu.io.fasta import SeqRecord
    import numpy as np

    def rec(n):
        return SeqRecord(n, "", np.zeros(60, np.uint8))

    def res(pos, cigar):
        return AlignResult(NAR_ACCEPTED, pos=pos, cigar=cigar, mm=0)

    # two supporting splice reads (junction within +/-3) + one orphan
    aligned = [
        (rec("s1"), res(100, "30M200N30M")),     # junction (130, 330)
        (rec("s2"), res(102, "28M201N32M")),     # junction (130, 331) ok
        (rec("s3"), res(500, "30M300N30M")),     # orphan
        (rec("m"), res(900, "60M")),             # plain M untouched
    ]
    n = remove_orphan_junctions(aligned, "splice")
    assert n == 1
    assert aligned[0][1].nar == NAR_ACCEPTED
    assert aligned[1][1].nar == NAR_ACCEPTED
    assert aligned[2][1].nar == NAR_ORPHAN_SPLICE
    assert aligned[3][1].nar == NAR_ACCEPTED

    # single indel read in the whole set is an orphan by definition
    aligned2 = [(rec("i1"), res(50, "20M2D40M"))]
    assert remove_orphan_junctions(aligned2, "indel") == 1
    assert aligned2[0][1].nar == NAR_ORPHAN_INDEL


def test_report_side_files(tmp_path):
    """-j/-J fasta side files with the reference descriptor layout
    (KAligner.cpp:3833/:3931)."""
    from kit4b_tpu.align.kalign import (NAR_ACCEPTED, NAR_MULTI, NAR_NOHIT,
                                        NAR_NS, AlignResult)
    from kit4b_tpu.align.phases import (report_multi_align,
                                        report_none_aligned)
    from kit4b_tpu.io.fasta import SeqRecord
    import numpy as np
    rng = np.random.default_rng(0)
    aligned = [
        (SeqRecord("a", "d1", rng.integers(0, 4, 150).astype(np.uint8)),
         AlignResult(NAR_NOHIT)),
        (SeqRecord("b", "", rng.integers(0, 4, 80).astype(np.uint8)),
         AlignResult(NAR_ACCEPTED, pos=5)),
        (SeqRecord("c", "", rng.integers(0, 4, 80).astype(np.uint8)),
         AlignResult(NAR_MULTI)),
        (SeqRecord("d", "", rng.integers(0, 4, 80).astype(np.uint8)),
         AlignResult(NAR_NS)),
    ]
    pna = tmp_path / "na.fa"
    assert report_none_aligned(pna, aligned) == 2
    txt = pna.read_text().splitlines()
    assert txt[0] == ">lcl|na|1 a d1 1|1|150"
    assert len(txt[1]) == 70      # 70-col wrap
    assert any(l.startswith(">lcl|na|4 d") for l in txt)
    pml = tmp_path / "ml.fa"
    assert report_multi_align(pml, aligned) == 1
    assert pml.read_text().startswith(">lcl|ml|3 c 3|1|80")


def test_contaminant_stats():
    """Contaminant overlay counting: 3' prefix overlays, 5' suffix
    overlays, sub budget per 25bp with exact first 15bp
    (ReadStats.cpp:2432, Contaminants.h:226)."""
    import numpy as np
    from kit4b_tpu import dna
    from kit4b_tpu.align.readstats import contaminant_hits
    ad = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    adc = dna.encode(ad)
    rng = np.random.default_rng(1)
    L = 60
    reads = rng.integers(0, 4, (6, L)).astype(np.uint8)
    # r0: clean 20bp 3' overlay
    reads[0, L - 20:] = adc[:20]
    # r1: 20bp 3' overlay with 1 sub outside the first 15bp -> accepted
    reads[1, L - 20:] = adc[:20]
    reads[1, L - 3] = (reads[1, L - 3] + 1) % 4    # overlap position 17
    # r2: 20bp 3' overlay with a sub INSIDE the first 15bp -> rejected
    reads[2, L - 20:] = adc[:20]
    reads[2, L - 10] = (reads[2, L - 10] + 1) % 4  # position 10 < 15
    # r3: 16bp 5' overlay of the adapter suffix
    reads[3, :16] = adc[-16:]
    # r4/r5: untouched random
    res = contaminant_hits(reads, {"TruSeq": ad})["TruSeq"]
    assert res["hits3"] == 2
    assert res["hits5"] == 1
