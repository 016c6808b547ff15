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
