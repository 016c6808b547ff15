"""Config #4 (BASELINE.md): human-chr21-scale kalign PE 2x150 + SNP->VCF.

Synthesizes a chr21-like 40 Mbp genome (no egress in this environment, so
the repeat/N structure is simulated: an Alu-like 300 bp family at ~20%
genome share with 10% divergence, tandem repeats, telomere/centromere N
runs), plants SNPs, simulates PE 2x150 reads from the SNP'd genome, and
runs index -> kalign PE -> SNP call -> VCF, reporting reads/s/chip, pair
accuracy vs truth, SNP sensitivity/precision, and escalation statistics
(the repeat stress the round-1 silent-truncation bug hid).

Usage: python tools/config4_chr21.py [--mbp 40] [--pairs 200000] [--ref]
  --ref also runs .refbin/ngskit4b on a 20K-pair subsample for wall-clock
  + agreement.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chr21_like(mbp: float, seed: int = 21):
    """Repeat-dense synthetic chromosome (chr21 proxy)."""
    from kit4b_tpu import dna
    n = int(mbp * 1e6)
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, n).astype(np.uint8)
    # Alu-like family: 300bp consensus, ~20% of the genome, 10% divergence
    alu = rng.integers(0, 4, 300).astype(np.uint8)
    n_copies = int(n * 0.20 / 300)
    pos = rng.integers(0, n - 400, n_copies)
    for p in pos:
        copy = alu.copy()
        nmut = rng.binomial(300, 0.10)
        at = rng.integers(0, 300, nmut)
        copy[at] = (copy[at] + rng.integers(1, 4, nmut)) % 4
        seq[p:p + 300] = copy
    # tandem satellite near the "centromere"
    unit = rng.integers(0, 4, 171).astype(np.uint8)  # alpha-satellite-like
    c0 = n // 2
    for i in range(2000):
        p = c0 + i * 171
        if p + 171 > n:
            break
        seq[p:p + 171] = unit
    # N runs: telomeres + centromere gap
    seq[: n // 200] = dna.BASE_N
    seq[-n // 200:] = dna.BASE_N
    seq[c0 - 50_000: c0 - 20_000] = dna.BASE_N
    return np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=40.0)
    ap.add_argument("--pairs", type=int, default=200_000)
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--workdir", default="/tmp/config4")
    args = ap.parse_args()

    from kit4b_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax

    from kit4b_tpu.align import kalign, pe, snp
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import Genome
    from kit4b_tpu.sim import simreads

    os.makedirs(args.workdir, exist_ok=True)
    log(f"devices: {jax.devices()}")

    t0 = time.time()
    seq, n = make_chr21_like(args.mbp)
    g = Genome(["chr21s"], np.array([0]), np.array([n]), seq)
    log(f"genome: {n/1e6:.0f} Mbp incl. repeats/Ns ({time.time()-t0:.0f}s)")

    t0 = time.time()
    idx = SfxIndex.build(g)
    log(f"index: lut_k={idx.lut_k}, clean={len(idx.sa_clean)} "
        f"({time.time()-t0:.0f}s)")

    # SNP-planted genome is what reads are simulated FROM (the reference's
    # simreads -N snprate flow); alignment targets the unmutated index
    mut, snp_truth = simreads.simulate_snps(g, rate=0.001, seed=5)
    log(f"planted SNPs: {len(snp_truth)}")

    t0 = time.time()
    r1, r2 = simreads.sim_reads(mut, simreads.SimParams(
        n_reads=args.pairs, read_len=150, pe=True, pe_insert_min=250,
        pe_insert_max=600, error_mode="illumina", subs_rate=0.01, seed=9))
    log(f"simreads: {len(r1)} pairs 2x150 ({time.time()-t0:.0f}s)")

    al = kalign.KAligner(idx, batch_size=16384)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=700, pe_mode=1)
    caller = snp.SnpCaller(g, snp.SnpOptions(min_snp_reads=5, qvalue=0.05))

    # warmup compile on one batch
    t0 = time.time()
    al.align_batch_raw(np.stack([r.codes for r in r1[:16384]]))
    log(f"warmup/compile: {time.time()-t0:.0f}s")

    t0 = time.time()
    sam_path = os.path.join(args.workdir, "out.sam")
    codes1 = np.stack([r.codes for r in r1])
    codes2 = np.stack([r.codes for r in r2])
    stats = pal.write_sam_fast(
        sam_path,
        pal.align_pairs_arrays(codes1, codes2,
                               names1=[r.name for r in r1],
                               names2=[r.name for r in r2]),
        snp_caller=caller)
    dt = time.time() - t0
    n_reads = 2 * len(r1)
    log(f"PE align+SAM: {dt:.1f}s = {n_reads/dt:.0f} reads/s "
        f"({stats})")

    t0 = time.time()
    calls = caller.call()
    snp.write_snps_vcf(os.path.join(args.workdir, "out.vcf"), calls)
    log(f"SNP call: {len(calls)} calls ({time.time()-t0:.0f}s)")

    # --- truth scoring -----------------------------------------------------
    t0 = time.time()
    n_acc = n_true = 0
    import re
    for line in open(sam_path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x4:
            continue
        tr = simreads.parse_truth(f[0])
        if tr is None:
            continue
        n_acc += 1
        if int(f[3]) - 1 == tr["start"]:
            n_true += 1
    log(f"accepted reads: {n_acc}/{n_reads} ({100*n_acc/n_reads:.1f}%), "
        f"at true locus {100*n_true/max(n_acc,1):.2f}%")

    truth_set = {(c, p) for c, p, _, _ in snp_truth}
    called = {(c.chrom, c.loci) for c in calls}
    tp = len(called & truth_set)
    log(f"SNPs: called {len(called)}, truth {len(truth_set)}, "
        f"TP {tp}, sensitivity {100*tp/max(len(truth_set),1):.1f}%, "
        f"precision {100*tp/max(len(called),1):.1f}%")

    print(f"RESULT reads_per_sec={n_reads/dt:.0f} acc={n_acc/n_reads:.4f} "
          f"true={n_true/max(n_acc,1):.4f} "
          f"snp_sens={tp/max(len(truth_set),1):.4f} "
          f"snp_prec={tp/max(len(called),1):.4f}")

    if args.ref:
        run_reference(args, g, mut, snp_truth)


def run_reference(args, g, mut, snp_truth):
    """Reference wall-clock + SNP call-set parity (2-core host).

    The parity readset is DEDICATED: 100K pairs restricted to a 2 Mbp
    slice of the (SNP-mutated) genome, giving ~15x coverage so the
    -p5 minimum-read threshold is actually exercised — the full-genome
    subsample at 60K pairs is ~0.45x and calls almost nothing on either
    side."""
    import subprocess
    refbin = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".refbin", "ngskit4b")
    if not os.path.exists(refbin):
        log("no .refbin/ngskit4b; skipping reference run")
        return
    from kit4b_tpu.sim.simreads import write_reads
    d = args.workdir
    fa = os.path.join(d, "genome.fa")
    with open(fa, "w") as f:
        f.write(">chr21s\n")
        s = "".join("ACGTN"[min(b, 4)] for b in g.seq[:-1])
        for i in range(0, len(s), 70):
            f.write(s[i:i + 70] + "\n")
    from kit4b_tpu.sim import simreads as _sr
    sub = 100_000
    r1, r2 = _sr.sim_reads(mut, _sr.SimParams(
        n_reads=sub, read_len=150, pe=True, pe_insert_min=250,
        pe_insert_max=600, error_mode="illumina", subs_rate=0.01,
        seed=31, regions=[("chr21s", 2_000_000, 4_000_000)]))
    write_reads(os.path.join(d, "ref_r1.fa"), r1, "fasta")
    write_reads(os.path.join(d, "ref_r2.fa"), r2, "fasta")
    t0 = time.time()
    subprocess.run([refbin, "index", "-i", fa,
                    "-o", os.path.join(d, "g.sfx"), "-r", "c4", "-T2"],
                   check=True, capture_output=True)
    t_index = time.time() - t0
    t0 = time.time()
    subprocess.run([refbin, "kalign", "-i", os.path.join(d, "ref_r1.fa"),
                    "-u", os.path.join(d, "ref_r2.fa"), "-U1",
                    "-d200", "-D700", "-p5",
                    "-S", os.path.join(d, "ref.snp.csv"),
                    "-I", os.path.join(d, "g.sfx"),
                    "-o", os.path.join(d, "ref.sam"), "-M0", "-T2"],
                   check=True, capture_output=True)
    t_align = time.time() - t0
    log(f"reference: index {t_index:.0f}s, kalign {sub*2} reads "
        f"{t_align:.1f}s = {sub*2/t_align:.0f} reads/s (2-core)")

    # --- SNP CALL-SET parity at scale (VERDICT r4 item 4): our aligner
    # + binomial/BH caller on the SAME 20K-pair subsample vs the
    # reference's OutputSNPs CSV (KAligner.cpp:7098/:7567/:7617),
    # default thresholds both sides (-p5, QValue 0.05, nonref 25%)
    from kit4b_tpu.align import kalign as _ka, pe as _pe, snp as _snp
    from kit4b_tpu.index.sfx_index import SfxIndex as _SI
    idx = _SI.build(g)
    al = _ka.KAligner(idx, batch_size=16384)
    pal = _pe.PeAligner(al, pair_min_len=200, pair_max_len=700, pe_mode=1)
    caller = _snp.SnpCaller(g, _snp.SnpOptions(min_snp_reads=5,
                                               qvalue=0.05))
    pal.write_sam_fast(os.path.join(d, "ours_sub.sam"),
                       pal.align_pairs(r1, r2),
                       snp_caller=caller)
    ours = caller.call()
    our_set = {(c.chrom, c.loci) for c in ours}
    ref_set = {}
    import csv as _csv
    with open(os.path.join(d, "ref.snp.csv")) as f:
        for row in _csv.reader(f):
            if not row or row[0] == "SNP_ID":
                continue
            ref_set[(row[3].strip('"'), int(row[4]))] = float(row[9])
    both = our_set & set(ref_set)
    only_ours = our_set - set(ref_set)
    only_ref = set(ref_set) - our_set
    log(f"SNP call-set parity (20K-pair subsample, default thresholds): "
        f"ours {len(our_set)}, reference {len(ref_set)}, agree {len(both)}"
        f" ({100*len(both)/max(len(our_set | set(ref_set)),1):.1f}% of "
        f"union), only-ours {len(only_ours)}, only-ref {len(only_ref)}")
    truth2 = {(c, p) for c, p, _, _ in snp_truth
              if 2_000_000 <= p < 4_000_000}
    log(f"  vs planted truth in the 2 Mbp slice ({len(truth2)}): "
        f"ours TP {len(our_set & truth2)}, ref TP "
        f"{len(set(ref_set) & truth2)}")
    print(f"SNPPARITY ours={len(our_set)} ref={len(ref_set)} "
          f"agree={len(both)} only_ours={len(only_ours)} "
          f"only_ref={len(only_ref)} "
          f"ours_tp={len(our_set & truth2)} "
          f"ref_tp={len(set(ref_set) & truth2)} truth={len(truth2)}")


if __name__ == "__main__":
    main()
