"""Config #5 (BASELINE.md): bacterial PE filter -> assemb -> pescaffold.

Synthesizes a bacterial-scale genome, simulates PE 2x150 reads at the
requested coverage (with duplicates + errors so `filter` has work to
do), runs the repo pipeline end-to-end measuring wall-clock per phase,
scores contigs against the source genome (coverage, largest-contig
identity), and optionally runs the reference binary's
filter -> assemb on the same reads for wall-clock comparison.

Usage: python tools/config5_bacterial.py [--kbp 2000] [--cov 30] [--ref]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kbp", type=float, default=2000.0)
    ap.add_argument("--cov", type=float, default=30.0)
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--workdir", default="/tmp/config5")
    args = ap.parse_args()

    from kit4b_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    from kit4b_tpu.assembly import assemble as asm
    from kit4b_tpu.assembly import filter as filt
    from kit4b_tpu.assembly.store import SeqStore
    from kit4b_tpu.io.fasta import Genome, SeqRecord, write_fasta
    from kit4b_tpu.sim import simreads

    os.makedirs(args.workdir, exist_ok=True)
    n = int(args.kbp * 1000)
    rng = np.random.default_rng(55)
    seq = rng.integers(0, 4, n).astype(np.uint8)
    g = Genome.from_records([SeqRecord("bact1", "", seq)])
    log(f"genome: {n/1e6:.2f} Mbp")

    pairs = int(n * args.cov / 300)
    t0 = time.time()
    r1, r2 = simreads.sim_reads(g, simreads.SimParams(
        n_reads=pairs, read_len=150, pe=True, pe_insert_min=250,
        pe_insert_max=500, error_mode="illumina", subs_rate=0.005,
        seed=5))
    # duplicate 10% of pairs so dedup has work
    dup = rng.choice(pairs, pairs // 10)
    r1 = r1 + [r1[i] for i in dup]
    r2 = r2 + [r2[i] for i in dup]
    simreads.write_reads(os.path.join(args.workdir, "r1.fa"), r1, "fasta")
    simreads.write_reads(os.path.join(args.workdir, "r2.fa"), r2, "fasta")
    log(f"simreads: {len(r1)} pairs incl. dups ({time.time()-t0:.0f}s)")

    # ---- filter + assemb (fused: one corpus index + one full probe
    # serves the overlap-support filter AND assembly pass 1) ----------
    t0 = time.time()
    st = SeqStore.from_records(r1, r2)
    before = st.n_live()
    tm = {}
    contigs = filt.filter_assemble(
        st, filt.FilterParams(),
        asm.AssembleParams(min_overlap=60, min_overlap_final=40),
        timings=tm)
    t_filter = tm.get("filter_s", 0.0)
    t_assemb = tm.get("assemb_s", 0.0)
    log(f"filter: {before} reads, {tm.get('n_unsupported', 0)} unsupported"
        f" removed ({t_filter:.1f}s)")
    lens = sorted((int(contigs.lengths[i]) for i in range(len(contigs))),
                  reverse=True)
    total = sum(lens)
    half = total / 2
    acc = 0
    n50 = 0
    for ln in lens:
        acc += ln
        if acc >= half:
            n50 = ln
            break
    n_big = sum(1 for ln in lens if ln >= 300)
    log(f"assemb: {len(lens)} live seqs ({n_big} contigs >= 300 bp), "
        f"longest {lens[0]}, N50 {n50}, total {total} ({t_assemb:.1f}s)")

    # contig accuracy: exact containment of the largest contigs
    gseq = "".join("ACGT"[b] for b in seq)
    grc = "".join("TGCA"["ACGT".index(c)] for c in reversed(gseq))
    n_exact = 0
    checked = 0
    order = np.argsort([-int(contigs.lengths[i])
                        for i in range(len(contigs))])
    for i in order[:20]:
        arr = contigs.get(int(i))
        s = "".join("ACGT"[b] if b < 4 else "N" for b in np.asarray(arr))
        checked += 1
        if s in gseq or s in grc:
            n_exact += 1
    log(f"contig exactness: {n_exact}/{checked} top contigs are exact "
        f"substrings")

    # ---- pescaffold --------------------------------------------------
    from kit4b_tpu.assembly.scaffold import scaffold_contigs
    cfa = os.path.join(args.workdir, "contigs.fa")
    write_fasta(cfa, [SeqRecord(f"contig{int(i):06d}", "",
                                np.asarray(contigs.get(int(i))))
                      for i in order[:2000]])
    t0 = time.time()
    paths_s, scaf_recs = scaffold_contigs(
        cfa, os.path.join(args.workdir, "r1.fa"),
        os.path.join(args.workdir, "r2.fa"),
        os.path.join(args.workdir, "scaffolds.fa"), min_contig=100)
    t_scaf = time.time() - t0
    slens = sorted((len(r.codes) for r in scaf_recs), reverse=True)
    log(f"pescaffold: {len(scaf_recs)} scaffolds, longest "
        f"{slens[0] if slens else 0} ({t_scaf:.1f}s)")

    reads_total = 2 * len(r1)
    print(f"RESULT filter_s={t_filter:.1f} assemb_s={t_assemb:.1f} "
          f"scaffold_s={t_scaf:.1f} "
          f"n_contigs={len(lens)} n_contigs300={n_big} longest={lens[0]} n50={n50} "
          f"n_scaffolds={len(scaf_recs)} "
          f"longest_scaffold={slens[0] if slens else 0} "
          f"exact_top={n_exact}/{checked} "
          f"reads={reads_total}")

    if args.ref:
        refbin = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".refbin", "ngskit4b")
        if not os.path.exists(refbin):
            log("no .refbin/ngskit4b; skipping reference run")
            return
        d = args.workdir
        t0 = time.time()
        r1p = subprocess.run(
            [refbin, "filter", "-m", "1",
             "-i", os.path.join(d, "r1.fa"),
             "-I", os.path.join(d, "r2.fa"),
             "-o", os.path.join(d, "ref_filt.rds"), "-T2"],
            check=False, capture_output=True)
        t_rf = time.time() - t0
        t0 = time.time()
        r2p = subprocess.run(
            [refbin, "assemb", "-i", os.path.join(d, "ref_filt.rds"),
             "-o", os.path.join(d, "ref_asm"), "-T2"],
            check=False, capture_output=True)
        t_ra = time.time() - t0
        n_ref_contigs = 0
        longest_ref = 0
        for suffix in (".SE.fasta", ".fasta", ".contigs.fasta"):
            p = os.path.join(d, "ref_asm" + suffix)
            if os.path.exists(p):
                cur = 0
                for ln in open(p):
                    if ln.startswith(">"):
                        n_ref_contigs += 1
                        longest_ref = max(longest_ref, cur)
                        cur = 0
                    else:
                        cur += len(ln.strip())
                longest_ref = max(longest_ref, cur)
        log(f"reference: filter {t_rf:.1f}s rc={r1p.returncode}, "
            f"assemb {t_ra:.1f}s rc={r2p.returncode}, "
            f"{n_ref_contigs} contigs longest {longest_ref} (2-core)")
        if r1p.returncode or r2p.returncode:
            log("ref stderr:", (r1p.stderr or r2p.stderr)[-300:])
        print(f"REFRESULT filter_s={t_rf:.1f} assemb_s={t_ra:.1f} "
              f"n_contigs={n_ref_contigs} longest={longest_ref}")

        # ---- aligned contig-vs-contig identity (VERDICT r4 item 3):
        # blitz OUR >=300 bp contigs against the REFERENCE's contig set
        # and vice versa; report the fraction aligning at >=95% identity
        # over >=80% of their length
        ref_fa = None
        for suffix in (".SE.fasta", ".fasta", ".contigs.fasta"):
            p = os.path.join(d, "ref_asm" + suffix)
            if os.path.exists(p):
                ref_fa = p
                break
        if ref_fa is not None:
            from kit4b_tpu.align.blitz import blitz_align
            from kit4b_tpu.index.sfx_index import SfxIndex
            from kit4b_tpu.io.fasta import read_seqs

            def xcmp(qrecs, tgt_recs, tag, cap=400):
                qrecs = sorted(qrecs, key=lambda r: -len(r.codes))[:cap]
                tg = Genome.from_records(list(tgt_recs))
                tidx = SfxIndex.build(tg)
                n_ok = 0
                for rec in qrecs:
                    hits = blitz_align(tidx, [rec], gapped=True,
                                       max_hits_per_query=4)
                    best_cov = 0.0
                    for h in hits:
                        span = h.q_end - h.q_start
                        ident = h.matches / max(1, h.matches
                                                + h.mismatches)
                        if ident >= 0.95:
                            best_cov = max(best_cov,
                                           span / len(rec.codes))
                    if best_cov >= 0.8:
                        n_ok += 1
                log(f"contig x-identity [{tag}]: {n_ok}/{len(qrecs)} "
                    f"align at >=95% identity over >=80% length")
                return n_ok, len(qrecs)

            ours300 = [SeqRecord(f"c{int(i)}", "",
                                 np.asarray(contigs.get(int(i))))
                       for i in range(len(contigs))
                       if int(contigs.lengths[i]) >= 300]
            refrecs = [r for r in read_seqs(ref_fa)
                       if len(r.codes) >= 300]
            a_ok, a_n = xcmp(ours300, refrecs, "ours->ref")
            b_ok, b_n = xcmp(refrecs, ours300, "ref->ours")
            # both sets vs the TRUTH genome: the directional contig-set
            # comparison penalises whichever set has LONGER contigs (no
            # single shorter partner can cover 80% of a longer contig)
            truth = [SeqRecord("truth", "", seq)]
            c_ok, c_n = xcmp(ours300, truth, "ours->truth")
            d_ok, d_n = xcmp(refrecs, truth, "ref->truth")
            print(f"XIDENT ours_in_ref={a_ok}/{a_n} "
                  f"ref_in_ours={b_ok}/{b_n} "
                  f"ours_in_truth={c_ok}/{c_n} "
                  f"ref_in_truth={d_ok}/{d_n}")


if __name__ == "__main__":
    main()
