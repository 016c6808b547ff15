"""Config #3 (BASELINE.md): wheat-style filter -> pseudogenome ->
index -> kmarkers, scaled to a subsample.

Synthesizes N cultivars sharing a common backbone with cultivar-private
divergent segments (the situation kmarkers exists for), simulates skim
reads per cultivar, then runs the repo pipeline end-to-end with
wall-clocks: filter (dedup), pseudogenome assembly per cultivar
(here: reads are already genomic segments, so the cultivar fastas feed
pseudogenome directly, as the reference flow concatenates filtered
reads/contigs), SfxIndex build, and kmarkers for the target cultivar.
Optionally runs the reference binary's index + kmarkers for wall-clock.

Usage: python tools/config3_wheat.py [--mbp-per-cult 10] [--ref]
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
    ap.add_argument("--mbp-per-cult", type=float, default=10.0)
    ap.add_argument("--cults", type=int, default=3)
    ap.add_argument("--kmer", type=int, default=50)
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--workdir", default="/tmp/config3")
    args = ap.parse_args()

    from kit4b_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import SeqRecord, write_fasta
    from kit4b_tpu.kmer import kmarkers

    os.makedirs(args.workdir, exist_ok=True)
    n = int(args.mbp_per_cult * 1e6)
    rng = np.random.default_rng(33)
    backbone = rng.integers(0, 4, n).astype(np.uint8)
    cult_fastas = {}
    t0 = time.time()
    for c in range(args.cults):
        seq = backbone.copy()
        # cultivar-private divergence: 0.2% SNPs + private 2kb insblocks
        snps = rng.integers(0, n, n // 500)
        seq[snps] = (seq[snps] + rng.integers(1, 4, len(snps))) % 4
        priv = rng.integers(0, 4, 50_000).astype(np.uint8)
        at = rng.integers(0, n - 50_000)
        seq[at:at + 50_000] = priv
        path = os.path.join(args.workdir, f"cult{c}.fa")
        write_fasta(path, [SeqRecord(f"cult{c}_chr1", "", seq)])
        cult_fastas[f"cult{c}"] = [path]
    log(f"cultivars: {args.cults} x {n/1e6:.0f} Mbp "
        f"({time.time()-t0:.0f}s)")

    t0 = time.time()
    g, cc, names = kmarkers.build_pseudogenome(cult_fastas)
    t_pseudo = time.time() - t0
    log(f"pseudogenome: {g.total_len/1e6:.0f} Mbp, {len(g.names)} "
        f"chroms ({t_pseudo:.0f}s)")

    t0 = time.time()
    # bucket counting-sort index: kmarkers only resolves key
    # buckets + extension, never lexicographic in-bucket order
    idx = SfxIndex.build_buckets(g)
    t_index = time.time() - t0
    log(f"index: lut_k={idx.lut_k} ({t_index:.0f}s)")

    t0 = time.time()
    markers = kmarkers.find_cultivar_markers(
        idx, cc, names.index("cult0"), kmer_len=args.kmer,
        min_hamming=2, extend=True)
    t_mark = time.time() - t0
    total_bp = sum(m.length for m in markers)
    log(f"kmarkers: {len(markers)} markers, {total_bp} bp "
        f"({t_mark:.1f}s)")

    print(f"RESULT pseudo_s={t_pseudo:.1f} index_s={t_index:.1f} "
          f"kmarkers_s={t_mark:.1f} n_markers={len(markers)} "
          f"marker_bp={total_bp} genome_mbp={g.total_len/1e6:.0f}")

    if args.ref:
        refbin = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".refbin", "ngskit4b")
        if not os.path.exists(refbin):
            log("no .refbin/ngskit4b; skipping reference run")
            return
        d = args.workdir
        # Reference flow: its kmarkers block reader (LocKMers.cpp:464)
        # requires EOS-separated segments < 524,286 bases inside each
        # cultivar pseudo-chrom, i.e. pseudo-chroms built by its own
        # `pseudogenome` from segmented multifasta — a monolithic
        # chromosome yields "K-Mers processed: 0". So: segment each
        # cultivar into 250 kb records -> reference pseudogenome ->
        # concat -> index -> kmarkers -C <pseudo-chrom name>.
        t0 = time.time()
        allfa = os.path.join(d, "all_ref.fa")
        with open(allfa, "w") as out:
            for c, paths in cult_fastas.items():
                segfa = os.path.join(d, f"{c}_segs.fa")
                with open(segfa, "w") as sf:
                    i = 0
                    for p in paths:
                        s = "".join(ln.strip() for ln in open(p)
                                    if not ln.startswith(">"))
                        for o in range(0, len(s), 250_000):
                            sf.write(f">{c}_s{i:04d}\n")
                            for j in range(o, min(o + 250_000,
                                                  len(s)), 70):
                                sf.write(s[j:j + 70] + "\n")
                            i += 1
                pfa = os.path.join(d, f"{c}_pseudo.fa")
                subprocess.run([refbin, "pseudogenome", "-i", segfa,
                                "-o", pfa,
                                "-O", os.path.join(d, f"{c}.bed"),
                                "-t", c], capture_output=True)
                out.write(open(pfa).read())
        t_rp = time.time() - t0
        t0 = time.time()
        r = subprocess.run([refbin, "index", "-i", allfa,
                            "-o", os.path.join(d, "all.sfx"),
                            "-r", "c3", "-T2"],
                           capture_output=True)
        t_ri = time.time() - t0
        t0 = time.time()
        r = subprocess.run([refbin, "kmarkers", "-m", "0",
                            "-i", os.path.join(d, "all.sfx"),
                            "-c", "cult0", "-C", "cult0",
                            "-k", str(args.kmer),
                            "-o", os.path.join(d, "ref_markers.fa"),
                            "-T2"], capture_output=True)
        t_rk = time.time() - t0
        n_ref = 0
        mpath = os.path.join(d, "ref_markers.fa")
        if os.path.exists(mpath):
            n_ref = sum(1 for ln in open(mpath) if ln.startswith(">"))
        log(f"reference: index {t_ri:.1f}s, kmarkers {t_rk:.1f}s, "
            f"{n_ref} markers (2-core); stderr tail: "
            f"{r.stderr.decode()[-200:] if r.stderr else ''}")
        print(f"REFRESULT pseudo_s={t_rp:.1f} index_s={t_ri:.1f} "
              f"kmarkers_s={t_rk:.1f} n_markers={n_ref}")


if __name__ == "__main__":
    main()
