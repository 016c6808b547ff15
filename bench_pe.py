"""Benchmark driver: kalign PAIRED-END throughput on config #4 (one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config #4 of BASELINE.md: chr21-proxy 40 Mbp genome (20% Alu-like family at
10% divergence, alpha-satellite tandem array, telomere/centromere N runs),
PE 2x150 reads with Illumina-skewed errors + planted SNPs, aligned through
the production packed-native PE pass (ops/pe_packed.py — seed+extend for
both mates, AcceptProvPE pairing, tier-2 and the capped final tier in one
compiled graph) with pemode-1 orphan rescue.

Protocol (same as bench.py): the full pair set is aligned N_ROUNDS times
through the real PeAligner driver (submit-ahead pipeline, host pairing +
rescue included); per-round wall-clock is logged and the MEDIAN reported.
The 40 Mbp genome + index + simulated reads are cached in .bench_cache/
(first run pays the host SA-IS build once).

vs_baseline: ratio vs the reference ngskit4b 64-core linear extrapolation
(2,453 reads/s measured on this 2-vCPU host x 32 — BASELINE.md config #4).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")
BASELINE_PE_READS_PER_SEC = 2_453 * 32
N_PAIRS = 65_536
READ_LEN = 150
BATCH = 16_384
N_ROUNDS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build_workload():
    """Genome + index + simulated PE readset, cached across runs."""
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import Genome
    from kit4b_tpu.sim import simreads
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from config4_chr21 import make_chr21_like

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "config4_pe.npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=True)
        g = Genome(["chr21s"], np.array([0]), np.array([int(z["n"])]),
                   z["seq"])
        idx = SfxIndex(g, int(z["lut_k"]), z["sa_clean"],
                       z["lut"].astype(np.int64))
        return (g, idx, z["codes1"], z["codes2"],
                [str(x) for x in z["names1"]])

    t0 = time.time()
    seq, n = make_chr21_like(40.0)
    g = Genome(["chr21s"], np.array([0]), np.array([n]), seq)
    log(f"genome: {n/1e6:.0f} Mbp ({time.time()-t0:.0f}s)")
    t0 = time.time()
    idx = SfxIndex.build(g)
    log(f"index: lut_k={idx.lut_k}, clean={len(idx.sa_clean)} "
        f"({time.time()-t0:.0f}s)")
    mut, _ = simreads.simulate_snps(g, rate=0.001, seed=5)
    t0 = time.time()
    r1, r2 = simreads.sim_reads(mut, simreads.SimParams(
        n_reads=N_PAIRS, read_len=READ_LEN, pe=True, pe_insert_min=250,
        pe_insert_max=600, error_mode="illumina", subs_rate=0.01, seed=9))
    log(f"simreads: {len(r1)} pairs 2x{READ_LEN} ({time.time()-t0:.0f}s)")
    codes1 = np.stack([r.codes for r in r1])
    codes2 = np.stack([r.codes for r in r2])
    names1 = np.array([r.name for r in r1], dtype=object)
    np.savez(path, n=n, seq=g.seq, lut_k=idx.lut_k,
             sa_clean=idx.sa_clean,
             lut=idx.lut.astype(
                 np.int32 if idx.lut[-1] < 2**31 else np.int64),
             codes1=codes1, codes2=codes2, names1=names1,
             allow_pickle=True)
    return g, idx, codes1, codes2, [r.name for r in r1]


def run_pe_bench(n_rounds: int = N_ROUNDS):
    """Returns (reads_per_sec_median, vs_baseline, details dict)."""
    from kit4b_tpu.align import kalign, pe
    from kit4b_tpu.sim import simreads

    g, idx, codes1, codes2, names1 = _build_workload()
    al = kalign.KAligner(idx, batch_size=BATCH)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=700, pe_mode=1)
    n_reads = 2 * len(codes1)

    def one_round():
        n_acc = 0
        for _, _, pp in pal.align_pairs_arrays(codes1, codes2,
                                               names1=list(names1)):
            if pp.nar == pe.NAR_PE_ACCEPTED:
                n_acc += 1
        return n_acc

    t0 = time.time()
    n_acc = one_round()
    log(f"warmup (compile + first full round): {time.time()-t0:.1f}s, "
        f"accepted {n_acc}/{len(codes1)} pairs")

    times = []
    for r in range(n_rounds):
        t0 = time.time()
        n_acc = one_round()
        dt = time.time() - t0
        times.append(dt)
        log(f"round {r:2d}: {dt*1000:8.1f} ms  {n_reads/dt:9.0f} reads/s  "
            f"accepted {n_acc}")
    med = statistics.median(times)
    rps = n_reads / med
    log(f"median of {n_rounds} rounds: {med*1000:.1f} ms = "
        f"{rps:.0f} reads/s (min {min(times)*1000:.1f}, "
        f"max {max(times)*1000:.1f})")

    # truth spot check (outside the timed region): mate1 loci
    n_true = n_chk = 0
    for rec1, _, pp in pal.align_pairs_arrays(
            codes1[:BATCH], codes2[:BATCH], names1=list(names1)[:BATCH]):
        if pp.nar != pe.NAR_PE_ACCEPTED:
            continue
        t = simreads.parse_truth(rec1.name)
        if t is not None:
            n_chk += 1
            if pp.r1.pos == t["start"]:
                n_true += 1
    log(f"true-locus (mate1, first batch): {n_true}/{n_chk} = "
        f"{100*n_true/max(n_chk,1):.2f}%")
    vs = rps / BASELINE_PE_READS_PER_SEC
    return rps, vs, {"accepted_pairs": n_acc, "n_pairs": len(codes1),
                     "true_pct": round(100*n_true/max(n_chk, 1), 2)}


def main():
    from kit4b_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    log(f"devices: {jax.devices()}")
    rps, vs, details = run_pe_bench()
    print(json.dumps({
        "metric": "kalign_pe_reads_aligned_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
