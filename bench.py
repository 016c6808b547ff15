"""Benchmark driver: kalign seed-and-extend throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config #1 of BASELINE.md: E. coli-scale genome (4.6 Mbp), 100K x 100 bp SE
simulated reads with Illumina-skewed errors -> aligned (unique-accept) on the
default sensitivity schedule.

Measurement protocol (round 3): the full readset is aligned N_ROUNDS >= 10
times; each round's wall-clock (h2d + device pass + d2h + escalation) is
logged to stderr and the MEDIAN round throughput is reported. The axon
tunnel's per-call dispatch and fetch latencies vary run to run (observed
0.23s..0.62s for identical work in rounds 1-2), so single-shot timings are
not reproducible; the median over 10 rounds is.

vs_baseline: ratio vs the reference ngskit4b binary's 64-core linear
extrapolation from the 2-vCPU measurement on this host (BASELINE.md).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Reference ngskit4b kalign measured on THIS host (2 vCPUs, -T2): 100K reads
# in 9.43s end-to-end = 10,600 reads/s (see BASELINE.md "Measured" section).
# The driver's stated target is a 64-core host; absent one, we extrapolate
# linearly (2-core measured x 32), which overstates the reference (its rwlock
# block dispatch and shared-index memory traffic do not scale linearly), so
# vs_baseline below is a LOWER bound on the true ratio.
BASELINE_CPU_READS_PER_SEC = 10_600 * 32

GENOME_LEN = 4_600_000
N_READS = 100_000
READ_LEN = 100
BATCH = 98304
N_ROUNDS = 12


def main():
    from kit4b_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    from kit4b_tpu import dna
    from kit4b_tpu.align import kalign
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import Genome
    from kit4b_tpu.sim import simreads

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(12345)
    seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["ecoli_sim"], np.array([0]), np.array([GENOME_LEN]), seq)

    t0 = time.time()
    idx = SfxIndex.build(g)
    log(f"index build: {time.time()-t0:.1f}s (lut_k={idx.lut_k}, "
        f"clean={len(idx.sa_clean)})")

    recs = simreads.sim_reads(
        g, simreads.SimParams(n_reads=N_READS, read_len=READ_LEN, seed=7,
                              error_mode="illumina", subs_rate=0.02))
    reads = np.stack([r.codes for r in recs])
    log(f"simreads: {len(recs)} reads")

    al = kalign.KAligner(idx, batch_size=BATCH)
    starts = list(range(0, len(reads) - BATCH + 1, BATCH))
    n_done = len(starts) * BATCH

    def one_round():
        """Align the full readset: async-submit all batches, collect in
        order so host work on batch k overlaps device compute of k+1."""
        devs = [al._submit(reads[s:s + BATCH]) for s in starts]
        out, n_acc = [], 0
        for s, d in zip(starts, devs):
            raw = al._collect_compact(d, reads[s:s + BATCH])
            n_acc += int((raw["nar"] == 0).sum())
            out.append(raw)
        return out, n_acc

    # warmup: compiles every pass shape incl. escalation tiers (the first
    # full round exercises overflow escalation exactly as the timed ones do)
    t0 = time.time()
    raws, n_acc = one_round()
    log(f"warmup (compile + first full round): {time.time()-t0:.1f}s")

    times = []
    for r in range(N_ROUNDS):
        t0 = time.time()
        raws, n_acc = one_round()
        dt = time.time() - t0
        times.append(dt)
        log(f"round {r:2d}: {dt*1000:7.1f} ms  "
            f"{n_done/dt:9.0f} reads/s  accepted {n_acc}")
    med = statistics.median(times)
    rps = n_done / med
    log(f"median of {N_ROUNDS} rounds: {med*1000:.1f} ms = {rps:.0f} reads/s"
        f"  (min {min(times)*1000:.1f}, max {max(times)*1000:.1f})")

    # cost split (the roadmap evidence): time the pure h2d of one batch's
    # 2-bit reads and the compute with device-resident reads. The tunnel
    # serialises transfers and compute (tools/profile_pipeline.py and the
    # round-4 tools/profile_overlap.py experiment measure the overlap
    # attained), so round ~= h2d + compute; on production TPU hosts
    # (PCIe DMA, not a ~20 MB/s tunnel) the round collapses to compute.
    import jax
    import jax.numpy as jnp
    b0 = reads[:BATCH]
    reads2b, nlist, _ = kalign.pack_reads_2bit(b0)
    def h2d():
        a = jnp.asarray(reads2b); b = jnp.asarray(nlist)
        jax.device_get(a[0, :1]); jax.device_get(b[0, :1])
    r2b_d = jnp.asarray(reads2b); nl_d = jnp.asarray(nlist)
    jax.device_get(r2b_d[0, :1])
    from kit4b_tpu.ops import seed_extend_v4, seed_extend_v5
    gview, sa, lut, lut2 = al._device_for(READ_LEN)
    _, mtm = al.schedule_for(READ_LEN)
    offs = al._offsets_for(READ_LEN, mtm)
    lut4 = al._lut4_for(READ_LEN, sa)   # production: v5 on clean indexes
    log(f"tier-1 kernel: {'v5 (flattened lut4)' if lut4 is not None else 'v4'}")
    def compute():
        if lut4 is not None:
            out = seed_extend_v5.fast_pass_packed_v5(
                gview, sa, lut2, lut4, r2b_d, nl_d, read_len=READ_LEN,
                genome_len=len(seq), offsets=offs, lut_k=idx.lut_k,
                n_compact=al.n_compact, n_extend=al.n_extend,
                max_tot_mm=mtm, mm_delta=al.mm_delta, tier2=(512, 192, 96))
        else:
            out = seed_extend_v4.fast_pass_packed_v4(
                gview, sa, lut2, r2b_d, nl_d, read_len=READ_LEN,
                genome_len=len(seq), offsets=offs, lut_k=idx.lut_k,
                n_compact=al.n_compact, n_extend=al.n_extend,
                max_tot_mm=mtm, mm_delta=al.mm_delta)
        jax.device_get(out)
    compute()  # warm (compiled already by the rounds)
    for name, fn in (("h2d 2-bit reads", h2d), ("compute-only", compute)):
        ts = []
        for _ in range(6):
            t0 = time.time(); fn(); ts.append(time.time() - t0)
        t = statistics.median(ts)
        log(f"cost split - {name}: {t*1000:7.1f} ms"
            + (f"  ({BATCH/t:,.0f} reads/s/chip compute ceiling)"
               if name == "compute-only" else ""))

    # correctness spot check vs ground truth (outside the timed region)
    nar = np.concatenate([r["nar"] for r in raws])
    pos = np.concatenate([r["pos"] for r in raws])
    strand = np.concatenate([r["strand"] for r in raws])
    acc = np.nonzero(nar == 0)[0]
    ci, off = g.locate(pos[acc])
    n_ok = 0
    for j, i in enumerate(acc):
        t = simreads.parse_truth(recs[i].name)
        if (g.names[int(ci[j])] == t["chrom"] and int(off[j]) == t["start"]
                and ("-" if strand[i] else "+") == t["strand"]):
            n_ok += 1
    log(f"accepted {n_acc} ({100*n_acc/n_done:.1f}%), "
        f"truth-correct {100*n_ok/max(n_acc,1):.2f}% of accepted")

    vs = 0.0
    if BASELINE_CPU_READS_PER_SEC:
        vs = rps / BASELINE_CPU_READS_PER_SEC
    print(json.dumps({
        "metric": "kalign_reads_aligned_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
