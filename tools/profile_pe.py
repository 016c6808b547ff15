"""Phase-level profile of the config-4 PE driver round (real chip).

Wraps PeAligner's resolution phases with wall-clock accumulators to show
where a driver round goes: tier-1+2 submit/collect, overflow rescue,
deep residue, PAIR_NONE orphan rescue, host finalize. Evidence for the
round-5 rescue-before-deep redesign (VERDICT r4 item 2).

Usage: python tools/profile_pe.py [n_rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from kit4b_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax

    from bench_pe import BATCH, _build_workload
    from kit4b_tpu.align import kalign, pe
    from kit4b_tpu.io.fasta import SeqRecord

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"devices: {jax.devices()}", file=sys.stderr)
    g, idx, codes1, codes2, names1 = _build_workload()
    recs1 = [SeqRecord(names1[i], "", codes1[i]) for i in range(len(codes1))]
    recs2 = [SeqRecord(f"m2_{i}", "", codes2[i]) for i in range(len(codes2))]
    al = kalign.KAligner(idx, batch_size=BATCH)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=700, pe_mode=1)

    acc = {}

    def timed(name, fn):
        def wrapper(*a, **kw):
            t0 = time.time()
            r = fn(*a, **kw)
            acc[name] = acc.get(name, 0.0) + (time.time() - t0)
            return r
        return wrapper

    pal._rescue_overflow = timed("rescue_overflow", pal._rescue_overflow)
    pal._deep_escalate = timed("deep_escalate", pal._deep_escalate)
    pal._batch_rescue = timed("batch_rescue", pal._batch_rescue)

    counts = {}
    orig_ro = pal._rescue_overflow
    def counting_ro(out, ovf, *a, **kw):
        counts["overflow_rows"] = counts.get("overflow_rows", 0) + len(ovf)
        r = orig_ro(out, ovf, *a, **kw)
        counts["rescued_rows"] = counts.get("rescued_rows", 0) + len(r)
        left = int((out[ovf, 5] == pe.PAIR_OVERFLOW).sum())
        counts["deep_rows"] = counts.get("deep_rows", 0) + left
        return r
    pal._rescue_overflow = counting_ro

    def one_round():
        n_acc = 0
        for _, _, pp in pal.align_pairs(recs1, recs2):
            if pp.nar == pe.NAR_PE_ACCEPTED:
                n_acc += 1
        return n_acc

    t0 = time.time()
    n_acc = one_round()
    print(f"warmup: {time.time()-t0:.1f}s accepted {n_acc}/{len(recs1)}",
          file=sys.stderr)
    acc.clear(); counts.clear()

    times = []
    for r in range(n_rounds):
        t0 = time.time()
        n_acc = one_round()
        dt = time.time() - t0
        times.append(dt)
        print(f"round {r}: {dt*1000:.0f} ms  "
              f"{2*len(recs1)/dt:.0f} reads/s  accepted {n_acc}",
              file=sys.stderr)
    tot = sum(times)
    print(f"\nphase split over {n_rounds} rounds "
          f"(total {tot:.2f}s):", file=sys.stderr)
    other = tot - sum(acc.values())
    for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v:7.2f}s  ({100*v/tot:5.1f}%)", file=sys.stderr)
    print(f"  {'tier12+host':18s} {other:7.2f}s  ({100*other/tot:5.1f}%)",
          file=sys.stderr)
    for k, v in counts.items():
        print(f"  {k:18s} {v/n_rounds:8.0f} rows/round", file=sys.stderr)

    # truth spot check on the new path
    from kit4b_tpu.sim import simreads
    n_true = n_chk = n_racc = 0
    for rec1, _, pp in pal.align_pairs(recs1[:BATCH], recs2[:BATCH]):
        if pp.nar != pe.NAR_PE_ACCEPTED:
            continue
        n_racc += 1
        t = simreads.parse_truth(rec1.name)
        if t is not None:
            n_chk += 1
            if pp.r1.pos == t["start"]:
                n_true += 1
    print(f"true-locus (mate1, first batch): {n_true}/{n_chk} = "
          f"{100*n_true/max(n_chk,1):.2f}% (accepted {n_racc})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
