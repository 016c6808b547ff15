"""Tunnel-overlap experiment (VERDICT r3 item 6): can 2-bit read h2d
transfers hide under device compute on the axon tunnel?

The bench.py defense of the driver SE number rests on "transfers and
compute serialise on this tunnel". This harness measures it directly on
the config-#1 workload (98,304-read batches, production v5 kernel):

  A) serial:      upload -> compute -> fetch, one batch at a time;
  B) depth-2:     upload batch k+1 immediately after DISPATCHING batch
                  k's compute (distinct host buffers), fetch k, repeat;
  C) all-upfront: upload every batch, then dispatch all computes, then
                  fetch (bench.py's async-submit protocol).

If overlap exists, B/C per-batch cost approaches max(h2d, compute)
instead of their sum. The measured result is recorded in BASELINE.md;
whichever protocol wins is what bench.py uses.
"""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kit4b_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax                          # noqa: E402
import jax.numpy as jnp             # noqa: E402
import numpy as np                  # noqa: E402

from kit4b_tpu import dna                       # noqa: E402
from kit4b_tpu.align import kalign              # noqa: E402
from kit4b_tpu.index.sfx_index import SfxIndex  # noqa: E402
from kit4b_tpu.io.fasta import Genome           # noqa: E402
from kit4b_tpu.ops import seed_extend_v5        # noqa: E402
from kit4b_tpu.sim import simreads              # noqa: E402

GL = 4_600_000
B = 98_304
NBATCH = 6
L = 100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(12345)
    seq = np.concatenate([rng.integers(0, 4, GL).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["e"], np.array([0]), np.array([GL]), seq)
    idx = SfxIndex.build(g)
    al = kalign.KAligner(idx, batch_size=B)
    _, mtm = al.schedule_for(L)
    gview, sa, lut, lut2 = al._device_for(L)
    offs = al._offsets_for(L, mtm)
    lut4 = al._lut4_for(L, sa)
    recs = simreads.sim_reads(g, simreads.SimParams(
        n_reads=B, read_len=L, seed=7, error_mode="illumina",
        subs_rate=0.02))
    reads = np.stack([r.codes for r in recs])
    packed = []
    for i in range(NBATCH):     # distinct host buffers per batch
        r2b, nl, _ = kalign.pack_reads_2bit(reads)
        packed.append((r2b.copy(), nl.copy()))

    def compute(d1, d2):
        return seed_extend_v5.fast_pass_packed_v5(
            gview, sa, lut2, lut4, d1, d2, read_len=L, genome_len=len(seq),
            offsets=offs, lut_k=idx.lut_k, n_compact=al.n_compact,
            n_extend=al.n_extend, max_tot_mm=mtm, mm_delta=al.mm_delta,
            tier2=(512, 192, 96))

    # warm everything
    d1 = jnp.asarray(packed[0][0]); d2 = jnp.asarray(packed[0][1])
    jax.device_get(compute(d1, d2))

    def proto_serial():
        t0 = time.time()
        for r2b, nl in packed:
            d1 = jnp.asarray(r2b); d2 = jnp.asarray(nl)
            jax.device_get(compute(d1, d2))
        return (time.time() - t0) / NBATCH

    def proto_depth2():
        t0 = time.time()
        devs = []
        d1 = jnp.asarray(packed[0][0]); d2 = jnp.asarray(packed[0][1])
        for i in range(NBATCH):
            out = compute(d1, d2)
            if i + 1 < NBATCH:      # upload next while compute runs
                d1 = jnp.asarray(packed[i + 1][0])
                d2 = jnp.asarray(packed[i + 1][1])
            devs.append(out)
            if len(devs) > 1:
                jax.device_get(devs.pop(0))
        for d in devs:
            jax.device_get(d)
        return (time.time() - t0) / NBATCH

    def proto_upfront():
        t0 = time.time()
        ins = [(jnp.asarray(a), jnp.asarray(b)) for a, b in packed]
        outs = [compute(d1, d2) for d1, d2 in ins]
        for o in outs:
            jax.device_get(o)
        return (time.time() - t0) / NBATCH

    # pure h2d and pure compute for the decomposition
    ts = []
    for _ in range(4):
        t0 = time.time()
        for r2b, nl in packed:
            a = jnp.asarray(r2b); b = jnp.asarray(nl)
            jax.device_get(a[0, :1]); jax.device_get(b[0, :1])
        ts.append((time.time() - t0) / NBATCH)
    t_h2d = statistics.median(ts)
    ts = []
    for _ in range(4):
        t0 = time.time()
        outs = [compute(d1, d2) for _ in range(NBATCH)]
        for o in outs:
            jax.device_get(o)
        ts.append((time.time() - t0) / NBATCH)
    t_comp = statistics.median(ts)
    log(f"pure h2d {t_h2d*1000:.1f} ms/batch; amortized compute "
        f"{t_comp*1000:.1f} ms/batch; sum {1000*(t_h2d+t_comp):.1f}")

    for name, fn in (("A serial", proto_serial),
                     ("B depth-2", proto_depth2),
                     ("C all-upfront", proto_upfront)):
        fn()
        ts = [fn() for _ in range(4)]
        t = statistics.median(ts)
        hidden = (t_h2d + t_comp - t) / min(t_h2d, t_comp)
        log(f"{name:14s}: {t*1000:7.1f} ms/batch  "
            f"(overlap fraction {hidden:+.2f})")


if __name__ == "__main__":
    main()
