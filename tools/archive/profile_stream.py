"""Streaming-overlap probe: can h2d of batch k+1 hide compute of batch k?

bench.py's one_round serializes (h2d + compute + d2h) per round. The
production streaming path (align_records) keeps 2 batches in flight. This
measures, for K batches of fresh host data:
  A) serial:   for each batch: h2d -> compute -> sync
  B) inflight: submit all K (h2d+compute) async, sync once at the end
If the tunnel can stream uploads while the device computes, B's per-batch
time approaches max(h2d, compute) instead of their sum.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kit4b_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax
import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.sim import simreads
from kit4b_tpu.ops import seed_extend_fast as F2
from kit4b_tpu.ops import seed_extend_v3 as F3
from kit4b_tpu.ops import seed_extend_v4 as F4
from kit4b_tpu.ops.extend_packed import pack_genome
from kit4b_tpu.align import kalign

GENOME_LEN = 4_600_000
L = 100
B = 98304

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=B, read_len=L, seed=7, error_mode="illumina", subs_rate=0.02))
reads = np.stack([r.codes for r in recs])

offsets = F2.fast_offsets(L, idx.lut_k, 5)
nw2 = (L + 15) // 16 + 1
gpack, gbad = pack_genome(seq, 65)
gview = F2.make_gview_device(gpack, gbad, nw2)
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut2 = F3.make_lut2_device(idx.lut)
G = len(seq)
print(f"devices: {jax.devices()}", flush=True)

f4 = functools.partial(
    F4.fast_pass_packed_v4, gview, sa, lut2, read_len=L, genome_len=G,
    offsets=offsets, lut_k=idx.lut_k, n_compact=24, n_extend=12,
    max_tot_mm=5, mm_delta=1)

# K distinct host batches, pre-packed (host packing excluded — bench.py's
# _submit packs natively in ~ms)
K = 8
host = []
for i in range(K):
    r2b, nl, _ = kalign.pack_reads_2bit(np.roll(reads, 977 * i, axis=0))
    host.append((r2b, nl))

# warm compile
o = f4(jnp.asarray(host[0][0]), jnp.asarray(host[0][1]))
jax.block_until_ready(o)

for mode in ("serial", "inflight2", "inflightK"):
    best = None
    for _ in range(3):
        t0 = time.time()
        if mode == "serial":
            for r2b, nl in host:
                o = f4(jnp.asarray(r2b), jnp.asarray(nl))
                jax.block_until_ready(o)
        elif mode == "inflight2":
            pend = []
            for r2b, nl in host:
                pend.append(f4(jnp.asarray(r2b), jnp.asarray(nl)))
                if len(pend) >= 2:
                    jax.block_until_ready(pend.pop(0))
            for o in pend:
                jax.block_until_ready(o)
        else:
            outs = [f4(jnp.asarray(r2b), jnp.asarray(nl))
                    for r2b, nl in host]
            for o in outs:
                jax.block_until_ready(o)
        dt = (time.time() - t0) / K
        best = dt if best is None else min(best, dt)
    print(f"{mode:10s} {best*1000:8.1f} ms/batch  "
          f"{B/best:,.0f} reads/s", flush=True)

# pure h2d rate for reference
t0 = time.time()
ds = [jnp.asarray(r2b) for r2b, _ in host]
for d in ds:
    jax.block_until_ready(d)
dt = (time.time() - t0) / K
print(f"h2d only   {dt*1000:8.1f} ms/batch "
      f"({host[0][0].nbytes/dt/1e6:.1f} MB/s)", flush=True)
