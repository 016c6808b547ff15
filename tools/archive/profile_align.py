"""Stage-by-stage timing of the kalign device pass on real hardware.

Times each stage of ops/seed_extend.gather_score_candidates + finalize as its
own jitted function to find what dominates the 0.22s/8192-read batch.
"""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.sim import simreads
from kit4b_tpu.align import kalign
from kit4b_tpu.ops import seed_extend, extend_packed

GENOME_LEN = 4_600_000
B = 8192
L = 100

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["ecoli_sim"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=B, read_len=L, seed=7, error_mode="illumina", subs_rate=0.02))
reads = np.stack([r.codes for r in recs])

al = kalign.KAligner(idx, batch_size=B)
passes, max_tot = al.schedule_for(L)
offsets = kalign.union_offsets(passes)
print(f"offsets W={len(offsets)}: {offsets}", file=sys.stderr)
gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
reads_d = jnp.asarray(reads)

G = len(seq)
M = idx.sa_clean.shape[0]
C = al.cand
NC = al.n_compact
W = len(offsets)
k = idx.lut_k
nw = (L + 30) // 16
n_keys = idx.lut.shape[0] - 1
INT32_MAX = np.iinfo(np.int32).max


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:30s} {dt*1000:8.2f} ms", file=sys.stderr)
    return out


@jax.jit
def stage1(reads):
    seqs = jnp.stack([reads, seed_extend.revcomp_device(reads)], axis=1)
    offs = (jnp.asarray(offsets, jnp.int32)[:, None]
            + jnp.arange(k, dtype=jnp.int32)[None, :])
    bases = seqs[:, :, offs]
    pow4 = (jnp.uint32(1) << (2 * jnp.arange(k - 1, -1, -1,
                                             dtype=jnp.uint32))).astype(jnp.int32)
    keys = jnp.sum(jnp.where(bases < 4, bases, 0).astype(jnp.int32) * pow4,
                   axis=-1, dtype=jnp.int32)
    key_ok = jnp.all(bases < 4, axis=-1)
    lo = lut_d[jnp.clip(keys, 0, n_keys - 1)]
    hi = lut_d[jnp.clip(keys, 0, n_keys - 1) + 1]
    cnt = jnp.where(key_ok, jnp.minimum(hi - lo, C), 0)
    cidx = lo[..., None] + jnp.arange(C, dtype=jnp.int32)
    cvalid = jnp.arange(C, dtype=jnp.int32) < cnt[..., None]
    sa_pos = sa_d[jnp.clip(cidx, 0, M - 1)].astype(jnp.int32)
    off_arr = jnp.asarray(offsets, dtype=jnp.int32)[None, None, :, None]
    pos = sa_pos - off_arr
    valid = cvalid & (pos >= 0) & (pos + L <= G)
    strand_arr = jnp.arange(2, dtype=jnp.int32)[None, :, None, None]
    cand_id = jnp.where(valid, pos * 2 + strand_arr,
                        INT32_MAX).reshape(B, 2 * W * C)
    return cand_id, seqs


@jax.jit
def stage2(cand_id):
    ids_full = jnp.sort(cand_id, axis=1)
    ids = jax.lax.slice_in_dim(ids_full, 0, NC, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), ids[:, 1:] == ids[:, :-1]], axis=1)
    ok = (ids != INT32_MAX) & ~dup
    return ids, ok


@jax.jit
def stage3a(seqs):
    rpack, rbad = extend_packed.pack_read_phases(seqs, nw, with_bad=True)
    return rpack, rbad


@jax.jit
def stage3b(ids, ok, rpack, rbad):
    pmask = jnp.asarray(extend_packed.phase_masks(L, nw))
    pos_s = jnp.where(ok, ids >> 1, 0)
    strand_s = (ids & 1).astype(jnp.int32)
    mm = extend_packed.extend_packed(gpack_d, gbad_d, rpack, rbad, pmask,
                                     pos_s, strand_s, read_len=L)
    mm = jnp.where(ok, mm, INT32_MAX)
    return mm


@jax.jit
def stage4(ids, mm):
    return seed_extend.finalize_candidates(ids, mm, max_ml=5, presorted=True)


full = functools.partial(
    seed_extend.align_pass, genome_len=G, offsets=offsets, lut_k=k,
    cand_per_window=C, n_compact=NC, max_ml=5, reads_have_ns=True)

cand_id, seqs = timeit("stage1 seed+SA gather", stage1, reads_d)
ids, ok = timeit("stage2 sort/compact", stage2, cand_id)
rpack, rbad = timeit("stage3a pack_read_phases", stage3a, seqs)
mm = timeit("stage3b extension gather", stage3b, ids, ok, rpack, rbad)
out = timeit("stage4 finalize", stage4, ids, mm)
out = timeit("FULL align_pass", full, gpack_d, gbad_d, sa_d, lut_d, reads_d)
