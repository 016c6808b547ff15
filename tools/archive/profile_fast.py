"""Stage timing of seed_extend_fast on TPU + overflow-rate check."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.sim import simreads
from kit4b_tpu.ops import seed_extend_fast as F
from kit4b_tpu.ops.extend_packed import pack_genome

GENOME_LEN = 4_600_000
B = 8192
L = 100
NC = 16

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=B, read_len=L, seed=7, error_mode="illumina", subs_rate=0.02))
reads = np.stack([r.codes for r in recs])

offsets = F.fast_offsets(L, idx.lut_k, 5)
print(f"offsets: {offsets}", file=sys.stderr, flush=True)
nw = (L + 15) // 16
nw2 = nw + 1
gpack, gbad = pack_genome(seq, 65)
gview = jnp.asarray(F.make_gview(gpack, gbad, nw2))
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut = jnp.asarray(idx.lut.astype(np.int32))
reads_d = jnp.asarray(reads)
G = len(seq)
M = idx.sa_clean.shape[0]
W = len(offsets)
D = 2 * W
k = idx.lut_k
n_keys = idx.lut.shape[0] - 1
IMAX = np.iinfo(np.int32).max
Gv = gview.shape[0]


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1000:8.2f} ms", file=sys.stderr, flush=True)
    return out


@jax.jit
def s1_seed(reads):
    seqs = jnp.stack([reads, F.revcomp_device(reads)], axis=1)
    offs = (jnp.asarray(offsets, jnp.int32)[:, None]
            + jnp.arange(k, dtype=jnp.int32)[None, :])
    bases = seqs[:, :, offs]
    pow4 = (jnp.uint32(1) << (2 * jnp.arange(k - 1, -1, -1,
                                             dtype=jnp.uint32))).astype(jnp.int32)
    keys = jnp.sum(jnp.where(bases < 4, bases, 0).astype(jnp.int32) * pow4,
                   axis=-1, dtype=jnp.int32)
    key_ok = jnp.all(bases < 4, axis=-1)
    local = jnp.clip(keys, 0, n_keys - 1)
    lo = lut[local].astype(jnp.int32)
    cnt = lut[local + 1].astype(jnp.int32) - lo
    cnt = jnp.where(key_ok, cnt, 0)
    return lo.reshape(B, D), cnt.reshape(B, D), seqs


@jax.jit
def s2_compact(lo_d, cnt_d):
    cum = jnp.cumsum(cnt_d, axis=1)
    total = cum[:, -1]
    j = jnp.arange(NC, dtype=jnp.int32)
    b = jnp.sum((cum[:, None, :] <= j[None, :, None]).astype(jnp.int32), axis=2)
    b = jnp.clip(b, 0, D - 1)
    cum0 = jnp.pad(cum, ((0, 0), (1, 0)))
    prev = jnp.take_along_axis(cum0, b, axis=1)
    rank = j[None, :] - prev
    sa_idx = jnp.take_along_axis(lo_d, b, axis=1) + rank
    slot_ok = j[None, :] < jnp.minimum(total, NC)[:, None]
    return b, sa_idx, slot_ok, total


@jax.jit
def s3_sa(b, sa_idx, slot_ok):
    w_d = b % W
    strand = b // W
    off_b = jnp.asarray(offsets, dtype=jnp.int32)[w_d]
    sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
    pos = sa_pos - off_b
    valid = slot_ok & (pos >= 0) & (pos + L <= G)
    return pos, strand, w_d, valid


@jax.jit
def s4_rows(pos, valid):
    w0 = jnp.clip(jnp.where(valid, pos, 0) >> 4, 0, Gv - 1)
    return gview[w0]


@jax.jit
def s5_extend(rows, pos, strand, valid, seqs):
    rpack, rbad = F.pack_reads0(seqs, nw)
    gw = rows[..., :nw2]
    gb = rows[..., nw2:]
    sh = (2 * (jnp.where(valid, pos, 0) & 15)).astype(jnp.uint32)[..., None]
    hi_sh = jnp.uint32(32) - sh

    def shift_align(words):
        lo_w = words[..., :nw] >> sh
        hi_w = jnp.where(sh == 0, jnp.uint32(0), words[..., 1:] << hi_sh)
        return lo_w | hi_w

    ga = shift_align(gw)
    gba = shift_align(gb)
    st = strand[..., None]
    rp = jnp.where(st == 0, rpack[:, None, 0, :], rpack[:, None, 1, :])
    rb = jnp.where(st == 0, rbad[:, None, 0, :], rbad[:, None, 1, :])
    x = ga ^ rp
    mism = (x | (x >> 1)) & F.MISM_BITS
    badb = (gba | rb) & F.MISM_BITS
    tmask = jnp.asarray(F._tail_mask(L, nw))
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=-1, dtype=jnp.int32)
    return bits, mm


@jax.jit
def s6_canon(bits, mm, pos, strand, w_d, valid):
    wmask = jnp.asarray(F._window_masks(offsets, k, nw))
    notexact = jnp.any((bits[:, :, None, :] & wmask[None, None]) != 0, axis=-1)
    exact = ~notexact
    fw = jnp.argmax(exact, axis=-1).astype(jnp.int32)
    canonical = valid & jnp.any(exact, axis=-1) & (fw == w_d)
    ids = jnp.where(canonical, pos * 2 + strand, IMAX)
    mm = jnp.where(canonical, mm, IMAX)
    return ids, mm


@jax.jit
def s7_final(ids, mm):
    return F.finalize_fast(ids, mm, max_ml=5)


full = functools.partial(F.fast_pass, genome_len=G, offsets=offsets,
                         lut_k=k, n_compact=NC, max_ml=5)

lo_d, cnt_d, seqs = timeit("s1 seed lut", s1_seed, reads_d)
b, sa_idx, slot_ok, total = timeit("s2 compact", s2_compact, lo_d, cnt_d)
pos, strand, w_d, valid = timeit("s3 sa gather", s3_sa, b, sa_idx, slot_ok)
rows = timeit("s4 gview rows", s4_rows, pos, valid)
bits, mm = timeit("s5 extend", s5_extend, rows, pos, strand, valid, seqs)
ids, mmv = timeit("s6 canonical", s6_canon, bits, mm, pos, strand, w_d, valid)
out = timeit("s7 finalize(sort)", s7_final, ids, mmv)
out = timeit("FULL fast_pass", full, gview, sa, lut, reads_d)

tot = np.asarray(total)
print(f"candidates/read: mean {tot.mean():.1f} p99 "
      f"{np.percentile(tot, 99):.0f} max {tot.max()} "
      f"overflow@16 {(tot > 16).mean()*100:.2f}% "
      f"overflow@24 {(tot > 24).mean()*100:.2f}% "
      f"overflow@32 {(tot > 32).mean()*100:.2f}%",
      file=sys.stderr, flush=True)
