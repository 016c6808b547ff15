"""Clean per-stage device cost of the compact fast pass, measured by
pipelined repeats (12 in-flight calls, block on last) so the ~30 ms
per-call tunnel dispatch is amortised away."""
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
L = 100
B = 32768
NC = 16
REP = 12

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=B, read_len=L, seed=7, error_mode="illumina", subs_rate=0.02))
reads = np.stack([r.codes for r in recs])

offsets = F.fast_offsets(L, idx.lut_k, 5)
nw = (L + 15) // 16
nw2 = nw + 1
gpack, gbad = pack_genome(seq, 65)
gview = jnp.asarray(F.make_gview(gpack, gbad, nw2))
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut = jnp.asarray(idx.lut.astype(np.int32))
reads_d = jnp.asarray(reads)
G = len(seq)
M = int(sa.shape[0])
W = len(offsets)
D = 2 * W
k = idx.lut_k
n_keys = int(lut.shape[0]) - 1
IMAX = np.iinfo(np.int32).max
Gv = int(gview.shape[0])
MISM = np.uint32(0x55555555)


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(REP)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / REP
    print(f"{name:38s} {dt*1000:8.2f} ms  ({B/dt/1e6:.2f}M r/s)", flush=True)
    return outs[-1]


@jax.jit
def upto_seed(reads):
    seqs = jnp.stack([reads, F.revcomp_device(reads)], axis=1)
    offs = (jnp.asarray(offsets, jnp.int32)[:, None]
            + jnp.arange(k, dtype=jnp.int32)[None, :])
    bases = seqs[:, :, offs]
    powb = jnp.asarray([4 ** e for e in range(k - 1, -1, -1)], jnp.int32)
    digits = jnp.where(bases < 4, bases, 0).astype(jnp.int32)
    keys = jnp.sum(digits * powb, axis=-1, dtype=jnp.int32)
    key_ok = jnp.all(bases < 4, axis=-1)
    local = jnp.clip(keys, 0, n_keys - 1)
    lo = lut[local].astype(jnp.int32)
    cnt = jnp.where(key_ok, lut[local + 1].astype(jnp.int32) - lo, 0)
    return lo.reshape(B, D), cnt.reshape(B, D), seqs


@jax.jit
def upto_compact(reads):
    lo_d, cnt_d, seqs = upto_seed(reads)
    cum = jnp.cumsum(cnt_d, axis=1)
    total = cum[:, -1]
    j = jnp.arange(NC, dtype=jnp.int32)
    b = jnp.sum((cum[:, None, :] <= j[None, :, None]).astype(jnp.int32),
                axis=2)
    b = jnp.clip(b, 0, D - 1)
    cum0 = jnp.pad(cum, ((0, 0), (1, 0)))
    prev = jnp.take_along_axis(cum0, b, axis=1)
    rank = j[None, :] - prev
    sa_idx = jnp.take_along_axis(lo_d, b, axis=1) + rank
    slot_ok = j[None, :] < jnp.minimum(total, NC)[:, None]
    return sa_idx, slot_ok, b, total, seqs


@jax.jit
def upto_sa(reads):
    sa_idx, slot_ok, b, total, seqs = upto_compact(reads)
    w_d = b % W
    strand = b // W
    off_b = jnp.asarray(offsets, dtype=jnp.int32)[w_d]
    sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
    pos = sa_pos - off_b
    valid = slot_ok & (pos >= 0) & (pos + L <= G)
    return pos, valid, strand, w_d, total, seqs


@jax.jit
def upto_rows(reads):
    pos, valid, strand, w_d, total, seqs = upto_sa(reads)
    w0 = jnp.clip(jnp.where(valid, pos, 0) >> 4, 0, Gv - 1)
    rows = gview[w0]
    return rows.sum(dtype=jnp.uint32), pos, valid


@jax.jit
def upto_extend(reads):
    pos, valid, strand, w_d, total, seqs = upto_sa(reads)
    rpack, rbad = F.pack_reads0(seqs, nw)
    w0 = jnp.clip(jnp.where(valid, pos, 0) >> 4, 0, Gv - 1)
    rows = gview[w0]
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
    mism = (x | (x >> 1)) & MISM
    badb = (gba | rb) & MISM
    tmask = jnp.asarray(F._tail_mask(L, nw))
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=-1, dtype=jnp.int32)
    return mm, bits, pos, valid, strand, w_d


@jax.jit
def full(reads):
    mm, bits, pos, valid, strand, w_d = upto_extend(reads)
    wmask = jnp.asarray(F._window_masks(offsets, k, nw))
    notexact = jnp.any((bits[:, :, None, :] & wmask[None, None]) != 0,
                       axis=-1)
    exact = ~notexact
    fw = jnp.argmax(exact, axis=-1).astype(jnp.int32)
    canonical = valid & jnp.any(exact, axis=-1) & (fw == w_d)
    ids = jnp.where(canonical, pos * 2 + strand, IMAX)
    mm = jnp.where(canonical, mm, IMAX)
    low = jnp.min(mm, axis=1)
    n_low = jnp.sum((mm == low[:, None]) & (ids != IMAX), axis=1,
                    dtype=jnp.int32)
    nxt = jnp.min(jnp.where(mm > low[:, None], mm, IMAX), axis=1)
    best_id = jnp.min(jnp.where(mm == low[:, None], ids, IMAX), axis=1)
    aligned = low <= 5
    unique = aligned & (n_low == 1) & ((nxt - low) >= 1)
    code = jnp.where(unique, best_id, jnp.where(aligned, -2, -1))
    return jnp.stack([code, low, n_low], axis=1)


print(f"devices: {jax.devices()}  B={B} NC={NC} W={W}", flush=True)
timeit("s1 seed (keys+lut)", upto_seed, reads_d)
timeit("s2 +compact", upto_compact, reads_d)
timeit("s3 +sa gather", upto_sa, reads_d)
timeit("s4 +gview rows", upto_rows, reads_d)
timeit("s5 +extend", upto_extend, reads_d)
timeit("s6 full+canonical+classify", full, reads_d)
fc = functools.partial(F.fast_pass_compact, genome_len=G, offsets=offsets,
                       lut_k=idx.lut_k, n_compact=NC, max_tot_mm=5,
                       mm_delta=1)
timeit("module fast_pass_compact", fc, gview, sa, lut, reads_d)
