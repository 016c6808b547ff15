"""Stage-level timing of the v4 packed-native pass on the real chip.

Isolates: word planes, seed keys+LUT gather, compaction->sa_idx, SA gather,
dedup+recompact, extension (gview row gather + xor/popcount), classify.
Each stage is jitted standalone with its inputs pre-resident so the deltas
bound where a fused Pallas kernel could pay.
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
NC, NS = 24, 12

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=B, read_len=L, seed=7, error_mode="illumina", subs_rate=0.02))
reads = np.stack([r.codes for r in recs])
reads2b, nlist, _ = kalign.pack_reads_2bit(reads)

offsets = F2.fast_offsets(L, idx.lut_k, 5)
nw = (L + 15) // 16
nw2 = nw + 1
gpack, gbad = pack_genome(seq, 65)
gview = F2.make_gview_device(gpack, gbad, nw2)
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut2 = F3.make_lut2_device(idx.lut)
G = len(seq)
k = idx.lut_k
W = len(offsets)
D = 2 * W
M = int(sa.shape[0])
Gv = int(gview.shape[0])
print(f"devices: {jax.devices()}  W={W} D={D} NC={NC} NS={NS} "
      f"Gv={Gv} M={M}", flush=True)

r2b_d = jnp.asarray(reads2b)
nl_d = jnp.asarray(nlist)
jax.block_until_ready(r2b_d)


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name:46s} {ts[len(ts)//2]*1000:8.2f} ms (min {ts[0]*1000:.2f})",
          flush=True)
    return out


# stage 1: word planes
s_planes = jax.jit(functools.partial(F4.words_from_2bit, read_len=L))
planes = timeit("1 words_from_2bit", s_planes, r2b_d, nl_d)
planes = jax.block_until_ready(planes)


# stage 2: keys + LUT pair gather -> lo/cnt [D, B]
@jax.jit
def s_seeds(planes):
    rw, rb, rcw, rcb = planes
    kf, okf = F4._keys_be(rw, rb, offsets, k)
    kr, okr = F4._keys_be(rcw, rcb, offsets, k)
    keys = jnp.stack([kf, kr], axis=0)
    key_ok = jnp.stack([okf, okr], axis=0)
    local = keys
    pair = lut2[local]
    lo = pair[..., 0]
    cnt = jnp.where(key_ok, pair[..., 1], 0)
    return lo.reshape(D, B), cnt.reshape(D, B)


lo_d, cnt_d = timeit("2 seed keys + lut2 gather", s_seeds, planes)


# stage 3: compaction -> sa_idx/pos/valid
@jax.jit
def s_compact(lo_d, cnt_d):
    cum = jnp.cumsum(cnt_d, axis=0)
    total = cum[-1]
    overflow = total > NC
    j = jnp.arange(NC, dtype=jnp.int32)[:, None, None]
    le = (cum[None, :, :] <= j).astype(jnp.int32)
    b = jnp.clip(jnp.sum(le, axis=1), 0, D - 1)
    donehot = (b[:, None, :] ==
               jnp.arange(D, dtype=jnp.int32)[None, :, None])
    cum0 = jnp.concatenate([jnp.zeros((1, B), jnp.int32), cum[:-1]], axis=0)
    prev = jnp.sum(jnp.where(donehot, cum0[None], 0), axis=1)
    lo_b = jnp.sum(jnp.where(donehot, lo_d[None], 0), axis=1)
    jq = jnp.arange(NC, dtype=jnp.int32)[:, None]
    rank = jq - prev
    sa_idx = lo_b + rank
    slot_ok = jq < jnp.minimum(total, NC)[None, :]
    w_d = b % W
    strand = b // W
    off_np = np.asarray(offsets, np.int32)
    off_b = jnp.sum(jnp.where(
        w_d[:, None, :] == jnp.arange(W, dtype=jnp.int32)[None, :, None],
        jnp.asarray(off_np)[None, :, None], 0), axis=1)
    return sa_idx, slot_ok, w_d, strand, off_b, overflow


cpack = timeit("3 compaction (cumsum+onehots)", s_compact, lo_d, cnt_d)
sa_idx, slot_ok, w_d, strand, off_b, overflow = cpack


# stage 4: SA gather
@jax.jit
def s_sagather(sa_idx, off_b, slot_ok):
    sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
    pos = sa_pos - off_b
    valid = slot_ok & (pos >= 0) & (pos + L <= G)
    return pos, valid


pos, valid = timeit("4 SA gather [NC,B]", s_sagather, sa_idx, off_b, slot_ok)


# stage 5: dedup + recompact
@jax.jit
def s_dedup(pos, valid, strand, w_d):
    lid = jnp.where(valid, pos * 2 + strand, F3.INT32_MAX)
    eq = (lid[:, None, :] == lid[None, :, :]) & valid[None, :, :]
    tri = np.tril(np.ones((NC, NC), dtype=bool), -1)
    dup = jnp.any(eq & jnp.asarray(tri)[:, :, None], axis=1)
    keep = valid & ~dup
    n_uniq = jnp.sum(keep, axis=0, dtype=jnp.int32)
    kcum = jnp.cumsum(keep.astype(jnp.int32), axis=0)
    j2 = jnp.arange(NS, dtype=jnp.int32)[:, None, None]
    src = jnp.clip(jnp.sum((kcum[None, :, :] <= j2).astype(jnp.int32),
                           axis=1), 0, NC - 1)
    shot = (src[:, None, :] ==
            jnp.arange(NC, dtype=jnp.int32)[None, :, None])
    pos2 = jnp.sum(jnp.where(shot, pos[None], 0), axis=1)
    str2 = jnp.sum(jnp.where(shot, strand[None], 0), axis=1)
    wd2 = jnp.sum(jnp.where(shot, w_d[None], 0), axis=1)
    ok2 = (jnp.arange(NS, dtype=jnp.int32)[:, None]
           < jnp.minimum(n_uniq, NS)[None, :])
    return pos2, str2, wd2, ok2


dpack = timeit("5 dedup [NC,NC,B] + recompact", s_dedup, pos, valid,
               strand, w_d)
pos2, str2, wd2, ok2 = dpack


# stage 6a: pure gview row gather
@jax.jit
def s_gather_only(pos2, ok2):
    posc = jnp.where(ok2, pos2, 0)
    w0 = jnp.clip(posc >> 4, 0, Gv - 1)
    return gview[w0]


rows = timeit("6a gview row gather [NS,B,16]", s_gather_only, pos2, ok2)


# stage 6: full extension (gather + shift + xor/popcount + windows)
@jax.jit
def s_extend(planes, pos2, str2, wd2, ok2):
    rw, rb, rcw, rcb = planes
    posc = jnp.where(ok2, pos2, 0)
    w0 = jnp.clip(posc >> 4, 0, Gv - 1)
    rows = gview[w0]
    rows = jnp.transpose(rows, (0, 2, 1))
    gw = rows[:, :nw2]
    gb = rows[:, nw2:]
    sh = (2 * (posc & 15)).astype(jnp.uint32)[:, None, :]
    hi_sh = jnp.uint32(32) - sh

    def shift_align(words):
        lo_w = words[:, :nw] >> sh
        hi_w = jnp.where(sh == 0, jnp.uint32(0), words[:, 1:] << hi_sh)
        return lo_w | hi_w

    ga = shift_align(gw)
    gba = shift_align(gb)
    st = str2[:, None, :]
    rp = jnp.where(st == 0, rw[None], rcw[None])
    rbad = jnp.where(st == 0, rb[None], rcb[None])
    x = ga ^ rp
    mism = (x | (x >> 1)) & F3.MISM_BITS
    badb = (gba | rbad) & F3.MISM_BITS
    tmask = jnp.asarray(F4._tail_mask(L, nw))[None, :, None]
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=1, dtype=jnp.int32)
    wmask = F4._window_masks(offsets, k, nw)
    fw = jnp.full((NS, B), W, dtype=jnp.int32)
    any_exact = jnp.zeros((NS, B), dtype=bool)
    for w in range(W - 1, -1, -1):
        ne = jnp.zeros((NS, B), dtype=bool)
        for wi in range(nw):
            if wmask[w, wi]:
                ne = ne | ((bits[:, wi] & jnp.uint32(wmask[w, wi])) != 0)
        ex = ~ne
        fw = jnp.where(ex, w, fw)
        any_exact = any_exact | ex
    canonical = ok2 & any_exact & (fw == wd2)
    ids = jnp.where(canonical, pos2 * 2 + str2, F3.INT32_MAX)
    mm = jnp.where(canonical, mm, F3.INT32_MAX)
    return ids, mm


ids, mm = timeit("6 extension full", s_extend, planes, pos2, str2, wd2, ok2)


# stage 7: classify
@jax.jit
def s_classify(ids, mm, overflow):
    return F3._classify_compact(ids, mm, overflow, max_tot_mm=5, mm_delta=1)


timeit("7 classify", s_classify, ids, mm, overflow)


# whole fused pass for reference
f4 = functools.partial(
    F4.fast_pass_packed_v4, gview, sa, lut2, read_len=L, genome_len=G,
    offsets=offsets, lut_k=k, n_compact=NC, n_extend=NS, max_tot_mm=5,
    mm_delta=1)
timeit("FULL fast_pass_packed_v4 (incl tier2)", f4, r2b_d, nl_d)
f4nt = functools.partial(
    F4.fast_pass_packed_v4, gview, sa, lut2, read_len=L, genome_len=G,
    offsets=offsets, lut_k=k, n_compact=NC, n_extend=NS, max_tot_mm=5,
    mm_delta=1, tier2=None)
timeit("FULL v4 tier2=None", f4nt, r2b_d, nl_d)
