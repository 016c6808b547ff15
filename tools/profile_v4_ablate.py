"""Ablation timing INSIDE the fused v4 graph: replace each gather with a
cheap fake (same shapes/dtypes) and measure the full-pass delta. Unlike
standalone stage timings (which carry ~20 ms of per-executable overhead on
the axon tunnel), deltas on the fused executable attribute cost correctly.
Results are WRONG for ablated variants - timing only.
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
NC, NS = 24, 12

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=98304, read_len=L, seed=7, error_mode="illumina",
    subs_rate=0.02))
reads_all = np.stack([r.codes for r in recs])

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
print(f"devices: {jax.devices()}  W={W} D={D}", flush=True)


def core_ablate(planes, *, no_lut, no_sa, no_gview, no_dedup=False,
                no_exact=False, B=0):
    """_cands_core_v4 with optional fake replacements for each gather."""
    rw, rb, rcw, rcb = planes
    kf, okf = F4._keys_be(rw, rb, offsets, k)
    kr, okr = F4._keys_be(rcw, rcb, offsets, k)
    keys = jnp.stack([kf, kr], axis=0)
    key_ok = jnp.stack([okf, okr], axis=0)
    if no_lut:
        lo = keys & 1023
        cnt = jnp.where(key_ok, (keys >> 3) & 1, 0)
    else:
        pair = lut2[keys]
        lo = pair[..., 0]
        cnt = jnp.where(key_ok, pair[..., 1], 0)
    lo_d = lo.reshape(D, B)
    cnt_d = cnt.reshape(D, B)
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
    if no_sa:
        sa_pos = (sa_idx * 7) % G
    else:
        sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
    pos = sa_pos - off_b
    valid = slot_ok & (pos >= 0) & (pos + L <= G)
    if no_dedup:
        keep = valid
        pos2 = pos[:NS]
        str2 = strand[:NS]
        wd2 = w_d[:NS]
        ok2 = valid[:NS]
    else:
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
    posc = jnp.where(ok2, pos2, 0)
    w0 = jnp.clip(posc >> 4, 0, Gv - 1)
    if no_gview:
        rows = jnp.broadcast_to(gview[:1], (NS, B, 2 * nw2)) + \
            w0[..., None].astype(jnp.uint32)
    else:
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
    tmask = jnp.asarray(F2._tail_mask(L, nw))[None, :, None]
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=1, dtype=jnp.int32)
    if no_exact:
        canonical = ok2
    else:
        wmask = F2._window_masks(offsets, k, nw)
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
    code, low, n_low = F3._classify_compact(ids, mm, overflow,
                                            max_tot_mm=5, mm_delta=1)
    return F3.pack_result2(code, low)


def run(name, B, **abl):
    reads2b, nlist, _ = kalign.pack_reads_2bit(reads_all[:B])
    r2b_d = jnp.asarray(reads2b)
    nl_d = jnp.asarray(nlist)
    jax.block_until_ready(r2b_d)

    @jax.jit
    def f(r2b, nl):
        planes = F4.words_from_2bit(r2b, nl, L)
        return core_ablate(planes, B=B, **abl)

    # block_until_ready does NOT synchronise on the axon platform
    # (see ops/seed_extend_v3.py header); force completion by fetching a
    # reduction that consumes every output.
    @jax.jit
    def consume(outs):
        return sum((o & 1).sum() for o in outs)

    out = f(r2b_d, nl_d)
    _ = int(jax.device_get(consume([out])))
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [f(r2b_d, nl_d) for _ in range(8)]
        _ = int(jax.device_get(consume(outs)))
        dt = (time.time() - t0) / 8
        best = dt if best is None else min(best, dt)
    print(f"{name:40s} B={B:6d} {best*1000:8.2f} ms", flush=True)
    return best


B = 98304
full = run("full (no tier2)", B, no_lut=False, no_sa=False, no_gview=False)
run("  - lut gather", B, no_lut=True, no_sa=False, no_gview=False)
run("  - sa gather", B, no_lut=False, no_sa=True, no_gview=False)
run("  - gview gather", B, no_lut=False, no_sa=False, no_gview=True)
run("  - all gathers", B, no_lut=True, no_sa=True, no_gview=True)
run("  - dedup", B, no_lut=False, no_sa=False, no_gview=False,
    no_dedup=True)
run("  - exact-window", B, no_lut=False, no_sa=False, no_gview=False,
    no_exact=True)
run("full small", 12288, no_lut=False, no_sa=False, no_gview=False)
run("full half", 49152, no_lut=False, no_sa=False, no_gview=False)
