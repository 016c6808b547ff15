"""Bisect which v3 stage fails on the axon TPU backend."""
import sys, os, functools
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
from kit4b_tpu.ops.extend_packed import pack_genome

GENOME_LEN = 600_000
L = 100
B = 4096
rng = np.random.default_rng(1)
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
reads_d = jnp.asarray(reads)

NC, NS = 24, 8
W = len(offsets)
k = idx.lut_k
nw = (L + 15) // 16
M = int(sa.shape[0])
n_keys = int(lut2.shape[0])
Gv = int(gview.shape[0])
IMAX = np.iinfo(np.int32).max


def stage(n):
    @jax.jit
    def f(reads):
        rt = reads.T
        comp = jnp.where(rt < 4, 3 - rt, rt)
        seqs = jnp.stack([rt, comp[::-1, :]], axis=0)
        if n == 0:
            return seqs.astype(jnp.int32).sum(axis=(0, 1))
        dig = jnp.where(seqs < 4, seqs, 0).astype(jnp.int32)
        keys, key_ok = [], []
        for off in offsets:
            acc = jnp.zeros((2, B), dtype=jnp.int32)
            ok = jnp.ones((2, B), dtype=bool)
            for t in range(k):
                acc = acc * 4 + dig[:, off + t, :]
                ok = ok & (seqs[:, off + t, :] < 4)
            keys.append(acc)
            key_ok.append(ok)
        keys = jnp.stack(keys, axis=1)
        key_ok = jnp.stack(key_ok, axis=1)
        if n == 1:
            return keys.sum(axis=(0, 1))
        local = jnp.clip(keys, 0, n_keys - 1)
        pair = lut2[local]
        lo = pair[..., 0]
        cnt = jnp.where(key_ok, pair[..., 1], 0)
        if n == 2:
            return (lo + cnt).sum(axis=(0, 1))
        D = 2 * W
        lo_d = lo.reshape(D, B)
        cnt_d = cnt.reshape(D, B)
        cum = jnp.cumsum(cnt_d, axis=0)
        total = cum[-1]
        j = jnp.arange(NC, dtype=jnp.int32)[:, None, None]
        le = (cum[None, :, :] <= j).astype(jnp.int32)
        b = jnp.clip(jnp.sum(le, axis=1), 0, D - 1)
        if n == 3:
            return b.sum(axis=0)
        donehot = (b[:, None, :] ==
                   jnp.arange(D, dtype=jnp.int32)[None, :, None])
        cum0 = jnp.concatenate([jnp.zeros((1, B), jnp.int32), cum[:-1]],
                               axis=0)
        prev = jnp.sum(jnp.where(donehot, cum0[None], 0), axis=1)
        lo_b = jnp.sum(jnp.where(donehot, lo_d[None], 0), axis=1)
        jq = jnp.arange(NC, dtype=jnp.int32)[:, None]
        rank = jq - prev
        sa_idx = lo_b + rank
        slot_ok = jq < jnp.minimum(total, NC)[None, :]
        w_d = b % W
        strand = b // W
        off_b = jnp.sum(jnp.where(
            w_d[:, None, :] == jnp.arange(W, dtype=jnp.int32)[None, :, None],
            jnp.asarray(np.asarray(offsets, np.int32))[None, :, None], 0),
            axis=1)
        sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
        pos = sa_pos - off_b
        valid = slot_ok & (pos >= 0) & (pos + L <= G)
        if n == 4:
            return (pos * valid).sum(axis=0)
        lid = jnp.where(valid, pos * 2 + strand, IMAX)
        eq = (lid[:, None, :] == lid[None, :, :]) & valid[None, :, :]
        tri = np.tril(np.ones((NC, NC), dtype=bool), -1)
        dup = jnp.any(eq & jnp.asarray(tri)[:, :, None], axis=1)
        keep = valid & ~dup
        n_uniq = jnp.sum(keep, axis=0, dtype=jnp.int32)
        if n == 5:
            return n_uniq
        kcum = jnp.cumsum(keep.astype(jnp.int32), axis=0)
        j2 = jnp.arange(NS, dtype=jnp.int32)[:, None, None]
        src = jnp.clip(jnp.sum((kcum[None, :, :] <= j2).astype(jnp.int32),
                               axis=1), 0, NC - 1)
        shot = (src[:, None, :] ==
                jnp.arange(NC, dtype=jnp.int32)[None, :, None])
        pos2 = jnp.sum(jnp.where(shot, pos[None], 0), axis=1)
        str2 = jnp.sum(jnp.where(shot, strand[None], 0), axis=1)
        ok2 = (jnp.arange(NS, dtype=jnp.int32)[:, None]
               < jnp.minimum(n_uniq, NS)[None, :])
        if n == 6:
            return (pos2 * ok2).sum(axis=0)
        posc = jnp.where(ok2, pos2, 0)
        w0 = jnp.clip(posc >> 4, 0, Gv - 1)
        rows = gview[w0]
        rows = jnp.transpose(rows, (0, 2, 1))
        if n == 7:
            return rows.astype(jnp.int32).sum(axis=(0, 1))
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
        rpack, rbad = F3.pack_reads_t(seqs, nw)
        st = str2[:, None, :]
        rp = jnp.where(st == 0, rpack[0][None], rpack[1][None])
        rb = jnp.where(st == 0, rbad[0][None], rbad[1][None])
        x = ga ^ rp
        mism = (x | (x >> 1)) & jnp.uint32(0x55555555)
        badb = (gba | rb) & jnp.uint32(0x55555555)
        tmask = jnp.asarray(F2._tail_mask(L, nw))[None, :, None]
        bits = (mism | badb) & tmask
        mm = jnp.sum(jax.lax.population_count(bits), axis=1,
                     dtype=jnp.int32)
        if n == 8:
            return mm.sum(axis=0)
        return mm.sum(axis=0)

    return f


print(f"devices: {jax.devices()}", flush=True)
import time
for n in range(9):
    try:
        t0 = time.time()
        out = stage(n)(reads_d)
        s = float(jnp.sum(out))
        print(f"stage {n}: OK sum={s:.0f} ({time.time()-t0:.1f}s)",
              flush=True)
    except Exception as e:
        print(f"stage {n}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        break
