"""Stage-level timing of the v3 fast pass on the real chip.

Duplicates ops/seed_extend_v3._cands_core with a stage cutoff so each
pipeline stage compiles standalone; every variant reduces its live
tensors to one scalar (jnp.sum) so XLA cannot dead-code the stage, and
timing fetches that scalar (axon is async: only device_get synchronises).

Stages:
  1 unpack + strand stack + seed keys + LUT pair gather
  2 + cumsum slot->bucket compaction (the [NC, D, B] one-hot block)
  3 + locus dedup ([NC, NC, B]) + recompaction to NS slots
  4 + genome row-gather + funnel shift + XOR/popcount extension
  5 + first-exact-window canonicalisation + classification (full pass)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from kit4b_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from kit4b_tpu import dna  # noqa: E402
from kit4b_tpu.align import kalign  # noqa: E402
from kit4b_tpu.index.sfx_index import SfxIndex  # noqa: E402
from kit4b_tpu.io.fasta import Genome  # noqa: E402
from kit4b_tpu.ops import seed_extend_v3 as v3  # noqa: E402
from kit4b_tpu.ops.seed_extend_fast import (_tail_mask,  # noqa: E402
                                            _window_masks)
from kit4b_tpu.sim import simreads  # noqa: E402

INT32_MAX = v3.INT32_MAX
MISM_BITS = v3.MISM_BITS


@functools.partial(jax.jit, static_argnames=(
    "genome_len", "offsets", "lut_k", "n_compact", "n_extend",
    "read_len", "stage", "max_tot_mm", "mm_delta"))
def staged(gview, sa, lut2, reads2b, nlist, *, genome_len, offsets, lut_k,
           n_compact, n_extend, read_len, stage, max_tot_mm, mm_delta):
    reads = v3.unpack_reads_2bit(reads2b, nlist, read_len)
    seqs = v3.build_seqs(reads)
    S, L, B = seqs.shape
    G = genome_len
    M = sa.shape[0]
    NC = n_compact
    NS = n_extend or NC
    W = len(offsets)
    k = lut_k
    nw = (L + 15) // 16
    nw2 = nw + 1
    n_keys = lut2.shape[0]
    Gv = gview.shape[0]
    D = S * W

    dig = jnp.where(seqs < 4, seqs, 0).astype(jnp.int32)
    keys, key_ok = [], []
    for off in offsets:
        acc = jnp.zeros((S, B), dtype=jnp.int32)
        ok = jnp.ones((S, B), dtype=bool)
        for t in range(k):
            acc = acc * 4 + dig[:, off + t, :]
            ok = ok & (seqs[:, off + t, :] < 4)
        keys.append(acc)
        key_ok.append(ok)
    keys = jnp.stack(keys, axis=1)
    key_ok = jnp.stack(key_ok, axis=1)
    local = jnp.clip(keys, 0, n_keys - 1)
    pair = lut2[local]
    lo = pair[..., 0]
    cnt = jnp.where(key_ok, pair[..., 1], 0)
    lo_d = lo.reshape(D, B)
    cnt_d = cnt.reshape(D, B)
    if stage == 1:
        return jnp.sum(lo_d) + jnp.sum(cnt_d)

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
    sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
    pos = sa_pos - off_b
    valid = slot_ok & (pos >= 0) & (pos + L <= G)
    if stage == 2:
        return jnp.sum(pos) + jnp.sum(valid)

    lid = jnp.where(valid, pos * 2 + strand, INT32_MAX)
    eq = (lid[:, None, :] == lid[None, :, :]) & valid[None, :, :]
    tri = np.tril(np.ones((NC, NC), dtype=bool), -1)
    dup = jnp.any(eq & jnp.asarray(tri)[:, :, None], axis=1)
    keep = valid & ~dup
    n_uniq = jnp.sum(keep, axis=0, dtype=jnp.int32)
    overflow = overflow | (n_uniq > NS)
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
    if stage == 3:
        return jnp.sum(pos2) + jnp.sum(str2) + jnp.sum(ok2)

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
    rpack, rbad = v3.pack_reads_t(seqs, nw)
    st = str2[:, None, :]
    rp = jnp.where(st == 0, rpack[0][None], rpack[1][None])
    rb = jnp.where(st == 0, rbad[0][None], rbad[1][None])
    x = ga ^ rp
    mism = (x | (x >> 1)) & MISM_BITS
    badb = (gba | rb) & MISM_BITS
    tmask = jnp.asarray(_tail_mask(L, nw))[None, :, None]
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=1, dtype=jnp.int32)
    if stage == 4:
        return jnp.sum(mm)

    wmask = _window_masks(offsets, k, nw)
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
    ids = jnp.where(canonical, pos2 * 2 + str2, INT32_MAX)
    mm = jnp.where(canonical, mm, INT32_MAX)
    code, low, n_low = v3._classify_compact(ids, mm, overflow,
                                            max_tot_mm=max_tot_mm,
                                            mm_delta=mm_delta)
    return jnp.sum(v3.pack_result_word(code, low, n_low))


def main():
    GEN, NR, RL, B = 4_600_000, 100_000, 100, 98304
    rng = np.random.default_rng(12345)
    seq = np.concatenate([rng.integers(0, 4, GEN).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["e"], np.array([0]), np.array([GEN]), seq)
    idx = SfxIndex.build(g)
    recs = simreads.sim_reads(
        g, simreads.SimParams(n_reads=NR, read_len=RL, seed=7,
                              error_mode="illumina", subs_rate=0.02))
    reads = np.stack([r.codes for r in recs])[:B]
    al = kalign.KAligner(idx, batch_size=B)
    gview, sa, lut, lut2 = al._device_for(RL)
    _, max_tot_mm = al.schedule_for(RL)
    offs = al._offsets_for(RL, max_tot_mm)
    reads2b, nlist, _ = kalign.pack_reads_2bit(reads)
    r2b = jnp.asarray(reads2b)
    nl = jnp.asarray(nlist)
    jax.device_get(r2b[0, :1])  # session warm

    kw = dict(genome_len=len(seq), offsets=offs, lut_k=idx.lut_k,
              n_compact=al.n_compact, n_extend=al.n_extend or al.n_compact,
              read_len=RL, max_tot_mm=max_tot_mm, mm_delta=al.mm_delta)
    prev = 0.0
    for stage in (1, 2, 3, 4, 5):
        out = staged(gview, sa, lut2, r2b, nl, stage=stage, **kw)
        jax.device_get(out)  # compile+run once
        ts = []
        for _ in range(8):
            t0 = time.time()
            jax.device_get(staged(gview, sa, lut2, r2b, nl, stage=stage,
                                  **kw))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"stage {stage}: {med*1000:7.1f} ms  "
              f"(delta {1000*(med-prev):+7.1f} ms)", flush=True)
        prev = med


if __name__ == "__main__":
    main()
