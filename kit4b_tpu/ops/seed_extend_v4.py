"""Round-3 kalign hot path v4: packed-native, zero-unpack seed-extend.

Produces results BIT-IDENTICAL to seed_extend_v3.fast_pass_packed_v3 (same
seeds, dedup, extension bits, classification) but never materialises
per-base byte tensors on device. Profiling on the chip
(tools/profile_v3_stages.py) showed v3's stage 1 at ~39 ms of the 76 ms
pass, ~27 ms of it the 2-bit -> byte unpack interleave alone. v4 works on
16-base uint32 words end to end:

  *  reads stay 2-bit packed from the host link: 4 bytes combine into one
     uint32 word, [nw, B] lane-major (vs [S, L, B] = 16x the elements)
  *  reverse-complement = bitwise NOT + word-order reversal + in-word
     2-bit-group reversal + one funnel shift (complement of base b is 3-b
     = ~b mod 4, so ~word complements all 16 bases at once)
  *  seed keys extract as 24-bit windows via STATIC word picks + funnel
     shifts; the LUT's big-endian (lexicographic) key = 2-bit-group
     reversal of the little-endian extraction, keeping the key-range
     sharded LUT layout (P3) unchanged
  *  N handling rides the sparse nlist as word bitmaps; key validity is
     "window's bad bits == 0", identical to v3's per-base seqs < 4 test
  *  extension reuses v3's [Gv, 2*nw2] uint32 genome row view

Reference parity anchors unchanged: CSfxArray::LocateCoreMultiples
(libkit4b/SfxArray.cpp:5806), CKAligner::AlignRead
(ngskit4b/KAligner.cpp:9583), MaxIter ladder (ngskit4b/KAligner.h:53-56).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .seed_extend_fast import _tail_mask, _window_masks
from .seed_extend_v3 import INT32_MAX, MISM_BITS, _classify_compact, \
    pack_result2

M2 = np.uint32(0x33333333)
M4 = np.uint32(0x0F0F0F0F)
M8 = np.uint32(0x00FF00FF)


def _bitrev2(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the 16 2-bit groups of each uint32."""
    x = (x >> 16) | (x << 16)
    x = ((x >> 8) & M8) | ((x & M8) << 8)
    x = ((x >> 4) & M4) | ((x & M4) << 4)
    return ((x >> 2) & M2) | ((x & M2) << 2)


def words_from_2bit(reads2b: jnp.ndarray, nlist: jnp.ndarray,
                    read_len: int):
    """[B, ceil(L/4)] packed bytes + sparse N list -> lane-major word
    planes: (rw, rb, rcw, rcb) each [nw, B] uint32 where rw/rb are the
    forward packed/bad words and rcw/rcb the reverse complement's.

    Matches seed_extend_v3.pack_reads_t on the unpacked codes bit for bit
    in every position the tail/bad masks expose (N positions differ in
    the don't-care packed bits only)."""
    B, L4 = reads2b.shape
    L = read_len
    nw = (L + 15) // 16
    ext = jnp.zeros((B, 4 * nw), jnp.uint8).at[:, :L4].set(reads2b)
    e = ext.reshape(B, nw, 4).astype(jnp.uint32)
    w = (e[..., 0] | (e[..., 1] << 8) | (e[..., 2] << 16)
         | (e[..., 3] << 24))                               # [B, nw]
    # zero the 2-bit slots of tail bases AND N positions so forward words
    # equal v3's pack of codes (N -> 0 via &3 there; tail -> 0)
    tail = jnp.asarray(_tail_mask(L, nw) | (_tail_mask(L, nw) << 1))
    w = w & tail[None, :]
    bad = jnp.zeros((B, nw), jnp.uint32)
    bit = jnp.uint32(1) << (2 * (nlist[:, 1] & 15)).astype(jnp.uint32)
    bad = bad.at[nlist[:, 0], nlist[:, 1] >> 4].add(bit, mode="drop")
    # N bases packed as code&3: already 0 in reads2b? pack2bit stores
    # codes&3, N(4)&3 = 0 — nothing to clear.
    rw = w.T                                                 # [nw, B]
    rb = bad.T

    # reverse complement: ~w complements every base; word-order reversal +
    # in-word 2-bit reversal reverses base order over the padded 16*nw
    # span; one funnel shift drops the 16*nw - L pad bases from the front.
    frw = _bitrev2(~w & tail[None, :])[:, ::-1].T            # [nw, B]
    frb = _bitrev2(bad)[:, ::-1].T
    sh = np.uint32(2 * (16 * nw - L))
    if sh:
        z = jnp.zeros((1, B), jnp.uint32)
        fw2 = jnp.concatenate([frw, z], axis=0)
        fb2 = jnp.concatenate([frb, z], axis=0)
        rcw = (fw2[:-1] >> sh) | (fw2[1:] << np.uint32(32 - sh))
        rcb = (fb2[:-1] >> sh) | (fb2[1:] << np.uint32(32 - sh))
    else:
        rcw, rcb = frw, frb
    # clear rc tail slots so rc words equal v3's zero-padded pack
    rcw = rcw & tail[:, None]
    rcb = rcb & tail[:, None]
    return rw, rb, rcw, rcb


planes_2bit = functools.partial(
    jax.jit, static_argnames=("read_len",))(
        lambda reads2b, nlist, read_len: words_from_2bit(
            reads2b, nlist, read_len))
planes_2bit.__doc__ = ("jitted words_from_2bit: 2-bit packed reads -> "
                       "(rw, rb, rcw, rcb) [nw, B] device planes, "
                       "computed once per batch and shared by every "
                       "escalation kernel of a superbatch group")


def _extract24(words: jnp.ndarray, off: int, k: int) -> jnp.ndarray:
    """Static-offset 2k-bit window from lane-major word planes [nw, B]:
    returns the k bases starting at read position `off`, first base in
    the LOW bits (little-endian)."""
    bo = 2 * off
    j0 = bo // 32
    ws = np.uint32(bo % 32)
    nw = words.shape[0]
    lo = words[j0] >> ws if ws else words[j0]
    need_hi = (bo % 32) + 2 * k > 32
    if need_hi and j0 + 1 < nw:
        lo = lo | (words[j0 + 1] << np.uint32(32 - int(ws)))
    return lo & jnp.uint32((1 << (2 * k)) - 1)


def _keys_be(words: jnp.ndarray, bads: jnp.ndarray, offsets: tuple,
             k: int):
    """Seed keys per offset: big-endian (lexicographic) LUT keys + window
    validity, both [W, B] from lane-major word planes."""
    keys, oks = [], []
    for off in offsets:
        le = _extract24(words, off, k)
        be = _bitrev2(le) >> np.uint32(32 - 2 * k)
        keys.append(be.astype(jnp.int32))
        oks.append(_extract24(bads, off, k) == 0)
    return jnp.stack(keys, axis=0), jnp.stack(oks, axis=0)


def _cands_core_v4(gview, sa, lut2, key_lo, planes, *, genome_len,
                   offsets, lut_k, read_len, n_compact, n_extend=None,
                   max_per_bucket=None, gview_base=None):
    """Seed + compact + locus-dedup + extend from packed word planes.
    planes = (rw, rb, rcw, rcb) from words_from_2bit. Returns (ids, mm,
    overflow) with seed_extend_v3._cands_core's exact contract.

    gview_base: GLOBAL genome position of gview row 0 (must be a multiple
    of 16) for position-sharded genomes (parallel/mesh.py P3 completion):
    sa entries stay global, extension row indices rebase locally."""
    rw, rb, rcw, rcb = planes
    nw, B = rw.shape
    L = read_len
    G = genome_len
    M = sa.shape[0]
    NC = n_compact
    NS = n_extend or NC
    W = len(offsets)
    k = lut_k
    nw2 = nw + 1
    n_keys = lut2.shape[0]
    Gv = gview.shape[0]
    S = 2
    D = S * W

    kf, okf = _keys_be(rw, rb, offsets, k)                  # [W, B]
    kr, okr = _keys_be(rcw, rcb, offsets, k)
    keys = jnp.stack([kf, kr], axis=0)                      # [S, W, B]
    key_ok = jnp.stack([okf, okr], axis=0)

    local = keys - key_lo.astype(jnp.int32)
    in_shard = (local >= 0) & (local < n_keys)
    local = jnp.clip(local, 0, n_keys - 1)
    pair = lut2[local]                                      # [S, W, B, 2]
    lo = pair[..., 0]
    cnt = jnp.where(key_ok & in_shard, pair[..., 1], 0)
    if max_per_bucket is not None:
        cnt = jnp.minimum(cnt, max_per_bucket)
    lo_d = lo.reshape(D, B)
    cnt_d = cnt.reshape(D, B)

    # --- compaction (identical to v3) --------------------------------------
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

    # --- locus dedup + recompaction (identical to v3) ----------------------
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

    # --- extension: one row-gather per distinct locus (v3 gview) ------------
    posc = jnp.where(ok2, pos2, 0)
    if gview_base is not None:
        w0 = jnp.clip((posc - gview_base) >> 4, 0, Gv - 1)
    else:
        w0 = jnp.clip(posc >> 4, 0, Gv - 1)
    rows = gview[w0]                                        # [NS, B, 2*nw2]
    rows = jnp.transpose(rows, (0, 2, 1))                   # [NS, 2*nw2, B]
    gw = rows[:, :nw2]
    gb = rows[:, nw2:]
    sh = (2 * (posc & 15)).astype(jnp.uint32)[:, None, :]
    hi_sh = jnp.uint32(32) - sh

    def shift_align(words):
        lo_w = words[:, :nw] >> sh
        hi_w = jnp.where(sh == 0, jnp.uint32(0), words[:, 1:] << hi_sh)
        return lo_w | hi_w

    ga = shift_align(gw)                                    # [NS, nw, B]
    gba = shift_align(gb)
    st = str2[:, None, :]
    rp = jnp.where(st == 0, rw[None], rcw[None])            # [NS, nw, B]
    rbad = jnp.where(st == 0, rb[None], rcb[None])
    x = ga ^ rp
    mism = (x | (x >> 1)) & MISM_BITS
    badb = (gba | rbad) & MISM_BITS
    tmask = jnp.asarray(_tail_mask(L, nw))[None, :, None]
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=1, dtype=jnp.int32)

    # --- first-exact-window canonicalisation (identical to v3) -------------
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
    return ids, mm, overflow


@functools.partial(
    jax.jit, static_argnames=("genome_len", "offsets", "lut_k",
                              "n_compact", "n_extend", "max_tot_mm",
                              "mm_delta", "max_per_bucket", "read_len",
                              "tier2"))
def fast_pass_packed_v4(gview, sa, lut2, reads2b, nlist, *, genome_len,
                        offsets, lut_k, n_compact, max_tot_mm, mm_delta,
                        read_len, n_extend=None, max_per_bucket=None,
                        tier2=(128, 192, 96)):
    """Drop-in replacement for seed_extend_v3.fast_pass_packed_v3 with the
    packed-native pipeline: 2-bit reads in, [B, 2] int32 out
    (pack_result2), including the on-device tier-2 escalation."""
    B = reads2b.shape[0]
    planes = words_from_2bit(reads2b, nlist, read_len)
    kw = dict(genome_len=genome_len, offsets=offsets, lut_k=lut_k,
              read_len=read_len, max_per_bucket=max_per_bucket)
    ids, mm, overflow = _cands_core_v4(gview, sa, lut2, jnp.int32(0),
                                       planes, n_compact=n_compact,
                                       n_extend=n_extend, **kw)
    code, low, n_low = _classify_compact(ids, mm, overflow,
                                         max_tot_mm=max_tot_mm,
                                         mm_delta=mm_delta)
    if tier2 is not None:
        E, NC2, NS2 = tier2
        esc = code == -3
        n_esc = jnp.sum(esc, axis=0, dtype=jnp.int32)
        ecum = jnp.cumsum(esc.astype(jnp.int32))
        ridx = jnp.sum((ecum[None, :] <=
                        jnp.arange(E, dtype=jnp.int32)[:, None])
                       .astype(jnp.int32), axis=1)
        ridx = jnp.clip(ridx, 0, B - 1)
        egood = jnp.arange(E, dtype=jnp.int32) < jnp.minimum(n_esc, E)
        eplanes = tuple(p[:, ridx] for p in planes)         # [nw, E]
        ids2, mm2, ovf2 = _cands_core_v4(gview, sa, lut2, jnp.int32(0),
                                         eplanes, n_compact=NC2,
                                         n_extend=NS2, **kw)
        code2, low2, nlow2 = _classify_compact(ids2, mm2, ovf2,
                                               max_tot_mm=max_tot_mm,
                                               mm_delta=mm_delta)
        tgt = jnp.where(egood, ridx, jnp.int32(2 ** 30))
        code = code.at[tgt].set(code2, mode="drop")
        low = low.at[tgt].set(low2, mode="drop")
    return pack_result2(code, low)
