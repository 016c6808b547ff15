"""Deep capped candidate exploration — the repeat-dense escalation tier.

Reads whose seed buckets hold thousands of entries (Alu/satellite genomes,
BASELINE config #4) cannot run the [NC, NC, B] dedup machinery of
seed_extend_v3/v4 at the capacities they need: the quadratic dedup matrix
alone would be gigabytes at NC ~ 2048. This kernel explores a large capped
candidate budget with BOUNDED memory by scanning fixed-size rank blocks
with jax.lax.fori_loop: per block it compacts NCb candidate slots, gathers
their genome rows, scores mismatches, canonicalises, and merges
(low/n_low/nxt + top-max_ml hits) into a running carry. No pre-extension
dedup is needed — first-exact-window canonicalisation alone guarantees
exactly-once locus emission (seed_extend_fast module docstring).

Reference parity:
  * per-bucket cap = budget / n_buckets — the MaxIter truncation ladder
    (ngskit4b/KAligner.h:53-56), identical to the round-3 host final tier;
  * buckets with cnt > skip_bucket are SKIPPED ENTIRELY, exactly as
    LocateCoreMultiples skips a core whose exact-match count reaches
    MaxIter ("hopefully there will be a manageable number of matches on
    the next core", libkit4b/SfxArray.cpp:6592) and as the over-occurring
    K-mer classifier pre-skips cores (SfxArray.cpp:5961 OverOccKMerClas);
  * the pass is TOTAL: capped totals can never overflow, so nothing
    escalates past it — it is the ladder's floor.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .seed_extend_fast import INT32_MAX, MISM_BITS, _tail_mask, \
    _window_masks
from .seed_extend_v4 import _keys_be, words_from_2bit

# reference default MaxIter at standard sensitivity (KAligner.h:53-56):
# cores with more exact matches than this are skipped, not explored
DFLT_SKIP_BUCKET = 5000


def deep_stats_planes(gview, sa, lut2, planes, *, genome_len: int,
                      offsets: tuple, lut_k: int, read_len: int,
                      n_blocks: int, block_size: int, max_ml: int,
                      skip_bucket: int = DFLT_SKIP_BUCKET,
                      n_sel: int | None = None):
    """Capped deep exploration of one mate's candidates from packed word
    planes ([nw, E] lane-major). Returns the finalize_fast stats dict
    (low_mm/n_low/nxt_mm [E], hit_id/hit_mm [E, max_ml]) — complete under
    the cap semantics, never overflowing."""
    from .seed_extend_fast import finalize_fast
    ids, mm = deep_cands_planes(
        gview, sa, lut2, planes, genome_len=genome_len, offsets=offsets,
        lut_k=lut_k, read_len=read_len, n_blocks=n_blocks,
        block_size=block_size, skip_bucket=skip_bucket, n_sel=n_sel)
    return finalize_fast(ids.T, mm.T, max_ml=max_ml)


def deep_cands_planes(gview, sa, lut2, planes, *, genome_len: int,
                      offsets: tuple, lut_k: int, read_len: int,
                      n_blocks: int, block_size: int,
                      skip_bucket: int = DFLT_SKIP_BUCKET,
                      n_sel: int | None = None, key_lo=None,
                      gview_base=None):
    """Candidate core of the deep pass: (ids, mm) [C, E] with INT32_MAX
    invalid, exactly-once per locus under explored-window
    canonicalisation. key_lo/gview_base support key-range and
    position-range sharding (parallel/mesh.py): sharded callers
    all_gather the raw candidates and finalize across shards.

    Round-5 restructure: ONE flat [C, E] pass (C = n_blocks*block_size)
    instead of fori_loop rank blocks — the block formulation paid a
    two-key [E, ML+NCb] sort-merge per block, flat pays one finalize
    sort. Chip measurement showed the pass is bound by PER-INDEX gather
    cost (sa gather 57 ms + row gather 87 ms for 2.1M candidate indices
    at E=4096/C=512; sorts 24 ms), so the budget knob that matters is
    the number of candidates, not how they are blocked.

    n_sel (rarest-K selection): explore only the K least-populated seed
    buckets per read — per-bucket cap rises to C//K, and the rarest
    buckets give the highest probability that the true locus sits below
    the cap (the standard rarest-seed heuristic; the reference's
    MaxIter skip is the degenerate form of it, SfxArray.cpp:6592).
    Canonicalisation is gated to EXPLORED windows: a candidate is kept
    iff its discovery window is the first exact window among the
    explored set, preserving exactly-once emission under subsetting."""
    rw, rb, rcw, rcb = planes
    nw, E = rw.shape
    L = read_len
    G = genome_len
    W = len(offsets)
    k = lut_k
    nw2 = nw + 1
    n_keys = lut2.shape[0]
    Gv = gview.shape[0]
    D = 2 * W
    C = n_blocks * block_size         # flat candidate budget
    K = n_sel if n_sel is not None else D
    cap = max(1, C // K)              # per explored bucket

    kf, okf = _keys_be(rw, rb, offsets, k)
    kr, okr = _keys_be(rcw, rcb, offsets, k)
    keys = jnp.stack([kf, kr], axis=0)                      # [S, W, E]
    key_ok = jnp.stack([okf, okr], axis=0)
    if key_lo is not None:
        keys = keys - key_lo.astype(jnp.int32)
        key_ok = key_ok & (keys >= 0) & (keys < n_keys)
    local = jnp.clip(keys, 0, n_keys - 1)
    pair = lut2[local]
    lo = pair[..., 0]
    cnt = jnp.where(key_ok, pair[..., 1], 0)
    cnt = jnp.where(cnt > skip_bucket, 0, cnt)   # reference MaxIter skip
    lo_d = lo.reshape(D, E)
    cnt_d = cnt.reshape(D, E)
    if K < D:
        # rarest-K: keep the K smallest non-empty buckets per read
        BIG = jnp.int32(2 ** 30)
        cwork = jnp.where(cnt_d > 0, cnt_d, BIG)
        explored = jnp.zeros((D, E), bool)
        for _ in range(K):
            m = jnp.min(cwork, axis=0)
            pick = (cwork == m[None]) & (m[None] < BIG)
            first = (jnp.cumsum(pick.astype(jnp.int32), axis=0) == 1) \
                & pick
            explored = explored | first
            cwork = jnp.where(first, BIG, cwork)
        cnt_d = jnp.where(explored, cnt_d, 0)
    else:
        explored = cnt_d > 0
    cnt_d = jnp.minimum(cnt_d, cap)
    cum = jnp.cumsum(cnt_d, axis=0)                         # [D, E]
    cum0 = jnp.concatenate([jnp.zeros((1, E), jnp.int32), cum[:-1]], axis=0)
    total = cum[-1]                                         # <= C

    off_arr = jnp.asarray(np.asarray(offsets, np.int32))
    tmask = jnp.asarray(_tail_mask(L, nw))[None, :, None]
    wmask = _window_masks(offsets, k, nw)                   # np [W, nw]
    M = sa.shape[0]

    # rank -> owning bucket: #{d: cum[d] <= rank} via the one-hot le
    # matrix (a vmapped searchsorted measured 131 ms here; this is ~free)
    ranks = jnp.arange(C, dtype=jnp.int32)
    le = (cum[None, :, :] <= ranks[:, None, None]).astype(jnp.int32)
    b = jnp.clip(jnp.sum(le, axis=1), 0, D - 1)             # [C, E]
    prev = jnp.take_along_axis(cum0, b, axis=0)
    lo_b = jnp.take_along_axis(lo_d, b, axis=0)
    sa_idx = lo_b + (ranks[:, None] - prev)
    slot_ok = ranks[:, None] < total[None, :]
    w_d = b % W
    strand = b // W
    off_b = off_arr[w_d]
    sa_pos = sa[jnp.clip(sa_idx, 0, M - 1)].astype(jnp.int32)
    pos = sa_pos - off_b
    valid = slot_ok & (pos >= 0) & (pos + L <= G)

    posc = jnp.where(valid, pos, 0)
    if gview_base is not None:
        w0 = jnp.clip((posc - gview_base) >> 4, 0, Gv - 1)
    else:
        w0 = jnp.clip(posc >> 4, 0, Gv - 1)
    rows = gview[w0]                                        # [C, E, 2nw2]
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
    st = strand[:, None, :]
    rp = jnp.where(st == 0, rw[None], rcw[None])
    rbad = jnp.where(st == 0, rb[None], rcb[None])
    x = ga ^ rp
    mism = (x | (x >> 1)) & MISM_BITS
    badb = (gba | rbad) & MISM_BITS
    bits = (mism | badb) & tmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=1,
                 dtype=jnp.int32)

    # first-exact-window canonicalisation over the EXPLORED windows of
    # the candidate's strand
    exp_s = explored.reshape(2, W, E)
    fw = jnp.full((C, E), W, dtype=jnp.int32)
    any_exact = jnp.zeros((C, E), dtype=bool)
    for w in range(W - 1, -1, -1):
        ne = jnp.zeros((C, E), dtype=bool)
        for wi in range(nw):
            if wmask[w, wi]:
                ne = ne | ((bits[:, wi] & jnp.uint32(wmask[w, wi])) != 0)
        expw = jnp.where(strand == 0, exp_s[0, w][None, :],
                         exp_s[1, w][None, :])
        ex = ~ne & expw
        fw = jnp.where(ex, w, fw)
        any_exact = any_exact | ex
    canonical = valid & any_exact & (fw == w_d)
    ids = jnp.where(canonical, pos * 2 + strand, INT32_MAX)
    mm = jnp.where(canonical, mm, INT32_MAX)
    return ids, mm


@functools.partial(
    jax.jit, static_argnames=("genome_len", "offsets", "lut_k", "read_len",
                              "n_blocks", "block_size", "max_ml",
                              "skip_bucket", "max_tot", "mm_delta",
                              "min_ins", "max_ins", "deep1", "deep2",
                              "n_compact", "n_extend", "n_sel"))
def deep_pe_pass_planes(gview, sa, lut2, starts, planes1, planes2, idxs,
                        *, genome_len: int, offsets: tuple, lut_k: int,
                        read_len: int, n_blocks: int, block_size: int,
                        max_ml: int, max_tot: int, mm_delta: int,
                        min_ins: int, max_ins: int,
                        skip_bucket: int = DFLT_SKIP_BUCKET,
                        deep1: bool = True, deep2: bool = True,
                        n_compact: int = 24, n_extend: int = 12,
                        n_sel: int | None = None):
    """Deep capped PE pass over the pair subset idxs [E] (device-side
    gather from group-resident word planes — planes1/planes2 are the
    (rw, rb, rcw, rcb) [nw, N] tuples from words_from_2bit, shared by
    every escalation call of a superbatch group): deep exploration for
    the OVERFLOWED mate(s) + AcceptProvPE pairing -> [E, 6] pack_rows6
    wire words (cols 0-9 align/pe.py pe_pass layout, cols 10/11
    per-mate overflow bits after pe_packed.unpack_rows12). TOTAL: rows
    never come back PAIR_OVERFLOW.

    deep1/deep2 select which mate takes the deep exploration; a mate
    whose tier-1 compaction did NOT overflow is re-scored with the cheap
    tier-1 core (n_compact candidates) instead — the host groups
    escalated pairs by their per-mate overflow bits, so most pairs pay
    one deep mate, not two."""
    from .pe_packed import _pair_rows
    kw = dict(genome_len=genome_len, offsets=offsets, lut_k=lut_k,
              read_len=read_len, n_blocks=n_blocks, block_size=block_size,
              max_ml=max_ml, skip_bucket=skip_bucket, n_sel=n_sel)
    no_ovf = jnp.zeros(idxs.shape[0], bool)

    def mate_stats(planes_full, deep):
        planes = tuple(p[:, idxs] for p in planes_full)
        if deep:
            return deep_stats_planes(gview, sa, lut2, planes, **kw), no_ovf
        from .seed_extend_fast import finalize_fast
        from .seed_extend_v4 import _cands_core_v4
        ids, mm, ovf = _cands_core_v4(
            gview, sa, lut2, jnp.int32(0), planes, genome_len=genome_len,
            offsets=offsets, lut_k=lut_k, read_len=read_len,
            n_compact=n_compact, n_extend=n_extend)
        return finalize_fast(ids.T, mm.T, max_ml=max_ml), ovf

    f1, o1 = mate_stats(planes1, deep1)
    f2, o2 = mate_stats(planes2, deep2)
    from .pe_packed import pack_rows6
    rows = _pair_rows(f1, f2, o1, o2, starts, L1=read_len, L2=read_len,
                      max_tot=max_tot, mm_delta=mm_delta, min_ins=min_ins,
                      max_ins=max_ins)
    return pack_rows6(rows) if max_ins <= 65535 else rows
