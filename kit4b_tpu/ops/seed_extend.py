"""Batched seed-and-extend alignment pass — the device hot path of kalign.

Replaces the reference's per-read, per-core-window suffix-array walk
(libkit4b/SfxArray.cpp:5806 LocateCoreMultiples + :7938 LocateFirstExact):

  reference (scalar CPU)                 this module (vector TPU)
  -------------------------------------  -----------------------------------
  binary search per core window          direct-addressed k-mer LUT gather
  iterate <=MaxIter SA entries per core  fixed C candidates per core (masked)
  per-candidate left/right byte extend   one [B, nCand, L] gather + popcount
  tsIdentNode hash dedup of loci         per-read sort + adjacent-equal mask
  best/next-best MM bookkeeping          masked min / count / second-min

Split into two stages so the multi-chip path can interleave a collective:

  gather_score_candidates : seed lookup + extension scoring (local SA shard)
  finalize_candidates     : dedup + best/next-best/top-k (after all-gather)

A "pass" evaluates every read in the batch against all core windows of one
pigeonhole stage (SURVEY.md §3.2); the host compacts unresolved reads between
passes. Everything here is static-shaped and jit-compiled once per
(read_len, n_windows, C) combination.

Index sharding (SURVEY.md §2.5 P3): the k-mer LUT is range-partitioned by key;
a shard holding keys [key_lo, key_lo + lut_len - 1) resolves only seeds in its
range (others contribute zero candidates). Shards' candidate sets are disjoint
per bucket and their union equals the single-chip candidate set, so the merged
result is exactly the single-device result.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


def revcomp_device(reads: jnp.ndarray) -> jnp.ndarray:
    """Reverse-complement uint8 code reads on device (N and sentinels fixed)."""
    comp = jnp.where(reads < 4, 3 - reads, reads)
    return comp[..., ::-1]


def gather_score_candidates(genome: jnp.ndarray,   # [G] uint8 codes
                            sa: jnp.ndarray,       # [M] int32 suffix positions
                            lut: jnp.ndarray,      # [lut_len] bucket starts
                            key_lo: jnp.ndarray,   # scalar: first key this lut covers
                            reads: jnp.ndarray,    # [B, L] uint8 codes
                            *,
                            offsets: tuple,
                            lut_k: int,
                            cand_per_window: int):
    """Seed lookup + extension scoring. Returns (cand_id, mm), both
    [B, 2*W*C] int32; cand_id = pos*2 + strand, INT32_MAX for invalid.
    Candidates are deduped (within this shard) but unsorted across shards."""
    B, L = reads.shape
    G = genome.shape[0]
    M = sa.shape[0]
    C = cand_per_window
    W = len(offsets)
    k = lut_k
    n_keys = lut.shape[0] - 1  # keys covered by this (possibly sharded) LUT

    seqs = jnp.stack([reads, revcomp_device(reads)], axis=1)  # [B, 2, L]

    # --- seed lookup: k-mer keys per (strand, window) -> SA bucket ranges ---
    # one gather [B,2,W,k] + a power-of-4 contraction (vectorized; avoids an
    # unrolled W*k loop that bloats HLO and compile time)
    offs = (jnp.asarray(offsets, jnp.int32)[:, None]
            + jnp.arange(k, dtype=jnp.int32)[None, :])          # [W, k]
    bases = seqs[:, :, offs]                                     # [B,2,W,k]
    pow4 = (jnp.uint32(1) << (2 * jnp.arange(k - 1, -1, -1,
                                             dtype=jnp.uint32))).astype(
                                                 jnp.int32)      # 4^(k-1-j)
    keys = jnp.sum(jnp.where(bases < 4, bases, 0).astype(jnp.int32)
                   * pow4, axis=-1, dtype=jnp.int32)             # [B,2,W]
    key_ok = jnp.all(bases < 4, axis=-1)

    local = keys - key_lo.astype(jnp.int32)
    in_shard = (local >= 0) & (local < n_keys)
    local = jnp.clip(local, 0, n_keys - 1)
    lo = lut[local]                          # [B, 2, W]
    hi = lut[local + 1]
    cnt = jnp.where(key_ok & in_shard, jnp.minimum(hi - lo, C), 0)

    # --- candidate genome positions ----------------------------------------
    # bucket entries are contiguous in sa: fetch C-length slices (lowers to a
    # slice-gather, far faster on TPU than a [B,2,W,C] elementwise gather)
    cvalid = jnp.arange(C, dtype=jnp.int32) < cnt[..., None]     # [B,2,W,C]
    lo_flat = jnp.clip(lo, 0, max(M - C, 0)).reshape(-1)
    sa_pos = jax.vmap(
        lambda p: jax.lax.dynamic_slice(sa, (p,), (C,)))(lo_flat)
    sa_pos = sa_pos.reshape(B, 2, W, C).astype(jnp.int32)
    off_arr = jnp.asarray(offsets, dtype=jnp.int32)[None, None, :, None]
    pos = sa_pos - off_arr                                       # read start
    valid = cvalid & (pos >= 0) & (pos + L <= G)

    strand_arr = jnp.arange(2, dtype=jnp.int32)[None, :, None, None]
    cand_id = jnp.where(valid, pos * 2 + strand_arr, INT32_MAX)  # [B,2,W,C]
    cand_id = cand_id.reshape(B, 2 * W * C)

    # --- dedup within shard: sort ids per read, mask repeats ---------------
    ids = jnp.sort(cand_id, axis=1)                              # [B, N]
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), ids[:, 1:] == ids[:, :-1]], axis=1)
    ok = (ids != INT32_MAX) & ~dup

    pos_s = ids >> 1
    strand_s = (ids & 1).astype(jnp.int32)

    # --- extension: full-read mismatch count per candidate -----------------
    gpos = jnp.clip(pos_s, 0, max(G - L, 0)).reshape(-1)         # [B*N]
    # contiguous L-byte windows via vmapped dynamic_slice (slice-gather)
    windows = jax.vmap(
        lambda p: jax.lax.dynamic_slice(genome, (p,), (L,)))(gpos)
    windows = windows.reshape(B, -1, L)                          # [B, N, L]
    # probe selection is a 2-way broadcast select, not a gather
    probe = jnp.where((strand_s == 0)[:, :, None],
                      seqs[:, 0, None, :], seqs[:, 1, None, :])  # [B, N, L]
    mm = jnp.sum(windows != probe, axis=-1, dtype=jnp.int32)
    mm = jnp.where(ok, mm, INT32_MAX)
    ids = jnp.where(ok, ids, INT32_MAX)
    return ids, mm


def finalize_candidates(ids: jnp.ndarray, mm: jnp.ndarray, *, max_ml: int):
    """Dedup (cross-shard) + best/next-best/top-k from scored candidates.

    ids/mm: [B, N] int32, INT32_MAX = invalid. Duplicated ids (same alignment
    reached via different shards/windows) carry identical mm and are masked.
    """
    B = ids.shape[0]
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    mm_s = jnp.take_along_axis(mm, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=1)
    ok = (ids_s != INT32_MAX) & ~dup
    mm_s = jnp.where(ok, mm_s, INT32_MAX)

    low = jnp.min(mm_s, axis=1)                                  # [B]
    is_low = (mm_s == low[:, None]) & ok
    n_low = jnp.sum(is_low, axis=1, dtype=jnp.int32)
    nxt = jnp.min(jnp.where(mm_s > low[:, None], mm_s, INT32_MAX), axis=1)

    hit_order = jnp.argsort(mm_s, axis=1, stable=True)[:, :max_ml]
    hit_id = jnp.take_along_axis(ids_s, hit_order, axis=1)
    hit_mm = jnp.take_along_axis(mm_s, hit_order, axis=1)
    hit_id = jnp.where(hit_mm == INT32_MAX, INT32_MAX, hit_id)

    return {"low_mm": low, "n_low": n_low, "nxt_mm": nxt,
            "hit_id": hit_id, "hit_mm": hit_mm}


@functools.partial(
    jax.jit, static_argnames=("offsets", "lut_k", "cand_per_window", "max_ml"))
def align_pass(genome: jnp.ndarray, sa: jnp.ndarray, lut: jnp.ndarray,
               reads: jnp.ndarray, *, offsets: tuple, lut_k: int,
               cand_per_window: int, max_ml: int):
    """Single-device pigeonhole pass over a read batch, both strands.

    Returns dict of per-read arrays:
      low_mm   [B] int32  — lowest full-read mismatch count (INT32_MAX if none)
      n_low    [B] int32  — deduped loci count at low_mm
      nxt_mm   [B] int32  — next-lowest distinct mismatch count
      hit_id   [B, max_ml] int32 — best hits as pos*2+strand, (mm, pos) order
      hit_mm   [B, max_ml] int32
    """
    ids, mm = gather_score_candidates(
        genome, sa, lut, jnp.int32(0), reads, offsets=offsets, lut_k=lut_k,
        cand_per_window=cand_per_window)
    return finalize_candidates(ids, mm, max_ml=max_ml)
