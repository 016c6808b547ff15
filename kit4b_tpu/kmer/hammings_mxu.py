"""MXU min-matmul engine for exhaustive genome-wide K-mer Hamming distances.

The reference computes, for every K-mer window position, the minimum Hamming
distance to every other window (sense) and to every reverse-complement window
(antisense) via O(G) rolling sweeps per relative offset
(ngskit4b/hammings.cpp:3183 GHamDistWatson/GHamDistCrick) — O(G^2) scalar
updates on CPU clusters. The TPU-native reformulation turns the whole
computation into dense matrix multiplies on the MXU:

  encode every window i as a one-hot row  W[i, 5k+b] = [genome[i+k] == b]
  (5 channels per base so N==N counts as a match, exactly like the scalar
  sweep's code-equality compare; width 5K padded to a 128 multiple), then

      matches[i, j] = (W @ W^T)[i, j]      and      ws[i, j] = K - matches

so the all-pairs window-Hamming matrix is a [T,128c] x [128c,S] matmul per
tile pair — inner dimension 128c keeps the systolic array fully fed. A Pallas
kernel fuses the running column-min into the matmul so the O(G^2) pair matrix
never touches HBM; per own-tile the output is a [T, 128] partial-min block,
reduced to [T] afterwards.

Sentinel windows (any code >= BASE_UNDEF inside) get an all-zero row: their
ws against anything is exactly K, which can never under-report a true
minimum (true window Hamming <= K whenever any valid partner exists); their
own output positions are masked to 0xFFFF afterwards. The sense self-pair is
masked on the matmul diagonal.

Multi-node partitioning (hammings -n/-N, ngskit4b/hammings.cpp:99-106) is
preserved: nodes take disjoint partner-span ranges and `merge` remains an
elementwise min.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG32 = np.int32(1 << 20)
OUT_BIG = np.uint16(0xFFFF)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def window_onehot(codes: np.ndarray, K: int, Gp: int,
                  dtype=np.int8) -> tuple[np.ndarray, np.ndarray]:
    """Host/NumPy builder of the window one-hot matrix W
    [Gp, 128*ceil(5K/128)] and the window-validity mask [Gp] (in-range and
    sentinel-free; N is valid). Kept for tests; the device path uses
    _window_onehot_dev."""
    G = len(codes)
    C = _round_up(5 * K, 128)
    W = np.zeros((Gp, C), dtype)
    pad = np.full(K, 0x0F, np.uint8)  # EOG sentinel padding
    ext = np.concatenate([np.asarray(codes, np.uint8), pad])
    nk = max(0, G - K + 1)
    valid = np.zeros(Gp, bool)
    if nk:
        sent = ext >= 5
        # windowed any-sentinel via cumsum
        cs = np.concatenate([[0], np.cumsum(sent[: G])])
        nbad = cs[K:] - cs[: G - K + 1] if G >= K else np.zeros(0, np.int64)
        valid[:nk] = nbad == 0
        for k in range(K):
            col = ext[k: k + Gp]
            for b in range(5):
                W[:nk, 5 * k + b] = (col[:nk] == b)
        W[~valid] = 0
    return W, valid


def _window_onehot_dev(ext: jnp.ndarray, K: int, Gp: int, G: int):
    """Device builder: ext is codes padded to Gp+K with EOG. Returns
    (W [Gp, C] int8, valid [Gp] bool).

    Channel c encodes (k=c//5, b=c%5); W is built as one gather+compare in
    full 128-lane layout — never materializing [Gp, 5] or [Gp, K] slices in
    narrow-lane tiles (they pad 25x and OOM at megabase scale)."""
    C = _round_up(5 * K, 128)
    win = jnp.stack([jax.lax.dynamic_slice_in_dim(ext, k, Gp)
                     for k in range(K)], axis=1)          # [Gp, K] uint8
    kidx = np.minimum(np.arange(C) // 5, K - 1)
    bval = np.where(np.arange(C) < 5 * K, np.arange(C) % 5, 255)
    W = (jnp.take(win, jnp.asarray(kidx), axis=1)
         == jnp.asarray(bval, ext.dtype)[None, :]).astype(jnp.int8)
    sent = (ext >= 5).astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(sent)])
    nbad = jax.lax.dynamic_slice_in_dim(cs, K, Gp) - cs[:Gp]
    idx = jnp.arange(Gp, dtype=jnp.int32)
    valid = (nbad == 0) & (idx < G - K + 1)
    return W * valid[:, None].astype(jnp.int8), valid


def _minmm_kernel(rb_ref, wo_ref, wp_ref, out_ref, *, K, T, S, diag, span0,
                  acc_bf16):
    """Accumulates MAX matches per row into out (hmin = K - maxmatch later);
    the self-pair diagonal (global own row == partner column) is masked to
    -BIG. rb_ref holds the global row offset of own-tile 0 (nonzero when the
    own rows are a mesh shard of the partner array)."""
    t = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.full(out_ref.shape, -BIG32, jnp.int32)

    wo = wo_ref[:]
    wp = wp_ref[:]
    if acc_bf16:
        m = jax.lax.dot_general(wo.astype(jnp.bfloat16),
                                wp.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = m.astype(jnp.int32)
    else:
        m = jax.lax.dot_general(wo, wp, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
    if diag:
        row0 = rb_ref[0] + t * T
        col0 = span0 + s * S
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0) + row0
        lanes = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    acc = None
    for l in range(S // 128):
        blk = m[:, l * 128: (l + 1) * 128]
        if diag:
            blk = jnp.where(rows == col0 + l * 128 + lanes, -BIG32, blk)
        acc = blk if acc is None else jnp.maximum(acc, blk)
    out_ref[:] = jnp.maximum(out_ref[:], acc)


def _minmm_pallas(W_own: jnp.ndarray, W_part: jnp.ndarray, K: int, *,
                  diag: bool, span_lo: int, span_cnt: int,
                  T: int = 1024, S: int = 1024, acc_bf16: bool = False,
                  row_base=None, interpret: bool = False) -> jnp.ndarray:
    """Partial MAX-matches over partner spans [span_lo, span_lo+span_cnt)
    blocks of S. Returns [Rows_own, 128] int32 column-partial maxima;
    caller converts via hmin = K - max(.., axis=1)."""
    R, Cw = W_own.shape
    n_tiles = R // T
    if row_base is None:
        row_base = jnp.zeros((1,), jnp.int32)
    kern = functools.partial(_minmm_kernel, K=K, T=T, S=S, diag=diag,
                             span0=span_lo * S, acc_bf16=acc_bf16)
    flops = 2 * T * S * Cw * n_tiles * span_cnt
    return pl.pallas_call(
        kern,
        grid=(n_tiles, span_cnt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((T, Cw), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Cw), lambda t, s, _lo=span_lo: (_lo + s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 128), lambda t, s: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n_tiles * span_cnt * S * Cw,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(row_base, jnp.int32), W_own, W_part)


def _minmm_xla(W_own, W_part, *, K, diag, span_lo, span_cnt, S=1024,
               row_base=None):
    """XLA fallback (CPU tests / non-TPU): same tiling, fori over spans.
    row_base: optional [1] int32 global row offset of W_own's first row."""
    R = W_own.shape[0]
    rows = jnp.arange(R, dtype=jnp.int32)
    if row_base is not None:
        rows = rows + row_base[0]
    wo = W_own.astype(jnp.int32)

    def body(s, acc):
        off = (span_lo + s) * S
        wp = jax.lax.dynamic_slice_in_dim(W_part, off, S).astype(jnp.int32)
        ws = K - jax.lax.dot_general(wo, wp, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
        if diag:
            cols = off + jnp.arange(S, dtype=jnp.int32)
            ws = jnp.where(rows[:, None] == cols[None, :], BIG32, ws)
        return jnp.minimum(acc, jnp.min(ws, axis=1))

    init = jnp.full((R,), BIG32, jnp.int32)
    return jax.lax.fori_loop(0, span_cnt, body, init)


@functools.partial(jax.jit, static_argnames=("K", "Gp", "G", "rc"))
def _build_w(ext, *, K, Gp, G, rc):
    if rc:
        grev = ext[:G][::-1]
        c = jnp.where(grev < 4, 3 - grev, grev)
        ext = jnp.concatenate([c, jnp.full(Gp + K - G, 0x0F, c.dtype)])
    return _window_onehot_dev(ext, K, Gp, G)


@functools.partial(jax.jit, static_argnames=(
    "K", "R", "diag", "lo", "cnt", "T", "S", "use_pallas", "acc_bf16",
    "interpret"))
def _chunk_maxm(W, W_part, row_base, *, K, R, diag, lo, cnt, T, S,
                use_pallas, acc_bf16, interpret):
    """Max matches for own rows [row_base, row_base+R) vs partner spans
    [lo, lo+cnt); reduced to [R] so only small partials live in HBM."""
    wo = jax.lax.dynamic_slice_in_dim(W, row_base[0], R)
    if use_pallas:
        p = _minmm_pallas(wo, W_part, K, diag=diag, span_lo=lo, span_cnt=cnt,
                          T=T, S=S, acc_bf16=acc_bf16, row_base=row_base,
                          interpret=interpret)
        return jnp.max(p, axis=1)
    return K - _minmm_xla(wo, W_part, K=K, diag=diag, span_lo=lo,
                          span_cnt=cnt, S=S,
                          row_base=row_base if diag else None)


def hammings_exhaustive_mxu(genome_seq: np.ndarray, K: int, *,
                            antisense: bool = True,
                            node: int = 0, numnodes: int = 1,
                            T: int = 2048, S: int = 1024,
                            use_pallas: bool | None = None,
                            acc_bf16: bool = False,
                            row_chunk: int = 1 << 21,
                            interpret: bool = False) -> np.ndarray:
    """Min window-Hamming per position (uint16 [G]; 0xFFFF where no valid
    window). Node n of N takes partner-span blocks [n*cnt, ...) — partials
    merge with elementwise min exactly like the reference's ePMmerge.

    Own rows are processed in `row_chunk` slices so HBM holds only W (+Wrc)
    and one [R, 128] partial — ~40 Mbp genomes fit one 16 GB chip."""
    g = np.ascontiguousarray(genome_seq, np.uint8)
    G = len(g)
    nk = G - K + 1
    out = np.full(G, OUT_BIG, np.uint16)
    if nk <= 0:
        return out
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    blk = max(T, S)
    Gp = _round_up(max(G, blk), blk)
    n_spans = Gp // S
    lo = (node * n_spans) // numnodes
    hi = ((node + 1) * n_spans) // numnodes
    cnt = hi - lo
    if cnt <= 0:
        return out

    ext = jnp.asarray(np.concatenate(
        [g, np.full(Gp + K - G, 0x0F, np.uint8)]))
    W, valid = _build_w(ext, K=K, Gp=Gp, G=G, rc=False)
    parts = [(W, True)]
    if antisense:
        Wrc, _ = _build_w(ext, K=K, Gp=Gp, G=G, rc=True)
        parts.append((Wrc, False))
    R = min(_round_up(Gp, T), _round_up(row_chunk, T))
    maxm = np.full(Gp, -(1 << 20), np.int32)
    for rb in range(0, Gp, R):
        if rb + R > Gp:
            rb = Gp - R       # overlap tail chunk; max is idempotent
        base = jnp.asarray([rb], jnp.int32)
        mm = None
        for W_part, diag in parts:
            m = _chunk_maxm(W, W_part, base, K=K, R=R, diag=diag, lo=lo,
                            cnt=cnt, T=T, S=S, use_pallas=use_pallas,
                            acc_bf16=acc_bf16, interpret=interpret)
            mm = m if mm is None else jnp.maximum(mm, m)
        maxm[rb: rb + R] = np.asarray(jax.device_get(mm))
        if rb + R >= Gp:
            break
    hv = np.asarray(jax.device_get(valid))
    nvalid = int(hv.sum())
    if nvalid == 0 or (not antisense and nvalid < 2):
        # no partner exists; all-zero invalid/padded rows would report K
        return out
    h = np.where(hv[:G], np.minimum(K - maxm[:G], int(OUT_BIG)),
                 int(OUT_BIG))
    return h.astype(np.uint16)
