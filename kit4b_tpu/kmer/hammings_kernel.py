"""Pallas TPU kernel for the exhaustive hammings offset sweep.

The reference decomposes genome-wide min-Hamming into O(G) passes per
relative offset (ngskit4b/hammings.cpp:3183 GHamDistWatson/Crick). The XLA
formulation (kmer/hammings.py) materializes per-offset intermediates in HBM —
fine for small genomes, hopeless at megabase scale. This kernel blocks the
sweep so everything hot stays on-chip:

  grid (T-tile, S-span) : own-window tile x partner-offset span; the output
                          tile block is revisited across the span dimension
                          (matmul K-loop pattern) accumulating a running min
  span load             : one aligned DMA of S+T+K partner bytes per
                          (tile, span) — alignment provable, so no per-offset
                          DMA latency
  per offset            : dynamic rotate of the span (tpu dynamic rotate),
                          int16 compare, window-sum via 5+5 shifted adds
                          (K <= 25), masked min
  sentinels             : any base >= 5 (UNDEF/INDEL/EOS/EOG) adds a +32
                          penalty to the window sum, so sentinel-spanning
                          windows always fail the ws < 32 validity cut; N=4
                          stays an ordinary mismatching value (matches the
                          XLA path and the oracle)

Four sweeps cover all pair orientations (min is idempotent, overlap is
harmless):
  sense     : (own=g,     partner=g)      d in [1, G-K]  - partner to the right
              (own=rev g, partner=rev g)  same           - partner to the left
  antisense : (own=g,     partner=rc)     d in [0, G-K]
              (own=rev g, partner=rev rc) same
where a reversed sweep's output index i' maps to window start G-K-i'
(hamming(rev a, rev b) == hamming(a, b)).

Mosaic notes baked in: vector arithmetic is i16/i32-only and dynamic rotate
is 32-bit only, so elements are int32 end-to-end (1 base per word; the span
blocking keeps DMA traffic negligible regardless); 1-D blocks tile at
128-multiples; DMA starts must be provably aligned (pl.multiple_of on span
starts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(9999)
PENALTY = 32          # sentinel penalty; valid windows require ws < PENALTY
MAX_K = 25            # 5+5 shifted-add structure


def _sweep_kernel(part_ref, own_ref, out_ref, scratch, sem, *,
                  K, T, W, S, SP, G_valid, d_lo):
    """Accumulate min window-mismatch for one (own tile, offset span)."""
    t = pl.program_id(0)
    s = pl.program_id(1)
    base = t * T
    span0 = s * S                     # first offset of this span

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.full((T,), BIG, jnp.int32)

    own = own_ref[: T + K]
    own_pen = (own >= 5).astype(jnp.int32) * PENALTY
    idx = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).reshape(T)

    # one aligned DMA for the whole span's partner bytes
    src0 = pl.multiple_of(base + span0, 512)   # base, span0 multiples of 512
    dma = pltpu.make_async_copy(part_ref.at[pl.ds(src0, SP)], scratch, sem)
    dma.start()

    # offsets this span covers: d in [max(d_lo, span0), ...) limited by the
    # largest valid partner-window start for this tile
    d_hi_tile = G_valid - K - base            # inclusive max d
    lo = jnp.maximum(d_lo, span0)
    hi = jnp.minimum(span0 + S - 1, d_hi_tile)
    n_d = jnp.maximum(hi - lo + 1, 0)

    dma.wait()

    def body(i, hmin):
        d = lo + i
        rot = pltpu.roll(scratch[:], span0 - d, 0)   # rot[j] = part[base+d+j]
        part = rot[: T + K]
        dv = (own != part).astype(jnp.int32)
        pen = jnp.maximum(own_pen, (part >= 5).astype(jnp.int32) * PENALTY)
        dvp = dv + pen
        q, r = divmod(K, 5)
        ws = jnp.zeros((T,), jnp.int32)
        if q:
            s5 = (dvp[0:T + K - 4] + dvp[1:T + K - 3] + dvp[2:T + K - 2]
                  + dvp[3:T + K - 1] + dvp[4:T + K])
            for m_ in range(q):
                ws = ws + s5[5 * m_: 5 * m_ + T]
        for j_ in range(5 * q, K):
            ws = ws + dvp[j_: j_ + T]
        ok = ((idx + base + K <= G_valid)
              & (idx + base + d + K <= G_valid)
              & (ws < PENALTY))
        return jnp.minimum(hmin, jnp.where(ok, ws, BIG))

    hmin = jax.lax.fori_loop(0, n_d, body, out_ref[:])
    out_ref[:] = hmin


def _run_sweep(partner: np.ndarray, own: np.ndarray, K: int, G_valid: int,
               d_lo: int, T: int = 2048, S: int = 32768,
               interpret: bool = False):
    """Launch one sweep; returns hmin over own-window starts [0, G)."""
    G = len(own)
    if T % 512 or S % 512:
        raise ValueError("tile/span must be multiples of 512")
    num_tiles = -(-G // T)
    num_spans = -(-G // S)
    W = -(-(T + K) // 512) * 512
    SP = S + W                        # span bytes incl. window overhang
    Gpad = num_tiles * T + num_spans * S + SP + 512
    # int32 elements: Mosaic dynamic rotate supports only 32-bit data
    part_pad = np.full(Gpad, 0x0F, np.int32)  # EOG padding (penalized)
    part_pad[: len(partner)] = partner
    own_tiles = np.full(num_tiles * W, 0x0F, np.int32)
    for t in range(num_tiles):
        seg = own[t * T: t * T + T + K]
        own_tiles[t * W: t * W + len(seg)] = seg

    kern = functools.partial(_sweep_kernel, K=K, T=T, W=W, S=S, SP=SP,
                             G_valid=G_valid, d_lo=d_lo)
    out = pl.pallas_call(
        kern,
        grid=(num_tiles, num_spans),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # partner in HBM
            pl.BlockSpec((W,), lambda t, s: (t,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T,), lambda t, s: (t,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * T,), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SP,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(jnp.asarray(part_pad), jnp.asarray(own_tiles))
    return np.asarray(out).reshape(-1)[:G]


def hammings_exhaustive_tpu(genome_seq: np.ndarray, K: int, *,
                            antisense: bool = True, tile: int = 2048,
                            span: int = 32768,
                            interpret: bool = False) -> np.ndarray:
    """Kernel-backed exhaustive min-Hamming per window start (uint16; 0xFFFF
    where no valid K-mer). K <= 25."""
    if K > MAX_K:
        raise ValueError(f"kernel supports K <= {MAX_K}, got {K}")
    g = np.ascontiguousarray(genome_seq, np.uint8)
    G = len(g)
    nk = G - K + 1
    if nk <= 0:
        return np.zeros(0, np.uint16)
    rc = np.where(g[::-1] < 4, 3 - g[::-1], g[::-1]).astype(np.uint8)
    grev = g[::-1].copy()
    rcrev = rc[::-1].copy()

    acc = np.full(G, int(BIG), np.int32)

    def fold_fwd(h):
        np.minimum(acc, h.astype(np.int32), out=acc)

    def fold_rev(h):
        # reversed sweep index i' -> original window start G-K-i'
        hv = h[:nk][::-1].astype(np.int32)
        np.minimum(acc[:nk], hv, out=acc[:nk])

    fold_fwd(_run_sweep(g, g, K, G, 1, tile, span, interpret))
    fold_rev(_run_sweep(grev, grev, K, G, 1, tile, span, interpret))
    if antisense:
        fold_fwd(_run_sweep(rc, g, K, G, 0, tile, span, interpret))
        fold_rev(_run_sweep(rcrev, grev, K, G, 0, tile, span, interpret))

    out = np.where(acc >= int(BIG), 0xFFFF, acc).astype(np.uint16)
    out[nk:] = 0xFFFF
    return out
