"""Mesh-parallel hammings: offset-range sharding with a pmin merge.

The reference distributes the exhaustive sweep across machines by static
genome-sweep partitioning with a filesystem merge (`-n numnodes -N node` +
ePMmerge, ngskit4b/hammings.cpp:99-106). On a device mesh the same
decomposition runs as a shard_map over an "sp" axis: every device holds the
(replicated) genome, sweeps its contiguous slice of the relative-offset
space, and the per-device running minima combine with one jnp.min over the
gathered axis — the collective replacing the reference's merge pass
(SURVEY.md §5.8).

Offsets index space avoids the d=0 sense hole by index remapping inside the
loop (t -> t - (G-K) or +1 past the hole), so device ranges stay contiguous.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _sweep_indices(g, partner, hmin, t_start, t_end, index_to_d, K):
    """fori over index space [t_start, t_end); index_to_d maps to offsets."""
    G = g.shape[0]
    idx = jnp.arange(G, dtype=jnp.int32)
    gpen = (g >= 5).astype(jnp.int16) * 32
    BIG16 = jnp.int16(9999)

    def body(t, hmin):
        d = index_to_d(t)
        p = jnp.roll(partner, -d)
        ppen = jnp.roll((partner >= 5).astype(jnp.int16) * 32, -d)
        dvp = (g != p).astype(jnp.int16) + jnp.maximum(gpen, ppen)
        q, r = divmod(K, 5)
        ws = jnp.zeros((G,), jnp.int16)
        if q:
            s5 = (dvp + jnp.roll(dvp, -1) + jnp.roll(dvp, -2)
                  + jnp.roll(dvp, -3) + jnp.roll(dvp, -4))
            for m in range(q):
                ws = ws + jnp.roll(s5, -5 * m)
        for j in range(5 * q, K):
            ws = ws + jnp.roll(dvp, -j)
        ok = ((idx + K <= G) & (idx + d >= 0) & (idx + d + K <= G)
              & (ws < 32))
        return jnp.minimum(hmin, jnp.where(ok, ws, BIG16))

    return jax.lax.fori_loop(t_start, t_end, body, hmin)


def make_hammings_mesh(mesh: Mesh, G: int, K: int, antisense: bool = True):
    """Build the jitted sharded sweep: (g, rc) replicated -> hmin replicated."""
    D = mesh.devices.size
    nk = G - K

    def _local(g, rc):
        i = jax.lax.axis_index("sp")
        hmin = jnp.full((G,), jnp.int16(9999), jnp.int16)
        # sense: index space [0, 2*nk) maps around the d=0 hole
        total_s = 2 * nk
        per = -(-total_s // D)
        lo = i * per
        hi = jnp.minimum(lo + per, total_s)
        hmin = _sweep_indices(
            g, g, hmin, lo, hi,
            lambda t: jnp.where(t < nk, t - nk, t - nk + 1), K)
        if antisense:
            total_a = 2 * nk + 1
            per_a = -(-total_a // D)
            lo_a = i * per_a
            hi_a = jnp.minimum(lo_a + per_a, total_a)
            hmin = _sweep_indices(g, rc, hmin, lo_a, hi_a,
                                  lambda t: t - nk, K)
        # merge partial minima across the offset shards (ePMmerge analog)
        all_h = jax.lax.all_gather(hmin, "sp")          # [D, G]
        return jnp.min(all_h, axis=0)

    shmapped = jax.shard_map(_local, mesh=mesh,
                             in_specs=(P(), P()), out_specs=P(),
                             check_vma=False)
    return jax.jit(shmapped)


def hammings_mesh(genome_seq: np.ndarray, K: int, *,
                  antisense: bool = True, devices=None) -> np.ndarray:
    """Run the sharded sweep over all (or given) devices; same output
    contract as kmer.hammings.hammings_exhaustive."""
    devices = devices if devices is not None else jax.devices()
    mesh = Mesh(np.asarray(devices), ("sp",))
    g = np.ascontiguousarray(genome_seq, np.uint8)
    G = len(g)
    if G < K:
        return np.zeros(0, np.uint16)
    rc = np.where(g[::-1] < 4, 3 - g[::-1], g[::-1]).astype(np.uint8)
    fn = make_hammings_mesh(mesh, G, K, antisense)
    out = np.array(jax.device_get(fn(jnp.asarray(g), jnp.asarray(rc))))
    out = np.where(out >= 9999, 0xFFFF, out.astype(np.int32)).astype(
        np.uint16)
    out[max(0, G - K + 1):] = 0xFFFF
    return out
