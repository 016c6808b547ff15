"""hammings: genome-wide minimum K-mer Hamming distances.

Capability parity with the reference's exhaustive mode
(ngskit4b/hammings.cpp:3183 GHamDistWatson / GHamDistCrick,
ThreadedGHamDist:883): for every K-mer position p, the minimum Hamming
distance to any *other* K-mer in the genome (sense) and to any reverse
complement K-mer (antisense).

TPU-native formulation: the reference decomposes the O(G^2) all-pairs sweep
into independent O(G) passes, one per relative cursor offset; each pass here
is a fixed-shape vector computation (shifted compare -> windowed sum via
cumulative sums -> masked min), driven by lax.fori_loop on device. Crick
passes reduce to Watson passes against the reverse-complemented genome (the
anti-diagonal sweep hammings.cpp:3289 becomes a fixed offset after reversing
one cursor's coordinate system).

Multi-node static partitioning (-n numnodes -N node, hammings.cpp:99-106) is
preserved as offset-range partitioning; `merge` is an elementwise min.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import dna

BIG = np.uint16(0xFFFF)


def _window_valid_and_sum(diff, sent_pair, K):
    """Sliding-window sum of diff and window-validity (no sentinel) masks."""
    cdiff = jnp.cumsum(diff.astype(jnp.int32))
    csent = jnp.cumsum(sent_pair.astype(jnp.int32))
    pad = jnp.zeros(1, jnp.int32)
    cdiff = jnp.concatenate([pad, cdiff])
    csent = jnp.concatenate([pad, csent])
    wsum = cdiff[K:] - cdiff[:-K]          # [G-K+1]
    wbad = (csent[K:] - csent[:-K]) > 0
    return wsum, wbad


@functools.partial(jax.jit, static_argnames=("K",), donate_argnums=(3,))
def _watson_pass(g: jnp.ndarray, sent: jnp.ndarray, d: jnp.ndarray,
                 hmin: jnp.ndarray, *, K: int) -> jnp.ndarray:
    """One sense offset pass: compare K-mers at i and i+d for all i."""
    G = g.shape[0]
    gs = jnp.roll(g, -d)
    ss = jnp.roll(sent, -d)
    diff = g != gs
    pairsent = sent | ss
    wsum, wbad = _window_valid_and_sum(diff, pairsent, K)
    idx = jnp.arange(G - K + 1, dtype=jnp.int32)
    valid = (~wbad) & (idx + d + K <= G)
    w = jnp.where(valid, wsum, jnp.int32(BIG)).astype(jnp.uint16)
    # record at i …
    hmin = hmin.at[: G - K + 1].min(w)
    # … and at i+d (roll pads with wrapped BIGs only where invalid)
    w_at_jd = jnp.roll(jnp.concatenate(
        [w, jnp.full((K - 1,), BIG, jnp.uint16)]), d)
    return jnp.minimum(hmin, w_at_jd)


@functools.partial(jax.jit, static_argnames=("K",), donate_argnums=(4,))
def _crick_pass(g: jnp.ndarray, rc: jnp.ndarray, sent: jnp.ndarray,
                rsent: jnp.ndarray, hmin: jnp.ndarray, dprime: jnp.ndarray,
                *, K: int) -> jnp.ndarray:
    """One antisense pass: g-window at i vs rc-window at i+d' (d' may be 0).

    rc-window position j' maps to original genome K-mer start G-K-j'.
    """
    G = g.shape[0]
    gs = jnp.roll(rc, -dprime)
    ss = jnp.roll(rsent, -dprime)
    diff = g != gs
    pairsent = sent | ss
    wsum, wbad = _window_valid_and_sum(diff, pairsent, K)
    idx = jnp.arange(G - K + 1, dtype=jnp.int32)
    jprime = idx + dprime
    valid = (~wbad) & (jprime + K <= G) & (jprime >= 0)
    # self-pair exclusion: a K-mer vs its own revcomp IS a valid comparison in
    # the reference (palindromes score 0 against themselves only via the
    # antisense of the identical loci) — keep it, matching GHamDistCrick.
    w = jnp.where(valid, wsum, jnp.int32(BIG)).astype(jnp.uint16)
    hmin = hmin.at[: G - K + 1].min(w)
    # record at original coords of the rc window: p2 = G - K - jprime
    # scatter via flip: positions p2 = (G-K) - (idx + dprime)
    w_flip = jnp.flip(w)  # value for p2 = dprime + (G-K) - ... needs shift
    # p2 = G-K-dprime-idx → flipped index (G-K-idx) shifted by -dprime
    w_at_p2 = jnp.roll(jnp.concatenate(
        [w_flip, jnp.full((K - 1,), BIG, jnp.uint16)]), -dprime)
    return jnp.minimum(hmin, w_at_p2)


def hammings_exhaustive(genome_seq: np.ndarray, K: int,
                        *, antisense: bool = True,
                        node: int = 0, numnodes: int = 1,
                        progress_every: int = 0) -> np.ndarray:
    """Minimum Hamming distance per K-mer start position (uint16, BIG where
    no valid K-mer). Offsets are range-partitioned across `numnodes` and this
    call computes node `node`'s share (merge partial results with
    np.minimum, as the reference's ePMmerge does)."""
    g = jnp.asarray(genome_seq)
    G = int(g.shape[0])
    if G < K:
        return np.full(0, BIG, np.uint16)
    sent = g >= dna.BASE_EOS
    rc = jnp.where(jnp.flip(g) < 4, 3 - jnp.flip(g), jnp.flip(g))
    rsent = jnp.flip(sent)
    hmin = jnp.full((G,), BIG, dtype=jnp.uint16)

    # sense offsets 1..G-K, split across nodes
    all_off = np.arange(1, G - K + 1)
    my_off = all_off[node::numnodes]
    for i, d in enumerate(my_off):
        hmin = _watson_pass(g, sent, jnp.int32(d), hmin, K=K)
        if progress_every and (i + 1) % progress_every == 0:
            print(f"hammings sense: {i+1}/{len(my_off)} offsets")
    if antisense:
        # d' spans negative offsets too: the pair (p1, p2) lives on
        # anti-diagonal p1 + p2 = (G-K) - d', which must cover 0..2(G-K)
        all_dp = np.arange(-(G - K), G - K + 1)
        my_dp = all_dp[node::numnodes]
        for i, dp in enumerate(my_dp):
            hmin = _crick_pass(g, rc, sent, rsent, hmin, jnp.int32(dp), K=K)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"hammings antisense: {i+1}/{len(my_dp)} offsets")
    out = np.array(jax.device_get(hmin))
    out[max(0, G - K + 1):] = BIG
    return out


def hammings_oracle(genome_seq: np.ndarray, K: int,
                    antisense: bool = True) -> np.ndarray:
    """Naive NumPy oracle for tests."""
    g = np.asarray(genome_seq)
    G = len(g)
    sent = g >= dna.BASE_EOS
    nk = G - K + 1
    if nk <= 0:
        return np.zeros(0, np.uint16)
    wins = np.lib.stride_tricks.sliding_window_view(g, K)
    valid = ~np.lib.stride_tricks.sliding_window_view(sent, K).any(axis=1)
    out = np.full(G, BIG, np.uint16)
    rev = wins[:, ::-1]
    rc_wins = np.where(rev < 4, 3 - rev, rev)  # N and sentinels unchanged
    for i in range(nk):
        if not valid[i]:
            continue
        best = int(BIG)
        for j in range(nk):
            if not valid[j]:
                continue
            if j != i:
                best = min(best, int((wins[i] != wins[j]).sum()))
            if antisense:
                best = min(best, int((wins[i] != rc_wins[j]).sum()))
        out[i] = best
    return out


def merge(*partials: np.ndarray) -> np.ndarray:
    """ePMmerge equivalent: elementwise min over per-node results."""
    out = partials[0].copy()
    for p in partials[1:]:
        if len(p) != len(out):
            raise ValueError("hammings merge: dimension mismatch")
        np.minimum(out, p, out=out)
    return out


def write_csv(path, genome, hmin: np.ndarray, K: int) -> None:
    """Per-position CSV (chrom, offset, Hamming) like the reference's
    trans-to-CSV mode (hammings.cpp:105)."""
    with open(path, "w") as f:
        f.write(f"\"chrom\",\"offset\",\"Hamming\"\n")
        for ci, name in enumerate(genome.names):
            s = int(genome.starts[ci])
            ln = int(genome.lengths[ci])
            for off in range(max(0, ln - K + 1)):
                v = hmin[s + off]
                if v == BIG:
                    continue
                f.write(f"\"{name}\",{off},{int(v)}\n")
