"""ops/seed_extend_fast: correctness vs brute force and the round-1 pass."""
import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU platform before jax import)

import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.ops import extend_packed, seed_extend, seed_extend_fast
from kit4b_tpu.sim import simreads

INT32_MAX = np.iinfo(np.int32).max


def brute_force(seq, read, max_scan_mm):
    """All (pos, strand, mm) with mm <= max_scan_mm by full scan."""
    L = len(read)
    G = len(seq)
    hits = []
    for strand, r in ((0, read), (1, dna.revcomp(read))):
        win = np.lib.stride_tricks.sliding_window_view(seq, L)
        rr = r[None, :]
        mism = (win != rr) | (win >= 4) | (rr >= 4)
        mm = mism.sum(axis=1)
        for p in np.nonzero(mm <= max_scan_mm)[0]:
            if p + L <= G:
                hits.append((int(p), strand, int(mm[p])))
    return hits


def _mk(genome_len=200_000, n_reads=128, read_len=100, seed=3,
        subs_rate=0.02, repeat=False):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, genome_len).astype(np.uint8)
    if repeat:
        # plant a heavy repeat so LUT buckets overflow small tiers
        unit = seq[1000:1060]
        for i in range(50):
            p = 5000 + i * 300
            seq[p:p + 60] = unit
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([genome_len]), seq)
    idx = SfxIndex.build(g)
    recs = simreads.sim_reads(g, simreads.SimParams(
        n_reads=n_reads, read_len=read_len, seed=seed + 1,
        error_mode="uniform", subs_rate=subs_rate))
    reads = np.stack([r.codes for r in recs])
    return g, idx, reads


def _run_fast(idx, reads, offsets, nc=32, max_ml=8):
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    L = reads.shape[1]
    nw2 = (L + 15) // 16 + 1
    gview = jnp.asarray(seed_extend_fast.make_gview(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2))
    return {k: np.asarray(v) for k, v in seed_extend_fast.fast_pass(
        gview, sa_d, lut_d, jnp.asarray(reads),
        genome_len=len(idx.genome.seq), offsets=offsets,
        lut_k=idx.lut_k, n_compact=nc, max_ml=max_ml).items()}


def test_fast_pass_matches_brute_force():
    g, idx, reads = _mk()
    max_mm = 5
    offsets = seed_extend_fast.fast_offsets(100, idx.lut_k, max_mm)
    out = _run_fast(idx, reads, offsets)
    assert not out["overflow"].any()
    for i in range(len(reads)):
        hits = brute_force(g.seq, reads[i], max_mm)
        if not hits:
            assert out["low_mm"][i] > max_mm
            continue
        low = min(h[2] for h in hits)
        at_low = {(p, s) for p, s, m in hits if m == low}
        assert out["low_mm"][i] == low, i
        assert out["n_low"][i] == len(at_low), i
        got = {(int(h) >> 1, int(h) & 1)
               for h, m in zip(out["hit_id"][i], out["hit_mm"][i])
               if m == low}
        assert got == at_low or len(at_low) > 8, i
        nxt = [h[2] for h in hits if h[2] > low]
        if nxt and min(nxt) <= max_mm:
            assert out["nxt_mm"][i] == min(nxt), i


def test_fast_pass_agrees_with_round1_pass():
    """Same offsets => identical low/n_low/nxt/hit sets as the round-1
    sort-based pass (which is itself brute-force-verified)."""
    g, idx, reads = _mk(seed=9)
    offsets = seed_extend_fast.fast_offsets(100, idx.lut_k, 5)
    out = _run_fast(idx, reads, offsets)
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    ref = {k: np.asarray(v) for k, v in seed_extend.align_pass(
        gpack_d, gbad_d, sa_d, lut_d, jnp.asarray(reads),
        genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
        cand_per_window=24, n_compact=96, max_ml=8).items()}
    np.testing.assert_array_equal(out["low_mm"], ref["low_mm"])
    np.testing.assert_array_equal(out["n_low"], ref["n_low"])
    np.testing.assert_array_equal(out["nxt_mm"], ref["nxt_mm"])
    np.testing.assert_array_equal(out["hit_id"], ref["hit_id"])


def test_overflow_flags_and_escalation_tier():
    """Repeat-dense genome: small tier overflows loudly; a bigger tier
    resolves the same reads correctly (no silent truncation)."""
    g, idx, reads = _mk(repeat=True, n_reads=48, seed=5)
    # reads sampled from the repeat region to force bucket pile-ups
    rng = np.random.default_rng(0)
    rep_reads = []
    for i in range(48):
        p = 5000 + (i % 50) * 300
        rep_reads.append(g.seq[p:p + 100].copy())
    reads = np.stack(rep_reads)
    offsets = seed_extend_fast.fast_offsets(100, idx.lut_k, 5)
    small = _run_fast(idx, reads, offsets, nc=8)
    big = _run_fast(idx, reads, offsets, nc=512)
    assert small["overflow"].any()
    assert not big["overflow"].any()
    for i in range(len(reads)):
        hits = brute_force(g.seq, reads[i], 5)
        low = min(h[2] for h in hits)
        at_low = {(p, s) for p, s, m in hits if m == low}
        assert big["low_mm"][i] == low
        assert big["n_low"][i] == len(at_low)
        # non-overflowed small-tier reads must already be exact
        if not small["overflow"][i]:
            assert small["low_mm"][i] == low
            assert small["n_low"][i] == len(at_low)


def test_fast_pass_n_handling():
    """Reads and genome regions with Ns: N counts as mismatch, N-key
    windows are skipped, discovery still complete via clean windows."""
    rng = np.random.default_rng(11)
    seq = rng.integers(0, 4, 100_000).astype(np.uint8)
    seq[50_000:50_010] = dna.BASE_N
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([100_000]), seq)
    idx = SfxIndex.build(g)
    reads = []
    for i in range(32):
        p = rng.integers(0, 90_000)
        r = seq[p:p + 100].copy()
        r[rng.integers(0, 100)] = dna.BASE_N  # one read N
        reads.append(r)
    reads = np.stack(reads)
    offsets = seed_extend_fast.fast_offsets(100, idx.lut_k, 5)
    out = _run_fast(idx, reads, offsets)
    for i in range(32):
        hits = brute_force(g.seq, reads[i], 5)
        if not hits:
            assert out["low_mm"][i] > 5
            continue
        low = min(h[2] for h in hits)
        assert out["low_mm"][i] == low, i
        assert out["n_low"][i] == len(
            {(p, s) for p, s, m in hits if m == low}), i


def test_window_scan_packed_matches_byte():
    """The phase-sliced packed window scan (round 5) returns the same
    (best, pos, n_best) as the row-gather byte scan, incl. N bases,
    window edges and genome boundaries."""
    from kit4b_tpu.align.kalign import pack_reads_2bit
    from kit4b_tpu.ops.extend_packed import pack_genome
    rng = np.random.default_rng(11)
    G = 50_000
    seq = np.concatenate([rng.integers(0, 4, G).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    L = 73                       # non-multiple of 16 tail
    R = 64
    probes = np.zeros((R, L), np.uint8)
    starts = np.zeros(R, np.int32)
    for i in range(R):
        p = int(rng.integers(0, G - L))
        probes[i] = seq[p:p + L]
        if i % 3 == 0:           # plant mismatches
            q = rng.integers(0, L, 2)
            probes[i, q] = (probes[i, q] + 1) % 4
        if i % 5 == 0:           # plant an N
            probes[i, rng.integers(0, L)] = dna.BASE_N
        starts[i] = p - int(rng.integers(0, 300))
    starts[0] = -40              # pre-genome window edge
    starts[1] = G - 100          # tail-of-genome window edge
    nw2 = (L + 15) // 16 + 1
    gpack, gbad = pack_genome(seq, 65)
    gview = jnp.asarray(seed_extend_fast.make_gview(gpack, gbad, nw2))
    for scan_len in (171, 512):
        b0, p0, n0 = (np.array(x) for x in seed_extend_fast.window_scan(
            gview, jnp.asarray(probes), jnp.asarray(starts),
            genome_len=len(seq), scan_len=scan_len))
        r2b, nl, ok = pack_reads_2bit(probes)
        assert ok
        b1, p1, n1 = (np.array(x) for x in
                      seed_extend_fast.window_scan_packed(
                          gview, jnp.asarray(r2b), jnp.asarray(nl),
                          jnp.asarray(starts), genome_len=len(seq),
                          scan_len=scan_len, read_len=L))
        np.testing.assert_array_equal(b0, b1)
        np.testing.assert_array_equal(n0, n1)
        usable = b0 != INT32_MAX
        np.testing.assert_array_equal(p0[usable], p1[usable])
