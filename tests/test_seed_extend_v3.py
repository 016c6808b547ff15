"""ops/seed_extend_v3 (gather-minimal lane-major hot path): equivalence vs
round-2 seed_extend_fast across strands, Ns, shard offsets, bucket caps,
and the bisulfite digit-map variants.

fast_candidates_v3 dedups loci BEFORE extension, so raw outputs are compared
as canonical (id, mm) SETS; the classified/full-stats wrappers must match
bit-for-bit."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.ops import seed_extend_fast as F2
from kit4b_tpu.ops import seed_extend_v3 as F3
from kit4b_tpu.sim import simreads

INT32_MAX = np.iinfo(np.int32).max


def _mk(genome_len=120_000, n_reads=96, read_len=100, seed=11,
        subs_rate=0.03, with_ns=False, repeat=False):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, genome_len).astype(np.uint8)
    if repeat:
        unit = seq[700:760]
        for i in range(40):
            p = 3000 + i * 250
            seq[p:p + 60] = unit
    if with_ns:
        for p in rng.integers(0, genome_len - 10, 30):
            seq[p:p + rng.integers(1, 6)] = 4
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([genome_len]), seq)
    idx = SfxIndex.build(g)
    recs = simreads.sim_reads(g, simreads.SimParams(
        n_reads=n_reads, read_len=read_len, seed=seed + 1,
        error_mode="uniform", subs_rate=subs_rate))
    reads = np.stack([r.codes for r in recs])
    if with_ns:
        reads[::7, 50] = 4   # reads with Ns too
    return g, idx, reads


def _setup(idx, reads, lut=None, sa=None):
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    if sa is not None:
        sa_d = jnp.asarray(sa.astype(np.int32))
    lut_np = np.asarray(lut_d) if lut is None else lut
    if lut is not None:
        lut_d = jnp.asarray(lut.astype(np.int32))
    L = reads.shape[1]
    nw2 = (L + 15) // 16 + 1
    gview = jnp.asarray(F2.make_gview(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2))
    lut2 = F3.make_lut2_device(lut_np)
    offsets = F2.fast_offsets(L, idx.lut_k, 5)
    return gview, sa_d, lut_d, lut2, offsets, len(idx.genome.seq)


def _both(idx, reads, *, nc=32, key_lo=0, cap=None, single_strand=None,
          lut_base=4, digit_map=None, lut=None, sa=None):
    gview, sa_d, lut_d, lut2, offsets, G = _setup(idx, reads, lut, sa)
    kw = dict(genome_len=G, offsets=offsets, lut_k=idx.lut_k, n_compact=nc,
              single_strand=single_strand, lut_base=lut_base,
              digit_map=digit_map, max_per_bucket=cap)
    ids2, mm2, ov2 = F2.fast_candidates(
        gview, sa_d, lut_d, jnp.int32(key_lo), jnp.asarray(reads), **kw)
    ids3, mm3, ov3 = F3.fast_candidates_v3(
        gview, sa_d, lut2, jnp.int32(key_lo), jnp.asarray(reads),
        n_extend=nc, **kw)
    return ((np.asarray(ids2), np.asarray(mm2), np.asarray(ov2)),
            (np.asarray(ids3).T, np.asarray(mm3).T, np.asarray(ov3)))


def _canon_set(ids, mm):
    """Per-read sorted list of valid (id, mm) pairs."""
    out = []
    for i in range(ids.shape[0]):
        sel = ids[i] != INT32_MAX
        out.append(sorted(zip(ids[i][sel].tolist(), mm[i][sel].tolist())))
    return out


def _assert_same(a, b):
    ids2, mm2, ov2 = a
    ids3, mm3, ov3 = b
    np.testing.assert_array_equal(ov2, ov3)
    assert _canon_set(ids2, mm2) == _canon_set(ids3, mm3)


def test_v3_matches_fast_basic():
    g, idx, reads = _mk()
    _assert_same(*_both(idx, reads))


def test_v3_matches_fast_with_ns():
    g, idx, reads = _mk(with_ns=True)
    _assert_same(*_both(idx, reads))


def test_v3_matches_fast_repeats_and_cap():
    g, idx, reads = _mk(repeat=True, subs_rate=0.05)
    _assert_same(*_both(idx, reads, nc=16))
    _assert_same(*_both(idx, reads, nc=16, cap=3))


def test_v3_matches_fast_sharded_keylo():
    """Key-range shard: only keys in [key_lo, key_lo + n_keys) resolve."""
    g, idx, reads = _mk()
    n_keys = len(idx.lut) - 1
    half = n_keys // 2
    lut_hi = (idx.lut[half:] - idx.lut[half]).astype(idx.lut.dtype)
    sa_hi = idx.sa_clean[int(idx.lut[half]):]
    _assert_same(*_both(idx, reads, key_lo=half, lut=lut_hi, sa=sa_hi))


def test_v3_single_strand_and_digit_map():
    """Bisulfite-style collapsed alphabet: digit_map + single_strand."""
    g, idx, reads = _mk(n_reads=64)
    for ss in (0, 1):
        _assert_same(*_both(idx, reads, single_strand=ss))
    _assert_same(*_both(idx, reads, single_strand=0, lut_base=3,
                        digit_map=(0, 1, 1, 2)))


def test_v3_small_n_extend_flags_overflow():
    """n_extend < distinct loci must flag overflow, never drop silently."""
    g, idx, reads = _mk(repeat=True, subs_rate=0.0, n_reads=64)
    gview, sa_d, lut_d, lut2, offsets, G = _setup(idx, reads)
    kw = dict(genome_len=G, offsets=offsets, lut_k=idx.lut_k, n_compact=32)
    ids_full, mm_full, ov_full = F3.fast_candidates_v3(
        gview, sa_d, lut2, jnp.int32(0), jnp.asarray(reads),
        n_extend=32, **kw)
    ids_s, mm_s, ov_s = F3.fast_candidates_v3(
        gview, sa_d, lut2, jnp.int32(0), jnp.asarray(reads),
        n_extend=2, **kw)
    ids_full, ov_full = np.asarray(ids_full).T, np.asarray(ov_full)
    ids_s, ov_s = np.asarray(ids_s).T, np.asarray(ov_s)
    n_uniq = (ids_full != INT32_MAX).sum(axis=1)
    assert ((n_uniq > 2) <= (ov_s | ov_full)).all()
    # reads under the cap keep identical results
    under = (n_uniq <= 2) & ~ov_full
    assert under.any()
    mm_full, mm_s = np.asarray(mm_full).T, np.asarray(mm_s).T
    a = _canon_set(ids_full[under], mm_full[under])
    b = _canon_set(ids_s[under], mm_s[under])
    assert a == b


def test_v3_compact_classification_matches():
    g, idx, reads = _mk(n_reads=256, subs_rate=0.02)
    gview, sa_d, lut_d, lut2, offsets, G = _setup(idx, reads)
    kw = dict(genome_len=G, offsets=offsets, lut_k=idx.lut_k,
              n_compact=24, max_tot_mm=5, mm_delta=1)
    out2 = np.asarray(F2.fast_pass_compact(
        gview, sa_d, lut_d, jnp.asarray(reads), **kw))
    out3 = np.asarray(F3.fast_pass_compact_v3(
        gview, sa_d, lut2, jnp.asarray(reads), **kw))
    np.testing.assert_array_equal(out2, out3)


def test_v3_full_stats_matches():
    g, idx, reads = _mk(n_reads=128, repeat=True)
    gview, sa_d, lut_d, lut2, offsets, G = _setup(idx, reads)
    kw = dict(genome_len=G, offsets=offsets, lut_k=idx.lut_k,
              n_compact=32, max_ml=8)
    out2 = F2.fast_pass(gview, sa_d, lut_d, jnp.asarray(reads), **kw)
    out3 = F3.fast_pass_v3(gview, sa_d, lut2, jnp.asarray(reads), **kw)
    for k_ in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm", "overflow"):
        np.testing.assert_array_equal(np.asarray(out2[k_]),
                                      np.asarray(out3[k_]), err_msg=k_)


def test_packed_pass_device_tier2():
    """2-bit packed pass: on-device tier-2 resolves tier-1 overflow reads
    to the same classification as a big-capacity compact pass; reads past
    the E capacity stay class 3 (host escalation)."""
    from kit4b_tpu.align.kalign import pack_reads_2bit
    g, idx, reads = _mk(repeat=True, subs_rate=0.0, n_reads=128)
    reads[10, 3] = 4   # an N in a read
    gview, sa_d, lut_d, lut2, offsets, G = _setup(idx, reads)
    kw = dict(genome_len=G, offsets=offsets, lut_k=idx.lut_k,
              max_tot_mm=5, mm_delta=1)
    big = np.asarray(F3.fast_pass_compact_v3(
        gview, sa_d, lut2, jnp.asarray(reads), n_compact=512, n_extend=256,
        **kw))
    reads2b, nlist, ok = pack_reads_2bit(reads)
    assert ok
    word = np.asarray(F3.fast_pass_packed_v3(
        gview, sa_d, lut2, jnp.asarray(reads2b), jnp.asarray(nlist),
        read_len=reads.shape[1], n_compact=12, n_extend=4,
        tier2=(128, 512, 256), **kw))
    code, low, n_low = F3.unpack_result2(word)
    # every read must agree with the big pass (tier2 capacity is ample);
    # reads the big pass itself cannot hold stay -3 in both
    assert (big[:, 0] != -3).sum() > 100
    np.testing.assert_array_equal(code, big[:, 0])
    acc = code >= 0
    np.testing.assert_array_equal(low[acc], big[acc, 1])

    # tiny E: only the first E overflowed reads resolve; the rest stay -3
    word_s = np.asarray(F3.fast_pass_packed_v3(
        gview, sa_d, lut2, jnp.asarray(reads2b), jnp.asarray(nlist),
        read_len=reads.shape[1], n_compact=12, n_extend=4,
        tier2=(1, 512, 256), **kw))
    code_s, _, _ = F3.unpack_result2(word_s)
    word_t1 = np.asarray(F3.fast_pass_packed_v3(
        gview, sa_d, lut2, jnp.asarray(reads2b), jnp.asarray(nlist),
        read_len=reads.shape[1], n_compact=12, n_extend=4,
        tier2=None, **kw))
    code_t1, _, _ = F3.unpack_result2(word_t1)
    ovf_idx = np.nonzero(code_t1 == -3)[0]
    if len(ovf_idx) > 1:
        assert code_s[ovf_idx[0]] == big[ovf_idx[0], 0]
        assert (code_s[ovf_idx[1:]] == -3).all()


def test_packed_word_roundtrip_reads_with_ns():
    """pack_reads_2bit + unpack on device preserves codes incl. N=4 and
    never corrupts other reads (regression: -1 pad wrapped to [-1,-1])."""
    from kit4b_tpu.align.kalign import pack_reads_2bit
    rng = np.random.default_rng(5)
    reads = rng.integers(0, 4, (64, 101)).astype(np.uint8)
    reads[3, 7] = 4
    reads[63, 100] = 2   # last base of last read must survive
    reads2b, nlist, ok = pack_reads_2bit(reads)
    assert ok
    out = np.asarray(F3.unpack_reads_2bit(
        jnp.asarray(reads2b), jnp.asarray(nlist), 101))
    np.testing.assert_array_equal(out, reads)
