"""v4 packed-native kernel: bit-equality vs v3 on every output word."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import kalign
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.ops import seed_extend_v3 as v3
from kit4b_tpu.ops import seed_extend_v4 as v4
from kit4b_tpu.sim import simreads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    G = 120_000
    # repeat-dense genome: plant a 400bp unit 30 times to force multiloci,
    # bucket overflow, and escalation coverage
    unit = rng.integers(0, 4, 400).astype(np.uint8)
    seq = rng.integers(0, 4, G).astype(np.uint8)
    for i in range(30):
        p = 1000 + i * 3500
        seq[p:p + 400] = unit
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([G]), seq)
    idx = SfxIndex.build(g)
    al = kalign.KAligner(idx, batch_size=512)
    return g, idx, al


def _mk_reads(g, n, L, seed, n_rate=0.0):
    recs = simreads.sim_reads(
        g, simreads.SimParams(n_reads=n, read_len=L, seed=seed,
                              error_mode="illumina", subs_rate=0.03))
    reads = np.stack([r.codes for r in recs])
    if n_rate:
        rng = np.random.default_rng(seed + 1)
        mask = rng.random(reads.shape) < n_rate
        reads[mask] = dna.BASE_N
    return reads


@pytest.mark.parametrize("read_len", [100, 64, 150])
@pytest.mark.parametrize("n_rate", [0.0, 0.002])
def test_v4_matches_v3_bitwise(setup, read_len, n_rate):
    g, idx, al = setup
    import jax.numpy as jnp
    reads = _mk_reads(g, 512, read_len, seed=read_len, n_rate=n_rate)
    gview, sa, lut, lut2 = al._device_for(read_len)
    _, mtm = al.schedule_for(read_len)
    offs = al._offsets_for(read_len, mtm)
    reads2b, nlist, ok = kalign.pack_reads_2bit(reads)
    assert ok
    kw = dict(genome_len=len(g.seq), offsets=offs, lut_k=idx.lut_k,
              n_compact=al.n_compact, n_extend=al.n_extend,
              max_tot_mm=mtm, mm_delta=al.mm_delta, read_len=read_len)
    w3 = np.asarray(v3.fast_pass_packed_v3(
        gview, sa, lut2, jnp.asarray(reads2b), jnp.asarray(nlist), **kw))
    w4 = np.asarray(v4.fast_pass_packed_v4(
        gview, sa, lut2, jnp.asarray(reads2b), jnp.asarray(nlist), **kw))
    np.testing.assert_array_equal(w3, w4)


def test_v4_words_match_v3_pack(setup):
    """Word planes equal v3's pack_reads_t wherever tail/bad masks expose
    them (N positions are don't-care in the packed plane)."""
    g, idx, al = setup
    import jax.numpy as jnp
    from kit4b_tpu.ops.seed_extend_fast import _tail_mask
    L = 100
    reads = _mk_reads(g, 64, L, seed=5, n_rate=0.01)
    nw = (L + 15) // 16
    reads2b, nlist, ok = kalign.pack_reads_2bit(reads)
    rw, rb, rcw, rcb = (np.asarray(x) for x in v4.words_from_2bit(
        jnp.asarray(reads2b), jnp.asarray(nlist), L))
    seqs = v3.build_seqs(jnp.asarray(reads))
    rpack, rbad = (np.asarray(x) for x in v3.pack_reads_t(seqs, nw))
    # mismatch-relevant bits: (word ^ ref) masked by tail and not-bad
    tail = _tail_mask(L, nw) | (_tail_mask(L, nw) << 1)
    for mine, ref, badm in ((rw, rpack[0], rb), (rcw, rpack[1], rcb)):
        care = tail[:, None] & ~(badm | (badm << 1))
        np.testing.assert_array_equal(mine & care, ref & care)
    np.testing.assert_array_equal(rb, rbad[0])
    np.testing.assert_array_equal(rcb, rbad[1])
