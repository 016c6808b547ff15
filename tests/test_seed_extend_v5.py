"""v5 flattened-index kernel: bit-equality vs v4 on every output word.

The repeat-planted genome drives seed buckets past P_POS=7 occupancy, so
the v5-specific escalation path (bucket-high -> tier-2 full lut2+SA) is
exercised, not just the inline-position fast path.
"""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import kalign
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.ops import seed_extend_v4 as v4
from kit4b_tpu.ops import seed_extend_v5 as v5
from kit4b_tpu.sim import simreads


@pytest.fixture(scope="module", params=["random", "repeats"])
def setup(request):
    rng = np.random.default_rng(23)
    G = 120_000
    seq = rng.integers(0, 4, G).astype(np.uint8)
    if request.param == "repeats":
        # 30 copies of a 400bp unit: buckets with cnt >> P_POS, multiloci
        unit = rng.integers(0, 4, 400).astype(np.uint8)
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


@pytest.mark.parametrize("read_len", [100, 64])
@pytest.mark.parametrize("n_rate", [0.0, 0.002])
def test_v5_matches_v4_bitwise(setup, read_len, n_rate):
    g, idx, al = setup
    import jax.numpy as jnp
    reads = _mk_reads(g, 512, read_len, seed=read_len, n_rate=n_rate)
    gview, sa, lut, lut2 = al._device_for(read_len)
    lut4 = v5.make_lut4_device(idx.lut, sa)
    _, mtm = al.schedule_for(read_len)
    offs = al._offsets_for(read_len, mtm)
    reads2b, nlist, ok = kalign.pack_reads_2bit(reads)
    assert ok
    kw = dict(genome_len=len(g.seq), offsets=offs, lut_k=idx.lut_k,
              n_compact=al.n_compact, n_extend=al.n_extend,
              max_tot_mm=mtm, mm_delta=al.mm_delta, read_len=read_len)
    # E large enough that every bucket-high read escalates on device
    w4 = np.asarray(v4.fast_pass_packed_v4(
        gview, sa, lut2, jnp.asarray(reads2b), jnp.asarray(nlist),
        tier2=(512, 192, 96), **kw))
    w5 = np.asarray(v5.fast_pass_packed_v5(
        gview, sa, lut2, lut4, jnp.asarray(reads2b), jnp.asarray(nlist),
        tier2=(512, 192, 96), **kw))
    np.testing.assert_array_equal(w4, w5)


def test_lut4_contents(setup):
    """lut4 rows hold sa[lo..lo+6] and the true bucket count."""
    g, idx, al = setup
    import jax.numpy as jnp
    sa = jnp.asarray(idx.sa_clean.astype(np.int32))
    lut4 = np.asarray(v5.make_lut4_device(idx.lut, sa))
    lut = np.asarray(idx.lut)
    cnt = np.diff(lut)
    np.testing.assert_array_equal(lut4[:, v5.P_POS],
                                  cnt.astype(np.int32))
    # spot-check a handful of non-empty buckets
    nz = np.nonzero(cnt)[0][:50]
    sa_h = idx.sa_clean.astype(np.int32)
    for key in nz:
        lo, n = int(lut[key]), int(cnt[key])
        take = min(n, v5.P_POS)
        np.testing.assert_array_equal(lut4[key, :take],
                                      sa_h[lo:lo + take])


def test_kaligner_v5_wiring(setup):
    """KAligner auto-picks v5 on clean indexes / v4 on repeat-dense ones,
    and align_batch_raw results match between forced v4 and forced v5."""
    g, idx, al = setup
    reads = _mk_reads(g, 256, 100, seed=11)
    a4 = kalign.KAligner(idx, batch_size=256, use_v5=False)
    a5 = kalign.KAligner(idx, batch_size=256, use_v5=True)
    r4 = a4.align_batch_raw(reads)
    r5 = a5.align_batch_raw(reads)
    for key in ("nar", "pos", "strand", "mm"):
        np.testing.assert_array_equal(r4[key], r5[key], err_msg=key)
    assert a4._lut4 is None and a5._lut4 is not None
    # auto mode decides by histogram
    auto = kalign.KAligner(idx, batch_size=256)
    auto.align_batch_raw(reads[:32])
    cnt = np.diff(np.asarray(idx.lut))
    frac_high = cnt[cnt > v5.P_POS].sum() / max(cnt.sum(), 1)
    assert auto._lut4_decided[100] == (frac_high * 12 <= 0.004)


def test_large_genome_past_24bit():
    """Production packed path on a 10 Mbp genome — past round 3's 8.4 Mbp
    single-word cap (VERDICT r3 item 1): accepted loci round-trip through
    the [B, 2] compact result (ops/seed_extend_v3.pack_result2) and match
    simreads ground truth at positions beyond 2^23. Mirrors the reference's
    large-genome capacity class (libkit4b/SfxArray.h:182)."""
    rng = np.random.default_rng(99)
    G = 10_000_000
    seq = np.concatenate([rng.integers(0, 4, G).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["big"], np.array([0]), np.array([G]), seq)
    idx = SfxIndex.build(g, lut_k=11)
    al = kalign.KAligner(idx, batch_size=256)
    recs = simreads.sim_reads(
        g, simreads.SimParams(n_reads=256, read_len=100, seed=4,
                              error_mode="uniform", subs_rate=0.02))
    reads = np.stack([r.codes for r in recs])
    dev = al._submit(reads)
    assert isinstance(dev, tuple) and dev[0] == "packed"
    raw = al._collect_compact(dev, reads)
    acc = raw["nar"] == 0
    assert acc.mean() > 0.9
    n_far = 0
    for i in np.nonzero(acc)[0]:
        t = simreads.parse_truth(recs[i].name)
        assert int(raw["pos"][i]) == t["start"]
        assert ("-" if raw["strand"][i] else "+") == t["strand"]
        if raw["pos"][i] > 2 ** 23:
            n_far += 1
    assert n_far > 0


def test_escalation_estimate(setup):
    g, idx, al = setup
    est = v5.host_escalation_estimate(idx.lut, n_windows=6)
    cnt = np.diff(np.asarray(idx.lut))
    if (cnt > v5.P_POS).any():
        assert est > 0.0
    else:
        assert est == 0.0
    assert 0.0 <= est <= 1.0
