"""Multi-chip sharded align pass == single-chip result (8-device CPU mesh)."""
import jax
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align.kalign import build_pass_schedule
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.ops import seed_extend
from kit4b_tpu.parallel import mesh as pmesh
from kit4b_tpu.sim import simreads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    n = 100_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([n]), seq)
    idx = SfxIndex.build(g)
    reads = simreads.sim_reads(
        g, simreads.SimParams(n_reads=64, read_len=100, seed=2,
                              error_mode="uniform", subs_rate=0.02))
    arr = np.stack([r.codes for r in reads])
    return g, idx, arr


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_pass_matches_single(setup, dp, tp):
    g, idx, arr = setup
    assert len(jax.devices()) >= 8
    passes, _ = build_pass_schedule(100, 5, 1, len(g.seq))
    ps = passes[-1]  # widest pass
    kw = dict(genome_len=len(g.seq), offsets=ps.offsets, lut_k=idx.lut_k,
              cand_per_window=16, n_compact=96, max_ml=5)
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    ref = seed_extend.align_pass(gpack_d, gbad_d, sa_d, lut_d,
                                 np.asarray(arr), **kw)

    m = pmesh.make_mesh(dp, tp)
    sa_s, lut_s, key_lo = pmesh.shard_index_by_key(
        idx.sa_clean, idx.lut, tp)
    args = pmesh.device_put_sharded_index(m, np.asarray(gpack_d),
                                          np.asarray(gbad_d), sa_s, lut_s,
                                          key_lo)
    fn = pmesh.make_sharded_align_pass(m, **kw)
    out = fn(*args, np.asarray(arr))

    for key in ("low_mm", "n_low", "nxt_mm"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    np.testing.assert_array_equal(np.asarray(out["hit_id"]),
                                  np.asarray(ref["hit_id"]))


@pytest.fixture(scope="module")
def setup_repeat():
    """Repeat-dense genome: the cross-shard exactly-once property is only
    exercised when the same locus is discovered via multiple windows whose
    k-mer keys live in DIFFERENT shards."""
    rng = np.random.default_rng(23)
    n = 100_000
    seq = rng.integers(0, 4, n).astype(np.uint8)
    unit = seq[500:620]          # 120bp unit: spans several seed windows
    for i in range(60):
        p0 = 2000 + i * 400
        seq[p0:p0 + 120] = unit
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([n]), seq)
    idx = SfxIndex.build(g)
    reads = simreads.sim_reads(
        g, simreads.SimParams(n_reads=64, read_len=100, seed=5,
                              error_mode="uniform", subs_rate=0.02))
    arr = np.stack([r.codes for r in reads])
    # make sure plenty of reads actually come from the repeat
    for j in range(0, 32):
        p0 = 2000 + (j % 60) * 400 + (j % 20)
        arr[j] = np.where(seq[p0:p0 + 100] < 4, seq[p0:p0 + 100], 0)
    return g, idx, arr


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_v3_matches_single(setup_repeat, dp, tp):
    """PRODUCTION kernel (seed_extend_v3) sharded dp x tp == single chip,
    bit-identical, on a repeat-dense genome (exactly-once across shards)."""
    from kit4b_tpu.ops import seed_extend_fast, seed_extend_v3
    import jax.numpy as jnp
    g, idx, arr = setup_repeat
    assert len(jax.devices()) >= 8
    L = arr.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    kw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
              n_compact=512, n_extend=256, max_ml=5)
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    nw2 = (L + 15) // 16 + 1
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut2 = seed_extend_v3.make_lut2_device(idx.lut)
    ref = seed_extend_v3.fast_pass_v3(gview, sa_d, lut2, jnp.asarray(arr),
                                      **kw)
    assert not np.asarray(ref["overflow"]).any()
    # multi-window rediscovery really happens (dedup is load-bearing)
    assert (np.asarray(ref["n_low"])[:32] > 1).any()

    m = pmesh.make_mesh(dp, tp)
    sa_s, lut2_s, key_lo = pmesh.shard_index_by_key_v3(
        idx.sa_clean, idx.lut, tp)
    args = pmesh.device_put_sharded_index_v3(m, gview, sa_s, lut2_s, key_lo)
    fn = pmesh.make_sharded_align_pass_v3(m, **kw)
    out = fn(*args, np.asarray(arr))
    for key in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm",
                "overflow"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)


def test_hammings_mesh_matches_oracle():
    from kit4b_tpu import dna
    from kit4b_tpu.kmer.hammings import hammings_oracle
    from kit4b_tpu.parallel.hammings_mesh import hammings_mesh
    rng = np.random.default_rng(15)
    n, K = 300, 8
    g = rng.integers(0, 4, n).astype(np.uint8)
    g[150] = dna.BASE_EOS
    got = hammings_mesh(g, K)
    want = hammings_oracle(g, K)
    np.testing.assert_array_equal(got[: n - K + 1].astype(int),
                                  want[: n - K + 1].astype(int))


def test_hammings_mesh_sense_only():
    from kit4b_tpu.kmer.hammings import hammings_oracle
    from kit4b_tpu.parallel.hammings_mesh import hammings_mesh
    rng = np.random.default_rng(16)
    n, K = 200, 6
    g = rng.integers(0, 4, n).astype(np.uint8)
    got = hammings_mesh(g, K, antisense=False)
    want = hammings_oracle(g, K, antisense=False)
    np.testing.assert_array_equal(got[: n - K + 1].astype(int),
                                  want[: n - K + 1].astype(int))


def test_distributed_helpers(tmp_path):
    from kit4b_tpu.parallel import distributed as dist
    pid, pcount = dist.initialize()  # single-process: no-op wiring
    assert pid == 0 and pcount == 1
    items = list(range(10))
    assert list(dist.host_shard(items, 1, 3)) == [1, 4, 7]
    assert list(dist.host_shard(items, 0, 1)) == items
    assert dist.shard_output_path("o.sam", 0).endswith("o.sam")
    assert dist.shard_output_path("o.sam", 3) == "o.p3.sam"
    # shard merge keeps one header
    a, b = tmp_path / "a.sam", tmp_path / "b.sam"
    a.write_text("@HD\tVN:1.4\nr1\t0\tc\t1\t0\t*\t*\t0\t0\tA\t*\n")
    b.write_text("@HD\tVN:1.4\nr2\t0\tc\t2\t0\t*\t*\t0\t0\tA\t*\n")
    out = tmp_path / "m.sam"
    dist.merge_sam_shards(out, [a, b])
    lines = out.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("@")) == 1
    assert len(lines) == 3
    m = dist.global_mesh(("dp", "tp"), (4, 2))
    assert m.devices.shape == (4, 2)


def test_align_records_prefetch_equivalent():
    import numpy as np
    from kit4b_tpu import dna
    from kit4b_tpu.align import kalign
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import Genome
    from kit4b_tpu.sim import simreads
    rng = np.random.default_rng(33)
    n = 60_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c"], np.array([0]), np.array([n]), seq)
    idx = SfxIndex.build(g)
    recs = simreads.sim_reads(g, simreads.SimParams(n_reads=300,
                                                    read_len=100, seed=2))
    al = kalign.KAligner(idx, batch_size=128)
    r1 = [(rec.name, res.nar, res.pos)
          for rec, res in al.align_records(recs, prefetch=True)]
    r2 = [(rec.name, res.nar, res.pos)
          for rec, res in al.align_records(recs, prefetch=False)]
    assert r1 == r2


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_v4_matches_single(setup_repeat, dp, tp):
    """PRODUCTION v4 packed-native kernel sharded dp x tp == single-chip
    v3 full-stats pass, bit-identical, repeat-dense genome (the same
    exactly-once guarantee: v4 keeps big-endian key-range ownership)."""
    from kit4b_tpu.ops import seed_extend_fast, seed_extend_v3
    import jax.numpy as jnp
    g, idx, arr = setup_repeat
    assert len(jax.devices()) >= 8
    L = arr.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    kw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
              n_compact=512, n_extend=256, max_ml=5)
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    nw2 = (L + 15) // 16 + 1
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut2 = seed_extend_v3.make_lut2_device(idx.lut)
    ref = seed_extend_v3.fast_pass_v3(gview, sa_d, lut2, jnp.asarray(arr),
                                      **kw)

    m = pmesh.make_mesh(dp, tp)
    sa_s, lut2_s, key_lo = pmesh.shard_index_by_key_v3(
        idx.sa_clean, idx.lut, tp)
    args = pmesh.device_put_sharded_index_v3(m, gview, sa_s, lut2_s, key_lo)
    reads2b, nlist = pmesh.pack_reads_sharded(arr, dp)
    fn = pmesh.make_sharded_align_pass_v4(m, read_len=L, **kw)
    out = fn(*args, reads2b, nlist)
    for key in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm",
                "overflow"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_v5_matches_single(setup_repeat, dp, tp):
    """v5 flattened-index kernel sharded dp x tp == single-device v5,
    bit-identical on the repeat-dense genome (key-range ownership +
    first-exact-window canonicalisation are shard-invariant; bucket-high
    escalation flags psum to the same per-read overflow set)."""
    from kit4b_tpu.align.kalign import pack_reads_2bit
    from kit4b_tpu.ops import seed_extend_fast, seed_extend_v3, \
        seed_extend_v4, seed_extend_v5
    from kit4b_tpu.ops.seed_extend_fast import finalize_fast
    import jax.numpy as jnp
    g, idx, arr = setup_repeat
    assert len(jax.devices()) >= 8
    L = arr.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    kw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
              read_len=L, n_compact=512, n_extend=256)
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    nw2 = (L + 15) // 16 + 1
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut4 = seed_extend_v5.make_lut4_device(idx.lut, sa_d)
    r2b, nl, ok = pack_reads_2bit(arr)
    assert ok
    planes = seed_extend_v4.words_from_2bit(jnp.asarray(r2b),
                                            jnp.asarray(nl), L)
    ids, mm, ovf = seed_extend_v5._cands_core_v5(
        gview, lut4, jnp.int32(0), planes, **kw)
    ref = finalize_fast(ids.T, mm.T, max_ml=5)
    ref["overflow"] = np.asarray(ovf)

    m = pmesh.make_mesh(dp, tp)
    sa_s, lut4_s, key_lo = pmesh.shard_index_by_key_v5(
        idx.sa_clean, idx.lut, tp)
    args = pmesh.device_put_sharded_index_v5(m, gview, lut4_s, key_lo)
    reads2b, nlist = pmesh.pack_reads_sharded(arr, dp)
    fn = pmesh.make_sharded_align_pass_v5(m, max_ml=5, **kw)
    out = fn(*args, reads2b, nlist)
    for key in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm",
                "overflow"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)


def test_sharded_position_matches_single():
    """POSITION-sharded genome pass (P3 completion, O(G/tp) residency):
    bit-identical to the single-device production kernel on a repeat-dense
    genome across mesh shapes (VERDICT r3 item 7)."""
    import jax
    import jax.numpy as jnp

    from kit4b_tpu.align.kalign import pack_reads_2bit
    from kit4b_tpu.ops import seed_extend_fast, seed_extend_v3
    from kit4b_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(41)
    G = 400_000
    seq = rng.integers(0, 4, G).astype(np.uint8)
    unit = rng.integers(0, 4, 300).astype(np.uint8)
    for i in range(30):
        seq[4000 + i * 12000:4000 + i * 12000 + 300] = unit
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([G]), seq)
    idx = SfxIndex.build(g)
    recs = simreads.sim_reads(g, simreads.SimParams(
        n_reads=64, read_len=100, seed=3, error_mode="uniform",
        subs_rate=0.02))
    reads = np.stack([r.codes for r in recs])
    L = reads.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    # capacities ample for the repeat family so NEITHER side overflows:
    # per-shard capacity semantics legitimately differ on overflow reads
    # (a shard sees only its block's candidates)
    kw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
              n_compact=512, n_extend=256, max_ml=5)

    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    nw2 = (L + 15) // 16 + 1
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut2 = seed_extend_v3.make_lut2_device(idx.lut)
    ref = seed_extend_v3.fast_pass_v3(gview, sa_d, lut2,
                                      jnp.asarray(reads), **kw)
    for dp, tp in ((2, 4), (1, 8), (4, 2)):
        m = pmesh.make_mesh(dp, tp)
        gvb, base, sa_s, lut2_s = pmesh.shard_index_by_position(
            idx, tp, L)
        # O(G/tp) residency: each shard's gview block is ~1/tp of the
        # full view plus the halo
        full_rows = gview.shape[0]
        assert gvb.shape[1] <= full_rows // tp + 4 * (L // 16 + nw2) + 2
        reads2b, nlist = pmesh.pack_reads_sharded(reads, dp)
        from jax.sharding import NamedSharding, PartitionSpec as P
        args = (jax.device_put(jnp.asarray(gvb),
                               NamedSharding(m, P("tp", None, None))),
                jax.device_put(jnp.asarray(base),
                               NamedSharding(m, P("tp"))),
                jax.device_put(jnp.asarray(sa_s),
                               NamedSharding(m, P("tp", None))),
                jax.device_put(jnp.asarray(lut2_s),
                               NamedSharding(m, P("tp", None, None))))
        fn = pmesh.make_sharded_align_pass_pos(m, read_len=L, **kw)
        out = fn(*args, reads2b, nlist)
        for key_ in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm",
                     "overflow"):
            np.testing.assert_array_equal(
                np.asarray(out[key_]), np.asarray(ref[key_]),
                err_msg=f"{key_} dp={dp} tp={tp}")


def test_sharded_pe_pos_matches_single(setup_repeat):
    """Position-sharded PAIRED-END pass (make_sharded_pe_pass_pos) ==
    single-chip pe_pass_packed rows, bit-identical at non-binding
    capacities on the repeat-dense genome (VERDICT r4 missing #2: the
    flagship PE workload's multi-chip story)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kit4b_tpu.ops import pe_packed, seed_extend_fast, seed_extend_v3
    from kit4b_tpu.ops.pe_packed import unpack_rows12
    g, idx, _arr = setup_repeat
    assert len(jax.devices()) >= 8
    recs1, recs2 = simreads.sim_reads(g, simreads.SimParams(
        n_reads=64, read_len=100, pe=True, pe_insert_min=250,
        pe_insert_max=450, seed=11, error_mode="uniform", subs_rate=0.01))
    a1 = np.stack([r.codes for r in recs1])
    a2 = np.stack([r.codes for r in recs2])
    L = a1.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    pkw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
               read_len=L, n_compact=512, n_extend=256, max_ml=5,
               max_tot=5, mm_delta=2, min_ins=200, max_ins=500)

    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    nw2 = (L + 15) // 16 + 1
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut2 = seed_extend_v3.make_lut2_device(idx.lut)
    starts_d = jnp.asarray(np.asarray(g.starts, np.int32))
    from kit4b_tpu.align.kalign import pack_reads_2bit
    r2b1, nl1, ok1 = pack_reads_2bit(a1)
    r2b2, nl2, ok2 = pack_reads_2bit(a2)
    assert ok1 and ok2
    ref = unpack_rows12(np.asarray(pe_packed.pe_pass_packed(
        gview, sa_d, lut2, starts_d, jnp.asarray(r2b1), jnp.asarray(nl1),
        jnp.asarray(r2b2), jnp.asarray(nl2), tier2=None, tier3=None,
        **pkw)))

    for dp, tp in ((2, 4), (4, 2)):
        m = pmesh.make_mesh(dp, tp)
        gvb, base, sa_s, lut2_s = pmesh.shard_index_by_position(idx, tp, L)
        args = (jax.device_put(jnp.asarray(gvb),
                               NamedSharding(m, P("tp", None, None))),
                jax.device_put(jnp.asarray(base),
                               NamedSharding(m, P("tp"))),
                jax.device_put(jnp.asarray(sa_s),
                               NamedSharding(m, P("tp", None))),
                jax.device_put(jnp.asarray(lut2_s),
                               NamedSharding(m, P("tp", None, None))))
        p2b1, pn1 = pmesh.pack_reads_sharded(a1, dp)
        p2b2, pn2 = pmesh.pack_reads_sharded(a2, dp)
        fn = pmesh.make_sharded_pe_pass_pos(m, **pkw)
        out = np.asarray(fn(*args, np.asarray(g.starts, np.int32),
                            p2b1, pn1, p2b2, pn2))
        np.testing.assert_array_equal(out, ref,
                                      err_msg=f"dp={dp} tp={tp}")


def test_sharded_deep_pe_pos_matches_single(setup_repeat):
    """Position-sharded deep PE tier == single-device deep pairing at
    non-binding budgets (every bucket below the cap, all windows
    explored): the shard-local capped exploration reduces to the full
    candidate set on both sides."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kit4b_tpu.ops import seed_extend_fast
    from kit4b_tpu.ops.pe_packed import _pair_rows
    from kit4b_tpu.ops.seed_extend_deep import deep_cands_planes
    from kit4b_tpu.ops.seed_extend_fast import finalize_fast
    from kit4b_tpu.ops.seed_extend_v4 import words_from_2bit
    from kit4b_tpu.ops import seed_extend_v3
    g, idx, _arr = setup_repeat
    recs1, recs2 = simreads.sim_reads(g, simreads.SimParams(
        n_reads=32, read_len=100, pe=True, pe_insert_min=250,
        pe_insert_max=450, seed=13, error_mode="uniform", subs_rate=0.01))
    a1 = np.stack([r.codes for r in recs1])
    a2 = np.stack([r.codes for r in recs2])
    L = a1.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    dkw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
               read_len=L, n_blocks=8, block_size=128, n_sel=None,
               skip_bucket=100_000)
    pair_kw = dict(L1=L, L2=L, max_tot=5, mm_delta=2, min_ins=200,
                   max_ins=500)

    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    nw2 = (L + 15) // 16 + 1
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut2 = seed_extend_v3.make_lut2_device(idx.lut)
    starts_d = jnp.asarray(np.asarray(g.starts, np.int32))
    from kit4b_tpu.align.kalign import pack_reads_2bit
    r2b1, nl1, _ = pack_reads_2bit(a1)
    r2b2, nl2, _ = pack_reads_2bit(a2)

    def single_mate(r2b, nl):
        planes = words_from_2bit(jnp.asarray(r2b), jnp.asarray(nl), L)
        ids, mm = deep_cands_planes(gview, sa_d, lut2, planes, **dkw)
        return finalize_fast(ids.T, mm.T, max_ml=5)

    f1 = single_mate(r2b1, nl1)
    f2 = single_mate(r2b2, nl2)
    no = jnp.zeros(a1.shape[0], bool)
    ref = np.asarray(_pair_rows(f1, f2, no, no, starts_d, **pair_kw))

    for dp, tp in ((2, 4), (4, 2)):
        m = pmesh.make_mesh(dp, tp)
        gvb, base, sa_s, lut2_s = pmesh.shard_index_by_position(idx, tp, L)
        args = (jax.device_put(jnp.asarray(gvb),
                               NamedSharding(m, P("tp", None, None))),
                jax.device_put(jnp.asarray(base),
                               NamedSharding(m, P("tp"))),
                jax.device_put(jnp.asarray(sa_s),
                               NamedSharding(m, P("tp", None))),
                jax.device_put(jnp.asarray(lut2_s),
                               NamedSharding(m, P("tp", None, None))))
        p2b1, pn1 = pmesh.pack_reads_sharded(a1, dp)
        p2b2, pn2 = pmesh.pack_reads_sharded(a2, dp)
        fn = pmesh.make_sharded_deep_pe_pass_pos(
            m, genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
            read_len=L, n_blocks=8, block_size=128, max_ml=5,
            skip_bucket=100_000, n_sel=None, **{k: v for k, v in
                                                pair_kw.items()
                                                if k not in ("L1", "L2")})
        out = np.asarray(fn(*args, np.asarray(g.starts, np.int32),
                            p2b1, pn1, p2b2, pn2))
        np.testing.assert_array_equal(out, ref,
                                      err_msg=f"dp={dp} tp={tp}")
