"""Paired-end alignment: pairing, insert constraints, orphan rescue, SAM."""
import numpy as np
import pytest

from kit4b_tpu import dna
from kit4b_tpu.align import kalign, pe
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome, SeqRecord
from kit4b_tpu.sim import simreads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    n = 200_000
    seq = np.concatenate([rng.integers(0, 4, n).astype(np.uint8),
                          [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([n]), seq)
    idx = SfxIndex.build(g)
    r1, r2 = simreads.sim_reads(
        g, simreads.SimParams(n_reads=400, read_len=100, pe=True,
                              pe_insert_min=250, pe_insert_max=450,
                              seed=5, error_mode="uniform", subs_rate=0.01))
    return g, idx, r1, r2


def test_pe_pairing(setup):
    g, idx, r1, r2 = setup
    al = kalign.KAligner(idx, batch_size=512)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=500, pe_mode=2)
    n_acc = n_ok = 0
    for rec1, rec2, pp in pal.align_pairs(r1, r2):
        if pp.nar != pe.NAR_PE_ACCEPTED:
            continue
        n_acc += 1
        t1 = simreads.parse_truth(rec1.name)
        t2 = simreads.parse_truth(rec2.name)
        if (pp.r1.pos == t1["start"] and pp.r2.pos == t2["start"]
                and ("-" if pp.r1.strand else "+") == t1["strand"]
                and ("-" if pp.r2.strand else "+") == t2["strand"]):
            n_ok += 1
        assert 200 <= pp.tlen <= 500
    assert n_acc >= 0.95 * len(r1)
    assert n_ok == n_acc


def test_pe_insert_rejection(setup):
    g, idx, r1, r2 = setup
    al = kalign.KAligner(idx, batch_size=512)
    # window excludes the simulated 250-450 inserts
    pal = pe.PeAligner(al, pair_min_len=25, pair_max_len=100, pe_mode=2)
    accepted = [pp for _, _, pp in pal.align_pairs(r1[:64], r2[:64])
                if pp.nar == pe.NAR_PE_ACCEPTED]
    assert not accepted


def test_pe_orphan_rescue(setup):
    g, idx, r1, r2 = setup
    al = kalign.KAligner(idx, batch_size=512)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=500, pe_mode=1)
    # corrupt mate2's seed regions so direct alignment fails, rescue must
    # recover it from the anchor window: plant 20 scattered subs
    rng = np.random.default_rng(2)
    recs1, recs2 = [], []
    for rec1, rec2 in zip(r1[:32], r2[:32]):
        c = rec2.codes.copy()
        idxs = rng.choice(len(c), 25, replace=False)
        c[idxs] = (c[idxs] + 1) % 4
        recs1.append(rec1)
        recs2.append(SeqRecord(rec2.name, rec2.descr, c))
    out = list(pal.align_pairs(recs1, recs2))
    # mate2 has 25 subs > budget (5) -> unalignable directly; rescue scans
    # the window but 25 subs still exceeds budget, so pairs stay unpaired
    assert all(pp.nar == pe.NAR_PE_NOPAIR for _, _, pp in out)

    # now corrupt only 3 bases inside the first seed window: direct seed may
    # miss but rescue must find it
    recs2b = []
    for rec2 in r2[:32]:
        c = rec2.codes.copy()
        c[[3, 17, 30]] = (c[[3, 17, 30]] + 1) % 4
        recs2b.append(SeqRecord(rec2.name, rec2.descr, c))
    out = list(pal.align_pairs(r1[:32], recs2b))
    acc = [pp for _, _, pp in out if pp.nar == pe.NAR_PE_ACCEPTED]
    # nearly all pair (direct or rescued); a few reads legitimately exceed
    # the 5-sub budget once the 3 planted subs stack on simulated errors
    assert len(acc) >= 26


@pytest.fixture(scope="module")
def setup_repeats():
    """Repeat-dense genome: drives tier-1 overflow so the packed PE pass's
    in-graph tier-2/tier-3 escalation is exercised."""
    rng = np.random.default_rng(31)
    n = 200_000
    seq = rng.integers(0, 4, n).astype(np.uint8)
    unit = rng.integers(0, 4, 300).astype(np.uint8)
    for i in range(40):
        p = 2000 + i * 4500
        seq[p:p + 300] = unit
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["c1"], np.array([0]), np.array([n]), seq)
    idx = SfxIndex.build(g)
    r1, r2 = simreads.sim_reads(
        g, simreads.SimParams(n_reads=400, read_len=100, pe=True,
                              pe_insert_min=250, pe_insert_max=450,
                              seed=9, error_mode="uniform", subs_rate=0.01))
    return g, idx, r1, r2


@pytest.mark.parametrize("fixture", ["setup", "setup_repeats"])
def test_pe_packed_matches_fallback(fixture, request):
    """The packed-native total PE pass (ops/pe_packed.py) produces the same
    PePair stream as the round-2 byte-tensor device path + host escalation
    ladder, on clean AND repeat-dense genomes."""
    g, idx, r1, r2 = request.getfixturevalue(fixture)
    al = kalign.KAligner(idx, batch_size=256)
    pal_new = pe.PeAligner(al, pair_min_len=200, pair_max_len=500,
                           pe_mode=2)
    pal_old = pe.PeAligner(al, pair_min_len=200, pair_max_len=500,
                           pe_mode=2)
    pal_old.use_packed = False
    out_new = list(pal_new.align_pairs(r1, r2))
    out_old = list(pal_old.align_pairs(r1, r2))
    assert len(out_new) == len(out_old)
    n_acc = 0
    for (a1, a2, pn), (b1, b2, po) in zip(out_new, out_old):
        assert a1.name == b1.name
        assert pn.nar == po.nar, a1.name
        if pn.nar == pe.NAR_PE_ACCEPTED:
            n_acc += 1
            assert (pn.r1.pos, pn.r1.strand, pn.r1.mm) == \
                   (po.r1.pos, po.r1.strand, po.r1.mm)
            assert (pn.r2.pos, pn.r2.strand, pn.r2.mm) == \
                   (po.r2.pos, po.r2.strand, po.r2.mm)
            assert pn.tlen == po.tlen
    assert n_acc >= 0.9 * len(r1)


def test_pe_sam(tmp_path, setup):
    g, idx, r1, r2 = setup
    al = kalign.KAligner(idx, batch_size=512)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=500, pe_mode=2)
    stats = pal.write_sam(tmp_path / "pe.sam", pal.align_pairs(r1, r2))
    assert stats[pe.NAR_PE_ACCEPTED] >= 0.95 * stats["pairs"]
    lines = [l for l in (tmp_path / "pe.sam").read_text().splitlines()
             if not l.startswith("@")]
    assert len(lines) == 2 * stats["pairs"]
    by_name = {}
    for l in lines:
        f = l.split("\t")
        by_name.setdefault(f[0].rsplit("|", 8)[1], []).append(f)
    n_checked = 0
    for name, (a, b) in list(by_name.items())[:50]:
        fa, fb = int(a[1]), int(b[1])
        if fa & 0x4 or fb & 0x4:
            continue
        assert fa & 0x1 and fb & 0x1           # paired
        assert (fa & 0x40) != (fb & 0x40)      # first/second distinct
        assert a[6] == "=" and b[6] == "="
        assert int(a[8]) == -int(b[8])         # TLEN mirrored
        assert int(a[7]) == int(b[3])          # PNEXT == mate POS
        n_checked += 1
    assert n_checked > 30


def test_deep_stats_matches_full(setup_repeats):
    """Deep blockwise exploration (ops/seed_extend_deep) returns the same
    stats as a single big uncapped pass when every bucket fits the cap."""
    import jax.numpy as jnp
    from kit4b_tpu.ops import seed_extend_deep as D
    from kit4b_tpu.ops import seed_extend_fast as F
    g, idx, r1, r2 = setup_repeats
    al = kalign.KAligner(idx, batch_size=256)
    reads = np.stack([r.codes for r in r1[:256]])
    L = reads.shape[1]
    _, mtm = al.schedule_for(L)
    gview, sa, lut, lut2 = al._device_for(L)
    offs = al._offsets_for(L, mtm)
    from kit4b_tpu.align.kalign import pack_reads_2bit
    from kit4b_tpu.ops.seed_extend_v4 import words_from_2bit
    r2b, nl, ok = pack_reads_2bit(reads)
    assert ok
    planes = words_from_2bit(jnp.asarray(r2b), jnp.asarray(nl), L)
    deep = D.deep_stats_planes(
        gview, sa, lut2, planes, genome_len=len(g.seq), offsets=offs,
        lut_k=idx.lut_k, read_len=L, n_blocks=16, block_size=128,
        max_ml=al.max_ml)
    ref = F.fast_pass(gview, sa, lut, jnp.asarray(reads),
                      genome_len=len(g.seq), offsets=offs,
                      lut_k=idx.lut_k, n_compact=2048, max_ml=al.max_ml)
    assert not np.asarray(ref["overflow"]).any()
    for key in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm"):
        np.testing.assert_array_equal(np.asarray(deep[key]),
                                      np.asarray(ref[key]), err_msg=key)


def test_pe_write_sam_fast_matches_slow(tmp_path, setup):
    """write_sam_fast (native bulk PE formatter) produces byte-identical
    records to the per-record write_sam path."""
    g, idx, r1, r2 = setup
    al = kalign.KAligner(idx, batch_size=512)
    pal = pe.PeAligner(al, pair_min_len=200, pair_max_len=500, pe_mode=1)
    pairs = list(pal.align_pairs(r1, r2))
    s1 = pal.write_sam(tmp_path / "slow.sam", iter(pairs))
    s2 = pal.write_sam_fast(tmp_path / "fast.sam", iter(pairs))
    assert s1 == s2
    slow = (tmp_path / "slow.sam").read_text().splitlines()
    fast = (tmp_path / "fast.sam").read_text().splitlines()
    assert slow == fast
