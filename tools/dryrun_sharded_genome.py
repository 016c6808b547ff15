"""Position-sharded kalign dryrun at >100 Mbp (VERDICT r3 item 7).

Builds a synthetic 120 Mbp repeat-seeded genome on an 8-virtual-device CPU
mesh (tp=8), runs the position-sharded production pass
(parallel/mesh.py shard_index_by_position + make_sharded_align_pass_pos),
and certifies:
  * per-device genome-view residency is O(G/tp + halo), reported in MB;
  * results are bit-identical to the single-device production kernel.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dryrun_sharded_genome.py [--mbp 120]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=120.0)
    ap.add_argument("--reads", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kit4b_tpu import dna
    from kit4b_tpu.align.kalign import pack_reads_2bit
    from kit4b_tpu.index.sfx_index import SfxIndex
    from kit4b_tpu.io.fasta import Genome
    from kit4b_tpu.ops import seed_extend_fast, seed_extend_v3
    from kit4b_tpu.parallel import mesh as pmesh
    from kit4b_tpu.sim import simreads
    from jax.sharding import NamedSharding, PartitionSpec as P

    G = int(args.mbp * 1e6)
    rng = np.random.default_rng(7)
    t0 = time.time()
    seq = rng.integers(0, 4, G).astype(np.uint8)
    alu = rng.integers(0, 4, 300).astype(np.uint8)
    for p in rng.integers(0, G - 400, 400):
        seq[p:p + 300] = alu
    seq = np.concatenate([seq, [dna.BASE_EOG]]).astype(np.uint8)
    g = Genome(["big"], np.array([0]), np.array([G]), seq)
    log(f"genome: {G/1e6:.0f} Mbp ({time.time()-t0:.0f}s)")
    t0 = time.time()
    idx = SfxIndex.build(g, lut_k=12)
    log(f"index: clean={len(idx.sa_clean)} lut_k={idx.lut_k} "
        f"({time.time()-t0:.0f}s)")

    recs = simreads.sim_reads(g, simreads.SimParams(
        n_reads=args.reads, read_len=100, seed=3, error_mode="uniform",
        subs_rate=0.02))
    reads = np.stack([r.codes for r in recs])
    L = reads.shape[1]
    offsets = seed_extend_fast.fast_offsets(L, idx.lut_k, 5)
    kw = dict(genome_len=len(g.seq), offsets=offsets, lut_k=idx.lut_k,
              n_compact=512, n_extend=256, max_ml=5)

    # single-device reference (production v3/v4 candidate machinery)
    t0 = time.time()
    nw2 = (L + 15) // 16 + 1
    gpack_d, gbad_d, sa_d, lut_d = idx.device_arrays()
    gview = seed_extend_fast.make_gview_device(
        np.asarray(gpack_d), np.asarray(gbad_d), nw2)
    lut2 = seed_extend_v3.make_lut2_device(idx.lut)
    ref = jax.device_get(seed_extend_v3.fast_pass_v3(
        gview, sa_d, lut2, jnp.asarray(reads), **kw))
    full_mb = gview.nbytes / 1e6
    log(f"single-device pass done ({time.time()-t0:.0f}s); "
        f"full gview {full_mb:.0f} MB")
    del gview, sa_d, lut2, gpack_d, gbad_d, lut_d

    dp, tp = 1, 8
    t0 = time.time()
    gvb, base, sa_s, lut2_s = pmesh.shard_index_by_position(idx, tp, L)
    per_dev_mb = gvb[0].nbytes / 1e6
    log(f"shard build ({time.time()-t0:.0f}s): per-device gview block "
        f"{per_dev_mb:.0f} MB = {per_dev_mb/full_mb:.3f} of full "
        f"(1/tp = {1/tp:.3f})")
    m = pmesh.make_mesh(dp, tp)
    reads2b, nlist = pmesh.pack_reads_sharded(reads, dp)
    fn = pmesh.make_sharded_align_pass_pos(m, read_len=L, **kw)
    args_d = (jax.device_put(jnp.asarray(gvb),
                             NamedSharding(m, P("tp", None, None))),
              jax.device_put(jnp.asarray(base), NamedSharding(m, P("tp"))),
              jax.device_put(jnp.asarray(sa_s),
                             NamedSharding(m, P("tp", None))),
              jax.device_put(jnp.asarray(lut2_s),
                             NamedSharding(m, P("tp", None, None))))
    t0 = time.time()
    out = jax.device_get(fn(*args_d, reads2b, nlist))
    log(f"sharded pass done ({time.time()-t0:.0f}s)")
    # capacity-overflow reads escalate through the host ladder on BOTH
    # paths (their truncated candidate sets legitimately differ between
    # capacity partitionings); bit-identity holds on the resolved rows
    ovf = np.asarray(out["overflow"]) | np.asarray(ref["overflow"])
    keep = ~ovf
    assert keep.mean() > 0.9, f"too many overflow reads ({ovf.sum()})"
    for key in ("low_mm", "n_low", "nxt_mm", "hit_id", "hit_mm"):
        np.testing.assert_array_equal(np.asarray(out[key])[keep],
                                      np.asarray(ref[key])[keep],
                                      err_msg=key)
    n_hit = int((np.asarray(out["low_mm"])[keep] < 2**31 - 1).sum())
    print(f"DRYRUN OK: {G/1e6:.0f} Mbp, tp={tp}, per-device gview "
          f"{per_dev_mb:.0f} MB vs full {full_mb:.0f} MB "
          f"({per_dev_mb/full_mb:.3f}, 1/tp={1/tp:.3f}); "
          f"bit-identical on {int(keep.sum())}/{args.reads} non-overflow reads ({n_hit} hit)")


if __name__ == "__main__":
    main()
