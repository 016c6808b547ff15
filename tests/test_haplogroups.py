"""Haplotype grouping (CallHaplotypes modes 3-6, 10)."""
import numpy as np

from kit4b_tpu.kmer import haplogroups as hg


def _pbas(seed=1, F=24, L=3000, n_groups=3, noise_loci=50):
    """Synthetic sample PBAs: n_groups haplotypes, samples are noisy
    copies; returns (pbas, truth_group_of_sample)."""
    rng = np.random.default_rng(seed)
    # haplotype alleles: single-allele bytes (score-3 in one base slot)
    allele_bytes = np.array([0xC0, 0x30, 0x0C, 0x03], np.uint8)
    haps = allele_bytes[rng.integers(0, 4, (n_groups, L))]
    truth = rng.integers(0, n_groups, F)
    pbas = haps[truth].copy()
    # sample noise: a few loci flipped, some uncovered
    for s in range(F):
        at = rng.integers(0, L, noise_loci)
        pbas[s, at] = allele_bytes[rng.integers(0, 4, noise_loci)]
        nocov = rng.integers(0, L, L // 20)
        pbas[s, nocov] = 0
    return pbas, truth


def test_grouping_recovers_truth():
    pbas, truth = _pbas()
    # the reference targets max_groups as granularity (GroupHaplotypes
    # minimises distance while <= max groups), so request the truth count
    res = hg.gen_haplotype_groups(pbas, "c", 0, max_groups=3, phases=4)
    assert len(res.groups) == 3
    # samples sharing a truth haplotype should co-cluster
    label = np.zeros(len(truth), int)
    for gi, mem in enumerate(res.groups):
        label[mem] = gi
    for t in range(truth.max() + 1):
        idx = np.nonzero(truth == t)[0]
        if len(idx) > 1:
            assert len(set(label[idx])) == 1, \
                f"truth group {t} split: {label[idx]}"


def test_group_at_distance_greedy():
    diffs = np.array([[0, 1, 9, 9],
                      [1, 0, 9, 9],
                      [9, 9, 0, 2],
                      [9, 9, 2, 0]], np.int64)
    groups = hg.group_at_distance(diffs, 3)
    assert sorted(sorted(m.tolist()) for m in groups) == [[0, 1], [2, 3]]
    groups = hg.group_at_distance(diffs, 100)
    assert len(groups) == 1


def test_bin_dgts_finds_segregating_loci():
    rng = np.random.default_rng(3)
    F, L = 30, 500
    allele = np.array([0xC0, 0x30, 0x0C, 0x03], np.uint8)
    base = allele[rng.integers(0, 4, L)]
    pbas = np.tile(base, (F, 1))
    # two groups: samples 0-14 vs 15-29 differ at loci 100 and 300
    pbas[15:, 100] = 0x30 if base[100] != 0x30 else 0x0C
    pbas[15:, 300] = 0x03 if base[300] != 0x03 else 0x0C
    groups = hg.HaploGroups("c", 0, L, 2,
                            [np.arange(0, 15), np.arange(15, 30)])
    dgts = hg.bin_dgts(groups, pbas, min_members=5, min_prop=0.1,
                       min_fmeasure=0.9)
    loci = {d.loci for d in dgts}
    assert loci == {100, 300}
    # each DGT locus reports group-exclusive alleles for both groups
    for d in dgts:
        grps = {g for g, _ in d.group_alleles.values()}
        assert grps == {0, 1}


def test_group_kmers_and_wig(tmp_path):
    rng = np.random.default_rng(5)
    F, L = 20, 400
    allele = np.array([0xC0, 0x30, 0x0C, 0x03], np.uint8)
    hapA = allele[rng.integers(0, 4, L)]
    hapB = hapA.copy()
    # region 100-160: heavy divergence -> k-mers there segregate
    hapB[100:160] = allele[(np.argmax(
        hapB[100:160][:, None] == allele[None, :], axis=1) + 1) % 4]
    pbas = np.concatenate([np.tile(hapA, (10, 1)), np.tile(hapB, (10, 1))])
    groups = hg.HaploGroups("c", 0, L, 2,
                            [np.arange(0, 10), np.arange(10, 20)])
    kmers = hg.group_kmers(groups, pbas, kmer_size=25, min_hamming=5,
                           min_members=5)
    assert kmers
    assert all(100 - 25 < k["loci"] < 160 for k in kmers)
    wig = tmp_path / "g.wig"
    hg.groupings_to_wig(wig, [groups])
    assert "variableStep chrom=c" in wig.read_text()
    csv = tmp_path / "g.csv"
    hg.report_groups_csv(csv, [groups], [f"s{i}" for i in range(20)])
    assert len(csv.read_text().splitlines()) == 3


def test_callhaplotypes_grouping_cli(tmp_path):
    import numpy as np
    from kit4b_tpu.cli import main
    from kit4b_tpu.io.fasta import Genome, SeqRecord
    from kit4b_tpu.kmer.pba import save_pba
    rng = np.random.default_rng(9)
    L = 2000
    g = Genome.from_records(
        [SeqRecord("c1", "", rng.integers(0, 4, L).astype(np.uint8))])
    allele = np.array([0xC0, 0x30, 0x0C, 0x03], np.uint8)
    hapA = allele[rng.integers(0, 4, L)]
    hapB = hapA.copy()
    div = rng.integers(0, L, 200)
    hapB[div] = allele[rng.integers(0, 4, 200)]
    specs = []
    for i in range(12):
        src = hapA if i < 6 else hapB
        pba = src.copy()
        pba[rng.integers(0, L, 40)] = 0
        p = tmp_path / f"s{i}.pba.npz"
        save_pba(p, g, pba, readset=f"s{i}")
        specs.append(f"s{i}={p}")
    out = tmp_path / "groups.csv"
    rc = main(["callhaplotypes", "-m", "3", "-c", *specs,
               "-o", str(out), "-G", "2", "-d", "2", "-D", "1500"])
    assert rc == 0
    rows = out.read_text().splitlines()
    assert len(rows) == 3         # header + 2 groups
    # group members match the A/B split
    mem = [set(r.split('"')[-2].split(";")) for r in rows[1:]]
    assert {frozenset(m) for m in mem} == {
        frozenset({f"s{i}" for i in range(6)}),
        frozenset({f"s{i}" for i in range(6, 12)})}
    # DGT mode runs
    out5 = tmp_path / "dgts.csv"
    rc = main(["callhaplotypes", "-m", "5", "-c", *specs,
               "-o", str(out5), "-G", "2", "-d", "2", "-D", "1500",
               "-n", "3", "--grpdgtsamples", "0.1"])
    assert rc == 0
    assert len(out5.read_text().splitlines()) > 1
