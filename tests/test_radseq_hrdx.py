"""RADseq stack assembly + hrdx homozygotic reduction."""
import numpy as np

from kit4b_tpu.io.fasta import SeqRecord


def _reads_from(locus: np.ndarray, n: int, rng, sub_at: int = -1,
                alt: int = -1, het_frac: float = 0.0):
    out = []
    for i in range(n):
        codes = locus.copy()
        if sub_at >= 0 and rng.random() < het_frac:
            codes[sub_at] = alt
        out.append(SeqRecord(f"r{rng.integers(1 << 30)}", "", codes))
    return out


def test_radseq_stacks_and_variants():
    from kit4b_tpu.assembly.radseq import stack_p1
    rng = np.random.default_rng(7)
    locus1 = rng.integers(0, 4, 90).astype(np.uint8)
    locus2 = rng.integers(0, 4, 90).astype(np.uint8)
    while locus2[0] == locus1[0]:
        locus2[0] = rng.integers(0, 4)
    reads = []
    # locus1: 20 reads, het SNP at col 40 in ~half
    alt = int((locus1[40] + 1) % 4)
    reads += _reads_from(locus1, 20, rng, sub_at=40, alt=alt,
                         het_frac=0.5)
    # locus2: 12 clean reads
    reads += _reads_from(locus2, 12, rng)
    # noise: 3 reads of a third locus (below depth)
    locus3 = rng.integers(0, 4, 90).astype(np.uint8)
    reads += _reads_from(locus3, 3, rng)
    rng.shuffle(reads)
    stacks = stack_p1(reads, min_depth=10, max_sub_pct=3.0)
    assert len(stacks) == 2
    depths = sorted(s.depth for s in stacks)
    assert depths == [12, 20]
    big = max(stacks, key=lambda s: s.depth)
    assert np.array_equal(big.consensus[:40], locus1[:40])
    var_pos = [v[0] for v in big.variants]
    assert 40 in var_pos
    v = [v for v in big.variants if v[0] == 40][0]
    assert {v[1], v[2]} == {int(locus1[40]), alt}


def test_radseq_p2_assembly():
    from kit4b_tpu.assembly.radseq import Stack, assemble_p2
    rng = np.random.default_rng(3)
    region = rng.integers(0, 4, 300).astype(np.uint8)
    # P2 mates tile [0, 300) with 60bp reads every 30bp
    p2 = [SeqRecord(f"p{i}", "", region[i * 30:i * 30 + 60])
          for i in range(9)]
    stack = Stack(consensus=region[:90], depth=9,
                  read_ids=list(range(9)))
    contig = assemble_p2(stack, p2, min_overlap=20)
    assert contig is not None and len(contig) >= 250
    assert np.array_equal(contig, region[:len(contig)])


def test_hrdx_reduces_haplotype_copies(tmp_path):
    from kit4b_tpu.assembly.hrdx import reduce_homozygous
    rng = np.random.default_rng(11)
    hapA = rng.integers(0, 4, 2000).astype(np.uint8)
    hapB = hapA.copy()
    # 1% divergent haplotype copy (within 3 subs/100 homozygous bound)
    idx = rng.choice(2000, 20, replace=False)
    hapB[idx] = (hapB[idx] + 1) % 4
    other = rng.integers(0, 4, 1500).astype(np.uint8)
    recs = [SeqRecord("ctgA", "", hapA),
            SeqRecord("ctgB", "", hapB[:1600]),   # shorter copy
            SeqRecord("ctgC", "", other)]
    kept, stats = reduce_homozygous(recs, max_homozy_subs=3,
                                    min_homozy_len=75)
    names = {r.name for r in kept}
    assert names == {"ctgA", "ctgC"}
    assert stats["reduced"] == 1


def test_radseq_cli(tmp_path):
    from kit4b_tpu.cli import main
    from kit4b_tpu.io.fasta import write_fasta
    rng = np.random.default_rng(5)
    locus = rng.integers(0, 4, 80).astype(np.uint8)
    reads = _reads_from(locus, 15, rng)
    write_fasta(tmp_path / "p1.fa", reads)
    out = tmp_path / "stacks.fa"
    vcf = tmp_path / "vars.vcf"
    assert main(["radseq", "-i", str(tmp_path / "p1.fa"),
                 "-o", str(out), "-O", str(vcf), "-Z", "10"]) == 0
    txt = out.read_text()
    assert txt.startswith(">stack1")
    assert vcf.read_text().startswith("##fileformat=VCFv4.1")
