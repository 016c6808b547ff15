"""BAM/BGZF roundtrip + gzip compatibility."""
import gzip
import numpy as np

from kit4b_tpu.io.bam import BamWriter, read_bam, read_bgzf
from kit4b_tpu.io.sam import SamAlignment


def test_bam_roundtrip(tmp_path):
    p = tmp_path / "t.bam"
    alns = [
        SamAlignment("r1", 0, "c1", 101, 254, "100M", "=", 300, 250,
                     "ACGT" * 25, "I" * 100, tags=("NM:i:2",)),
        SamAlignment("r2", 16, "c2", 5, 254, "10S90M", "*", 0, 0,
                     "GGGG" * 25, "*"),
        SamAlignment("r3", 4, "*", 0, 0, "*", "*", 0, 0, "TTTT" * 25, "*"),
    ]
    with BamWriter(p, ["c1", "c2"], [1000, 2000], pg_cl="test") as w:
        for a in alns:
            w.write(a)
    back = list(read_bam(p))
    assert len(back) == 3
    for a, b in zip(alns, back):
        assert (a.qname, a.flag, a.rname, a.pos, a.cigar) == \
            (b.qname, b.flag, b.rname, b.pos, b.cigar)
        assert a.seq == b.seq
        assert b.tlen == a.tlen and b.pnext == a.pnext
    assert back[0].qual == "I" * 100
    assert back[1].qual == "*"
    # bgzf must also be plain-gzip readable
    raw = gzip.decompress(open(p, "rb").read())
    assert raw[:4] == b"BAM\x01"
    assert raw == read_bgzf(p)


def test_bam_many_records(tmp_path):
    # force multiple bgzf blocks (>64KB)
    p = tmp_path / "big.bam"
    with BamWriter(p, ["c1"], [10_000]) as w:
        for i in range(3000):
            w.write(SamAlignment(f"read{i}", 0, "c1", 1 + i % 1000, 254,
                                 "50M", seq="A" * 50, qual="5" * 50))
    back = list(read_bam(p))
    assert len(back) == 3000
    assert back[-1].qname == "read2999"
