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


def test_bai_index(tmp_path):
    """BAI written alongside BAM resolves a region query: virtual offsets
    from the chosen bin land exactly on records overlapping the region."""
    import struct
    import zlib
    from kit4b_tpu.io.bam import _reg2bin

    p = tmp_path / "ix.bam"
    # coordinate-sorted alignments spanning >1 bgzf block, 2 refs
    with BamWriter(p, ["c1", "c2"], [100_000, 50_000], index=True) as w:
        for i in range(2000):
            w.write(SamAlignment(f"r{i}", 0, "c1", 1 + i * 40, 254, "60M",
                                 seq="A" * 60, qual="I" * 60))
        for i in range(500):
            w.write(SamAlignment(f"s{i}", 0, "c2", 1 + i * 40, 254, "60M",
                                 seq="C" * 60, qual="I" * 60))
    bai = (tmp_path / "ix.bam.bai").read_bytes()
    assert bai[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", bai, 4)
    assert n_ref == 2

    # parse ref 0's bins
    off = 8
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", bai, off)
        off += 4
        bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", bai, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                c0, c1 = struct.unpack_from("<QQ", bai, off)
                off += 16
                chunks.append((c0, c1))
            bins[b] = chunks
        (n_intv,) = struct.unpack_from("<i", bai, off)
        off += 4
        lin = struct.unpack_from(f"<{n_intv}Q", bai, off)
        off += 8 * n_intv
        refs.append((bins, lin))
    assert off == len(bai)

    # region query c1:40000-40100 -> leaf bin; decode first chunk's record
    beg, end = 40_000, 40_100
    b = _reg2bin(beg, end)
    bins, lin = refs[0]
    assert b in bins or lin, bins.keys()
    # take the linear-index hint for the window and decode the record there
    voff = lin[beg >> 14]
    coffset, uoffset = voff >> 16, voff & 0xFFFF
    raw = open(p, "rb").read()
    # decompress the single bgzf block at coffset
    (xlen,) = struct.unpack_from("<H", raw, coffset + 10)
    (bsize,) = struct.unpack_from("<H", raw, coffset + 16)
    cdata = raw[coffset + 12 + xlen: coffset + bsize + 1 - 8]
    payload = zlib.decompress(cdata, -15)
    # if the record straddles into the next block, append it
    nxt = coffset + bsize + 1
    while len(payload) < uoffset + 36:
        (xl2,) = struct.unpack_from("<H", raw, nxt + 10)
        (bs2,) = struct.unpack_from("<H", raw, nxt + 16)
        payload += zlib.decompress(raw[nxt + 12 + xl2: nxt + bs2 + 1 - 8],
                                   -15)
        nxt += bs2 + 1
    ref_id, pos = struct.unpack_from("<ii", payload, uoffset + 4)
    assert ref_id == 0
    # first record whose 16kb window covers beg must start at/before beg
    # and (since sorted, 40bp step, 60M) within one window of it
    assert pos <= beg
    assert pos >= (beg >> 14 << 14) - 60


def test_csi_index(tmp_path):
    """CSI variant (SAMfile.h:21-58): generalized binning, BGZF container,
    loffset per bin; reduces to BAI bin numbers at min_shift=14/depth=5."""
    from kit4b_tpu.io.bam import (BamWriter, _csi_reg2bin, _reg2bin,
                                  read_bam, read_csi)
    from kit4b_tpu.io.sam import SamAlignment
    import numpy as np
    rng = np.random.default_rng(2)
    for beg in (0, 100, 16384, 1 << 20, (1 << 26) + 5):
        end = beg + int(rng.integers(1, 1000))
        assert _csi_reg2bin(beg, end, 14, 5) == _reg2bin(beg, end)
    p = str(tmp_path / "x.bam")
    alns = [SamAlignment(f"r{i}", 0, "c1", 1 + i * 5000, 254, "50M",
                         seq="A" * 50, qual="I" * 50) for i in range(40)]
    with BamWriter(p, ["c1"], [400_000], index="csi") as w:
        for a in alns:
            w.write(a)
    idx = read_csi(p + ".csi")
    assert idx["min_shift"] == 14 and idx["depth"] == 5
    bins = idx["refs"][0]
    assert bins, "no bins recorded"
    # every chunk window must be monotonically consistent
    for b, v in bins.items():
        assert v["chunks"] and v["loffset"] == v["chunks"][0][0]
    # and the BAM itself still reads back
    assert len(list(read_bam(p))) == 40
