"""FASTA/FASTQ streaming reader and writers (gzip-transparent).

Capability parity with the reference's CFasta (libkit4b/Fasta.cpp:1-…,
Fasta.h:119-129): multifasta + fastq, transparent ``.gz``, quality scores,
descriptor access. Redesigned as Python iterators feeding NumPy code arrays;
there is no line-length or file-size limit.
"""
from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

from .. import dna


@dataclass
class SeqRecord:
    name: str
    descr: str
    codes: np.ndarray  # uint8 base codes (dna.BASE_*)
    qual: np.ndarray | None = None  # phred scores (uint8), fastq only

    def __len__(self) -> int:
        return len(self.codes)


def _open_text(path: str | os.PathLike):
    path = os.fspath(path)
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return io.BufferedReader(f)


def sniff_format(path) -> str:
    """Return 'fasta' or 'fastq' by first non-blank byte."""
    with _open_text(path) as f:
        for line in f:
            s = line.strip()
            if not s:
                continue
            if s.startswith(b">"):
                return "fasta"
            if s.startswith(b"@"):
                return "fastq"
            raise ValueError(f"{path}: not fasta/fastq (leading byte {s[:1]!r})")
    raise ValueError(f"{path}: empty file")


def read_fasta(path) -> Iterator[SeqRecord]:
    """Bulk fasta reader: one IO read + one vectorized decode pass.

    Line-by-line parsing costs ~100ns/byte in Python; reading the whole file
    and splitting on '>' headers costs ~2ns/byte, which matters when the
    aligner itself runs at tens of MB/s of reads.
    """
    with _open_text(path) as f:
        data = f.read()
    if not data:
        return
    # records separated by '\n>' (file may or may not start with '>')
    start = data.find(b">")
    if start < 0:
        raise ValueError(f"{path}: no fasta records")
    for block in data[start + 1:].split(b"\n>"):
        nl = block.find(b"\n")
        if nl < 0:
            hdr, body = block, b""
        else:
            hdr, body = block[:nl], block[nl + 1:]
        hdr = hdr.strip().decode("utf-8", "replace")
        parts = hdr.split(None, 1)
        name = parts[0] if parts else ""
        descr = parts[1] if len(parts) > 1 else ""
        codes = dna.encode(body.replace(b"\n", b"").replace(b"\r", b""))
        yield SeqRecord(name, descr, codes)


def read_fastq(path, phred_base: int = 33) -> Iterator[SeqRecord]:
    with _open_text(path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            hdr = hdr.strip()
            if not hdr:
                continue
            if not hdr.startswith(b"@"):
                raise ValueError(f"{path}: bad fastq header {hdr[:40]!r}")
            seq = f.readline().strip()
            plus = f.readline()
            qual = f.readline().strip()
            if not plus.startswith(b"+"):
                raise ValueError(f"{path}: bad fastq separator for {hdr[:40]!r}")
            h = hdr[1:].decode("utf-8", "replace")
            parts = h.split(None, 1)
            q = np.frombuffer(qual, dtype=np.uint8).astype(np.uint8) - phred_base
            yield SeqRecord(parts[0] if parts else "",
                            parts[1] if len(parts) > 1 else "",
                            dna.encode(seq), q)


def read_seqs(path) -> Iterator[SeqRecord]:
    """Auto-detecting reader."""
    if sniff_format(path) == "fasta":
        yield from read_fasta(path)
    else:
        yield from read_fastq(path)


def read_fastq_blocks(path, batch: int = 32768):
    """Bulk uniform-length fastq block reader for the aligner hot path.

    One IO read + one `split` + one vectorized decode for the whole file
    (no per-read SeqRecord objects — the reference's CProcRawReads bulk
    ingestion idea, ProcRawReads.cpp:2052, redesigned as array blocks).
    Yields `(names: list[bytes], codes: uint8 [n, L], quals: uint8 [n, L]
    raw phred+33 ASCII)` blocks of at most `batch` reads.

    Raises ValueError when read lengths are non-uniform — callers fall
    back to the generic record path.
    """
    with _open_text(path) as f:
        data = f.read()
    if b"\r" in data[:4096]:
        data = data.replace(b"\r", b"")
    lines = data.split(b"\n")
    while lines and not lines[-1]:
        lines.pop()
    if not lines:
        return
    if len(lines) % 4:
        raise ValueError(f"{path}: truncated fastq ({len(lines)} lines)")
    seqs = lines[1::4]
    n = len(seqs)
    L = len(seqs[0])
    seq_cat = b"".join(seqs)
    if len(seq_cat) != n * L:
        raise ValueError(f"{path}: non-uniform fastq read lengths")
    qual_cat = b"".join(lines[3::4])
    if len(qual_cat) != n * L:
        raise ValueError(f"{path}: fastq qual/seq length mismatch")
    names = [ln[1:].split(None, 1)[0] for ln in lines[0::4]]
    codes = dna.encode(seq_cat).reshape(n, L)
    quals = np.frombuffer(qual_cat, dtype=np.uint8).reshape(n, L)
    for i in range(0, n, batch):
        j = min(i + batch, n)
        yield names[i:j], codes[i:j], quals[i:j]


def read_fasta_blocks(path, batch: int = 32768):
    """Bulk uniform-length fasta block reader; same contract as
    read_fastq_blocks but quals is None per block."""
    with _open_text(path) as f:
        data = f.read()
    if b"\r" in data[:4096]:
        data = data.replace(b"\r", b"")
    start = data.find(b">")
    if start < 0:
        raise ValueError(f"{path}: no fasta records")
    names: list[bytes] = []
    bodies: list[bytes] = []
    for block in data[start + 1:].split(b"\n>"):
        nl = block.find(b"\n")
        hdr = block if nl < 0 else block[:nl]
        body = b"" if nl < 0 else block[nl + 1:]
        parts = hdr.split(None, 1)
        names.append(parts[0] if parts else b"")
        bodies.append(body.replace(b"\n", b""))
    n = len(names)
    L = len(bodies[0])
    cat = b"".join(bodies)
    if len(cat) != n * L:
        raise ValueError(f"{path}: non-uniform fasta read lengths")
    codes = dna.encode(cat).reshape(n, L)
    for i in range(0, n, batch):
        j = min(i + batch, n)
        yield names[i:j], codes[i:j], None


def read_seq_blocks(path, batch: int = 32768):
    """Auto-detecting bulk block reader (see read_fastq_blocks)."""
    if sniff_format(path) == "fasta":
        yield from read_fasta_blocks(path, batch)
    else:
        yield from read_fastq_blocks(path, batch)


def write_fasta(path, records, wrap: int = 70) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        for rec in records:
            hdr = f">{rec.name}"
            if rec.descr:
                hdr += f" {rec.descr}"
            f.write(hdr + "\n")
            s = dna.decode(rec.codes)
            for i in range(0, len(s), wrap):
                f.write(s[i:i + wrap] + "\n")


def write_fastq(path, records, phred_base: int = 33) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        for rec in records:
            hdr = f"@{rec.name}"
            if rec.descr:
                hdr += f" {rec.descr}"
            q = rec.qual
            if q is None:
                q = np.full(len(rec.codes), 30, dtype=np.uint8)
            f.write(hdr + "\n")
            f.write(dna.decode(rec.codes) + "\n+\n")
            f.write((q + phred_base).astype(np.uint8).tobytes().decode("ascii") + "\n")


@dataclass
class Genome:
    """A loaded multi-sequence genome: concatenated codes + per-chrom directory.

    Mirrors the reference CSfxArray entries directory (libkit4b/SfxArray.h:97-107):
    each chromosome occupies [start[i], end[i]) in the concatenated array, with a
    single dna.BASE_EOS sentinel between chromosomes (matching the reference's
    concatenated-sequence scheme so cross-chrom window logic can rely on it).
    """
    names: list[str] = field(default_factory=list)
    starts: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    lengths: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    seq: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))

    @classmethod
    def from_records(cls, records) -> "Genome":
        names: list[str] = []
        starts: list[int] = []
        lengths: list[int] = []
        chunks: list[np.ndarray] = []
        pos = 0
        for rec in records:
            names.append(rec.name)
            starts.append(pos)
            lengths.append(len(rec.codes))
            chunks.append(rec.codes)
            chunks.append(np.array([dna.BASE_EOS], dtype=np.uint8))
            pos += len(rec.codes) + 1
        seq = (np.concatenate(chunks) if chunks else np.zeros(0, np.uint8))
        if len(seq):
            seq[-1] = dna.BASE_EOG
        return cls(names, np.asarray(starts, np.int64),
                   np.asarray(lengths, np.int64), seq)

    @classmethod
    def load(cls, *paths) -> "Genome":
        return cls.from_records(rec for path in paths
                                for rec in read_seqs(path))

    @property
    def total_len(self) -> int:
        return int(self.lengths.sum())

    def nchroms(self) -> int:
        return len(self.names)

    def chrom_codes(self, i: int) -> np.ndarray:
        s = int(self.starts[i])
        return self.seq[s:s + int(self.lengths[i])]

    def locate(self, concat_pos: np.ndarray):
        """Map concatenated positions -> (chrom_idx, offset_in_chrom)."""
        idx = np.searchsorted(self.starts, concat_pos, side="right") - 1
        return idx, np.asarray(concat_pos) - self.starts[idx]

    def save_bioseq(self, path) -> None:
        """Pre-parsed binary container (.seq equivalent — CBioSeqFile,
        libkit4b/BioSeqFile.cpp; built by genbioseq): the parsed genome as
        a compressed array bundle for fast reloads."""
        np.savez_compressed(path, magic=np.array("kit4b_tpu.bioseq.v1"),
                            names=np.array(self.names),
                            starts=self.starts, lengths=self.lengths,
                            seq=self.seq)

    @classmethod
    def load_bioseq(cls, path) -> "Genome":
        z = np.load(path, allow_pickle=False)
        if str(z["magic"]) != "kit4b_tpu.bioseq.v1":
            raise ValueError(f"not a kit4b_tpu bioseq file: {path}")
        return cls([str(n) for n in z["names"]], z["starts"],
                   z["lengths"], z["seq"])
