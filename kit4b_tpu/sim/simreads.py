"""simreads: simulated readset generator with embedded ground truth.

Capability parity with the reference CSimReads (libkit4b/SimReads.cpp:1805
GenSimReads, :2229 ThreadSimReads, :272 SimSeqErrors, :137 SimInDels), using
the same ground-truth descriptor layout so the `benchmark` scorer and the
reference's own can read either output
(SimReads.cpp:1655):

    >lcl|NNNNNNNN|chrom|start|end|len|strand|numsubs|indelsize

Strand '-' reads are the reverse complement of genome[start:end+1]; errors are
applied after strand flip (as in the reference, which revcomps before
SimSeqErrors). Vectorized NumPy with a seeded Generator instead of per-thread
CTwister streams.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import dna
from ..io.fasta import Genome, SeqRecord, write_fasta, write_fastq


@dataclass
class SimParams:
    n_reads: int = 100_000
    read_len: int = 100
    pe: bool = False
    pe_insert_min: int = 200     # reference -j MinFragLen
    pe_insert_max: int = 500     # reference -J MaxFragLen
    # error model: 'none', 'uniform', 'illumina' (3'-skewed)
    error_mode: str = "none"
    subs_rate: float = 0.01      # mean per-base substitution rate
    strand: str = "both"         # 'watson' | 'both'
    seed: int = 1


def _apply_errors(reads: np.ndarray, params: SimParams,
                  rng: np.random.Generator) -> np.ndarray:
    """Substitute bases in-place; returns per-read substitution counts.

    'uniform': flat per-base rate. 'illumina': rate ramps linearly to 3x at
    the 3' end (the reference's composite 3'-skewed profile,
    SimReads.cpp:272-…, simplified to its dominant shape).
    """
    n, L = reads.shape
    if params.error_mode == "none":
        return np.zeros(n, dtype=np.int32)
    if params.error_mode == "uniform":
        prate = np.full(L, params.subs_rate)
    elif params.error_mode == "illumina":
        ramp = 0.5 + 2.5 * (np.arange(L) / max(1, L - 1))
        prate = params.subs_rate * ramp / ramp.mean()
    else:
        raise ValueError(f"unknown error mode {params.error_mode}")
    hit = rng.random((n, L)) < prate[None, :]
    hit &= reads < 4  # never substitute Ns
    # substitute with one of the 3 other bases
    delta = rng.integers(1, 4, size=(n, L), dtype=np.uint8)
    reads[hit] = (reads[hit] + delta[hit]) % 4
    return hit.sum(axis=1).astype(np.int32)


def sim_reads(genome: Genome, params: SimParams,
              start_id: int = 1) -> list[SeqRecord]:
    """Generate SE reads (or mate-1 list + mate-2 list when pe=True)."""
    rng = np.random.default_rng(params.seed)
    L = params.read_len
    # Sample chrom proportional to length, then loci uniform within chrom
    # (reference samples loci proportional to scaled chrom lengths,
    # SimReads.cpp:2229 ThreadSimReads).
    probs = genome.lengths / genome.lengths.sum()
    frag_len = (rng.integers(params.pe_insert_min, params.pe_insert_max + 1,
                             params.n_reads)
                if params.pe else np.full(params.n_reads, L))
    frag_len = np.maximum(frag_len, L)
    ci = rng.choice(len(genome.names), size=params.n_reads, p=probs)
    max_start = genome.lengths[ci] - frag_len
    ok = max_start >= 0
    ci, frag_len, max_start = ci[ok], frag_len[ok], max_start[ok]
    n = len(ci)
    start = (rng.random(n) * (max_start + 1)).astype(np.int64)
    if params.strand == "both":
        strand = rng.integers(0, 2, n).astype(np.int8)
    else:
        strand = np.zeros(n, dtype=np.int8)

    gseq = genome.seq
    gstart = genome.starts[ci]

    # mate-1 window: '+' -> [start, start+L); '-' -> end of fragment
    m1_start = np.where(strand == 0, start, start + frag_len - L)
    idx = (gstart + m1_start)[:, None] + np.arange(L)[None, :]
    m1 = gseq[idx].copy()
    rev_rows = strand == 1
    m1[rev_rows] = dna._COMPLEMENT[m1[rev_rows]][:, ::-1]

    subs1 = _apply_errors(m1, params, rng)
    recs1: list[SeqRecord] = []
    for i in range(n):
        name = (f"lcl|{start_id + i:08d}|{genome.names[ci[i]]}|"
                f"{int(m1_start[i])}|{int(m1_start[i]) + L - 1}|{L}|"
                f"{'-' if strand[i] else '+'}|{int(subs1[i])}|0")
        recs1.append(SeqRecord(name, "", m1[i]))
    if not params.pe:
        return recs1

    # mate-2: opposite end of fragment, opposite strand
    m2_strand = 1 - strand
    m2_start = np.where(m2_strand == 0, start, start + frag_len - L)
    idx = (gstart + m2_start)[:, None] + np.arange(L)[None, :]
    m2 = gseq[idx].copy()
    rev2 = m2_strand == 1
    m2[rev2] = dna._COMPLEMENT[m2[rev2]][:, ::-1]
    subs2 = _apply_errors(m2, params, rng)
    recs2: list[SeqRecord] = []
    for i in range(n):
        name = (f"lcl|{start_id + i:08d}|{genome.names[ci[i]]}|"
                f"{int(m2_start[i])}|{int(m2_start[i]) + L - 1}|{L}|"
                f"{'-' if m2_strand[i] else '+'}|{int(subs2[i])}|0")
        recs2.append(SeqRecord(name, "", m2[i]))
    return recs1, recs2


def simulate_snps(genome: Genome, rate: float = 0.001, seed: int = 1):
    """Plant SNPs into a copy of the genome (reference CSimReads::SimulateSNPs,
    libkit4b/SimReads.cpp:1222): each base mutated with probability `rate` to
    one of the three other bases. Returns (mutated Genome, truth list of
    (chrom, loci, ref_base, alt_base))."""
    rng = np.random.default_rng(seed)
    seq = genome.seq.copy()
    can = seq < 4
    hit = (rng.random(len(seq)) < rate) & can
    idx = np.nonzero(hit)[0]
    delta = rng.integers(1, 4, len(idx), dtype=np.uint8)
    alts = (seq[idx] + delta) % 4
    truth = []
    ci, off = genome.locate(idx)
    for j, i in enumerate(idx):
        truth.append((genome.names[int(ci[j])], int(off[j]),
                      int(seq[i]), int(alts[j])))
    seq[idx] = alts
    g2 = Genome(list(genome.names), genome.starts.copy(),
                genome.lengths.copy(), seq)
    return g2, truth


def parse_truth(qname: str):
    """Parse a simreads ground-truth read name -> dict (or None)."""
    parts = qname.split("|")
    if len(parts) != 9 or parts[0] not in ("lcl", "lcr"):
        return None
    return {
        "random": parts[0] == "lcr",
        "read_id": int(parts[1]),
        "chrom": parts[2],
        "start": int(parts[3]),
        "end": int(parts[4]),
        "len": int(parts[5]),
        "strand": parts[6],
        "subs": int(parts[7]),
        "indel": int(parts[8]),
    }


def write_reads(path, records, fmt: str = "fasta") -> None:
    if fmt == "fasta":
        write_fasta(path, records)
    else:
        write_fastq(path, records)
