"""FM-index over DNA code sequences (CFMIndex parity).

The reference vendors an FM-index implementation
(libkit4b/FMIndex.cpp, ~4.7k LoC: bucketed BWT with MTF+RLE
compression, count/locate/extract queries) reachable through the
bioseq container tooling. This rebuild keeps the same query surface —
count / locate / extract — over a vectorized numpy backend:

- BWT from the existing SA-IS suffix array (index/sa_build)
- occurrence checkpoints every `occ_step` rows (the analog of the
  reference's bucket occ tables)
- sampled suffix positions every `sa_step` rows with LF-walk recovery

Alphabet: base codes 0..3 plus a sentinel; N and sentinels collapse to
code 4 so arbitrary etSeqBase input is accepted.
"""
from __future__ import annotations

import numpy as np

from .sa_build import build_suffix_array

SENTINEL = 5          # lexicographically largest, unique terminator
ALPHA = 6             # 0..3 bases, 4 = N/other, 5 = sentinel


class FMIndex:
    def __init__(self, bwt: np.ndarray, counts: np.ndarray,
                 occ: np.ndarray, occ_step: int,
                 sa_samples: np.ndarray, sa_step: int, n: int):
        self.bwt = bwt
        self.counts = counts          # C[c]: # chars < c
        self.occ = occ                # [ceil(n/occ_step)+1, ALPHA]
        self.occ_step = occ_step
        self.sa_samples = sa_samples  # sampled SA values (row % step == 0)
        self.sa_step = sa_step
        self.n = n                    # text length incl. sentinel

    # --- construction ----------------------------------------------------
    @classmethod
    def build(cls, seq: np.ndarray, *, occ_step: int = 128,
              sa_step: int = 32) -> "FMIndex":
        text = np.where(np.asarray(seq, np.uint8) < 4, seq, 4
                        ).astype(np.uint8)
        text = np.concatenate([text, [SENTINEL]]).astype(np.uint8)
        n = len(text)
        sa = build_suffix_array(text).astype(np.int64)
        bwt = text[(sa - 1) % n]
        hist = np.bincount(text, minlength=ALPHA).astype(np.int64)
        counts = np.concatenate([[0], np.cumsum(hist)[:-1]])
        # occurrence checkpoints: occ[i, c] = # of c in bwt[:i*step]
        nchk = n // occ_step + 1
        onehot = np.zeros((n, ALPHA), np.int64)
        onehot[np.arange(n), bwt] = 1
        cum = np.cumsum(onehot, axis=0)
        occ = np.zeros((nchk + 1, ALPHA), np.int64)
        idx = np.arange(1, nchk + 1) * occ_step
        occ[1:] = cum[np.minimum(idx, n) - 1]
        sample_rows = np.nonzero(sa % sa_step == 0)[0]
        sa_samples = np.full(n // sa_step + 1, -1, np.int64)
        sa_samples[sa[sample_rows] // sa_step] = sample_rows
        # invert: store row -> SA value for rows whose SA % step == 0
        samp = np.full(n, -1, np.int64)
        samp[sample_rows] = sa[sample_rows]
        return cls(bwt, counts, occ, occ_step, samp, sa_step, n)

    # --- rank ------------------------------------------------------------
    def _occ_at(self, c: int, i: np.ndarray) -> np.ndarray:
        """# of c in bwt[:i], vectorized over i."""
        i = np.asarray(i, np.int64)
        chk = i // self.occ_step
        base = self.occ[chk, c]
        out = base.copy()
        # residual scan per query (short: < occ_step)
        for j in range(len(out)):
            lo = int(chk[j]) * self.occ_step
            if i[j] > lo:
                out[j] += int((self.bwt[lo:i[j]] == c).sum())
        return out

    def _lf(self, rows: np.ndarray) -> np.ndarray:
        c = self.bwt[rows]
        out = np.empty(len(rows), np.int64)
        for j, r in enumerate(rows):
            cj = int(c[j])
            out[j] = self.counts[cj] + self._occ_at(
                cj, np.asarray([r]))[0]
        return out

    # --- queries ----------------------------------------------------------
    def search_range(self, pattern: np.ndarray) -> tuple[int, int]:
        """Backward search; returns the half-open SA row range."""
        p = np.where(np.asarray(pattern, np.uint8) < 4, pattern, 4
                     ).astype(np.uint8)
        lo, hi = 0, self.n
        for c in p[::-1]:
            c = int(c)
            lo = int(self.counts[c]
                     + self._occ_at(c, np.asarray([lo]))[0])
            hi = int(self.counts[c]
                     + self._occ_at(c, np.asarray([hi]))[0])
            if lo >= hi:
                return 0, 0
        return lo, hi

    def count(self, pattern: np.ndarray) -> int:
        lo, hi = self.search_range(pattern)
        return hi - lo

    def locate(self, pattern: np.ndarray, max_hits: int = 0) -> np.ndarray:
        """Text positions of all occurrences (sorted)."""
        lo, hi = self.search_range(pattern)
        if hi <= lo:
            return np.zeros(0, np.int64)
        rows = np.arange(lo, hi, dtype=np.int64)
        if max_hits and len(rows) > max_hits:
            rows = rows[:max_hits]
        out = np.empty(len(rows), np.int64)
        for j, r in enumerate(rows):
            steps = 0
            rr = int(r)
            while self.sa_samples[rr] < 0:
                c = int(self.bwt[rr])
                rr = int(self.counts[c]
                         + self._occ_at(c, np.asarray([rr]))[0])
                steps += 1
            out[j] = (self.sa_samples[rr] + steps) % self.n
        return np.sort(out)

    def extract(self, start: int, length: int,
                text: np.ndarray | None = None) -> np.ndarray:
        """Recover text[start:start+length] from the index alone
        (FMIndex.cpp extract()): one full LF reconstruction is cached,
        further extracts are slices."""
        n = self.n
        length = min(length, n - 1 - start)
        if not hasattr(self, "_text_cache"):
            rows = np.nonzero(self.sa_samples == 0)[0]
            cur = int(rows[0]) if len(rows) else 0   # SA[cur] == 0
            buf = np.empty(n, np.uint8)
            for i in range(n - 1, -1, -1):
                c = int(self.bwt[cur])
                buf[i] = c
                cur = int(self.counts[c]
                          + self._occ_at(c, np.asarray([cur]))[0])
            self._text_cache = buf[1:] if buf[0] == SENTINEL else buf[:-1]
        return self._text_cache[start:start + length]
