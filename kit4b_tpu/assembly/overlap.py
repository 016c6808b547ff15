"""Suffix-prefix overlap detection over a sequence corpus (device-scored).

The assembly analog of CKit4bdna::GetOverlapAB (ngskit4b/kit4bdna.cpp:7790):
the reference probes 5'/3' flank K-words of each sequence against its sparse
read suffix index and verifies the full overlap with bounded substitutions.
Here the corpus (every live sequence plus its reverse complement) is
concatenated into a genome-like array, indexed with the standard k-mer-LUT
suffix index, and each sequence's PREFIX k-mer is looked up in one batched
device pass: a hit at offset `off` inside sequence A implies a suffix-prefix
overlap of length lenA - off, verified by a masked window compare.

Returns per-sequence candidate edges for the host-side merge matcher
(assemble.py), which replaces the reference's CAS-serialized AtomicSeqMerge
(kit4bdna.cpp:8623) with conflict-free rounds (SURVEY.md §7 "Assembly's
mutable shared store").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import dna
from ..index.sfx_index import SfxIndex
from ..io.fasta import Genome
from .store import SeqStore

INT32_MAX = np.iinfo(np.int32).max
dna_BASE_EOS = dna.BASE_EOS


def corpus_genome(store: SeqStore, with_rc: bool = True):
    """Concatenate live seqs (+ their revcomps) into a Genome-like object.

    Returns (genome, corpus_ids): corpus sequence j corresponds to live seq
    corpus_ids[j] (j >= n_live means revcomp of corpus_ids[j - n_live]).
    """
    live = np.nonzero(store.live_mask())[0]
    arrays = [store.get(int(i)) for i in live]
    if with_rc:
        arrays += [dna.revcomp(a) for a in arrays]
    names = [str(j) for j in range(len(arrays))]
    chunks = []
    starts, lengths = [], []
    pos = 0
    for a in arrays:
        starts.append(pos)
        lengths.append(len(a))
        chunks.append(a)
        chunks.append(np.array([dna.BASE_EOS], np.uint8))
        pos += len(a) + 1
    seq = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
    if len(seq):
        seq[-1] = dna.BASE_EOG
    g = Genome(names, np.asarray(starts, np.int64),
               np.asarray(lengths, np.int64), seq)
    return g, live


@functools.partial(jax.jit,
                   static_argnames=("lut_k", "cand", "win"))
def _overlap_pass(gview, genome_u8, sa, lut, seq_starts, seq_ends,
                  q_start, q_len, *, lut_k, cand, win):
    """For each query seq (prefix at q_start, length q_len), find SA hits
    of its prefix k-mer and score the implied suffix-prefix overlaps.

    The compare runs on 2-bit packed words (16 bases/uint32, XOR +
    popcount) via one row-gather per candidate — the same layout as the
    kalign extension (ops/seed_extend_fast) — instead of the round-1
    per-base gathers. Overlap extents come from seq_starts/seq_ends
    searchsorted on device, so no sentinel scan is needed.

    Returns (hit_pos [B,C], mm [B,C]): hit_pos is the concat position of
    the overlap start inside the partner (INT32_MAX invalid); mm counts
    mismatches over min(partner_remainder, q_len, win) bases.
    """
    from ..ops.seed_extend_fast import MISM_BITS
    B = q_start.shape[0]
    G = genome_u8.shape[0]
    M = sa.shape[0]
    k = lut_k
    nw = (win + 15) // 16
    nw2 = nw + 1
    Gv = gview.shape[0]
    nw2g = gview.shape[1] // 2

    q_start = q_start.astype(jnp.int32)
    q_len = q_len.astype(jnp.int32)
    kidx = q_start[:, None] + jnp.arange(k, dtype=jnp.int32)
    kb = genome_u8[jnp.clip(kidx, 0, G - 1)]
    pow4 = (jnp.uint32(1) << (2 * jnp.arange(k - 1, -1, -1,
                                             dtype=jnp.uint32))).astype(
                                                 jnp.int32)
    keys = jnp.sum(jnp.where(kb < 4, kb, 0).astype(jnp.int32) * pow4,
                   axis=-1, dtype=jnp.int32)
    ok = jnp.all(kb < 4, axis=-1) & (q_len >= k)

    lo = lut[keys]
    hi = lut[keys + 1]
    cnt = jnp.where(ok, jnp.minimum(hi - lo, cand), 0)
    cidx = lo[:, None] + jnp.arange(cand, dtype=jnp.int32)
    cvalid = jnp.arange(cand, dtype=jnp.int32) < cnt[:, None]
    pos = sa[jnp.clip(cidx, 0, M - 1)].astype(jnp.int32)       # [B, C]

    # overlap extent from the partner boundary (no sentinel scan)
    a_idx = jnp.searchsorted(seq_starts, pos, side="right") - 1
    partner_rem = seq_ends[jnp.clip(a_idx, 0, seq_ends.shape[0] - 1)] - pos
    L = jnp.minimum(jnp.minimum(partner_rem, q_len[:, None]),
                    jnp.int32(win))                            # [B, C]
    cvalid = cvalid & (L > 0)

    def rows_at(p):
        w0 = jnp.clip(jnp.where(p >= 0, p, 0) >> 4, 0, Gv - 1)
        rows = gview[w0]
        gw = rows[..., :nw2]
        gb = rows[..., nw2g:nw2g + nw2]
        sh = (2 * (jnp.where(p >= 0, p, 0) & 15)
              ).astype(jnp.uint32)[..., None]
        hi_sh = jnp.uint32(32) - sh

        def shift(words):
            lo_w = words[..., :nw] >> sh
            hi_w = jnp.where(sh == 0, jnp.uint32(0),
                             words[..., 1:] << hi_sh)
            return lo_w | hi_w
        return shift(gw), shift(gb)

    pa, ba = rows_at(pos)                    # partner [B, C, nw]
    pq, bq = rows_at(q_start[:, None])       # query   [B, 1, nw]
    x = pa ^ pq
    mism = (x | (x >> 1)) & MISM_BITS
    badb = (ba | bq) & MISM_BITS             # N/indet counts as mismatch
    # per-word masks truncating at the overlap length L
    nbits = jnp.clip(L[..., None]
                     - 16 * jnp.arange(nw, dtype=jnp.int32)[None, None, :],
                     0, 16)
    full = nbits >= 16
    wmask = jnp.where(
        full, jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << (2 * nbits).astype(jnp.uint32))
        - jnp.uint32(1)) & MISM_BITS
    bits = (mism | badb) & wmask
    mm = jnp.sum(jax.lax.population_count(bits), axis=-1,
                 dtype=jnp.int32)
    mm = jnp.where(cvalid, mm, INT32_MAX)
    pos = jnp.where(cvalid, pos, INT32_MAX)
    return pos, mm


def _kmer_bucket_index(seq: np.ndarray, k: int):
    """(positions int64 key-grouped, lut int64 [4^k + 1]): every clean
    position of the corpus grouped by its k-mer key.

    The overlap pass only resolves PREFIX k-mer buckets (lut[key] ranges
    into a position list); lexicographic order WITHIN a bucket is never
    used, so a stable argsort of keys + bincount replaces the full SA-IS
    suffix build — ~4x cheaper on the per-pass corpus re-index, which
    dominated the config-5 assembly wall-clock (VERDICT r3 item 5 /
    reference GenRdsSfx per-pass re-index, ngskit4b/kit4bdna.cpp:6416)."""
    n = len(seq)
    if n < k:
        return np.zeros(0, np.int64), np.zeros(4 ** k + 1, np.int64)
    isbase = seq < 4
    bad = (~isbase).astype(np.int64)
    cbad = np.concatenate([[0], np.cumsum(bad)])
    ok = np.zeros(n, bool)
    ok[: n - k + 1] = (cbad[k:] - cbad[:-k]) == 0
    pos = np.nonzero(ok)[0]
    w = seq[pos[:, None] + np.arange(k)].astype(np.int64)
    pow4 = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    keys = w @ pow4
    order = np.argsort(keys, kind="stable")
    pos = pos[order]
    counts = np.bincount(keys, minlength=4 ** k)
    lut = np.zeros(4 ** k + 1, np.int64)
    np.cumsum(counts, out=lut[1:])
    return pos, lut


class CorpusIndex:
    """Incremental overlap corpus with STABLE sequence ids (round 5).

    The per-pass full re-probe was 98% of config-5 assembly wall-clock
    (VERDICT r4 weak #3): every pass rebuilt the concatenated corpus,
    a dense 4^k LUT over it, and re-probed EVERY live sequence. This
    index is built once and grows: sequences keep stable ids, merged
    products append (both orientations) with their own sorted key
    blocks, and only CHANGED sequences are probed — the assemble loop
    carries unconsumed edges forward in a pool. Probing both
    orientations of a changed sequence discovers every new edge in both
    directions (suffix(A)->prefix(B) in forward space IS
    suffix(rcB)->prefix(rcA) in the mirrored space), so no edge-remap
    algebra is needed.

    The index is ONE sorted int64 array per block: key * 2^pos_bits +
    position — searchsorted gives each k-mer bucket's position range
    with no 4^k dense table (the dense LUT alone was 59% of the old
    wall-clock at big-corpus passes). Probing is vectorized host numpy:
    on a 2-vCPU host behind a WAN-tunneled chip this beats shipping a
    half-GB row-gather view per pass; the device pass (find_overlaps)
    remains for locally-attached accelerators.

    Reference anchor: CKit4bdna GenRdsSfx per-pass re-index
    (ngskit4b/kit4bdna.cpp:6416) and GetOverlapAB (:7790)."""

    GROW = 1.5

    def __init__(self, arrays: list, *, win: int = 256, cand: int = 16,
                 lut_k: int | None = None):
        from ..index.sfx_index import pick_lut_k
        self.win = win
        self.cand = cand
        total = sum(len(a) for a in arrays) * 2 + 2 * len(arrays) + 16
        self.k = lut_k or pick_lut_k(max(total, 4))
        self.buf = np.full(int(total * self.GROW) + 64 + win,
                           dna.BASE_EOS, np.uint8)
        self.end = 0
        # corpus-seq directory: cid -> (sid, orient, start, length)
        self.c_sid: list[int] = []
        self.c_or: list[int] = []
        self.c_start: list[int] = []
        self.c_len: list[int] = []
        self.alive: list[bool] = []
        self.seqs: list[np.ndarray] = []     # sid -> codes
        self.blocks: list[np.ndarray] = []   # sorted combo arrays
        self._pos_bits = 40                  # combo = key << 40 | pos
        self._key_done = 0
        # bulk write: one concatenate + vectorized directory (a per-seq
        # write loop costs ~100us x N on this host)
        eos = np.array([dna.BASE_EOS], np.uint8)
        parts = []
        for a in arrays:
            parts.append(a)
            parts.append(eos)
            parts.append(dna.revcomp(a))
            parts.append(eos)
        blob = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        self.buf[:len(blob)] = blob
        self.end = len(blob)
        lens = np.asarray([len(a) for a in arrays], np.int64)
        row_len = np.repeat(lens, 2)                     # fwd, rc
        row_adv = row_len + 1                            # + EOS
        row_start = np.concatenate([[0], np.cumsum(row_adv)[:-1]]) \
            if len(row_adv) else np.zeros(0, np.int64)
        self.c_start = row_start.tolist()
        self.c_len = row_len.tolist()
        self.c_sid = np.repeat(np.arange(len(arrays)), 2).tolist()
        self.c_or = np.tile([0, 1], len(arrays)).tolist()
        self.seqs = list(arrays)
        self.alive = [True] * len(arrays)
        # ONE vectorized key pass over the whole buffer: the EOS
        # separators make cross-sequence k-mers invalid automatically,
        # so no per-sequence key extraction is needed (the per-seq loop
        # was 20% of the 0.5 Mbp assembly wall-clock)
        first = self._keys_at(0, self.end)
        first.sort()
        self.blocks.append(first)
        self._key_done = self.end
        self._sorted_starts = None

    # --- construction ---------------------------------------------------
    def _keys_at(self, lo: int, hi: int) -> np.ndarray:
        """Combo entries for every clean k-mer start in buf[lo:hi).

        In-place int32 Horner accumulation + one cumsum bad-window mask:
        the naive int64 out-of-place loop moved ~60 GB of temporaries
        per 90 M-base region on the big passes (k iterations x several
        full-width allocations) and dominated the index build."""
        k = self.k
        seg = self.buf[lo:hi]
        n = len(seg)
        if n < k:
            return np.zeros(0, np.int64)
        m = n - k + 1
        clean = np.where(seg < 4, seg, 0).astype(np.int32)
        keys = clean[:m].copy()
        for j in range(1, k):
            keys *= 4
            keys += clean[j:j + m]
        cb = np.concatenate([[0], np.cumsum((seg >= 4).astype(np.int32))])
        good = (cb[k:] - cb[:-k]) == 0
        pos = np.nonzero(good)[0] + lo
        return (keys[good].astype(np.int64) << self._pos_bits) | pos

    def _write_seq(self, sid: int, arr: np.ndarray) -> None:
        """Write fwd + rc of arr into the buffer + directory (keys are
        extracted lazily over the un-keyed tail region at flush)."""
        need = 2 * len(arr) + 2
        if self.end + need + self.win > len(self.buf):
            nb = np.full(int((self.end + need) * self.GROW) + 64
                         + self.win, dna.BASE_EOS, np.uint8)
            nb[:self.end] = self.buf[:self.end]
            self.buf = nb
        while len(self.seqs) <= sid:
            self.seqs.append(None)
        self.seqs[sid] = arr
        for orient, a in ((0, arr), (1, dna.revcomp(arr))):
            s = self.end
            self.buf[s:s + len(a)] = a
            self.buf[s + len(a)] = dna.BASE_EOS
            self.end = s + len(a) + 1
            self.c_sid.append(sid)
            self.c_or.append(orient)
            self.c_start.append(s)
            self.c_len.append(len(a))
        while len(self.alive) <= sid:
            self.alive.append(True)
        self._sorted_starts = None

    def append(self, arr: np.ndarray) -> int:
        """Add a NEW sequence (merged product); returns its sid."""
        sid = len(self.seqs)
        self._write_seq(sid, arr)
        return sid

    def flush(self):
        if self.end > self._key_done:
            # one vectorized key pass over the appended tail (region
            # boundaries always sit after an EOS separator)
            blk = self._keys_at(self._key_done, self.end)
            blk.sort()
            self.blocks.append(blk)
            self._last_flush = (self._key_done, self.end, blk)
            self._key_done = self.end
        # occasional consolidation keeps the per-probe block count low
        if len(self.blocks) > 24:
            merged = np.concatenate(self.blocks)
            merged.sort()
            self.blocks = [merged]
            self._last_flush = None
        # when most of the buffer is dead bytes, rebuild live-only: dead
        # positions otherwise dominate every bucket scan
        live_b = sum(len(self.seqs[s]) for s in range(len(self.seqs))
                     if self.alive[s] and self.seqs[s] is not None)
        self._dead_frac = 1.0 - 2 * live_b / self.end if self.end else 0.0
        if self.end > 64 and 2 * live_b < 0.25 * self.end:
            self.rebuild()
            self._dead_frac = 0.0

    def rebuild(self):
        """Rewrite the buffer + directory + blocks from live sequences
        only, PRESERVING sids (dead sids keep zero-length directory
        placeholders so cid = 2*sid + orient addressing stays valid)."""
        seqs, alive = self.seqs, self.alive
        total = sum(len(a) for s, a in enumerate(seqs)
                    if a is not None and alive[s]) * 2 \
            + 2 * len(seqs) + 16
        self.buf = np.full(int(total * self.GROW) + 64 + self.win,
                           dna.BASE_EOS, np.uint8)
        self.end = 0
        self.c_sid, self.c_or, self.c_start, self.c_len = [], [], [], []
        self._sorted_starts = None
        for sid, a in enumerate(seqs):
            if a is None or not alive[sid]:
                # zero-length placeholders at the CURRENT end keep
                # c_start monotone (the partner lookup is a searchsorted
                # over it)
                for orient in (0, 1):
                    self.c_sid.append(sid)
                    self.c_or.append(orient)
                    self.c_start.append(self.end)
                    self.c_len.append(0)
                continue
            for orient, arr in ((0, a), (1, dna.revcomp(a))):
                s = self.end
                self.buf[s:s + len(arr)] = arr
                self.buf[s + len(arr)] = dna.BASE_EOS
                self.end = s + len(arr) + 1
                self.c_sid.append(sid)
                self.c_or.append(orient)
                self.c_start.append(s)
                self.c_len.append(len(arr))
        blk = self._keys_at(0, self.end)
        blk.sort()
        self.blocks = [blk]
        self._key_done = self.end
        self._last_flush = None

    def kill(self, sid: int):
        self.alive[sid] = False

    def containments_in(self, sids, *, max_subs_per_100: int = 2,
                        per_pos: int = 16):
        """Sequences CONTAINED IN the given (newly created) sequences.

        Forward probing only finds containment when the INNER sequence
        is the query — an unchanged read absorbed by a new contig would
        never be re-probed. This scans each new contig's k-mer keys
        against a directory of live sequences' PREFIX keys (2 entries
        per live seq), so the contig itself discovers its residents:
        prefix hit at offset off with read_len <= contig_len - off and
        the window compare under budget -> (inner, outer) containment.
        The reference's full per-pass re-probe had this coverage
        implicitly (every read re-probed every pass); this recovers it
        at O(new contig bases), not O(corpus).
        """
        self.flush()
        c_start, c_len, c_sid, c_or = self._dir_arrays()
        k = self.k
        win = self.win
        pb = self._pos_bits
        alive_a = np.asarray(self.alive, bool)
        # live prefix-key directory: (key << pb | cid), sorted
        ncid = len(c_start)
        liv = alive_a[c_sid[:ncid]] & (c_len[:ncid] >= k)
        cids = np.nonzero(liv)[0]
        if not len(cids) or not sids:
            return np.zeros((0, 2), np.int64)
        pk = np.zeros(len(cids), np.int64)
        for j in range(k):
            b = self.buf[c_start[cids] + j]
            pk = pk * 4 + np.where(b < 4, b, 0)
        bad = np.zeros(len(cids), bool)
        for j in range(k):
            bad |= self.buf[c_start[cids] + j] >= 4
        # FLIPPED lookup (round-5 perf): the probed (new) region's k-mer
        # combos sort ONCE; each live sequence's prefix key then
        # searchsorts into it — 2 queries per live seq against the
        # region instead of one query per region position against the
        # prefix directory (the region is ~100x larger than the live
        # set on the big early passes)
        live_sids = [s for s in sids
                     if self.alive[s] and self.seqs[s] is not None]
        if not live_sids:
            return np.zeros((0, 2), np.int64)
        in_probe = np.zeros(len(self.seqs), bool)
        in_probe[live_sids] = True
        lo_r = min(int(c_start[2 * s]) for s in live_sids)
        hi_r = max(int(c_start[2 * s] + c_len[2 * s]) for s in live_sids)
        lf = getattr(self, "_last_flush", None)
        if lf is not None and lf[0] <= lo_r and hi_r <= lf[1]:
            # the flush that indexed this pass's appends already keyed
            # and sorted exactly this region — reuse its block
            region = lf[2]
        else:
            region = self._keys_at(lo_r, hi_r)  # (key << pb) | pos
            if not len(region):
                return np.zeros((0, 2), np.int64)
            region = np.sort(region)
        if not len(region):
            return np.zeros((0, 2), np.int64)
        liv_cids = cids[~bad]
        pkv = pk[~bad]
        lo = np.searchsorted(region, pkv << pb)
        hi = np.searchsorted(region, (pkv + 1) << pb)
        cnt = np.minimum(hi - lo, per_pos)
        total = int(cnt.sum())
        if not total:
            return np.zeros((0, 2), np.int64)
        qi = np.repeat(np.arange(len(pkv)), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ppos = (region[lo[qi] + offs] & ((1 << pb) - 1)).astype(np.int64)
        rcid = liv_cids[qi]                     # the (maybe) inner seq
        rsid = c_sid[rcid]
        rl = c_len[rcid]
        ocid = np.searchsorted(c_start, ppos, side="right") - 1
        osid = c_sid[ocid]
        o_end = c_start[ocid] + c_len[ocid]
        keep = (rsid != osid) & (c_or[ocid] == 0) & in_probe[osid] \
            & alive_a[rsid] & (rl <= o_end - ppos)   # fits -> containment
        rcid, rl, ppos, oq = rcid[keep], rl[keep], ppos[keep], osid[keep]
        if not len(rcid):
            return np.zeros((0, 2), np.int64)
        o_eff = np.minimum(rl, win)
        out_rows = []
        CH = 1 << 18
        for s0 in range(0, len(rcid), CH):
            sl = slice(s0, min(s0 + CH, len(rcid)))
            oe = o_eff[sl]
            wmax = int(oe.max())
            sw = np.lib.stride_tricks.sliding_window_view(self.buf, wmax)
            top = len(sw) - 1
            aw = sw[np.minimum(ppos[sl], top)]
            bw = sw[np.minimum(c_start[rcid[sl]], top)]
            mask = np.arange(wmax)[None, :] < oe[:, None]
            mm = (((aw != bw) | (aw >= 4) | (bw >= 4)) & mask).sum(axis=1)
            okc = mm <= np.maximum(1, oe * max_subs_per_100 // 100)
            if okc.any():
                out_rows.append(np.stack(
                    [c_sid[rcid[sl][okc]], oq[sl][okc]], axis=1))
        if not out_rows:
            return np.zeros((0, 2), np.int64)
        return np.unique(np.concatenate(out_rows), axis=0)

    def live_sids(self):
        return [s for s, a in enumerate(self.alive)
                if a and self.seqs[s] is not None]

    # --- probing --------------------------------------------------------
    def _dir_arrays(self):
        if self._sorted_starts is None:
            self._c_start_a = np.asarray(self.c_start, np.int64)
            self._c_len_a = np.asarray(self.c_len, np.int64)
            self._c_sid_a = np.asarray(self.c_sid, np.int64)
            self._c_or_a = np.asarray(self.c_or, np.int64)
            self._sorted_starts = True
        return (self._c_start_a, self._c_len_a, self._c_sid_a,
                self._c_or_a)

    def probe(self, sids, *, min_overlap: int, max_subs_per_100: int = 2,
              chunk: int = 16384):
        """Probe BOTH orientations of each sid as queries. Returns
        (edges, contained): edges [E, 6] int64 rows (a_sid, a_or, b_sid,
        b_or, o, mm) meaning suffix(a)->prefix(b) with o >= min_overlap;
        contained [C, 2] int64 rows (inner_sid, outer_sid). Queries run
        in chunks to bound the candidate-window working set."""
        self.flush()
        sids = [s for s in sids if self.alive[s]]
        e_parts, c_parts = [], []
        for s0 in range(0, len(sids), chunk):
            e, c = self._probe_chunk(sids[s0:s0 + chunk],
                                     min_overlap=min_overlap,
                                     max_subs_per_100=max_subs_per_100)
            e_parts.append(e)
            c_parts.append(c)
        z6 = np.zeros((0, 6), np.int64)
        z2 = np.zeros((0, 2), np.int64)
        return (np.concatenate(e_parts) if e_parts else z6,
                np.concatenate(c_parts) if c_parts else z2)

    def _probe_chunk(self, sids, *, min_overlap: int,
                     max_subs_per_100: int):
        c_start, c_len, c_sid, c_or = self._dir_arrays()
        k = self.k
        win = self.win
        cand = self.cand
        alive_a = np.asarray(self.alive, bool)
        z = (np.zeros((0, 6), np.int64), np.zeros((0, 2), np.int64))
        if not sids:
            return z
        qcid = []
        for s in sids:
            qcid.extend((2 * s, 2 * s + 1))
        qcid = np.asarray(qcid, np.int64)
        qs = c_start[qcid]
        ql = c_len[qcid]
        okq = ql >= k          # short seqs still probe (containment)
        # prefix keys (skip N-containing prefixes)
        keys = np.zeros(len(qcid), np.int64)
        badq = np.zeros(len(qcid), bool)
        for j in range(k):
            b = self.buf[np.clip(qs + j, 0, len(self.buf) - 1)]
            keys = keys * 4 + np.where(b < 4, b, 0)
            badq |= b >= 4
        okq &= ~badq
        # candidate positions per query: up to `cand` per block
        pb = self._pos_bits
        cand_pos = []
        cand_q = []
        q_sid = c_sid[qcid]
        for blk in self.blocks:
            if not len(blk):
                continue
            lo = np.searchsorted(blk, keys << pb)
            hi = np.searchsorted(blk, (keys + 1) << pb)
            # scan up to 4x the cap, filter DEAD partners, then keep the
            # first `cand` live ones — dead seqs' positions stay in the
            # blocks after kills and must not starve the cap. When the
            # buffer is (almost) all live (fresh build / post-rebuild),
            # skip the prefilter entirely.
            mult = 1 if getattr(self, "_dead_frac", 0.0) < 0.05 else 4
            cnt = np.minimum(hi - lo, mult * cand) * okq
            total = int(cnt.sum())
            if not total:
                continue
            qi = np.repeat(np.arange(len(qcid)), cnt)
            offs = np.arange(total) - np.repeat(
                np.cumsum(cnt) - cnt, cnt)
            p = blk[lo[qi] + offs] & ((1 << pb) - 1)
            if mult > 1:
                a_cid0 = np.searchsorted(c_start, p, side="right") - 1
                a_sid0 = c_sid[a_cid0]
                keep0 = alive_a[a_sid0] & (a_sid0 != q_sid[qi]) \
                    & (c_len[a_cid0] > 0)
                qi, p = qi[keep0], p[keep0]
                if not len(p):
                    continue
                rr = np.arange(len(qi))
                newg = np.empty(len(qi), bool)
                newg[0] = True
                newg[1:] = qi[1:] != qi[:-1]
                seg_start = np.maximum.accumulate(np.where(newg, rr, 0))
                keep1 = (rr - seg_start) < cand
                qi, p = qi[keep1], p[keep1]
            cand_pos.append(p)
            cand_q.append(qi)
        if not cand_pos:
            return z
        p = np.concatenate(cand_pos)
        qi = np.concatenate(cand_q)
        # partner lookup + self/dead filtering
        a_cid = np.searchsorted(c_start, p, side="right") - 1
        a_sid = c_sid[a_cid]
        b_cid = qcid[qi]
        b_sid = c_sid[b_cid]
        keep = (a_sid != b_sid) & alive_a[a_sid]
        p, qi, a_cid = p[keep], qi[keep], a_cid[keep]
        if not len(p):
            return z
        rem = (c_start[a_cid] + c_len[a_cid] - p)
        o = rem                                # implied overlap length
        lb = c_len[qcid[qi]]
        o_eff = np.minimum(np.minimum(o, lb), win).astype(np.int64)
        # keep only candidates that can become an edge (o >= threshold)
        # or a containment (query fits, o >= lb)
        keep = (o_eff > 0) & ((o >= min_overlap) | (o >= lb))
        p, qi, a_cid, o, o_eff = (x[keep] for x in
                                  (p, qi, a_cid, o, o_eff))
        if not len(p):
            return z
        # vectorized window compare (bounded at `win` bases) via
        # sliding_window_view row gathers: a broadcasted index matrix
        # here would materialise [N, win] int64 indices (0.5 GB per
        # chunk at N=260K) — the view keeps the index at [N]
        wmax = int(o_eff.max())
        sw = np.lib.stride_tricks.sliding_window_view(self.buf, wmax)
        top = len(sw) - 1
        aw = sw[np.minimum(p, top)]
        bw = sw[np.minimum(c_start[qcid[qi]], top)]
        mask = np.arange(wmax)[None, :] < o_eff[:, None]
        mm = (((aw != bw) | (aw >= 4) | (bw >= 4)) & mask).sum(axis=1)
        max_mm = np.maximum(1, o_eff * max_subs_per_100 // 100)
        keep = mm <= max_mm
        p, qi, a_cid, o, mm = (x[keep] for x in (p, qi, a_cid, o, mm))
        a_sid = c_sid[a_cid]
        a_or = c_or[a_cid]
        b_sid = c_sid[qcid[qi]]
        b_or = c_or[qcid[qi]]
        lb = c_len[qcid[qi]]
        is_cont = o >= lb                      # query contained in partner
        cont = np.stack([b_sid[is_cont], a_sid[is_cont]],
                        axis=1) if is_cont.any() \
            else np.zeros((0, 2), np.int64)
        ok = (~is_cont) & (o >= min_overlap)
        edges = np.stack([a_sid[ok], a_or[ok], b_sid[ok], b_or[ok],
                          o[ok], mm[ok]], axis=1).astype(np.int64)
        return edges, cont


def find_overlaps(store: SeqStore, *, min_overlap: int = 30,
                  max_subs_per_100: int = 2, cand: int = 16,
                  win: int = 256, batch: int = 8192,
                  with_rc: bool = True):
    """Device-scored overlap candidates for every live sequence.

    Returns (edges, contained):
      edges: list of (a_corpus, b_corpus, overlap_len, mm) suffix(a)->prefix(b)
      contained: set of corpus ids fully matched inside another sequence
    Corpus id j in [0, n): forward live seq; j in [n, 2n): its revcomp.
    """
    from ..index.sfx_index import pick_lut_k
    from ..ops.extend_packed import pack_genome
    from ..ops.seed_extend_fast import make_gview

    g, live = corpus_genome(store, with_rc)
    n_corpus = len(g.names)
    if n_corpus == 0:
        return [], set()
    lut_k = pick_lut_k(len(g.seq))
    kpos, klut = _kmer_bucket_index(g.seq, lut_k)

    class _Idx:     # duck-typed SfxIndex view for the pass below
        pass
    idx = _Idx()
    idx.lut_k = lut_k
    idx.sa_clean = kpos
    idx.lut = klut
    genome_d = jnp.asarray(g.seq)
    sa_d = jnp.asarray(idx.sa_clean.astype(np.int32))
    lut_d = jnp.asarray(idx.lut.astype(np.int32))
    nw2 = (win + 15) // 16 + 1
    gpack, gbad = pack_genome(g.seq, nw2 + 1)
    gview_d = jnp.asarray(make_gview(gpack, gbad, nw2))

    starts = g.starts
    lengths = g.lengths
    ends = starts + lengths
    starts_d = jnp.asarray(starts.astype(np.int32))
    ends_d = jnp.asarray(ends.astype(np.int32))
    edges = []
    contained: set[int] = set()
    n_live = len(live)

    def submit(s):
        q_ids = np.arange(s, min(s + batch, n_corpus))
        nb = len(q_ids)
        qs = starts[q_ids]
        ql = lengths[q_ids]
        if nb < batch:
            qs = np.concatenate([qs, np.zeros(batch - nb, np.int64)])
            ql = np.concatenate([ql, np.zeros(batch - nb, np.int64)])
        return q_ids, nb, _overlap_pass(
            gview_d, genome_d, sa_d, lut_d, starts_d, ends_d,
            jnp.asarray(qs), jnp.asarray(ql),
            lut_k=idx.lut_k, cand=cand, win=win)

    def drain(q_ids, nb, dev):
        pos, mm = (np.asarray(x) for x in jax.device_get(dev))
        pos = pos[:nb]
        mm = mm[:nb]
        # vectorized edge extraction (was a per-candidate host loop)
        valid = pos != INT32_MAX
        b_corpus = np.broadcast_to(q_ids[:, None], pos.shape)
        a_corpus = np.searchsorted(starts, np.where(valid, pos, 0),
                                   side="right") - 1
        valid &= a_corpus != b_corpus
        if with_rc:
            valid &= (a_corpus % n_live) != (b_corpus % n_live)
        off = np.where(valid, pos, 0) - starts[a_corpus]
        la = lengths[a_corpus]
        lb = lengths[b_corpus]
        o = la - off
        valid &= o > 0
        o_eff = np.minimum(np.minimum(o, lb), win)
        max_mm = np.maximum(1, o_eff * max_subs_per_100 // 100)
        valid &= mm <= max_mm
        is_cont = valid & (o >= lb)
        keep_cont = is_cont & ((la > lb)
                               | ((a_corpus % n_live)
                                  < (b_corpus % n_live)))
        contained.update(b_corpus[keep_cont].tolist())
        is_edge = valid & ~is_cont & (o >= min_overlap)
        for a, b, oo, m in zip(a_corpus[is_edge].tolist(),
                               b_corpus[is_edge].tolist(),
                               o[is_edge].tolist(),
                               mm[is_edge].tolist()):
            edges.append((a, b, oo, m))

    pending = []
    for s in range(0, n_corpus, batch):
        pending.append(submit(s))
        if len(pending) >= 2:
            drain(*pending.pop(0))
    for item in pending:
        drain(*item)
    return edges, contained
