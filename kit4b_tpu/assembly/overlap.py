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
