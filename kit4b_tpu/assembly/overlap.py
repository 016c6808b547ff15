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


@functools.partial(jax.jit, static_argnames=("lut_k", "cand", "win"))
def _overlap_pass(genome_u8, sa, lut, q_start, q_len, *, lut_k, cand, win):
    """For each query seq (prefix at q_start, length q_len), find SA hits of
    its prefix k-mer and score the implied suffix-prefix overlaps.

    Returns (hit_pos [B,C], ovl [B,C], mm [B,C]) — hit_pos is the concat
    position of the overlap start inside the partner (INT32_MAX invalid);
    verification window = min(ovl, q_len, win) bases.
    """
    B = q_start.shape[0]
    G = genome_u8.shape[0]
    M = sa.shape[0]
    k = lut_k

    # prefix k-mer key per query
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
    pos = jnp.where(cvalid, pos, INT32_MAX)

    # window compare: partner bases from pos, query bases from q_start.
    # The partner window is masked at its first EOS sentinel, which bounds
    # the compare to exactly the partner's remaining (suffix-overlap) bases;
    # the query side is bounded by its own length. mm is then the exact
    # mismatch count over the overlap region.
    off = jnp.arange(win, dtype=jnp.int32)
    a = genome_u8[jnp.clip(pos[..., None].astype(jnp.int32) + off, 0, G - 1)]
    b = genome_u8[jnp.clip(q_start[:, None, None].astype(jnp.int32) + off,
                           0, G - 1)]
    in_a = jnp.cumsum((a >= dna_BASE_EOS).astype(jnp.int32), axis=-1) == 0
    wmask = in_a & (off[None, None, :] < jnp.minimum(q_len, win)[:, None,
                                                                 None])
    mm = jnp.sum(((a != b) | (a >= 4) | (b >= 4)) & wmask, axis=-1,
                 dtype=jnp.int32)
    mm = jnp.where(cvalid, mm, INT32_MAX)
    return pos, mm


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
    g, live = corpus_genome(store, with_rc)
    n_corpus = len(g.names)
    if n_corpus == 0:
        return [], set()
    idx = SfxIndex.build(g)
    genome_d = jnp.asarray(g.seq)
    sa_d = jnp.asarray(idx.sa_clean.astype(np.int32))
    lut_d = jnp.asarray(idx.lut.astype(np.int32))

    starts = g.starts
    lengths = g.lengths
    ends = starts + lengths
    edges = []
    contained: set[int] = set()
    n_live = len(live)

    for s in range(0, n_corpus, batch):
        q_ids = np.arange(s, min(s + batch, n_corpus))
        nb = len(q_ids)
        qs = starts[q_ids]
        ql = lengths[q_ids]
        if nb < batch:
            qs = np.concatenate([qs, np.zeros(batch - nb, np.int64)])
            ql = np.concatenate([ql, np.zeros(batch - nb, np.int64)])
        pos, mm = _overlap_pass(
            genome_d, sa_d, lut_d, jnp.asarray(qs), jnp.asarray(ql),
            lut_k=idx.lut_k, cand=cand, win=win)
        pos = np.asarray(pos)[:nb]
        mm = np.asarray(mm)[:nb]
        for j in range(nb):
            b_corpus = int(q_ids[j])
            lb = int(lengths[b_corpus])
            for p, m in zip(pos[j], mm[j]):
                if p == INT32_MAX:
                    continue
                a_corpus = int(np.searchsorted(starts, p, side="right") - 1)
                if a_corpus == b_corpus:
                    continue
                # never merge a sequence with its own reverse complement
                if with_rc and (a_corpus % n_live) == (b_corpus % n_live):
                    continue
                off = int(p - starts[a_corpus])
                la = int(lengths[a_corpus])
                o = la - off
                if o <= 0:
                    continue
                o_eff = min(o, lb, win)
                max_mm = max(1, o_eff * max_subs_per_100 // 100)
                if int(m) > max_mm:
                    continue
                if o >= lb:      # b contained within a
                    # exact same-length duplicates are MUTUALLY contained;
                    # keep the lower underlying id so one copy survives
                    if la > lb or (a_corpus % n_live) < (b_corpus % n_live):
                        contained.add(b_corpus)
                    continue
                if o < min_overlap:
                    continue
                edges.append((a_corpus, b_corpus, o, int(m)))
    return edges, contained
