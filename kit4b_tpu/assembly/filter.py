"""Read filtering (ngskit4b `filter` / CArtefactReduce equivalent).

Phases mirror CArtefactReduce::Process (ngskit4b/ArtefactReduce.cpp:893):
  1. load + trims (store.from_records), with checkpoint probe/save
     (ArtefactReduce.cpp:969-982);
  2. duplicate removal — exact sequence dups for SE, exact pair dups for PE
     (IdentifyDuplicates:1548 / RemoveDuplicates:1350), via lexicographic
     sort of fixed-width key matrices instead of index probes + CAS flags;
  3. overlap-support filter — a read must be overlapped by other reads on
     its flanks or it is treated as containing sequencer errors and removed
     (IdentifyOverlaps:1815 / RemoveNonOverlaps:1372), device-scored through
     the same overlap pass the assembler uses.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .overlap import find_overlaps
from .store import FLAG_DELETED, FLAG_DUP, FLAG_NOOVL, SeqStore


@dataclass
class FilterParams:
    dedup: bool = True
    dedup_pe: bool = True           # pair-level dedup when PE
    near_dup_subs: int = 0          # >0: also flag near-dups (<= subs)
    min_overlap_pct: int = 70       # flank overlap support requirement
    overlap_passes: int = 1         # iterative support passes
    max_subs_per_100: int = 2


def _dup_mask(keys: np.ndarray) -> np.ndarray:
    """True for every row that is a duplicate of an earlier identical row."""
    if len(keys) == 0:
        return np.zeros(0, bool)
    order = np.lexsort(keys.T[::-1])
    sorted_keys = keys[order]
    same = np.concatenate([[False],
                           (sorted_keys[1:] == sorted_keys[:-1]).all(axis=1)])
    dup = np.zeros(len(keys), bool)
    dup[order] = same
    return dup


def mark_duplicates(store: SeqStore, pe: bool = False) -> int:
    """Flag exact duplicates (sequence-identical; for PE, identical pairs).
    Returns number flagged."""
    live = np.nonzero(store.live_mask())[0]
    if len(live) == 0:
        return 0
    if pe and store.mate is not None:
        firsts = [i for i in live if store.mate[i] > i]
        width = max((int(store.lengths[i] + store.lengths[store.mate[i]])
                     for i in firsts), default=0)
        keys = np.full((len(firsts), width + 2), 255, np.uint8)
        for r, i in enumerate(firsts):
            a = store.get(int(i))
            b = store.get(int(store.mate[i]))
            keys[r, 0] = len(a) & 0xFF
            keys[r, 1:1 + len(a)] = a
            keys[r, 1 + len(a)] = 254
            keys[r, 2 + len(a): 2 + len(a) + len(b)] = b
        dup = _dup_mask(keys)
        n = 0
        for r, i in enumerate(firsts):
            if dup[r]:
                store.flags[i] |= FLAG_DUP | FLAG_DELETED
                store.flags[store.mate[i]] |= FLAG_DUP | FLAG_DELETED
                n += 2
        return n
    width = int(store.lengths[live].max())
    keys = np.full((len(live), width + 1), 255, np.uint8)
    for r, i in enumerate(live):
        a = store.get(int(i))
        keys[r, 0] = len(a) & 0xFF
        keys[r, 1:1 + len(a)] = a
    dup = _dup_mask(keys)
    store.flags[live[dup]] |= FLAG_DUP | FLAG_DELETED
    return int(dup.sum())


def mark_near_duplicates(store: SeqStore, max_subs: int = 2,
                         batch: int = 8192, cand: int = 32) -> int:
    """Flag near-duplicates: same-length reads identical up to max_subs
    substitutions (CArtefactReduce::IdentifyDuplicates near-dup mode,
    ArtefactReduce.cpp:1548). Device-scored: each read's prefix k-mer is
    probed against the read-corpus index and full-length compares count
    mismatches; of each discovered pair the lower store id is retained.
    Sense-strand only (run after exact dedup, which handles rc pairs via
    the assembler corpus when enabled)."""
    import jax.numpy as jnp
    from ..index.sfx_index import SfxIndex
    from .overlap import INT32_MAX, _overlap_pass, corpus_genome

    live = np.nonzero(store.live_mask())[0]
    if len(live) < 2:
        return 0
    from ..ops.extend_packed import pack_genome
    from ..ops.seed_extend_fast import make_gview
    g, live_ids = corpus_genome(store, with_rc=False)
    idx = SfxIndex.build(g)
    genome_d = jnp.asarray(g.seq)
    sa_d = jnp.asarray(idx.sa_clean.astype(np.int32))
    lut_d = jnp.asarray(idx.lut.astype(np.int32))
    starts, lengths = g.starts, g.lengths
    ends_d = jnp.asarray((starts + lengths).astype(np.int32))
    starts_d = jnp.asarray(starts.astype(np.int32))
    win = int(lengths.max())
    nw2 = (win + 15) // 16 + 1
    gpack, gbad = pack_genome(g.seq, nw2 + 1)
    gview_d = jnp.asarray(make_gview(gpack, gbad, nw2))
    n = len(g.names)
    kill = np.zeros(n, bool)
    for s in range(0, n, batch):
        q_ids = np.arange(s, min(s + batch, n))
        nb = len(q_ids)
        qs, ql = starts[q_ids], lengths[q_ids]
        if nb < batch:
            qs = np.concatenate([qs, np.zeros(batch - nb, np.int64)])
            ql = np.concatenate([ql, np.zeros(batch - nb, np.int64)])
        pos, mm = _overlap_pass(gview_d, genome_d, sa_d, lut_d,
                                starts_d, ends_d, jnp.asarray(qs),
                                jnp.asarray(ql), lut_k=idx.lut_k,
                                cand=cand, win=win)
        pos = np.asarray(pos)[:nb]
        mm = np.asarray(mm)[:nb]
        # vectorized same-length whole-read near-dup detection
        valid = (pos != INT32_MAX) & (mm <= max_subs)
        b_ids = np.broadcast_to(q_ids[:, None], pos.shape)
        a_ids = np.searchsorted(starts, np.where(valid, pos, 0),
                                side="right") - 1
        valid &= (a_ids != b_ids) \
            & (np.where(valid, pos, -1) == starts[a_ids]) \
            & (lengths[a_ids] == lengths[b_ids])
        kill[np.maximum(a_ids, b_ids)[valid]] = True
    flagged = live_ids[np.nonzero(kill)[0]]
    store.flags[flagged] |= FLAG_DUP | FLAG_DELETED
    if store.mate is not None:
        for i in flagged:
            m = store.mate[i]
            if m >= 0:
                store.flags[m] |= FLAG_DUP | FLAG_DELETED
    return int(kill.sum())


def mark_unsupported(store: SeqStore, params: FilterParams) -> int:
    """Flag reads lacking overlap support from any other read.

    A read passes when some other read overlaps its prefix by at least
    min_overlap_pct of its length (the prefix-overlap corpus pass covers the
    5' flank; the revcomp corpus entry covers the 3' flank symmetrically).
    """
    live = np.nonzero(store.live_mask())[0]
    n_live = len(live)
    if n_live == 0:
        return 0
    min_len = int(store.lengths[live].min())
    min_ovl = max(16, min_len * params.min_overlap_pct // 100)
    edges, contained = find_overlaps(
        store, min_overlap=min_ovl,
        max_subs_per_100=params.max_subs_per_100)
    supported = np.zeros(n_live, bool)
    for a, b, o, mm in edges:
        supported[a % n_live] = True
        supported[b % n_live] = True
    for c in contained:
        supported[c % n_live] = True
    bad = np.nonzero(~supported)[0]
    store.flags[live[bad]] |= FLAG_NOOVL | FLAG_DELETED
    return len(bad)


def artefact_reduce(store: SeqStore, params: FilterParams | None = None,
                    checkpoint: str | None = None, progress=None) -> SeqStore:
    """Full filter pipeline; returns compacted store."""
    p = params or FilterParams()
    pe = store.mate is not None
    if p.dedup:
        n = mark_duplicates(store, pe=pe and p.dedup_pe)
        if progress:
            progress("duplicates", n)
    if p.near_dup_subs > 0:
        store = store.compact()
        n = mark_near_duplicates(store, p.near_dup_subs)
        if progress:
            progress("near-duplicates", n)
    store = store.compact()
    for i in range(p.overlap_passes):
        n = mark_unsupported(store, p)
        if progress:
            progress(f"unsupported pass {i+1}", n)
        store = store.compact()
        if n == 0:
            break
    if checkpoint:
        store.save(checkpoint)
    return store
