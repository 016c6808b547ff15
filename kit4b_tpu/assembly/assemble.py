"""Greedy overlap-extension de novo assembly (assemb equivalent).

Mirrors CdeNovoAssemb::AssembReads (ngskit4b/deNovoAssemb.cpp:125) pass
structure: each pass re-indexes the current sequence set, finds suffix-prefix
overlaps (device-scored, overlap.py), merges accepted pairs, and repeats with
a threshold-relaxation schedule until no merges or the pass limit. The
reference's CAS-serialized in-place merges (AtomicSeqMerge kit4bdna.cpp:8623)
become host-resolved conflict-free rounds: greedy matching on the overlap
graph where every sequence end is used at most once and union-find blocks
cycles (SURVEY.md §7 "Assembly's mutable shared store").

Orientation: the overlap corpus contains every sequence and its reverse
complement; a merge chain assigns each underlying sequence an orientation and
concatenates. Per-pass checkpoints (SaveAssembSeqs parity,
deNovoAssemb.cpp:393) via SeqStore.save.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import dna
from .overlap import find_overlaps
from .store import FLAG_MERGED, SeqStore


@dataclass
class AssembleParams:
    min_overlap: int = 50           # initial min overlap bp
    min_overlap_final: int = 30     # relaxed floor over passes
    max_subs_per_100: int = 2       # overlap mismatch budget
    max_passes: int = 20            # cMaxPasses analog
    checkpoint_every: int = 0       # write store each N passes (0 = off)
    checkpoint_path: str = "assemb_pass"


class _UnionFind:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.p[ra] = rb
        return True


def _select_merges(edges, contained_under: set, n_live: int):
    """Greedy conflict-free edge selection.

    Corpus id c: underlying seq u = c % n_live, orientation o = c // n_live.
    An edge suffix(A)->prefix(B) consumes A's head end and B's tail end,
    where head(A) = R if A forward else L, tail(B) = L if B forward else R.
    Each end may be used once; union-find rejects cycles.
    Returns accepted edges list.
    """
    def under(c):
        return c % n_live

    def head_end(c):  # (seq, end) consumed at A side
        return (under(c), "R" if c < n_live else "L")

    def tail_end(c):
        return (under(c), "L" if c < n_live else "R")

    edges = sorted(edges, key=lambda e: (e[3], -e[2]))  # by (mm, -overlap)
    used_ends: set = set()
    uf = _UnionFind(n_live)
    accepted = []
    for a, b, o, mm in edges:
        if under(a) in contained_under or under(b) in contained_under:
            continue
        ha, tb = head_end(a), tail_end(b)
        if ha in used_ends or tb in used_ends:
            continue
        if not uf.union(under(a), under(b)):
            continue
        used_ends.add(ha)
        used_ends.add(tb)
        accepted.append((a, b, o, mm))
    return accepted


def merge_pe_to_se(store: SeqStore, *, min_overlap: int = 16,
                   max_subs_pct: int = 5) -> tuple[SeqStore, int]:
    """Merge PE fragments whose mates now overlap into single SE sequences
    (CKit4bdna::SeqMergePE12ToSE, ngskit4b/kit4bdna.cpp:8739). FR library:
    mate1's 3' end overlaps revcomp(mate2)'s 5' end; lowest-mismatch-rate
    overlap under the subs budget wins. Non-overlapping pairs keep their
    mate linkage. Returns (new store, n pairs merged)."""
    if store.mate is None:
        return store, 0
    live = np.nonzero(store.live_mask())[0]
    live_set = set(int(i) for i in live)
    # collect (i, mate) pairs in first-member order + unpaired singles
    pairs: list[tuple[int, int]] = []
    singles: list[int] = []
    done: set[int] = set()
    for i in live:
        i = int(i)
        if i in done:
            continue
        m = int(store.mate[i])
        if m < 0 or m not in live_set:
            singles.append(i)
            done.add(i)
            continue
        pairs.append((i, m))
        done.add(i)
        done.add(m)

    # vectorized best-overlap scan over all pairs at once: mate1 sequences
    # right-aligned, revcomp(mate2) left-aligned (distinct pad sentinels so
    # out-of-range overlaps can never score), one [P] compare per overlap
    # length — replaces the per-pair Python loop, which dominated the
    # config-5 assembly wall-clock
    P = len(pairs)
    best_o = np.zeros(P, np.int64)
    if P:
        la = store.lengths[[i for i, _ in pairs]].astype(np.int64)
        lb = store.lengths[[m for _, m in pairs]].astype(np.int64)
        Lmax = int(max(la.max(), lb.max()))
        a_pad = np.full((P, Lmax), 255, np.uint8)
        b_pad = np.full((P, Lmax), 254, np.uint8)
        for j, (i, m) in enumerate(pairs):
            a = store.get(i)
            a_pad[j, Lmax - len(a):] = a
            b = dna.revcomp(store.get(m))
            b_pad[j, :len(b)] = b
        best_rate = np.full(P, 1.0)
        for o in range(min_overlap, Lmax + 1):
            mm = (a_pad[:, Lmax - o:] != b_pad[:, :o]).sum(axis=1)
            feas = (o <= la) & (o <= lb)
            ok = feas & (mm <= np.maximum(1, o * max_subs_pct // 100))
            rate = mm / o - o * 1e-9       # prefer longer at equal rate
            better = ok & (rate < best_rate)
            best_rate[better] = rate[better]
            best_o[better] = o

    arrays: list[np.ndarray] = []
    mate: list[int] = []
    n_merged = 0
    for j, (i, m) in enumerate(pairs):
        if best_o[j]:
            a = store.get(i)
            b_rc = dna.revcomp(store.get(m))
            arrays.append(np.concatenate([a, b_rc[int(best_o[j]):]]))
            mate.append(-1)
            n_merged += 1
        else:
            k = len(arrays)
            arrays.append(store.get(i))
            arrays.append(store.get(m))
            mate.extend([k + 1, k])
    for i in singles:
        arrays.append(store.get(i))
        mate.append(-1)
    return SeqStore.from_arrays(
        arrays, mate=np.asarray(mate, np.int64)), n_merged


def _apply_merges(store: SeqStore, live: np.ndarray, accepted, contained,
                  n_live: int) -> SeqStore:
    """Concatenate merge chains into new sequences; consumed seqs flagged."""
    # adjacency in corpus-id space: next[c] = (partner corpus id, overlap)
    nxt: dict[int, tuple[int, int]] = {}
    for a, b, o, _ in accepted:
        nxt[a] = (b, o)

    def oriented(c: int) -> np.ndarray:
        u = c % n_live
        s = store.get(int(live[u]))
        return s if c < n_live else dna.revcomp(s)

    new_seqs: list[np.ndarray] = []
    consumed: set[int] = set()
    # a chain start is an edge-source whose underlying seq is not any edge's
    # target (end-uniqueness + acyclicity make chains simple paths)
    targets_under = {b % n_live for _, b, _, _ in accepted}
    starts = [a for a in nxt if (a % n_live) not in targets_under]
    for c in starts:
        parts = [oriented(c)]
        consumed.add(c % n_live)
        cur = c
        while cur in nxt:
            b, o = nxt[cur]
            parts.append(oriented(b)[o:])
            consumed.add(b % n_live)
            cur = b
        new_seqs.append(np.concatenate(parts))

    # containment: absorbed sequences vanish
    for c in contained:
        consumed.add(c % n_live)

    keep_arrays: list[np.ndarray] = []
    new_pos: dict[int, int] = {}     # live-index u -> position in new store
    for u in range(n_live):
        if u not in consumed:
            new_pos[u] = len(new_seqs) + len(keep_arrays)
            keep_arrays.append(store.get(int(live[u])))
    all_arrays = new_seqs + keep_arrays
    # preserve PE mate linkage for pairs where BOTH mates survive untouched;
    # a merged/absorbed mate dissolves the pair (reference: merged seqs get
    # new SE identity, kit4bdna.cpp:8623)
    mate = None
    if store.mate is not None:
        live_idx_of = {int(v): u for u, v in enumerate(live)}
        mate_arr = np.full(len(all_arrays), -1, np.int64)
        for u, npos in new_pos.items():
            m = int(store.mate[int(live[u])])
            mu = live_idx_of.get(m, -1) if m >= 0 else -1
            if mu >= 0 and mu in new_pos:
                mate_arr[npos] = new_pos[mu]
        mate = mate_arr
    return SeqStore.from_arrays(all_arrays, mate=mate)


def assemble(store: SeqStore, params: AssembleParams | None = None,
             progress=None) -> SeqStore:
    """Run merge passes until convergence; returns the contig store."""
    p = params or AssembleParams()
    cur = store.compact()
    for pass_no in range(1, p.max_passes + 1):
        # threshold relaxation (deNovoAssemb.cpp:240-381 NReduceThresSteps)
        frac = (pass_no - 1) / max(1, p.max_passes - 1)
        min_ovl = int(round(p.min_overlap
                            - frac * (p.min_overlap - p.min_overlap_final)))
        if cur.mate is not None:
            # PE fragments whose flanks have grown to overlap merge to SE
            # each pass (SeqMergePE12ToSE, deNovoAssemb pass loop)
            cur, n_pe = merge_pe_to_se(cur, min_overlap=min_ovl)
            if progress and n_pe:
                progress(pass_no, 0, n_pe, 0, cur.n_live())
        edges, contained = find_overlaps(
            cur, min_overlap=min_ovl, max_subs_per_100=p.max_subs_per_100)
        n_live = cur.n_live()
        contained_under = {c % n_live for c in contained}
        live = np.nonzero(cur.live_mask())[0]
        accepted = _select_merges(edges, contained_under, n_live)
        if progress:
            progress(pass_no, len(edges), len(accepted), len(contained),
                     n_live)
        if not accepted and not contained:
            break
        cur = _apply_merges(cur, live, accepted, contained, n_live)
        if p.checkpoint_every and pass_no % p.checkpoint_every == 0:
            cur.save(f"{p.checkpoint_path}{pass_no}.npz")
    return cur
