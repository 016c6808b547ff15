"""PE-link contig scaffolding from SAM alignments (`pescaffold` equivalent).

Mirrors CPEScaffold (ngskit4b/PEScaffold.cpp): pairs whose mates aligned to
different contigs vote for joining those contigs; orientation comes from the
mates' strands (FR library: each mate points INTO its fragment, so the mate's
strand says which contig end faces the gap). Edges weighted by supporting
pair count; scaffold paths built greedily with each contig end used at most
once and union-find preventing cycles (the CAssembGraph vertex/edge +
component logic, ngskit4b/AssembGraph.cpp:126-210, as plain host graph code).

Output: scaffolded multifasta with N gaps (ReportScaffoldSets parity,
Scaffolder.cpp:1510).
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

from .. import dna
from ..io.fasta import SeqRecord
from ..io.sam import read_sam


@dataclass
class ScaffoldParams:
    min_links: int = 2          # pairs required to accept a join
    default_gap: int = 100      # N gap when no estimate available
    min_gap: int = 10


def _end_of(strand_fwd: bool):
    # FR library: forward-aligned mate faces right (3'/R end of its contig
    # points at the gap); reverse-aligned mate faces left (L end).
    return "R" if strand_fwd else "L"


def collect_links(sam1, sam2):
    """Pair mate SAM streams by qname; yield inter-contig link votes
    ((ctgA, endA), (ctgB, endB))."""
    m1 = {}
    for r in sam1:
        if r.is_mapped:
            m1[r.qname] = r
    for r2 in sam2:
        if not r2.is_mapped:
            continue
        r1 = m1.get(r2.qname)
        if r1 is None or r1.rname == r2.rname:
            continue
        yield ((r1.rname, _end_of(not r1.is_reverse)),
               (r2.rname, _end_of(not r2.is_reverse)))


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.p[ra] = rb
        return True


def build_scaffolds(links, contig_names, params: ScaffoldParams | None = None):
    """Greedy scaffold path construction from link votes.

    Returns list of paths; each path is [(contig, flip:bool), ...].
    """
    p = params or ScaffoldParams()
    votes = defaultdict(int)
    for a, b in links:
        key = tuple(sorted((a, b)))
        votes[key] += 1
    edges = sorted(((n, a, b) for (a, b), n in votes.items()
                    if n >= p.min_links), reverse=True)

    used_ends = set()
    uf = _UnionFind()
    adj = defaultdict(list)  # (ctg,end) -> (other ctg, other end)
    for n, a, b in edges:
        if a in used_ends or b in used_ends:
            continue
        if not uf.union(a[0], b[0]):
            continue
        used_ends.add(a)
        used_ends.add(b)
        adj[a].append(b)
        adj[b].append(a)

    # walk chains: a contig's two ends are implicitly connected internally
    visited = set()
    paths = []
    for name in contig_names:
        if name in visited:
            continue
        # find a terminal end: an end with no external link, preferring L
        start_end = None
        for e in ("L", "R"):
            if (name, e) not in adj:
                start_end = e
                break
        if start_end is None:
            # both ends linked -> middle of a chain or cycle; skip here,
            # it will be reached from a terminal (cycles were prevented)
            continue
        path = []
        cur, enter = name, start_end
        while True:
            visited.add(cur)
            # entering at `enter`: orientation fwd if entered at L
            path.append((cur, enter != "L"))
            exit_end = "R" if enter == "L" else "L"
            nxts = adj.get((cur, exit_end))
            if not nxts:
                break
            nxt_ctg, nxt_end = nxts[0]
            if nxt_ctg in visited:
                break
            cur, enter = nxt_ctg, nxt_end
        paths.append(path)
    for name in contig_names:
        if name not in visited:
            paths.append([(name, False)])
            visited.add(name)
    return paths


def write_scaffolds(path, paths, contig_seqs: dict,
                    params: ScaffoldParams | None = None):
    """Emit scaffolded multifasta with N gaps."""
    from ..io.fasta import write_fasta
    p = params or ScaffoldParams()
    gap = np.full(max(p.min_gap, p.default_gap), dna.BASE_N, np.uint8)
    recs = []
    for i, pth in enumerate(paths, start=1):
        parts = []
        for j, (name, flip) in enumerate(pth):
            if j:
                parts.append(gap)
            s = contig_seqs[name]
            parts.append(dna.revcomp(s) if flip else s)
        recs.append(SeqRecord(
            f"scaffold{i:05d}",
            f"contigs={','.join(n for n, _ in pth)}",
            np.concatenate(parts)))
    write_fasta(path, recs)
    return recs


def pescaffold(sam1_path, sam2_path, contigs_fasta, out_path,
               params: ScaffoldParams | None = None):
    """End-to-end pescaffold: PE SAMs + contig fasta -> scaffolded fasta."""
    from ..io.fasta import read_seqs
    contig_seqs = {r.name: r.codes for r in read_seqs(contigs_fasta)}
    links = list(collect_links(read_sam(sam1_path), read_sam(sam2_path)))
    paths = build_scaffolds(links, list(contig_seqs), params)
    recs = write_scaffolds(out_path, paths, contig_seqs, params)
    return paths, recs
