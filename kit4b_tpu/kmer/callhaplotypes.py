"""callhaplotypes: founder/progeny skim-read haplotype calling from PBAs.

Capability parity with the core of CCallHaplotypes (ngskit4b/
CallHaplotypes.cpp — the reference's largest engine): progeny PBAs are
scored against founder PBAs per genomic bin; each bin is called to the
founder whose alleles the progeny's alleles are consistent with, `Fa x Fb`
heterozygous when both match, or uncalled. Alleles "match" when the allele
sets intersect (progeny skim coverage gives low scores; any shared allele
counts, exclusive founder support discriminates).

Smoothing: short runs flanked by a single other founder are absorbed — a
simplified stand-in for the reference's Wald-Wolfowitz runs-test smoothing
(CallHaplotypes.h:28-29); the full runs-test arrives with the haplotype
grouping engine.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .pba import load_pba, unpack_pba

CALL_NONE = "none"
CALL_HET = "FaFb"


@dataclass
class BinCall:
    chrom: str
    start: int
    end: int
    call: str            # founder name, "FaFb", or "none"
    support: dict        # founder -> exclusive-consistent locus count
    n_loci: int


def _informative(fa_sc: np.ndarray, fb_sc: np.ndarray) -> np.ndarray:
    """Loci where the two founders have disjoint allele sets (these are the
    discriminating markers)."""
    fa_has = fa_sc > 0
    fb_has = fb_sc > 0
    return ((fa_has & fb_has).sum(axis=1) == 0) & fa_has.any(axis=1) \
        & fb_has.any(axis=1)


def call_haplotypes(progeny_pba_path, founder_paths: dict, *,
                    bin_size: int = 10_000, min_loci: int = 5,
                    het_ratio: float = 0.25,
                    smooth: bool = True) -> list[BinCall]:
    """Two-founder haplotype calling (Fa/Fb per the reference's F4 skim
    use case). founder_paths: {name: pba path} with exactly two entries."""
    if len(founder_paths) != 2:
        raise ValueError("callhaplotypes expects exactly two founders")
    (fa_name, fa_path), (fb_name, fb_path) = founder_paths.items()
    _, prog = load_pba(progeny_pba_path)
    _, fa = load_pba(fa_path)
    _, fb = load_pba(fb_path)

    calls: list[BinCall] = []
    for chrom, p_pba in prog.items():
        if chrom not in fa or chrom not in fb:
            continue
        n = min(len(p_pba), len(fa[chrom]), len(fb[chrom]))
        psc = unpack_pba(p_pba[:n])
        fasc = unpack_pba(fa[chrom][:n])
        fbsc = unpack_pba(fb[chrom][:n])
        info = _informative(fasc, fbsc)
        p_has = psc > 0
        match_a = (p_has & (fasc > 0)).any(axis=1)
        match_b = (p_has & (fbsc > 0)).any(axis=1)
        covered = p_has.any(axis=1)

        for start in range(0, n, bin_size):
            end = min(start + bin_size, n)
            sel = np.zeros(n, bool)
            sel[start:end] = True
            m = sel & info & covered
            n_loci = int(m.sum())
            a_excl = int((m & match_a & ~match_b).sum())
            b_excl = int((m & match_b & ~match_a).sum())
            both = int((m & match_a & match_b).sum())
            support = {fa_name: a_excl, fb_name: b_excl}
            total = a_excl + b_excl + both
            if n_loci < min_loci or total == 0:
                call = CALL_NONE
            elif both / total >= 0.5:
                # progeny carries BOTH founders' alleles at discriminating
                # loci — heterozygous
                call = CALL_HET
            else:
                minor = min(a_excl, b_excl) / max(1, a_excl + b_excl)
                if minor >= het_ratio:
                    call = CALL_HET
                elif a_excl > b_excl:
                    call = fa_name
                else:
                    call = fb_name
            calls.append(BinCall(chrom, start, end, call, support, n_loci))

    if smooth:
        calls = _smooth_runs(calls)
    return calls


def _smooth_runs(calls: list[BinCall]) -> list[BinCall]:
    """Absorb single-bin calls flanked by an agreeing other call."""
    out = list(calls)
    for i in range(1, len(out) - 1):
        prev, cur, nxt = out[i - 1], out[i], out[i + 1]
        if (prev.chrom == cur.chrom == nxt.chrom
                and prev.call == nxt.call != cur.call
                and prev.call not in (CALL_NONE,)):
            out[i] = BinCall(cur.chrom, cur.start, cur.end, prev.call,
                             cur.support, cur.n_loci)
    return out


def write_haplotype_calls(path, calls: list[BinCall]) -> None:
    with open(path, "w") as f:
        f.write('"Chrom","Start","End","Call","SupportA","SupportB",'
                '"InformativeLoci"\n')
        for c in calls:
            sa, sb = list(c.support.values())
            f.write(f'"{c.chrom}",{c.start},{c.end},"{c.call}",{sa},{sb},'
                    f'{c.n_loci}\n')
