"""callhaplotypes: founder/progeny skim-read haplotype calling from PBAs.

Capability parity with the core of CCallHaplotypes (ngskit4b/
CallHaplotypes.cpp — the reference's largest engine): progeny PBAs are
scored against founder PBAs per genomic bin; each bin is called to the
founder whose alleles the progeny's alleles are consistent with, `Fa x Fb`
heterozygous when both match, or uncalled. Alleles "match" when the allele
sets intersect (progeny skim coverage gives low scores; any shared allele
counts, exclusive founder support discriminates).

Smoothing follows the reference's two mechanisms
(CCallHaplotypes::ImputeProgenyHeterozygosity CallHaplotypes.cpp:2233-2236
and ImputeOutliersHaplotypes): a Wald-Wolfowitz runs test over each
call's proximal window decides whether rapid Fa/Fb switching is random
sampling of an underlying heterozygous region (random -> impute Fa x Fb),
run at the full proximal window then again at window/5; isolated outlier
calls flanked by agreeing neighbours are then flipped. The runs-test
critical values are computed from the exact run-count distribution
rather than the reference's precomputed table (CStats::
IsRandomHaplotypesFaFb, libkit4b/Stats.cpp:577, Stats.h:49-51) — same
decision at P>=0.025, any n.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .pba import load_pba_any, unpack_pba

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
                    het_ratio: float = 0.25, smooth: bool = True,
                    ww_prox_window: int = 1_000_000,
                    return_raw: bool = False):
    """Two-founder haplotype calling (Fa/Fb per the reference's F4 skim
    use case). founder_paths: {name: pba path} with exactly two entries.
    return_raw=True additionally returns the pre-smoothing calls (the
    reference's mode-1 'raw' matrix, CallHaplotypes.cpp:2218-2232)."""
    if len(founder_paths) != 2:
        raise ValueError("callhaplotypes expects exactly two founders")
    (fa_name, fa_path), (fb_name, fb_path) = founder_paths.items()
    _, prog = load_pba_any(progeny_pba_path)
    _, fa = load_pba_any(fa_path)
    _, fb = load_pba_any(fb_path)

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

    raw = list(calls)
    if smooth:
        founders = (fa_name, fb_name)
        if ww_prox_window > 0:
            # reference runs the WW impute twice: full window, then /5
            # to catch outliers (CallHaplotypes.cpp:2233-2236)
            calls = impute_heterozygosity(calls, founders,
                                          ww_prox_window)
            calls = impute_heterozygosity(calls, founders,
                                          ww_prox_window // 5)
        calls = impute_outliers(calls, ww_prox_window or 1_000_000)
    if return_raw:
        return raw, calls
    return calls


def _runs_cdf(n1: int, n2: int, r: int) -> float:
    """Exact P(R <= r) for the number of runs in a random arrangement of
    n1 + n2 binary labels (the Wald-Wolfowitz runs distribution)."""
    total = math.comb(n1 + n2, n1)
    acc = 0
    for rr in range(2, r + 1):
        k = rr // 2
        if rr % 2 == 0:
            acc += 2 * math.comb(n1 - 1, k - 1) * math.comb(n2 - 1, k - 1)
        else:
            acc += (math.comb(n1 - 1, k - 1) * math.comb(n2 - 1, k)
                    + math.comb(n1 - 1, k) * math.comb(n2 - 1, k - 1))
    return acc / total


@lru_cache(maxsize=None)
def runs_crit_value(n1: int, n2: int, alpha: float = 0.025) -> int:
    """Too-few-runs critical value: one less than the smallest run count
    r with P(R <= r) >= alpha. Computed exactly; reproduces every entry
    of the reference's precomputed table (Stats.h:51
    WaldWolfowitzRunsCritValues, verified 361/361). r <= crit rejects
    randomness; r > crit is random."""
    for r in range(2, n1 + n2 + 1):
        if _runs_cdf(n1, n2, r) >= alpha:
            return r - 1
    return n1 + n2


def is_random_haplotypes(n_fa: int, n_fb: int, runs: int) -> bool:
    """CStats::IsRandomHaplotypesFaFb: True when the Fa/Fb switching
    pattern is consistent with random sampling of a heterozygous region
    (run count above the too-few-runs critical value). Domain clamps
    mirror the reference (n in 2..20, 1 < r <= n1+n2)."""
    if n_fa < 2 or n_fa > 20 or n_fb < 2 or n_fb > 20 \
            or runs <= 1 or runs > n_fa + n_fb:
        return False
    return runs > runs_crit_value(n_fa, n_fb)


def impute_heterozygosity(calls: list[BinCall], founders: tuple,
                          max_distance: int = 1_000_000) -> list[BinCall]:
    """ImputeProgenyHeterozygosity: for each called bin, examine the +-10
    neighbouring called bins within max_distance on the same chrom; count
    per-founder calls and runs (het bins add two runs, reference
    CallHaplotypes.cpp 'boost to randomness'); when >=3 runs over >=6
    calls switch randomly per the runs test, re-call the bin Fa x Fb."""
    fa_name, fb_name = founders
    out = list(calls)
    mark = [False] * len(out)
    for i, cur in enumerate(out):
        if cur.call == CALL_NONE:
            continue
        n = {fa_name: 0, fb_name: 0}
        runs = seq_len = 0
        prev_hap = None
        lo, hi = max(0, i - 9), min(len(out) - 1, i + 10)
        for j in range(lo, hi + 1):
            chk = out[j]
            if chk.chrom != cur.chrom or chk.call == CALL_NONE:
                continue
            if abs(cur.start - chk.start) > max_distance:
                continue
            if chk.call == CALL_HET:
                # reference het branch (CallHaplotypes.cpp:2540-2551): two
                # sequential haplotypes boost runs AND both founder counts;
                # PrevHap is left unchanged
                runs += 2
                seq_len += 2
                n[fa_name] += 1
                n[fb_name] += 1
                continue
            if chk.call not in n:
                continue
            if prev_hap is None or prev_hap != chk.call:
                runs += 1
            prev_hap = chk.call
            n[chk.call] += 1
            seq_len += 1
        if runs >= 3 and seq_len >= 6 and \
                is_random_haplotypes(n[fa_name], n[fb_name], runs):
            mark[i] = True
    for i, m in enumerate(mark):
        if m:
            c = out[i]
            out[i] = BinCall(c.chrom, c.start, c.end, CALL_HET,
                             c.support, c.n_loci)
    return out


def impute_outliers(calls: list[BinCall],
                    max_distance: int = 1_000_000) -> list[BinCall]:
    """ImputeOutliersHaplotypes: a single call differing from equal
    neighbouring calls within max_distance is flipped to match them."""
    out = list(calls)
    for i in range(1, len(out) - 1):
        prev, cur, nxt = out[i - 1], out[i], out[i + 1]
        if (prev.chrom == cur.chrom == nxt.chrom
                and prev.call == nxt.call != cur.call
                and prev.call != CALL_NONE
                and cur.call != CALL_NONE
                and cur.start - prev.start <= max_distance
                and nxt.start - cur.start <= max_distance):
            out[i] = BinCall(cur.chrom, cur.start, cur.end, prev.call,
                             cur.support, cur.n_loci)
    return out


def write_haplotype_matrix(path, per_progeny: dict[str, list[BinCall]],
                           founders: tuple) -> None:
    """ReportMatrix (CallHaplotypes.cpp:3277): rows chrom.loci (bins),
    columns progeny readsets; cell encodes the call: founder index+1
    (1=Fa, 2=Fb), 3 = Fa x Fb heterozygous, 0 = uncalled."""
    fa, fb = founders
    code = {CALL_NONE: 0, fa: 1, fb: 2, CALL_HET: 3}
    names = list(per_progeny)
    keys = list(dict.fromkeys(
        (c.chrom, c.start) for calls in per_progeny.values() for c in calls))
    bymap = {n: {(c.chrom, c.start): c for c in per_progeny[n]}
             for n in names}
    with open(path, "w") as f:
        f.write('"Chrom","Loci"' + "".join(f',"{n}"' for n in names) + "\n")
        for chrom, start in keys:
            f.write(f'"{chrom}",{start}')
            for n in names:
                c = bymap[n].get((chrom, start))
                f.write(f",{code.get(c.call, 0) if c else 0}")
            f.write("\n")


def write_haplotypes_gwas(path, calls: list[BinCall],
                          founders: tuple) -> None:
    """ReportHaplotypesAsGWAS (CallHaplotypes.cpp:3072): 'CHR BP SNP P'
    rows for IGV viewing; P visually encodes the call — 0.3 Fa only,
    0.9 Fb only, 0.1 both parental haplotypes (:3147-3156)."""
    fa, fb = founders
    with open(path, "w") as f:
        f.write("CHR BP SNP P\n")
        for c in calls:
            if c.call == CALL_NONE:
                continue
            if c.call == fa:
                snp, p = fa, 3
            elif c.call == fb:
                snp, p = fb, 9
            else:
                snp, p = f"{fa}:{fb}", 1
            f.write(f"{c.chrom} {c.start} {snp} 0.{p}\n")


def write_haplotype_calls(path, calls: list[BinCall]) -> None:
    with open(path, "w") as f:
        f.write('"Chrom","Start","End","Call","SupportA","SupportB",'
                '"InformativeLoci"\n')
        for c in calls:
            sa, sb = list(c.support.values())
            f.write(f'"{c.chrom}",{c.start},{c.end},"{c.call}",{sa},{sb},'
                    f'{c.n_loci}\n')
