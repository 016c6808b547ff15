"""rnade: RNA-seq differential expression classification.

Capability parity with `ngskit4b rnade` (ngskit4b/rnade.cpp CRNAde,
rnade.h:56-57 Pearson thresholds): per-feature counts from control and
experiment samples are library-size normalized, fold changes binned, and a
coverage-profile Pearson correlation classifies congruence. This trimmed
engine consumes the gendeseq counts matrix (align/regions.de_counts) and
per-feature binned coverage profiles when provided.
"""
from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class DeResult:
    feature: str
    control: float         # normalized counts
    experiment: float
    log2_fold: float
    fold_bin: int          # reference-style fold-change bin (-4..+4)
    pearson: float | None  # profile correlation (None without profiles)


def _fold_bin(log2fc: float) -> int:
    """Reference-style fold bins: 0 = <1.25x, then 1.25/1.5/1.75/2x steps."""
    a = abs(log2fc)
    sign = 1 if log2fc > 0 else -1
    if a < math.log2(1.25):
        return 0
    if a < math.log2(1.5):
        return sign
    if a < math.log2(1.75):
        return 2 * sign
    if a < 1.0:
        return 3 * sign
    return 4 * sign


def pearson(xs, ys) -> float | None:
    n = len(xs)
    if n < 2:
        return None
    mx = sum(xs) / n
    my = sum(ys) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    sxx = sum((a - mx) ** 2 for a in xs)
    syy = sum((b - my) ** 2 for b in ys)
    if sxx <= 0 or syy <= 0:
        return None
    return sxy / math.sqrt(sxx * syy)


def differential_expression(samples: list, counts: dict,
                            control: str, experiment: str,
                            *, min_counts: int = 10,
                            profiles: dict | None = None) -> list:
    """counts: feature -> [per-sample counts] (from de_counts); profiles:
    optional feature -> (control_bins, experiment_bins)."""
    ci = samples.index(control)
    ei = samples.index(experiment)
    tot_c = sum(v[ci] for v in counts.values()) or 1
    tot_e = sum(v[ei] for v in counts.values()) or 1
    out = []
    for feat in sorted(counts):
        v = counts[feat]
        if v[ci] + v[ei] < min_counts:
            continue
        nc = v[ci] * 1e6 / tot_c          # counts per million
        ne = v[ei] * 1e6 / tot_e
        log2fc = math.log2((ne + 0.5) / (nc + 0.5))
        r = None
        if profiles and feat in profiles:
            r = pearson(*profiles[feat])
        out.append(DeResult(feat, round(nc, 3), round(ne, 3),
                            round(log2fc, 4), _fold_bin(log2fc), r))
    return out


def binned_profiles(control_sam, exper_sam, bed, numbins: int = 10) -> dict:
    """Per-feature binned start-loci coverage profiles for the Pearson
    congruence test (rnade.cpp bins each transcript into `-b numbins`
    non-overlapping bins of read start counts, then correlates control vs
    experiment profiles).

    Returns feature name -> (control_bins, experiment_bins).
    """
    from ..io.sam import read_sam

    profiles: dict[str, tuple[list, list]] = {}
    feats: dict[str, tuple] = {}
    for which, path in ((0, control_sam), (1, exper_sam)):
        for rec in read_sam(path):
            if not rec.is_mapped:
                continue
            start = rec.pos - 1
            for ft in bed.overlapping(rec.rname, start, start + 1):
                key = ft.name or f"{ft.chrom}:{ft.start}-{ft.end}"
                if key not in profiles:
                    profiles[key] = ([0.0] * numbins, [0.0] * numbins)
                    feats[key] = (ft.start, ft.end)
                fs, fe = feats[key]
                b = min(numbins - 1,
                        (start - fs) * numbins // max(fe - fs, 1))
                profiles[key][which][b] += 1
    return profiles


def write_bin_counts_csv(path, profiles: dict, numbins: int) -> None:
    with open(path, "w") as f:
        hdr = ",".join(f'"CtrlBin{i}"' for i in range(numbins))
        hdr += "," + ",".join(f'"ExprBin{i}"' for i in range(numbins))
        f.write('"Feature",' + hdr + "\n")
        for feat in sorted(profiles):
            c, e = profiles[feat]
            f.write(f'"{feat}",' + ",".join(str(int(v)) for v in c) + ","
                    + ",".join(str(int(v)) for v in e) + "\n")


def write_de_csv(path, results: list) -> None:
    with open(path, "w") as f:
        f.write('"Feature","ControlCPM","ExprCPM","Log2Fold","FoldBin",'
                '"Pearson"\n')
        for r in results:
            p = "" if r.pearson is None else f"{r.pearson:.4f}"
            f.write(f'"{r.feature}",{r.control},{r.experiment},'
                    f'{r.log2_fold},{r.fold_bin},{p}\n')
