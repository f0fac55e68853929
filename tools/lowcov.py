"""Low-coverage indel error-rate estimation over microsatellite motifs.

Standalone equivalent of the reference's src/python/lowcov.py:62-930: walk
a motif file (chrom, pos, hplen, hpunit, tractlen, tandemunit per line),
collect the distribution of non-reference indel-allele counts at each
(tandem unit, tract length) context binned by site coverage, fit a
(hom-ref + het + hom-alt + error) Poisson mixture by coordinate ascent,
and report the het fraction, allele balance and per-read indel error rate
per context.

    python tools/lowcov.py chr20 motifs.txt reads.bam [maxcoverage]
    python tools/lowcov.py [maxcoverage] < saved_counts   # refit only
"""

from __future__ import annotations

import math
import os
import sys
from typing import Dict, Iterator, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_PROCESSED_MOTIFS = 1_000_000
MIN_TOT_COUNT = 10

CIGAR_M, CIGAR_I, CIGAR_D, CIGAR_N = 0, 1, 2, 3


# -- math (reference lowcov.py:20-59) ---------------------------------------

def logstirling(n: float) -> float:
    if n == 0:
        return 0.0
    return 0.5 * math.log(2 * math.pi * n) + n * (math.log(n) - 1)


def ncr(n: int, r: int) -> float:
    return math.comb(n, r)


# -- data collection ---------------------------------------------------------

def motif_generator(infile, chromosome: str) -> Iterator[Tuple[str, int, int, str]]:
    """(chrom, pos, tractlen, tandemunit) rows (reference lowcov.py:618-623)."""
    for line in infile:
        chrom, pos, _hlen, _hom, tlen, tandem = line.rstrip("\n").split("\t")
        if chrom != chromosome:
            continue
        yield (chrom, int(pos), int(tlen), tandem)


def read_haplotypes(rs, rows, start: int, end: int) -> Dict[int, int]:
    """Indel length supported by each read across [start, end]
    (+ins/-del/0; reference lowcov.py:626-644), by multiplicity."""
    haps: Dict[int, int] = {}
    for i in rows:
        indel = 0
        pos = int(rs.pos[i])
        for op, arg in rs.cigar_ops(int(i)):
            op, arg = int(op), int(arg)
            if op in (CIGAR_M, CIGAR_N):
                pos += arg
            elif op == CIGAR_I:
                if start <= pos <= end + 1:
                    indel = arg
            elif op == CIGAR_D:
                if start <= pos <= end + 1:
                    indel = -arg
                pos += arg
        haps[indel] = haps.get(indel, 0) + 1
    return haps


def collect_counts(chromosome: str, motiffile, bam_path: str,
                   min_mapq: int = 30, min_anchor: int = 5,
                   coverage: int = 5) -> Dict[str, List[int]]:
    """Non-ref allele-count histograms per (unit, tractlen) context
    (reference lowcov.py:648-715, over our own BAM reader)."""
    import numpy as np

    from platypus_tpu.io.bam import BamFile

    bam = BamFile(bam_path)
    counts: Dict[str, List[int]] = {}
    num = 0
    for _chrom, pos, tlen, tunit in motif_generator(motiffile, chromosome):
        start = pos - min_anchor
        end = pos + tlen + min_anchor + 1
        rs = bam.fetch(chromosome, max(0, start), end)
        keep = np.nonzero(
            (rs.mapq >= min_mapq)
            & (rs.pos + min_anchor <= pos)
            & (rs.end - min_anchor >= pos + tlen))[0]
        cov = len(keep)
        if cov < 4 or cov > coverage:
            continue
        haps = read_haplotypes(rs, keep, pos, pos + tlen)
        if len(haps) > 2:
            # Aggregate the minor alleles (lowcov.py:680-685).
            alleles = sorted((count, hap) for hap, count in haps.items())
            minors = sum(count for count, _ in alleles[:-1])
            haps = {alleles[0][1]: minors, alleles[-1][1]: alleles[-1][0]}
        if len(haps) == 2 and 0 not in haps:
            # Map the major allele to the reference (lowcov.py:688-691).
            alleles = sorted((count, hap) for hap, count in haps.items())
            haps = {alleles[0][1]: alleles[0][0], 0: alleles[1][0]}
        count = sum(c for hap, c in haps.items() if hap != 0)
        key = f"{tunit}:{tlen}"
        hist = counts.get(key, [0] * ((coverage - 3) * (coverage + 1)))
        hist[(cov - 4) * (coverage + 1) + count] += 1
        counts[key] = hist
        num += 1
        if num > MAX_PROCESSED_MOTIFS:
            break

    # Aggregate by unit LENGTH as well (lowcov.py:704-710).
    for key in list(counts.keys()):
        tunit, tlen = key.split(":")
        newkey = f"{len(tunit)}:{tlen}"
        hist = counts.get(newkey, [0] * len(counts[key]))
        if hist is not counts[key]:
            for idx, c in enumerate(counts[key]):
                hist[idx] += c
            counts[newkey] = hist
    for key in list(counts.keys()):
        if sum(counts[key]) < MIN_TOT_COUNT:
            del counts[key]
    return counts


# -- model (reference lowcov.py:775-888) -------------------------------------

def model(pars, counts: List[int], N: float) -> float:
    cov = len(counts) - 1
    lam_noerr = [0.0] * (cov + 1)
    lam = [0.0] * (cov + 1)
    cov_scaling = sum(counts) / N
    N00, N01, N11, eps, beta = pars
    N00, N01, N11 = N00 * cov_scaling, N01 * cov_scaling, N11 * cov_scaling

    lam_noerr[0] = N00
    for k in range(cov + 1):
        lam_noerr[k] += N01 * ncr(cov, k) * beta ** k * (1 - beta) ** (cov - k)
    lam_noerr[cov] += N11

    for k in range(cov + 1):
        lam[k] += (1 - eps) ** cov * lam_noerr[k]
        factor = cov * eps * (1 - eps) ** (cov - 1)
        if k > 0:
            lam[k - 1] += k * factor * lam_noerr[k] / cov
        if k < cov:
            lam[k + 1] += (cov - k) * factor * lam_noerr[k] / cov
        factor = cov * (cov - 1) * 0.5 * eps * eps * (1 - eps) ** (cov - 2)
        if k > 1:
            lam[k - 2] += k * (k - 1) * factor * lam_noerr[k] / (cov * (cov - 1))
        if k < cov - 1:
            lam[k + 2] += ((cov - k) * (cov - 1 - k) * factor
                           * lam_noerr[k] / (cov * (cov - 1)))
        lam[k] += 2 * k * (cov - k) * factor * lam_noerr[k] / (cov * (cov - 1))

    ll = 0.0
    for k in range(cov + 1):
        ll += (counts[k] * math.log(lam[k] + 1e-10) - lam[k]
               - logstirling(counts[k]))
    return ll


def multimodel(pars, counts: List[int], maxcoverage: int) -> float:
    ll = 0.0
    N = float(sum(counts))
    for i in range(0, len(counts), maxcoverage + 1):
        cov = (i // (maxcoverage + 1)) + 4
        ll += model(pars, counts[i:i + cov + 1], N)
    return ll


def fitmodel(counts: List[int], coverage: int):
    """Coordinate-ascent fit of (N00, N01, N11, epsilon, beta)
    (reference lowcov.py:839-888)."""
    N00 = N01 = N11 = 0.0
    for i in range(0, len(counts), coverage + 1):
        N00 += float(counts[i])
        N01 += float(sum(counts[i + 1:i + coverage]))
        N11 += float(counts[i + coverage])
    pars = [N00, N01, N11, 0.001, 0.5]
    dpars = [0.05] * 5
    minpars = [0.01, 0.01, 0.01, 1e-8, 0.35]
    maxpars = [1e10, 1e10, 1e10, 0.2, 0.65]
    ddpars = 0.9
    k = 0
    ll = multimodel(pars, counts, coverage)
    change = 1
    while sum(dpars) > 0.001 and (change + k) > 0:
        if k == 0:
            change = 0
        parsplus, parsminus = pars[:], pars[:]
        parsplus[k] *= 1.0 + dpars[k]
        parsminus[k] /= 1.0 + dpars[k]
        llplus = (multimodel(parsplus, counts, coverage)
                  if parsplus[k] < maxpars[k] else ll)
        llminus = (multimodel(parsminus, counts, coverage)
                   if parsminus[k] > minpars[k] else ll)
        if ll >= max(llplus, llminus):
            dpars[k] *= ddpars
            change += 1
        elif llplus > max(ll, llminus):
            pars[k] = parsplus[k]
            ll = llplus
            change += 1
        else:
            pars[k] = parsminus[k]
            ll = llminus
            change += 1
        k = (k + 1) % len(pars)
    return pars


def report(counts: Dict[str, List[int]], coverage: int, out=sys.stdout) -> None:
    """Per-context het fraction / allele balance / error rate
    (reference lowcov.py:723-744)."""
    output = []
    for key in counts:
        tunit_s, tlen_s = key.split(":")
        tlen = int(tlen_s)
        try:
            tunit = int(tunit_s)
        except ValueError:
            tunit = tunit_s
        N00, N01, N11, epsilon, beta = fitmodel(counts[key], coverage)
        line = "%s\t%s\t%s\t%1.6f\t%1.6f\t%1.6f" % (
            tunit_s, tlen, counts[key],
            N01 / (N00 + N01 + N11 + 1e-10), beta, epsilon)
        output.append(((isinstance(tunit, str), tunit, tlen), line))
    output.sort(key=lambda t: t[0])
    for _k, line in output:
        print(line, file=out)


def parse_counts(infile) -> Dict[str, List[int]]:
    """Re-read a previous run's count columns (reference lowcov.py:747-772)."""
    counts = {}
    for line in infile:
        if line.startswith("#") or not line.strip():
            continue
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 3:
            continue
        key = f"{cols[0]}:{cols[1]}"
        counts[key] = [int(x) for x in
                       cols[2].strip("[]").replace(",", " ").split()]
    return counts


def main(argv: List[str]) -> int:
    if len(argv) not in (1, 2, 4, 5):
        print(f"Usage: {argv[0]} chromosome motiffile lowcovbam [maxcoverage]")
        print(f"Usage: {argv[0]} [maxcoverage] < output")
        return 1
    coverage = 5
    if len(argv) in (1, 2):
        if len(argv) == 2:
            coverage = int(argv[1])
        report(parse_counts(sys.stdin), coverage)
        return 0
    chromosome, motiffilename, lowcovbam = argv[1:4]
    if len(argv) == 5:
        coverage = int(argv[4])
    from platypus_tpu.utils.fileio import open_transparent

    print(f"# chromosome      \t{chromosome}")
    print(f"# bamfile         \t{lowcovbam}")
    print(f"# motifs          \t{motiffilename}")
    print(f"# maxcoverage     \t{coverage}")
    with open_transparent(motiffilename) as motiffile:
        counts = collect_counts(chromosome, motiffile, lowcovbam,
                                coverage=coverage)
    report(counts, coverage)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
