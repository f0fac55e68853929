"""Offline indel error-model calibration.

Role equivalent of the reference's indelerrormodel.py (an offline tool, not
imported by the calling path): estimate per-(repeat unit, tract length)
indel error rates from aligned reads and emit an error-model dict usable by
models.error_model.annotate_sequence.

Method (simplified from the reference's EM over genotype states): for every
repeat tract of the reference, count reads fully spanning the tract and
reads carrying a CIGAR indel inside it; tracts whose indel VAF looks
germline (>= 0.2) are excluded, the remainder pool into per-(unit class,
tract length) error rates with pseudocounts, written as phred+33 strings.

Usage:
  python tools/indel_error_model.py --bam reads.bam --ref ref.fa \
      [--region chr:start-end] [--out model.json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np

from platypus_tpu.io.bam import BamFile
from platypus_tpu.io.fasta import FastaFile
from platypus_tpu.models.error_model import get_repeats


def collect_counts(bam: BamFile, ref: FastaFile, chrom: str, start: int, end: int,
                   min_tract: int = 4, flank: int = 5):
    """(unit_key, tract_len) -> [n_spanning, n_indel]."""
    counts = defaultdict(lambda: [0, 0])
    ref_seq = ref.get_sequence(chrom, start, end)
    repeats = get_repeats(ref_seq, min_tract, start)
    if not repeats:
        return counts
    rs = bam.fetch(chrom, start, end)

    # Precompute per-read indel reference intervals.
    read_indels = []
    for i in range(len(rs)):
        pos = int(rs.pos[i])
        spans = []
        ref_off = 0
        for op, ln in rs.cigar_ops(i):
            op, ln = int(op), int(ln)
            if op == 1:  # insertion at current ref position
                spans.append((pos + ref_off - 1, pos + ref_off + 1))
            elif op == 2:  # deletion covering [pos, pos+ln)
                spans.append((pos + ref_off, pos + ref_off + ln))
                ref_off += ln
            elif op in (0, 3, 7, 8):
                ref_off += ln
            elif op == 4 and ref_off == 0:
                ref_off += ln
        read_indels.append(spans)

    for t_pos, t_len, unit in repeats:
        t_end = t_pos + t_len
        n_span = 0
        n_indel = 0
        for i in range(len(rs)):
            if rs.pos[i] > t_pos - flank or rs.end[i] < t_end + flank:
                continue
            n_span += 1
            if any(s < t_end and e > t_pos for s, e in read_indels[i]):
                n_indel += 1
        if n_span == 0:
            continue
        # Likely germline indel: exclude the tract from error estimation.
        if n_indel / n_span >= 0.2:
            continue
        key = unit.upper() if len(unit) <= 8 else len(unit)
        counts[(key, t_len)][0] += n_span
        counts[(key, t_len)][1] += n_indel
    return counts


def counts_to_model(counts, max_tract: int = 40, prior_rate: float = 3e-5,
                    prior_weight: float = 20.0):
    """Pooled per-unit phred strings with a weak prior toward the default
    per-base error rate."""
    by_unit = defaultdict(dict)
    for (unit, t_len), (n_span, n_indel) in counts.items():
        by_unit[unit][t_len] = (n_span, n_indel)
    model = {}
    for unit, tracts in by_unit.items():
        chars = []
        last_phred = None
        for t_len in range(1, max_tract + 1):
            n_span, n_indel = tracts.get(t_len, (0, 0))
            rate = (n_indel + prior_rate * prior_weight) / (n_span + prior_weight)
            phred = max(0, min(60, int(round(-10 * math.log10(max(rate, 1e-9))))))
            if last_phred is not None:
                phred = min(phred, last_phred)  # rates never improve with length
            last_phred = phred
            chars.append(chr(33 + phred))
            if t_len > max(tracts.keys(), default=1):
                break
        model[str(unit)] = "".join(chars)
    return model


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--region", default=None, help="chr:start-end (1-based)")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    bam = BamFile(args.bam)
    ref = FastaFile(args.ref)
    if args.region:
        chrom, span = args.region.rsplit(":", 1)
        start, end = (int(x) for x in span.split("-"))
        regions = [(chrom, start - 1, end)]
    else:
        regions = [(name, 0, entry.length) for name, entry in ref.refs.items()]

    counts = defaultdict(lambda: [0, 0])
    for chrom, start, end in regions:
        for key, (n_span, n_indel) in collect_counts(bam, ref, chrom, start, end).items():
            counts[key][0] += n_span
            counts[key][1] += n_indel

    model = counts_to_model(counts)
    text = json.dumps(model, indent=2, sort_keys=True)
    if args.out == "-":
        print(text)
    else:
        with open(args.out, "w") as fh:
            fh.write(text)
    bam.close()
    ref.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
