"""End-to-end VCF quality harness.

Equivalent of the reference's sanityChecks.py (+ scripts/computeTsTv.py,
binIndelRatioByHP.py, vcfChecks.py): computes summary quality metrics for a
platypus-tpu VCF and lints allele padding.

Usage: python tools/sanity_checks.py calls.vcf [--json]
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from typing import Dict, List

TRANSITIONS = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}


def parse_vcf(path: str) -> List[dict]:
    records = []
    with open(path) as fh:
        samples: List[str] = []
        for line in fh:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
                continue
            cols = line.rstrip("\n").split("\t")
            info = dict(kv.split("=", 1) for kv in cols[7].split(";") if "=" in kv)
            fmt = cols[8].split(":")
            sample_data = {}
            for s, d in zip(samples, cols[9:]):
                sample_data[s] = dict(zip(fmt, d.split(":")))
            records.append(
                dict(chrom=cols[0], pos=int(cols[1]), ref=cols[3],
                     alts=cols[4].split(","), qual=cols[5],
                     filters=cols[6].split(";"), info=info, samples=sample_data)
            )
    return records


def compute_metrics(records: List[dict]) -> Dict:
    ts = tv = 0
    n_ins = n_del = 0
    indel_by_hp: Dict[str, List[int]] = {}
    het_vaf_ok = het_vaf_total = 0
    gt_gl_consistent = gt_gl_total = 0
    filter_counts: Counter = Counter()
    padding_errors = 0

    for rec in records:
        for f in rec["filters"]:
            filter_counts[f] += 1
        if "REFCALL" in rec["filters"]:
            continue
        ref = rec["ref"]
        for alt in rec["alts"]:
            if alt == ".":
                continue
            if len(ref) == 1 and len(alt) == 1:
                if (ref, alt) in TRANSITIONS:
                    ts += 1
                else:
                    tv += 1
            elif len(ref) != len(alt):
                hp = rec["info"].get("HP", ["0"])
                hp_bin = str(min(int(float(hp if isinstance(hp, str) else hp[0])), 10))
                indel_by_hp.setdefault(hp_bin, [0, 0])
                if len(alt) > len(ref):
                    n_ins += 1
                    indel_by_hp[hp_bin][0] += 1
                else:
                    n_del += 1
                    indel_by_hp[hp_bin][1] += 1
                # VCF allele padding lint: indel alleles share a leading base.
                if ref[0] != alt[0]:
                    padding_errors += 1

        for sample, data in rec["samples"].items():
            gt = data.get("GT", "./.")
            if gt in ("0/1", "1/0") and len(rec["alts"]) == 1:
                try:
                    nr = int(data["NR"].split(",")[0])
                    nv = int(data["NV"].split(",")[0])
                except (KeyError, ValueError):
                    continue
                if nr > 0:
                    het_vaf_total += 1
                    if 0.15 <= nv / nr <= 0.85:
                        het_vaf_ok += 1
            # GT should be the argmax of GL for biallelic calls.
            if len(rec["alts"]) == 1 and "GL" in data and "/" in gt and "." not in gt:
                try:
                    gls = [float(x) for x in data["GL"].split(",")]
                except ValueError:
                    continue
                if len(gls) == 3:
                    gt_gl_total += 1
                    idx = sum(int(g) for g in gt.split("/"))
                    if gls[idx] == max(gls):
                        gt_gl_consistent += 1

    return dict(
        n_records=len(records),
        ts=ts, tv=tv,
        ts_tv_ratio=round(ts / tv, 3) if tv else None,
        n_insertions=n_ins, n_deletions=n_del,
        indel_ratio=round(n_ins / n_del, 3) if n_del else None,
        indel_by_homopolymer={k: dict(ins=v[0], dele=v[1])
                              for k, v in sorted(indel_by_hp.items())},
        het_vaf_in_range=f"{het_vaf_ok}/{het_vaf_total}",
        gt_gl_consistent=f"{gt_gl_consistent}/{gt_gl_total}",
        filter_counts=dict(filter_counts),
        allele_padding_errors=padding_errors,
    )


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    metrics = compute_metrics(parse_vcf(sys.argv[1]))
    print(json.dumps(metrics, indent=None if "--json" in sys.argv else 2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
