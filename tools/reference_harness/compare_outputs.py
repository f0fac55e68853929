#!/usr/bin/env python3
"""Compare a true-reference VCF (harness run of Platypus 0.8.1) against a
platypus_tpu VCF over the same input.

Classifies each difference:
  * site presence (records only in one output)
  * value diffs per field (QUAL / FILTER / GT / each INFO key / FORMAT)
  * formatting-only float diffs (py2 str(float) vs this repo's %g)

Known/expected classes (see docs/REFERENCE_RUN.md):
  * ReadPosRankSum: never emitted by the reference on variant lines
  * float formatting (MQ=60.0 vs 60, SbPval=1.0 vs 1, QD 12-digit vs %g)

Usage: compare_outputs.py ref.vcf mine.vcf [--rel-tol 2e-5]
"""

import collections
import sys


def load(path):
    d = {}
    for line in open(path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        d[(f[0], int(f[1]), f[3], f[4])] = f
    return d


def main(ref_path, mine_path, rel_tol=2e-5):
    ref = load(ref_path)
    mine = load(mine_path)
    common = set(ref) & set(mine)
    print(f"records: ref={len(ref)} mine={len(mine)} common={len(common)}")
    for k in sorted(set(ref) - set(mine)):
        print(f"  ref-only : {k[0]}:{k[1]} {k[2]}>{k[3]}")
    for k in sorted(set(mine) - set(ref)):
        print(f"  mine-only: {k[0]}:{k[1]} {k[2]}>{k[3]}")

    fmt = collections.Counter()
    val = collections.Counter()
    examples = collections.defaultdict(list)

    def classify(key, a, b, site):
        if a == b:
            return
        try:
            fa, fb = float(a), float(b)
            if abs(fa - fb) <= rel_tol * max(1.0, abs(fa)):
                fmt[key] += 1
                return
        except (TypeError, ValueError):
            pass
        val[key] += 1
        examples[key].append((site, a, b))

    for k in common:
        a, b = ref[k], mine[k]
        site = f"{k[0]}:{k[1]}"
        classify("QUAL", a[5], b[5], site)
        if set(a[6].split(";")) != set(b[6].split(";")):
            val["FILTER:set"] += 1
            examples["FILTER:set"].append((site, a[6], b[6]))
        elif a[6] != b[6]:
            val["FILTER:order"] += 1
            examples["FILTER:order"].append((site, a[6], b[6]))
        ia = dict(x.split("=", 1) for x in a[7].split(";") if "=" in x)
        ib = dict(x.split("=", 1) for x in b[7].split(";") if "=" in x)
        for key in set(ia) | set(ib):
            x, y = ia.get(key), ib.get(key)
            if x is None or y is None:
                val[f"{key}:presence"] += 1
                continue
            classify(f"INFO:{key}", x, y, site)
        for col in range(9, min(len(a), len(b))):
            sa, sb = a[col].split(":"), b[col].split(":")
            fmt_keys = a[8].split(":")
            for i, (x, y) in enumerate(zip(sa, sb)):
                name = fmt_keys[i] if i < len(fmt_keys) else f"FMT{i}"
                if x == y:
                    continue
                xs, ys = x.split(","), y.split(",")
                if len(xs) == len(ys):
                    for xi, yi in zip(xs, ys):
                        classify(f"FMT:{name}", xi, yi, site)
                else:
                    val[f"FMT:{name}"] += 1
                    examples[f"FMT:{name}"].append((site, x, y))

    print("formatting-only diffs:", dict(fmt))
    print("value diffs:", dict(val))
    for key, ex in examples.items():
        print(f"  {key}:")
        for site, a, b in ex[:5]:
            print(f"    {site}: ref={a!r} mine={b!r}")
    return 0 if not val else 1


if __name__ == "__main__":
    tol = 2e-5
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--rel-tol"):
            tol = float(a.split("=", 1)[1])
    sys.exit(main(args[0], args[1], tol))
