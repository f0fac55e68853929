"""Post-hoc VCF stream tools.

Consolidates the reference's scripts/ directory of stdin→stdout VCF
filters and metrics into one CLI (same semantics, python 3):

  tstv            transition/transversion summary      (scripts/computeTsTv.py)
  indel-ratio     ins/del ratio summary                (scripts/computeIndelRatio.py)
  filter-gof      keep samples' GOF < N                (scripts/filterGOF.py / keepGof.py)
  filter-hp       keep records by INFO HP vs threshold (scripts/filterHP.py)
  filter-varfreq  keep TR/TCR > 0.3                    (scripts/filterVarFreq.py)
  filter-totcov   keep records by INFO TC vs threshold (scripts/filterTotCoverage.py)
  clusters        keep / remove / mark variant clusters within N bp
                  (scripts/filterClusters.py, removeClusters.py, markClusters.py)
  split-mnps      split MNP/complex records into SNPs  (scripts/splitMNPsAndComplex.py)
  quals           print QUAL column                    (scripts/printQuals.py)

All subcommands read VCF text on stdin and write to stdout:
    platypus-tpu-vcf-tools filter-hp '>4' < in.vcf > out.vcf
"""

from __future__ import annotations

import argparse
import sys
from typing import Iterator, List, Tuple

TRANSITIONS = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}


def _records(stream) -> Iterator[Tuple[List[str], str]]:
    for line in stream:
        if line.startswith("#"):
            yield None, line.rstrip("\n")
        else:
            yield line.rstrip("\n").split("\t"), line.rstrip("\n")


def _info_dict(info: str) -> dict:
    out = {}
    for item in info.split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            out[k] = v
        else:
            out[item] = True
    return out


def cmd_tstv(args, stream, out):
    n_ti = n_tv = n_pass_ti = n_pass_tv = 0
    for cols, _ in _records(stream):
        if cols is None:
            continue
        ref, alts, filt = cols[3], cols[4].split(","), cols[6]
        for alt in alts:
            if len(ref) != 1 or len(alt) != 1:
                continue
            ti = (ref, alt) in TRANSITIONS
            n_ti += ti
            n_tv += not ti
            if filt in ("PASS", "."):
                n_pass_ti += ti
                n_pass_tv += not ti
    print(f"SNPs: {n_ti + n_tv}  Ts: {n_ti}  Tv: {n_tv}  "
          f"Ts/Tv: {n_ti / max(1, n_tv):.3f}", file=out)
    print(f"PASS SNPs: {n_pass_ti + n_pass_tv}  Ts/Tv: "
          f"{n_pass_ti / max(1, n_pass_tv):.3f}", file=out)


def cmd_indel_ratio(args, stream, out):
    n_ins = n_del = 0
    for cols, _ in _records(stream):
        if cols is None:
            continue
        ref = cols[3]
        for alt in cols[4].split(","):
            if len(alt) > len(ref):
                n_ins += 1
            elif len(alt) < len(ref):
                n_del += 1
    print(f"insertions: {n_ins}  deletions: {n_del}  "
          f"ins/del: {n_ins / max(1, n_del):.3f}", file=out)


def cmd_filter_gof(args, stream, out):
    # FORMAT is GT:GL:GOF:GQ:NR:NV -> GOF is field -4 from the end.
    for cols, raw in _records(stream):
        if cols is None:
            continue
        try:
            if int(cols[9].split(":")[-4]) < args.threshold:
                print(raw, file=out)
        except Exception:  # noqa: BLE001 — malformed rows pass through
            print(raw, file=out)


def _cmp(flag: str, value: int, threshold: int) -> bool:
    if flag == ">":
        return value >= threshold
    if flag == "<":
        return value < threshold
    if flag == "=":
        return value == threshold
    raise SystemExit(f"flag must be one of <,>,= (got {flag!r})")


def _filter_by_info(key: str, spec: str, stream, out):
    flag, threshold = spec[0], int(spec[1:])
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        try:
            value = int(float(_info_dict(cols[7])[key].split(",")[0]))
            if _cmp(flag, value, threshold):
                print(raw, file=out)
        except Exception:  # noqa: BLE001
            continue


def cmd_filter_hp(args, stream, out):
    _filter_by_info("HP", args.spec, stream, out)


def cmd_filter_totcov(args, stream, out):
    _filter_by_info("TC", args.spec, stream, out)


def cmd_filter_varfreq(args, stream, out):
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        try:
            info = _info_dict(cols[7])
            tr = int(info["TR"].split(",")[0])
            tcr = int(info["TCR"].split(",")[0])
            if tr / tcr > args.min_frac:
                print(raw, file=out)
        except Exception:  # noqa: BLE001
            continue


def cmd_clusters(args, stream, out):
    """keep: only clustered records; remove: only unclustered; mark:
    annotate FILTER of clustered records with 'Cluster'."""
    cluster: List[Tuple[str, int, List[str], str]] = []

    def flush():
        clustered = len(cluster) > 1
        for _, _, cols, raw in cluster:
            if args.mode == "keep" and clustered:
                print(raw, file=out)
            elif args.mode == "remove" and not clustered:
                print(raw, file=out)
            elif args.mode == "mark":
                if clustered:
                    cols = list(cols)
                    cols[6] = "Cluster" if cols[6] in ("PASS", ".") else cols[6] + ";Cluster"
                    print("\t".join(cols), file=out)
                else:
                    print(raw, file=out)

    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        chrom, pos = cols[0], int(cols[1])
        if cluster and (chrom != cluster[-1][0]
                        or abs(pos - cluster[-1][1]) > args.distance):
            flush()
            cluster = []
        cluster.append((chrom, pos, cols, raw))
    flush()


def cmd_split_mnps(args, stream, out):
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        chrom, pos, vid, ref, alt_field, qual, filt, info = cols[:8]
        rest = "\t".join(cols[8:])
        alts = alt_field.split(",")
        if all(len(a) == len(ref) for a in alts) and len(ref) > 1:
            seen = set()
            for alt in alts:
                for i, (rb, ab) in enumerate(zip(ref, alt)):
                    if rb != ab:
                        seen.add((int(pos) + i, rb, ab))
            for p, rb, ab in sorted(seen):
                print("\t".join([chrom, str(p), vid, rb, ab, qual, filt,
                                 info + ";FromComplex", rest]), file=out)
        else:
            print(raw, file=out)


def cmd_quals(args, stream, out):
    for cols, _ in _records(stream):
        if cols is not None:
            print(cols[5], file=out)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vcf_tools")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("tstv").set_defaults(fn=cmd_tstv)
    sub.add_parser("indel-ratio").set_defaults(fn=cmd_indel_ratio)
    p = sub.add_parser("filter-gof")
    p.add_argument("threshold", type=int)
    p.set_defaults(fn=cmd_filter_gof)
    p = sub.add_parser("filter-hp")
    p.add_argument("spec", help="e.g. '>4', '<10', '=6'")
    p.set_defaults(fn=cmd_filter_hp)
    p = sub.add_parser("filter-totcov")
    p.add_argument("spec")
    p.set_defaults(fn=cmd_filter_totcov)
    p = sub.add_parser("filter-varfreq")
    p.add_argument("--min-frac", type=float, default=0.3)
    p.set_defaults(fn=cmd_filter_varfreq)
    p = sub.add_parser("clusters")
    p.add_argument("mode", choices=["keep", "remove", "mark"])
    p.add_argument("distance", type=int)
    p.set_defaults(fn=cmd_clusters)
    sub.add_parser("split-mnps").set_defaults(fn=cmd_split_mnps)
    sub.add_parser("quals").set_defaults(fn=cmd_quals)
    args = parser.parse_args(argv)
    args.fn(args, sys.stdin, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
