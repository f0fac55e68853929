#!/usr/bin/env python3
"""Flag-parity matrix vs the RUNNING reference.

Runs the reference release (via run_reference.py) and this repo's CLI
with the same flag combination on the same dataset and byte-compares the
data lines.  Usage:

  python tools/reference_harness/flag_matrix.py [--region chr20:1-300000]
"""

import argparse
import os
import subprocess
import sys

HARNESS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HARNESS))
BUILD = "/tmp/refbuild/Platypus_0.8.1"

COMBOS = [
    ("defaults", []),
    ("minReads4", ["--minReads=4"]),
    ("minPosterior20", ["--minPosterior=20"]),
    ("maxHaplotypes4", ["--maxHaplotypes=4"]),
    ("maxVariants5", ["--maxVariants=5"]),
    ("snpsOnly", ["--genIndels=0"]),
    ("indelsOnly", ["--genSNPs=0"]),
    ("minMapQual30", ["--minMapQual=30"]),
    ("minBaseQual25", ["--minBaseQual=25"]),
    ("badReads25", ["--badReadsThreshold=25"]),
    ("qdThresh20", ["--qdThreshold=20"]),
    ("minFlank5", ["--minFlank=5"]),
    ("trimOff", ["--trimReadFlank=0", "--trimAdapter=0", "--trimOverlapping=0"]),
    ("noFilterDups", ["--filterDuplicates=0"]),
    ("largeWindows", ["--largeWindows=1", "--maxSize=3000"]),
]


def data_lines(path):
    return [l for l in open(path) if not l.startswith("#")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam", default="/tmp/platypus_tpu_scaling/mb10/reads.bam")
    ap.add_argument("--ref", default="/tmp/platypus_tpu_scaling/mb10/ref.fa")
    ap.add_argument("--region", default="chr20:1-300000")
    ap.add_argument("--out", default="/tmp/flag_matrix")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    results = {}
    for name, flags in COMBOS:
        ref_out = os.path.join(args.out, f"ref_{name}.vcf")
        mine_out = os.path.join(args.out, f"mine_{name}.vcf")
        common = [f"--bamFiles={args.bam}", f"--refFile={args.ref}",
                  f"--regions={args.region}", "--nCPU=1"] + flags
        r = subprocess.run(
            [sys.executable, os.path.join(HARNESS, "run_reference.py"),
             BUILD, "callVariants"] + common + ["-o", ref_out],
            capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(ref_out):
            results[name] = f"REF-FAILED rc={r.returncode}: " + \
                            r.stderr.strip().splitlines()[-1][:100] if r.stderr else "?"
            continue
        env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
        m = subprocess.run(
            [sys.executable, "-m", "platypus_tpu.cli", "callVariants"]
            + common + ["-o", mine_out],
            capture_output=True, text=True, env=env, cwd=REPO)
        if m.returncode != 0:
            results[name] = "MINE-FAILED: " + \
                            (m.stderr.strip().splitlines()[-1][:100]
                             if m.stderr else "?")
            continue
        a, b = data_lines(ref_out), data_lines(mine_out)
        if a == b:
            results[name] = f"IDENTICAL ({len(a)} records)"
        else:
            common_set = set(a) & set(b)
            results[name] = (f"DIFF ref={len(a)} mine={len(b)} "
                             f"common={len(common_set)}")
    for name, res in results.items():
        print(f"{name:16s} {res}")


if __name__ == "__main__":
    main()
