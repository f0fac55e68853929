#!/usr/bin/env python3
"""Large-cohort joint-calling benchmark (VERDICT r3 item 7).

Generates N single-sample BAMs over a shared synthetic reference (common
variants at fixed population frequencies plus per-sample privates), joint-
calls them through the real CLI in one process, and reports wall, reads/s
and peak RSS.  The nInd>25 cohort exercises the EM-frequency-weighted
genotype path (cpopulation.pyx:623-676 semantics; ops/likelihood.py and
native genotype kernel's n_individuals > 25 branch).

Usage:
  python tools/cohort_bench.py --samples 50 --mb 10 --coverage 4
  python tools/cohort_bench.py --samples 60 --mb 2  # quicker
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cohort(workdir, n_samples, length, coverage, seed=11):
    from synth import SimHaplotype, make_reference, simulate_reads_bulk, \
        write_bam_bulk

    from platypus_tpu import native

    ref_path, ref_seq = make_reference(workdir, length=length, seed=seed)
    rng = np.random.default_rng(seed + 1)
    bases = np.frombuffer(b"ACGT", np.uint8)

    # Common variant sites shared across the cohort at drawn frequencies.
    n_common = max(20, length // 1500)
    common_pos = np.sort(rng.choice(
        np.arange(1000, length - 1000), size=n_common, replace=False))
    common_alt = [bytes([int(rng.choice(bases[bases != ref_seq[p]]))])
                  for p in common_pos]
    common_af = rng.uniform(0.05, 0.95, n_common)

    bams = []
    total_reads = 0
    for s in range(n_samples):
        hap_vars = [[], []]
        for k in range(2):
            carry = rng.random(n_common) < common_af
            hap_vars[k] = [(int(p), 1, a) for p, a, c in
                           zip(common_pos, common_alt, carry) if c]
        # one private SNP per sample
        pp = int(rng.integers(1200, length - 1200))
        hap_vars[0] = sorted(hap_vars[0] + [
            (pp, 1, bytes([int(rng.choice(bases[bases != ref_seq[pp]]))]))])
        haps = [SimHaplotype(ref_seq, hv) for hv in hap_vars]
        pos, seq, special = simulate_reads_bulk(
            haps, 500, length - 500, coverage=coverage, seed=seed + 7 + s,
            error_rate=0.002)
        path = os.path.join(workdir, f"cohort_s{s:03d}.bam")
        write_bam_bulk(path, [("chr20", length)], pos, seq, special,
                       sample=f"S{s:03d}")
        native.native_bam_index(path, path + ".bai")
        bams.append(path)
        total_reads += len(pos)
    return ref_path, bams, total_reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--mb", type=float, default=10.0)
    ap.add_argument("--coverage", type=int, default=4)
    ap.add_argument("--ncpus", type=int, default=1)
    ap.add_argument("--workdir", default="/tmp/platypus_tpu_cohort")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    length = int(args.mb * 1_000_000)

    t0 = time.perf_counter()
    ref_path, bams, total_reads = build_cohort(
        args.workdir, args.samples, length, args.coverage)
    print(f"built {args.samples} BAMs, {total_reads} reads "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    out = os.path.join(args.workdir, "cohort_calls.vcf")
    env = dict(os.environ)
    if args.platform:
        env["PLATYPUS_TPU_PLATFORM"] = args.platform
    u0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         "--bamFiles=" + ",".join(bams), f"--refFile={ref_path}",
         f"--regions=chr20:1-{length}", f"--nCPU={args.ncpus}", "-o", out],
        check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    wall = time.perf_counter() - t0
    u1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    peak_rss_gb = u1.ru_maxrss / 1e6  # linux: KB

    n_records = sum(1 for l in open(out) if not l.startswith("#"))
    result = dict(
        samples=args.samples, mb=args.mb, coverage=args.coverage,
        ncpus=args.ncpus, total_reads=total_reads, wall_s=round(wall, 1),
        reads_per_s=int(total_reads / wall), peak_rss_gb=round(peak_rss_gb, 2),
        n_records=n_records,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
