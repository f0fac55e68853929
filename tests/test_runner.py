"""Runner-level tests: multi-sample joint calling, REFCALL output, resume
and multi-file merge."""

import os

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import (
    continue_calling,
    get_regions,
    merge_vcf_files,
    run_single_process,
)

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def _parse(path):
    recs = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            recs.append(cols)
    return recs


def test_multi_sample_joint_calling(tmp_path):
    """Two samples: one het for a SNP, one hom-ref — joint genotypes."""
    ref_path, ref_seq = make_reference(tmp_path, length=5000, seed=41)
    pos = 2000
    alt = b"A" if ref_seq[pos] != ord("A") else b"G"
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, [(pos, 1, alt)])

    reads_s1 = simulate_reads([hap_ref, hap_var], 1500, 2500, coverage=30, seed=42)
    reads_s2 = simulate_reads([hap_ref, hap_ref], 1500, 2500, coverage=30, seed=43)
    bam1 = write_synth_bam(tmp_path, reads_s1, ref_len=5000, sample="S1",
                           filename="s1.bam")
    bam2 = write_synth_bam(tmp_path, reads_s2, ref_len=5000, sample="S2",
                           filename="s2.bam")

    out = str(tmp_path / "joint.vcf")
    config = PlatypusConfig(bam_files=[bam1, bam2], ref_file=ref_path, output=out)
    run_single_process(config, [("chr20", 1500, 2500)], out)

    recs = [r for r in _parse(out) if int(r[1]) == pos + 1]
    assert recs, "SNP not called in joint mode"
    r = recs[0]
    # Sample columns ordered by sorted sample name: S1 then S2.
    gt_s1 = r[9].split(":")[0]
    gt_s2 = r[10].split(":")[0]
    assert gt_s1 in ("0/1", "1/0")
    assert gt_s2 == "0/0"


def test_ref_calls_output(tmp_path):
    ref_path, ref_seq = make_reference(tmp_path, length=5000, seed=44)
    pos = 2000
    alt = b"A" if ref_seq[pos] != ord("A") else b"G"
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, [(pos, 1, alt)])
    reads = simulate_reads([hap_ref, hap_var], 1200, 2800, coverage=30, seed=45)
    bam = write_synth_bam(tmp_path, reads, ref_len=5000)
    out = str(tmp_path / "refcalls.vcf")
    config = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out,
                            output_ref_calls=1, ref_call_block_size=500)
    run_single_process(config, [("chr20", 1200, 2800)], out)
    recs = _parse(out)
    refcalls = [r for r in recs if r[6] == "REFCALL"]
    var_calls = [r for r in recs if r[6] != "REFCALL"]
    assert var_calls, "variant missing"
    assert refcalls, "no REFCALL blocks emitted"
    # REFCALL blocks carry END/Size info and GT ./.
    for r in refcalls:
        assert "END=" in r[7] and "Size=" in r[7]
        assert r[9].split(":")[0] == "./."
    # Coverage-backed blocks get a positive qual.
    assert any(float(r[5]) > 0 for r in refcalls)


def test_merge_vcf_files(tmp_path):
    header = "##fileformat=VCFv4.0\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    f1 = tmp_path / "a.vcf"
    f2 = tmp_path / "b.vcf"
    f1.write_text(header + "chr1\t100\t.\tA\tG\t50\tPASS\t.\nchr2\t50\t.\tC\tT\t50\tPASS\t.\n")
    f2.write_text(header + "chr1\t50\t.\tA\tG\t50\tPASS\t.\nchr1\t200\t.\tC\tT\t50\tPASS\t.\n")
    out = str(tmp_path / "merged.vcf")
    merge_vcf_files([str(f1), str(f2)], out)
    recs = _parse(out)
    keys = [(r[0], int(r[1])) for r in recs]
    assert keys == [("chr1", 50), ("chr1", 100), ("chr1", 200), ("chr2", 50)]
    # temp files are removed after merging
    assert not os.path.exists(str(f1)) and not os.path.exists(str(f2))


def test_resume_from_partial_vcf(tmp_path):
    """continueCalling picks up from the last completed buffer block."""
    ref_path, ref_seq = make_reference(tmp_path, length=8000, seed=46)
    positions = [1500, 3500, 5500]
    variants = []
    for p in positions:
        alt = b"A" if ref_seq[p] != ord("A") else b"G"
        variants.append((p, 1, alt))
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap_ref, hap_var], 1000, 6500, coverage=30, seed=47)
    bam = write_synth_bam(tmp_path, reads, ref_len=8000)

    out = str(tmp_path / "full.vcf")
    config = PlatypusConfig(
        bam_files=[bam], ref_file=ref_path, output=out,
        regions=["chr20:1001-6500"], buffer_size=2000,
    )
    run_single_process(config, get_regions(config), out)
    full = _parse(out)
    assert len(full) >= 3

    # Truncate after the first data line to simulate a crash.
    with open(out) as fh:
        lines = fh.readlines()
    first_data = next(i for i, l in enumerate(lines) if not l.startswith("#"))
    partial = str(tmp_path / "partial.vcf")
    with open(partial, "w") as fh:
        fh.writelines(lines[: first_data + 1])

    continue_calling(partial)
    resumed = _parse(str(tmp_path / "full.vcf_ContinuedFromFailedProcess.vcf"))
    assert [(r[0], r[1], r[3], r[4]) for r in resumed] == [
        (r[0], r[1], r[3], r[4]) for r in full
    ]


def test_multiprocess_run(tmp_path):
    """--nCPU=2: spawn workers over round-robined regions, merged output
    equals the single-process result."""
    from platypus_tpu.engine.runner import run_variant_caller

    ref_path, ref_seq = make_reference(tmp_path, length=9000, seed=61)
    variants = []
    for p in (1500, 3500, 5500, 7500):
        alt = b"A" if ref_seq[p] != ord("A") else b"G"
        variants.append((p, 1, alt))
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap_ref, hap_var], 1000, 8500, coverage=30, seed=62)
    bam = write_synth_bam(tmp_path, reads, ref_len=9000)

    out_single = str(tmp_path / "single.vcf")
    config = PlatypusConfig(
        bam_files=[bam], ref_file=ref_path, output=out_single,
        regions=["chr20:1001-8500"], buffer_size=2000, n_cpu=1,
    )
    run_variant_caller(config)
    single = [(r[0], r[1], r[3], r[4], r[9]) for r in _parse(out_single)]

    out_multi = str(tmp_path / "multi.vcf")
    config2 = PlatypusConfig(
        bam_files=[bam], ref_file=ref_path, output=out_multi,
        regions=["chr20:1001-8500"], buffer_size=2000, n_cpu=2,
    )
    run_variant_caller(config2)
    multi = [(r[0], r[1], r[3], r[4], r[9]) for r in _parse(out_multi)]

    assert len(single) >= 4
    assert multi == single
