"""Trio end-to-end: 3-sample joint calling + the de novo head, plus the
sanity-check harness over the joint VCF."""

import io
import json
import subprocess
import sys

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import run_single_process
from platypus_tpu.heads.denovo import filter_denovo_vcf

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


@pytest.fixture(scope="module")
def trio_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trio")
    ref_path, ref_seq = make_reference(tmp, length=8000, seed=51)

    inherited_pos = 2000   # het in dad, passed to child
    denovo_pos = 5000      # het in child only

    def alt(p):
        return b"A" if ref_seq[p] != ord("A") else b"G"

    hap_ref = SimHaplotype(ref_seq, [])
    hap_inh = SimHaplotype(ref_seq, [(inherited_pos, 1, alt(inherited_pos))])
    hap_dn = SimHaplotype(
        ref_seq, [(inherited_pos, 1, alt(inherited_pos)), (denovo_pos, 1, alt(denovo_pos))]
    )

    bam_paths = []
    for sample, haps, seed in (
        ("CHILD", [hap_ref, hap_dn], 52),
        ("DAD", [hap_ref, hap_inh], 53),
        ("MUM", [hap_ref, hap_ref], 54),
    ):
        reads = simulate_reads(haps, 1500, 6000, coverage=30, seed=seed)
        bam_paths.append(
            write_synth_bam(tmp, reads, ref_len=8000, sample=sample,
                            filename=f"{sample}.bam")
        )

    out = str(tmp / "trio.vcf")
    config = PlatypusConfig(bam_files=bam_paths, ref_file=ref_path, output=out)
    run_single_process(config, [("chr20", 1500, 6000)], out)

    ped = tmp / "trio.ped"
    ped.write_text(
        "FAM1\tCHILD\tDAD\tMUM\t2\t2\nFAM1\tDAD\t0\t0\t1\t1\nFAM1\tMUM\t0\t0\t2\t1\n"
    )
    return dict(vcf=out, ped=str(ped), tmp=tmp,
                inherited_pos=inherited_pos, denovo_pos=denovo_pos)


def test_joint_genotypes(trio_run):
    with open(trio_run["vcf"]) as fh:
        lines = [l.rstrip("\n").split("\t") for l in fh if not l.startswith("#")]
    header = next(
        l for l in open(trio_run["vcf"]) if l.startswith("#CHROM")
    ).rstrip("\n").split("\t")
    samples = header[9:]
    assert samples == ["CHILD", "DAD", "MUM"]

    by_pos = {int(l[1]): l for l in lines}
    inh = by_pos[trio_run["inherited_pos"] + 1]
    dn = by_pos[trio_run["denovo_pos"] + 1]

    def gt(line, sample):
        return line[9 + samples.index(sample)].split(":")[0]

    assert gt(inh, "CHILD") in ("0/1", "1/0")
    assert gt(inh, "DAD") in ("0/1", "1/0")
    assert gt(inh, "MUM") == "0/0"
    assert gt(dn, "CHILD") in ("0/1", "1/0")
    assert gt(dn, "DAD") == "0/0"
    assert gt(dn, "MUM") == "0/0"


def test_denovo_head_on_joint_vcf(trio_run):
    out_m, out_d, out_f = io.StringIO(), io.StringIO(), io.StringIO()
    with open(trio_run["vcf"]) as fh:
        counts = filter_denovo_vcf(fh, trio_run["ped"], out_m, out_d, out_f)
    passing = [l for l in out_f.getvalue().splitlines() if not l.startswith("#")]
    assert len(passing) == 1
    assert int(passing[0].split("\t")[1]) == trio_run["denovo_pos"] + 1


def test_sanity_harness(trio_run):
    result = subprocess.run(
        [sys.executable, "tools/sanity_checks.py", trio_run["vcf"], "--json"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    metrics = json.loads(result.stdout)
    assert metrics["n_records"] >= 2
    assert metrics["allele_padding_errors"] == 0
    ok, total = map(int, metrics["het_vaf_in_range"].split("/"))
    assert total >= 3 and ok >= total - 1
    ok2, total2 = map(int, metrics["gt_gl_consistent"].split("/"))
    assert ok2 == total2
