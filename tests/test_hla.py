"""HLA typing mode end-to-end on synthetic data: a panel of region-length
alleles in a source VCF, reads simulated from two of them, one GT call."""

import io
import os

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig, derive_runtime
from platypus_tpu.engine.hla import call_hla_variants_in_region
from platypus_tpu.io.bam import BamFile
from platypus_tpu.io.fasta import FastaFile
from platypus_tpu.io.tabix import write_tabix_vcf

from synth import make_reference, write_synth_bam


@pytest.fixture(scope="module")
def hla_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hla")
    ref_path, ref_seq = make_reference(tmp, length=4000, seed=31, name="6")
    region_start, region_end = 1000, 1800
    region_ref = ref_seq.tobytes()[region_start:region_end]

    # Build 4 alleles as whole-region replacements with distinct SNP sets.
    rng = np.random.default_rng(32)
    alleles = []
    for a in range(4):
        allele = bytearray(region_ref)
        for p in rng.choice(len(allele), size=12, replace=False):
            cur = allele[p]
            choices = [b for b in b"ACGT" if b != cur]
            allele[p] = int(rng.choice(choices))
        alleles.append(bytes(allele))

    vcf_lines = [
        "##fileformat=VCFv4.0",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    for a, allele in enumerate(alleles):
        vcf_lines.append(
            f"6\t{region_start + 1}\t.\t{region_ref.decode()}\t{allele.decode()}"
            f"\t100\tPASS\tHLAAllele=A*{a:02d}"
        )
    vcf_path = str(tmp / "haps.vcf.gz")
    write_tabix_vcf(vcf_lines, vcf_path)

    # Reads from alleles 1 and 2 (het genotype 1/2 in panel order).
    genome1 = ref_seq.tobytes()[:region_start] + alleles[1] + ref_seq.tobytes()[region_end:]
    genome2 = ref_seq.tobytes()[:region_start] + alleles[2] + ref_seq.tobytes()[region_end:]
    reads = []
    rng2 = np.random.default_rng(33)
    for i in range(160):
        g = genome1 if i % 2 == 0 else genome2
        start = int(rng2.integers(900, 1800))
        seq = g[start : start + 100]
        if len(seq) < 100:
            continue
        reads.append(dict(name=f"r{i}", ref_id=0, pos=start, mapq=60, flag=0,
                          cigar=[(0, 100)], seq=seq, qual=[35] * 100))
    reads.sort(key=lambda r: r["pos"])
    bam_path = write_synth_bam(tmp, reads, ref_name="6", ref_len=4000)

    return dict(
        ref_path=ref_path, vcf_path=vcf_path, bam_path=bam_path,
        region=(region_start, region_end), alleles=alleles, region_ref=region_ref,
    )


def test_hla_typing_calls_correct_alleles(hla_setup):
    config = PlatypusConfig(
        bam_files=[hla_setup["bam_path"]], ref_file=hla_setup["ref_path"],
        hla_typing=1, long_haps=1, source_file=[hla_setup["vcf_path"]],
        assemble=0, get_variants_from_bams=0, min_reads=2,
    )
    rt = derive_runtime(config, n_individuals=1)
    rt.rlen = 100
    out = io.StringIO()
    with BamFile(hla_setup["bam_path"]) as bam, FastaFile(hla_setup["ref_path"]) as ref:
        start, end = hla_setup["region"]
        n = call_hla_variants_in_region(
            "6", start, end, [bam], {bam: ["SAMPLE1"]}, ref, config, rt, out
        )
    assert n == 1
    lines = [l for l in out.getvalue().splitlines() if l]
    assert len(lines) == 1
    cols = lines[0].split("\t")
    assert cols[0] == "6"
    assert int(cols[1]) == start + 1
    alts = cols[4].split(",")
    gt = cols[9].split(":")[0]
    # The two called ALT alleles must be exactly alleles 1 and 2.
    called = set()
    for g in gt.split(","):
        for idx in g.split("/"):
            if idx != "0":
                called.add(alts[int(idx) - 1].encode())
    assert called == {hla_setup["alleles"][1], hla_setup["alleles"][2]}, (
        f"called alleles wrong; GT={gt}"
    )
