"""Smoke matrix over less-exercised option combinations: each flag must
actually steer the pipeline (variantcaller.pyx wires these through
candidate generation and window filtering)."""

import os

import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import run_single_process
from platypus_tpu.io.tabix import write_tabix_vcf

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flags")
    ref_path, ref_seq = make_reference(tmp, length=8000, seed=11)
    snp_pos, del_pos = 2000, 3000

    def other_base(pos):
        return b"A" if ref_seq[pos] != ord("A") else b"G"

    hap_var = SimHaplotype(
        ref_seq, [(snp_pos, 1, other_base(snp_pos)), (del_pos, 3, b"")]
    )
    reads = simulate_reads([SimHaplotype(ref_seq, []), hap_var], 1000, 5000,
                           coverage=30, seed=5)
    bam = write_synth_bam(tmp, reads)
    return dict(tmp=str(tmp), ref=ref_path, bam=bam, snp=snp_pos, dele=del_pos,
                alt=other_base(snp_pos).decode())


def _call(data, name, **kw):
    cfg = PlatypusConfig(bam_files=[data["bam"]], ref_file=data["ref"],
                         regions=["chr20:1001-5000"], **kw)
    out = os.path.join(data["tmp"], f"{name}.vcf")
    run_single_process(cfg, [("chr20", 1000, 5000)], out)
    return [l.split("\t") for l in open(out) if not l.startswith("#")]


def _positions(recs):
    return {int(r[1]) for r in recs}


def test_gen_snps_off(data):
    recs = _call(data, "nosnp", gen_snps=0)
    assert data["snp"] + 1 not in _positions(recs)
    assert any(abs(p - data["dele"]) <= 1 for p in _positions(recs))


def test_gen_indels_off(data):
    recs = _call(data, "noindel", gen_indels=0)
    assert data["snp"] + 1 in _positions(recs)
    assert not any(abs(p - data["dele"]) <= 1 for p in _positions(recs))


def test_source_only_calling(data):
    """getVariantsFromBAMs=0 + sourceFile genotypes exactly the listed
    variants (variantcaller.pyx candidate source gating)."""
    src = os.path.join(data["tmp"], "cands.vcf.gz")
    import numpy as np

    from platypus_tpu.io.fasta import FastaFile

    ref = FastaFile(data["ref"])
    refb = ref.get_sequence("chr20", data["snp"], data["snp"] + 1).decode()
    lines = [
        "##fileformat=VCFv4.0",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        f"chr20\t{data['snp'] + 1}\t.\t{refb}\t{data['alt']}\t100\tPASS\t.",
    ]
    write_tabix_vcf(lines, src)
    recs = _call(data, "srconly", get_variants_from_bams=0, source_file=[src])
    assert _positions(recs) == {data["snp"] + 1}
    gt = recs[0][9].split(":")[0]
    assert gt in ("0/1", "1/0")


def test_min_var_freq_gate(data):
    """minVarFreq above the het VAF suppresses the candidates."""
    recs = _call(data, "vaf", min_var_freq=0.9)
    assert data["snp"] + 1 not in _positions(recs)


def test_max_variants_cap(data):
    """maxVariants=1 still emits the strongest variants per window."""
    recs = _call(data, "cap", max_variants=1)
    assert data["snp"] + 1 in _positions(recs)


def test_min_posterior_filters_all(data):
    recs = _call(data, "post", min_posterior=3000)
    assert recs == []
