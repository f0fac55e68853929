"""Tests for the somatic (tumour/normal) and de novo (trio) heads."""

import io
import math

import pytest

from platypus_tpu.heads.denovo import (
    TrioRecord,
    compute_bayes_factor,
    filter_denovo_vcf,
    is_de_novo,
    is_mendel_error,
    passes_bayesian_filter,
    read_pedigree,
)
from platypus_tpu.heads.somatic import filter_somatic_vcf, somatic_posterior_phred


# ---------------------------------------------------------------------------
# Somatic
# ---------------------------------------------------------------------------

def test_somatic_posterior_clear_somatic():
    # Normal confidently 0/0, tumour confidently het.
    post = somatic_posterior_phred(200, [0.0, -30.0, -60.0], [-30.0, 0.0, -25.0])
    assert post > 50


def test_somatic_posterior_germline():
    # Both samples het: not somatic.
    post = somatic_posterior_phred(200, [-30.0, 0.0, -25.0], [-30.0, 0.0, -25.0])
    assert post < 5


def test_somatic_posterior_capped_by_qual():
    post = somatic_posterior_phred(12, [0.0, -30.0, -60.0], [-30.0, 0.0, -25.0])
    assert post == 12


def test_somatic_vcf_filter():
    header = (
        "##fileformat=VCFv4.0\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNORMAL\tTUMOUR\n"
    )
    somatic_line = (
        "chr1\t100\t.\tA\tG\t200\tPASS\tTC=50\tGT:GL:GQ:NR:NV\t"
        "0/0:0.0,-30.0,-60.0:99:25:0\t0/1:-30.0,0.0,-25.0:99:25:12\n"
    )
    germline_line = (
        "chr1\t200\t.\tC\tT\t200\tPASS\tTC=50\tGT:GL:GQ:NR:NV\t"
        "0/1:-30.0,0.0,-25.0:99:25:12\t0/1:-30.0,0.0,-25.0:99:25:13\n"
    )
    out = io.StringIO()
    n = filter_somatic_vcf(io.StringIO(header + somatic_line + germline_line),
                           out, "TUMOUR", "NORMAL")
    assert n == 1
    body = [l for l in out.getvalue().splitlines() if not l.startswith("#")]
    assert len(body) == 1
    assert body[0].startswith("chr1\t100")


# ---------------------------------------------------------------------------
# De novo
# ---------------------------------------------------------------------------

def _trio(child_gt, mother_gt, father_gt, child_gl, mother_gl, father_gl,
          chrom="1", nv=(12, 0, 0), nr=(25, 25, 25), gq=(99, 99, 99)):
    return TrioRecord(
        chrom, 1000, child_gt, mother_gt, father_gt,
        child_gl, mother_gl, father_gl,
        gq[0], gq[1], gq[2], nr[0], nr[1], nr[2], nv[0], nv[1], nv[2],
    )


REF_GL = [0.0, -30.0, -60.0]
HET_GL = [-30.0, 0.0, -25.0]


def test_mendel_error_detection():
    # 0/1 child with 0/0 x 0/0 parents: mendelian error.
    rec = _trio(("0", "1"), ("0", "0"), ("0", "0"), HET_GL, REF_GL, REF_GL)
    assert is_mendel_error(rec, "F")
    # Inherited het is consistent.
    rec2 = _trio(("0", "1"), ("0", "1"), ("0", "0"), HET_GL, HET_GL, REF_GL)
    assert not is_mendel_error(rec2, "F")
    # Low GQ suppresses the call.
    rec3 = _trio(("0", "1"), ("0", "0"), ("0", "0"), HET_GL, REF_GL, REF_GL,
                 gq=(10, 99, 99))
    assert not is_mendel_error(rec3, "F")


def test_de_novo_hard_filters():
    good = _trio(("0", "1"), ("0", "0"), ("0", "0"), HET_GL, REF_GL, REF_GL)
    assert is_de_novo(good, "F")
    # Too few child variant reads.
    low_nv = _trio(("0", "1"), ("0", "0"), ("0", "0"), HET_GL, REF_GL, REF_GL,
                   nv=(4, 0, 0))
    assert not is_de_novo(low_nv, "F")
    # Parental contamination.
    parental = _trio(("0", "1"), ("0", "0"), ("0", "0"), HET_GL, REF_GL, REF_GL,
                     nv=(12, 3, 0))
    assert not is_de_novo(parental, "F")


def test_bayes_factor_supports_clear_denovo():
    rec = _trio(("0", "1"), ("0", "0"), ("0", "0"), HET_GL, REF_GL, REF_GL)
    bf = compute_bayes_factor(rec, "F")
    assert bf < 0  # de novo model wins
    assert passes_bayesian_filter(rec, "F")
    # Ambiguous child likelihood: no support.
    rec2 = _trio(("0", "1"), ("0", "0"), ("0", "0"), [0.0, -0.1, -10.0], REF_GL, REF_GL)
    assert compute_bayes_factor(rec2, "F") > 0


def test_denovo_vcf_pipeline(tmp_path):
    ped = tmp_path / "trio.ped"
    ped.write_text("FAM1\tCHILD\tDAD\tMUM\t2\t2\nFAM1\tDAD\t0\t0\t1\t1\nFAM1\tMUM\t0\t0\t2\t1\n")
    header = (
        "##fileformat=VCFv4.0\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tCHILD\tDAD\tMUM\n"
    )
    dn_line = (
        "chr1\t100\t.\tA\tG\t500\tPASS\tTC=50\tGT:GL:GQ:NR:NV\t"
        "0/1:-30.0,0.0,-25.0:99:25:12\t0/0:0.0,-30.0,-60.0:99:25:0\t"
        "0/0:0.0,-30.0,-60.0:99:25:0\n"
    )
    inherited = (
        "chr1\t200\t.\tC\tT\t500\tPASS\tTC=50\tGT:GL:GQ:NR:NV\t"
        "0/1:-30.0,0.0,-25.0:99:25:12\t0/1:-30.0,0.0,-25.0:99:25:11\t"
        "0/0:0.0,-30.0,-60.0:99:25:0\n"
    )
    out_m, out_d, out_f = io.StringIO(), io.StringIO(), io.StringIO()
    counts = filter_denovo_vcf(io.StringIO(header + dn_line + inherited),
                               str(ped), out_m, out_d, out_f)
    assert counts == (1, 1, 1)
    passing = [l for l in out_f.getvalue().splitlines() if not l.startswith("#")]
    assert len(passing) == 1 and passing[0].startswith("chr1\t100")
