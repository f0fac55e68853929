"""Heads parity against the ACTUAL reference extensions.

The reference's de novo and somatic post-processors are pure-python
scripts (extensions/DeNovo/bayesianDeNovoFilter.py,
extensions/Cancer/somaticMutationDetector.py).  They were executed (via
lib2to3) on the BUNDLED real NA12878 trio VCF; their outputs are pinned in
tests/goldens/reference_run/ and this repo's `denovo` / `somatic` CLI
heads must reproduce them byte-for-byte."""

import os
import shutil
import subprocess
import sys

import pytest

TRIO_VCF = "/root/reference/extensions/DeNovo/NA12878_Trio_chr20.vcf"
PED = "/root/reference/extensions/DeNovo/NA.ped"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                          "reference_run")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(TRIO_VCF), reason="trio VCF missing")
def test_denovo_head_matches_reference_extension(tmp_path):
    shutil.copy(TRIO_VCF, tmp_path / "NA12878_Trio_chr20.vcf")
    shutil.copy(PED, tmp_path / "NA.ped")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "denovo",
         "NA12878_Trio_chr20.vcf", "NA.ped"],
        check=True, capture_output=True, cwd=str(tmp_path),
        env=dict(os.environ, PYTHONPATH=REPO))
    for suffix in ("mendelErrors", "deNovoVariants",
                   "deNovoVariantsPassingBayesianFilter"):
        got = open(tmp_path / f"NA12878_Trio_chr20_{suffix}.vcf").read()
        want = open(os.path.join(
            GOLDEN_DIR, f"NA12878_Trio_chr20_{suffix}.vcf")).read()
        assert got == want, suffix


@pytest.mark.skipif(not os.path.exists(TRIO_VCF), reason="trio VCF missing")
def test_somatic_head_matches_reference_extension(tmp_path):
    out = str(tmp_path / "somatic.vcf")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "somatic",
         "--inputVCF", TRIO_VCF, "--outputVCF", out,
         "--tumourSample", "NA12878", "--normalSample", "NA12891",
         "--minPosterior", "5"],
        check=True, capture_output=True, cwd=REPO)
    want = open(os.path.join(GOLDEN_DIR, "ref_somatic.vcf")).read()
    assert open(out).read() == want
