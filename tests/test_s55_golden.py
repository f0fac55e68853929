"""Whole-S55 CLI regression golden (VERDICT r2 item 4).

The FULL bundled real-read BAM (all five HLA read islands of
/root/reference/test/S55_test_realigned.bam, 2115 reads) is re-hosted onto
deterministic consensus contigs (tests/s55util.py) and called through the
actual CLI; the emitted data lines are pinned byte-for-byte in
tests/goldens/s55_calls.vcf so ANY cross-round behavioural drift on real
reads fails loudly.  Regenerate with tools/make_s55_golden.py after an
intentional behaviour change.
"""

import os
import subprocess
import sys

import pytest

from s55util import S55, build_s55_full

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "s55_calls.vcf")


def cli_call_s55(tmp):
    fx = build_s55_full(tmp)
    out = os.path.join(str(tmp), "s55_full_calls.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         f"--bamFiles={fx['bam']}", f"--refFile={fx['ref']}",
         "-o", out],
        check=True, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    with open(out) as fh:
        return fx, [ln.rstrip("\n") for ln in fh if not ln.startswith("#")]


@pytest.fixture(scope="module")
def s55_run(tmp_path_factory):
    return cli_call_s55(tmp_path_factory.mktemp("s55_golden"))


@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
def test_s55_cli_matches_pinned_golden(s55_run):
    _fx, lines = s55_run
    with open(GOLDEN_PATH) as fh:
        golden = [ln.rstrip("\n") for ln in fh if not ln.startswith("#")]
    assert lines == golden


@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
def test_s55_full_covers_all_islands(s55_run):
    fx, lines = s55_run
    assert fx["n_reads"] > 2000
    contigs_called = {l.split("\t")[0] for l in lines}
    # Real diploid HLA data: every island should yield calls.
    assert contigs_called == {name for name, _ in fx["contigs"]}
