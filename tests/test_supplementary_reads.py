"""Supplementary (0x800) and zero-cigar reads through QC and calling.

Two behaviours pinned on synthetic data (no S55 gating) after the
round-4 real-read findings:

* the reference clears flag bit 2048 at load (htslibWrapper.pyx:404 —
  it reuses the bit as its internal compressed marker), so supplementary
  alignments flow through QC as ordinary reads and must land in the GOOD
  pile here too;
* an unmapped mate decodes with ZERO cigar ops; when pile layout puts
  one at the END of a read set, CigarRefs.single_m_mask's offset gather
  used to raise IndexError and window crash containment silently dropped
  the window's records.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.region import load_region_buffers
from platypus_tpu.io.bam import BamFile, FLAG_SUPPLEMENTARY

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("supp")
    ref_path, ref_seq = make_reference(tmp, length=8000, seed=23)
    snp_pos = 3000
    alt = b"A" if ref_seq[snp_pos] != ord("A") else b"G"
    hap = SimHaplotype(ref_seq, [(snp_pos, 1, alt)])
    reads = simulate_reads([SimHaplotype(ref_seq, []), hap], 1000, 6000,
                           coverage=30, seed=7)
    # One supplementary alignment carrying the variant: must count as an
    # ordinary good read (reference keeps it).
    carrier = next(r for r in reads
                   if r["pos"] <= snp_pos - 20 and r["pos"] + 80 > snp_pos + 20)
    supp = dict(carrier)
    supp["name"] = "supp1"
    supp["flag"] = carrier["flag"] | FLAG_SUPPLEMENTARY
    # One unmapped mate (zero cigar ops) positioned to sort LAST in the
    # bad pile — the layout that crashed single_m_mask.
    unmapped = dict(
        name="unm1", ref_id=0, pos=5900, mapq=0, flag=0x85,
        cigar=[], seq=b"A" * 50, qual=[20] * 50,
        mate_ref_id=0, mate_pos=5900, tlen=0,
    )
    bam = write_synth_bam(tmp, reads + [supp, unmapped])
    return dict(tmp=str(tmp), ref=ref_path, bam=bam, snp=snp_pos,
                alt=alt.decode(), n_sim=len(reads))


def test_supplementary_read_kept_good_unmapped_bad(data):
    cfg = PlatypusConfig()
    with BamFile(data["bam"]) as bam:
        bufs = load_region_buffers([bam], {bam: ["S1"]}, "chr20", 1000, 6000, cfg)
    buf = bufs[0]
    flags = buf.good.flag
    assert ((flags & FLAG_SUPPLEMENTARY) != 0).sum() == 1, \
        "supplementary read must stay in the good pile (reference parity)"
    # mapq 0 trips the earlier low-mapq filter (same cascade order as the
    # reference: mapq at cwindow.pyx:341 before unmapped at :360).
    assert (buf.filter_counts["low_map_qual"]
            + buf.filter_counts["unmapped"]) == 1
    # zero-cigar read present in the bad pile
    bad_ops = buf.bad.cigar_off[1:] - buf.bad.cigar_off[:-1]
    assert (bad_ops == 0).sum() == 1


def test_calling_with_zero_cigar_read_at_pile_end(data):
    """End-to-end CLI call over the window; records must not be lost to a
    swallowed single_m_mask IndexError."""
    out = os.path.join(data["tmp"], "out.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         f"--bamFiles={data['bam']}", f"--refFile={data['ref']}",
         "--regions=chr20:1001-6000", "--nCPU=1", "-o", out],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-500:]
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert any(int(f[1]) == data["snp"] + 1 and f[4] == data["alt"]
               for f in recs), recs
    assert "Exception in window" not in r.stderr
