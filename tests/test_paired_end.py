"""End-to-end calling on proper paired-end reads with overlapping mates.

Exercises the mate plumbing the single-end synth tests never touch: paired
flags, insert sizes, and the overlapping-mate quality zeroing
(cwindow.pyx:438-440) which must stop double-counting variant support from
the two copies of the same fragment.
"""

import os

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import run_single_process
from platypus_tpu.io.bam import write_bam

from synth import make_reference

FLAG_PAIRED = 1
FLAG_PROPER = 2
FLAG_REVERSE = 16
FLAG_MATE_REVERSE = 32
FLAG_READ1 = 64
FLAG_READ2 = 128

RLEN = 100


def _pair(name, hap, p1, insert, ref_id=0, qual=35):
    """One proper pair on `hap` (a bytes haplotype in ref coordinates):
    forward R1 at p1, reverse R2 ending at p1+insert."""
    p2 = p1 + insert - RLEN
    r1 = dict(name=name, ref_id=ref_id, pos=p1,
              flag=FLAG_PAIRED | FLAG_PROPER | FLAG_MATE_REVERSE | FLAG_READ1,
              cigar=[(0, RLEN)], seq=bytes(hap[p1 : p1 + RLEN]),
              qual=[qual] * RLEN, mate_ref_id=ref_id, mate_pos=p2, tlen=insert)
    r2 = dict(name=name, ref_id=ref_id, pos=p2,
              flag=FLAG_PAIRED | FLAG_PROPER | FLAG_REVERSE | FLAG_READ2,
              cigar=[(0, RLEN)], seq=bytes(hap[p2 : p2 + RLEN]),
              qual=[qual] * RLEN, mate_ref_id=ref_id, mate_pos=p1, tlen=-insert)
    return [r1, r2]


@pytest.fixture(scope="module")
def paired_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("paired")
    ref_path, ref_seq = make_reference(tmp, length=9000, seed=11)
    snp_pos = 4000
    alt = ord("T") if ref_seq[snp_pos] != ord("T") else ord("C")
    hap_var = bytearray(ref_seq.tobytes())
    hap_var[snp_pos] = alt
    hap_ref = ref_seq.tobytes()

    rng = np.random.default_rng(5)
    reads = []
    # 30 het pairs with insert 150 -> mates overlap by 50bp; place the SNP
    # inside the overlap for half of them.
    for i in range(30):
        hap = hap_var if i % 2 == 0 else hap_ref
        p1 = snp_pos - 75 + int(rng.integers(-40, 40))
        reads.extend(_pair(f"frag{i}", bytes(hap), p1, 150))
    # 30 more well-separated pairs (insert 400, no overlap).
    for i in range(30):
        hap = hap_var if i % 2 == 0 else hap_ref
        p1 = snp_pos - 350 + int(rng.integers(0, 300))
        reads.extend(_pair(f"far{i}", bytes(hap), p1, 400))
    reads.sort(key=lambda r: r["pos"])
    bam = os.path.join(str(tmp), "paired.bam")
    write_bam(bam, [("chr20", 9000)], reads)

    def call(**kw):
        cfg = PlatypusConfig(bam_files=[bam], ref_file=ref_path,
                             regions=["chr20:3000-5000"], **kw)
        out = os.path.join(str(tmp), f"out{len(kw)}_{kw.get('trim_overlapping', 1)}.vcf")
        run_single_process(cfg, [("chr20", 3000, 5000)], out)
        recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
        return recs

    return snp_pos, chr(alt), call


def test_het_snp_called_from_pairs(paired_run):
    snp_pos, alt, call = paired_run
    recs = call()
    site = [r for r in recs if int(r[1]) == snp_pos + 1]
    assert len(site) == 1, f"expected one call at {snp_pos + 1}: {recs}"
    assert site[0][4] == alt
    gt = site[0][9].split(":")[0]
    assert gt in ("0/1", "1/0")


def test_overlap_trimming_matches_reference_semantics(paired_run):
    """Overlap trimming zeroes the forward mate's duplicated segment, which
    feeds the GENOTYPE LIKELIHOODS (qual-0 bases are free to mismatch, so
    the duplicate copy becomes uninformative).  NV is deliberately
    UNCHANGED: the reference's per-variant read count ignores base
    qualities for SNPs (variantSupportedByRead has no qual check, and
    readQualIsGoodVariantPosition sees an empty window because
    bamMinPos == bamMaxPos, vcfutils.pyx:917-935,961-1072)."""
    snp_pos, alt, call = paired_run

    def site_rec(recs):
        site = [r for r in recs if int(r[1]) == snp_pos + 1]
        assert site, recs
        return site[0]

    rec_trim = site_rec(call(trim_overlapping=1))
    rec_notrim = site_rec(call(trim_overlapping=0))
    nv_trim = int(rec_trim[9].strip().split(":")[-1])
    nv_notrim = int(rec_notrim[9].strip().split(":")[-1])
    assert nv_trim == nv_notrim
    # Both calls stay confidently het.
    assert rec_trim[9].split(":")[0] in ("0/1", "1/0")
    assert rec_notrim[9].split(":")[0] in ("0/1", "1/0")


def test_overlap_trimming_zeroes_forward_mate(paired_run, tmp_path):
    """Direct check that the buffers fed to the caller have the forward
    mate's overlapping tail quality-zeroed (cwindow.pyx:438-440)."""
    import numpy as np

    from platypus_tpu.io.bam import write_bam, BamFile
    from platypus_tpu.io.readbuffer import QCOptions, check_and_trim_reads

    hap = bytes(np.random.default_rng(0).choice(
        np.frombuffer(b"ACGT", np.uint8), size=400))
    r1, r2 = _pair("f", hap, 100, 150)
    bam = os.path.join(str(tmp_path), "one.bam")
    write_bam(bam, [("chr20", 9000)], [r1, r2])
    rs = BamFile(bam).fetch("chr20", 0, 9000)
    check_and_trim_reads(rs, QCOptions())
    fwd = 0 if not rs.flag[0] & FLAG_REVERSE else 1
    rev = 1 - fwd
    n_zero = min(RLEN, 2 * RLEN - 150 + 1)
    assert (rs.qual[fwd][RLEN - n_zero : RLEN] == 0).all()
    assert (rs.qual[fwd][: RLEN - n_zero] == 35).all()
    assert (rs.qual[rev][:RLEN] == 35).all()
