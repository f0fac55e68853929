"""End-to-end test: synthetic reference + reads with known variants ->
full pipeline -> VCF with the expected sites and genotypes."""

import io
import os

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import run_single_process

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def _parse_vcf(path):
    records = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            sample = cols[9].split(":")
            records.append(
                dict(
                    chrom=cols[0], pos=int(cols[1]), ref=cols[3], alt=cols[4],
                    qual=cols[5], filter=cols[6],
                    info=dict(kv.split("=", 1) for kv in cols[7].split(";") if "=" in kv),
                    gt=sample[0],
                )
            )
    return records


@pytest.fixture(scope="module")
def synth_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    ref_path, ref_seq = make_reference(tmp, length=8000, seed=11)

    # Known variants: het SNP, hom SNP, het 3bp deletion, het 2bp insertion.
    het_snp_pos = 1500
    hom_snp_pos = 2500
    del_pos = 3500
    ins_pos = 4500

    def other_base(pos):
        return b"A" if ref_seq[pos] != ord("A") else b"G"

    hap_ref = SimHaplotype(ref_seq, [(hom_snp_pos, 1, other_base(hom_snp_pos))])
    hap_var = SimHaplotype(
        ref_seq,
        [
            (het_snp_pos, 1, other_base(het_snp_pos)),
            (hom_snp_pos, 1, other_base(hom_snp_pos)),
            (del_pos, 3, b""),
            (ins_pos, 0, b"TT" if ref_seq[ins_pos] != ord("T") else b"CC"),
        ],
    )

    reads = simulate_reads([hap_ref, hap_var], 1000, 6000, coverage=30, seed=5)
    bam_path = write_synth_bam(tmp, reads)

    out = str(tmp / "out.vcf")
    config = PlatypusConfig(
        bam_files=[bam_path], ref_file=ref_path, output=out,
        regions=["chr20:1001-6000"],
    )
    run_single_process(config, [("chr20", 1000, 6000)], out)
    records = _parse_vcf(out)
    return dict(
        records=records, ref_seq=ref_seq,
        het_snp_pos=het_snp_pos, hom_snp_pos=hom_snp_pos,
        del_pos=del_pos, ins_pos=ins_pos,
        other_base=other_base,
    )


def test_het_snp_called(synth_run):
    pos1 = synth_run["het_snp_pos"] + 1  # VCF 1-based
    matches = [r for r in synth_run["records"] if r["pos"] == pos1]
    assert matches, f"no call at het SNP position {pos1}"
    r = matches[0]
    assert r["alt"] == synth_run["other_base"](synth_run["het_snp_pos"]).decode()
    assert r["gt"] in ("0/1", "1/0")


def test_hom_snp_called(synth_run):
    pos1 = synth_run["hom_snp_pos"] + 1
    matches = [r for r in synth_run["records"] if r["pos"] == pos1]
    assert matches, f"no call at hom SNP position {pos1}"
    assert matches[0]["gt"] == "1/1"


def test_deletion_called(synth_run):
    # Deletion of ref[del_pos..del_pos+3); reported at the left-normalised
    # anchor base.
    del_pos = synth_run["del_pos"]
    matches = [
        r for r in synth_run["records"]
        if abs(r["pos"] - (del_pos + 1)) <= 30 and len(r["ref"]) - len(r["alt"]) == 3
    ]
    assert matches, "3bp deletion not called"
    assert matches[0]["gt"] in ("0/1", "1/0")


def test_insertion_called(synth_run):
    ins_pos = synth_run["ins_pos"]
    matches = [
        r for r in synth_run["records"]
        if abs(r["pos"] - (ins_pos + 1)) <= 30 and len(r["alt"]) - len(r["ref"]) == 2
    ]
    assert matches, "2bp insertion not called"
    assert matches[0]["gt"] in ("0/1", "1/0")


def test_no_spurious_high_qual_calls(synth_run):
    expected = {
        synth_run["het_snp_pos"], synth_run["hom_snp_pos"],
    }
    near = set()
    for p in (synth_run["del_pos"], synth_run["ins_pos"]):
        near.update(range(p - 30, p + 31))
    for r in synth_run["records"]:
        pos0 = r["pos"] - 1
        if pos0 in expected or pos0 in near:
            continue
        assert float(r["qual"]) < 100, f"spurious confident call at {r['pos']}: {r}"


def test_info_fields_sane(synth_run):
    for r in synth_run["records"]:
        info = r["info"]
        for key in ("TC", "TR", "NF", "NR", "PP", "FR", "WS", "WE", "SC", "HP",
                    "MGOF", "HapScore", "MMLQ", "QD", "BRF", "MQ", "SbPval", "Source"):
            assert key in info, f"missing INFO {key} in {r}"
        assert int(info["TC"]) >= int(info["TR"])
        tc = int(info["TC"])
        assert 0 < tc < 200


def test_read_pos_rank_sum_not_on_variant_lines(synth_run):
    """ReadPosRankSum is declared in the reference header (vcfutils.pyx:98)
    but NEVER computed for variant lines — only a "." placeholder on
    REFCALL blocks (variantcaller.pyx:844).  Verified against the RUNNING
    reference (docs/REFERENCE_RUN.md); variant records must omit it for
    byte-equivalence.  The Mann-Whitney z survives in utils/maths for the
    offline tools."""
    for r in synth_run["records"]:
        assert "ReadPosRankSum" not in r["info"], r


def test_mann_whitney_rank_sum_z_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(42)
    from platypus_tpu.utils.maths import mann_whitney_rank_sum_z

    assert mann_whitney_rank_sum_z([], [1, 2]) is None
    assert mann_whitney_rank_sum_z([1, 1], [1, 1]) == 0.0
    for trial in range(20):
        n1 = int(rng.integers(1, 30))
        n2 = int(rng.integers(1, 30))
        a = rng.integers(0, 50, n1).tolist()
        b = rng.integers(0, 50, n2).tolist()
        z = mann_whitney_rank_sum_z(a, b)
        u = scipy_stats.mannwhitneyu(a, b, alternative="two-sided",
                                     method="asymptotic",
                                     use_continuity=True)
        if u.pvalue >= 1.0:
            assert abs(z) < 1e-9
            continue
        p_from_z = 2.0 * scipy_stats.norm.sf(abs(z))
        assert abs(p_from_z - u.pvalue) < 1e-9, (trial, z, u)
