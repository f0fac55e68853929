"""Full-window golden pinned against the reference calling chain.

SURVEY §4's fixture plan calls for end-to-end calls pinned against the
reference's own output.  The reference binary itself cannot be built here
(docs/REFERENCE_ORACLE.md documents the attempt: python2-only sources, no
python2/Cython/htslib in the image, no network), so this uses the strongest
feasible oracle instead: tests/reference_oracle.py drives the COMPILED
reference align.c and tandem.c and transcribes the inference math from the
reference Cython sources, producing QUAL and GT for three hand-sized
single-variant windows (het SNP, hom SNP, het 2bp deletion) from first
principles.

Two layers of pinning:

* test_engine_matches_pinned_vcf — the engine's full VCF data lines on the
  deterministic fixture equal tests/goldens/ref_window_golden.json byte for
  byte (site/GT/QUAL/INFO/FILTER regression net; runs everywhere);
* test_oracle_reproduces_pinned — recomputes the oracle chain (needs
  /root/reference + gcc) and checks it still yields the pinned QUAL/GT,
  proving the pinned numbers derive from reference code, not from the
  engine under test.

Regenerate with tools/make_reference_window_golden.py after intentional
behaviour changes.
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "ref_window_golden.json")

REF_SEED = 20260817
SNP_HET_POS = 1200
SNP_HOM_POS = 2000
DEL_HET_POS = 2800
READ_LEN = 120
COVERAGE = 40


def _other_base(ref_seq, pos):
    return b"A" if ref_seq[pos] != ord("A") else b"G"


def _cluster(haps, pos, tag, n=COVERAGE, read_len=READ_LEN, qual=35):
    """n reads at staggered, pairwise-distinct starts (no duplicate-filter
    hits), every one spanning [pos-32, pos+10] so window membership cannot
    depend on window-boundary choices."""
    reads = []
    for i in range(n):
        ref_start = pos - 110 + 2 * i
        hap = haps[i % len(haps)]
        hap_start = hap.hap_pos_of(ref_start)
        assert hap_start is not None
        seq = hap.seq[hap_start:hap_start + read_len]
        bam_pos, cigar = hap.cigar_for(hap_start, read_len)
        reads.append(dict(name=f"{tag}_r{i}", ref_id=0, pos=bam_pos, mapq=60,
                          flag=0, cigar=cigar, seq=seq,
                          qual=[qual] * read_len))
    return reads


def build_fixture(tmp):
    """Deterministic fixture: three isolated single-variant read clusters."""
    ref_path, ref_seq = make_reference(tmp, length=4000, seed=REF_SEED)
    ref_hap = SimHaplotype(ref_seq, [])

    hap_a = SimHaplotype(ref_seq, [(SNP_HET_POS, 1, _other_base(ref_seq, SNP_HET_POS))])
    hap_c = SimHaplotype(ref_seq, [(SNP_HOM_POS, 1, _other_base(ref_seq, SNP_HOM_POS))])
    hap_d = SimHaplotype(ref_seq, [(DEL_HET_POS, 2, b"")])
    reads = (_cluster([hap_a, ref_hap], SNP_HET_POS, "het_snp")
             + _cluster([hap_c], SNP_HOM_POS, "hom_snp")
             + _cluster([hap_d, ref_hap], DEL_HET_POS, "het_del"))
    reads.sort(key=lambda r: r["pos"])
    bam_path = write_synth_bam(tmp, reads, ref_len=4000)
    return dict(ref_path=ref_path, ref_seq=ref_seq, bam_path=bam_path,
                reads=reads)


def engine_vcf_lines(tmp, fx):
    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import run_single_process

    out = os.path.join(str(tmp), "golden_out.vcf")
    config = PlatypusConfig(bam_files=[fx["bam_path"]], ref_file=fx["ref_path"],
                            output=out, regions=["chr20:1001-3500"])
    run_single_process(config, [("chr20", 1000, 3500)], out)
    with open(out) as fh:
        return [ln.rstrip("\n") for ln in fh if not ln.startswith("#")]


def _canon_gt(gt: str) -> str:
    """Engine GTs are ML-phased (e.g. 1|0); compare as unordered alleles."""
    return "/".join(sorted(gt.replace("|", "/").split("/")))


def parse_variant(cols):
    """VCF (1-based, padded) -> internal (0-based pos, removed, added)."""
    pos1, ref, alt = int(cols[1]), cols[3].encode(), cols[4].encode()
    if len(ref) == 1 and len(alt) == 1:
        return pos1 - 1, ref, alt
    # Left-padded indel: strip the shared anchor base.
    assert ref[:1] == alt[:1]
    return pos1, ref[1:], alt[1:]


def window_reads(reads, pos0):
    """The fixture cluster covering pos0 (all its reads span the variant)."""
    out = [r for r in reads if r["pos"] <= pos0 < r["pos"] + 130]
    assert out, f"no fixture reads cover {pos0}"
    return out


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def fixture_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refgolden")
    fx = build_fixture(tmp)
    fx["vcf_lines"] = engine_vcf_lines(tmp, fx)
    return fx


def test_engine_matches_pinned_vcf(fixture_run, golden):
    assert fixture_run["vcf_lines"] == golden["vcf_lines"]


def test_expected_sites_present(golden):
    positions = {int(l.split("\t")[1]) for l in golden["vcf_lines"]}
    assert SNP_HET_POS + 1 in positions
    assert SNP_HOM_POS + 1 in positions
    assert any(abs(p - DEL_HET_POS) <= 2 for p in positions)


_have_oracle = shutil.which("gcc") and os.path.exists(
    os.environ.get("REFERENCE_DIR", "/root/reference") + "/src/c/align.c")


@pytest.mark.skipif(not _have_oracle, reason="reference tree or gcc missing")
def test_oracle_reproduces_pinned(fixture_run, golden):
    """Recompute the reference-chain oracle and check the pinned QUAL/GT both
    ways: oracle == pinned oracle entries, and pinned VCF QUAL/GT == oracle."""
    import reference_oracle as oracle

    for line, entry in zip(golden["vcf_lines"], golden["oracle"]):
        cols = line.split("\t")
        pos0, removed, added = parse_variant(cols)
        reads = window_reads(fixture_run["reads"], pos0)
        res = oracle.call_window(fixture_run["ref_seq"], (pos0, removed, added),
                                 reads)
        assert res["phred"] == entry["phred"]
        assert res["gt"] == entry["gt"]
        assert int(float(cols[5])) == res["phred"]
        assert _canon_gt(cols[9].split(":")[0]) == res["gt"]
