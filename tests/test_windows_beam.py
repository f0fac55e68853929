"""Window clustering rules, the beam-search haplotype path for dense
windows, and source-VCF candidates through the standard calling path."""

import numpy as np
import pytest

from platypus_tpu.candidates.variant import FILE_VAR, Variant
from platypus_tpu.candidates.windows import generate_windows
from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import run_single_process
from platypus_tpu.io.tabix import write_tabix_vcf

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def _var(pos, removed=b"A", added=b"G", chrom="c1"):
    return Variant(chrom, pos, removed, added, 5, 1)


def test_window_clustering_rules():
    # Interacting variants share a window; nearby ones merge; distant split.
    vs = [_var(100), _var(105), _var(160), _var(400)]
    wins = list(generate_windows("c1", 0, 1000, 999, vs, rlen=100))
    spans = [(w.start_pos, w.end_pos, len(w.variants)) for w in wins]
    # 100+105 merge (gap < maxVarDist); 160 is > maxVarDist from 105 -> new
    # window; 400 separate.
    assert len(wins) == 3
    assert spans[0][2] == 2
    assert spans[1][2] == 1 and spans[2][2] == 1


def test_window_max_variants_split():
    # 10 variants 10bp apart: maxVariants=8 forces a split at a gap >= minVarDist.
    vs = [_var(100 + 10 * i) for i in range(10)]
    wins = list(generate_windows("c1", 0, 1000, 999, vs, rlen=200, max_variants=8))
    assert len(wins) >= 2
    assert sum(len(w.variants) for w in wins) == 10


def test_overlapping_variants_same_window():
    # A deletion spanning a SNP forces one window regardless of distances.
    deletion = Variant("c1", 100, b"ACGTACGTAC", b"", 5, 1)
    snp = _var(105)
    wins = list(generate_windows("c1", 0, 1000, 999, sorted([deletion, snp],
                key=lambda v: v.sort_key()), rlen=100))
    assert len(wins) == 1
    assert len(wins[0].variants) == 2


def test_dense_window_beam_search(tmp_path):
    """7 real het SNPs 12bp apart (individual candidates, one merged
    window of 7 > log2(maxHaplotypes) variants): the beam-search haplotype
    path must still call them."""
    ref_path, ref_seq = make_reference(tmp_path, length=4000, seed=71)
    positions = [2000 + 12 * i for i in range(7)]
    variants = []
    for p in positions:
        alt = b"A" if ref_seq[p] != ord("A") else b"G"
        variants.append((p, 1, alt))
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap_ref, hap_var], 1500, 2500, coverage=40, seed=72)
    bam = write_synth_bam(tmp_path, reads, ref_len=4000)
    out = str(tmp_path / "dense.vcf")
    config = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out)
    run_single_process(config, [("chr20", 1500, 2500)], out)
    called = set()
    for line in open(out):
        if not line.startswith("#"):
            called.add(int(line.split("\t")[1]) - 1)
    found = sum(1 for p in positions if p in called)
    assert found >= 6, f"beam search missed variants: called {sorted(called)}"


def test_source_vcf_candidates_in_normal_path(tmp_path):
    """A variant with NO read evidence in CIGARs (mapper hid it as
    mismatches... actually zero support) is still considered when supplied
    via --source, and correctly genotyped 0/0; one with read support is
    called."""
    ref_path, ref_seq = make_reference(tmp_path, length=4000, seed=73)
    pos_supported = 2000
    pos_absent = 2600
    alt_s = b"A" if ref_seq[pos_supported] != ord("A") else b"G"
    alt_a = b"A" if ref_seq[pos_absent] != ord("A") else b"G"
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, [(pos_supported, 1, alt_s)])
    reads = simulate_reads([hap_ref, hap_var], 1500, 3000, coverage=30, seed=74)
    bam = write_synth_bam(tmp_path, reads, ref_len=4000)

    vcf_lines = [
        "##fileformat=VCFv4.0",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        f"chr20\t{pos_supported + 1}\t.\t{chr(ref_seq[pos_supported])}\t{alt_s.decode()}\t100\tPASS\t.",
        f"chr20\t{pos_absent + 1}\t.\t{chr(ref_seq[pos_absent])}\t{alt_a.decode()}\t100\tPASS\t.",
    ]
    src = str(tmp_path / "cands.vcf.gz")
    write_tabix_vcf(vcf_lines, src)

    out = str(tmp_path / "srccall.vcf")
    config = PlatypusConfig(
        bam_files=[bam], ref_file=ref_path, output=out,
        source_file=[src], get_variants_from_bams=0, min_posterior=0,
    )
    run_single_process(config, [("chr20", 1500, 3000)], out)
    recs = {}
    for line in open(out):
        if not line.startswith("#"):
            cols = line.split("\t")
            recs[int(cols[1]) - 1] = cols
    assert pos_supported in recs
    gt = recs[pos_supported][9].split(":")[0]
    assert gt in ("0/1", "1/0")
    # The unsupported candidate either isn't reported or is genotyped ref.
    if pos_absent in recs:
        assert recs[pos_absent][9].split(":")[0] in ("0/0", "./.")
