"""Fuzz / edge-case robustness: messy reads, contig edges, random option
combinations — the engine must not crash and must produce parsable VCF."""

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig
from platypus_tpu.engine.runner import run_single_process
from platypus_tpu.io.bam import write_bam
from platypus_tpu.io.fasta import build_index

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def _check_vcf_parses(path):
    from platypus_tpu.io.vcfreader import VCFReader

    with VCFReader(path) as r:
        return list(r)


def test_contig_edge_variants(tmp_path):
    """Variants within a read length of position 0 and the contig end."""
    ref_path, ref_seq = make_reference(tmp_path, length=3000, seed=81)
    edge_lo, edge_hi = 120, 2940
    variants = []
    for p in (edge_lo, edge_hi):
        alt = b"A" if ref_seq[p] != ord("A") else b"G"
        variants.append((p, 1, alt))
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap_ref, hap_var], 0, 3000, coverage=35, seed=82)
    bam = write_synth_bam(tmp_path, reads, ref_len=3000)
    out = str(tmp_path / "edge.vcf")
    config = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out)
    run_single_process(config, [("chr20", 0, 3000)], out)
    recs = _check_vcf_parses(out)
    called = {r.pos0 for r in recs}
    assert edge_lo in called
    # Near-end variant: call is best-effort (haplotype flank clamps at the
    # contig boundary) but must never crash.


def test_messy_reads_do_not_crash(tmp_path):
    """Ns, heavy soft clips, tiny reads, duplicate positions, weird mates."""
    rng = np.random.default_rng(83)
    ref_path, ref_seq = make_reference(tmp_path, length=4000, seed=83)
    genome = ref_seq.tobytes()
    reads = []
    for i in range(300):
        start = int(rng.integers(500, 3400))
        kind = i % 6
        if kind == 0:  # N-rich read
            seq = bytearray(genome[start : start + 100])
            for j in rng.integers(0, 100, 20):
                seq[j] = ord("N")
            reads.append(dict(name=f"n{i}", ref_id=0, pos=start, mapq=60, flag=0,
                              cigar=[(0, 100)], seq=bytes(seq), qual=[30] * 100))
        elif kind == 1:  # heavy soft clips both ends
            seq = genome[start : start + 100]
            reads.append(dict(name=f"s{i}", ref_id=0, pos=start + 30, mapq=60, flag=0,
                              cigar=[(4, 30), (0, 40), (4, 30)], seq=seq,
                              qual=[30] * 100))
        elif kind == 2:  # tiny read
            seq = genome[start : start + 12]
            reads.append(dict(name=f"t{i}", ref_id=0, pos=start, mapq=60, flag=0,
                              cigar=[(0, 12)], seq=seq, qual=[30] * 12))
        elif kind == 3:  # paired, mate unmapped
            seq = genome[start : start + 100]
            reads.append(dict(name=f"m{i}", ref_id=0, pos=start, mapq=60, flag=1 | 8,
                              cigar=[(0, 100)], seq=seq, qual=[30] * 100))
        elif kind == 4:  # low mapq
            seq = genome[start : start + 100]
            reads.append(dict(name=f"q{i}", ref_id=0, pos=start, mapq=3, flag=0,
                              cigar=[(0, 100)], seq=seq, qual=[30] * 100))
        else:  # normal read with a few errors
            seq = bytearray(genome[start : start + 100])
            for j in rng.integers(0, 100, 2):
                seq[j] = int(rng.choice(np.frombuffer(b"ACGT", np.uint8)))
            reads.append(dict(name=f"r{i}", ref_id=0, pos=start, mapq=60, flag=0,
                              cigar=[(0, 100)], seq=bytes(seq), qual=[30] * 100))
    reads.sort(key=lambda r: r["pos"])
    bam = write_synth_bam(tmp_path, reads, ref_len=4000)
    out = str(tmp_path / "messy.vcf")
    config = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out)
    run_single_process(config, [("chr20", 0, 4000)], out)
    _check_vcf_parses(out)


@pytest.mark.parametrize("opts", [
    dict(min_reads=1, min_posterior=0),
    dict(max_variants=3, merge_clustered_variants=0),
    dict(output_ref_calls=1, ref_call_block_size=250),
    dict(assemble=1, assemble_all=1),
    dict(compress_reads=1, qual_bin_size=10),
    dict(gen_snps=0),
    dict(gen_indels=0),
    dict(max_haplotypes=12),
    dict(use_em_likelihoods=1),
    dict(trim_read_flank=8, min_flank=3),
])
def test_option_combinations_smoke(tmp_path, opts):
    ref_path, ref_seq = make_reference(tmp_path, length=4000, seed=84)
    variants = []
    for p in (1500, 1515, 2500):
        alt = b"A" if ref_seq[p] != ord("A") else b"G"
        variants.append((p, 1, alt))
    variants.append((2000, 3, b""))
    hap_ref = SimHaplotype(ref_seq, [])
    hap_var = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap_ref, hap_var], 1000, 3200, coverage=30, seed=85)
    bam = write_synth_bam(tmp_path, reads, ref_len=4000)
    out = str(tmp_path / "smoke.vcf")
    config = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out, **opts)
    run_single_process(config, [("chr20", 1000, 3200)], out)
    _check_vcf_parses(out)


def test_empty_region_and_no_reads(tmp_path):
    ref_path, ref_seq = make_reference(tmp_path, length=3000, seed=86)
    bam = write_synth_bam(tmp_path, [
        dict(name="r0", ref_id=0, pos=100, mapq=60, flag=0, cigar=[(0, 100)],
             seq=ref_seq.tobytes()[100:200], qual=[30] * 100)
    ], ref_len=3000)
    out = str(tmp_path / "empty.vcf")
    config = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out)
    # Region with no reads at all.
    n = run_single_process(config, [("chr20", 2000, 3000)], out)
    assert n == 0
    assert _check_vcf_parses(out) == []
