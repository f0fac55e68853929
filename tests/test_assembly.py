"""Tests for the colored de Bruijn assembler and the source-VCF reader."""

import numpy as np
import pytest

from platypus_tpu.candidates.assembly import (
    DeBruijnGraph,
    assemble_reads_and_detect_variants,
    detect_cycles,
    find_bubbles,
    load_read,
    load_reference,
)
from platypus_tpu.config import PlatypusConfig
from platypus_tpu.io.readbuffer import QCOptions, build_sample_buffer

from synth import make_reference, write_synth_bam


def _graph_for(ref_seq: bytes, reads, k=15, min_qual=20):
    g = DeBruijnGraph(k)
    load_reference(g, ref_seq, 0)
    for seq, qual in reads:
        s = np.frombuffer(seq, np.uint8)
        q = np.full(len(seq), qual, np.uint8)
        load_read(g, s, q, len(seq), min_qual)
    return g


def test_snp_bubble_found():
    rng = np.random.default_rng(3)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 300).tobytes())
    pos = 150
    alt = b"A" if ref[pos] != ord("A") else b"C"
    mutated = ref[:pos] + alt + ref[pos + 1 :]
    # Enough reads covering the SNP for weight >= minReads*minQual (2*20=40).
    reads = [(mutated[100:200], 30), (mutated[110:210], 30), (mutated[120:220], 30)]
    g = _graph_for(ref, reads)
    variants = find_bubbles(g, 40.0, ref, "chrT", 0, 0, 300)
    snvs = [v for v in variants if v.n_added == 1 and v.n_removed == 1]
    assert any(v.ref_pos == pos and v.added == alt for v in snvs), variants


def test_insertion_bubble_found():
    rng = np.random.default_rng(4)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 300).tobytes())
    pos = 150
    ins = b"TTAGGC"
    mutated = ref[:pos] + ins + ref[pos:]
    reads = [(mutated[100:200], 30), (mutated[115:215], 30), (mutated[125:225], 30)]
    g = _graph_for(ref, reads)
    variants = find_bubbles(g, 40.0, ref, "chrT", 0, 0, 300)
    inss = [v for v in variants if v.n_added - v.n_removed == len(ins)]
    assert inss, f"no {len(ins)}bp insertion found: {variants}"


def test_deletion_bubble_found():
    rng = np.random.default_rng(5)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 300).tobytes())
    pos = 150
    n_del = 8
    mutated = ref[:pos] + ref[pos + n_del :]
    reads = [(mutated[100:200], 30), (mutated[110:210], 30), (mutated[120:220], 30)]
    g = _graph_for(ref, reads)
    variants = find_bubbles(g, 40.0, ref, "chrT", 0, 0, 300)
    dels = [v for v in variants if v.n_removed - v.n_added == n_del]
    assert dels, f"no {n_del}bp deletion found: {variants}"


def test_low_weight_paths_pruned():
    rng = np.random.default_rng(6)
    ref = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 300).tobytes())
    pos = 150
    alt = b"A" if ref[pos] != ord("A") else b"C"
    mutated = ref[:pos] + alt + ref[pos + 1 :]
    # Single low-quality read: weight 10 < minWeight 40.
    g = _graph_for(ref, [(mutated[100:200], 10)], min_qual=5)
    variants = find_bubbles(g, 40.0, ref, "chrT", 0, 0, 300)
    assert not any(v.ref_pos == pos for v in variants)


def test_cycle_detection():
    # A repeat longer than k creates a cycle.
    unit = b"ACGTACGTACGTACGTACG"  # 19bp, repeated
    ref = b"TTTTCCCCGGGGAAAATTCG" + unit * 4 + b"CGATCGTAGCTAGCTAGCTA"
    g = DeBruijnGraph(15)
    load_reference(g, ref, 0)
    assert detect_cycles(g)

    rng = np.random.default_rng(7)
    ref2 = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 200).tobytes())
    g2 = DeBruijnGraph(15)
    load_reference(g2, ref2, 0)
    assert not detect_cycles(g2)


def test_assembler_through_region_pipeline(tmp_path):
    """End-to-end: reads carrying an insertion hidden from the aligner
    (plain-M CIGARs) are recovered by assembly."""
    from platypus_tpu.io.bam import BamFile

    ref_path, ref_seq = make_reference(tmp_path, length=3000, seed=21)
    pos = 1500
    ins = b"GATTACAGATTACA"  # 14bp insertion
    mutated = ref_seq.tobytes()[:pos] + ins + ref_seq.tobytes()[pos:]

    reads = []
    rng = np.random.default_rng(8)
    for i in range(60):
        start = int(rng.integers(1300, 1600))
        seq = mutated[start : start + 100]
        if len(seq) < 100:
            continue
        # Deliberately aligned as pure match (mapper missed the insertion).
        reads.append(dict(name=f"r{i}", ref_id=0, pos=start, mapq=60, flag=0,
                          cigar=[(0, 100)], seq=seq, qual=[35] * 100))
    reads.sort(key=lambda r: r["pos"])
    bam_path = write_synth_bam(tmp_path, reads, ref_len=3000)

    from platypus_tpu.candidates.assembly import assemble_region_variants
    from platypus_tpu.io.fasta import FastaFile

    with BamFile(bam_path) as bf:
        stream = bf.fetch("chr20", 1000, 2000)
    buf = build_sample_buffer("s", stream, QCOptions(
        filter_read_pairs_with_small_inserts=0, filter_reads_with_distant_mates=0,
        filter_reads_with_unmapped_mates=0))
    config = PlatypusConfig(assemble=1, assemble_all=1)
    with FastaFile(ref_path) as ref_file:
        variants = assemble_region_variants("chr20", 1000, 2000, ref_file, [buf], config)
    ins_vars = [v for v in variants if v.n_added - v.n_removed == len(ins)]
    assert ins_vars, f"assembler missed the insertion: {variants[:10]}"


def test_native_assembler_matches_python(tmp_path):
    """C++ assembler produces the identical variant list on real-ish data."""
    from platypus_tpu import native
    from platypus_tpu.candidates.assembly import assemble_reads_and_detect_variants
    from platypus_tpu.io.bam import BamFile
    from platypus_tpu.io.fasta import FastaFile

    if not native.NativeAssembler.available():
        pytest.skip("native library not built")

    rng = np.random.default_rng(12)
    ref_path, ref_seq = make_reference(tmp_path, length=4000, seed=22)
    mutated = (ref_seq.tobytes()[:2000] + b"TTAGGCAT" + ref_seq.tobytes()[2000:2990]
               + ref_seq.tobytes()[3000:])
    reads = []
    for i in range(120):
        start = int(rng.integers(1800, 3000))
        seq = mutated[start : start + 100]
        if len(seq) < 100:
            continue
        reads.append(dict(name=f"r{i}", ref_id=0, pos=start, mapq=60, flag=0,
                          cigar=[(0, 100)], seq=seq, qual=[35] * 100))
    reads.sort(key=lambda r: r["pos"])
    bam_path = write_synth_bam(tmp_path, reads, ref_len=4000)
    with BamFile(bam_path) as bf:
        stream = bf.fetch("chr20", 1500, 3500)
    buf = build_sample_buffer("s", stream, QCOptions(
        filter_read_pairs_with_small_inserts=0, filter_reads_with_distant_mates=0,
        filter_reads_with_unmapped_mates=0))
    config = PlatypusConfig()
    with FastaFile(ref_path) as ref_file:
        ref_bytes = ref_file.get_sequence("chr20", 1000, 3999)
    py = assemble_reads_and_detect_variants(
        "chr20", 1500, 3500, 1000, ref_bytes, [buf], config, use_native=False)
    nat = assemble_reads_and_detect_variants(
        "chr20", 1500, 3500, 1000, ref_bytes, [buf], config, use_native=True)
    assert [(v.ref_pos, v.removed, v.added) for v in py] == [
        (v.ref_pos, v.removed, v.added) for v in nat
    ]
    assert py, "expected assembler variants"


def test_native_region_path_matches_python_fuzz(tmp_path):
    """The one-call native region tile loop (C++ thread pool) matches the
    sequential Python per-tile path across randomized configs: noisy reads,
    N bases, low-qual gates, bad-read piles, and no_cycles k-escalation."""
    from platypus_tpu import native
    from platypus_tpu.candidates import assembly as A
    from platypus_tpu.io.bam import BamFile
    from platypus_tpu.io.fasta import FastaFile

    if not native.NativeAssembler.available():
        pytest.skip("native library not built")

    rng = np.random.default_rng(77)
    ref_path, ref_seq = make_reference(tmp_path, length=6000, seed=55)
    raw = ref_seq.tobytes()
    # Two haplotype edits + a tandem duplication (cycle bait for small k).
    mutated = (raw[:2000] + b"TCGATCGATCGATCGA" * 3 + raw[2000:3500]
               + raw[3490:3500] + raw[3500:])

    reads = []
    for i in range(300):
        start = int(rng.integers(1500, 4500))
        seq = bytearray(mutated[start : start + 120])
        if len(seq) < 120:
            continue
        # mostly high quality with sparse low-qual dips (so the per-window
        # min-qual gate passes most k-mers but breaks chains at dips)
        qual = np.full(120, 35, np.int64)
        dips = rng.integers(0, 120, size=int(rng.integers(0, 5)))
        qual[dips] = 12
        qual = qual.tolist()
        # sequencing errors + occasional Ns
        for _ in range(int(rng.integers(0, 4))):
            seq[int(rng.integers(0, 120))] = ord(rng.choice(list("ACGTN")))
        reads.append(dict(name=f"r{i}", ref_id=0, pos=start, mapq=60, flag=0,
                          cigar=[(0, 120)], seq=bytes(seq), qual=qual))
    reads.sort(key=lambda r: r["pos"])
    bam_path = write_synth_bam(tmp_path, reads, ref_len=6000)

    with BamFile(bam_path) as bf:
        stream = bf.fetch("chr20", 1000, 5000)
    buf = build_sample_buffer("s", stream, QCOptions(
        filter_read_pairs_with_small_inserts=0, filter_reads_with_distant_mates=0,
        filter_reads_with_unmapped_mates=0))

    orig = A._native_region_tiles
    any_found = False
    for no_cycles, bad_reads, min_bq in [(0, 1, 20), (1, 1, 20), (0, 0, 12), (1, 0, 30)]:
        config = PlatypusConfig(assemble=1, assemble_all=1, no_cycles=no_cycles,
                                assemble_bad_reads=bad_reads, min_base_qual=min_bq)
        with FastaFile(ref_path) as ref_file:
            nat = A.assemble_region_variants("chr20", 1000, 5000, ref_file, [buf], config)
            try:
                A._native_region_tiles = lambda *a, **k: None
                py = A.assemble_region_variants("chr20", 1000, 5000, ref_file, [buf], config)
            finally:
                A._native_region_tiles = orig
        key = lambda v: (v.ref_pos, v.removed, v.added)
        assert [key(v) for v in nat] == [key(v) for v in py], (
            f"mismatch at no_cycles={no_cycles} bad={bad_reads} minbq={min_bq}")
        any_found = any_found or bool(nat)
    assert any_found, "expected assembler variants in at least one config"
