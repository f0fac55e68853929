"""Bulk (vectorised) scale-dataset generator: BAM layout correctness and
caller sensitivity.

simulate_reads_bulk / write_bam_bulk generate multi-megabase perf datasets
in minutes (the per-read Python generator runs ~60-200us/read); content
follows the same model as simulate_reads but a different RNG stream."""

import os

import numpy as np

from synth import (SimHaplotype, make_reference, simulate_reads_bulk,
                   write_bam_bulk)

from platypus_tpu.io.bam import BamFile


def _dataset(tmp_path, L=60_000, coverage=10):
    ref_path, ref_seq = make_reference(tmp_path, length=L, seed=3)
    variants = [(10_000, 1, b"T" if ref_seq[10_000] != ord("T") else b"A"),
                (20_000, 0, b"ACG"), (30_000, 4, b"")]
    hv = SimHaplotype(ref_seq, variants)
    hr = SimHaplotype(ref_seq, [])
    pos, seq, special = simulate_reads_bulk([hv, hr], 1000, L - 1000,
                                            coverage=coverage, seed=4,
                                            error_rate=0.003)
    bam = os.path.join(str(tmp_path), "reads.bam")
    write_bam_bulk(bam, [("chr20", L)], pos, seq, special)
    return ref_path, bam, pos, seq, special, variants


def test_bulk_bam_layout_round_trips(tmp_path):
    ref_path, bam, pos, seq, special, _ = _dataset(tmp_path)
    bf = BamFile(bam)
    assert bf.index is not None  # coordinate-sorted, auto-indexed
    rs = bf.fetch("chr20", 0, 60_000)
    assert len(rs.pos) == len(pos)
    assert (np.diff(rs.pos) >= 0).all()
    # Single-M rows round-trip pos and sequence exactly.
    n_ops = rs.cigar_off[1:] - rs.cigar_off[:-1]
    assert int((n_ops > 1).sum()) == len(special)
    sm = np.nonzero(n_ops == 1)[0]
    np.testing.assert_array_equal(rs.pos[sm], pos[sm])
    # The decoder upper-cases through a 4-bit alphabet; ACGT survive.
    np.testing.assert_array_equal(rs.seq[sm[:50]], seq[sm[:50]])
    bf.close()


def test_bulk_dataset_calls_all_variants(tmp_path):
    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import run_single_process

    ref_path, bam, *_, variants = _dataset(tmp_path, coverage=16)
    cfg = PlatypusConfig(bam_files=[bam], ref_file=ref_path,
                         regions=["chr20:1000-59000"], assemble=0)
    out = str(tmp_path / "out.vcf")
    run_single_process(cfg, [("chr20", 1000, 59_000)], out)
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    called = {int(r[1]) - 1 for r in recs}
    for vpos, _, _ in variants:
        assert any(abs(vpos - c) <= 30 for c in called), vpos
