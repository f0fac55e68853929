"""Tests for the read-compression subsystem and the general VCF reader."""

import numpy as np
import pytest

from platypus_tpu.io.compression import (
    apply_qual_binning,
    bin_quals,
    compress_qual,
    compress_read_set,
    compress_seq,
    uncompress_into_read_set,
    uncompress_qual,
    uncompress_seq,
)
from platypus_tpu.io.vcfreader import VCFReader

HLA_VCF = "/root/reference/test/HLA_A_alignment_hapsREF.vcf.gz"


def test_seq_roundtrip_mostly_matching():
    rng = np.random.default_rng(0)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), 300)
    seq = ref[50:150].copy()
    seq[[10, 40, 41, 99]] = [ord("A"), ord("C"), ord("G"), ord("T")]
    blob = compress_seq(seq, ref[50:150])
    # Long match runs compress well.
    assert len(blob) < 30
    out = uncompress_seq(blob, ref[50:150], 100)
    np.testing.assert_array_equal(out, seq)


def test_seq_roundtrip_no_matches():
    seq = np.frombuffer(b"ACGT" * 10, np.uint8).copy()
    ref = np.full(40, ord("N"), np.uint8)
    blob = compress_seq(seq, ref)
    assert len(blob) == 40
    np.testing.assert_array_equal(uncompress_seq(blob, ref, 40), seq)


def test_qual_roundtrip_and_binning():
    qual = np.array([30] * 20 + [12, 13, 14] + [0] * 5, np.uint8)
    blob = compress_qual(qual, 1)
    np.testing.assert_array_equal(uncompress_qual(blob, len(qual)), qual)
    # Lossy binning: values floor to multiples of the bin size.
    blob5 = compress_qual(qual, 5)
    out5 = uncompress_qual(blob5, len(qual))
    np.testing.assert_array_equal(out5, bin_quals(qual.astype(np.int64), 5))
    assert out5[20] == 10 and out5[21] == 10 and out5[22] == 10


def test_read_set_compression_roundtrip():
    from platypus_tpu.io.bam import BamFile

    with BamFile("/root/reference/test/S55_test_realigned.bam") as bf:
        chrom, length = bf.references[0]
        rs = bf.fetch(chrom, 0, length)
    rs = rs.take(np.arange(100))
    # A fake reference: the reads themselves won't match much, which still
    # must round-trip exactly.
    ref_start = int(rs.pos.min()) - 10
    ref_len = int(rs.end.max()) - ref_start + 10
    rng = np.random.default_rng(1)
    ref_seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), ref_len).tobytes())
    orig_seq = rs.seq.copy()
    orig_qual = rs.qual.copy()
    comp = compress_read_set(rs, ref_seq, ref_start, qual_bin_size=1)
    rs.seq[:] = 0
    rs.qual[:] = 0
    uncompress_into_read_set(comp, rs, ref_seq)
    np.testing.assert_array_equal(rs.seq, orig_seq)
    np.testing.assert_array_equal(rs.qual, orig_qual)


def test_vcf_reader_on_hla_fixture():
    with VCFReader(HLA_VCF) as r:
        recs = []
        for rec in r:
            recs.append(rec)
            if len(recs) >= 50:
                break
    assert len(recs) == 50
    assert all(rec.chrom == "6" for rec in recs)
    assert all(rec.pos > 0 for rec in recs)
    assert "HLAAllele" in recs[0].info


def test_vcf_reader_own_output(tmp_path):
    """Round-trip: our writer's output parses back with typed fields."""
    import io as iomod

    from platypus_tpu.vcfout.writer import VCFWriter

    buf = iomod.StringIO()
    w = VCFWriter(buf, ["S1"], options_line='{"x": 1}')
    w.write_header()
    w.write_record(
        "chr1", 99, "A", ["G"], 50, ["alleleBias"],
        {"TC": [10], "PP": ["50"], "FR": ["0.5000"]},
        ["GT", "GL", "GOF", "GQ", "NR", "NV"],
        {"S1": dict(GT=[["0", "/", "1"]], GL=[-10.0, 0, -8.2], GOF=[3],
                    GQ=[42], NR=[10], NV=[5])},
    )
    w.drain()
    buf.seek(0)
    r = VCFReader(buf)
    assert r.samples == ["S1"]
    assert r.platypus_options == '{"x": 1}'
    assert "TC" in r.infos and "alleleBias" in r.filters and "GT" in r.formats
    recs = list(r)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.pos == 100 and rec.ref == "A" and rec.alts == ["G"]
    assert rec.filters == ["alleleBias"]
    assert rec.sample_gt("S1") == ("0", "1")
    assert rec.sample_floats("S1", "GL") == [-10.0, 0.0, -8.2]


def test_compress_reads_memory_mode_identical_output(tmp_path):
    """--compressReads memory mode (keep seq/qual compressed between windows,
    lazy per-window decompression) must be lossless at qualBinSize=1: the
    VCF is byte-identical to the uncompressed run, and the buffers really
    were held compressed."""
    import sys

    sys.path.insert(0, "tests")
    from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import run_single_process

    ref_path, ref_seq = make_reference(tmp_path, length=6000, seed=17)
    alt = SimHaplotype(ref_seq, [
        (1500, 1, b"A" if ref_seq[1500] != ord("A") else b"G"),
        (3000, 2, b""),
    ])
    reads = simulate_reads([alt, SimHaplotype(ref_seq, [])], 1000, 5000,
                           coverage=25, seed=23)
    bam = write_synth_bam(tmp_path, reads, ref_len=6000)

    outs = {}
    for mode in (0, 1):
        out = str(tmp_path / f"out_c{mode}.vcf")
        cfg = PlatypusConfig(bam_files=[bam], ref_file=ref_path, output=out,
                             regions=["chr20:1001-5000"], compress_reads=mode)
        run_single_process(cfg, [("chr20", 1000, 5000)], out)
        outs[mode] = [l for l in open(out) if not l.startswith("#")]
    assert outs[0] == outs[1]
    assert len(outs[0]) >= 2


def test_seq_qual_rows_lazy_decompression():
    from platypus_tpu.io.bam import BamFile

    with BamFile("/root/reference/test/S55_test_realigned.bam") as bf:
        chrom, length = bf.references[0]
        rs = bf.fetch(chrom, 0, length)
    rs = rs.take(np.arange(50))
    dense_seq = rs.seq.copy()
    dense_qual = rs.qual.copy()
    ref_seq = bytes(np.full(200_000, ord("N"), np.uint8))
    rs.compress_in_memory(ref_seq, 0)
    assert rs.is_compressed and rs.seq is None
    assert 0 < rs.compressed_nbytes() < dense_seq.nbytes + dense_qual.nbytes
    seq, qual = rs.seq_qual_rows(np.array([3, 7, 20]))
    np.testing.assert_array_equal(seq, dense_seq[[3, 7, 20]])
    np.testing.assert_array_equal(qual, dense_qual[[3, 7, 20]])
    seq2, qual2 = rs.seq_qual_rows(slice(0, 50))
    np.testing.assert_array_equal(seq2, dense_seq)
    np.testing.assert_array_equal(qual2, dense_qual)
