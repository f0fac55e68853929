"""CRAM 3.0 reader/writer + rANS codec tests.

Round-trips our own spec-compliant writer through the reader and checks
fetch parity against the BAM path on identical reads (the reference reads
CRAM through htslib, htslibWrapper.pyx:143-173)."""

import os

import numpy as np
import pytest

from platypus_tpu.io import rans
from platypus_tpu.io.bam import BamFile, open_alignment_file
from platypus_tpu.io.cram import (
    ByteStream,
    CramFile,
    itf8_encode,
    ltf8_encode,
    write_cram,
)

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


# ---------------------------------------------------------------------------
# Varints
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("value", [0, 1, 127, 128, 0x3FFF, 0x4000, 0x1FFFFF,
                                   0x200000, 0xFFFFFFF, 0x10000000,
                                   0x7FFFFFFF, -1, -2, -2147483648])
def test_itf8_roundtrip(value):
    enc = itf8_encode(value)
    s = ByteStream(enc)
    assert s.itf8() == value
    assert s.p == len(enc)


@pytest.mark.parametrize("value", [0, 1, 127, 128, 1 << 13, 1 << 20, 1 << 27,
                                   1 << 34, 1 << 41, 1 << 48, 1 << 55,
                                   (1 << 63) - 1, -1, -5])
def test_ltf8_roundtrip(value):
    enc = ltf8_encode(value)
    s = ByteStream(enc)
    assert s.ltf8() == value
    assert s.p == len(enc)


def test_itf8_random_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(500):
        v = int(rng.integers(-(2**31), 2**31))
        s = ByteStream(itf8_encode(v))
        assert s.itf8() == v


# ---------------------------------------------------------------------------
# rANS 4x8
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,n", [(0, 1), (1, 3), (2, 100), (3, 4096),
                                    (4, 65537)])
def test_rans_order0_roundtrip(seed, n):
    rng = np.random.default_rng(seed)
    # Skewed alphabet (quality-score-like).
    data = rng.choice(np.arange(30, 45, dtype=np.uint8), size=n,
                      p=np.array([20, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 40]) / 73.0
                      ).tobytes()
    comp = rans.encode_order0(data)
    assert rans.decode(comp) == data


def test_rans_order0_uniform_and_single_symbol():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    assert rans.decode(rans.encode_order0(data)) == data
    assert rans.decode(rans.encode_order0(b"A" * 1000)) == b"A" * 1000
    assert rans.decode(rans.encode_order0(b"")) == b""


def _encode_order1_for_test(data: bytes) -> bytes:
    """Minimal order-1 rANS encoder mirroring the decoder's stream layout
    (exists only to exercise the order-1 decode path htslib files use)."""
    import struct

    n = len(data)
    isz4 = n >> 2
    # Per-context counts; each quarter's first byte has context 0.
    counts = [[0] * 256 for _ in range(256)]
    for q in range(4):
        lo = q * isz4
        hi = (q + 1) * isz4 if q < 3 else n
        ctx = 0
        for p in range(lo, hi):
            counts[ctx][data[p]] += 1
            ctx = data[p]
    freqs = [None] * 256
    cums = [None] * 256
    for c in range(256):
        if sum(counts[c]) == 0:
            continue
        f = rans._normalise(counts[c])
        freqs[c] = f
        cum = [0] * 257
        for s in range(256):
            cum[s + 1] = cum[s] + f[s]
        cums[c] = cum

    body = bytearray()
    # Outer RLE over contexts (same scheme as the symbol tables).
    present = [c for c in range(256) if freqs[c] is not None]
    i = 0
    last = -2
    rle = 0
    while i < len(present):
        c = present[i]
        if rle > 0:
            rle -= 1
        else:
            body.append(c)
            if c == last + 1:
                run = 0
                while (i + 1 + run < len(present)
                       and present[i + 1 + run] == c + 1 + run):
                    run += 1
                body.append(run)
                rle = run
        rans._write_symbol_table(body, freqs[c])
        last = c
        i += 1
    body.append(0)

    # Encode in exact reverse of decode order.
    states = [rans.RANS_BYTE_L] * 4
    rev = []

    def put(j, ctx, sym):
        f, c0 = freqs[ctx][sym], cums[ctx][sym]
        x = states[j]
        x_max = f << 19
        while x >= x_max:
            rev.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << 12) + (x % f) + c0

    # Remainder decoded LAST by state 3 -> encode FIRST, reversed.
    ctx_for = lambda p, lo: 0 if p == lo else data[p - 1]
    for p in range(n - 1, 4 * isz4 - 1, -1):
        put(3, data[p - 1] if p > 3 * isz4 else 0, data[p])
    for i2 in range(isz4 - 1, -1, -1):
        for j in (3, 2, 1, 0):
            p = j * isz4 + i2
            put(j, ctx_for(p, j * isz4), data[p])
    for j in (3, 2, 1, 0):
        x = states[j]
        for shift in (24, 16, 8, 0):
            rev.append((x >> shift) & 0xFF)
    body.extend(reversed(rev))
    return b"\x01" + struct.pack("<II", len(body), n) + bytes(body)


@pytest.mark.parametrize("seed,n", [(0, 8), (1, 401), (2, 4099)])
def test_rans_order1_decode(seed, n):
    rng = np.random.default_rng(seed)
    data = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                      p=[0.4, 0.3, 0.2, 0.1], size=n).tobytes()
    comp = _encode_order1_for_test(data)
    assert rans.decode(comp) == data


# ---------------------------------------------------------------------------
# CRAM round-trip vs BAM
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cram")
    ref_path, ref_seq = make_reference(tmp, length=6000, seed=3)
    alt = SimHaplotype(ref_seq, [
        (1500, 1, b"A" if ref_seq[1500] != ord("A") else b"C"),
        (3000, 0, b"CTG"),
        (4200, 2, b""),
    ])
    reads = simulate_reads([SimHaplotype(ref_seq, []), alt], 500, 5500,
                           read_len=100, coverage=30, error_rate=0.002)
    bam_path = write_synth_bam(tmp, reads, ref_len=6000)
    cram_path = os.path.join(str(tmp), "reads.cram")
    write_cram(cram_path, [("chr20", 6000)], reads, sample="S1",
               ref_seqs={"chr20": bytes(ref_seq)}, records_per_slice=100)
    return dict(tmp=tmp, ref=ref_path, ref_seq=ref_seq, bam=bam_path,
                cram=cram_path, reads=reads)


def _assert_readsets_equal(a, b):
    assert len(a) == len(b)
    order_a = np.lexsort((a.rlen, a.flag, a.pos))
    order_b = np.lexsort((b.rlen, b.flag, b.pos))
    a, b = a.take(order_a), b.take(order_b)
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.end, b.end)
    np.testing.assert_array_equal(a.rlen, b.rlen)
    np.testing.assert_array_equal(a.mapq, b.mapq)
    np.testing.assert_array_equal(a.flag, b.flag)
    np.testing.assert_array_equal(a.mate_chrom_id, b.mate_chrom_id)
    np.testing.assert_array_equal(a.mate_pos, b.mate_pos)
    np.testing.assert_array_equal(a.insert_size, b.insert_size)
    np.testing.assert_array_equal(a.seq, b.seq)
    np.testing.assert_array_equal(a.qual, b.qual)
    np.testing.assert_array_equal(a.cigar_off, b.cigar_off)
    np.testing.assert_array_equal(a.cigar_flat, b.cigar_flat)


def test_cram_fetch_matches_bam(synth_pair):
    bam = BamFile(synth_pair["bam"])
    cram = CramFile(synth_pair["cram"], ref_file=synth_pair["ref"])
    assert cram.references == bam.references
    assert cram.sample_names() == bam.sample_names()
    rs_b = bam.fetch("chr20", 0, 6000, use_native=False)
    rs_c = cram.fetch("chr20", 0, 6000)
    _assert_readsets_equal(rs_b, rs_c)
    bam.close()
    cram.close()


def test_cram_region_fetch_uses_crai(synth_pair):
    bam = BamFile(synth_pair["bam"])
    cram = CramFile(synth_pair["cram"], ref_file=synth_pair["ref"])
    assert cram.index is not None and cram.index.entries
    for beg, end in [(1000, 1200), (2950, 3100), (0, 50), (5900, 6000)]:
        rs_b = bam.fetch("chr20", beg, end, use_native=False)
        rs_c = cram.fetch("chr20", beg, end)
        _assert_readsets_equal(rs_b, rs_c)
    bam.close()
    cram.close()


def test_cram_fetch_without_index(synth_pair, tmp_path):
    import shutil

    noidx = str(tmp_path / "noidx.cram")
    shutil.copy(synth_pair["cram"], noidx)
    cram = CramFile(noidx, ref_file=synth_pair["ref"])
    assert cram.index is None
    bam = BamFile(synth_pair["bam"])
    _assert_readsets_equal(bam.fetch("chr20", 1000, 2000, use_native=False),
                           cram.fetch("chr20", 1000, 2000))
    bam.close()
    cram.close()


def test_cram_store_rg(synth_pair):
    cram = CramFile(synth_pair["cram"], ref_file=synth_pair["ref"])
    rs = cram.fetch("chr20", 1000, 1100, store_rg=True)
    assert rs.rg_id is not None and len(rs.rg_id) == len(rs)
    assert all(rg == b"rg1" for rg in rs.rg_id)
    cram.close()


def test_open_alignment_file_dispatch(synth_pair):
    f = open_alignment_file(synth_pair["cram"], ref_file=synth_pair["ref"])
    assert isinstance(f, CramFile)
    f.close()
    f = open_alignment_file(synth_pair["bam"])
    assert isinstance(f, BamFile)
    f.close()
    with pytest.raises(ValueError):
        BamFile(synth_pair["cram"])


def test_cram_end_to_end_calls_match_bam(synth_pair):
    """Full caller on CRAM input produces the same VCF as on BAM input."""
    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import run_single_process

    out_b = str(synth_pair["tmp"] / "from_bam.vcf")
    out_c = str(synth_pair["tmp"] / "from_cram.vcf")
    n_b = run_single_process(
        PlatypusConfig(bam_files=[synth_pair["bam"]],
                       ref_file=synth_pair["ref"], output=out_b),
        [("chr20", 0, 6000)], out_b)
    n_c = run_single_process(
        PlatypusConfig(bam_files=[synth_pair["cram"]],
                       ref_file=synth_pair["ref"], output=out_c),
        [("chr20", 0, 6000)], out_c)
    assert n_b == n_c and n_b >= 3

    def data_lines(p):
        with open(p) as fh:
            return [l for l in fh if not l.startswith("#")]

    assert data_lines(out_b) == data_lines(out_c)


def test_placed_unmapped_mate_kept(tmp_path):
    """A placed-unmapped mate (FUNMAP with a valid pos) is fetched from
    CRAM exactly like the BAM decoder keeps it (bam_endpos one-base rule)."""
    _ref_path, ref_seq = make_reference(tmp_path, length=3000, seed=9)
    reads = [
        dict(name="m", ref_id=0, pos=1000, mapq=60, flag=0x1 | 0x8,
             cigar=[(0, 50)], seq=bytes(ref_seq[1000:1050]), qual=[30] * 50),
        dict(name="u", ref_id=0, pos=1000, mapq=0, flag=0x1 | 0x4,
             cigar=[], seq=bytes(ref_seq[1000:1050]), qual=[30] * 50),
    ]
    bam = write_synth_bam(str(tmp_path), reads, ref_len=3000)
    cram = os.path.join(str(tmp_path), "pair.cram")
    write_cram(cram, [("chr20", 3000)], reads, sample="S1",
               ref_seqs={"chr20": bytes(ref_seq)})
    with BamFile(bam) as bf, CramFile(cram, ref_file=_ref_path) as cf:
        rb = bf.fetch("chr20", 900, 1200)
        rc = cf.fetch("chr20", 900, 1200)
    assert len(rb) == 2
    _assert_readsets_equal(rb, rc)


def test_multi_ref_slice_indexed_fetch(tmp_path):
    """A slice crossing a chromosome boundary gets one crai line PER
    reference; indexed fetch finds reads on both sides."""
    _ref_path, ref_seq = make_reference(tmp_path, length=3000, seed=10)
    reads = [dict(name=f"a{i}", ref_id=0, pos=100 + 60 * i, mapq=60, flag=0,
                  cigar=[(0, 50)], seq=bytes(ref_seq[100:150]),
                  qual=[30] * 50) for i in range(3)]
    reads += [dict(name=f"b{i}", ref_id=1, pos=200 + 60 * i, mapq=60, flag=0,
                   cigar=[(0, 50)], seq=bytes(ref_seq[200:250]),
                   qual=[30] * 50) for i in range(3)]
    cram = os.path.join(str(tmp_path), "multi.cram")
    # One slice holds all 6 records -> multi-reference slice.
    write_cram(cram, [("chr1", 3000), ("chr2", 3000)], reads, sample="S1",
               records_per_slice=100)
    assert os.path.exists(cram + ".crai")
    with CramFile(cram) as cf:
        assert cf.index is not None
        r1 = cf.fetch("chr1", 0, 1000)
        r2 = cf.fetch("chr2", 0, 1000)
    assert len(r1) == 3 and len(r2) == 3


def test_eq_x_cigar_ops_round_trip(tmp_path):
    """CIGAR 7 (=) and 8 (X) consume read+reference like M; an X-op read's
    own bases must survive the reference-compressed round trip."""
    _ref_path, ref_seq = make_reference(tmp_path, length=2000, seed=11)
    swap = bytes.maketrans(b"ACGT", b"CAGT"[:2] + b"TG")  # A<->C, G<->T
    mism = bytes(ref_seq[500:510]).translate(swap)  # != ref at every base
    reads = [
        dict(name="x", ref_id=0, pos=500, mapq=60, flag=0,
             cigar=[(8, 10)], seq=mism, qual=[30] * 10),
        dict(name="eq", ref_id=0, pos=600, mapq=60, flag=0,
             cigar=[(7, 10)], seq=bytes(ref_seq[600:610]), qual=[30] * 10),
    ]
    cram = os.path.join(str(tmp_path), "eqx.cram")
    write_cram(cram, [("chr20", 2000)], reads, sample="S1",
               ref_seqs={"chr20": bytes(ref_seq)})
    with CramFile(cram, ref_file=_ref_path) as cf:
        rs = cf.fetch("chr20", 400, 700)
    assert len(rs) == 2
    row_x = int(np.nonzero(rs.pos == 500)[0][0])
    assert bytes(rs.seq[row_x, :10]) == mism
