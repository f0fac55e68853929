"""Synthetic test data: reference FASTA + simulated reads (with correct
CIGARs across indels) written as a BAM."""

import os

import numpy as np

from platypus_tpu.io.bam import write_bam
from platypus_tpu.io.fasta import build_index


def make_reference(tmp_path, length=8000, seed=11, name="chr20"):
    rng = np.random.default_rng(seed)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length)
    path = os.path.join(str(tmp_path), "ref.fa")
    text = seq.tobytes().decode()
    with open(path, "w") as fh:
        fh.write(f">{name}\n")
        for i in range(0, length, 60):
            fh.write(text[i : i + 60] + "\n")
    build_index(path)
    return path, seq


class SimHaplotype:
    """A mutated genome with hap<->ref coordinate blocks for read simulation.

    variants: list of (ref_pos, removed_len, added_bytes); a SNP is
    (pos, 1, b"X"), a deletion (pos, n, b""), an insertion (pos, 0, b"XYZ")
    inserting before ref_pos.
    """

    def __init__(self, ref_seq: np.ndarray, variants):
        self.variants = sorted(variants)
        blocks = []  # (hap_start, length, ref_start or None)
        seq = bytearray()
        cur_ref = 0
        for pos, removed_len, added in self.variants:
            if pos > cur_ref:
                blocks.append((len(seq), pos - cur_ref, cur_ref))
                seq += ref_seq[cur_ref:pos].tobytes()
            if added:
                is_sub = removed_len == len(added)
                blocks.append((len(seq), len(added), pos if is_sub else None))
                seq += added
            cur_ref = pos + removed_len
        blocks.append((len(seq), len(ref_seq) - cur_ref, cur_ref))
        seq += ref_seq[cur_ref:].tobytes()
        self.seq = bytes(seq)
        self.blocks = blocks
        # Binary-search tables (blocks are built in ascending hap order).
        self._hstarts = np.array([b[0] for b in blocks], dtype=np.int64)
        ref_blocks = [b for b in blocks if b[2] is not None]
        self._ref_rstarts = np.array([b[2] for b in ref_blocks], dtype=np.int64)
        self._ref_hstarts = np.array([b[0] for b in ref_blocks], dtype=np.int64)
        self._ref_lens = np.array([b[1] for b in ref_blocks], dtype=np.int64)

    def hap_pos_of(self, ref_pos: int):
        """Hap coordinate of a reference position, or None inside a deletion.
        Binary search over ref-mapped blocks (they are ascending in rstart)."""
        i = int(np.searchsorted(self._ref_rstarts, ref_pos, side="right")) - 1
        if i < 0:
            return None
        if ref_pos < self._ref_rstarts[i] + self._ref_lens[i]:
            return int(self._ref_hstarts[i] + (ref_pos - self._ref_rstarts[i]))
        return None

    def ref_pos_of(self, hap_pos: int) -> int:
        """Reference position at/after a hap coordinate (for BAM pos)."""
        for hstart, length, rstart in self.blocks:
            if hstart <= hap_pos < hstart + length:
                if rstart is not None:
                    return rstart + (hap_pos - hstart)
                # Inside an insertion: pos of next ref base.
                for h2, l2, r2 in self.blocks:
                    if h2 > hap_pos and r2 is not None:
                        return r2
        return -1

    def cigar_for(self, hap_start: int, length: int):
        """(bam_pos, cigar[(op,len)...]) for a read covering
        hap [hap_start, hap_start+length)."""
        ops = []
        bam_pos = None
        hap_end = hap_start + length
        prev_ref_end = None
        # Only blocks overlapping [hap_start, hap_end) can contribute; find
        # the first by binary search and stop once past the read.
        first = max(0, int(np.searchsorted(self._hstarts, hap_start, side="right")) - 1)
        for hstart, blen, rstart in self.blocks[first:]:
            if hstart >= hap_end:
                break
            lo = max(hstart, hap_start)
            hi = min(hstart + blen, hap_end)
            if hi <= lo:
                continue
            if rstart is None:
                ops.append([1, hi - lo])  # I
            else:
                seg_ref_start = rstart + (lo - hstart)
                if bam_pos is None:
                    bam_pos = seg_ref_start
                if prev_ref_end is not None and seg_ref_start > prev_ref_end:
                    ops.append([2, seg_ref_start - prev_ref_end])  # D
                ops.append([0, hi - lo])  # M
                prev_ref_end = seg_ref_start + (hi - lo)
        # Merge adjacent same-op runs.
        merged = []
        for op, ln in ops:
            if merged and merged[-1][0] == op:
                merged[-1][1] += ln
            else:
                merged.append([op, ln])
        if bam_pos is None:
            return None, None
        return bam_pos, [tuple(x) for x in merged]


def simulate_reads(
    haps,
    region_start,
    region_end,
    read_len=100,
    coverage=30,
    seed=5,
    qual=35,
    error_rate=0.0,
    fast_errors=False,
):
    """Single-end reads uniformly across the region, alternating between the
    given SimHaplotypes.

    fast_errors=True draws substitution errors from a vectorised chunked
    stream instead of per-base scalar draws — a different (equally valid)
    RNG consumption pattern, so datasets differ from the default path; used
    by the scaling harness for multi-megabase generation, never by tests
    that pin expectations to the default stream.
    """
    rng = np.random.default_rng(seed)
    n_reads = int((region_end - region_start) * coverage / read_len)
    err_rng = np.random.default_rng(seed + 104729) if fast_errors else None
    acgt = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for i in range(n_reads):
        hap = haps[i % len(haps)]
        ref_start = int(rng.integers(region_start, max(region_start + 1, region_end - read_len)))
        # Find hap coordinate for this ref start (binary search).
        hap_start = hap.hap_pos_of(ref_start)
        if hap_start is None or hap_start + read_len > len(hap.seq):
            continue
        seq = bytearray(hap.seq[hap_start : hap_start + read_len])
        bam_pos, cigar = hap.cigar_for(hap_start, read_len)
        if bam_pos is None:
            continue
        if error_rate > 0:
            if fast_errors:
                m = np.nonzero(err_rng.random(read_len) < error_rate)[0]
                if len(m):
                    arr = np.frombuffer(bytes(seq), np.uint8).copy()
                    arr[m] = acgt[err_rng.integers(0, 4, size=len(m))]
                    seq = bytearray(arr.tobytes())
            else:
                for j in range(read_len):
                    if rng.random() < error_rate:
                        seq[j] = int(rng.choice(np.frombuffer(b"ACGT", np.uint8)))
        reads.append(
            dict(
                name=f"r{i}", ref_id=0, pos=bam_pos, mapq=60, flag=0,
                cigar=cigar, seq=bytes(seq), qual=[qual] * read_len,
            )
        )
    reads.sort(key=lambda r: r["pos"])
    return reads


def write_synth_bam(tmp_path, reads, ref_name="chr20", ref_len=8000, sample="S1",
                    filename="reads.bam"):
    path = os.path.join(str(tmp_path), filename)
    write_bam(path, [(ref_name, ref_len)], reads, sample=sample)
    return path


# ---------------------------------------------------------------------------
# Bulk generation for multi-megabase scaling datasets
# ---------------------------------------------------------------------------

def _affine_runs(hap: SimHaplotype):
    """Maximal hap intervals with an affine hap->ref mapping (single-M
    spans): arrays (hstart, hend, ref_offset) with ref = hap + offset."""
    runs = []
    for hstart, blen, rstart in hap.blocks:
        if rstart is None or blen == 0:
            continue
        off = rstart - hstart
        if runs and runs[-1][1] == hstart and runs[-1][2] == off:
            runs[-1][1] = hstart + blen
        else:
            runs.append([hstart, hstart + blen, off])
    return (np.array([r[0] for r in runs], np.int64),
            np.array([r[1] for r in runs], np.int64),
            np.array([r[2] for r in runs], np.int64))


def simulate_reads_bulk(haps, region_start, region_end, read_len=100,
                        coverage=30, seed=5, qual=35, error_rate=0.0):
    """Vectorised twin of simulate_reads for multi-megabase datasets.

    Returns (pos[n] int64, seq[n, L] uint8, special {row: cigar}) sorted by
    position; rows absent from `special` are single-M.  Content follows the
    same model as simulate_reads (alternating haplotypes, uniform starts,
    substitution errors) with a different RNG consumption pattern, so
    datasets are not byte-identical to the scalar generator — use for
    perf/scale datasets, not for tests pinned to the default stream."""
    rng = np.random.default_rng(seed)
    err_rng = np.random.default_rng(seed + 104729)
    n_reads = int((region_end - region_start) * coverage / read_len)
    L = read_len
    acgt = np.frombuffer(b"ACGT", np.uint8)

    starts = rng.integers(region_start, max(region_start + 1, region_end - L),
                          size=n_reads)
    hap_idx = np.arange(n_reads) % len(haps)

    all_pos = np.empty(0, np.int64)
    all_h = np.empty(0, np.int64)
    all_hap = np.empty(0, np.int64)
    all_single = np.empty(0, bool)
    for k, hap in enumerate(haps):
        sel = np.nonzero(hap_idx == k)[0]
        rs = starts[sel]
        # ref -> hap (drop reads starting inside a deletion).
        i = np.searchsorted(hap._ref_rstarts, rs, side="right") - 1
        i = np.clip(i, 0, len(hap._ref_rstarts) - 1)
        ok = (rs >= hap._ref_rstarts[i]) & (rs < hap._ref_rstarts[i] + hap._ref_lens[i])
        h = hap._ref_hstarts[i] + (rs - hap._ref_rstarts[i])
        ok &= h + L <= len(hap.seq)
        h = h[ok]
        # single-M iff the read fits one affine run.
        run_s, run_e, run_off = _affine_runs(hap)
        j = np.clip(np.searchsorted(run_s, h, side="right") - 1, 0, len(run_s) - 1)
        single = (h >= run_s[j]) & (h + L <= run_e[j])
        pos = np.where(single, h + run_off[j], -1)
        all_pos = np.concatenate([all_pos, pos])
        all_h = np.concatenate([all_h, h])
        all_hap = np.concatenate([all_hap, np.full(len(h), k, np.int64)])
        all_single = np.concatenate([all_single, single])

    # Sequences: gathers per haplotype, chunked — the fancy-index offset
    # matrix is int64 [chunk, L], so unchunked it would transiently cost
    # 8*L bytes per read (12 GB at 15M reads).
    n = len(all_h)
    seq = np.empty((n, L), np.uint8)
    col = np.arange(L)[None, :]
    for k, hap in enumerate(haps):
        rows = np.nonzero(all_hap == k)[0]
        arr = np.frombuffer(hap.seq, np.uint8)
        for lo in range(0, len(rows), 1 << 20):
            r = rows[lo:lo + (1 << 20)]
            seq[r] = arr[all_h[r][:, None] + col]

    # Multi-M rows: scalar cigar_for (few per cent of reads).
    special = {}
    for r in np.nonzero(~all_single)[0]:
        hap = haps[int(all_hap[r])]
        bam_pos, cigar = hap.cigar_for(int(all_h[r]), L)
        if bam_pos is None:
            all_pos[r] = -2  # drop
            continue
        all_pos[r] = bam_pos
        special[int(r)] = cigar

    keep = all_pos != -2
    if not keep.all():
        remap = np.cumsum(keep) - 1
        special = {int(remap[r]): c for r, c in special.items() if keep[r]}
        all_pos, seq = all_pos[keep], seq[keep]

    if error_rate > 0:
        m = err_rng.random(seq.shape) < error_rate
        n_err = int(m.sum())
        if n_err:
            seq[m] = acgt[err_rng.integers(0, 4, size=n_err)]

    order = np.argsort(all_pos, kind="stable")
    inv = np.empty(len(order), np.int64)
    inv[order] = np.arange(len(order))
    special = {int(inv[r]): c for r, c in special.items()}
    return all_pos[order], seq[order], special


_BULK_SEQ_LUT = np.zeros(256, np.uint8)
for _i, _b in enumerate(b"=ACMGRSVTWYHKDBN"):
    _BULK_SEQ_LUT[_b] = _i


def write_bam_bulk(path, references, pos, seq, special, qual=35,
                   sample="S1", chunk=65536):
    """Write a coordinate-sorted single-end BAM from SoA read data.

    Single-M records (constant layout) pack as one numpy matrix per chunk;
    rows present in `special` get their CIGAR packed individually and are
    spliced in, preserving position order.  ~100x the per-record Python
    writer for multi-megabase datasets."""
    import struct

    from platypus_tpu.io.bgzf import BGZFWriter

    n, L = seq.shape
    name_len = 11  # 'r%09d' + NUL
    aux = b"RGZrg1\x00"
    rec_sz = 32 + name_len + 4 + (L + 1) // 2 + L + len(aux)

    header_text = "@HD\tVN:1.6\tSO:coordinate\n"
    for nm, ln in references:
        header_text += f"@SQ\tSN:{nm}\tLN:{ln}\n"
    header_text += f"@RG\tID:rg1\tSM:{sample}\n"

    with BGZFWriter(path) as out:
        out.write(b"BAM\x01")
        ht = header_text.encode()
        out.write(struct.pack("<i", len(ht)) + ht)
        out.write(struct.pack("<i", len(references)))
        for nm, ln in references:
            nb = nm.encode() + b"\x00"
            out.write(struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln))

        codes = _BULK_SEQ_LUT[seq]
        packed_all = (codes[:, 0::2] << 4) | codes[:, 1::2] if L % 2 == 0 else None

        template = np.zeros(4 + rec_sz, np.uint8)
        template[0:4] = np.frombuffer(struct.pack("<i", rec_sz), np.uint8)
        # refID=0, pos filled per row.
        template[12] = name_len          # l_read_name
        template[13] = 60                # mapq
        struct.pack_into("<H", template, 16, 1)   # n_cigar
        struct.pack_into("<i", template, 20, L)   # l_seq
        struct.pack_into("<i", template, 24, -1)  # next_refID
        struct.pack_into("<i", template, 28, -1)  # next_pos
        name_off = 4 + 32
        cigar_off = name_off + name_len
        seq_off = cigar_off + 4
        qual_off = seq_off + (L + 1) // 2
        aux_off = qual_off + L
        template[name_off] = ord("r")
        struct.pack_into("<I", template, cigar_off, (L << 4) | 0)
        template[qual_off:qual_off + L] = qual
        template[aux_off:aux_off + len(aux)] = np.frombuffer(aux, np.uint8)

        ids = np.arange(n, dtype=np.int64)
        digits = np.empty((n, 9), np.uint8)
        for d in range(9):
            digits[:, d] = (ids // 10 ** (8 - d)) % 10 + ord("0")

        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            rows = np.arange(lo, hi)
            block = np.broadcast_to(template, (hi - lo, len(template))).copy()
            block[:, 8:12] = pos[lo:hi].astype("<i4").view(np.uint8).reshape(-1, 4)
            block[:, name_off + 1:name_off + 10] = digits[lo:hi]
            if packed_all is not None:
                block[:, seq_off:qual_off] = packed_all[lo:hi]
            else:
                c = codes[lo:hi]
                ce = np.concatenate([c, np.zeros((hi - lo, 1), np.uint8)], axis=1)
                block[:, seq_off:qual_off] = (ce[:, 0::2] << 4) | ce[:, 1::2]
            # Special (multi-op) rows in this chunk: pack individually and
            # splice the chunk around them.
            spec_rows = sorted(r for r in range(lo, hi) if r in special)
            if not spec_rows:
                out.write(block.tobytes())
                continue
            prev = lo
            for r in spec_rows:
                if r > prev:
                    out.write(block[prev - lo:r - lo].tobytes())
                cig = special[r]
                words = b"".join(struct.pack("<I", (ln << 4) | op)
                                 for op, ln in cig)
                name = b"r%09d\x00" % r
                body = struct.pack("<iiBBHHHiiii", 0, int(pos[r]), name_len,
                                   60, 0, len(cig), 0, L, -1, -1, 0)
                body += name + words
                body += block[r - lo, seq_off:qual_off].tobytes()
                body += bytes([qual]) * L + aux
                out.write(struct.pack("<i", len(body)) + body)
                prev = r + 1
            if hi > prev:
                out.write(block[prev - lo:hi - lo].tobytes())
    return path
