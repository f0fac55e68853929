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
