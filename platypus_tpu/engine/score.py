"""Window scoring: build the (haplotype × read) log-likelihood matrix.

This is the TPU-era replacement for the reference's per-(hap, individual)
alignment cache loop (chaplotype.pyx:306-377 + calign.pyx:170-272): instead
of aligning read-by-read in C, we

1. collect every read in the window (good + bad + broken piles of every
   sample, in that order — matching the reference's likelihood array
   layout),
2. compute, per haplotype, the k-mer anchor segments for all reads at once
   (ops/kmer.py),
3. gather the haplotype segments into one padded batch and run the banded
   DP for every (read, hap, anchor) lane on the device in a single
   `band_align_padded` call (ops/align_jax.py),
4. min-reduce anchors, convert scores to log-likelihoods.

Reads that are QC-failed or overlap the window haplotype span by < 7 bases
contribute log-likelihood 0 (probability 1) without being aligned; broken
mates skip the overlap test (chaplotype.pyx:341-373).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.readbuffer import SampleReadBuffer
from ..models.haplotype import Haplotype
from ..ops.align_jax import band_align_padded, pad_alignment_inputs
from ..ops.kmer import HASH_NUCS, candidate_segments
from ..ops.likelihood import scores_to_logliks

_N_CHAR = ord("N")


@dataclass
class WindowReads:
    """All reads of a window, flattened across samples and piles."""

    seq: np.ndarray          # [R, L] uint8
    qual: np.ndarray         # [R, L] uint8 (post-trimming)
    rlen: np.ndarray         # [R] int32
    pos: np.ndarray          # [R] int64
    end: np.ndarray          # [R] int64
    mapq: np.ndarray         # [R] int32
    strand_reverse: np.ndarray  # [R] bool
    qc_fail: np.ndarray      # [R] bool
    is_broken: np.ndarray    # [R] bool
    sample_idx: np.ndarray   # [R] int32
    is_good: np.ndarray      # [R] bool (good pile, i.e. counts for nReads)
    cigar_refs: List[Tuple[object, int]]  # (ReadSet, row) for INFO re-walks

    def __len__(self) -> int:
        return int(self.rlen.shape[0])


def gather_window_reads(
    buffers: Sequence[SampleReadBuffer], window_start: int, window_end: int
) -> WindowReads:
    """Collect good+bad+broken reads per sample for a window, in the
    reference's array order (good, bad, broken per individual)."""
    from ..io.bam import FLAG_REVERSE

    parts = []
    for s_idx, buf in enumerate(buffers):
        for pile, rs, sl in (
            ("good", buf.good, buf.window_slice(window_start, window_end)),
            ("bad", buf.bad, buf.bad_window_slice(window_start, window_end)),
            ("broken", buf.broken, buf.broken_window_slice(window_start, window_end)),
        ):
            for i in range(sl.start, sl.stop):
                parts.append((s_idx, pile, rs, i))

    R = len(parts)
    L = max((int(p[2].rlen[p[3]]) for p in parts), default=0)
    seq = np.zeros((R, L), np.uint8)
    qual = np.zeros((R, L), np.uint8)
    rlen = np.zeros(R, np.int32)
    pos = np.zeros(R, np.int64)
    end = np.zeros(R, np.int64)
    mapq = np.zeros(R, np.int32)
    rev = np.zeros(R, bool)
    qc = np.zeros(R, bool)
    broken = np.zeros(R, bool)
    sample_idx = np.zeros(R, np.int32)
    good = np.zeros(R, bool)
    cigar_refs: List[Tuple[object, int]] = []
    for r, (s_idx, pile, rs, i) in enumerate(parts):
        n = int(rs.rlen[i])
        seq[r, :n] = rs.seq[i, :n]
        qual[r, :n] = rs.qual[i, :n]
        rlen[r] = n
        pos[r] = rs.pos[i]
        end[r] = rs.end[i]
        mapq[r] = rs.mapq[i]
        rev[r] = bool(rs.flag[i] & FLAG_REVERSE)
        qc[r] = bool(rs.qc_fail[i])
        broken[r] = pile == "broken"
        good[r] = pile == "good"
        sample_idx[r] = s_idx
        cigar_refs.append((rs, i))
    return WindowReads(seq, qual, rlen, pos, end, mapq, rev, qc, broken,
                       sample_idx, good, cigar_refs)


def _aligned_mask(reads: WindowReads, hap_start: int, hap_end: int) -> np.ndarray:
    """Which reads get a real alignment (others contribute loglik 0)."""
    overlap = np.minimum(reads.end, hap_end) - np.maximum(reads.pos, hap_start)
    overlap = np.where(overlap > 0, overlap, -1)
    ok = (~reads.qc_fail) & ((overlap >= HASH_NUCS) | reads.is_broken)
    return ok


def score_reads_vs_haplotypes(
    haps: Sequence[Haplotype],
    reads: WindowReads,
    gapextend: int = 3,
    nucprior: int = 2,
    use_map_qual_cap: bool = False,
    batch_cap: int = 1 << 14,
) -> np.ndarray:
    """Log-likelihood matrix [H, R] for every (haplotype, read) pair."""
    H = len(haps)
    R = len(reads)
    loglik = np.zeros((H, R), np.float64)
    if R == 0 or H == 0:
        return loglik

    win_start = haps[0].start_pos
    win_end = haps[0].end_pos
    mask = _aligned_mask(reads, win_start, win_end)
    align_rows = np.nonzero(mask)[0]
    if len(align_rows) == 0:
        return loglik

    sub_seq = reads.seq[align_rows]
    sub_len = reads.rlen[align_rows]
    sub_pos = reads.pos[align_rows]
    L2max = int(sub_len.max())

    # --- collect (hap, read, segment) triples --------------------------
    pair_hap: List[np.ndarray] = []
    pair_read: List[np.ndarray] = []
    pair_seg: List[np.ndarray] = []
    for h_idx, hap in enumerate(haps):
        pr, ps = candidate_segments(
            hap.kmer_index, sub_seq, sub_len, sub_pos, hap.hap_start
        )
        pair_hap.append(np.full(len(pr), h_idx, np.int64))
        pair_read.append(pr)
        pair_seg.append(ps)
    ph = np.concatenate(pair_hap)
    pr = np.concatenate(pair_read)
    ps = np.concatenate(pair_seg)

    # scores default: reads shorter than 7 bases score 0 without alignment.
    scores = np.zeros((H, len(align_rows)), np.int64)
    if len(ph):
        scores[:] = np.iinfo(np.int32).max
        short = sub_len < HASH_NUCS
        scores[:, short] = 0

        seg_len = L2max + 15
        pair_scores = np.empty(len(ph), np.int64)
        for lo in range(0, len(ph), batch_cap):
            hi = min(lo + batch_cap, len(ph))
            bh, br, bs = ph[lo:hi], pr[lo:hi], ps[lo:hi]
            B = hi - lo
            hap_seg = np.full((B, seg_len), _N_CHAR, np.uint8)
            go_seg = np.zeros((B, seg_len), np.int32)
            for b in range(B):
                hap = haps[bh[b]]
                s = int(bs[b])
                e = min(s + seg_len, hap.hap_len)
                n = e - s
                hap_seg[b, :n] = np.frombuffer(hap.sequence, np.uint8)[s:e]
                go_seg[b, :n] = hap.gap_open[s:e]
            # Pad the batch to a power-of-two lane count so XLA compiles a
            # small, reusable set of kernel shapes.
            B_pad = max(128, 1 << (B - 1).bit_length())
            if B_pad != B:
                pad = B_pad - B
                hap_seg = np.concatenate([hap_seg, np.full((pad, seg_len), _N_CHAR, np.uint8)])
                go_seg = np.concatenate([go_seg, np.zeros((pad, seg_len), np.int32)])
                r_seq = np.concatenate([sub_seq[br], np.zeros((pad, L2max), np.uint8)])
                r_qual = np.concatenate([reads.qual[align_rows][br], np.zeros((pad, L2max), np.uint8)])
                r_len = np.concatenate([sub_len[br], np.full(pad, min(8, L2max), np.int32)])
            else:
                r_seq = sub_seq[br]
                r_qual = reads.qual[align_rows][br]
                r_len = sub_len[br]
            padded = pad_alignment_inputs(hap_seg, go_seg, r_seq, r_qual, r_len)
            pair_scores[lo:hi] = np.asarray(
                band_align_padded(*padded, gapextend=gapextend, nucprior=nucprior)
            )[:B]
        np.minimum.at(scores, (ph, pr), pair_scores)

    sub_loglik = scores_to_logliks(
        scores, reads.mapq[align_rows][None, :], use_map_qual_cap=use_map_qual_cap
    )
    loglik[:, align_rows] = sub_loglik
    return loglik
