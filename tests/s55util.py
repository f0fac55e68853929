"""Shared S55 re-hosting: the bundled real-read BAM
(/root/reference/test/S55_test_realigned.bam) carries five read islands on
chr6 (the classical HLA loci) but the reference tree ships no FASTA, so
tests reconstruct per-island consensus mini-contigs (majority vote over
M-aligned bases) and re-host the reads onto them — real qualities,
soft-clips and pair flags preserved, coordinates shifted."""

import numpy as np

from platypus_tpu.io.bam import BamFile, write_bam
from platypus_tpu.io.fasta import build_index

S55 = "/root/reference/test/S55_test_realigned.bam"
PAD = 500  # consensus contig padding on each side of an island


def read_islands(min_gap: int = 10_000):
    """[(lo, hi)] read-start islands of the S55 BAM, sorted by position."""
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        rs = bf.fetch(chrom, 0, length)
    pos = np.sort(rs.pos)
    gaps = np.where(np.diff(pos) > min_gap)[0]
    starts = np.concatenate([[0], gaps + 1])
    ends = np.concatenate([gaps, [len(pos) - 1]])
    return [(int(pos[s]), int(pos[e])) for s, e in zip(starts, ends)]


def consensus_contig(rs, offset: int, contig_len: int) -> np.ndarray:
    """Majority-vote consensus over M-aligned bases, 'A' where uncovered."""
    counts = np.zeros((contig_len, 5), np.int32)  # A C G T other
    base_idx = {ord("A"): 0, ord("C"): 1, ord("G"): 2, ord("T"): 3}
    for i in range(len(rs)):
        pos = int(rs.pos[i]) - offset
        read_off = 0
        ref_off = 0
        for op, ln in rs.cigar_ops(i):
            op, ln = int(op), int(ln)
            if op in (0, 7, 8):  # M/=/X
                for k in range(ln):
                    p = pos + ref_off + k
                    if 0 <= p < contig_len:
                        b = base_idx.get(int(rs.seq[i, read_off + k]), 4)
                        counts[p, b] += 1
                read_off += ln
                ref_off += ln
            elif op == 1:
                read_off += ln
            elif op in (2, 3):
                ref_off += ln
            elif op == 4:
                read_off += ln
                if ref_off == 0 and read_off == ln:
                    # leading clip already consumed by the pos shift
                    ref_off += ln
    consensus = np.full(contig_len, ord("A"), np.uint8)
    covered = counts[:, :4].sum(axis=1) > 0
    best = counts[:, :4].argmax(axis=1)
    lut = np.frombuffer(b"ACGT", np.uint8)
    consensus[covered] = lut[best[covered]]
    return consensus


def rehost_reads(rs, offset: int, contig_len: int, ref_id: int, tag: str):
    """Shift real reads onto a local contig; drop reads falling off it."""
    reads = []
    for i in range(len(rs)):
        rl = int(rs.rlen[i])
        new_pos = int(rs.pos[i]) - offset
        cigar = [(int(o), int(l)) for o, l in rs.cigar_ops(i)]
        if cigar and cigar[0][0] == 4:
            # The BAM writer wants the original (unshifted) pos back.
            new_pos += cigar[0][1]
        if new_pos < 0 or new_pos + rl >= contig_len:
            continue
        reads.append(dict(
            name=f"{tag}_r{i}", ref_id=ref_id, pos=new_pos,
            mapq=int(rs.mapq[i]), flag=int(rs.flag[i]), cigar=cigar,
            seq=bytes(rs.seq[i, :rl].tobytes()), qual=rs.qual[i, :rl].tolist(),
            mate_ref_id=(ref_id if rs.mate_chrom_id[i] == rs.chrom_id[i]
                         else -1),
            mate_pos=max(-1, int(rs.mate_pos[i]) - offset),
            tlen=int(rs.insert_size[i]),
        ))
    return reads


def build_s55_full(tmp):
    """Re-host ALL S55 islands: one contig per island, one multi-contig BAM.

    Returns dict(bam=..., ref=..., contigs=[(name, length)], n_reads=N)."""
    tmp = str(tmp)
    islands = read_islands()
    contigs = []
    all_reads = []
    seqs = []
    with BamFile(S55) as bf:
        chrom, _length = bf.references[0]
        for idx, (lo, hi) in enumerate(islands):
            rs = bf.fetch(chrom, lo, hi + 300)
            offset = lo - PAD
            contig_len = (hi - lo) + 300 + 2 * PAD
            name = f"HLA_island_{idx}"
            seqs.append((name, consensus_contig(rs, offset, contig_len)))
            reads = rehost_reads(rs, offset, contig_len, idx, f"i{idx}")
            contigs.append((name, contig_len))
            all_reads.extend(reads)

    ref_path = f"{tmp}/s55_full.fa"
    with open(ref_path, "w") as fh:
        for name, seq in seqs:
            text = seq.tobytes().decode()
            fh.write(f">{name}\n")
            for i in range(0, len(text), 60):
                fh.write(text[i:i + 60] + "\n")
    build_index(ref_path)

    # One BAM, contigs in island order; reads per contig stay pos-sorted.
    all_reads.sort(key=lambda r: (r["ref_id"], r["pos"]))
    bam_path = f"{tmp}/s55_full.bam"
    write_bam(bam_path, contigs, all_reads, sample="S55")
    return dict(bam=bam_path, ref=ref_path, contigs=contigs,
                n_reads=len(all_reads))
