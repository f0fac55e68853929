"""Standalone de Bruijn graph explorer for a BAM region.

Equivalent of the reference's src/python/graph.py:138-807 exploration
tool (its production assembler lives in candidates/assembly.py, as the
reference's does in assembler.pyx): build the coloured k-mer graph for a
region from our own BAM/FASTA readers, then print graph statistics, the
edge-weight histogram, cycle status across a k ladder, and the variants
extracted from read-only bubble paths.

    python tools/graph_explore.py reads.bam ref.fa chr20:5000-7000 \
        --kmer 15 --min-weight 20 --min-qual 20
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph(bam_path: str, ref_path: str, chrom: str, start: int,
                end: int, kmer: int, min_qual: int):
    from platypus_tpu.candidates.assembly import (DeBruijnGraph,
                                                  load_read, load_reference)
    from platypus_tpu.io.bam import BamFile
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(ref_path)
    ref_start = max(0, start - kmer)
    ref_seq = fa.get_sequence(chrom, ref_start, end + kmer)
    graph = DeBruijnGraph(kmer)
    load_reference(graph, ref_seq, ref_start)
    bam = BamFile(bam_path)
    rs = bam.fetch(chrom, start, end)
    n_loaded = 0
    for i in range(len(rs.rlen)):
        if rs.mapq[i] < 20 or rs.qc_fail[i]:
            continue
        load_read(graph, rs.seq[i], rs.qual[i], int(rs.rlen[i]), min_qual)
        n_loaded += 1
    return graph, ref_seq, ref_start, n_loaded


def print_graph_info(graph, out) -> None:
    """#nodes / #edges / colour breakdown (reference graph.py:565-573)."""
    from platypus_tpu.candidates.assembly import READ, REF, REF_AND_READ

    n_edges = sum(len(n.edges) for n in graph.all_nodes)
    by_colour = Counter(n.colours for n in graph.all_nodes)
    print(f"nodes = {len(graph.all_nodes)}", file=out)
    print(f"edges = {n_edges}", file=out)
    print(f"ref-only nodes = {by_colour.get(REF, 0)}", file=out)
    print(f"read-only nodes = {by_colour.get(READ, 0)}", file=out)
    print(f"ref-and-read nodes = {by_colour.get(REF_AND_READ, 0)}", file=out)


def print_edge_weight_histogram(graph, out) -> None:
    """(reference graph.py:486-499)."""
    hist = Counter()
    for node in graph.all_nodes:
        for _e, w in node.edges:
            hist[int(w)] += 1
    print("edge-weight histogram:", file=out)
    for w in sorted(hist):
        print(f"  {w}\t{hist[w]}", file=out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bam")
    ap.add_argument("ref")
    ap.add_argument("region", help="chrom:start-end")
    ap.add_argument("--kmer", type=int, default=15)
    ap.add_argument("--max-kmer", type=int, default=0,
                    help="try k ladder up to this on cycles (0 = just --kmer)")
    ap.add_argument("--min-weight", type=float, default=20.0)
    ap.add_argument("--min-qual", type=int, default=20)
    args = ap.parse_args(argv)

    chrom, rng = args.region.split(":")
    start_s, end_s = rng.split("-")
    start, end = int(start_s), int(end_s)

    from platypus_tpu.candidates.assembly import detect_cycles, find_bubbles

    k = args.kmer
    max_k = max(args.max_kmer, k)
    out = sys.stdout
    while True:
        graph, ref_seq, ref_start, n_reads = build_graph(
            args.bam, args.ref, chrom, start, end, k, args.min_qual)
        print(f"k = {k}, reads loaded = {n_reads}", file=out)
        print_graph_info(graph, out)
        print_edge_weight_histogram(graph, out)
        cyclic = detect_cycles(graph)
        print(f"cycles = {cyclic}", file=out)
        if not cyclic or k >= max_k:
            break
        k += 5  # the production assembler's cycle-escalation ladder
        print(f"graph is cyclic; escalating to k = {k}", file=out)

    variants = find_bubbles(graph, args.min_weight, ref_seq, chrom,
                            ref_start, start, end)
    print(f"bubble-path variants ({len(variants)}):", file=out)
    for v in sorted(set(variants)):
        removed = v.removed.decode() if isinstance(v.removed, bytes) else v.removed
        added = v.added.decode() if isinstance(v.added, bytes) else v.added
        print(f"  {v.ref_name}\t{v.ref_pos + 1}\t{removed or '-'}\t"
              f"{added or '-'}", file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
