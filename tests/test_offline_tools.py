"""Offline tools: lowcov indel-error estimation and the graph explorer
(reference src/python/lowcov.py / graph.py equivalents)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _make_tandem_dataset(tmp_path, n_motifs=40, coverage=5, seed=9):
    """Reference with AAAA... tracts; reads where ~half the motif sites are
    het for a 1bp deletion."""
    from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

    length = 2000 + n_motifs * 120
    ref_path, ref_seq = make_reference(tmp_path, length=length, seed=seed)
    seq = bytearray(ref_seq.tobytes())
    motifs = []
    variants = []
    rng = np.random.default_rng(seed)
    for m in range(n_motifs):
        pos = 1000 + m * 120
        seq[pos:pos + 8] = b"A" * 8
        motifs.append((pos, 8, "A"))
        if m % 2 == 0:
            variants.append((pos + 2, 1, b""))  # 1bp deletion in the tract
    ref2 = os.path.join(str(tmp_path), "ref_tandem.fa")
    with open(ref2, "w") as fh:
        fh.write(">chr20\n")
        text = bytes(seq).decode()
        for i in range(0, len(text), 60):
            fh.write(text[i:i + 60] + "\n")
    from platypus_tpu.io.fasta import build_index

    build_index(ref2)
    ref_arr = np.frombuffer(bytes(seq), np.uint8)
    haps = [SimHaplotype(ref_arr, variants), SimHaplotype(ref_arr, [])]
    reads = simulate_reads(haps, 800, length - 800, coverage=coverage,
                           error_rate=0.0, seed=seed + 1)
    write_synth_bam(tmp_path, reads, ref_len=length, filename="tandem.bam")
    motif_file = os.path.join(str(tmp_path), "motifs.txt")
    with open(motif_file, "w") as fh:
        for pos, tlen, unit in motifs:
            fh.write(f"chr20\t{pos}\t0\tN\t{tlen}\t{unit}\n")
    return os.path.join(str(tmp_path), "tandem.bam"), ref2, motif_file


def test_lowcov_counts_and_fit(tmp_path):
    import lowcov

    bam, ref, motif_file = _make_tandem_dataset(tmp_path)
    with open(motif_file) as fh:
        counts = lowcov.collect_counts("chr20", fh, bam, min_mapq=0,
                                       coverage=6)
    assert counts, "no motif contexts passed the coverage gate"
    # Every key's histogram is consistent with the binning layout.
    for key, hist in counts.items():
        assert len(hist) == (6 - 3) * (6 + 1)
        assert sum(hist) >= 1
    # The het deletion sites put mass off the zero column.
    total_nonref = sum(sum(h[i] for i in range(len(h)) if i % 7)
                       for h in counts.values())
    assert total_nonref > 0
    # Fit runs and yields a het fraction and error rate in range.
    key = next(iter(counts))
    N00, N01, N11, eps, beta = lowcov.fitmodel(counts[key], 6)
    assert 0 <= eps <= 0.2
    assert 0.35 <= beta <= 0.65

    # report() round-trips through parse_counts.
    import io as _io

    buf = _io.StringIO()
    lowcov.report(counts, 6, out=buf)
    reparsed = lowcov.parse_counts(_io.StringIO(buf.getvalue()))
    assert set(reparsed) == set(counts)
    for k in counts:
        assert reparsed[k] == counts[k]


def test_lowcov_cli_stdin_mode(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lowcov.py"), "5"],
        input="A\t8\t[5, 1, 1, 0, 0, 0, 4, 1, 1, 0, 0, 0, 3, 1, 1, 0, 0, 0]\n",
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    cols = proc.stdout.strip().split("\t")
    assert cols[0] == "A" and cols[1] == "8"


def test_graph_explore_cli(tmp_path):
    from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

    ref_path, ref_seq = make_reference(tmp_path, length=4000, seed=12)
    # Plant a het SNP at 2000.
    alt = bytes([{65: 67, 67: 71, 71: 84, 84: 65}[ref_seq[2000]]])
    haps = [SimHaplotype(ref_seq, [(2000, 1, alt)]), SimHaplotype(ref_seq, [])]
    reads = simulate_reads(haps, 1500, 2500, coverage=30, error_rate=0.0,
                           seed=13)
    write_synth_bam(tmp_path, reads, ref_len=4000, filename="g.bam")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "graph_explore.py"),
         os.path.join(str(tmp_path), "g.bam"), ref_path, "chr20:1900-2100",
         "--kmer", "15", "--min-weight", "20"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    assert "nodes = " in out and "edge-weight histogram:" in out
    assert "cycles = " in out
    # The planted SNP appears among the bubble-path variants.
    assert f"chr20\t2001\t" in out
