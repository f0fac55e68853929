"""CLI conveniences (glob/list flags, BAM list files) and post-hoc VCF tools."""

import gzip
import io
import os
import subprocess
import sys

import pytest

from platypus_tpu.utils.fileio import (
    expand_bam_file_names,
    expand_list_arg,
    open_transparent,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VCF_BODY = """##fileformat=VCFv4.0
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
chr1\t100\t.\tA\tG\t200\tPASS\tTC=30;TCR=20;TR=10;HP=6\tGT:GL:GOF:GQ:NR:NV\t0/1:-1,0,-1:3:40:30:10
chr1\t105\t.\tC\tT\t90\tPASS\tTC=10;TCR=8;TR=1;HP=2\tGT:GL:GOF:GQ:NR:NV\t0/1:-1,0,-1:55:20:10:1
chr1\t500\t.\tACG\tATG\t50\tPASS\tTC=12;TCR=9;TR=5;HP=1\tGT:GL:GOF:GQ:NR:NV\t1/1:-1,0,-1:9:30:12:5
chr2\t700\t.\tG\tGA\t70\tPASS\tTC=25;TCR=15;TR=9;HP=9\tGT:GL:GOF:GQ:NR:NV\t0/1:-1,0,-1:2:35:25:9
"""


def _run_tool(args, text=VCF_BODY):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "vcf_tools.py"), *args],
        input=text, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_expand_list_arg_comma_and_glob(tmp_path):
    assert expand_list_arg("a.bam,b.bam") == ["a.bam", "b.bam"]
    for name in ("x1.bam", "x2.bam"):
        (tmp_path / name).write_bytes(b"")
    got = expand_list_arg(str(tmp_path / "x*.bam"))
    assert got == [str(tmp_path / "x1.bam"), str(tmp_path / "x2.bam")]


def test_bam_list_from_text_file(tmp_path):
    lst = tmp_path / "bams.txt"
    lst.write_text("/data/a.bam\nnot_a_bam.txt\n/data/b.cram\n")
    assert expand_bam_file_names([str(lst)]) == ["/data/a.bam", "/data/b.cram"]
    # Direct BAM names pass through.
    assert expand_bam_file_names(["x.bam"]) == ["x.bam"]


def test_open_transparent_gzip(tmp_path):
    p = tmp_path / "regions.txt.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("chr1:1-100\n")
    with open_transparent(str(p)) as fh:
        assert fh.read() == "chr1:1-100\n"


def test_cram_goes_to_cram_reader(tmp_path):
    """BamFile itself stays BAM-only; .cram routes to io.cram.CramFile."""
    from platypus_tpu.io.bam import BamFile

    p = tmp_path / "in.cram"
    p.write_bytes(b"CRAM")
    with pytest.raises(ValueError, match="CRAM"):
        BamFile(str(p))


def test_vcf_tools_tstv_and_indel_ratio():
    out = _run_tool(["tstv"])
    assert "Ts: 2" in out and "Tv: 0" in out  # A>G and C>T are transitions
    out2 = _run_tool(["indel-ratio"])
    assert "insertions: 1" in out2 and "deletions: 0" in out2


def test_vcf_tools_filters():
    # GOF < 10 keeps samples with small goodness-of-fit values.
    out = _run_tool(["filter-gof", "10"])
    assert "chr1\t100" in out and "chr1\t105" not in out
    # HP >= 6.
    out = _run_tool(["filter-hp", ">6"])
    body = [l for l in out.splitlines() if not l.startswith("#")]
    assert len(body) == 2 and all("HP=6" in l or "HP=9" in l for l in body)
    # varfreq TR/TCR > 0.3.
    out = _run_tool(["filter-varfreq"])
    assert "chr1\t105" not in out and "chr1\t100" in out


def test_vcf_tools_clusters_and_split():
    out = _run_tool(["clusters", "keep", "10"])
    body = [l for l in out.splitlines() if not l.startswith("#")]
    assert [l.split("\t")[1] for l in body] == ["100", "105"]
    out = _run_tool(["clusters", "remove", "10"])
    body = [l for l in out.splitlines() if not l.startswith("#")]
    assert [l.split("\t")[1] for l in body] == ["500", "700"]
    out = _run_tool(["clusters", "mark", "10"])
    marked = [l for l in out.splitlines() if "\tCluster\t" in l]
    assert len(marked) == 2
    # MNP split: ACG>ATG becomes one SNP C>T at pos 501.
    out = _run_tool(["split-mnps"])
    assert "chr1\t501\t.\tC\tT" in out and "FromComplex" in out


def test_cli_builds_config_with_glob(tmp_path):
    from platypus_tpu.cli import build_config

    for name in ("s1.bam", "s2.bam"):
        (tmp_path / name).write_bytes(b"")
    cfg = build_config([
        "--bamFiles", str(tmp_path / "s*.bam"),
        "--refFile", "/ref.fa",
        "--regions", "chr1:1-100,chr2",
    ])
    assert cfg.bam_files == [str(tmp_path / "s1.bam"), str(tmp_path / "s2.bam")]
    assert cfg.regions == ["chr1:1-100", "chr2"]


def test_open_url_local_pipe(tmp_path):
    import gzip as _gzip

    from platypus_tpu.utils.fileio import open_url

    p = tmp_path / "remote.txt"
    p.write_text("hello remote\n")
    # Underscore-for-space command form, as the reference supports.
    out = open_url(str(p), "cat_%s").read()
    assert out == b"hello remote\n"

    gz = tmp_path / "remote2.txt.gz"
    with _gzip.open(gz, "wt") as fh:
        fh.write("zipped line\n")
    out = open_url(str(gz), "cat_%s").read()
    assert out == b"zipped line\n"


def test_native_decoder_truncated_bam(tmp_path):
    """A BAM cut mid-block must fail cleanly (no crash/hang) in both the
    native threaded decoder and the Python oracle."""
    import numpy as np

    from platypus_tpu.io.bam import BamFile
    from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

    ref_path, ref_seq = make_reference(tmp_path, length=9000, seed=3)
    reads = simulate_reads([SimHaplotype(ref_seq, [])], 200, 8000, coverage=10)
    bam = write_synth_bam(tmp_path, reads, ref_len=9000)
    data = open(bam, "rb").read()
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(data[: max(100, len(data) // 2)])
    try:
        with BamFile(str(trunc)) as bf:
            chrom, length = bf.references[0]
            rs = bf.fetch(chrom, 0, length)
            assert len(rs) >= 0  # partial data is acceptable; crashing is not
    except (ValueError, OSError, RuntimeError):
        pass  # clean failure is also acceptable
