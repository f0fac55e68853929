"""HLA typing on REAL data: the bundled S55 reads over HLA-A plus the
bundled HLA-A allele panel (2.7k alleles), re-hosted onto a consensus
contig.  Truth alleles are unknown, but the typing must select a coherent
allele pair supported by the reads."""

import gzip
import os

import numpy as np
import pytest

from platypus_tpu.config import PlatypusConfig, derive_runtime
from platypus_tpu.engine.hla import call_hla_variants_in_region
from platypus_tpu.io.bam import BamFile, write_bam
from platypus_tpu.io.fasta import FastaFile, build_index
from platypus_tpu.io.tabix import write_tabix_vcf

S55 = "/root/reference/test/S55_test_realigned.bam"
HLA_VCF = "/root/reference/test/HLA_A_alignment_hapsREF.vcf.gz"


@pytest.fixture(scope="module")
def hla_real(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hla_real")

    # The panel's first record anchors the HLA-A region.  Subsample the
    # 2.8k-allele panel (every 4th allele) to keep CPU test time bounded
    # while still exceeding the 150-hap ranking threshold.
    with gzip.open(HLA_VCF, "rt") as fh:
        panel = [l for i, l in enumerate(fh)
                 if not l.startswith("#") and i % 4 == 0]
    panel_positions = [int(l.split("\t")[1]) for l in panel]
    panel_lo = min(panel_positions) - 1         # 0-based
    panel_hi = max(int(l.split("\t")[1]) - 1 + len(l.split("\t")[3]) for l in panel)

    offset = panel_lo - 800
    contig_len = (panel_hi - panel_lo) + 1600

    with BamFile(S55) as bf:
        rs = bf.fetch("6", panel_lo - 500, panel_hi + 500)

    # Pileup consensus (M-aligned bases only).
    counts = np.zeros((contig_len, 4), np.int32)
    base_idx = {ord("A"): 0, ord("C"): 1, ord("G"): 2, ord("T"): 3}
    for i in range(len(rs)):
        pos = int(rs.pos[i]) - offset
        read_off = ref_off = 0
        for op, ln in rs.cigar_ops(i):
            op, ln = int(op), int(ln)
            if op in (0, 7, 8):
                for k in range(ln):
                    p = pos + ref_off + k
                    if 0 <= p < contig_len:
                        b = base_idx.get(int(rs.seq[i, read_off + k]))
                        if b is not None:
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
                    ref_off += ln
    consensus = np.full(contig_len, ord("A"), np.uint8)
    covered = counts.sum(axis=1) > 0
    lut = np.frombuffer(b"ACGT", np.uint8)
    consensus[covered] = lut[counts.argmax(axis=1)[covered]]

    ref_path = str(tmp / "hla_a.fa")
    text = consensus.tobytes().decode()
    with open(ref_path, "w") as fh:
        fh.write(">6L\n")
        for i in range(0, contig_len, 60):
            fh.write(text[i : i + 60] + "\n")
    build_index(ref_path)

    # Shift the allele panel onto the local contig.
    lines = ["##fileformat=VCFv4.0", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for l in panel:
        cols = l.rstrip("\n").split("\t")
        cols[0] = "6L"
        cols[1] = str(int(cols[1]) - offset)
        lines.append("\t".join(cols))
    vcf_path = str(tmp / "panel.vcf.gz")
    write_tabix_vcf(lines, vcf_path)

    # Re-host reads.
    reads = []
    for i in range(len(rs)):
        rl = int(rs.rlen[i])
        cigar = [(int(o), int(l)) for o, l in rs.cigar_ops(i)]
        new_pos = int(rs.pos[i]) - offset
        if cigar and cigar[0][0] == 4:
            new_pos += cigar[0][1]
        if new_pos < 0 or new_pos + rl >= contig_len:
            continue
        reads.append(dict(
            name=f"r{i}", ref_id=0, pos=new_pos, mapq=int(rs.mapq[i]),
            flag=int(rs.flag[i]), cigar=cigar,
            seq=bytes(rs.seq[i, :rl].tobytes()), qual=rs.qual[i, :rl].tolist(),
            mate_ref_id=0 if rs.mate_chrom_id[i] == rs.chrom_id[i] else -1,
            mate_pos=max(-1, int(rs.mate_pos[i]) - offset),
            tlen=int(rs.insert_size[i]),
        ))
    reads.sort(key=lambda r: r["pos"])
    bam_path = str(tmp / "hla_a.bam")
    write_bam(bam_path, [("6L", contig_len)], reads, sample="S55")

    return dict(ref=ref_path, vcf=vcf_path, bam=bam_path,
                start=panel_lo - offset, end=panel_hi - offset,
                n_reads=len(reads), n_alleles=len(panel))


def test_hla_typing_on_real_panel(hla_real):
    config = PlatypusConfig(
        bam_files=[hla_real["bam"]], ref_file=hla_real["ref"],
        hla_typing=1, long_haps=1, source_file=[hla_real["vcf"]],
        assemble=0, get_variants_from_bams=0,
    )
    rt = derive_runtime(config, n_individuals=1)
    rt.rlen = 150
    import io as iomod

    out = iomod.StringIO()
    # start-1: the pinned golden was produced via the CLI region
    # "6L:800-3528", whose 1-based start is 0-based 799.
    with BamFile(hla_real["bam"]) as bam, FastaFile(hla_real["ref"]) as ref:
        n = call_hla_variants_in_region(
            "6L", hla_real["start"] - 1, hla_real["end"], [bam],
            {bam: ["S55"]}, ref, config, rt, out,
        )
    assert n == 1
    line = out.getvalue().strip()
    cols = line.split("\t")
    assert cols[0] == "6L"
    fmt = cols[8]
    assert fmt == "GT:GL:NR:NV1:NV2"
    sample = cols[9].split(":")
    gt = sample[0]
    nr = int(sample[2])
    assert nr > 100, f"too few reads genotyped: {line[:200]}"
    assert gt and gt != ".", line[:200]
    # The called alleles must come from the panel (ALT column non-empty
    # unless the sample is consensus-identical, which real HLA isn't).
    assert cols[4] != "."
    # GL is a finite log-likelihood.
    assert float(sample[1].split(",")[0]) < 0
    # Byte-parity with the RUNNING reference (docs/REFERENCE_RUN.md): the
    # golden was produced by executing the actual 0.8.1 release on this
    # fixture; the two-round pair-ranking (variantFilter.pyx:700-744)
    # makes the typing line — alleles, GT, GL to the last bit — identical.
    golden_path = os.path.join(os.path.dirname(__file__), "goldens",
                               "reference_run", "ref_hla_typing.vcf")
    golden = [l for l in open(golden_path)
              if not l.startswith("#")]
    assert [line + "\n"] == golden
