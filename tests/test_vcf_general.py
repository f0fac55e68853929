"""General VCF 3.3/4.0/4.1 library (io/vcf.py vs reference
src/python/vcf.py:92-953 semantics)."""

import io

import pytest

from platypus_tpu.io.vcf import VCF, VCFError, parse_regions, sortedVCF

V40 = """##fileformat=VCFv4.0
##source=test
##INFO=<ID=TC,Number=1,Type=Integer,Description="Total coverage">
##INFO=<ID=FR,Number=A,Type=Float,Description="Allele frequency">
##INFO=<ID=SOMATIC,Number=0,Type=Flag,Description="Somatic flag">
##FILTER=<ID=badReads,Description="Low quality">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=GL,Number=G,Type=Float,Description="Likelihoods">
##FORMAT=<ID=NR,Number=1,Type=Integer,Description="Reads">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2
chr1\t100\trs1\tA\tG\t60\tPASS\tTC=30;FR=0.5;SOMATIC\tGT:GL:NR\t0/1:-1,0,-2:30\t1|1:-5,-1,0:22
chr1\t200\t.\tCTT\tC\t45\tbadReads\tTC=12;FR=0.25\tGT:GL:NR\t0/1:-1,0,-2:12\t./.:.,.,.:.
"""


def test_v40_typed_parse():
    v = VCF()
    recs = list(v.parse(io.StringIO(V40)))
    assert v.getsamples() == ["S1", "S2"]
    assert ("source", "test") in v.getheader()
    assert v.getinfo()["FR"].numbertype == VCF.NT_ALLELES
    assert v.getformat()["GL"].numbertype == VCF.NT_GENOTYPES

    r = recs[0]
    assert (r["chrom"], r["pos"], r["id"]) == ("chr1", 99, "rs1")  # 0-based
    assert r["info"]["TC"] == [30]
    assert r["info"]["FR"] == [0.5]
    assert r["info"]["SOMATIC"] == []          # Flag
    assert r["filter"] == []                   # PASS -> []
    assert r["S1"]["GT"] == [[0, "/", 1]]
    assert r["S2"]["GT"] == [[1, "|", 1]]
    assert r["S1"]["GL"] == [-1.0, 0.0, -2.0]  # G -> 3 for 1 alt
    assert r["S2"]["NR"] == [22]

    r2 = recs[1]
    assert r2["filter"] == ["badReads"]
    assert r2["ref"] == "CTT" and r2["alt"] == ["C"]
    assert r2["S2"]["GT"] == [[".", "/", "."]]
    assert r2["S2"]["NR"] == [None]            # missing Integer -> None


def test_region_filter_and_parse_regions():
    v = VCF(regions=parse_regions("chr1:150-300"))
    recs = list(v.parse(io.StringIO(V40)))
    assert len(recs) == 1 and recs[0]["pos"] == 199


def test_error_policy():
    bad = V40.replace(
        '##FILTER=<ID=badReads,Description="Low quality">\n', "")
    with pytest.raises(VCFError, match="badReads"):
        list(VCF().parse(io.StringIO(bad)))
    v = VCF()
    v.ignoreerror("FILTER_NOT_DEFINED")
    assert len(list(v.parse(io.StringIO(bad)))) == 2
    v2 = VCF()
    v2.warnerror("FILTER_NOT_DEFINED")
    assert len(list(v2.parse(io.StringIO(bad)))) == 2
    with pytest.raises(ValueError):
        v2.ignoreerror("NO_SUCH_ERROR")


class _FakeRef:
    """fetch() over one fixed chromosome string."""

    def __init__(self, seq):
        self.seq = seq

    def fetch(self, chrom, start, end):
        return self.seq[start:end]


V33 = """##fileformat=VCFv3.3
##INFO=TC,1,Integer,"Total coverage"
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
chr1\t5\t.\tA\tG\t60\t0\tTC=30\tGT\t0/1
chr1\t7\t.\tC\tD2\t60\t0\tTC=30\tGT\t0/1
chr1\t9\t.\tG\tIAA\t60\t0\tTC=30\tGT\t0/1
"""


def test_v33_allele_conversion():
    #        123456789012
    ref = _FakeRef("TTTTACCTGGTT")
    v = VCF(reference=ref)
    recs = list(v.parse(io.StringIO(V33)))
    # SNP stays a SNP.
    assert (recs[0]["ref"], recs[0]["alt"]) == ("A", ["G"])
    # D2 at 1-based 7 deletes CT; padded with the leading base (pos 5).
    assert recs[1]["pos"] == 5
    assert (recs[1]["ref"], recs[1]["alt"]) == ("CCT", ["C"])
    # IAA inserts AA after 1-based 9.
    assert (recs[2]["ref"], recs[2]["alt"]) == ("G", ["GAA"])


def test_v33_named_deletion_without_reference():
    """A v3.3 D<seq> allele with NO reference FASTA parses without error:
    the unmatched-deletion check applies only to freshly-fetched extension
    bases, and an all-N fetch (no FASTA) is not evidence of a mismatch."""
    text = ("##fileformat=VCFv3.3\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "chr1\t100\t.\tA\tDAG\t60\t0\t.\tGT\t0/1\n")
    recs = list(VCF().parse(io.StringIO(text)))
    assert len(recs) == 1
    # Deletion of 2 bases: REF extended with N, anchor base prepended.
    assert len(recs[0]["ref"]) == len(recs[0]["alt"][0]) + 2


def test_v33_converted_alleles_still_anchor_checked():
    """Zero-length / indel-anchor validation applies to v3.3 records after
    conversion, same as the old parser ran it for every version."""
    ref = _FakeRef("TTTTACCTGGTT")
    # D2 at pos 7 deletes CT -> padded alleles pass the anchor check.
    v = VCF(reference=ref)
    recs = list(v.parse(io.StringIO(V33)))
    for r in recs:
        for a in r["alt"]:
            if len(a) != len(r["ref"]):
                assert a[:1] == r["ref"][:1]


def test_trailing_base_trim_and_compare():
    vcf_text = (
        "##fileformat=VCFv4.0\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "chr1\t10\t.\tTACA\tTA\t50\t.\t.\tGT\t0/1\n")
    r = next(VCF().parse(io.StringIO(vcf_text)))
    assert (r["ref"], r["alt"]) == ("TAC", ["T"])  # shared trailing A trimmed
    v = VCF()
    assert v.compare_calls(9, "TAC", "T", 9, "TACA", "TA")
    assert not v.compare_calls(9, "TAC", "T", 10, "TAC", "T")
    assert not v.compare_calls(9, "T", "TG", 9, "T", "TC")
    # Reference semantics: only the trimmed ALTs are compared — two
    # deletions of different bases at one pos with the same ALT are equal.
    assert v.compare_calls(9, "TAC", "T", 9, "TAG", "T")


def test_write_round_trip():
    v = VCF()
    recs = list(v.parse(io.StringIO(V40)))
    out = io.StringIO()
    v.write(out, recs)
    v2 = VCF()
    recs2 = list(v2.parse(io.StringIO(out.getvalue())))
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        for key in ("chrom", "pos", "ref", "alt", "filter"):
            assert a[key] == b[key]
        assert a["info"]["TC"] == b["info"]["TC"]
        assert a["S1"]["GT"] == b["S1"]["GT"]


def test_sorted_vcf_orders_chromosomes():
    text = (
        "##fileformat=VCFv4.0\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "chr10\t5\t.\tA\tG\t50\t.\t.\tGT\t0/1\n"
        "chr2\t9\t.\tC\tT\t50\t.\t.\tGT\t0/1\n"
        "chr2\t3\t.\tG\tA\t50\t.\t.\tGT\t0/1\n"
        "chrX\t1\t.\tT\tC\t50\t.\t.\tGT\t0/1\n")
    sv = sortedVCF()
    recs = list(sv.parse(io.StringIO(text)))
    order = [(r["chrom"], r["pos"]) for r in recs]
    assert order == [("chr2", 2), ("chr2", 8), ("chr10", 4), ("chrX", 0)]
    # Region access after load.
    sub = list(sv.parse(None, region=("chr2", 0, 5)))
    assert [(r["chrom"], r["pos"]) for r in sub] == [("chr2", 2)]


def test_v41_symbolic_del_allowed():
    text = (
        "##fileformat=VCFv4.1\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "chr1\t10\t.\tT\t<DEL>\t50\t.\t.\tGT\t0/1\n")
    r = next(VCF().parse(io.StringIO(text)))
    assert r["alt"] == ["<DEL>"]
    with pytest.raises(VCFError, match="V40_BAD_ALLELE"):
        next(VCF().parse(io.StringIO(text.replace("VCFv4.1", "VCFv4.0"))))
