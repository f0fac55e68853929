"""Tests for tabix random access and the source-VCF candidate reader,
using the bundled HLA-A haplotype fixture."""

import pytest

from platypus_tpu.candidates.variant import FILE_VAR
from platypus_tpu.io.tabix import TabixFile
from platypus_tpu.io.vcfsource import VariantCandidateReader

HLA_VCF = "/root/reference/test/HLA_A_alignment_hapsREF.vcf.gz"


def test_tabix_fetch_region():
    with TabixFile(HLA_VCF) as t:
        assert t.index.names == ["6"]
        recs = list(t.fetch("6", 29910000, 29913000))
        assert len(recs) > 1000
        for cols in recs[:50]:
            pos = int(cols[1])
            assert 29910000 < pos <= 29913001
        # Records outside the region are excluded.
        none = list(TabixFile(HLA_VCF).fetch("6", 1000, 2000))
        assert none == []


def test_tabix_fetch_matches_full_text():
    import gzip

    with gzip.open(HLA_VCF, "rt") as fh:
        all_lines = [l.split("\t") for l in fh if not l.startswith("#")]
    start, end = 29911000, 29912000
    expected = [
        l for l in all_lines
        if int(l[1]) - 1 < end and int(l[1]) - 1 + len(l[3]) > start
    ]
    with TabixFile(HLA_VCF) as t:
        got = list(t.fetch("6", start, end))
    assert len(got) == len(expected)
    assert [g[1] for g in got] == [e[1] for e in expected]


def test_variant_reader_long_haps():
    r = VariantCandidateReader([HLA_VCF], long_haps=True)
    vs = r.variants("6", 29910000, 29913000)
    assert len(vs) > 1000
    assert all(v.var_source == FILE_VAR for v in vs)
    # long replacement alleles are kept whole
    assert any(v.n_added != v.n_removed and v.n_added > 50 for v in vs)
    # sorted by coordinate
    assert all(vs[i].ref_pos <= vs[i + 1].ref_pos for i in range(len(vs) - 1))
    r.close()


def test_variant_reader_decomposed():
    r = VariantCandidateReader([HLA_VCF], long_haps=False)
    vs = r.variants("6", 29910300, 29910500)
    assert vs
    # MNP trimming removes shared context: no variant keeps identical
    # leading ref/alt bases.
    # MNPs (length > 1) get shared context trimmed off both ends; plain SNP
    # lines pass through verbatim (even degenerate ref==alt ones, matching
    # the reference reader's SNP branch).
    for v in vs:
        if v.n_added == v.n_removed and v.n_added > 1:
            assert v.added[0] != v.removed[0]
            assert v.added[-1] != v.removed[-1]
    r.close()
