"""Extended full-window goldens: the wider reference output surface
(VERDICT r2 item 3), pinned against the compiled-C + transcribed-formula
oracle (tests/reference_oracle.py + reference_oracle_ext.py).

Fourteen window classes on one deterministic fixture:

  W1  het SNP                     W8  complex replacement (2bp -> 3bp)
  W2  hom-alt SNP                 W9  assembler-sourced 16bp deletion
  W3  het 2bp deletion            W10 strand-bias FILTER-failing SNP
  W4  het 3bp MNP                 W11 REFCALL blocks (quiet covered span)
  W5  multi-allelic SNP (GT 1/2)  W12 multi-sample (3 samples) het SNP
  W6  cis pair of interacting SNPs W13 1bp insertion in a 10bp homopolymer
  W7  1bp deletion in a 12bp homopolymer  W14 --sourceFile FILE variant

Pinned two ways, like tests/test_reference_golden.py:
* the engine's full VCF data lines equal the checked-in golden byte for
  byte (runs everywhere);
* the oracle recomputes QUAL/GT (and SbPval / REFCALL qual) for every
  covered window from the COMPILED reference align.c/tandem.c plus
  transcribed reference math, and must agree with the pinned numbers
  (needs /root/reference + gcc).

Regenerate with tools/make_reference_window_golden_ext.py after
intentional behaviour changes.
"""

import json
import os
import shutil

import numpy as np
import pytest

from synth import SimHaplotype, make_reference, write_synth_bam

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "ref_window_golden_ext.json")

REF_SEED = 20260819
REF_LEN = 14400
READ_LEN = 120
COVERAGE = 40

SNP_HET_POS = 1200
SNP_HOM_POS = 2000
DEL_HET_POS = 2800
MNP_POS = 3600
MULTI_POS = 4400
CIS_POS_A, CIS_POS_B = 5200, 5212
HP_START, HP_LEN = 6000, 12          # injected A-run
HP_DEL_POS = 6005                    # 1bp del inside the run
COMPLEX_POS = 6800
ASM_DEL_POS = 7600
ASM_DEL_LEN = 16
SB_POS = 8400
REFCALL_LO, REFCALL_HI = 9150, 10450
MS_POS = 11000
FILE_POS = 11600                     # --sourceFile-provided het SNP
TRANS_A, TRANS_B = 12200, 12212
HP2_START, HP2_LEN = 12800, 10       # injected T-run
HP2_INS_POS = 12804                  # 1bp insertion inside the run


def _alt(ref_seq, pos, avoid=()):
    for b in b"ACGT":
        if b != ref_seq[pos] and b not in avoid:
            return bytes([b])
    raise AssertionError


def _mnp_alt(ref_seq, pos, n):
    return b"".join(_alt(ref_seq, pos + i) for i in range(n))


def make_ext_reference(tmp):
    """Random reference with a homopolymer run injected at HP_START."""
    ref_path, ref_seq = make_reference(tmp, length=REF_LEN, seed=REF_SEED)
    seq = ref_seq.copy()
    seq[HP_START:HP_START + HP_LEN] = ord("A")
    # Break any accidental run extension at the boundaries.
    seq[HP_START - 1] = ord("C")
    seq[HP_START + HP_LEN] = ord("G")
    seq[HP2_START:HP2_START + HP2_LEN] = ord("T")
    seq[HP2_START - 1] = ord("G")
    seq[HP2_START + HP2_LEN] = ord("C")
    text = seq.tobytes().decode()
    with open(ref_path, "w") as fh:
        fh.write(">chr20\n")
        for i in range(0, REF_LEN, 60):
            fh.write(text[i:i + 60] + "\n")
    from platypus_tpu.io.fasta import build_index

    build_index(ref_path)
    return ref_path, seq


def _cluster(haps, pos, tag, n=COVERAGE, read_len=READ_LEN, qual=35,
             mapq=60, flag=0, start_shift=0):
    """n exact reads at staggered pairwise-distinct starts, all spanning
    [pos-32, pos+10] (same recipe as test_reference_golden._cluster)."""
    reads = []
    for i in range(n):
        ref_start = pos - 110 + start_shift + 2 * i
        hap = haps[i % len(haps)]
        hap_start = hap.hap_pos_of(ref_start)
        assert hap_start is not None
        seq = hap.seq[hap_start:hap_start + read_len]
        bam_pos, cigar = hap.cigar_for(hap_start, read_len)
        reads.append(dict(name=f"{tag}_r{i}", ref_id=0, pos=bam_pos,
                          mapq=mapq, flag=flag, cigar=cigar, seq=seq,
                          qual=[qual] * read_len))
    return reads


def _tiling(hap, lo, hi, tag, step=7, read_len=READ_LEN, qual=35):
    """Continuous even coverage across [lo, hi] (for REFCALL blocks)."""
    reads = []
    i = 0
    for start in range(lo - read_len + 20, hi, step):
        hap_start = hap.hap_pos_of(start)
        if hap_start is None:
            continue
        seq = hap.seq[hap_start:hap_start + read_len]
        bam_pos, cigar = hap.cigar_for(hap_start, read_len)
        reads.append(dict(name=f"{tag}_r{i}", ref_id=0, pos=bam_pos, mapq=60,
                          flag=0, cigar=cigar, seq=seq,
                          qual=[qual] * read_len))
        i += 1
    return reads


def window_variants(fx):
    """The fixture's expected variants per oracle-covered window:
    window tag -> (variants [(pos, removed, added)], samples-with-reads)."""
    return fx["oracle_windows"]


def build_fixture_ext(tmp):
    tmp = str(tmp)
    ref_path, ref_seq = make_ext_reference(tmp)
    ref_hap = SimHaplotype(ref_seq, [])

    def V(pos, n_removed, added):
        return (pos, bytes(ref_seq[pos:pos + n_removed]), added)

    v_snp_het = V(SNP_HET_POS, 1, _alt(ref_seq, SNP_HET_POS))
    v_snp_hom = V(SNP_HOM_POS, 1, _alt(ref_seq, SNP_HOM_POS))
    v_del_het = V(DEL_HET_POS, 2, b"")
    v_mnp = V(MNP_POS, 3, _mnp_alt(ref_seq, MNP_POS, 3))
    v_multi_1 = V(MULTI_POS, 1, _alt(ref_seq, MULTI_POS))
    v_multi_2 = V(MULTI_POS, 1, _alt(ref_seq, MULTI_POS,
                                     avoid=(v_multi_1[2][0],)))
    v_cis_a = V(CIS_POS_A, 1, _alt(ref_seq, CIS_POS_A))
    v_cis_b = V(CIS_POS_B, 1, _alt(ref_seq, CIS_POS_B))
    # 1bp deletion inside the A-run; left-normalises to the run start.
    v_hp_del = V(HP_DEL_POS, 1, b"")
    v_complex = V(COMPLEX_POS, 2, _mnp_alt(ref_seq, COMPLEX_POS, 2) + b"A")
    v_asm_del = V(ASM_DEL_POS, ASM_DEL_LEN, b"")
    v_sb = V(SB_POS, 1, _alt(ref_seq, SB_POS))
    v_ms = V(MS_POS, 1, _alt(ref_seq, MS_POS))
    # The cis pair merges (identical spliced sequence) with the assembler's
    # single 13bp replacement, which wins on prior product
    # (variantcaller.pyx:325-390); the emitted record is the replacement.
    v_cis_merged = (CIS_POS_A,
                    bytes(ref_seq[CIS_POS_A:CIS_POS_B + 1]),
                    v_cis_a[2] + bytes(ref_seq[CIS_POS_A + 1:CIS_POS_B])
                    + v_cis_b[2])

    def sim(v):
        return SimHaplotype(ref_seq, [(v[0], len(v[1]), v[2])])

    reads_s1 = []
    reads_s1 += _cluster([sim(v_snp_het), ref_hap], SNP_HET_POS, "het_snp")
    reads_s1 += _cluster([sim(v_snp_hom)], SNP_HOM_POS, "hom_snp")
    reads_s1 += _cluster([sim(v_del_het), ref_hap], DEL_HET_POS, "het_del")
    reads_s1 += _cluster([sim(v_mnp), ref_hap], MNP_POS, "mnp")
    reads_s1 += _cluster([sim(v_multi_1), sim(v_multi_2)], MULTI_POS, "multi")
    cis_hap = SimHaplotype(ref_seq, [(v_cis_a[0], 1, v_cis_a[2]),
                                     (v_cis_b[0], 1, v_cis_b[2])])
    reads_s1 += _cluster([cis_hap, ref_hap], CIS_POS_A, "cis")
    reads_s1 += _cluster([sim(v_hp_del), ref_hap], HP_DEL_POS, "hp_del")
    reads_s1 += _cluster([sim(v_complex), ref_hap], COMPLEX_POS, "complex")
    # Assembler case: the deletion-carrying reads are mate-unmapped
    # (flag 0x1|0x8), which routes them to the bad pile WITHOUT the QCFail
    # flag (cwindow.pyx:367-371 sets no flag for mate filters) — exactly
    # the reads the reference assembler consumes (assembler.pyx:1414-1418)
    # while the CIGAR scan (good reads only) never sees the event.  They
    # still enter the likelihood arrays, so the genotype is called.
    reads_s1 += _cluster([ref_hap], ASM_DEL_POS, "asm_ref", n=20)
    reads_s1 += _cluster([sim(v_asm_del)], ASM_DEL_POS, "asm_del", n=20,
                         flag=0x1 | 0x8, start_shift=1)
    # Strand bias: alt reads all forward, ref reads all reverse and more
    # numerous (nFwd < nRev flips the test to the reverse counts, where the
    # variant has zero support -> tiny beta-binomial CDF).
    reads_s1 += _cluster([sim(v_sb)], SB_POS, "sb_alt", n=20)
    reads_s1 += _cluster([ref_hap], SB_POS, "sb_ref", n=24, flag=16,
                         start_shift=1)
    # REFCALL: continuous quiet coverage.
    reads_s1 += _tiling(ref_hap, REFCALL_LO, REFCALL_HI, "quiet")
    # Multi-sample window: S1 contributes ref reads too.
    reads_s1 += _cluster([ref_hap], MS_POS, "ms_s1")
    # Trans pair: two SNPs 12bp apart on DIFFERENT haplotypes -> one window,
    # two variant lines, no ref haplotype in the best genotype.
    v_trans_a = V(TRANS_A, 1, _alt(ref_seq, TRANS_A))
    v_trans_b = V(TRANS_B, 1, _alt(ref_seq, TRANS_B))
    reads_s1 += _cluster([sim(v_trans_a), sim(v_trans_b)], TRANS_A, "trans")
    # --sourceFile het SNP: provided via a bgzip+tabix VCF AND supported by
    # reads (Source=File|Platypus merge, variantutils.py path).
    v_file = V(FILE_POS, 1, _alt(ref_seq, FILE_POS))
    reads_s1 += _cluster([sim(v_file), ref_hap], FILE_POS, "filevar")
    # 1bp insertion inside the T-run; left-normalises to the run start.
    v_hp_ins = (HP2_INS_POS, b"", b"T")
    hp_ins_hap = SimHaplotype(ref_seq, [(HP2_INS_POS, 0, b"T")])
    reads_s1 += _cluster([hp_ins_hap, ref_hap], HP2_INS_POS, "hp_ins")
    reads_s1.sort(key=lambda r: r["pos"])
    bam1 = write_synth_bam(tmp, reads_s1, ref_len=REF_LEN, sample="S1",
                           filename="reads_s1.bam")

    # S2/S3 also tile the quiet span: the REFCALL minimum coverage is the
    # min over ALL samples' buffers (variantcaller.pyx:778-784), so quiet
    # blocks only get a nonzero qual when every sample covers them.
    reads_s2 = sorted(_cluster([sim(v_ms), ref_hap], MS_POS, "ms_s2")
                      + _tiling(ref_hap, REFCALL_LO, REFCALL_HI, "quiet2"),
                      key=lambda r: r["pos"])
    bam2 = write_synth_bam(tmp, reads_s2, ref_len=REF_LEN, sample="S2",
                           filename="reads_s2.bam")
    reads_s3 = sorted(_cluster([ref_hap], MS_POS, "ms_s3")
                      + _tiling(ref_hap, REFCALL_LO, REFCALL_HI, "quiet3"),
                      key=lambda r: r["pos"])
    bam3 = write_synth_bam(tmp, reads_s3, ref_len=REF_LEN, sample="S3",
                           filename="reads_s3.bam")

    # bgzip+tabix source VCF carrying the FILE variant (variantutils.py
    # path: the engine merges it with the read-derived candidate).
    from platypus_tpu.io.tabix import write_tabix_vcf

    source_vcf = f"{tmp}/source.vcf.gz"
    ref_base = chr(ref_seq[FILE_POS])
    write_tabix_vcf(
        ["##fileformat=VCFv4.0\n",
         "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n",
         f"chr20\t{FILE_POS + 1}\t.\t{ref_base}\t{v_file[2].decode()}"
         "\t100\tPASS\t.\n"],
        source_vcf)

    oracle_windows = {
        "het_snp": ([v_snp_het], {"S1": [r for r in reads_s1 if r["name"].startswith("het_snp")]}),
        "hom_snp": ([v_snp_hom], {"S1": [r for r in reads_s1 if r["name"].startswith("hom_snp")]}),
        "het_del": ([v_del_het], {"S1": [r for r in reads_s1 if r["name"].startswith("het_del")]}),
        "mnp": ([v_mnp], {"S1": [r for r in reads_s1 if r["name"].startswith("mnp")]}),
        "multi": ([v_multi_1, v_multi_2], {"S1": [r for r in reads_s1 if r["name"].startswith("multi")]}),
        "cis": ([v_cis_a, v_cis_b, v_cis_merged],
                {"S1": [r for r in reads_s1 if r["name"].startswith("cis")]}),
        "trans": ([v_trans_a, v_trans_b],
                  {"S1": [r for r in reads_s1 if r["name"].startswith("trans")]}),
        "hp_del": ([v_hp_del], {"S1": [r for r in reads_s1 if r["name"].startswith("hp_del")]}),
        "complex": ([v_complex], {"S1": [r for r in reads_s1 if r["name"].startswith("complex")]}),
        "asm": ([v_asm_del], {"S1": [r for r in reads_s1 if r["name"].startswith("asm_")]}),
        "ms": ([v_ms], {"S1": [r for r in reads_s1 if r["name"].startswith("ms_s1")],
                        "S2": [r for r in reads_s2 if r["name"].startswith("ms_s2")],
                        "S3": [r for r in reads_s3 if r["name"].startswith("ms_s3")]}),
        "file": ([v_file], {"S1": [r for r in reads_s1 if r["name"].startswith("filevar")]}),
        "hp_ins": ([v_hp_ins], {"S1": [r for r in reads_s1 if r["name"].startswith("hp_ins")]}),
    }
    return dict(ref_path=ref_path, ref_seq=ref_seq,
                bam_paths=[bam1, bam2, bam3], source_vcf=source_vcf,
                reads_s1=reads_s1, reads_s2=reads_s2, reads_s3=reads_s3,
                oracle_windows=oracle_windows)


def engine_vcf_lines(tmp, fx):
    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import run_single_process

    out = os.path.join(str(tmp), "golden_ext_out.vcf")
    config = PlatypusConfig(bam_files=fx["bam_paths"], ref_file=fx["ref_path"],
                            output=out, regions=["chr20:1001-13200"],
                            assemble=1, output_ref_calls=1,
                            ref_call_block_size=300,
                            source_file=[fx["source_vcf"]])
    run_single_process(config, [("chr20", 1000, 13200)], out)
    with open(out) as fh:
        return [ln.rstrip("\n") for ln in fh if not ln.startswith("#")]


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def fixture_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refgolden_ext")
    fx = build_fixture_ext(tmp)
    fx["vcf_lines"] = engine_vcf_lines(tmp, fx)
    return fx


def test_engine_matches_pinned_vcf(fixture_run, golden):
    assert fixture_run["vcf_lines"] == golden["vcf_lines"]


def _lines_at(lines, pos1):
    return [l for l in lines if int(l.split("\t")[1]) == pos1
            and "REFCALL" not in l]


def test_expected_windows_present(golden):
    lines = golden["vcf_lines"]
    for pos in (SNP_HET_POS, SNP_HOM_POS, MNP_POS, MULTI_POS, CIS_POS_A,
                COMPLEX_POS, SB_POS, MS_POS, FILE_POS):
        assert _lines_at(lines, pos + 1), f"no call at {pos + 1}"
    # FILE variant carries the merged source bitmask.
    filevar = _lines_at(lines, FILE_POS + 1)[0]
    assert "File" in filevar.split("\t")[7]
    # Homopolymer insertion present (left-normalised into/at the T-run).
    hp_ins = [l for l in lines
              if HP2_START - 2 <= int(l.split("\t")[1]) <= HP2_INS_POS + 2
              and len(l.split("\t")[4].split(",")[0]) > len(l.split("\t")[3])]
    assert hp_ins, "homopolymer insertion missing"
    # The cis SNP pair merges (identical spliced sequence) with the
    # assembler's single replacement spanning both, which wins on prior
    # product (variantcaller.pyx:325-390) — one record covering A..B.
    cis = _lines_at(lines, CIS_POS_A + 1)[0].split("\t")
    assert len(cis[3]) == CIS_POS_B - CIS_POS_A + 1
    # Multi-allelic: two ALTs on one line.
    multi = _lines_at(lines, MULTI_POS + 1)[0].split("\t")
    assert "," in multi[4]
    # Strand-bias FILTER fires.
    sb = _lines_at(lines, SB_POS + 1)[0].split("\t")
    assert "strandBias" in sb[6]
    # Assembler-sourced deletion (left-aligned near ASM_DEL_POS).
    asm = [l for l in lines
           if abs(int(l.split("\t")[1]) - (ASM_DEL_POS + 1)) <= ASM_DEL_LEN
           and "Assembler" in l.split("\t")[7]]
    assert asm, "assembler-sourced deletion missing"
    # REFCALL blocks exist inside the quiet span with nonzero QUAL.
    refcalls = [l for l in lines if "REFCALL" in l
                and REFCALL_LO <= int(l.split("\t")[1]) <= REFCALL_HI]
    assert refcalls
    assert any(float(l.split("\t")[5]) > 0 for l in refcalls)
    # Homopolymer deletion present (left-normalised into/at the run).
    hp = [l for l in lines
          if HP_START - 2 <= int(l.split("\t")[1]) <= HP_DEL_POS + 2
          and len(l.split("\t")[3]) > len(l.split("\t")[4].split(",")[0])]
    assert hp, "homopolymer deletion missing"


_have_oracle = shutil.which("gcc") and os.path.exists(
    os.environ.get("REFERENCE_DIR", "/root/reference") + "/src/c/align.c")


@pytest.mark.skipif(not _have_oracle, reason="reference tree or gcc missing")
def test_oracle_reproduces_pinned(fixture_run, golden):
    """Recompute QUAL/GT per oracle-covered window from the compiled
    reference kernels + transcribed math; compare with the pinned entries
    AND the pinned VCF lines."""
    import reference_oracle_ext as ox

    fx = fixture_run
    pinned = golden["oracle"]
    for tag, (variants, reads_by_sample) in window_variants(fx).items():
        entry = pinned[tag]
        res = ox.call_window_multi(np.asarray(fx["ref_seq"]), variants,
                                   {s: r for s, r in reads_by_sample.items()},
                                   mapq=60)
        for v, want in zip(variants, entry["variants"]):
            got = res["variants"][v]
            assert got["phred"] == want["phred"], (tag, v, got, want)
        # Cross-check the emitted line's QUAL: equal to the oracle within
        # 1 phred (the oracle sums read GLs sequentially like the
        # reference C; the engine uses numpy pairwise association, which
        # can flip an integer rounding boundary).  Byte-drift of the
        # engine itself is caught by test_engine_matches_pinned_vcf.
        pos = variants[0][0]
        emitted = [l for l in fx["vcf_lines"]
                   if int(l.split("\t")[1]) in (pos, pos + 1)
                   and "REFCALL" not in l]
        if emitted:
            got_qual = int(float(emitted[0].split("\t")[5]))
            want_qual = max(v["phred"] for v in entry["variants"]
                            if v["pos"] + 1 == int(emitted[0].split("\t")[1])
                            or v["pos"] == int(emitted[0].split("\t")[1]))
            assert abs(got_qual - want_qual) <= 1, (tag, got_qual, want_qual)
        hap_sets = [frozenset(map(tuple, hs)) for hs in res["hap_sets"]]
        for s_idx, want_gt in enumerate(entry["gt"]):
            pair = res["best_geno"][s_idx]
            # Reconstruct the canonical GT per pinned variant position.
            pos = variants[0][0]
            vars_at = [v for v in variants if v[0] == pos]
            got_gt = ox.gt_string(pair, [list(map(tuple, hs)) for hs in res["hap_sets"]],
                                  vars_at)
            assert got_gt == want_gt, (tag, s_idx, got_gt, want_gt)


@pytest.mark.skipif(not _have_oracle, reason="reference tree or gcc missing")
def test_oracle_strand_bias_and_refcall(fixture_run, golden):
    """SbPval of the strand-bias site and the REFCALL qual recompute from
    the transcribed reference formulas and match the pinned VCF fields."""
    import reference_oracle_ext as ox

    lines = fixture_run["vcf_lines"]
    sb_line = _lines_at(lines, SB_POS + 1)[0]
    info = dict(kv.split("=") for kv in sb_line.split("\t")[7].split(";")
                if "=" in kv)
    n_fwd, n_rev = int(info["TCF"]), int(info["TCR"])
    n_fwd_var, n_rev_var = int(info["NF"]), int(info["NR"])
    want = round(ox.strand_bias_pvalue(n_fwd, n_rev, n_fwd_var, n_rev_var), 2)
    assert float(info["SbPval"]) == want

    # REFCALL qual == transcribed beta-binomial formula at the block's
    # minimum coverage (recomputed from the fixture reads).
    refcalls = [l for l in lines if "REFCALL" in l
                and REFCALL_LO <= int(l.split("\t")[1]) <= REFCALL_HI
                and float(l.split("\t")[5]) > 0]
    line = refcalls[len(refcalls) // 2].split("\t")
    start1 = int(line[1])
    endinfo = dict(kv.split("=") for kv in line[7].split(";") if "=" in kv)
    end = int(endinfo["END"])
    def cov(reads, p):
        return sum(1 for r in reads
                   if r["pos"] <= p < r["pos"] + sum(
                       ln for op, ln in r["cigar"] if op in (0, 2, 7, 8)))

    fx = fixture_run
    min_cov = min(
        min(cov(fx["reads_s1"], p), cov(fx["reads_s2"], p),
            cov(fx["reads_s3"], p))
        for p in range(start1 - 1, end))
    assert int(float(line[5])) == ox.refcall_qual(min_cov)
