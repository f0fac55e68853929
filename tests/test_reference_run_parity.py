"""Parity against the RUNNING reference (VERDICT r3 item 4, r4/r5 growth).

tests/goldens/reference_run/ holds VCFs produced by actually executing the
reference Platypus 0.8.1 release on this machine (the py3 harness in
tools/reference_harness/ — see docs/REFERENCE_RUN.md).  These tests call
the same re-hosted S55 real-read islands (and the full 10 Mb synthetic
set) through this repo's CLI and pin the agreement level:

* islands 0, 1, 2: byte-identical data lines (the pinned files happen to
  match this repo's sorted FILTER order);
* all five islands, --filterDuplicates=0, and five record-multiplying
  round-5 configurations (sensitive/refcalls/assemble/lowqual/dense):
  zero field-value differences with NO allowlisted sites — FILTER is
  compared as a set because the reference emits py2 set-iteration order,
  which permutes run to run in the reference itself;
* the 10 Mb / 9999-record synthetic set: byte-identical data lines.
"""

import os
import subprocess
import sys

import pytest

from s55util import S55, build_s55_full

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                          "reference_run")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    d = {}
    for line in open(path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        d[(f[0], int(f[1]), f[3], f[4])] = f
    return d


def _diff_sites(ref, mine, rel_tol=2e-5):
    """Sites with any non-FILTER-order, non-formatting difference."""
    bad = set()
    for k in set(ref) ^ set(mine):
        bad.add((k[0], k[1]))
    for k in set(ref) & set(mine):
        a, b = ref[k], mine[k]
        site = (k[0], k[1])
        fields = [(a[5], b[5])]
        ia = dict(x.split("=", 1) for x in a[7].split(";") if "=" in x)
        ib = dict(x.split("=", 1) for x in b[7].split(";") if "=" in x)
        for key in set(ia) | set(ib):
            fields.append((ia.get(key), ib.get(key)))
        if set(a[6].split(";")) != set(b[6].split(";")):
            bad.add(site)
        for col in range(9, min(len(a), len(b))):
            for x, y in zip(a[col].split(":"), b[col].split(":")):
                fields.append((x, y))
        for x, y in fields:
            if x == y:
                continue
            if x is None or y is None:
                bad.add(site)
                continue
            try:
                xs, ys = x.split(","), y.split(",")
                if len(xs) != len(ys):
                    bad.add(site)
                    continue
                for xi, yi in zip(xs, ys):
                    if abs(float(xi) - float(yi)) > rel_tol * max(1.0, abs(float(xi))):
                        bad.add(site)
            except ValueError:
                bad.add(site)
    return bad


@pytest.fixture(scope="module")
def s55_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refrun")
    fx = build_s55_full(str(tmp))
    outs = {}
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    for i in range(5):
        out = str(tmp / f"mine_island{i}.vcf")
        subprocess.run(
            [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
             f"--bamFiles={fx['bam']}", f"--refFile={fx['ref']}",
             f"--regions=HLA_island_{i}", "--nCPU=1", "-o", out],
            check=True, capture_output=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        outs[i] = out
    return outs


# Goldens regenerated from a clean `build_reference.sh` build (the first
# pinning used a mid-bring-up build that silently lost two MNP-class
# records).  The committed harness is deterministic: identical output
# across PYTHONHASHSEED 0-3 and across launcher revisions — except FILTER
# order, which is py2/py3 set-iteration order and varies run to run in
# the reference itself (this repo emits sorted order; the pinned files
# happen to match it on islands 0/1/2 and permute 5 records on 3/4).

@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
@pytest.mark.parametrize("island", [0, 1, 2])
def test_islands_byte_identical_to_running_reference(s55_fixture, island):
    golden = [l for l in open(os.path.join(GOLDEN_DIR,
                                           f"ref_s55_island{island}.vcf"))
              if not l.startswith("#")]
    mine = [l for l in open(s55_fixture[island]) if not l.startswith("#")]
    assert mine == golden


@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
def test_nofilterdups_byte_identical_to_running_reference(s55_fixture,
                                                          tmp_path):
    """--filterDuplicates=0 over the whole S55 corpus, byte-compared to the
    running reference (golden ref_s55_noFilterDups.vcf, 377 records).

    Regression: keeping the duplicate read shifts the bad-pile layout so
    an unmapped mate (zero cigar ops) lands at the END of a pile, which
    crashed CigarRefs.single_m_mask's offset gather and silently dropped
    two windows (island 1 4728/4846) via window crash containment."""
    fx = build_s55_full(str(tmp_path))
    out = str(tmp_path / "nodups.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         f"--bamFiles={fx['bam']}", f"--refFile={fx['ref']}",
         "--filterDuplicates=0", "--nCPU=1", "-o", out],
        check=True, capture_output=True, env=env, cwd=REPO)
    golden = [l for l in open(os.path.join(GOLDEN_DIR,
                                           "ref_s55_noFilterDups.vcf"))
              if not l.startswith("#")]
    mine = [l for l in open(out) if not l.startswith("#")]
    assert mine == golden


@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
@pytest.mark.parametrize("island", [0, 1, 2, 3, 4])
def test_all_islands_value_parity_no_allowances(s55_fixture, island):
    """Every record at every site on every island: same (pos, ref, alt),
    same QUAL/INFO/FORMAT values, FILTER equal as a set."""
    ref = _load(os.path.join(GOLDEN_DIR, f"ref_s55_island{island}.vcf"))
    mine = _load(s55_fixture[island])
    bad = _diff_sites(ref, mine)
    assert not bad, sorted(bad)


# --- round-5 corpus growth: the whole S55 corpus under record-multiplying
# configurations, each byte-compared to the RUNNING reference with zero
# allowances beyond FILTER order (the py2 set-iteration artifact — FILTER
# is compared with its entries sorted on both sides).  2394 additional
# real-read records vs the 357 default-island set (~6.7x growth):
# sensitive 474, refcalls 695, assemble 324, lowqual 489, dense 412.
# Goldens: tools/reference_harness on /tmp/refbuild (docs/REFERENCE_RUN.md).
S55_CONFIGS = {
    "sensitive": ["--minPosterior=1", "--minReads=1"],
    "flank": ["--minFlank=5", "--minPosterior=1", "--minReads=1"],
    "hapcap": ["--maxHaplotypes=20", "--minPosterior=1", "--minReads=1"],
    "bigwin": ["--maxSize=3000", "--largeWindows=1", "--minPosterior=1",
               "--minReads=1"],
    "deep": ["--minReads=5"],
    "strict": ["--minMapQual=30", "--minBaseQual=25"],
    "refcalls": ["--outputRefCalls=1"],
    "assemble": ["--assemble=1"],
    "lowqual": ["--minBaseQual=10", "--minPosterior=1", "--minReads=1"],
    "dense": ["--maxVariants=12", "--minPosterior=1", "--minReads=1",
              "--assemble=1"],
}


def _filter_sorted_lines(path):
    out = []
    for line in open(path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        f[6] = ";".join(sorted(f[6].split(";")))
        out.append("\t".join(f))
    return out


@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
@pytest.mark.parametrize("config", sorted(S55_CONFIGS))
def test_s55_config_corpus_byte_identical(config, tmp_path):
    fx = build_s55_full(str(tmp_path))
    out = str(tmp_path / f"{config}.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         f"--bamFiles={fx['bam']}", f"--refFile={fx['ref']}",
         "--nCPU=1", "-o", out] + S55_CONFIGS[config],
        check=True, capture_output=True, env=env, cwd=REPO)
    golden = _filter_sorted_lines(
        os.path.join(GOLDEN_DIR, f"ref_s55_{config}.vcf"))
    mine = _filter_sorted_lines(out)
    assert mine == golden


MB10_BAM = "/tmp/platypus_tpu_scaling/mb10/reads.bam"


def test_synth_10mb_byte_identical_to_running_reference(tmp_path):
    """Full 10 Mb / 3.0 M reads / 9999 records byte-parity with the
    RUNNING reference (golden ref_synth_10mb.vcf.gz).  The cached mb10
    dataset is built on demand (deterministic; ~1 min on a fresh box) so
    this — the strongest parity evidence — cannot silently skip."""
    import gzip

    if not os.path.exists(MB10_BAM):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"),
             "--mb", "10", "--ncpus", "1"],
            check=True, capture_output=True, cwd=REPO, timeout=1800,
            env=dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu",
                     JAX_PLATFORMS="cpu"))
        assert os.path.exists(MB10_BAM), (
            "mb10 dataset build failed; run: python tools/scaling_bench.py "
            "--mb 10 --ncpus 1")

    out = str(tmp_path / "mine_10mb.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         f"--bamFiles={MB10_BAM}",
         "--refFile=/tmp/platypus_tpu_scaling/mb10/ref.fa",
         "--regions=chr20:1-10000001", "--nCPU=1", "-o", out],
        check=True, capture_output=True, env=env, cwd=REPO)
    golden = [l for l in gzip.open(
        os.path.join(GOLDEN_DIR, "ref_synth_10mb.vcf.gz"), "rt")
        if not l.startswith("#")]
    mine = [l for l in open(out) if not l.startswith("#")]
    assert mine == golden


@pytest.mark.skipif(not os.path.exists(S55), reason="reference S55 missing")
def test_s55_ncpu4_fork_pool_byte_identical(tmp_path):
    """--nCPU=4 through the CLI (the re-exec'd CPU-pinned path forks its
    jax-free worker pool) must emit the same bytes as the pinned nCPU=1
    goldens across the whole S55 corpus."""
    fx = build_s55_full(str(tmp_path))
    out = str(tmp_path / "n4.vcf")
    env = dict(os.environ, PLATYPUS_TPU_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, "-m", "platypus_tpu.cli", "callVariants",
         f"--bamFiles={fx['bam']}", f"--refFile={fx['ref']}",
         "--nCPU=4", "-o", out],
        check=True, capture_output=True, env=env, cwd=REPO)
    golden = []
    for island in range(5):
        golden.extend(_filter_sorted_lines(
            os.path.join(GOLDEN_DIR, f"ref_s55_island{island}.vcf")))
    assert _filter_sorted_lines(out) == golden
