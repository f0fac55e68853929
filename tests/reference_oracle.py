"""Independent transcription of the reference's calling chain, used to pin
full-window VCF goldens (tests/test_reference_golden.py).

The genuine reference binary cannot be built in this environment (see
docs/REFERENCE_ORACLE.md: no python2, no Cython, no htslib, no network), so
this module is the strongest feasible oracle:

* alignment scores come from the COMPILED reference C kernel
  (/root/reference/src/c/align.c, loaded via ctypes) — genuine reference
  code, not a reimplementation;
* tandem-repeat annotation for indel priors comes from the COMPILED
  reference tandem.c;
* the numeric tables (homopolymer gap-open model, indel prior model) are
  PARSED OUT OF the reference sources at run time, not copied here;
* the inference math (read likelihood mixing, genotype likelihoods, EM,
  variant posterior, priors) is transcribed line-by-line from the cited
  reference Cython sources in plain float64 NumPy, deliberately structured
  as scalar loops (like the originals) rather than like platypus_tpu's
  vectorised production modules.

Everything here requires $REFERENCE_DIR (default /root/reference) and a C
compiler; callers skip when either is missing.
"""

from __future__ import annotations

import ast
import ctypes
import math
import os
import re
import subprocess
import tempfile

import numpy as np

REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


def reference_available() -> bool:
    return os.path.exists(os.path.join(REFERENCE_DIR, "src/c/align.c"))


# ---------------------------------------------------------------------------
# Compiled reference kernels (genuine reference C)
# ---------------------------------------------------------------------------

_libs = {}


def _compile(src_rel: str, extra_args=()) -> ctypes.CDLL:
    if src_rel in _libs:
        return _libs[src_rel]
    src = os.path.join(REFERENCE_DIR, src_rel)
    tmpdir = tempfile.mkdtemp(prefix="reforacle_")
    so = os.path.join(tmpdir, os.path.basename(src_rel) + ".so")
    subprocess.run(
        ["gcc", "-O2", "-msse2", "-shared", "-fPIC", *extra_args, src, "-o", so,
         "-I", os.path.join(REFERENCE_DIR, "src/c")],
        check=True, capture_output=True,
    )
    _libs[src_rel] = ctypes.CDLL(so)
    return _libs[src_rel]


def ref_align_fn():
    """The reference's banded aligner, fastAlignmentRoutine (align.c:77)."""
    lib = _compile("src/c/align.c")
    lib.fastAlignmentRoutine.restype = ctypes.c_int
    lib.fastAlignmentRoutine.argtypes = (
        [ctypes.c_char_p] * 3 + [ctypes.c_int] * 4 + [ctypes.c_char_p] * 3
        + [ctypes.POINTER(ctypes.c_int)]
    )

    def align(hap: bytes, read: bytes, quals: bytes, gapopen: bytes,
              gapextend: int, nucprior: int) -> int:
        fp = ctypes.c_int(0)
        return lib.fastAlignmentRoutine(
            hap, read, quals, len(hap), len(read), gapextend, nucprior,
            gapopen, None, None, ctypes.byref(fp),
        )

    return align


def tandem_annotate(seq: bytes):
    """The reference's tandem annotator (tandem.c:132), annotate_all=True as
    called by cerrormodel.calculate_size_and_displacement (variant.pyx:189)."""
    lib = _compile("src/c/tandem.c", extra_args=("-Dmain=disabled_main",))
    lib.annotate.argtypes = [ctypes.c_char_p] * 3 + [ctypes.c_int]
    n = len(seq)
    sizes = ctypes.create_string_buffer(n + 1)
    disps = ctypes.create_string_buffer(n + 1)
    lib.annotate(seq, sizes, disps, -n)
    return (np.frombuffer(sizes.raw[:n], np.uint8).astype(int),
            np.frombuffer(disps.raw[:n], np.int8).astype(int))


# ---------------------------------------------------------------------------
# Numeric tables, parsed from the reference sources
# ---------------------------------------------------------------------------

def homopolq_table() -> bytes:
    """Evaluate the homopolymer gap-open table exactly as chaplotype.pyx:63-67
    defines it (a formula over per_base_indel_errors, chaplotype.pyx:62)."""
    src = open(os.path.join(REFERENCE_DIR, "src/cython/chaplotype.pyx")).read()
    m = re.search(r"per_base_indel_errors = (\[[^\]]*\] \+ \[[^\]]*\])", src)
    errors = eval(m.group(1), {"__builtins__": {}, "range": range}, {})  # noqa: S307 — literal list + comprehension from the pinned reference source
    return bytes(int(33.5 + 10 * math.log((idx + 1) * q) / math.log(0.1))
                 for idx, q in enumerate(errors))


def indel_prior_model() -> dict:
    """The indel prior table, parsed from variant.pyx:68-91."""
    src = open(os.path.join(REFERENCE_DIR, "src/cython/variant.pyx")).read()
    m = re.search(r"indel_prior_model = (\{.*?\})\n\n", src, re.S)
    return ast.literal_eval(m.group(1))


# ---------------------------------------------------------------------------
# Transcribed reference math
# ---------------------------------------------------------------------------

def gap_open_array(seq: bytes) -> bytes:
    """annotateWithGapOpen, chaplotype.pyx:552-590: back-to-front scan,
    homopolymer run length advances only while the error model has entries,
    N resets the remembered base to 0."""
    error_model = homopolq_table()
    n = len(seq)
    out = bytearray(n)
    homopol = -1
    homopollen = 0
    index = n
    while index > 0:
        index -= 1
        if seq[index] == homopol:
            if homopollen + 1 < len(error_model) and error_model[homopollen + 1] != 0:
                homopollen += 1
        else:
            homopollen = 0
        out[index] = error_model[homopollen] - ord("!")
        homopol = seq[index]
        if homopol == ord("N"):
            homopol = 0
    return bytes(out)


def calculate_prior(ref_seq: np.ndarray, ref_pos: int, removed: bytes,
                    added: bytes) -> float:
    """Variant prior, variant.pyx:219-259 (calculatePrior)."""
    n_added, n_removed = len(added), len(removed)
    if n_added == 1 and n_removed == 1:
        prior = 1e-3 / 3
    elif n_added == n_removed:
        n_diffs = sum(1 for x, y in zip(added, removed) if x != y)
        prior = 5e-5 * (0.1 ** (n_diffs - 1)) * (1.0 - 0.1)
    elif n_added > 0 and n_removed == 0:
        prior = _indel_prior(ref_seq, ref_pos, n_added)
    elif n_added == 0 and n_removed > 0:
        prior = _indel_prior(ref_seq, ref_pos, -n_removed)
    else:
        prior = 5e-6
    return max(prior, 1e-10)


def _indel_prior(ref_seq: np.ndarray, ref_pos: int,
                 indel_length_and_type: int) -> float:
    """indelPrior, variant.pyx:146-217: tandem context at the two bases
    flanking the event picks the phred prior from the parsed table; short
    tracts (<=3) switch to a geometric length model."""
    model = indel_prior_model()
    context = 100
    left_pos = max(0, ref_pos - context)
    right_pos = ref_pos + context
    rel = ref_pos - left_pos
    # The reference fetches [leftPos+1, rightPos+1) (variant.pyx:167).
    sequence = bytes(ref_seq[left_pos + 1: right_pos + 1].astype(np.uint8))
    sizes, disps = tandem_annotate(sequence)
    qbase = 33
    prior = ord(model[1][0]) - qbase
    prior_tractlength = 255  # unsigned char -1 (variant.pyx:162)
    for i in range(rel - 1, rel + 1):
        disp = int(disps[i])
        if disp in model:
            size = int(sizes[i])
            if size > len(model[disp]):
                size = len(model[disp])
            newprior = ord(model[disp][size - 1]) - qbase
            if newprior < prior:
                prior = newprior
                prior_tractlength = size
    dprior = math.pow(0.1, prior / 10.0)
    if prior_tractlength <= 3:
        if indel_length_and_type < 0:
            dprior = 5e-5 * math.pow(0.75, -indel_length_and_type - 1) * 0.25
        else:
            dprior = (5e-6 * math.pow(0.75, indel_length_and_type - 1) * 0.25
                      * math.pow(0.33, indel_length_and_type))
    return dprior


def read_loglik(score: int, mapq: int) -> float:
    """Alignment score -> ln P(read | hap), chaplotype.pyx:619-676
    (no map-quality cap: the default non-HLA path)."""
    mltot = -math.log(10.0) / 10.0
    prob_map_wrong = mltot * mapq
    prob_map_right = math.log(1.0 - math.exp(prob_map_wrong))
    return max(-300.0, mltot * score + prob_map_right)


def genotype_loglik(l1: np.ndarray, l2: np.ndarray, same_hap: bool) -> float:
    """Diploid genotype data log-likelihood, cgenotype.pyx:131-189, with the
    reference's three fast paths."""
    total = 0.0
    for a, b in zip(l1, l2):
        if same_hap:
            total += a
        elif abs(a - b) >= 3.0:
            total += math.log(0.5) + max(a, b)
        elif abs(a - b) <= 1e-3:
            total += a
        else:
            total += math.log(0.5 * (math.exp(a) + math.exp(b)))
    return total


def em_frequencies(likelihoods: np.ndarray, hap1: np.ndarray, hap2: np.ndarray,
                   n_haps: int, n_ind_total: int):
    """EM for haplotype frequencies, cpopulation.pyx:384-457; tolerance and
    iteration cap from cpopulation.pyx:678-716.  `likelihoods` holds only
    individuals with data; n_ind_total sets the tolerance."""
    n_with_data, n_genotypes = likelihoods.shape
    freq = np.full(n_haps, 1.0 / n_haps)
    eps = min(1e-3, 1.0 / (n_ind_total * 4))
    csr = np.zeros_like(likelihoods)
    for _ in range(100):
        for i in range(n_with_data):
            s = 0.0
            for j in range(n_genotypes):
                w = likelihoods[i, j] * freq[hap1[j]] * freq[hap2[j]] * (
                    1 + (hap1[j] != hap2[j]))
                csr[i, j] = w
                s += w
            if s > 0.0:
                csr[i] /= s
        new_freq = np.zeros(n_haps)
        for i in range(n_with_data):
            for j in range(n_genotypes):
                new_freq[hap1[j]] += csr[i, j]
                new_freq[hap2[j]] += csr[i, j]
        new_freq /= 2.0 * n_with_data
        max_change = float(np.abs(freq - new_freq).max())
        freq = new_freq
        if max_change <= eps:
            break
    return freq, csr



def _round_ties_away(x: float) -> float:
    """C round() (cpopulation.pyx:56 cimports libc round): ties away from
    zero — Python 3's round() would give banker's rounding instead."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

def posterior_phred(likelihoods: np.ndarray, freq: np.ndarray,
                    hap_has_variant: np.ndarray, hap1: np.ndarray,
                    hap2: np.ndarray, prior: float) -> int:
    """Variant posterior, cpopulation.pyx:459-594 (calculatePosterior)."""
    freqs_prime = np.where(hap_has_variant, 0.0, freq)
    sum_freqs = float(freqs_prime.sum())
    if sum_freqs > 0:
        freqs_prime = freqs_prime / sum_freqs
    log_min_float = -708.0
    sum_log_var = 0.0
    sum_log_novar = 0.0
    for i in range(likelihoods.shape[0]):
        sv = 0.0
        sn = 0.0
        for j in range(likelihoods.shape[1]):
            factor = 2.0 if hap1[j] != hap2[j] else 1.0
            lik = likelihoods[i, j]
            sv += factor * freq[hap1[j]] * freq[hap2[j]] * lik
            sn += factor * freqs_prime[hap1[j]] * freqs_prime[hap2[j]] * lik
        sum_log_var += math.log(sv) if sv > 0 else log_min_float
        sum_log_novar += math.log(sn) if sn > 0 else log_min_float
    ratio = max(1e-300, math.exp(min(700.0, sum_log_novar - sum_log_var)))
    return _round_ties_away(-10.0 * (math.log10(ratio * (1.0 - prior))
                          - math.log10(prior + ratio * (1.0 - prior))))


# ---------------------------------------------------------------------------
# Full-window oracle
# ---------------------------------------------------------------------------

def splice_haplotype(ref_seq: np.ndarray, hap_start: int, hap_end: int,
                     variant=None) -> bytes:
    """Reference flank with at most one variant spliced in
    (chaplotype.pyx:397-449 for the single-variant case)."""
    ref = ref_seq.astype(np.uint8)
    if variant is None:
        return bytes(ref[hap_start:hap_end])
    pos, removed, added = variant
    return (bytes(ref[hap_start:pos]) + added
            + bytes(ref[pos + len(removed):hap_end]))


def call_window(ref_seq: np.ndarray, variant, reads, mapq: int = 60,
                gapextend: int = 3, nucprior: int = 2, flank: int = 300,
                anchor_span: int = 24):
    """Call one single-variant diploid window from first principles.

    variant: (ref_pos0, removed_bytes, added_bytes)
    reads:   list of dicts with pos (ref coord), seq (bytes), qual (list)

    Returns dict with the phred posterior (the VCF QUAL), the ML genotype as
    an unphased GT string, and the EM haplotype frequencies.
    """
    align = ref_align_fn()
    pos, removed, added = variant
    hap_start = max(0, pos - flank)
    hap_end = min(len(ref_seq), pos + flank)
    haps = [splice_haplotype(ref_seq, hap_start, hap_end),
            splice_haplotype(ref_seq, hap_start, hap_end, variant)]
    gapopens = [gap_open_array(h) for h in haps]

    n_reads = len(reads)
    loglik = np.zeros((2, n_reads))
    for r_idx, read in enumerate(reads):
        rseq = read["seq"]
        quals = bytes(read["qual"])
        L1 = len(rseq) + 15
        for h_idx, (hseq, gop) in enumerate(zip(haps, gapopens)):
            center = read["pos"] - hap_start - 8  # align.c expects the read
            # to start ~8 into the hap segment (band centred, align.c:77)
            best = None
            for off in range(max(0, center - anchor_span),
                             min(len(hseq) - L1, center + anchor_span) + 1):
                s = align(hseq[off:off + L1], rseq, quals,
                          gop[off:off + L1], gapextend, nucprior)
                if best is None or s < best:
                    best = s
            loglik[h_idx, r_idx] = read_loglik(best, mapq)

    hap1 = np.array([0, 0, 1])
    hap2 = np.array([0, 1, 1])
    gl = np.array([
        genotype_loglik(loglik[hap1[j]], loglik[hap2[j]], hap1[j] == hap2[j])
        for j in range(3)
    ])
    # Rescale to relative likelihoods, cpopulation.pyx:290-309.
    lik = np.maximum(1e-300, np.exp(gl - gl.max()))[None, :]
    freq, csr = em_frequencies(lik, hap1, hap2, n_haps=2, n_ind_total=1)
    prior = calculate_prior(ref_seq, pos, removed, added)
    phred = posterior_phred(lik, freq, np.array([False, True]), hap1, hap2,
                            prior)
    # Best genotype by plain likelihood (strict >, cpopulation.pyx:623-676).
    best_g = int(np.argmax(lik[0]))
    gt = {0: "0/0", 1: "0/1", 2: "1/1"}[best_g]
    return dict(phred=phred, gt=gt, freq=freq.tolist(), prior=prior,
                gl=gl.tolist())
