"""Unit tests for the likelihood/EM kernels (host f64 vs device f32)."""

import math

import numpy as np
import pytest

from platypus_tpu.ops import likelihood as lk


def test_scores_to_logliks():
    out = lk.scores_to_logliks(np.array([0, 10, 10000]), np.array([60, 60, 60]))
    # Perfect alignment: ~ln(1 - 1e-6); score 10: -10*ln10/10 + eps; capped at -300.
    assert abs(out[0] - math.log(1 - 1e-6)) < 1e-12
    assert abs(out[1] - (lk.MLTOT * 10 + math.log(1 - 1e-6))) < 1e-12
    assert out[2] == -300.0
    # mapq 0: probMapRight = -inf -> floor.
    out0 = lk.scores_to_logliks(np.array([0]), np.array([0]))
    assert out0[0] == -300.0


def test_genotype_log_likelihoods_fast_paths():
    # 2 haps, 3 reads designed to hit each fast path.
    loglik = np.array([
        [0.0, -10.0, -1.0],    # hap0
        [-5.0, -10.0005, -1.5],  # hap1
    ])
    h1 = np.array([0, 0, 1])
    h2 = np.array([0, 1, 1])
    gl, gof = lk.genotype_log_likelihoods(loglik, h1, h2)
    # Hom genotypes: plain sums.
    np.testing.assert_allclose(gl[0], loglik[0].sum())
    np.testing.assert_allclose(gl[2], loglik[1].sum())
    # Het: read0 |d|=5>=3 -> log(1/2)+max; read1 |d|<=1e-3 -> l1; read2 exact.
    expected = (math.log(0.5) + 0.0) + (-10.0) + math.log(
        0.5 * (math.exp(-1.0) + math.exp(-1.5))
    )
    np.testing.assert_allclose(gl[1], expected)


def test_em_converges_to_allele_frequency():
    """Haps A/B with reads 70/30 split -> EM frequency ~0.7/0.3."""
    rng = np.random.default_rng(0)
    n_ind = 20
    h1, h2 = lk.genotype_index_pairs(2)
    gl = np.zeros((n_ind, len(h1)))
    # Each individual: genotype sampled under HWE p=0.7.
    true_p = 0.7
    for i in range(n_ind):
        a1 = rng.random() < true_p
        a2 = rng.random() < true_p
        n_a = int(a1) + int(a2)
        # Likelihood peaked at the true genotype.
        target = {2: 0, 1: 1, 0: 2}[n_a]  # genotype index for (AA, AB, BB)
        gl[i] = [-50.0, -50.0, -50.0]
        gl[i][target] = 0.0
    lik = lk.rescale_likelihoods(gl, np.full(n_ind, 10))
    freq, _, iters = lk.em_haplotype_frequencies(lik, h1, h2, 2, np.full(n_ind, 10))
    assert iters <= 100
    assert abs(freq.sum() - 1.0) < 1e-9
    emp = np.mean([gl[i].argmin() for i in range(n_ind)])  # not used; sanity only
    # EM should land near the empirical allele frequency.
    counts = sum({0: 2, 1: 1, 2: 0}[int(np.argmax(lik[i]))] for i in range(n_ind))
    np.testing.assert_allclose(freq[0], counts / (2 * n_ind), atol=0.02)


def test_variant_posterior_extremes():
    h1, h2 = lk.genotype_index_pairs(2)
    n_ind = 5
    # All individuals strongly support the het genotype containing hap 1.
    lik = np.full((n_ind, 3), 1e-300)
    lik[:, 1] = 1.0
    freq = np.array([0.5, 0.5])
    has_var = np.array([False, True])
    post = lk.variant_posterior_phred(lik, freq, has_var, h1, h2,
                                      np.full(n_ind, 10), prior=1e-3)
    assert post > 100
    # All individuals homozygous ref: posterior ~0.
    lik2 = np.full((n_ind, 3), 1e-300)
    lik2[:, 0] = 1.0
    post2 = lk.variant_posterior_phred(lik2, freq, has_var, h1, h2,
                                       np.full(n_ind, 10), prior=1e-3)
    assert post2 <= 1


def test_device_em_matches_host():
    """f32 device pipeline approximates the exact host EM."""
    import jax.numpy as jnp

    from platypus_tpu.ops import likelihood_jax as ljx

    rng = np.random.default_rng(1)
    H = 3
    h1, h2 = lk.genotype_index_pairs(H)
    G = len(h1)
    n_ind = 4
    gl = rng.normal(-20, 8, size=(n_ind, G))
    n_reads = np.full(n_ind, 12)

    lik_host = lk.rescale_likelihoods(gl, n_reads)
    freq_host, _, _ = lk.em_haplotype_frequencies(lik_host, h1, h2, H, n_reads)

    lik_dev, freq_dev = ljx.window_em_batch(
        jnp.asarray(gl[None].astype(np.float32)),
        jnp.asarray(h1[None]), jnp.asarray(h2[None]),
        jnp.ones((1, G), bool), jnp.ones((1, H), bool),
        jnp.ones((1, n_ind), bool), n_iters=100,
    )
    freq_dev = np.asarray(freq_dev)[0]
    assert abs(freq_dev.sum() - 1.0) < 1e-5
    # The device path runs the fixed iteration cap while the host stops at
    # the reference tolerance, so near-zero frequencies keep decaying on
    # device; compare only well-supported haplotypes.
    major = freq_host > 0.05
    np.testing.assert_allclose(freq_dev[major], freq_host[major], atol=0.02)


def test_beta_binomial_and_binomial():
    from platypus_tpu.utils.maths import beta_binomial_cdf, binomial_pmf, log_factorial

    assert beta_binomial_cdf(5, 5, 20, 20) == 1.0
    # Symmetric beta-binomial: CDF at the midpoint ~0.5 (plus half the pmf).
    mid = beta_binomial_cdf(10, 20, 20, 20)
    assert 0.5 < mid < 0.65
    # Monotone in k.
    vals = [beta_binomial_cdf(k, 20, 20, 20) for k in range(21)]
    assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))
    # binomial pmf sums to 1.
    total = sum(binomial_pmf(k, 10, 0.3) for k in range(11))
    assert abs(total - 1.0) < 1e-9
    # Stirling branch continuous-ish at the switch point.
    assert abs(log_factorial(14) - (log_factorial(15) - math.log(15))) < 1e-6


def test_hla_map_qual_cap_conversion():
    """HLA mode: cap at ln P(map wrong) and the smooth truncation above
    score 100 (chaplotype.pyx:628-676)."""
    mapq = np.array([40.0, 40.0, 254.0])
    scores = np.array([0, 150, 150])
    out = lk.scores_to_logliks(scores, mapq, use_map_qual_cap=True)
    # score 0: mLTOT*0 + probMapRight ~ -1e-4 (not capped).
    assert out[0] > -1e-3
    # score 150 with moderate mapq: the cap ln P(map wrong) = mLTOT*40 wins
    # over the truncation value (reference max(likelihoodCap, trunc)).
    np.testing.assert_allclose(out[1], lk.MLTOT * 40, rtol=1e-12)
    # With a mapq beyond ~102 the smooth truncation is the binding value:
    # mLTOT * (99 + ((150-100+1)^0.5)/0.5).
    expected = lk.MLTOT * (99 + (150 - 100 + 1) ** 0.5 / 0.5)
    np.testing.assert_allclose(out[2], expected, rtol=1e-12)


def test_round_ref_fast_path_matches_decimal_definition():
    """round_ref's float fast path (tie detection via the exact
    power-of-two scale) must agree with the Decimal HALF_UP definition
    everywhere, including exact binary ties (the BRF=1/8 class), signed
    zeros and large magnitudes."""
    import math
    import random

    from platypus_tpu.utils.maths import _round_ref_decimal, round_ref

    rng = random.Random(99)
    cases = []
    for nd in range(4):
        for k in range(-400, 401):
            cases.append(((2 * k + 1) / 2 ** (nd + 1), nd))
    for _ in range(20000):
        nd = rng.choice([0, 0, 1, 2, 2, 3])
        kind = rng.random()
        if kind < 0.4:
            x = rng.randint(-100000, 100000) / rng.choice(
                [2, 4, 8, 16, 32, 100, 1000])
        elif kind < 0.8:
            x = rng.uniform(-1e6, 1e6)
        else:
            x = rng.uniform(-1e16, 1e16)
        cases.append((x, nd))
    cases += [(0.125, 2), (-0.125, 2), (2.5, 0), (-2.5, 0), (0.0, 0),
              (-0.0, 0), (0.49999999999999994, 0), (4503599627370495.5, 0)]
    for x, nd in cases:
        a = round_ref(x, nd)
        b = _round_ref_decimal(x, nd)
        assert a == b and math.copysign(1, a) == math.copysign(1, b), (x, nd)


def test_segments_multi_bitwise_matches_per_window():
    """The cross-window batched GL pre-pass must be bitwise identical to
    per-window genotype_log_likelihoods_segments calls (elementwise ops on
    concatenated columns + identical segment pairwise sums)."""
    import numpy as np

    from platypus_tpu.ops import likelihood as lk

    rng = np.random.default_rng(77)
    for _ in range(40):
        H = int(rng.integers(1, 10))
        h1, h2 = lk.genotype_index_pairs(H)
        n_windows = int(rng.integers(1, 6))
        lls, bounds_list = [], []
        for _w in range(n_windows):
            R = int(rng.integers(1, 200))
            I = int(rng.integers(1, 4))
            ll = -rng.random((H, R)) * rng.choice([2.0, 30.0])
            cuts = np.sort(rng.integers(0, R + 1, I - 1)) if I > 1 else \
                np.array([], int)
            bounds = np.concatenate([[0], cuts, [R]]).astype(np.int64)
            lls.append(ll)
            bounds_list.append(bounds)
        big = np.concatenate(lls, axis=1)
        segs, off = [], 0
        for ll, bounds in zip(lls, bounds_list):
            for i in range(len(bounds) - 1):
                segs.append((off + int(bounds[i]), off + int(bounds[i + 1])))
            off += ll.shape[1]
        gl_m, gof_m = lk.genotype_log_likelihoods_segments_multi(
            big, h1, h2, np.asarray(segs, np.int64).reshape(-1, 2))
        row = 0
        for ll, bounds in zip(lls, bounds_list):
            gl_w, gof_w = lk.genotype_log_likelihoods_segments(
                ll, h1, h2, bounds)
            n = len(bounds) - 1
            assert gl_m[row:row + n].tobytes() == gl_w.tobytes()
            assert gof_m[row:row + n].tobytes() == gof_w.tobytes()
            row += n
