"""Device-side (JAX) genotype-likelihood + EM pipeline.

Mirrors the exact float64 host kernels in ops/likelihood.py (the numeric
oracle, reference cgenotype.pyx/cpopulation.pyx), restructured for batched
TPU execution:

* fixed-shape masked tensors: a window batch is [W, Hmax] haplotypes,
  [W, Gmax] genotypes, [W, Rmax] reads, with validity masks — windows of any
  real size bucket into the same compiled program;
* the per-read genotype likelihood keeps the reference's three fast paths
  (same-hap; |Δ|>=3; |Δ|<=1e-3), summed over the (possibly device-sharded)
  read axis;
* EM runs a fixed-iteration masked update (lax.fori_loop) — the reference's
  convergence test is a max-change threshold with <=100 iterations; on
  device we run the fixed cap and let converged windows idle (their change
  is ~0), which is branch-free and batch-friendly.

Used by the throughput benchmark and the multi-chip pipeline
(parallel/mesh.py); VCF emission uses the float64 host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LOG_HALF = -0.69314718055994529
MLTOT = -0.23025850929940459


def scores_to_logliks_jax(scores, mapq, cap: float = -300.0):
    prob_map_wrong = MLTOT * mapq
    prob_map_right = jnp.log1p(-jnp.exp(prob_map_wrong))
    return jnp.maximum(cap, MLTOT * scores + prob_map_right)


def genotype_log_likelihoods_jax(loglik, hap1_idx, hap2_idx, read_mask):
    """loglik [H, R]; returns gl [G] summed over masked reads."""
    l1 = loglik[hap1_idx]
    l2 = loglik[hap2_idx]
    same = (hap1_idx == hap2_idx)[:, None]
    diff = jnp.abs(l1 - l2)
    mx = jnp.maximum(l1, l2)
    exact = mx + jnp.log1p(jnp.exp(-(diff))) + LOG_HALF  # log(0.5(e^l1+e^l2))
    per_read = jnp.where(
        same, l1,
        jnp.where(diff >= 3.0, LOG_HALF + mx, jnp.where(diff <= 1e-3, l1, exact)),
    )
    per_read = jnp.where(read_mask[None, :], per_read, 0.0)
    return per_read.sum(axis=1)


def rescale_likelihoods_jax(gl, geno_mask, has_reads):
    """gl [I, G] -> relative likelihoods, masked genotypes -> 0."""
    neg = jnp.where(geno_mask[None, :], gl, -jnp.inf)
    mx = jnp.max(neg, axis=1, keepdims=True)
    lik = jnp.maximum(1e-300, jnp.exp(gl - mx))
    lik = jnp.where(geno_mask[None, :], lik, 0.0)
    return jnp.where(has_reads[:, None], lik, jnp.where(geno_mask[None, :], 1.0, 0.0))


def em_frequencies_jax(likelihoods, hap1_idx, hap2_idx, n_haps_max: int,
                       hap_mask, has_reads, n_iters: int = 100):
    """EM over haplotype frequencies for one window (masked, fixed iters)."""
    G = likelihoods.shape[1]
    n_haps = jnp.maximum(1, hap_mask.sum())
    n_with_data = jnp.maximum(1, has_reads.sum())
    het = 1.0 + (hap1_idx != hap2_idx)
    lik = jnp.where(has_reads[:, None], likelihoods, 0.0)

    freq0 = jnp.where(hap_mask, 1.0 / n_haps, 0.0)

    def body(_, freq):
        w = lik * (freq[hap1_idx] * freq[hap2_idx] * het)[None, :]
        s = w.sum(axis=1, keepdims=True)
        w = jnp.where(s > 0, w / jnp.where(s > 0, s, 1.0), 0.0)
        resp = w.sum(axis=0)
        new = (
            jnp.zeros(n_haps_max).at[hap1_idx].add(resp).at[hap2_idx].add(resp)
        ) / (2.0 * n_with_data)
        return jnp.where(hap_mask, new, 0.0)

    freq = jax.lax.fori_loop(0, n_iters, body, freq0)
    return freq


@functools.partial(jax.jit, static_argnames=("n_iters",))
def window_em_batch(gl, hap1_idx, hap2_idx, geno_mask, hap_mask, has_reads,
                    n_iters: int = 100):
    """Batched over windows: gl [W, I, G] log-likelihoods -> (likelihoods
    [W, I, G], frequencies [W, Hmax])."""

    def per_window(gl_w, h1, h2, gm, hm, hr):
        lik = rescale_likelihoods_jax(gl_w, gm, hr)
        freq = em_frequencies_jax(lik, h1, h2, hap_mask.shape[1], hm, hr, n_iters)
        return lik, freq

    return jax.vmap(per_window)(gl, hap1_idx, hap2_idx, geno_mask, hap_mask, has_reads)


def variant_posterior_ratio_jax(likelihoods, frequencies, hap_has_variant,
                                hap1_idx, hap2_idx, has_reads):
    """log P(no var) - log P(var) summed over individuals (one window)."""
    fp = jnp.where(hap_has_variant, 0.0, frequencies)
    s = fp.sum()
    fp = jnp.where(s > 0, fp / jnp.where(s > 0, s, 1.0), fp)
    factor = 1.0 + (hap1_idx != hap2_idx)
    w_var = factor * frequencies[hap1_idx] * frequencies[hap2_idx]
    w_novar = factor * fp[hap1_idx] * fp[hap2_idx]
    pv = likelihoods @ w_var
    pn = likelihoods @ w_novar
    log_min = -708.0
    lv = jnp.where(pv > 0, jnp.log(jnp.where(pv > 0, pv, 1.0)), log_min)
    ln = jnp.where(pn > 0, jnp.log(jnp.where(pn > 0, pn, 1.0)), log_min)
    return jnp.where(has_reads, ln - lv, 0.0).sum()
