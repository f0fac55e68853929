"""Multi-chip execution: device mesh, shardings and the batched calling step.

The reference scales by forking share-nothing processes over genome regions
(runner.py:470-504).  The TPU-native equivalent keeps that embarrassing
parallelism but maps it onto a 2-D device mesh:

* axis "win": windows (the data-parallel axis — regions/windows are
  independent given their reference halo);
* axis "lane": the read axis of each window's likelihood tensor — the
  genotype log-likelihood is a sum over reads, so sharding reads across
  "lane" makes XLA insert a reduce over ICI (tensor-parallel style), which
  matters only for pathologically deep windows but exercises the collective
  path.

`build_calling_step` returns a single jitted program: banded alignment for
every (window, hap, read) pair -> log-likelihoods -> genotype GLs -> masked
EM -> per-(window, variant-set) posterior ratios.  GSPMD partitions it from
the input shardings; there is no hand-written communication.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.align_jax import band_align_padded
from ..ops.likelihood_jax import (
    genotype_log_likelihoods_jax,
    rescale_likelihoods_jax,
    em_frequencies_jax,
    scores_to_logliks_jax,
    variant_posterior_ratio_jax,
)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    # Factor n into (win, lane) as square-ish as possible.
    lane = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            lane = cand
            break
    win = n // lane
    return Mesh(np.array(devices).reshape(win, lane), ("win", "lane"))


def build_calling_step(mesh: Mesh, gapextend: int = 3, nucprior: int = 2,
                       em_iters: int = 20):
    """One fused window-batch calling step.

    Inputs (W windows, Hmax haps, Rmax reads, G = Hmax*(Hmax+1)/2 genotypes):
      hap_cols   [L1, W, Hmax]  int32  'N'-padded hap segment columns
      go4_cols   [L1, W, Hmax]  int32
      read_cols  [L2+8, W, Rmax] int32 '0'-padded read columns
      qual4_cols [L2+8, W, Rmax] int32
      read_len   [W, Rmax] int32
      mapq       [W, Rmax] int32
      read_mask  [W, Rmax] bool
      hap_mask   [W, Hmax] bool
      h1, h2     [G] int32 genotype hap indices (shared across windows)
      geno_mask  [W, G] bool
      hap_has_var [W, Hmax] bool (posterior test per window)

    Returns (frequencies [W, Hmax], posterior_ratio [W], scores [W,Hmax,Rmax]).
    """

    def step(hap_cols, go4_cols, read_cols, qual4_cols, read_len, mapq,
             read_mask, hap_mask, h1, h2, geno_mask, hap_has_var):
        L1, W, Hmax = hap_cols.shape
        S, _, Rmax = read_cols.shape

        # Expand to all (window, hap, read) pairs and flatten the batch.
        B = W * Hmax * Rmax
        hap_b = jnp.broadcast_to(hap_cols[:, :, :, None], (L1, W, Hmax, Rmax)).reshape(L1, B)
        go_b = jnp.broadcast_to(go4_cols[:, :, :, None], (L1, W, Hmax, Rmax)).reshape(L1, B)
        read_b = jnp.broadcast_to(read_cols[:, :, None, :], (S, W, Hmax, Rmax)).reshape(S, B)
        qual_b = jnp.broadcast_to(qual4_cols[:, :, None, :], (S, W, Hmax, Rmax)).reshape(S, B)
        rl_b = jnp.broadcast_to(read_len[:, None, :], (W, Hmax, Rmax)).reshape(B)

        scores = band_align_padded(hap_b, go_b, read_b, qual_b, rl_b,
                                   gapextend=gapextend, nucprior=nucprior)
        scores = scores.reshape(W, Hmax, Rmax)

        loglik = scores_to_logliks_jax(scores.astype(jnp.float32),
                                       mapq[:, None, :].astype(jnp.float32))

        def per_window(ll, rmask, hmask, gmask, has_var):
            gl = genotype_log_likelihoods_jax(ll, h1, h2, rmask)[None, :]  # I=1
            has_reads = jnp.array([rmask.any()])
            lik = rescale_likelihoods_jax(gl, gmask, has_reads)
            freq = em_frequencies_jax(lik, h1, h2, Hmax, hmask, has_reads, em_iters)
            ratio = variant_posterior_ratio_jax(lik, freq, has_var, h1, h2, has_reads)
            return freq, ratio[0] if ratio.ndim else ratio

        freqs, ratios = jax.vmap(per_window)(loglik, read_mask, hap_mask,
                                             geno_mask, hap_has_var)
        return freqs, ratios, scores

    # Shardings: windows over 'win'; read axis over 'lane'.
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    in_shardings = (
        s(None, "win", None),          # hap_cols
        s(None, "win", None),          # go4_cols
        s(None, "win", "lane"),        # read_cols
        s(None, "win", "lane"),        # qual4_cols
        s("win", "lane"),              # read_len
        s("win", "lane"),              # mapq
        s("win", "lane"),              # read_mask
        s("win", None),                # hap_mask
        s(None),                        # h1
        s(None),                        # h2
        s("win", None),                # geno_mask
        s("win", None),                # hap_has_var
    )
    out_shardings = (s("win", None), s("win"), s("win", None, "lane"))
    return jax.jit(step, in_shardings=in_shardings, out_shardings=out_shardings)


def make_example_batch(W=8, Hmax=4, Rmax=16, L2=24, seed=0):
    """Tiny synthetic window batch for compile checks and the dry run."""
    rng = np.random.default_rng(seed)
    L1 = L2 + 16
    S = L2 + 8
    bases = np.frombuffer(b"ACGT", np.uint8)

    hap_seqs = rng.choice(bases, size=(W, Hmax, L1)).astype(np.int32)
    # Reads copied from hap 0 with noise.
    reads = np.zeros((W, Rmax, L2), np.int32)
    for w in range(W):
        for r in range(Rmax):
            off = rng.integers(0, 8)
            reads[w, r] = hap_seqs[w, r % Hmax, off : off + L2]
    quals = np.full((W, Rmax, L2), 30, np.int32)
    read_len = np.full((W, Rmax), L2, np.int32)
    mapq = np.full((W, Rmax), 60, np.int32)

    hap_cols = np.ascontiguousarray(hap_seqs.transpose(2, 0, 1))
    go4_cols = np.full((L1, W, Hmax), 45 * 4, np.int32)
    read_cols = np.full((S, W, Rmax), ord("0"), np.int32)
    read_cols[:L2] = reads.transpose(2, 0, 1)
    qual4_cols = np.full((S, W, Rmax), 64 * 4, np.int32)
    qual4_cols[:L2] = 4 * quals.transpose(2, 0, 1)

    G = Hmax * (Hmax + 1) // 2
    h1 = np.array([i for i in range(Hmax) for _ in range(i, Hmax)], np.int32)
    h2 = np.array([j for i in range(Hmax) for j in range(i, Hmax)], np.int32)

    read_mask = np.ones((W, Rmax), bool)
    hap_mask = np.ones((W, Hmax), bool)
    geno_mask = np.ones((W, G), bool)
    hap_has_var = np.zeros((W, Hmax), bool)
    hap_has_var[:, 1:] = True

    return (hap_cols, go4_cols, read_cols, qual4_cols, read_len, mapq,
            read_mask, hap_mask, h1, h2, geno_mask, hap_has_var)


def dryrun_multichip(n_devices: int) -> None:
    """Compile + execute the full sharded calling step on an n-device mesh."""
    mesh = make_mesh(n_devices)
    step = build_calling_step(mesh, em_iters=5)
    batch = make_example_batch(W=mesh.shape["win"] * 2, Rmax=mesh.shape["lane"] * 8)
    with mesh:
        freqs, ratios, scores = step(*batch)
        jax.block_until_ready((freqs, ratios, scores))
    assert np.isfinite(np.asarray(ratios)).all()
    assert np.asarray(freqs).shape[1] == 4
