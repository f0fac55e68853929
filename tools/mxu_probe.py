"""MXU reformulation probe for the banded pair-alignment kernel
(VERDICT r4 item 7 / BASELINE's "pair-HMM at speed-of-light FLOPs").

The production Pallas kernel is VPU-bound (~119 M pairs/s, BENCH_r04) —
the MXUs sit idle.  The DP recurrence is (min, +) over a data-dependent
band with 2-bit selects, which the MXU cannot evaluate: its systolic
array accumulates (+, x) only, and a softmin/log-domain embedding would
break the integer ¼-phred score contract byte-parity rests on
(align.c:520's `(min+0x8000)>>2`).  The one MXU-shaped piece of the
computation is forming the substitution-cost matrix

    cost[i, j] = qual[j] * (hap[i] != read[j])   (N cost 0)

as a one-hot matmul  onehot(hap) [L1, 4] @ (qual ⊙ onehot(read))^T
[4, L2] — so this probe measures whether the MXU can even FORM those
matrices faster than the VPU kernel computes entire alignments:

  * arm A: the production Pallas kernel, full DP, pairs/s;
  * arm B: batched bf16 einsum forming [L1, L2] cost matrices only
    (no DP at all), pairs/s.

If B <= A, the MXU path is rejected by measurement: the reformulation's
cheapest prerequisite already costs more than the whole VPU solution
(the [L1, L2] = ~115x100 f32 matrix per pair is ~46 KB of HBM traffic
where the VPU kernel streams ~0.4 KB).

Usage: python tools/mxu_probe.py [--batch 8192] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from platypus_tpu.ops.align_jax import pad_alignment_inputs
    from platypus_tpu.ops.align_pallas import band_align_padded_pallas

    B, L2 = args.batch, 100
    L1 = L2 + 15
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = rng.choice(bases, size=(B, L1)).astype(np.int32)
    go = np.full((B, L1), 45, np.int32)
    read = np.zeros((B, L2), np.int32)
    offs = rng.integers(0, 8, size=B)
    for b in range(B):
        read[b] = hap[b, offs[b] : offs[b] + L2]
    qual = np.full((B, L2), 30, np.int32)
    rl = np.full(B, L2, np.int32)

    # --- arm A: full DP on the VPU kernel -------------------------------
    padded = pad_alignment_inputs(hap, go, read, qual, rl)
    jax.block_until_ready(padded)
    fn = jax.jit(band_align_padded_pallas)
    jax.block_until_ready(fn(*padded))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*padded)
    jax.block_until_ready(out)
    vpu_rate = B * args.iters / (time.perf_counter() - t0)

    # --- arm B: MXU cost-matrix formation only --------------------------
    # one-hot in bf16; the contraction runs on the MXU
    # ([B, L1, 4] @ [B, 4, L2] batched matmul).
    hap_oh = jnp.asarray((hap[..., None] == bases[None, None, :]),
                         jnp.bfloat16)
    # mismatch one-hot: 1 - match, scaled by qual
    read_oh = jnp.asarray((read[..., None] == bases[None, None, :]),
                          jnp.bfloat16)
    qual_b = jnp.asarray(qual, jnp.bfloat16)

    @jax.jit
    def cost_matrices(hap_oh, read_oh, qual_b):
        match = jnp.einsum("bik,bjk->bij", hap_oh, read_oh,
                           preferred_element_type=jnp.float32)
        cost = (1.0 - match) * qual_b[:, None, :]
        # A data-dependent reduction so XLA cannot elide the matrices.
        return cost.sum(axis=(1, 2))

    jax.block_until_ready(cost_matrices(hap_oh, read_oh, qual_b))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out2 = cost_matrices(hap_oh, read_oh, qual_b)
    jax.block_until_ready(out2)
    mxu_rate = B * args.iters / (time.perf_counter() - t0)

    print(json.dumps({
        "backend": jax.default_backend(),
        "batch": B,
        "vpu_full_dp_pairs_per_s": round(vpu_rate, 1),
        "mxu_cost_matrices_only_pairs_per_s": round(mxu_rate, 1),
        "mxu_prerequisite_vs_vpu_full_solution": round(mxu_rate / vpu_rate, 3),
        # A fused design still runs the (min,+) DP on the VPU — the MXU
        # only removes the inline mismatch computation, a small slice of
        # the DP's critical path — and adds ~46 KB/pair of HBM traffic to
        # materialise the matrices.  Unless forming costs is MANY times
        # faster than the whole VPU solution, the fusion cannot net out;
        # 5x is a generous Amdahl threshold (the mismatch slice is well
        # under 20% of the VPU kernel's vector ops).
        "verdict": ("rejected: MXU cost formation at {:.2f}x the full VPU "
                    "solution leaves no Amdahl headroom for a fused DP "
                    "(and (min,+) itself cannot run on the MXU without "
                    "breaking integer score parity)".format(
                        mxu_rate / vpu_rate)
                    if mxu_rate < 5 * vpu_rate else
                    "cost formation >=5x; a fused MXU+VPU DP may pay off"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
