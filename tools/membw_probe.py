"""Host memory-bandwidth probe (VERDICT r2 item 2 evidence).

Runs N concurrent single-threaded streaming-copy workers (numpy copies of
a buffer far beyond L3) and reports per-worker and aggregate GB/s.  If the
aggregate saturates well below N x solo, the host's memory system — not
the runner — bounds multi-worker scaling, which is exactly the claim
BENCHMARKS.md makes about the nCPU=4 efficiency falloff.

  python tools/membw_probe.py [--ncpus 1,2,4] [--mb 256] [--seconds 3]
"""

import argparse
import json
import multiprocessing
import os
import time


def _worker(mb: int, seconds: float, mode: str, out_q) -> None:
    import numpy as np

    src = np.ones(mb * 1024 * 1024 // 8, np.float64)
    dst = np.empty_like(src)
    if mode == "gather":
        # Random row gather over a beyond-L3 matrix — the memory pattern of
        # the window read gather (fancy-indexing), latency/L3-bound rather
        # than prefetch-friendly.
        mat = src.reshape(-1, 64)
        rng = np.random.default_rng(0)
        idx = rng.integers(0, mat.shape[0], size=mat.shape[0] // 4)
        out = np.empty((len(idx), 64), np.float64)
        bytes_per_pass = out.nbytes * 2
        def one_pass():
            np.take(mat, idx, axis=0, out=out)
    else:
        bytes_per_pass = 2 * src.nbytes
        def one_pass():
            np.copyto(dst, src)
    # Warm (fault pages in) before timing.
    one_pass()
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        one_pass()
        n += 1
    dt = time.perf_counter() - t0
    out_q.put(bytes_per_pass * n / 2**30 / dt)


def run(n: int, mb: int, seconds: float, mode: str):
    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(mb, seconds, mode, q))
             for _ in range(n)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return rates


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncpus", default="1,2,4")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--mode", choices=("stream", "gather"), default="stream")
    args = ap.parse_args()
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    base = None
    for n in [int(x) for x in args.ncpus.split(",")]:
        rates = run(n, args.mb, args.seconds, args.mode)
        agg = sum(rates)
        row = {"mode": args.mode, "workers": n,
               "aggregate_gb_s": round(agg, 2),
               "per_worker_gb_s": [round(r, 2) for r in rates]}
        if base is None and n == 1:
            base = agg
        if base is not None:
            row["scaling_vs_solo"] = round(agg / (base * n), 3)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
