"""Pin the full-window reference-chain golden (tests/goldens/ref_window_golden.json).

Builds the deterministic three-window fixture from
tests/test_reference_golden.py, runs the production engine on it, runs the
independent reference-chain oracle (tests/reference_oracle.py: compiled
reference align.c/tandem.c + math transcribed from the reference Cython) on
the same windows, cross-checks QUAL/GT, and writes both as the pinned golden.

Usage: python tools/make_reference_window_golden.py
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    import reference_oracle as oracle
    from test_reference_golden import (
        _canon_gt, build_fixture, engine_vcf_lines, parse_variant, window_reads,
    )

    with tempfile.TemporaryDirectory() as tmp:
        fx = build_fixture(tmp)
        lines = engine_vcf_lines(tmp, fx)
        print(f"engine produced {len(lines)} records")
        oracle_entries = []
        n_mismatch = 0
        for line in lines:
            cols = line.split("\t")
            pos0, removed, added = parse_variant(cols)
            reads = window_reads(fx["reads"], pos0)
            res = oracle.call_window(fx["ref_seq"], (pos0, removed, added), reads)
            engine_qual = int(float(cols[5]))
            engine_gt = _canon_gt(cols[9].split(":")[0])
            ok_q = engine_qual == res["phred"]
            ok_g = engine_gt == res["gt"]
            if not (ok_q and ok_g):
                n_mismatch += 1
            print(f"  {cols[1]} {cols[3]}>{cols[4]}: engine QUAL={engine_qual} "
                  f"GT={engine_gt} | oracle phred={res['phred']} gt={res['gt']} "
                  f"freq={[round(f, 4) for f in res['freq']]} "
                  f"{'OK' if ok_q and ok_g else 'MISMATCH'}")
            oracle_entries.append(dict(
                pos=int(cols[1]), ref=cols[3], alt=cols[4],
                phred=res["phred"], gt=res["gt"],
                prior=res["prior"], freq=res["freq"], gl=res["gl"],
            ))

        golden = dict(vcf_lines=lines, oracle=oracle_entries)
        path = os.path.join(REPO, "tests/goldens/ref_window_golden.json")
        with open(path, "w") as fh:
            json.dump(golden, fh, indent=1)
        print(f"wrote {path}; {n_mismatch} engine/oracle mismatches")
        return 1 if n_mismatch else 0


if __name__ == "__main__":
    sys.exit(main())
