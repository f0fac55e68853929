"""Regenerate tests/goldens/s55_calls.vcf — the whole-S55 CLI golden.

Runs the CLI on all five re-hosted S55 read islands (tests/s55util.py)
and pins the emitted data lines.  Requires /root/reference."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_s55_golden import GOLDEN_PATH, cli_call_s55  # noqa: E402


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="s55_golden_")
    fx, lines = cli_call_s55(tmp)
    print(f"{fx['n_reads']} reads over {len(fx['contigs'])} islands -> "
          f"{len(lines)} data lines")
    with open(GOLDEN_PATH, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {GOLDEN_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
