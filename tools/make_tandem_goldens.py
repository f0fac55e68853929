"""Golden fixtures for the tandem-repeat annotator: compiles the reference
tandem.c (from $REFERENCE_DIR, default /root/reference) and records
(sizes, displacements) for a spread of sequences into
tests/goldens/tandem_goldens.json."""

import ctypes
import json
import os
import random
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


def main() -> None:
    with tempfile.TemporaryDirectory() as tmpdir:
        out = os.path.join(tmpdir, "reftandem.so")
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-Dmain=disabled_main",
             os.path.join(REFERENCE_DIR, "src/c/tandem.c"), "-o", out],
            check=True,
        )
        lib = ctypes.CDLL(out)
        lib.annotate.argtypes = [ctypes.c_char_p] * 3 + [ctypes.c_int]

        def ref_annotate(seq, annotate_all):
            n = len(seq)
            sizes = ctypes.create_string_buffer(n + 1)
            disps = ctypes.create_string_buffer(n + 1)
            lib.annotate(seq, sizes, disps, -n if annotate_all else n)
            return (
                np.frombuffer(sizes.raw[:n], np.int8).astype(int).tolist(),
                np.frombuffer(disps.raw[:n], np.int8).astype(int).tolist(),
            )

        rng = random.Random(99)
        cases = []
        for trial in range(120):
            L = rng.randint(20, 220)
            mode = trial % 4
            if mode == 0:
                seq = bytes(rng.choice(b"ACGT") for _ in range(L))
            elif mode == 1:
                parts = []
                while sum(map(len, parts)) < L:
                    unit = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 6)))
                    parts.append(unit * rng.randint(1, 20))
                seq = b"".join(parts)[:L]
            elif mode == 2:
                seq = bytes(rng.choice(b"ACGTN") for _ in range(L))
            else:
                seq = (b"C" * rng.randint(40, 120) + bytes(rng.choice(b"ACGT") for _ in range(40)))[:L]
            for ann_all in (True, False):
                s, d = ref_annotate(seq, ann_all)
                cases.append(dict(seq=seq.decode(), annotate_all=ann_all, sizes=s, displacements=d))

        path = os.path.join(REPO, "tests/goldens/tandem_goldens.json")
        with open(path, "w") as fh:
            json.dump(cases, fh)
        print(f"wrote {len(cases)} cases to {path}")


if __name__ == "__main__":
    sys.exit(main())
