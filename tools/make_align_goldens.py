"""Generate golden test vectors for the banded aligner.

Compiles the reference SSE2 kernel (path via $REFERENCE_DIR, default
/root/reference) into a temporary .so and records its scores for a spread of
random (haplotype, read, quals, penalties) cases into
tests/goldens/align_goldens.json.  The fixtures pin the integer score
contract so the test suite never needs the reference tree or a C compiler.

Usage: python tools/make_align_goldens.py
"""

import ctypes
import json
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


def compile_reference(tmpdir: str) -> str:
    src = os.path.join(REFERENCE_DIR, "src/c/align.c")
    out = os.path.join(tmpdir, "refalign.so")
    subprocess.run(
        ["gcc", "-O2", "-msse2", "-shared", "-fPIC", src, "-o", out,
         "-I", os.path.join(REFERENCE_DIR, "src/c")],
        check=True,
    )
    return out


def main() -> None:
    with tempfile.TemporaryDirectory() as tmpdir:
        lib = ctypes.CDLL(compile_reference(tmpdir))
        lib.fastAlignmentRoutine.restype = ctypes.c_int
        lib.fastAlignmentRoutine.argtypes = (
            [ctypes.c_char_p] * 3 + [ctypes.c_int] * 4 + [ctypes.c_char_p] * 3
            + [ctypes.POINTER(ctypes.c_int)]
        )

        def ref_align(hap, read, quals, ge, npr, gapopen):
            fp = ctypes.c_int(0)
            return lib.fastAlignmentRoutine(
                hap, read, bytes(quals), len(hap), len(read), ge, npr,
                bytes(gapopen), None, None, ctypes.byref(fp),
            )

        rng = random.Random(20260817)
        cases = []
        for trial in range(400):
            L2 = rng.randint(10, 152)
            L1 = L2 + 15
            mode = trial % 5
            if mode == 0:
                hap = bytes(rng.choice(b"ACGT") for _ in range(L1))
                read = bytes(rng.choice(b"ACGT") for _ in range(L2))
            else:
                alphabet = b"ACGTN" if mode == 3 else b"ACGT"
                hap = bytes(rng.choice(alphabet) for _ in range(L1))
                off = rng.randint(0, 15)
                r = bytearray(hap[off : off + L2])
                for _ in range(rng.randint(0, 5)):
                    op = rng.randint(0, 2)
                    p = rng.randint(0, len(r) - 1)
                    if op == 0:
                        r[p] = rng.choice(b"ACGT")
                    elif op == 1 and len(r) > 5:
                        del r[p]
                        r.append(rng.choice(b"ACGT"))
                    else:
                        r.insert(p, rng.choice(b"ACGT"))
                        del r[-1]
                read = bytes(r[:L2])
            quals = [rng.randint(0, 93) for _ in range(L2)]
            gapopen = [rng.randint(1, 60) for _ in range(L1)]
            ge = rng.choice([3, 3, 3, 1, 10])
            npr = rng.choice([2, 2, 2, 0, 5])
            score = ref_align(hap, read, quals, ge, npr, gapopen)
            cases.append(
                dict(
                    hap=hap.decode(),
                    read=read.decode(),
                    quals=quals,
                    gapopen=gapopen,
                    gapextend=ge,
                    nucprior=npr,
                    score=score,
                )
            )

        out_path = os.path.join(REPO, "tests/goldens/align_goldens.json")
        with open(out_path, "w") as fh:
            json.dump(cases, fh)
        print(f"wrote {len(cases)} cases to {out_path}")


if __name__ == "__main__":
    sys.exit(main())
