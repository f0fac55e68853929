"""Golden fixtures for traceback + flank-score mode (compiled reference)."""

import ctypes
import json
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


def main() -> None:
    with tempfile.TemporaryDirectory() as tmpdir:
        so = os.path.join(tmpdir, "refalign.so")
        subprocess.run(
            ["gcc", "-O2", "-msse2", "-shared", "-fPIC",
             os.path.join(REFERENCE_DIR, "src/c/align.c"), "-o", so,
             "-I", os.path.join(REFERENCE_DIR, "src/c")],
            check=True,
        )
        lib = ctypes.CDLL(so)
        lib.fastAlignmentRoutine.restype = ctypes.c_int
        lib.fastAlignmentRoutine.argtypes = (
            [ctypes.c_char_p] * 3 + [ctypes.c_int] * 4 + [ctypes.c_char_p] * 3
            + [ctypes.POINTER(ctypes.c_int)]
        )
        lib.calculateFlankScore.restype = ctypes.c_int
        lib.calculateFlankScore.argtypes = (
            [ctypes.c_int] * 2 + [ctypes.c_char_p] * 2 + [ctypes.c_int] * 3
            + [ctypes.c_char_p] * 2
        )

        rng = random.Random(123)
        cases = []
        for _ in range(150):
            L2 = rng.randint(10, 100)
            L1 = L2 + 15
            hap = bytes(rng.choice(b"ACGT") for _ in range(L1))
            off = rng.randint(0, 15)
            r = bytearray(hap[off : off + L2])
            for _ in range(rng.randint(0, 4)):
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
            quals = [rng.randint(0, 60) for _ in range(L2)]
            gapopen = [rng.randint(1, 60) for _ in range(L1)]
            aln1 = ctypes.create_string_buffer(2 * L2 + 16)
            aln2 = ctypes.create_string_buffer(2 * L2 + 16)
            fp = ctypes.c_int(0)
            score = lib.fastAlignmentRoutine(
                hap, read, bytes(quals), L1, L2, 3, 2, bytes(gapopen),
                aln1, aln2, ctypes.byref(fp),
            )
            flank = rng.randint(1, 8)
            fscore = lib.calculateFlankScore(
                L1, flank, bytes(quals), bytes(gapopen), 3, 2, fp.value,
                aln1.value, aln2.value,
            )
            cases.append(dict(
                hap=hap.decode(), read=read.decode(), quals=quals,
                gapopen=gapopen, gapextend=3, nucprior=2, score=score,
                aln1=aln1.value.decode(), aln2=aln2.value.decode(),
                firstpos=fp.value, flank=flank, flank_score=fscore,
            ))
        out = os.path.join(REPO, "tests/goldens/flank_goldens.json")
        with open(out, "w") as fh:
            json.dump(cases, fh)
        print(f"wrote {len(cases)} cases to {out}")


if __name__ == "__main__":
    sys.exit(main())
