"""Error-model tests: tandem goldens, homopolymer gap-open, repeat
canonicalisation, model annotation and the calibration tool."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from platypus_tpu.models.error_model import (
    HOMOPOLQ,
    annotate_gap_open,
    annotate_sequence,
    annotate_sequence_read,
    calculate_size_and_displacement,
    get_repeats,
    indel_prior,
    normalize_repunit,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "tandem_goldens.json")


def test_tandem_matches_reference_goldens():
    with open(GOLDENS) as fh:
        cases = json.load(fh)
    assert len(cases) >= 200
    for c in cases:
        s, d = calculate_size_and_displacement(c["seq"].encode(), c["annotate_all"])
        assert s.tolist() == c["sizes"], c["seq"][:40]
        assert d.tolist() == c["displacements"], c["seq"][:40]


def test_homopolymer_gap_open():
    go = annotate_gap_open(b"ACGTACGT")
    # Non-repetitive: highest penalty (first table entry).
    assert (go == HOMOPOLQ[0] - ord("!")).all()
    go2 = annotate_gap_open(b"ACAAAAAAAAAAGT")
    # Inside/at the homopolymer run the penalty drops.
    assert go2.min() < go2.max()
    assert go2[2] < go2[0]  # run start sees the full run length


def test_normalize_repunit():
    # Rotations collapse; reverse-complement marked lower case.
    assert normalize_repunit("TTC") == normalize_repunit("TCT") == normalize_repunit("CTT")
    assert normalize_repunit("A") == "A"
    assert normalize_repunit("G") == "c"     # revcomp C wins
    assert normalize_repunit("T") == "a"
    assert normalize_repunit("NA") == "NN"


def test_get_repeats():
    reps = get_repeats(b"ACACACACACGGGGGGTTTTT", 4, 100)
    keys = {(p, s, u) for p, s, u in reps}
    assert (100, 10, "AC") in keys
    assert any(u in ("c",) and s == 6 for _p, s, u in reps)   # G-run, revcomp canonical
    assert any(u in ("a",) and s == 5 for _p, s, u in reps)   # T-run


def test_annotate_sequence_model():
    model = {1: "SSI?5+#", "AG": "SS#"}
    seq = "TATTTG" + "A" * 11 + "CATGCGCT"
    q = annotate_sequence(seq, model, ord("!"))
    # The A-run gets the length-11 (clamped) penalty '#', elsewhere default 'S'.
    assert q[8:14] == b"######"
    assert q[0:2] == b"SS"
    q_read = annotate_sequence_read(seq, model, ord("!"), False)
    # Running-minimum: everything after the run stays at the minimum.
    assert q_read[-1:] == b"#"


def test_calibration_tool(tmp_path):
    """Reads with slippage errors at an A-run produce an elevated error
    rate for unit 'A' at that tract length."""
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_reference, write_synth_bam

    rng = np.random.default_rng(9)
    # Reference with a prominent A12 run.
    base = rng.choice(np.frombuffer(b"CGT", np.uint8), 2000)
    base[1000:1012] = ord("A")
    ref_path = str(tmp_path / "ref.fa")
    text = base.tobytes().decode()
    with open(ref_path, "w") as fh:
        fh.write(">chrE\n")
        for i in range(0, len(text), 60):
            fh.write(text[i : i + 60] + "\n")
    from platypus_tpu.io.fasta import build_index

    build_index(ref_path)

    genome = base.tobytes()
    reads = []
    for i in range(200):
        start = int(rng.integers(910, 1000))
        if i % 10 == 0:
            # Slippage: one A dropped inside the run.
            seq = genome[start:1005] + genome[1006 : start + 101]
            cigar = [(0, 1005 - start), (2, 1), (0, start + 101 - 1006)]
        else:
            seq = genome[start : start + 100]
            cigar = [(0, 100)]
        reads.append(dict(name=f"r{i}", ref_id=0, pos=start, mapq=60, flag=0,
                          cigar=cigar, seq=seq, qual=[35] * 100))
    reads.sort(key=lambda r: r["pos"])
    bam_path = write_synth_bam(tmp_path, reads, ref_name="chrE", ref_len=2000)

    result = subprocess.run(
        [sys.executable, "tools/indel_error_model.py", "--bam", bam_path,
         "--ref", ref_path, "--region", "chrE:1-2000"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    model = json.loads(result.stdout)
    assert "A" in model
    # ~10% slippage at tract length 12 -> phred ~10 at that position.
    phred_at_12 = ord(model["A"][min(11, len(model["A"]) - 1)]) - 33
    assert phred_at_12 <= 15, model


def test_indel_prior_repeat_vs_complex():
    # 1bp deletion in a long homopolymer has a much higher prior than in
    # random context.
    rng = np.random.default_rng(10)
    random_ctx = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 201).tobytes())
    hp_ctx = random_ctx[:95] + b"A" * 12 + random_ctx[107:]
    p_complex = indel_prior(random_ctx, 100, -1)
    p_repeat = indel_prior(hp_ctx, 100, -1)
    assert p_repeat > 10 * p_complex


def test_native_tandem_matches_python_oracle():
    """C++ annotator (native/src/tandem.cpp) is output-identical to the
    Python oracle on random sequences with Ns, both annotate modes."""
    import numpy as np

    from platypus_tpu.models.error_model import _calculate_size_and_displacement_py
    from platypus_tpu.native import native_tandem_annotate

    if native_tandem_annotate(b"ACGT", True) is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    alphabet = np.frombuffer(b"ACGTN", np.uint8)
    for trial in range(12):
        n = int(rng.integers(1, 400))
        seq = bytes(rng.choice(alphabet, size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        if trial % 3 == 0:  # add real repeats
            unit = bytes(rng.choice(alphabet[:4], size=int(rng.integers(1, 6))))
            seq = seq[: n // 2] + unit * 12 + seq[n // 2 :]
        for annotate_all in (False, True):
            ns, nd = native_tandem_annotate(seq, annotate_all)
            ps, pd = _calculate_size_and_displacement_py(seq, annotate_all)
            np.testing.assert_array_equal(ns, ps)
            np.testing.assert_array_equal(nd, pd)
