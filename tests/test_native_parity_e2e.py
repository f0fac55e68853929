"""Whole-caller parity: native host kernels vs pure-Python fallbacks.

The native library accelerates candidate scanning, the INFO re-walk
accounting and read trimming; every one of them must be invisible in the
output.  This runs the same indel-rich region through the caller twice —
once with the library, once with every native path stubbed out — and
requires byte-identical data lines.
"""

import numpy as np
import pytest

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def test_native_and_python_paths_call_identically(tmp_path, monkeypatch):
    from platypus_tpu import native

    if native.load() is None:
        pytest.skip("native library not built")

    ref_path, ref_seq = make_reference(tmp_path, length=26000, seed=29)
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    variants = []
    pos = 1500
    while pos < 23000:
        pos += int(rng.integers(600, 1200))
        kind = rng.random()
        if kind < 0.5:
            variants.append((pos, 1, bytes([int(rng.choice(bases[bases != ref_seq[pos]]))])))
        elif kind < 0.75:
            variants.append((pos, int(rng.integers(1, 5)), b""))          # del
        else:
            variants.append((pos, 0, bytes(rng.choice(bases, size=int(rng.integers(1, 4))))))  # ins
    hap = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap, SimHaplotype(ref_seq, [])], 800, 24000,
                           coverage=22, error_rate=0.01, seed=17)
    bam = write_synth_bam(tmp_path, reads, ref_len=26000)

    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import get_regions, run_single_process

    cfg = PlatypusConfig(bam_files=[bam], ref_file=ref_path,
                         regions=["chr20:1000-24000"], buffer_size=8000)
    regions = get_regions(cfg)

    out_native = str(tmp_path / "native.vcf")
    run_single_process(cfg, regions, out_native)

    # Stub the loader so every caller's fallback runs instead.
    import platypus_tpu.candidates.cigar_gen as cg
    import platypus_tpu.vcfout.records as records

    class _Stub:
        load = staticmethod(lambda auto_build=True: None)

    monkeypatch.setattr(cg, "native", _Stub)
    monkeypatch.setattr(records, "native", _Stub)

    out_py = str(tmp_path / "python.vcf")
    run_single_process(cfg, regions, out_py)

    nat = [l for l in open(out_native) if not l.startswith("##")]
    py = [l for l in open(out_py) if not l.startswith("##")]
    assert len(nat) > 15
    assert nat == py
