"""Live multi-host smoke: two real processes through jax.distributed.

The dryrun (parallel/mesh.py) validates sharded compilation; this test
validates the actual multi-host driver — coordinator handshake, region
sharding, per-host temp VCFs, barrier, host-0 merge — with two local
processes on the CPU backend, and checks the merged output is
byte-identical (data lines) to a single-process run.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single(tmp_path):
    ref_path, ref_seq = make_reference(tmp_path, length=34000, seed=21)
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    variants = []
    pos = 1200
    while pos < 31000:
        pos += int(rng.integers(700, 1500))
        variants.append((pos, 1, bytes([int(rng.choice(bases[bases != ref_seq[pos]]))])))
    hap = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap, SimHaplotype(ref_seq, [])], 500, 32000, coverage=25,
                           seed=8)
    bam = write_synth_bam(tmp_path, reads, ref_len=34000)

    # Single-process baseline (this process, CPU backend via conftest).
    from platypus_tpu.config import PlatypusConfig
    from platypus_tpu.engine.runner import get_regions, run_single_process

    region_arg = "chr20:500-32000"
    base_cfg = PlatypusConfig(bam_files=[bam], ref_file=ref_path,
                              regions=[region_arg], buffer_size=8000)
    single_out = str(tmp_path / "single.vcf")
    run_single_process(base_cfg, get_regions(base_cfg), single_out)

    # Two coordinated worker processes.
    port = _free_port()
    dist_out = str(tmp_path / "dist.vcf")
    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        from platypus_tpu.config import PlatypusConfig
        from platypus_tpu.parallel.distributed import run_distributed

        cfg = PlatypusConfig(bam_files=[{bam!r}], ref_file={ref_path!r},
                             regions=[{region_arg!r}], buffer_size=8000,
                             output={dist_out!r})
        run_distributed(cfg, coordinator_address="127.0.0.1:{port}",
                        num_processes=2, process_id=int(sys.argv[1]))

        # Cross-host metric reduction: asymmetric keys, summed values.
        from platypus_tpu.parallel.distributed import aggregate_metrics
        me = int(sys.argv[1])
        totals = aggregate_metrics({{"reads": 10.0 * (me + 1), f"only{{me}}": 1.5}})
        print("TOTALS", sorted(totals.items()))
    """))
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())

    expect = "TOTALS [('only0', 1.5), ('only1', 1.5), ('reads', 30.0)]"
    for out in outs:
        assert expect in out, out

    single = [l for l in open(single_out) if not l.startswith("#")]
    dist = [l for l in open(dist_out) if not l.startswith("#")]
    assert len(single) > 5
    assert dist == single
