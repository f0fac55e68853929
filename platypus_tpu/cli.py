"""Command-line interface.

`platypus-tpu callVariants ...` / `continueCalling ...` mirror the reference
CLI (/root/reference/src/python/Platypus.py + runner.py:512-599): the same
flag names are accepted (camelCase), mapped onto the PlatypusConfig
dataclass.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys
from typing import List, Optional

from .config import PlatypusConfig
from .utils.fileio import expand_bam_file_names, expand_list_arg

# engine.runner is imported lazily in main(): the CPU-pinned path re-execs
# a fresh interpreter before calling, so an eager import here would be
# paid twice (once in the discarded pre-exec process).

# CLI flag name (reference spelling) -> config field.
_FLAG_MAP = {
    "output": "output",
    "refFile": "ref_file",
    "regions": "regions",
    "skipRegionsFile": "skip_regions_file",
    "bamFiles": "bam_files",
    "bufferSize": "buffer_size",
    "minReads": "min_reads",
    "maxReads": "max_reads",
    "verbosity": "verbosity",
    "maxReadLength": "rlen",
    "logFileName": "log_file_name",
    "source": "source_file",
    "nCPU": "n_cpu",
    "workerPlatform": "worker_platform",
    "parseNCBI": "parse_ncbi",
    "longHaps": "long_haps",
    "alignScoreFile": "align_score_file",
    "HLATyping": "hla_typing",
    "compressReads": "compress_reads",
    "qualBinSize": "qual_bin_size",
    "fileCaching": "file_caching",
    "maxSize": "max_size",
    "largeWindows": "large_windows",
    "maxVariants": "max_variants",
    "coverageSamplingLevel": "coverage_sampling_level",
    "maxHaplotypes": "max_haplotypes",
    "skipDifficultWindows": "skip_difficult_windows",
    "getVariantsFromBAMs": "get_variants_from_bams",
    "genSNPs": "gen_snps",
    "genIndels": "gen_indels",
    "mergeClusteredVariants": "merge_clustered_variants",
    "minFlank": "min_flank",
    "trimReadFlank": "trim_read_flank",
    "filterVarsByCoverage": "filter_vars_by_coverage",
    "filteredReadsFrac": "filtered_reads_frac",
    "maxVarDist": "max_var_dist",
    "minVarDist": "min_var_dist",
    "useEMLikelihoods": "use_em_likelihoods",
    "countOnlyExactIndelMatches": "count_only_exact_indel_matches",
    "calculateFlankScore": "calculate_flank_score",
    "assemble": "assemble",
    "assembleAll": "assemble_all",
    "assemblyRegionSize": "assembly_region_size",
    "assembleBadReads": "assemble_bad_reads",
    "assemblerKmerSize": "assembler_kmer_size",
    "assembleBrokenPairs": "assemble_broken_pairs",
    "noCycles": "no_cycles",
    "minMapQual": "min_map_qual",
    "minBaseQual": "min_base_qual",
    "minGoodQualBases": "min_good_qual_bases",
    "filterDuplicates": "filter_duplicates",
    "filterReadsWithUnmappedMates": "filter_reads_with_unmapped_mates",
    "filterReadsWithDistantMates": "filter_reads_with_distant_mates",
    "filterReadPairsWithSmallInserts": "filter_read_pairs_with_small_inserts",
    "trimOverlapping": "trim_overlapping",
    "trimAdapter": "trim_adapter",
    "trimSoftClipped": "trim_soft_clipped",
    "maxGOF": "max_gof",
    "minPosterior": "min_posterior",
    "sbThreshold": "sb_threshold",
    "scThreshold": "sc_threshold",
    "abThreshold": "ab_threshold",
    "minVarFreq": "min_var_freq",
    "badReadsWindow": "bad_reads_window",
    "badReadsThreshold": "bad_reads_threshold",
    "rmsmqThreshold": "rmsmq_threshold",
    "qdThreshold": "qd_threshold",
    "hapScoreThreshold": "hap_score_threshold",
    "outputRefCalls": "output_ref_calls",
    "refCallBlockSize": "ref_call_block_size",
    "usePallas": "use_pallas",
    "deviceInference": "device_inference",
    "inferenceService": "inference_service",
    "tpuWorkers": "tpu_workers",
    "meshDevices": "mesh_devices",
    "distributed": "distributed",
}

_LIST_FLAGS = {"bamFiles", "regions", "source"}


def build_config(argv: List[str]) -> PlatypusConfig:
    fields = {f.name: f for f in dataclasses.fields(PlatypusConfig)}
    parser = argparse.ArgumentParser(prog="platypus-tpu callVariants")
    for flag, field_name in _FLAG_MAP.items():
        f = fields[field_name]
        if flag in _LIST_FLAGS:
            parser.add_argument(f"--{flag}", type=str, default=None)
        elif f.type in ("int", int):
            parser.add_argument(f"--{flag}", type=int, default=None)
        elif f.type in ("float", float):
            parser.add_argument(f"--{flag}", type=float, default=None)
        else:
            parser.add_argument(f"--{flag}", type=str, default=None)
    parser.add_argument("-o", dest="output_short", type=str, default=None)
    args = parser.parse_args(argv)

    config = PlatypusConfig()
    for flag, field_name in _FLAG_MAP.items():
        value = getattr(args, flag, None)
        if value is None:
            continue
        if flag in _LIST_FLAGS:
            value = expand_list_arg(value)
        setattr(config, field_name, value)
    if args.output_short:
        config.output = args.output_short
    if not config.bam_files or not config.ref_file:
        parser.error("--bamFiles and --refFile are required")
    config.bam_files = expand_bam_file_names(config.bam_files)
    return config


def _maybe_reexec_cpu_only(argv: List[str]) -> None:
    """CPU-pinned CLI runs re-exec once with the TPU-plugin trigger env
    stripped, so the fresh interpreter never pays the sitecustomize jax
    import (~2 s on this image) and the whole run stays native.

    Only fires when the run is EXPLICITLY pinned to the cpu backend
    (PLATYPUS_TPU_PLATFORM=cpu or --workerPlatform=cpu) and nothing in the
    invocation asks for a device (hybrid workers, mesh, distributed).  The
    re-exec'd child is marked so this never loops; PLATYPUS_TPU_NO_REEXEC=1
    opts out entirely."""
    if os.environ.get("_PLATYPUS_TPU_REEXECED") or os.environ.get("PLATYPUS_TPU_NO_REEXEC"):
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no plugin trigger to strip — nothing to gain
    # Only when this process IS the CLI (python -m platypus_tpu.cli or the
    # platypus-tpu console script): an in-process main() call from a test
    # or embedding application must never have its host process replaced.
    argv0 = os.path.basename(sys.argv[0] or "")
    if argv0 not in ("cli.py", "platypus-tpu"):
        return
    if argv[0] not in ("callVariants", "continueCalling"):
        return

    def flag_value(name: str) -> Optional[str]:
        for i, a in enumerate(argv):
            if a == f"--{name}" and i + 1 < len(argv):
                return argv[i + 1]
            if a.startswith(f"--{name}="):
                return a.split("=", 1)[1]
        return None

    platform = os.environ.get("PLATYPUS_TPU_PLATFORM") or flag_value("workerPlatform")
    if platform != "cpu":
        return
    if os.environ.get("PLATYPUS_TPU_HYBRID_WORKER") not in (None, "0"):
        return
    for dev_flag in ("tpuWorkers", "meshDevices", "distributed"):
        v = flag_value(dev_flag)
        if v is not None and v not in ("0", "-1"):
            return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PLATYPUS_TPU_PLATFORM"] = "cpu"
    env["_PLATYPUS_TPU_REEXECED"] = "1"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "platypus_tpu.cli"] + argv, env)


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    if not argv or argv[0] in ("--help", "-h", "help"):
        print("usage: platypus-tpu {callVariants,continueCalling,somatic,denovo} [options]")
        return 0 if argv else 2
    if argv[0] in ("--version", "-V", "version"):
        from . import __version__

        print(f"platypus-tpu {__version__}")
        return 0
    _maybe_reexec_cpu_only(argv)
    command, rest = argv[0], argv[1:]
    if command == "callVariants":
        config = build_config(rest)
        from .engine.runner import run_variant_caller

        run_variant_caller(config)
        return 0
    if command == "continueCalling":
        parser = argparse.ArgumentParser(prog="platypus-tpu continueCalling")
        parser.add_argument("--vcfFile", required=True)
        args = parser.parse_args(rest)
        from .engine.runner import continue_calling

        continue_calling(args.vcfFile)
        return 0
    if command == "somatic":
        # Tumour/normal head (extensions/Cancer CLI contract).
        from .heads.somatic import filter_somatic_vcf

        parser = argparse.ArgumentParser(prog="platypus-tpu somatic")
        parser.add_argument("--inputVCF", required=True)
        parser.add_argument("--outputVCF", required=True)
        parser.add_argument("--tumourSample", required=True)
        parser.add_argument("--normalSample", required=True)
        parser.add_argument("--minPosterior", type=int, default=5)
        args = parser.parse_args(rest)
        with open(args.inputVCF) as src, open(args.outputVCF, "w") as dst:
            n = filter_somatic_vcf(src, dst, args.tumourSample, args.normalSample,
                                   args.minPosterior)
        print(f"wrote {n} somatic calls to {args.outputVCF}")
        return 0
    if command == "denovo":
        # Trio head (extensions/DeNovo CLI contract: inVCF pedFile [ext]).
        from .heads.denovo import filter_denovo_vcf

        parser = argparse.ArgumentParser(prog="platypus-tpu denovo")
        parser.add_argument("inputVCF")
        parser.add_argument("pedFile")
        parser.add_argument("extension", nargs="?", default="")
        args = parser.parse_args(rest)
        stem = args.inputVCF.split(".")[0]
        ext = args.extension
        with open(args.inputVCF) as src, \
                open(f"{stem}_mendelErrors{ext}.vcf", "w") as out_m, \
                open(f"{stem}_deNovoVariants{ext}.vcf", "w") as out_d, \
                open(f"{stem}_deNovoVariantsPassingBayesianFilter{ext}.vcf", "w") as out_f:
            counts = filter_denovo_vcf(src, args.pedFile, out_m, out_d, out_f)
        print(f"Found {counts[0]} mendel errors, {counts[1]} de novos "
              f"({counts[2]} passing the bayesian filter)")
        return 0
    print(f"unknown command {command!r}; use callVariants, continueCalling, "
          f"somatic or denovo")
    return 2


if __name__ == "__main__":
    sys.exit(main())
