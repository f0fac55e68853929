"""Post-hoc VCF stream tools.

Consolidates the reference's scripts/ directory of stdin→stdout VCF
filters and metrics into one CLI (same semantics, python 3):

  tstv            transition/transversion summary      (scripts/computeTsTv.py)
  indel-ratio     ins/del ratio summary                (scripts/computeIndelRatio.py)
  filter-gof      keep samples' GOF < N                (scripts/filterGOF.py / keepGof.py)
  filter-hp       keep records by INFO HP vs threshold (scripts/filterHP.py)
  filter-varfreq  keep TR/TCR > 0.3                    (scripts/filterVarFreq.py)
  filter-totcov   keep records by INFO TC vs threshold (scripts/filterTotCoverage.py)
  clusters        keep / remove / mark variant clusters within N bp
                  (scripts/filterClusters.py, removeClusters.py, markClusters.py)
  split-mnps      split MNP/complex records into SNPs  (scripts/splitMNPsAndComplex.py)
  quals           print QUAL column                    (scripts/printQuals.py)
  filter-tandem   drop long multi-base tandem contexts (scripts/removeTandems.py)
  keep-tr         keep single-alt calls with TR >= N   (scripts/filterTR.py)
  tstv-by-bin     Ts/Tv binned by an INFO key          (scripts/binTsTvByHP.py, binTsTvByPal.py)
  filter-varcov   keep NV/NR fraction >= 0.30          (scripts/filterVarCoverage.py)
  filter-snp-direction  SNPs matching flanking context (scripts/filterSnpDirection.py)
  filter-readthrough    homopolymer-junction SNPs      (scripts/filterReadThrough.py)
  annotate-palindrome   PAL= palindromic-match length  (scripts/annotatePalindromes.py + palindrome.pyx)
  membership      SNP membership summary vs a site VCF (scripts/computePhaseOneMembership.py)
  vcf-checks      structural sanity checks             (scripts/vcfChecks.py)
  keep-gof        keep samples' GOF >= N               (scripts/keepGof.py)
  remove-hps      drop long homopolymer contexts       (scripts/removeHomopolymers.py)
  remove-tandems-and-hps  drop both context classes    (scripts/removeTandemsAndHPs.py)
  filter-pal      keep records by INFO PAL vs spec     (scripts/filterPal.py)
  filter-tu       keep records with len(TU) != N       (scripts/filterTU.py)
  filter-one-sided-hp   SNPs beside a >=N HP run       (scripts/filterOneSidedHP.py)
  filter-two-sided-hp   SNPs inside an ALT-base HP     (scripts/filterTwoSidedHP.py)
  filter-joining-hps    SNPs joining two diff. HPs     (scripts/filterJoiningHPs.py)
  lr-hp-counts    junction-HP overhang classification  (scripts/printLRHpCounts.py)
  count-ref-nonref      pileup ref/non-ref base stats  (scripts/countRefAndNonRefChars.py)
  count-broken-pairs    cross-chrom mate counts (BAM)  (scripts/countBrokenPairs.py)
  hist            histogram of stdin floats to a PNG   (scripts/hist.py)
  indel-ratio-by-bin    ins/del ratio binned by INFO key  (scripts/binIndelRatioByHP.py, byPal)
  plot-gof        GOF histogram PNG                    (scripts/plotGOF.py)
  plot-info       PASS/FAIL INFO-field histograms PNG  (scripts/plotInfo.py)
  plot-var-density      SNP/indel position histograms  (scripts/plotVarDensity.py)
  cortex-only     single-alt calls with last NV == 0   (scripts/printCortexOnlyCalls.py)

All subcommands read VCF text on stdin and write to stdout:
    platypus-tpu-vcf-tools filter-hp '>4' < in.vcf > out.vcf
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator, List, Tuple

# Allow running as a plain script from anywhere in the tree.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRANSITIONS = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}


def _records(stream) -> Iterator[Tuple[List[str], str]]:
    for line in stream:
        if line.startswith("#"):
            yield None, line.rstrip("\n")
        else:
            yield line.rstrip("\n").split("\t"), line.rstrip("\n")


def _info_dict(info: str) -> dict:
    out = {}
    for item in info.split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            out[k] = v
        else:
            out[item] = True
    return out


def cmd_tstv(args, stream, out):
    n_ti = n_tv = n_pass_ti = n_pass_tv = 0
    for cols, _ in _records(stream):
        if cols is None:
            continue
        ref, alts, filt = cols[3], cols[4].split(","), cols[6]
        for alt in alts:
            if len(ref) != 1 or len(alt) != 1:
                continue
            ti = (ref, alt) in TRANSITIONS
            n_ti += ti
            n_tv += not ti
            if filt in ("PASS", "."):
                n_pass_ti += ti
                n_pass_tv += not ti
    print(f"SNPs: {n_ti + n_tv}  Ts: {n_ti}  Tv: {n_tv}  "
          f"Ts/Tv: {n_ti / max(1, n_tv):.3f}", file=out)
    print(f"PASS SNPs: {n_pass_ti + n_pass_tv}  Ts/Tv: "
          f"{n_pass_ti / max(1, n_pass_tv):.3f}", file=out)


def cmd_indel_ratio(args, stream, out):
    n_ins = n_del = 0
    for cols, _ in _records(stream):
        if cols is None:
            continue
        ref = cols[3]
        for alt in cols[4].split(","):
            if len(alt) > len(ref):
                n_ins += 1
            elif len(alt) < len(ref):
                n_del += 1
    print(f"insertions: {n_ins}  deletions: {n_del}  "
          f"ins/del: {n_ins / max(1, n_del):.3f}", file=out)


def cmd_filter_gof(args, stream, out):
    # FORMAT is GT:GL:GOF:GQ:NR:NV -> GOF is field -4 from the end.
    for cols, raw in _records(stream):
        if cols is None:
            continue
        try:
            if int(cols[9].split(":")[-4]) < args.threshold:
                print(raw, file=out)
        except Exception:  # noqa: BLE001 — malformed rows pass through
            print(raw, file=out)


def _cmp(flag: str, value: int, threshold: int) -> bool:
    if flag == ">":
        return value >= threshold
    if flag == "<":
        return value < threshold
    if flag == "=":
        return value == threshold
    raise SystemExit(f"flag must be one of <,>,= (got {flag!r})")


def _filter_by_info(key: str, spec: str, stream, out):
    flag, threshold = spec[0], int(spec[1:])
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        try:
            value = int(float(_info_dict(cols[7])[key].split(",")[0]))
            if _cmp(flag, value, threshold):
                print(raw, file=out)
        except Exception:  # noqa: BLE001
            continue


def cmd_filter_hp(args, stream, out):
    _filter_by_info("HP", args.spec, stream, out)


def cmd_filter_totcov(args, stream, out):
    _filter_by_info("TC", args.spec, stream, out)


def cmd_filter_varfreq(args, stream, out):
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        try:
            info = _info_dict(cols[7])
            tr = int(info["TR"].split(",")[0])
            tcr = int(info["TCR"].split(",")[0])
            if tr / tcr > args.min_frac:
                print(raw, file=out)
        except Exception:  # noqa: BLE001
            continue


def cmd_clusters(args, stream, out):
    """keep: only clustered records; remove: only unclustered; mark:
    annotate FILTER of clustered records with 'Cluster'."""
    cluster: List[Tuple[str, int, List[str], str]] = []

    def flush():
        clustered = len(cluster) > 1
        for _, _, cols, raw in cluster:
            if args.mode == "keep" and clustered:
                print(raw, file=out)
            elif args.mode == "remove" and not clustered:
                print(raw, file=out)
            elif args.mode == "mark":
                if clustered:
                    cols = list(cols)
                    cols[6] = "Cluster" if cols[6] in ("PASS", ".") else cols[6] + ";Cluster"
                    print("\t".join(cols), file=out)
                else:
                    print(raw, file=out)

    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        chrom, pos = cols[0], int(cols[1])
        if cluster and (chrom != cluster[-1][0]
                        or abs(pos - cluster[-1][1]) > args.distance):
            flush()
            cluster = []
        cluster.append((chrom, pos, cols, raw))
    flush()


def cmd_split_mnps(args, stream, out):
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        chrom, pos, vid, ref, alt_field, qual, filt, info = cols[:8]
        rest = "\t".join(cols[8:])
        alts = alt_field.split(",")
        if all(len(a) == len(ref) for a in alts) and len(ref) > 1:
            seen = set()
            for alt in alts:
                for i, (rb, ab) in enumerate(zip(ref, alt)):
                    if rb != ab:
                        seen.add((int(pos) + i, rb, ab))
            for p, rb, ab in sorted(seen):
                print("\t".join([chrom, str(p), vid, rb, ab, qual, filt,
                                 info + ";FromComplex", rest]), file=out)
        else:
            print(raw, file=out)


def cmd_quals(args, stream, out):
    for cols, _ in _records(stream):
        if cols is not None:
            print(cols[5], file=out)


def cmd_filter_tandem(args, stream, out):
    """Drop calls in long multi-base tandem contexts: removed when
    TR*len(TU) > 10 and len(TU) > 1 (scripts/removeTandems.py)."""
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        info = _info_dict(cols[7])
        try:
            tr = int(info.get("TR", "0").split(",")[0])
            tu = info.get("TU", "")
        except ValueError:
            continue
        if tr * len(tu) > 10 and len(tu) > 1:
            continue
        print(raw, file=out)


def cmd_keep_gof(args, stream, out):
    """Keep data lines whose first sample's GOF >= threshold
    (scripts/keepGof.py; GOF is field -4 of GT:GL:GOF:GQ:NR:NV).  The
    reference drops headers and passes malformed rows through."""
    for cols, raw in _records(stream):
        if cols is None:
            continue
        try:
            if int(cols[9].split(":")[-4]) >= args.threshold:
                print(raw, file=out)
        except Exception:  # noqa: BLE001 — malformed rows pass through
            print(raw, file=out)


def cmd_remove_hps(args, stream, out):
    """Drop calls in long homopolymer contexts: removed when
    TR*len(TU) > 5 and len(TU) == 1 (scripts/removeHomopolymers.py)."""
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        info = _info_dict(cols[7])
        try:
            tr = int(info.get("TR", "0").split(",")[0])
            tu = info.get("TU", "")
        except ValueError:
            continue
        if tr * len(tu) > 5 and len(tu) == 1:
            continue
        print(raw, file=out)


def cmd_remove_tandems_and_hps(args, stream, out):
    """Drop both long multi-base tandems (TR*len(TU) > 10, len(TU) > 1)
    and long homopolymers (TR*len(TU) > 5, len(TU) == 1) —
    scripts/removeTandemsAndHPs.py."""
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        info = _info_dict(cols[7])
        try:
            tr = int(info.get("TR", "0").split(",")[0])
            tu = info.get("TU", "")
        except ValueError:
            continue
        n = tr * len(tu)
        if (n > 10 and len(tu) > 1) or (n > 5 and len(tu) == 1):
            continue
        print(raw, file=out)


def cmd_filter_pal(args, stream, out):
    """Keep records whose INFO PAL satisfies '<N'/'>N'/'=N'
    (scripts/filterPal.py; '>' means >=, as there)."""
    flag, threshold = args.spec[0], int(args.spec[1:])
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        try:
            value = int(_info_dict(cols[7])["PAL"].split(",")[0])
            if _cmp(flag, value, threshold):
                print(raw, file=out)
        except Exception:  # noqa: BLE001
            continue


def cmd_filter_tu(args, stream, out):
    """Keep records whose tandem unit length differs from N
    (scripts/filterTU.py)."""
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        try:
            tu = _info_dict(cols[7])["TU"]
            if isinstance(tu, str) and len(tu) != args.threshold:
                print(raw, file=out)
        except Exception:  # noqa: BLE001
            continue


def _hp_context(fa, chrom: str, pos: int):
    """(left 20bp, right 20bp) flanks of a 0-based site; '' at edges."""
    left = fa.get_sequence(chrom, max(0, pos - 20), pos).decode()
    right = fa.get_sequence(chrom, pos + 1, pos + 21).decode()
    return left, right


def _run_lengths(left: str, right: str):
    """Homopolymer run lengths adjacent to the site, each of its own
    flank's nearest base (the reference scripts' 20bp cap)."""
    left_count = 0
    for i in range(1, min(20, len(left)) + 1):
        if left[-i] == left[-1]:
            left_count += 1
        else:
            break
    right_count = 0
    for i in range(min(20, len(right))):
        if right[i] == right[0]:
            right_count += 1
        else:
            break
    return left_count, right_count


def cmd_filter_one_sided_hp(args, stream, out):
    """Keep SNPs with a homopolymer run >= N on either side
    (scripts/filterOneSidedHP.py)."""
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(args.ref)
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1:
            continue
        left, right = _hp_context(fa, cols[0], int(cols[1]) - 1)
        if not left or not right:
            continue
        lc, rc = _run_lengths(left, right)
        if lc >= args.threshold or rc >= args.threshold:
            print(raw, file=out)


def cmd_filter_two_sided_hp(args, stream, out):
    """Keep SNPs flanked on BOTH sides by runs of the ALT base >= N
    (scripts/filterTwoSidedHP.py)."""
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(args.ref)
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1:
            continue
        left, right = _hp_context(fa, cols[0], int(cols[1]) - 1)
        if not left or not right or left[-1] != alt or right[0] != alt:
            continue
        lc = 0
        for i in range(1, min(20, len(left)) + 1):
            if left[-i] == alt:
                lc += 1
            else:
                break
        rc = 0
        for i in range(min(20, len(right))):
            if right[i] == alt:
                rc += 1
            else:
                break
        if lc >= args.threshold and rc >= args.threshold:
            print(raw, file=out)


def cmd_filter_joining_hps(args, stream, out):
    """Keep SNPs joining two DIFFERENT homopolymers, each run >= N
    (scripts/filterJoiningHPs.py)."""
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(args.ref)
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1:
            continue
        left, right = _hp_context(fa, cols[0], int(cols[1]) - 1)
        if not left or not right or left[-1] == right[0]:
            continue
        lc, rc = _run_lengths(left, right)
        if lc >= args.threshold and rc >= args.threshold:
            print(raw, file=out)


def cmd_lr_hp_counts(args, stream, out):
    """Classify junction-HP SNPs by which side the REF extends and print
    the overhang direction lines (scripts/printLRHpCounts.py)."""
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(args.ref)
    for cols, raw in _records(stream):
        if cols is None:
            continue
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1:
            continue
        left, right = _hp_context(fa, cols[0], int(cols[1]) - 1)
        if not left or not right or left[-1] == right[0]:
            continue
        lc, rc = _run_lengths(left, right)
        if ref == left[-1]:
            lc += 1
        elif ref == right[0]:
            rc += 1
        else:
            continue
        if lc < args.threshold or rc < args.threshold:
            continue
        if lc > rc and ref == left[-1]:
            print(f"{ref} --> {alt}. Overhang Left Snp To Right", file=out)
        elif lc < rc and ref == right[0]:
            print(f"{ref} --> {alt}. Overhang Right Snp To Left", file=out)
        elif lc < rc and ref == left[-1]:
            print(f"{ref} --> {alt}. Overhang Right Snp To Right", file=out)
        elif lc > rc and ref == right[0]:
            print(f"{ref} --> {alt}. Overhang Left Snp To Left", file=out)
        elif lc == rc and ref == right[0]:
            print(f"{ref} --> {alt}. Equal Snp To Left", file=out)
        elif lc == rc and ref == left[-1]:
            print(f"{ref} --> {alt}. Equal Snp To Right", file=out)


def cmd_count_ref_nonref(args, stream, out):
    """Per-pileup-row ref/non-ref base counts from samtools pileup text
    (scripts/countRefAndNonRefChars.py)."""
    for line in stream:
        try:
            cols = line.split("\t")
            chars = cols[4].upper()
            n = int(cols[3])
            n_ref = chars.count(".") + chars.count(",")
            n_nonref = sum(chars.count(b) for b in "ACGT")
            print(f"N ref = {n_ref} ({100.0 * n_ref / n} %). "
                  f"N non-ref = {n_nonref} ({100.0 * n_nonref / n} %)",
                  file=out)
        except Exception:  # noqa: BLE001 — parity: skip malformed rows
            continue


def cmd_count_broken_pairs(args, stream, out):
    """Count reads whose mate maps to a different chromosome, per target
    chromosome, with the mate-chromosome breakdown
    (scripts/countBrokenPairs.py, over our own BAM reader).  Deviation:
    unmapped mates (mrnm=-1) are not counted — the reference script
    KeyErrors on them (its defaultdict import is unused)."""
    from collections import Counter

    from platypus_tpu.io.bam import BamFile

    bam = BamFile(args.bam)
    chroms = (args.chroms.split(",") if args.chroms
              else [n for n, _ in bam.references])
    name_by_id = {i: n for i, (n, _) in enumerate(bam.references)}
    lengths = {n: ln for n, ln in bam.references}
    for chrom in chroms:
        if chrom not in lengths:
            continue
        rs = bam.fetch(chrom, 0, lengths[chrom])
        n_reads = len(rs)
        mates = Counter()
        broken = (rs.mate_chrom_id >= 0) & (rs.mate_chrom_id != rs.chrom_id)
        for mid in rs.mate_chrom_id[broken]:
            mates[name_by_id.get(int(mid), str(int(mid)))] += 1
        print(f"N broken pairs for chrom {chrom} = {int(broken.sum())} "
              f"out of {n_reads} reads", file=out)
        print(f"List of chroms with broken pairs that map to chrom {chrom}",
              file=out)
        for name in sorted(mates):
            print(name, mates[name], file=out)


def cmd_hist(args, stream, out):
    """Histogram of one float per stdin line to a PNG (scripts/hist.py;
    file '-' shows interactively there — here it requires a filename)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot

    values = [float(line.strip()) for line in stream if line.strip()]
    pyplot.hist(values, bins=args.bins)
    pyplot.savefig(args.out_file)
    print(f"wrote {args.out_file} ({len(values)} values)", file=out)


def cmd_indel_ratio_by_bin(args, stream, out):
    """Insertion/deletion ratio binned by INFO HP (or another integer key)
    — scripts/binIndelRatioByHP.py / binIndelRatioByPal.py."""
    from collections import defaultdict

    n_ins = defaultdict(int)
    n_del = defaultdict(int)
    total_ins = total_del = 0
    bin_size = args.bin_size
    for cols, raw in _records(stream):
        if cols is None:
            continue
        try:
            ref = cols[3]
            key = int(_info_dict(cols[7]).get(args.key, "0").split(",")[0])
            for alt in cols[4].split(","):
                if len(ref) > len(alt):
                    total_del += 1
                    n_del[key // bin_size] += 1
                elif len(alt) > len(ref):
                    total_ins += 1
                    n_ins[key // bin_size] += 1
        except Exception:  # noqa: BLE001 — parity: skip malformed rows
            continue
    ratio = total_ins / total_del if total_del else -1.0
    print(f"nInsertions = {total_ins}. nDeletions = {total_del}. "
          f"Total = {total_ins + total_del}. Ins/Dels = {ratio}", file=out)
    if bin_size == 1:
        print(f"{args.key} Length\tnIndels\tnIns/nDel", file=out)
    for start in sorted(set(n_ins) | set(n_del)):
        n_indels = n_ins[start] + n_del[start]
        r = n_ins[start] / n_del[start] if n_del[start] else -1.0
        if bin_size == 1:
            print(f"{start}\t{n_indels}\t{r:1.2f}", file=out)
        else:
            print(f"For {start * bin_size} <= {args.key} < "
                  f"{(start + 1) * bin_size}, nIndels = {n_indels}. "
                  f"nIns/nDel = {r:1.2f}", file=out)


def cmd_plot_gof(args, stream, out):
    """Histogram of per-sample GOF values to a PNG (scripts/plotGOF.py)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot

    gofs = []
    for cols, raw in _records(stream):
        if cols is None:
            continue
        try:
            gofs.append(int(cols[9].split(":")[-4]))
        except Exception:  # noqa: BLE001
            continue
    pyplot.hist(gofs, bins=25)
    pyplot.savefig(args.out_file)
    print(f"wrote {args.out_file} ({len(gofs)} values)", file=out)


def cmd_plot_info(args, stream, out):
    """PASS-vs-FAIL histograms of one INFO field to a PNG
    (scripts/plotInfo.py; saves instead of pyplot.show())."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot

    passed, failed = [], []
    for cols, raw in _records(stream):
        if cols is None:
            continue
        info = _info_dict(cols[7])
        if args.field not in info:
            continue
        sink = passed if cols[6] == "PASS" else failed
        for v in str(info[args.field]).split(","):
            try:
                sink.append(float(v))
            except ValueError:
                pass
    pyplot.hist(passed, bins=args.bins, label=f"PASS_{args.field}",
                density=True)
    pyplot.hist(failed, bins=args.bins, label=f"FAIL_{args.field}",
                density=True, alpha=0.5)
    pyplot.legend()
    pyplot.savefig(args.out_file)
    print(f"wrote {args.out_file} ({len(passed)} PASS, {len(failed)} FAIL)",
          file=out)


def cmd_plot_var_density(args, stream, out):
    """SNP/indel position histograms to a PNG (scripts/plotVarDensity.py)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot

    snp_pos, indel_pos = [], []
    for cols, raw in _records(stream):
        if cols is None:
            continue
        ref, alt = cols[3], cols[4]
        if "," in alt:
            continue
        (snp_pos if len(alt) == len(ref) else indel_pos).append(int(cols[1]))
    pyplot.subplot(121)
    pyplot.hist(snp_pos, bins=min(500, max(1, len(snp_pos))), label="snps")
    pyplot.subplot(122)
    pyplot.hist(indel_pos, bins=min(1000, max(1, len(indel_pos))),
                label="indels")
    pyplot.legend()
    pyplot.savefig(args.out_file)
    print(f"wrote {args.out_file} ({len(snp_pos)} SNPs, "
          f"{len(indel_pos)} indels)", file=out)


def cmd_cortex_only(args, stream, out):
    """Print single-alt records whose last sample has NV == 0 — calls
    present only in the other caller of a merged set
    (scripts/printCortexOnlyCalls.py)."""
    for cols, raw in _records(stream):
        if cols is None:
            continue
        if "," in cols[4]:
            continue
        try:
            if int(cols[-1].split(":")[-1]) == 0:
                print(raw, file=out)
        except ValueError:
            continue


ALU_CONSENSUS = [
    ("Consensus alu count",
     "GGCCGGGCGCGGTGGCTCACGCC"),
    ("Alu-Sb count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGCGGATCACGAGGTCAGGAGATCGAGACCATCCTGGCTAACACGGTGAAACCCCGTCTCTACTAAAAATACAAAAATTAGCCGGGCGTGGTGGCGGGCGCCTGTAGTCCCAGCTACTCGGGAGGCTGAGGCAGGAGAATGGCGTGAACCCGGGAGGCGGAGCTTGCAGTGAGCCGAGATCGCGCCACTGCACTCCAGCCTGGGCGACAGAGCGAGACTCCGTCTCAAAAAAAA"),
    ("Alu-Sx count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGCGGATCACCTGAGGTCAGGAGTTCGAGACCAGCCTGGCCAACATGGTGAAACCCCGTCTCTACTAAAAATACAAAAATTAGCCGGGCGTGGTGGCGCGCGCCTGTAATCCCAGCTACTCGGGAGGCTGAGGCAGGAGAATCGCTTGAACCCGGGAGGCGGAGGTTGCAGTGAGCCGAGATCGCGCCACTGCACTCCAGCCTGGGCGACAGAGCGAGACTCCGTCTCAAAAAAAA"),
    ("Alu-Sq count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGTGGATCACCTGAGGTCAGGAGTTCGAGACCAGCCTGGCCAACATGGTGAAACCCCGTCTCTACTAAAAATACAAAAATTAGCCGGGCGTGGTGGCGGGCGCCTGTAATCCCAGCTACTCGGGAGGCTGAGGCAGGAGAATCGCTTGAACCCGGGAGGCGGAGGTTGCAGTGAGCCGAGATCGCGCCACTGCACTCCAGCCTGGGCAACAAGAGCGAAACTCCGTCTCAAAAAAAA"),
    ("Alu-Sp count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGCGGATCACCTGAGGTCGGGAGTTCGAGACCAGCCTGACCAACATGGAGAAACCCCGTCTCTACTAAAAATACAAAAATTAGCCGGGCGTGGTGGCGCATGCCTGTAATCCCAGCTACTCGGGAGGCTGAGGCAGGAGAATCGCTTGAACCCGGGAGGCGGAGGTTGCGGTGAGCCGAGATCGCGCCATTGCACTCCAGCCTGGGCAACAAGAGCGAAACTCCGTCTCAAAAAAAA"),
    ("Alu-Sc count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGCGGATCACGAGGTCAAGAGATCGAGACCATCCTGGCCAACATGGTGAAACCCCGTCTCTACTAAAAATACAAAAATTAGCTGGGCGTGGTGGCGCGCGCCTGTAGTCCCAGCTACTCGGGAGGCTGAGGCAGGAGAATCGCTTGAACCCGGGAGGCGGAGGTTGCAGTGAGCCGAGATCGCGCCACTGCACTCCAGCCTGGCGACAGAGCGAGACTCCGTCTCAAAAAAAA"),
    ("Alu-Sb2 count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGTGGATCATGAGGTCAGGAGATCGAGACCATCCTGGCTAACAAGGTGAAACCCCGTCTCTACTAAAAATACAAAAAATTAGCCGGGCGCGGTGGCGGGCGCCTGTAGTCCCAGCTACTGGGGAGGCTGAGGCAGGAGAATGGCGTGAACCCGGGAAGCGGAGCTTGCAGTGAGCCGAGATTGCGCCACTGCAGTCCGCAGTCCGGCCTGGGCGACAGAGCGAGACTCCGTCTCAAAAAAAA"),
    ("Alu-J count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGAGGATCACTTGAGCCCAGGAGTTCGAGACCAGCCTGGGCAACATAGTGAAACCCCGTCTCTACAAAAAATACAAAAATTAGCCGGGCGTGGTGGCGCGCGCCTGTAGTCCCAGCTACTCGGGAGGCTGAGGCAGGAGGATCGCTTGAGCCCGGGAGGTCGAGGCTGCAGTGAGCCGTGATCGCGCCACTGCACTCCAGCCTGGGCGACAGAGCGAGACCCTGTCTCAAAAAAAA"),
    ("Alu-Sb1 count",
     "GGCCGGGCGCGGTGGCTCACGCCTGTAATCCCAGCACTTTGGGAGGCCGAGGCGGGCGGATCACGAGGTCAGGAGATCGAGACCATCCCGGCTAAAACGGTGAAACCCCGTCTCTACTAAAAATACAAAAATTAGCCGGGCGTAGTGGCGGGCGCCTGTAGTCCCAGCTACTTGGGAGGCTGAGGCAGGAGAATGGCGTGAACCCGGGAGGCGGAGCTTGCAGTGAGCCGAGATCCCGCCACTGCACTCCAGCCTGGGCGACAGAGCGAGACTCCGTCTCAAAAAAAA"),
]


def cmd_count_alus(args, stream, out):
    """Counts of lines containing each Alu-family consensus sequence
    (scripts/countAlus.sh; same sequences, same line-grep semantics)."""
    text = stream.read()
    counts = {name: 0 for name, _ in ALU_CONSENSUS}
    for line in text.splitlines():
        for name, seq in ALU_CONSENSUS:
            if seq in line:
                counts[name] += 1
    for name, _ in ALU_CONSENSUS:
        out.write(f"{name}: {counts[name]}\n")


def cmd_keep_tr(args, stream, out):
    """Keep single-alt calls with TR >= threshold (scripts/filterTR.py)."""
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        if "," in cols[4]:
            continue
        info = _info_dict(cols[7])
        if "TR" in info and int(info["TR"].split(",")[0]) >= args.threshold:
            print(raw, file=out)


def cmd_tstv_by_bin(args, stream, out):
    """Ts/Tv binned by an integer INFO key (HP by default) —
    scripts/binTsTvByHP.py / binTsTvByPal.py."""
    from collections import defaultdict

    n_ts = defaultdict(int)
    n_tv = defaultdict(int)
    for cols, _ in _records(stream):
        if cols is None:
            continue
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1 or alt == ".":
            continue
        info = _info_dict(cols[7])
        try:
            val = int(info.get(args.key, "0").split(",")[0])
        except ValueError:
            val = 0
        b = val // args.bin_size
        if tuple(sorted([ref, alt])) in {("A", "G"), ("C", "T")}:
            n_ts[b] += 1
        else:
            n_tv[b] += 1
    print(f"{args.key} bin\tnSnp\tTsTv", file=out)
    for b in sorted(set(n_ts) | set(n_tv)):
        n_snp = n_ts[b] + n_tv[b]
        tstv = n_ts[b] / n_tv[b] if n_tv[b] > 0 else -1.0
        print(f"{b * args.bin_size}-{(b + 1) * args.bin_size}\t{n_snp}\t{tstv:1.2f}",
              file=out)


def cmd_filter_varcov(args, stream, out):
    """Keep calls whose NV/NR fraction (last two sample subfields) is
    >= 0.30; malformed lines pass through (scripts/filterVarCoverage.py)."""
    for cols, raw in _records(stream):
        if cols is None:
            continue
        try:
            sample = cols[9].split(":")
            n_var = int(sample[-1].split(",")[0])
            n_tot = int(sample[-2].split(",")[0])
            if n_tot > 0 and n_var / n_tot >= args.min_frac:
                print(raw, file=out)
        except (IndexError, ValueError, ZeroDivisionError):
            print(raw, file=out)


def cmd_filter_snp_direction(args, stream, out):
    """Keep SNPs where the base adjacent to the site (in the SC context,
    which has the ref at index 10) equals the ALT on the given side
    (scripts/filterSnpDirection.py: 'lr' checks SC[11], 'rl' SC[9])."""
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1:
            continue
        context = _info_dict(cols[7]).get("SC")
        if not context or len(context) < 12 or context[10] != ref:
            continue
        if args.flag == "lr" and context[11] == alt:
            print(raw, file=out)
        elif args.flag == "rl" and context[9] == alt:
            print(raw, file=out)


def cmd_filter_readthrough(args, stream, out):
    """Keep SNPs at junctions of two different homopolymers where the REF
    matches the SHORTER side's base — the polymerase read-through signature
    (scripts/filterReadThrough.py, including its equal-length tie rules)."""
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(args.ref)
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        chrom, pos = cols[0], int(cols[1]) - 1
        ref, alt = cols[3], cols[4]
        if len(ref) != 1 or len(alt) != 1:
            continue
        left = fa.get_sequence(chrom, pos - 20, pos).decode()
        right = fa.get_sequence(chrom, pos + 1, pos + 21).decode()
        if not left or not right or left[-1] == right[0]:
            continue
        left_count = 0
        for i in range(1, 20):
            if left[-i] == left[-1]:
                left_count += 1
            else:
                break
        right_count = 0
        for i in range(20):
            if right[i] == right[0]:
                right_count += 1
            else:
                break
        if ref == left[-1]:
            left_count += 1
        elif ref == right[0]:
            right_count += 1
        else:
            continue
        if ((left_count < right_count and ref == left[-1])
                or (left_count > right_count and ref == right[0])):
            if left_count >= args.threshold and right_count >= args.threshold:
                print(raw, file=out)


def _lcs(s: str, t: str, a: int = 0, b: float = 1e10):
    """Longest common substring including >=1 char of s[a:b]
    (scripts/palindrome.pyx lcs, incl. its centre-preferring tie break)."""
    l0 = [0] * len(t)
    l1 = [0] * len(t)
    z = 0
    starts = startt = -1
    for i, sc in enumerate(s.upper()):
        for j, tc in enumerate(t.upper()):
            if sc == tc:
                if i == 0 or j == 0:
                    l0[j] = 1 if i < b else 0
                else:
                    l0[j] = l1[j - 1] + 1 if (i < b or l1[j - 1] > 0) else 0
                if l0[j] >= z and i >= a:
                    if l0[j] > z or abs(startt + (z - len(t)) // 2) > abs(j - z + 1 + (z - len(t) // 2)):
                        z = l0[j]
                        starts = i - z + 1
                        startt = j - z + 1
            else:
                l0[j] = 0
        l0, l1 = l1, l0
    return z, starts, startt


def _revcmp(unit: str) -> str:
    return "".join(reversed([{"A": "T", "T": "A", "C": "G", "G": "C"}.get(c, "N")
                             for c in unit.upper()]))


def cmd_annotate_palindrome(args, stream, out):
    """Append PAL=<longest palindromic match length around the allele> to
    INFO (scripts/annotatePalindromes.py; negative --window annotates the
    reference context only).  The reference script also chopped the last
    INFO character when appending — a bug not reproduced here."""
    from platypus_tpu.io.fasta import FastaFile

    fa = FastaFile(args.ref)
    w = abs(args.window)
    for cols, raw in _records(stream):
        if cols is None:
            print(raw, file=out)
            continue
        chrom, pos = cols[0], int(cols[1]) - 1
        ref, alt = cols[3], cols[4].split(",")[0]
        if args.window < 0:
            alt = ref
        seq = fa.get_sequence(chrom, pos - w, pos + w + max(len(ref), len(alt))).decode().upper()
        seq2 = seq[:w] + alt + seq[w + len(ref):]
        if len(alt) > len(ref):
            lng, _s1, _s2 = _lcs(seq2, _revcmp(seq), w + 1, w + len(alt))
        else:
            lng, _s1, _s2 = _lcs(seq, _revcmp(seq2), w + 1, w + len(ref))
        cols[7] = cols[7] + f";PAL={lng}"
        print("\t".join(cols), file=out)


def cmd_membership(args, stream, out):
    """SNP membership summary vs a sites VCF (plain or bgzip) —
    scripts/computePhaseOneMembership.py's counting core."""
    from platypus_tpu.utils.fileio import open_transparent

    sites = set()
    with open_transparent(args.sites) as fh:
        for line in fh:
            if isinstance(line, bytes):
                line = line.decode()
            if line.startswith("#"):
                continue
            c = line.rstrip("\n").split("\t")
            sites.add(f"{c[0]}:{c[1]}:{c[3]}:{c[4]}")
    counts = dict(nSNPs=0, nIn=0, nNotIn=0, nPASS=0, nPASSIn=0, nPASSNotIn=0,
                  nFAIL=0, nFAILIn=0, nFAILNotIn=0)
    for cols, _ in _records(stream):
        if cols is None:
            continue
        if len(cols[3]) != 1 or len(cols[4]) != 1:
            continue
        key = f"{cols[0]}:{cols[1]}:{cols[3]}:{cols[4]}"
        member = key in sites
        counts["nSNPs"] += 1
        counts["nIn" if member else "nNotIn"] += 1
        if cols[6] == "PASS":
            counts["nPASS"] += 1
            counts["nPASSIn" if member else "nPASSNotIn"] += 1
        else:
            counts["nFAIL"] += 1
            counts["nFAILIn" if member else "nFAILNotIn"] += 1
    for k, v in counts.items():
        print(f"{k}\t{v}", file=out)


def cmd_vcf_checks(args, stream, out):
    """Structural sanity checks (scripts/vcfChecks.py): untrimmed ref/alt
    padding, non-monotonic positions; prints one line per problem."""
    last = {}
    n_bad = 0
    for cols, raw in _records(stream):
        if cols is None:
            continue
        chrom, pos = cols[0], int(cols[1])
        ref, alts = cols[3], cols[4].split(",")
        for alt in alts:
            if alt and ref and alt[0] == ref[0] and len(alt) != 1 and len(ref) != 1:
                print(f"untrimmed-padding\t{chrom}:{pos}\t{ref}>{alt}", file=out)
                n_bad += 1
                break
        if chrom in last and pos < last[chrom]:
            print(f"unsorted\t{chrom}:{pos} after {last[chrom]}", file=out)
            n_bad += 1
        last[chrom] = pos
    print(f"problems\t{n_bad}", file=out)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vcf_tools")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("tstv").set_defaults(fn=cmd_tstv)
    sub.add_parser("indel-ratio").set_defaults(fn=cmd_indel_ratio)
    p = sub.add_parser("filter-gof")
    p.add_argument("threshold", type=int)
    p.set_defaults(fn=cmd_filter_gof)
    p = sub.add_parser("filter-hp")
    p.add_argument("spec", help="e.g. '>4', '<10', '=6'")
    p.set_defaults(fn=cmd_filter_hp)
    p = sub.add_parser("filter-totcov")
    p.add_argument("spec")
    p.set_defaults(fn=cmd_filter_totcov)
    p = sub.add_parser("filter-varfreq")
    p.add_argument("--min-frac", type=float, default=0.3)
    p.set_defaults(fn=cmd_filter_varfreq)
    p = sub.add_parser("clusters")
    p.add_argument("mode", choices=["keep", "remove", "mark"])
    p.add_argument("distance", type=int)
    p.set_defaults(fn=cmd_clusters)
    sub.add_parser("split-mnps").set_defaults(fn=cmd_split_mnps)
    sub.add_parser("quals").set_defaults(fn=cmd_quals)
    sub.add_parser("filter-tandem").set_defaults(fn=cmd_filter_tandem)
    p = sub.add_parser("keep-tr")
    p.add_argument("threshold", type=int)
    p.set_defaults(fn=cmd_keep_tr)
    p = sub.add_parser("tstv-by-bin")
    p.add_argument("--key", default="HP")
    p.add_argument("--bin-size", type=int, default=1)
    p.set_defaults(fn=cmd_tstv_by_bin)
    p = sub.add_parser("filter-varcov")
    p.add_argument("--min-frac", type=float, default=0.3)
    p.set_defaults(fn=cmd_filter_varcov)
    p = sub.add_parser("filter-snp-direction")
    p.add_argument("flag", choices=["lr", "rl"])
    p.set_defaults(fn=cmd_filter_snp_direction)
    p = sub.add_parser("filter-readthrough")
    p.add_argument("ref")
    p.add_argument("threshold", type=int)
    p.set_defaults(fn=cmd_filter_readthrough)
    p = sub.add_parser("annotate-palindrome")
    p.add_argument("ref")
    p.add_argument("--window", type=int, default=20)
    p.set_defaults(fn=cmd_annotate_palindrome)
    p = sub.add_parser("membership")
    p.add_argument("sites")
    p.set_defaults(fn=cmd_membership)
    sub.add_parser("vcf-checks").set_defaults(fn=cmd_vcf_checks)
    p = sub.add_parser("keep-gof")
    p.add_argument("threshold", type=int)
    p.set_defaults(fn=cmd_keep_gof)
    sub.add_parser("remove-hps").set_defaults(fn=cmd_remove_hps)
    sub.add_parser("remove-tandems-and-hps").set_defaults(
        fn=cmd_remove_tandems_and_hps)
    p = sub.add_parser("filter-pal")
    p.add_argument("spec")
    p.set_defaults(fn=cmd_filter_pal)
    p = sub.add_parser("filter-tu")
    p.add_argument("threshold", type=int)
    p.set_defaults(fn=cmd_filter_tu)
    for name, fn in (("filter-one-sided-hp", cmd_filter_one_sided_hp),
                     ("filter-two-sided-hp", cmd_filter_two_sided_hp),
                     ("filter-joining-hps", cmd_filter_joining_hps),
                     ("lr-hp-counts", cmd_lr_hp_counts)):
        p = sub.add_parser(name)
        p.add_argument("ref")
        p.add_argument("threshold", type=int)
        p.set_defaults(fn=fn)
    sub.add_parser("count-ref-nonref").set_defaults(fn=cmd_count_ref_nonref)
    p = sub.add_parser("count-broken-pairs")
    p.add_argument("bam")
    p.add_argument("--chroms", default="")
    p.set_defaults(fn=cmd_count_broken_pairs)
    p = sub.add_parser("hist")
    p.add_argument("out_file")
    p.add_argument("bins", type=int)
    p.set_defaults(fn=cmd_hist)
    p = sub.add_parser("indel-ratio-by-bin")
    p.add_argument("bin_size", type=int)
    p.add_argument("--key", default="HP")
    p.set_defaults(fn=cmd_indel_ratio_by_bin)
    p = sub.add_parser("plot-gof")
    p.add_argument("out_file")
    p.set_defaults(fn=cmd_plot_gof)
    p = sub.add_parser("plot-info")
    p.add_argument("field")
    p.add_argument("out_file")
    p.add_argument("--bins", type=int, default=20)
    p.set_defaults(fn=cmd_plot_info)
    p = sub.add_parser("plot-var-density")
    p.add_argument("out_file")
    p.set_defaults(fn=cmd_plot_var_density)
    sub.add_parser("cortex-only").set_defaults(fn=cmd_cortex_only)
    sub.add_parser("count-alus").set_defaults(fn=cmd_count_alus)
    args = parser.parse_args(argv)
    args.fn(args, sys.stdin, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
