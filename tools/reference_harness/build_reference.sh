#!/bin/bash
# Build the reference Platypus 0.8.1 release so it can actually RUN on
# this box (CPython 3.12, no network):
#
#   * htslib 1.3 cannot be fetched -> htslib_lite/ implements the subset
#     Platypus uses (BGZF read/write, BAM decode, BAI query, aux tags)
#     from the public specs;
#   * the release's Cython-0.20-generated C targets the pre-3.11 C-API ->
#     pyhack.h (tp_print, lvalue Py_SIZE/REFCNT/TYPE, 15-arg PyCode_New)
#     plus patch_ref_c.py (private exception/frame field fast paths flip
#     to their portable #else branches);
#   * the py2 driver scripts convert with lib2to3 (they already use
#     `from __future__ import division`), then fixup_ref_py.py applies
#     the py2->py3 runtime fixes 2to3 cannot (bytes at Cython
#     boundaries).
#
# Usage: build_reference.sh <build_dir>
set -e
HARNESS="$(cd "$(dirname "$0")" && pwd)"
BUILD="${1:-/tmp/refbuild}"
TARBALL=/root/reference/release/AllReleases/Platypus_0.8.1.tgz

mkdir -p "$BUILD"
cd "$BUILD"
rm -rf Platypus_0.8.1
tar xzf "$TARBALL"
cd Platypus_0.8.1

python3 "$HARNESS/patch_ref_c.py" ./*.c

PYINC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
CFLAGS="-O2 -fPIC -w -msse2 -msse3 -funroll-loops -D_LARGEFILE64_SOURCE -D_FILE_OFFSET_BITS=64 -include $HARNESS/pyhack.h -I$HARNESS/htslib_lite -I. -I$PYINC"

build() {  # build <module> <sources...>
    local mod="$1"; shift
    gcc $CFLAGS -fopenmp -shared "$@" -o "$mod.so" -lz -lm
    echo "built $mod.so"
}

build htslibWrapper htslibWrapper.c "$HARNESS/htslib_lite/hts_lite.c"
build fastafile fastafile.c
build variant variant.c
build cerrormodel cerrormodel.c tandem.c
build calign calign.c align.c
build chaplotype chaplotype.c align.c
build assembler assembler.c
build platypusutils platypusutils.c "$HARNESS/htslib_lite/hts_lite.c"
build cgenotype cgenotype.c
build vcfutils vcfutils.c
build cpopulation cpopulation.c
build cwindow cwindow.c
build variantFilter variantFilter.c
build variantcaller variantcaller.c

# ctabix + TabProxies (vendored tabix sources; needed for --sourceFile
# input VCFs and HLA typing).
gcc $CFLAGS -Itabix -shared ctabix.c tabix_util.c tabix/*.pysam.c \
    -o ctabix.so -lz -lm
echo "built ctabix.so"
gcc $CFLAGS -shared TabProxies.c -o TabProxies.so -lz
echo "built TabProxies.so"

# py2 -> py3 for the pure-python drivers.
for f in Platypus.py runner.py variantutils.py window.py vcf.py filez.py \
         extendedoptparse.py platypusexceptions.py; do
    python3 -m lib2to3 -w -n "$f" >/dev/null 2>&1 || true
done
python3 "$HARNESS/fixup_ref_py.py" .

echo "reference build complete: $BUILD/Platypus_0.8.1"
