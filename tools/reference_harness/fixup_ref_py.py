#!/usr/bin/env python3
"""Post-2to3 runtime fixes for the reference driver scripts.

lib2to3 handles syntax; this applies the small set of semantic fixes the
py3 runtime needs.  Populated iteratively while bringing the reference
up — each entry documents what broke at runtime.  Fixes are (file,
old, new) exact-string replacements so any drift in the upstream release
fails loudly instead of silently mis-patching.
"""

import os
import sys

FIXES = [
    # The py2 version gate: the harness runs the (unmodified) engine on
    # py3.12, so let it through.
    ("Platypus.py",
     "if sys.version_info[0] != 2 or sys.version_info[1] < 6:",
     "if sys.version_info[0] < 2:"),
    # py3 sorted() lost cmp=; functools.cmp_to_key preserves the exact
    # comparator (2to3 does not rewrite these).
    ("runner.py", "import heapq",
     "import heapq\nimport functools"),
    ("runner.py",
     "allRegions = sorted(platypusutils.getRegions(platypusOptions), cmp=regionSort)",
     "allRegions = sorted(platypusutils.getRegions(platypusOptions), key=functools.cmp_to_key(regionSort))"),
    ("runner.py",
     "regions = sorted(platypusutils.getRegions(options), cmp=regionSort)",
     "regions = sorted(platypusutils.getRegions(options), key=functools.cmp_to_key(regionSort))"),
    # continueCalling: getRegions yields BYTES chromosome names (py2
    # str==bytes); the last-line chrom parsed from the VCF is py3 str, so
    # the region-index match never fired.
    ("runner.py",
     "        if region[0] == lastChrom and region[2] == lastPos:",
     "        if (region[0].decode('latin-1') if isinstance(region[0], "
     "bytes) else region[0]) == lastChrom and region[2] == lastPos:"),
    # The merge step re-reads the (text-shimmed) gzip temp files and
    # writes the final VCF: text mode on py3.
    ("runner.py",
     "outputVCF = Open(finalFileName, 'wb')",
     "outputVCF = Open(finalFileName, 'w')"),
    ("runner.py",
     "theFile = Open(fileName, 'rb')",
     "theFile = Open(fileName, 'r')"),
    # Chromosome names stay bytes through the engine (the bytes-world
    # fastafile index keys them); the region strings the engine formats
    # for BAM fetches therefore read "b'chr20':0-100" — htslib-lite's
    # bam_name2id strips the wrapper.  The final merge writes the VCF:
    # clean the CHROM column there.
    ("runner.py", "import heapq\nimport functools",
     "import heapq\nimport functools\nimport re as _re\n"
     "def _clean_chrom(line):\n"
     "    # the engine's bytes values %s-format as b'..' — strip every\n"
     "    # wrapper (VCF fields never contain quotes)\n"
     "    return _re.sub(r\"b'([^']*)'\", r'\\1', line)"),
    ("runner.py",
     "                if index == 0:\n                    outputVCF.write(line)",
     "                if index == 0:\n                    outputVCF.write(_clean_chrom(line))"),
    ("runner.py",
     "        nextFile = heapq.heappop(theHeap)\n        outputVCF.write(nextFile.line)",
     "        nextFile = heapq.heappop(theHeap)\n"
     "        outputVCF.write(_clean_chrom(nextFile.line))"),
    # Sample names reach the record dict as bytes (read-buffer path) but
    # the header samples are str: normalise the dict keys.
    ("vcf.py",
     "    def write_data(self, stream, data):\n"
     "        required = ['chrom','pos','id','ref','alt','qual','filter','info','format'] + self._samples",
     "    def _debytes(self, x):\n"
     "        if isinstance(x, bytes):\n"
     "            return x.decode('latin-1')\n"
     "        if isinstance(x, list):\n"
     "            return [self._debytes(i) for i in x]\n"
     "        if isinstance(x, tuple):\n"
     "            return tuple(self._debytes(i) for i in x)\n"
     "        if isinstance(x, dict):\n"
     "            return {self._debytes(k): self._debytes(v) for k, v in x.items()}\n"
     "        return x\n"
     "\n"
     "    def write_data(self, stream, data):\n"
     "        data = self._debytes(data)\n"
     "        required = ['chrom','pos','id','ref','alt','qual','filter','info','format'] + self._samples"),
    # py2's str(float) was 12-significant-digit 'g' with a trailing .0 for
    # integral values; py3's repr would leak 17-digit floats into the VCF.
    ("vcf.py",
     "    def format_formatdata( self, data, format, key=True, value=True, separator=\":\" ):",
     "    @staticmethod\n"
     "    def _py2str(x):\n"
     "        if isinstance(x, float):\n"
     "            s = '%.12g' % x\n"
     "            if '.' not in s and 'e' not in s and 'n' not in s:\n"
     "                s += '.0'\n"
     "            return s\n"
     "        return str(x)\n"
     "\n"
     "    def format_formatdata( self, data, format, key=True, value=True, separator=\":\" ):"),
    ("vcf.py",
     "                if v != None: output.append( k+\"=\"+','.join(map(str,v)) )",
     "                if v != None: output.append( k+\"=\"+','.join(map(self._py2str,v)) )"),
    ("vcf.py",
     "                if v != None: output.append( ','.join(map(str,v)) )",
     "                if v != None: output.append( ','.join(map(self._py2str,v)) )"),
    # The engine passes bytes chromosome names into the tabix fetch; the
    # vendored tabix needs the plain name in its region string.
    ("variantutils.py",
     "vcfLines = vcfFile.fetch(chromosome, start, end, parser=ctabix.asVCF())",
     "vcfLines = vcfFile.fetch(chromosome.decode('latin-1') if "
     "isinstance(chromosome, bytes) else chromosome, start, end, "
     "parser=ctabix.asVCF())"),
    # TabProxies fields are bytes: split on bytes commas and validate with
    # a bytes-aware base set.
    ("variantutils.py",
     "                alts = altCol.split(\",\")",
     "                alts = altCol.split(b\",\" if isinstance(altCol, bytes) else \",\")"),
    ("variantutils.py",
     "    variants   = line.alt.split(\",\")",
     "    variants   = line.alt.split(b\",\" if isinstance(line.alt, bytes) else \",\")"),
    ("variantutils.py",
     "    validBases = set(['A', 'C', 'G', 'T', 'N'])",
     "    validBases = set(['A', 'C', 'G', 'T', 'N']) | set(b'ACGTN')"),
    ("variantutils.py",
     "        logger.warning(\"Invalid reference sequence at chromosome \" + chromosome)",
     "        logger.warning(\"Invalid reference sequence at chromosome %s\" % chromosome)"),
    ("variantutils.py",
     "        logger.warning(\"Invalid alternative at chromosome \" + chromosome)",
     "        logger.warning(\"Invalid alternative at chromosome %s\" % chromosome)"),
    ("variantutils.py",
     "        logger.warning(\"Non inetgral position at chromosome \" + chromosome)",
     "        logger.warning(\"Non inetgral position at chromosome %s\" % chromosome)"),
    # Region chroms are bytes; keep the numeric-chromosome sort semantics.
    ("runner.py",
     "        chrom1 = int(chrom1.replace(\"chr\", \"\"))\n"
     "        chrom2 = int(chrom2.replace(\"chr\", \"\"))",
     "        chrom1 = int((chrom1.replace(b\"chr\", b\"\") if isinstance(chrom1, bytes)"
     " else chrom1.replace(\"chr\", \"\")))\n"
     "        chrom2 = int((chrom2.replace(b\"chr\", b\"\") if isinstance(chrom2, bytes)"
     " else chrom2.replace(\"chr\", \"\")))"),
]


def main(d):
    for fname, old, new in FIXES:
        path = os.path.join(d, fname)
        text = open(path).read()
        if old not in text:
            raise SystemExit(f"fixup target not found in {fname}: {old!r}")
        open(path, "w").write(text.replace(old, new))
        print(f"fixed {fname}: {old[:50]!r}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
