"""General VCF 3.3 / 4.0 / 4.1 reader-writer.

The calling pipeline itself reads candidate VCFs through io/vcfsource.py
and writes through vcfout/writer.py; this module is the standalone
general-purpose library the reference ships as src/python/vcf.py:92-953 —
typed ##INFO/##FILTER/##FORMAT schemas, version-specific allele
conventions (v3.3 I/D alleles are rewritten to v4.0 padded alleles),
a configurable error policy, region filtering, genotype parsing, write
round-trips, call comparison, and a whole-file sorted reader.

API names follow the reference so its users can switch directly:
``VCF().parse(stream)`` yields per-record dicts with 0-based positions;
``ignoreerror``/``warnerror`` tune the error policy by name.
"""

from __future__ import annotations

import bisect
import re
import sys
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

_GTS_RE = re.compile(r"[|/\\]")
_ALLELE_RE = re.compile(r"^[ACGTN]+$")


@dataclass
class FieldDef:
    """One ##INFO/##FILTER/##FORMAT declaration (reference vcf.py:49)."""

    id: str
    numbertype: int
    number: int
    type: str
    description: str
    missingvalue: object


# The reference exposes this tuple type as vcf.FORMAT.
FORMAT = FieldDef


def get_sequence(chrom: str, start: int, end: int, fa) -> str:
    """Reference-backed fill-in ('N's when no FASTA given) —
    reference vcf.py:55-63."""
    if fa is None:
        return "N" * max(0, end - start)
    seq = fa.fetch(chrom, start, end)
    if isinstance(seq, bytes):
        seq = seq.decode()
    seq = seq.upper()
    if len(seq) < end - start:
        seq += "N" * (end - start - len(seq))
    return seq


def parse_regions(string: str) -> List[Tuple[str, int, int]]:
    """'chrom:start-end,...' with 1-based inclusive input converted to
    0-based half-open (reference vcf.py:66-89)."""
    out = []
    for r in string.split(","):
        if ":" in r:
            chrom, rng = r.split(":", 1)
            start, _, end = rng.partition("-")
            out.append((chrom, int(start or "1") - 1,
                        int(end) if end else sys.maxsize))
        else:
            out.append((r, 0, sys.maxsize))
    return out


class VCFError(ValueError):
    pass


class VCF:
    """Version-aware VCF parser/writer (reference vcf.py:92-870)."""

    NT_UNKNOWN = 0
    NT_NUMBER = 1
    NT_ALLELES = 2
    NT_NR_ALLELES = 3
    NT_GENOTYPES = 4
    NT_PHASED_GENOTYPES = 5

    _errors = {
        0: "UNKNOWN_FORMAT_STRING:Unknown file format identifier",
        1: "BADLY_FORMATTED_FORMAT_STRING:Formatting error in the format string",
        2: "BADLY_FORMATTED_HEADING:Did not find 9 required headings %s",
        3: "BAD_NUMBER_OF_COLUMNS:Wrong number of columns found (%s)",
        4: "POS_NOT_NUMERICAL:Position column is not numerical",
        5: "UNKNOWN_CHAR_IN_REF:Unknown character in reference field",
        6: "V33_BAD_REF:Reference should be single-character in v3.3 VCF",
        7: "V33_BAD_ALLELE:Cannot interpret allele for v3.3 VCF",
        8: "POS_NOT_POSITIVE:Position field must be >0",
        9: "QUAL_NOT_NUMERICAL:Quality field must be numerical, or '.'",
        10: "ERROR_INFO_STRING:Error while parsing info field",
        11: "ERROR_UNKNOWN_KEY:Unknown key (%s) found in formatted field",
        12: "ERROR_FORMAT_NOT_NUMERICAL:Expected number in formatted field; got %s",
        13: "ERROR_FORMAT_NOT_CHAR:Expected character in formatted field",
        14: "FILTER_NOT_DEFINED:Filter identifier (%s) not defined in header",
        15: "FORMAT_NOT_DEFINED:Format identifier (%s) not defined in header",
        16: "BAD_NUMBER_OF_VALUES:Found too many values in sample column (%s)",
        17: "BAD_NUMBER_OF_PARAMETERS:Unexpected number of parameters (%s)",
        18: "BAD_GENOTYPE:Cannot parse genotype (%s)",
        19: "V40_BAD_ALLELE:Bad allele found for v4.0 VCF (%s)",
        20: "MISSING_REF:Reference allele missing",
        21: "V33_UNMATCHED_DELETION:Deleted sequence does not match reference (%s)",
        22: "V40_MISSING_ANGLE_BRACKETS:Format definition not in angle brackets",
        23: "FORMAT_MISSING_QUOTES:Description not surrounded by quotes",
        24: "V40_FORMAT_MUST_HAVE_NAMED_FIELDS:v4.0 format fields must be named",
        25: "HEADING_NOT_SEPARATED_BY_TABS:Heading separated by spaces, not tabs",
        26: "WRONG_REF:Wrong reference %s",
        27: "ERROR_TRAILING_DATA:Numerical field ('%s') has trailing data",
        28: "BAD_CHR_TAG:Error calculating chr tag for %s",
        29: "ZERO_LENGTH_ALLELE:Found zero-length allele",
        30: "MISSING_INDEL_ALLELE_REF_BASE:Indel alleles must begin with one reference base",
        31: "ERROR_NON_FLAG_WITHOUT_VALUE:Formatted field is not a flag but has no value",
        32: "ERROR_FLAG_HAS_VALUE:Flag fields must not have a value",
    }

    _required = ["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
                 "INFO", "FORMAT"]

    def __init__(self, reference=None, regions=None, lines=None,
                 leftalign: bool = False, _fastGT: bool = False):
        for code, text in self._errors.items():
            setattr(self, text.split(":")[0], code)
        self._header: List[Tuple[str, str]] = []
        self._version = 40
        self._info: Dict[str, FieldDef] = {}
        self._filter: Dict[str, FieldDef] = {}
        self._format: Dict[str, FieldDef] = {}
        self._samples: List[str] = []
        self._ignored_errors = {self.ERROR_UNKNOWN_KEY}
        self._warn_errors: set = set()
        self._reference = reference
        self._regions = regions
        self._leftalign = leftalign
        self._fastGT = _fastGT
        self._lines = lines
        self._lineno = -1
        self._line: Optional[str] = None

    # -- error policy (reference vcf.py:175-183) -------------------------
    def error(self, line, code: int, opt=None) -> None:
        if code in self._ignored_errors:
            return
        text = self._errors[code]
        if opt is not None:
            try:
                text = text % opt
            except TypeError:
                text = f"{text} ({opt})"
        msg = f"Error parsing vcf: {text}\n{line}"
        if code in self._warn_errors:
            print(f"Warning: {msg}", file=sys.stderr)
            return
        raise VCFError(msg)

    # -- header ----------------------------------------------------------
    def parse_format(self, line: str, text: str, filter: bool = False) -> FieldDef:
        """One <ID=..,Number=..,Type=..,Description=".."> declaration
        (reference vcf.py:184-246; v3.3 allows unbracketed positional)."""
        if self._version >= 40:
            if not text.startswith("<"):
                self.error(line, self.V40_MISSING_ANGLE_BRACKETS)
                text = "<" + text
            if not text.endswith(">"):
                self.error(line, self.V40_MISSING_ANGLE_BRACKETS)
                text += ">"
            text = text[1:-1]
        data = {"id": None, "number": None, "type": None, "descr": None}
        idx = 0
        while text.strip():
            elts = text.strip().split(",")
            first, rest = elts[0], ",".join(elts[1:])
            if "=" not in first or ('"' in first
                                    and first.find("=") > first.find('"')):
                if self._version >= 40:
                    self.error(line, self.V40_FORMAT_MUST_HAVE_NAMED_FIELDS)
                if idx == 4:
                    self.error(line, self.BADLY_FORMATTED_FORMAT_STRING)
                first = ["ID=", "Number=", "Type=", "Description="][idx] + first
            if first.startswith("ID="):
                data["id"] = first.split("=", 1)[1]
            elif first.startswith("Number="):
                data["number"] = first.split("=", 1)[1]
            elif first.startswith("Type="):
                data["type"] = first.split("=", 1)[1]
            elif first.startswith("Description="):
                elts = text.split('"')
                if len(elts) < 3:
                    self.error(line, self.FORMAT_MISSING_QUOTES)
                    elts = first.split("=") + [rest]
                data["descr"] = elts[1]
                rest = '"'.join(elts[2:])
                if rest.startswith(","):
                    rest = rest[1:]
            else:
                # v4.1 extras (Source=/Version=) pass through silently.
                pass
            text = rest
            idx += 1
            if filter and idx == 1:
                idx = 3
        if not data["id"]:
            self.error(line, self.BADLY_FORMATTED_FORMAT_STRING)
        if data["descr"] is None:
            self.error(line, self.BADLY_FORMATTED_FORMAT_STRING)
            data["descr"] = "<none>"
        if not data["type"] and not data["number"]:
            return FieldDef(data["id"], self.NT_NUMBER, 0, "Flag",
                            data["descr"], ".")
        if data["type"] not in ("Integer", "Float", "Character", "String",
                                "Flag"):
            self.error(line, self.BADLY_FORMATTED_FORMAT_STRING)
        missing = None if data["type"] in ("Integer", "Float") else "."
        if not data["number"]:
            self.error(line, self.BADLY_FORMATTED_FORMAT_STRING)
        try:
            n = int(data["number"])
            t = self.NT_NUMBER
        except (TypeError, ValueError):
            n = -1
            t = {
                ".": self.NT_UNKNOWN,
                "#alleles": self.NT_ALLELES, "A": self.NT_ALLELES,
                "#nonref_alleles": self.NT_NR_ALLELES,
                "#genotypes": self.NT_GENOTYPES, "G": self.NT_GENOTYPES,
                "#phased_genotypes": self.NT_PHASED_GENOTYPES,
            }.get(data["number"])
            if t is None:
                self.error(line, self.BADLY_FORMATTED_FORMAT_STRING)
                t = self.NT_UNKNOWN
        return FieldDef(data["id"], t, n, data["type"], data["descr"], missing)

    def format_format(self, fmt: FieldDef, filter: bool = False) -> str:
        values = [("ID", fmt.id)]
        if fmt.number is not None and not filter:
            nmb = {self.NT_UNKNOWN: ".", self.NT_ALLELES: "#alleles",
                   self.NT_NR_ALLELES: "#nonref_alleles",
                   self.NT_GENOTYPES: "#genotypes",
                   self.NT_PHASED_GENOTYPES: "#phased_genotypes"}.get(
                       fmt.numbertype, str(fmt.number))
            values += [("Number", nmb), ("Type", fmt.type)]
        values.append(("Description", '"' + fmt.description + '"'))
        if self._version == 33:
            return ",".join(v for _k, v in values)
        return "<" + ",".join(f"{k}={v}" for k, v in values) + ">"

    def get_expected(self, key: str, formatdict, alt: Sequence[str]) -> int:
        fmt = formatdict.get(key)
        if fmt is None or fmt.numbertype == self.NT_UNKNOWN:
            return -1
        return {
            self.NT_NUMBER: fmt.number,
            self.NT_ALLELES: len(alt) + 1,
            self.NT_NR_ALLELES: len(alt),
            self.NT_GENOTYPES: ((len(alt) + 1) * (len(alt) + 2)) // 2,
            self.NT_PHASED_GENOTYPES: (len(alt) + 1) * (len(alt) + 1),
        }.get(fmt.numbertype, 0)

    def _add_definition(self, formatdict, key, data, line) -> None:
        if key in formatdict:
            return
        self.error(line, self.ERROR_UNKNOWN_KEY, key)
        if data is None:
            formatdict[key] = FieldDef(key, self.NT_NUMBER, 0, "Flag",
                                       "(Undefined tag)", ".")
            return
        if data == []:
            data = [""]
        if isinstance(data[0], float):
            formatdict[key] = FieldDef(key, self.NT_UNKNOWN, -1, "Float",
                                       "(Undefined tag)", None)
        elif isinstance(data[0], int):
            formatdict[key] = FieldDef(key, self.NT_UNKNOWN, -1, "Integer",
                                       "(Undefined tag)", None)
        else:
            formatdict[key] = FieldDef(key, self.NT_UNKNOWN, -1, "String",
                                       "(Undefined tag)", ".")

    def format_formatdata(self, data, fmt, key=True, value=True,
                          separator=":") -> str:
        """(reference vcf.py:297-329, incl. trailing-missing trimming)."""
        output, sdata = [], []
        if isinstance(data, list):
            data = {k: [] for k in data}
        for k in data:
            self._add_definition(fmt, k, data[k], "(output)")
            data[k] = ["." if v == fmt[k].missingvalue else v
                       for v in data[k]]
        for k in data:
            if k != "GT":
                sdata.append((k, data[k]))
        sdata.sort()
        if "GT" in data:
            sdata = [("GT", [self.convertGTback(x) for x in data["GT"]])] + sdata
        for k, v in sdata:
            if v == []:
                v = None
            if key and value:
                output.append(k + "=" + ",".join(map(str, v))
                              if v is not None else k)
            elif key:
                output.append(k)
            elif value:
                output.append(",".join(map(str, v)) if v is not None else ".")
        while len(output) > 1:
            if output[-1].replace(",", "").replace(".", ""):
                break
            output = output[:-1]
        return separator.join(output)

    def enter_default_format(self) -> None:
        for f in (FieldDef("GT", self.NT_NUMBER, 1, "String", "Genotype", "."),
                  FieldDef("GQ", self.NT_NUMBER, 1, "Integer",
                           "Genotype Quality", -1),
                  FieldDef("DP", self.NT_NUMBER, 1, "Integer",
                           "Read depth at this position for this sample", -1),
                  FieldDef("HQ", self.NT_UNKNOWN, -1, "Integer",
                           "Haplotype Quality", -1),
                  FieldDef("FT", self.NT_NUMBER, 1, "String",
                           "Sample Genotype Filter", ".")):
            self._format.setdefault(f.id, f)

    def parse_header(self, line: str) -> None:
        assert line.startswith("##")
        key, _, value = line[2:].partition("=")
        key, value = key.strip(), value.strip()
        if key == "fileformat":
            versions = {"VCFv3.3": 33, "VCFv4.0": 40, "VCFv4.1": 41}
            if value in versions:
                self._version = versions[value]
            else:
                self.error(line, self.UNKNOWN_FORMAT_STRING)
        elif key == "INFO":
            f = self.parse_format(line, value)
            self._info[f.id] = f
        elif key == "FILTER":
            f = self.parse_format(line, value, filter=True)
            self._filter[f.id] = f
        elif key == "FORMAT":
            f = self.parse_format(line, value)
            self._format[f.id] = f
        else:
            self._header.append((key, value))

    def write_header(self, stream) -> None:
        stream.write("##fileformat=VCFv%s.%s\n"
                     % (self._version // 10, self._version % 10))
        for key, value in self._header:
            stream.write(f"##{key}={value}\n")
        for var, label in ((self._info, "INFO"), (self._filter, "FILTER"),
                           (self._format, "FORMAT")):
            for f in var.values():
                stream.write("##%s=%s\n"
                             % (label, self.format_format(
                                 f, filter=(label == "FILTER"))))

    def parse_heading(self, line: str) -> None:
        assert line.startswith("#") and not line.startswith("##")
        headings = line[1:].split("\t")
        if len(headings) == 1 and len(line[1:].split()) >= 9:
            self.error(line, self.HEADING_NOT_SEPARATED_BY_TABS)
            headings = line[1:].split()
        for i, s in enumerate(self._required):
            if len(headings) <= i or headings[i] != s:
                if len(headings) == 8:
                    headings.append("FORMAT")
                else:
                    err = (f"({i + 1}th entry not found)"
                           if len(headings) <= i
                           else f"(found {headings[i]}, expected {s})")
                    self.error(line, self.BADLY_FORMATTED_HEADING, err)
        self._samples = headings[9:]

    def write_heading(self, stream) -> None:
        stream.write("#" + "\t".join(self._required + self._samples) + "\n")

    # -- genotypes ---------------------------------------------------------
    def convertGT(self, gt: str):
        """'0/1' -> [0, '/', 1]; '.' stays ['.'] (reference vcf.py:410-428)."""
        if gt in (".", "1", "") or gt.startswith(".:"):
            return ["."]
        try:
            gts = _GTS_RE.split(gt)
            if len(gts) == 1:
                return [int(gts[0])]
            if len(gts) != 2:
                raise ValueError()
            sep = gt[len(gts[0]):-len(gts[1])]
            if gts[0] == "." and gts[1] == ".":
                return [gts[0], sep, gts[1]]
            return [int(gts[0]), sep, int(gts[1])]
        except ValueError:
            self.error(self._line, self.BAD_GENOTYPE, gt)
            return [".", "|", "."]

    def convertGTback(self, gtdata) -> str:
        return "".join(map(str, gtdata))

    def parse_formatdata(self, key, value, formatdict, line):
        """Typed decode of one INFO/FORMAT value list
        (reference vcf.py:434-479)."""
        f = formatdict.get(key)
        if f is None:
            self._add_definition(formatdict, key, value, line)
            f = formatdict[key]
        if f.type == "Flag":
            if value is not None:
                self.error(line, self.ERROR_FLAG_HAS_VALUE)
            return []
        if value is None:
            self.error(line, self.ERROR_NON_FLAG_WITHOUT_VALUE)
            return []
        values = value.split(",")
        if f.type in ("Float", "Integer") and values and ";" in values[-1]:
            self.error(line, self.ERROR_TRAILING_DATA, values[-1])
            values[-1] = values[-1].split(";")[0]
        if f.type == "Integer":
            try:
                return [f.missingvalue if v == "." else int(v)
                        for v in values]
            except ValueError:
                self.error(line, self.ERROR_FORMAT_NOT_NUMERICAL, values)
                return [0] * len(values)
        if f.type == "String":
            self._line = line
            if f.id == "GT":
                return [self.convertGT(v) for v in values]
            return values
        if f.type == "Character":
            for v in values:
                if len(v) != 1:
                    self.error(line, self.ERROR_FORMAT_NOT_CHAR)
            return values
        if f.type == "Float":
            try:
                return [f.missingvalue if v == "." else float(v)
                        for v in values]
            except ValueError:
                self.error(line, self.ERROR_FORMAT_NOT_NUMERICAL, values)
                return [0.0] * len(values)
        self.error(line, self.ERROR_INFO_STRING)
        return []

    def inregion(self, chrom: str, pos: int) -> bool:
        if not self._regions:
            return True
        return any(r[0] == chrom and r[1] <= pos < r[2]
                   for r in self._regions)

    # -- records -----------------------------------------------------------
    def parse_data(self, line: str, lineparse: bool = False,
                   parseGenotypes: bool = True):
        """One data line -> record dict with 0-based pos
        (reference vcf.py:489-708, incl. v3.3 allele rewriting,
        trailing-base trimming and optional left-alignment)."""
        cols = line.split("\t")
        if len(cols) != len(self._samples) + 9:
            if len(cols) == 8 and not self._samples:
                cols.append("")
            else:
                self.error(line, self.BAD_NUMBER_OF_COLUMNS, len(cols))
        chrom = cols[0]
        try:
            pos = int(cols[1]) - 1
        except ValueError:
            self.error(line, self.POS_NOT_NUMERICAL)
            pos = 0
        if pos < 0:
            self.error(line, self.POS_NOT_POSITIVE)
        if not self.inregion(chrom, pos):
            return None
        if lineparse:
            return chrom, pos, line

        rid = cols[2]
        ref = cols[3].upper()
        if ref == ".":
            self.error(line, self.MISSING_REF)
            ref = (get_sequence(chrom, pos, pos + 1, self._reference)
                   if self._version == 33 else "")
        else:
            for c in ref:
                if c not in "ACGTN":
                    self.error(line, self.UNKNOWN_CHAR_IN_REF)
            if "N" in ref:
                ref = get_sequence(chrom, pos, pos + len(ref), self._reference)

        left = max(0, pos - 100)
        faref_leftflank = None
        if self._reference:
            faref_leftflank = get_sequence(chrom, left, pos + len(ref),
                                           self._reference)
            faref = faref_leftflank[pos - left:]
            if faref != ref:
                self.error(line, self.WRONG_REF,
                           f"(reference is {faref}, VCF says {ref})")
            ref = faref

        alt = [] if cols[4] == "." else cols[4].upper().split(",")

        if cols[5] == ".":
            qual = -1.0
        else:
            try:
                qual = float(cols[5])
            except ValueError:
                self.error(line, self.QUAL_NOT_NUMERICAL)
                qual = -1.0

        if cols[6] in (".", "PASS", "0"):
            filt: List[str] = []
        else:
            filt = cols[6].split(";")

        info = {}
        if cols[7] not in (".", ""):
            for item in cols[7].split(";"):
                elts = item.split("=")
                if len(elts) == 1:
                    v = None
                elif len(elts) == 2:
                    v = elts[1]
                else:
                    self.error(line, self.ERROR_INFO_STRING)
                    v = elts[1]
                info[elts[0]] = self.parse_formatdata(elts[0], v, self._info,
                                                      line)

        fmt = [] if cols[8] == "" else cols[8].split(":")
        if self._fastGT:
            fmt = fmt[:1]
        for f in filt:
            if f not in self._filter:
                self.error(line, self.FILTER_NOT_DEFINED, f)
        for f in fmt:
            if f not in self._format:
                self.error(line, self.FORMAT_NOT_DEFINED, f)

        if self._version == 33:
            ref, alt, pos = self._convert_v33_alleles(line, chrom, pos, ref,
                                                      alt)
        else:
            for allele in alt:
                if self._version == 41 and allele == "<DEL>":
                    continue
                if not _ALLELE_RE.match(allele):
                    self.error(line, self.V40_BAD_ALLELE, allele)

        for allele in alt:
            if allele == "<DEL>":
                continue
            if len(allele) != len(ref):
                if len(allele) == 0:
                    self.error(line, self.ZERO_LENGTH_ALLELE)
                if (ref[:1].upper() != allele[:1].upper()
                        and "N" not in (ref[:1] + allele[:1]).upper()):
                    self.error(line, self.MISSING_INDEL_ALLELE_REF_BASE)

        # Trim shared trailing bases (reference vcf.py:634-640).
        if alt:
            for _ in range(1, min(len(ref), min(map(len, alt)))):
                if (len({a[-1].upper() for a in alt}) > 1
                        or ref[-1].upper() != alt[0][-1].upper()):
                    break
                ref, alt = ref[:-1], [a[:-1] for a in alt]

        if self._leftalign and self._reference:
            ref, alt, pos = self._leftalign_alleles(chrom, pos, ref, alt,
                                                    left, faref_leftflank)

        record = {"chrom": chrom, "pos": pos, "id": rid, "ref": ref,
                  "alt": alt, "qual": qual, "filter": filt, "info": info,
                  "format": fmt}
        if parseGenotypes:
            for name, sample in zip(self._samples, cols[9:]):
                if self._fastGT:
                    record[name] = {fmt[0]: [self.convertGT(sample)]}
                    continue
                d = {}
                values = sample.split(":")
                if len(values) > len(fmt):
                    self.error(line, self.BAD_NUMBER_OF_VALUES, sample)
                for idx, key in enumerate(fmt):
                    expected = self.get_expected(key, self._format, alt)
                    if idx < len(values):
                        value = values[idx]
                    else:
                        value = ("." if expected == -1
                                 else ",".join(["."] * expected))
                    d[key] = self.parse_formatdata(key, value, self._format,
                                                   line)
                    if expected != -1 and len(d[key]) != expected:
                        self.error(line, self.BAD_NUMBER_OF_PARAMETERS,
                                   f"id={key}, expected {expected}, got "
                                   f"{d[key]}")
                        if len(d[key]) < expected:
                            d[key] += [d[key][-1]] * (expected - len(d[key]))
                        d[key] = d[key][:expected]
                record[name] = d
        return record

    def _convert_v33_alleles(self, line, chrom, pos, ref, alt):
        """v3.3 SNP/I/D alleles -> v4.0 padded alleles
        (reference vcf.py:574-616)."""
        if len(ref) != 1:
            self.error(line, self.V33_BAD_REF)
        newalts = []
        have_deletions = False
        for a in alt:
            if len(a) == 1:
                a = a + ref[1:]
            elif a.startswith("I"):
                a = ref[0] + a[1:] + ref[1:]
            elif a.startswith("D"):
                have_deletions = True
                try:
                    length = int(a[1:])
                    if len(ref) < length:
                        addns = get_sequence(chrom, pos + len(ref),
                                             pos + length, self._reference)
                        ref += addns
                        newalts = [na + addns for na in newalts]
                    a = ref[length:]
                except ValueError:
                    s = a[1:]
                    if len(ref) < len(s):
                        addns = get_sequence(chrom, pos + len(ref),
                                             pos + len(s), self._reference)
                        if not s.endswith(addns) and addns != "N" * len(addns):
                            self.error(line, self.V33_UNMATCHED_DELETION, a)
                        ref += addns
                        newalts = [na + addns for na in newalts]
                    a = ref[len(s):]
            else:
                self.error(line, self.V33_BAD_ALLELE)
            newalts.append(a)
        alt = newalts
        if have_deletions:
            if pos == 0:
                addn = get_sequence(chrom, pos + len(ref),
                                    pos + len(ref) + 1, self._reference)
                ref += addn
                alt = [a + addn for a in alt]
            else:
                addn = get_sequence(chrom, pos - 1, pos, self._reference)
                ref = addn + ref
                alt = [addn + a for a in alt]
                pos -= 1
        return ref, alt, pos

    def _leftalign_alleles(self, chrom, pos, ref, alt, left, flank):
        """(reference vcf.py:643-663)."""
        while left < pos:
            movable = True
            for allele in alt:
                longest, shortest = ((allele, ref)
                                     if len(allele) > len(ref)
                                     else (ref, allele))
                if (len(longest) == len(shortest)
                        or longest[:len(shortest)].upper() != shortest.upper()
                        or longest[-1].upper()
                        != longest[len(shortest) - 1].upper()):
                    movable = False
            if not movable:
                break
            ref = ref[:-1]
            alt = [a[:-1] for a in alt]
            if min((len(a) for a in alt), default=0) == 0 or len(ref) == 0:
                ref = flank[pos - left - 1] + ref
                alt = [flank[pos - left - 1] + a for a in alt]
                pos -= 1
        return ref, alt, pos

    def write_data(self, stream, data) -> None:
        required = self._required[:]
        required = [k.lower() for k in required] + self._samples
        for k in required:
            if k not in data:
                raise ValueError(f"Required key {k} not found in data")
        alt = ",".join(data["alt"]) if data["alt"] else "."
        if data["filter"] is None:
            filt = "."
        elif data["filter"] == []:
            filt = "0" if self._version == 33 else "PASS"
        else:
            filt = ";".join(data["filter"])
        qual = "." if data["qual"] == -1 else str(data["qual"])
        if qual.endswith(".0"):
            qual = qual[:-2]
        output = [data["chrom"], str(data["pos"] + 1), data["id"],
                  data["ref"], alt, qual, filt,
                  self.format_formatdata(data["info"], self._info,
                                         separator=";"),
                  self.format_formatdata(data["format"], self._format,
                                         value=False)]
        for s in self._samples:
            output.append(self.format_formatdata(data[s], self._format,
                                                 key=False))
        stream.write("\t".join(output) + "\n")

    # -- streaming API (reference vcf.py:741-847) --------------------------
    def _parse_header_lines(self, stream) -> Optional[str]:
        self._lineno = 0
        last = None
        for line in stream:
            self._lineno += 1
            if line.startswith("##"):
                self.parse_header(line.strip())
            elif line.startswith("#"):
                self.parse_heading(line.strip())
                self.enter_default_format()
            else:
                return line
        return None

    def _parse(self, line, stream, parseGenotypes) -> Iterator[dict]:
        if line and line.strip():
            d = self.parse_data(line.strip(), parseGenotypes=parseGenotypes)
            if d:
                yield d
        for line in stream:
            self._lineno += 1
            if self._lines and self._lineno > self._lines:
                return
            if not line.strip():
                continue
            d = self.parse_data(line.strip(), parseGenotypes=parseGenotypes)
            if d:
                yield d

    def getsamples(self):
        return self._samples

    def setsamples(self, samples):
        self._samples = samples

    def getheader(self):
        return self._header

    def setheader(self, header):
        self._header = header

    def getinfo(self):
        return self._info

    def setinfo(self, info):
        self._info = info

    def getformat(self):
        return self._format

    def setformat(self, fmt):
        self._format = fmt

    def getfilter(self):
        return self._filter

    def setfilter(self, filt):
        self._filter = filt

    def setversion(self, version: int) -> None:
        if version not in (33, 40, 41):
            raise ValueError("Can only handle v3.3 and v4.0/v4.1 VCF files")
        self._version = version

    def setregions(self, regions):
        self._regions = regions

    def setreference(self, ref):
        self._reference = ref

    def ignoreerror(self, errorstring: str) -> None:
        try:
            self._ignored_errors.add(getattr(self, errorstring))
        except AttributeError:
            raise ValueError(f"Invalid error string: {errorstring}")

    def warnerror(self, errorstring: str) -> None:
        try:
            self._warn_errors.add(getattr(self, errorstring))
        except AttributeError:
            raise ValueError(f"Invalid error string: {errorstring}")

    def parse(self, stream, parseGenotypes: bool = True) -> Iterator[dict]:
        last_line = self._parse_header_lines(stream)
        return self._parse(last_line, stream, parseGenotypes)

    def write(self, stream, datagenerator) -> None:
        self.write_header(stream)
        self.write_heading(stream)
        for data in datagenerator:
            self.write_data(stream, data)

    def writeheader(self, stream) -> None:
        self.write_header(stream)
        self.write_heading(stream)

    def compare_calls(self, pos1, ref1, alt1, pos2, ref2, alt2) -> bool:
        """Allele equality after right-trimming (reference vcf.py:849-868)."""
        if pos1 != pos2:
            return False
        while ref1 and alt1 and ref1[-1] == alt1[-1]:
            ref1, alt1 = ref1[:-1], alt1[:-1]
        while ref2 and alt2 and ref2[-1] == alt2[-1]:
            ref2, alt2 = ref2[:-1], alt2[:-1]
        return alt1 == alt2


class sortedVCF(VCF):
    """Whole-file reader that yields records sorted within chromosome and
    across chromosomes in natural order (reference vcf.py:872-953)."""

    def __init__(self):
        super().__init__()
        self._sorted_lines = None

    def chr_tag(self, chrom: str):
        val = chrom[3:] if chrom[:3].upper() == "CHR" else chrom
        try:
            return (chrom, int(val))
        except ValueError:
            return (chrom, val)

    def chr_order(self, chroms=None):
        if chroms is None:
            chroms = list(self._sorted_lines.keys())
        tagged = [self.chr_tag(c) for c in chroms]
        # ints sort before strings (py2 semantics the reference relies on).
        tagged.sort(key=lambda t: (isinstance(t[1], str), t[1]))
        return [t[0] for t in tagged]

    def _load(self, line, stream) -> None:
        if line and line.strip():
            parsed = self.parse_data(line.strip(), lineparse=True)
            if parsed:
                self._sorted_lines[parsed[0]].append((parsed[1], parsed[2]))
        for line in stream:
            if not line.strip():
                continue
            parsed = self.parse_data(line.strip(), lineparse=True)
            if parsed:
                self._sorted_lines[parsed[0]].append((parsed[1], parsed[2]))
        for key in self._sorted_lines:
            self._sorted_lines[key].sort()

    def _parse_sorted(self, region=None) -> Iterator[dict]:
        if region is not None:
            chrom, start, end = region
            poss = [d[0] for d in self._sorted_lines[chrom]]
            lo = bisect.bisect_left(poss, start)
            hi = bisect.bisect_right(poss, end)
            for _pos, line in self._sorted_lines[chrom][lo:hi]:
                yield self.parse_data(line.strip())
        else:
            for chrom in self.chr_order():
                for _pos, line in self._sorted_lines[chrom]:
                    yield self.parse_data(line.strip())

    def getdata(self):
        return self._sorted_lines

    def parse(self, stream, region=None) -> Iterator[dict]:
        if self._sorted_lines is None:
            self._sorted_lines = defaultdict(list)
            last_line = self._parse_header_lines(stream)
            self._load(last_line, stream)
        return self._parse_sorted(region)
