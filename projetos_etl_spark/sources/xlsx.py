"""Hermetic xlsx read/write on the stdlib only (zipfile + xml.etree).

The reference's core ingest op is ``pd.read_excel`` of one downloaded
workbook (ref op #4, ``dags/bronze/dag_bronze_financial_sample.py:154``).
This environment has no openpyxl, so rather than gate the operator behind
``NotImplementedError``, this module implements the minimal subset of
ECMA-376 (OOXML) that op needs: an xlsx file is a zip whose
``xl/worksheets/sheetN.xml`` holds ``<row><c r="A1" t="s"><v>...`` cells,
with string cells indirected through ``xl/sharedStrings.xml``.

Reader coverage: shared strings (``t="s"``), inline strings
(``t="inlineStr"``), formula-cached strings (``t="str"``), booleans
(``t="b"``), numbers (default), blank/skipped cells (sparse rows are
null-filled by column letter, so ragged sheets read PERMISSIVE-ly).
Writer: inline strings only — enough to round-trip tests hermetically.

Scale posture: an xlsx is a single small non-splittable file by nature
(the reference's is ~700 rows), so a driver-side parse feeding
``spark.createDataFrame`` is the right call — everything downstream is
distributed. Many-workbook ingest at scale would wrap ``_parse_sheet``
in ``spark.read.format("binaryFile")`` + ``mapInPandas`` instead (one
workbook per task), which this parser supports unchanged since it takes
bytes, not paths.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 (base-26 bijective)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall("m:si", _NS):
        # a shared string is one <t> or a run of <r><t> rich-text chunks
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in WORKBOOK order — resolved through
    ``xl/workbook.xml`` (sheet sequence) + ``xl/_rels/workbook.xml.rels``
    (r:id -> part target), which is where sheet order actually lives.
    Lexicographic filename order is wrong twice over: 'sheet10.xml' sorts
    before 'sheet2.xml', and part numbering need not match tab order at
    all. Falls back to numeric-suffix order if either part is absent or
    unparsable (some minimal writers omit the workbook part)."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target_by_id = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.iter(f"{{{_PKG_REL_NS}}}Relationship")
        }
        paths = []
        for sheet in wb.iter(f"{{{_NS['m']}}}sheet"):
            target = target_by_id[sheet.get(f"{{{_REL_NS}}}id")]
            # targets are workbook-part-relative ('worksheets/sheet1.xml')
            # or package-absolute ('/xl/worksheets/sheet1.xml')
            paths.append(target.lstrip("/") if target.startswith("/") else f"xl/{target}")
        if paths and all(p in zf.namelist() for p in paths):
            return paths
    except (KeyError, ET.ParseError):
        pass
    return sorted(
        (n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        if is_el is None:
            return None
        return "".join(x.text or "" for x in is_el.iter(f"{{{_NS['m']}}}t"))
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        idx = int(v.text)
        return shared[idx] if 0 <= idx < len(shared) else None
    if t == "str":
        return v.text
    if t == "b":
        return v.text.strip() in ("1", "true")
    # numeric: int when exact (xlsx stores everything as double)
    num = float(v.text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_xlsx(source: str | bytes, sheet_index: int = 0) -> tuple[list, list[list]]:
    """Parse one worksheet; returns ``(rows_raw, rows)`` where the first
    element is the first sheet row (usually the header) and ``rows`` the
    rest — both as lists null-padded to the max observed width."""
    buf = BytesIO(source) if isinstance(source, bytes) else source
    with zipfile.ZipFile(buf) as zf:
        sheets = _sheet_paths(zf)
        if not sheets:
            raise ValueError("xlsx has no worksheets")
        if not 0 <= sheet_index < len(sheets):
            raise ValueError(
                f"sheet_index {sheet_index} out of range: workbook has "
                f"{len(sheets)} sheet(s)"
            )
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(sheets[sheet_index]))

    grid: list[list] = []
    width = 0
    for row_el in root.iter(f"{{{_NS['m']}}}row"):
        row: dict[int, object] = {}
        next_idx = 0
        for c in row_el.findall("m:c", _NS):
            ref = c.get("r")
            if ref:
                m = _CELL_REF.fullmatch(ref)
                idx = _col_index(m.group(1)) if m else next_idx
            else:
                idx = next_idx  # cells without r are consecutive
            row[idx] = _cell_value(c, shared)
            next_idx = idx + 1
        if row:
            width = max(width, max(row) + 1)
        grid.append(row)

    dense = [[r.get(i) for i in range(width)] for r in grid]
    if not dense:
        return [], []
    return dense[0], dense[1:]


def scan_xlsx(
    spark: SparkSession, path: str, header: bool = True, sheet_index: int = 0
) -> DataFrame:
    """Driver-side xlsx parse -> distributed DataFrame (ref op #4,
    ``bronze:154``). Column types follow the parsed cells (str/long/
    double/bool); mixed columns fall back to string like pandas would.
    With ``header=False`` columns are named ``_c0..`` like Spark's CSV."""
    first, rows = read_xlsx(path, sheet_index)
    if header:
        names = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(first)]
    else:
        names = [f"_c{i}" for i in range(len(first))]
        rows = [first, *rows]

    from pyspark.sql import types as T

    def uniform(col: list) -> tuple[list, T.DataType]:
        types = {type(v) for v in col if v is not None}
        if types == {bool}:
            return col, T.BooleanType()
        if types == {int}:
            return col, T.LongType()
        if types <= {int, float} and types:
            return [None if v is None else float(v) for v in col], T.DoubleType()
        # mixed / string / all-NULL columns read as string, like pandas
        return [None if v is None else str(v) for v in col], T.StringType()

    typed = [uniform([r[i] for r in rows]) for i in range(len(names))]
    schema = T.StructType(
        [T.StructField(n, dt) for n, (_, dt) in zip(names, typed)]
    )
    data = [tuple(col[j] for col, _ in typed) for j in range(len(rows))]
    return spark.createDataFrame(data, schema)


def write_xlsx(path: str, header: list[str], rows: list[list]) -> None:
    """Minimal xlsx writer (inline strings; numbers as-is) — hermetic test
    fixture generation and the synth raw layer for the scan_excel entry."""

    def cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        text = (
            str(v).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    sheet_rows = []
    for rn, row in enumerate([header, *rows], start=1):
        cells = "".join(cell(f"{col_ref(ci)}{rn}", v) for ci, v in enumerate(row))
        sheet_rows.append(f'<row r="{rn}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS["m"]}"><sheetData>{"".join(sheet_rows)}</sheetData></worksheet>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS["m"]}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
