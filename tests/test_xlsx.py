"""Hermetic xlsx reader/writer tests (``sources/xlsx.py`` — the stdlib
implementation that un-gates ref op #4 in this openpyxl-less env)."""

from __future__ import annotations

import zipfile

from projetos_etl_spark.sources.xlsx import read_xlsx, scan_xlsx, write_xlsx


def test_roundtrip_types(tmp_path):
    path = str(tmp_path / "t.xlsx")
    write_xlsx(
        path,
        ["name", "qty", "price", "ok"],
        [["widget", 3, 1.5, True], ["gadget & <co>", 0, -2.25, False]],
    )
    header, rows = read_xlsx(path)
    assert header == ["name", "qty", "price", "ok"]
    assert rows == [["widget", 3, 1.5, True], ["gadget & <co>", 0, -2.25, False]]


def test_scan_xlsx_schema_and_values(spark, tmp_path):
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, ["a", "b", "c"], [["x", 1, 0.5], ["y", 2, 1.5], [None, 3, 2.5]])
    df = scan_xlsx(spark, path)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "bigint",
        "double",
    ]
    got = {tuple(r) for r in df.collect()}
    assert got == {("x", 1, 0.5), ("y", 2, 1.5), (None, 3, 2.5)}


def test_reader_handles_shared_strings(tmp_path):
    """Real producers (Excel itself, openpyxl) emit t="s" cells indirected
    through xl/sharedStrings.xml — our writer doesn't, so build one by
    hand to cover the reader's shared-string path."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst xmlns="{ns}" count="3" uniqueCount="3">'
        "<si><t>col_a</t></si><si><t>col_b</t></si>"
        "<si><r><t>rich </t></r><r><t>text</t></r></si></sst>"
    )
    path = str(tmp_path / "shared.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    header, rows = read_xlsx(path)
    assert header == ["col_a", "col_b"]
    assert rows == [["rich text", 42]]


def test_sheet_order_resolved_via_workbook_not_filenames(tmp_path):
    """ADVICE r2: sheet order lives in xl/workbook.xml + rels, not in part
    filenames — 'sheet10.xml' sorts lexicographically before 'sheet2.xml',
    and tab order need not match part numbering at all. Build a workbook
    whose FIRST tab is stored as sheet10.xml and verify sheet_index
    follows workbook order; out-of-range must raise a descriptive error."""
    import pytest

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg_ns = "http://schemas.openxmlformats.org/package/2006/relationships"

    def sheet_xml(value: str) -> str:
        return (
            f'<worksheet xmlns="{ns}"><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>{value}</t></is></c></row>'
            "</sheetData></worksheet>"
        )

    workbook = (
        f'<workbook xmlns="{ns}" xmlns:r="{rel_ns}"><sheets>'
        '<sheet name="First" sheetId="1" r:id="rA"/>'
        '<sheet name="Second" sheetId="2" r:id="rB"/>'
        "</sheets></workbook>"
    )
    rels = (
        f'<Relationships xmlns="{pkg_ns}">'
        '<Relationship Id="rA" Type="x" Target="worksheets/sheet10.xml"/>'
        '<Relationship Id="rB" Type="x" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    path = str(tmp_path / "multi.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet10.xml", sheet_xml("first-tab"))
        zf.writestr("xl/worksheets/sheet2.xml", sheet_xml("second-tab"))
    assert read_xlsx(path, sheet_index=0)[0] == ["first-tab"]
    assert read_xlsx(path, sheet_index=1)[0] == ["second-tab"]
    with pytest.raises(ValueError, match="out of range.*2 sheet"):
        read_xlsx(path, sheet_index=2)


def test_sheet_order_numeric_fallback_without_workbook_part(tmp_path):
    """Minimal writers may omit xl/workbook.xml: fall back to NUMERIC
    part-suffix order (sheet2 before sheet10), not lexicographic."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

    def sheet_xml(value: str) -> str:
        return (
            f'<worksheet xmlns="{ns}"><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>{value}</t></is></c></row>'
            "</sheetData></worksheet>"
        )

    path = str(tmp_path / "bare.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet10.xml", sheet_xml("tenth"))
        zf.writestr("xl/worksheets/sheet2.xml", sheet_xml("second"))
    assert read_xlsx(path, sheet_index=0)[0] == ["second"]
    assert read_xlsx(path, sheet_index=1)[0] == ["tenth"]


def test_reader_null_pads_sparse_rows(tmp_path):
    """Sparse/ragged sheets (skipped cells, short rows) null-fill by cell
    reference — PERMISSIVE, one bad row can't shift columns."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>h3</t></is></c></row>'
        '<row r="2"><c r="B2"><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    path = str(tmp_path / "sparse.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    header, rows = read_xlsx(path)
    assert header == ["h1", None, "h3"]
    assert rows == [[None, 7, None]]
