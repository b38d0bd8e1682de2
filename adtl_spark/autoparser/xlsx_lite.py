"""Dependency-free xlsx (OOXML SpreadsheetML) reader/writer for the
plain-table case the autoparser needs — stdlib ``zipfile`` +
``xml.etree`` only, written from the ECMA-376 part structure.

The reference reads data dictionaries from xlsx via pandas+openpyxl
(/root/reference/src/adtl/autoparser/util.py:28-46); this container has
no excel engine, so :func:`read_tabular` falls back to this module.
Scope is deliberately narrow (a rectangular first-sheet table, header in
row 1 — exactly what a data dictionary is):

- read: first worksheet, shared strings (including rich-text runs),
  inline strings, numbers (int where exact), booleans, sparse rows
  (skipped cells become None via the A1-style cell reference);
- write: one sheet, inline strings / numbers / booleans, no styles.

Formulas, dates-as-styles, multiple sheets and merged cells are out of
scope and surface as their raw stored values (documented trade — the
dictionary path never produces them)."""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    """A -> 0, B -> 1, ..., AA -> 26 (base-26 bijective)."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the FIRST sheet in workbook order through the workbook
    rels — sheet files are not guaranteed to be named sheet1.xml."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheet = wb.find(f"{_NS}sheets/{_NS}sheet")
    if sheet is None:
        raise ValueError("xlsx has no sheets")
    rid = sheet.get(
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    )
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.findall(f"{_REL_NS}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"workbook relationship {rid} not found")


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; itertext over all t nodes
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(c, shared: list[str]):
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return (
            "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
            if is_el is not None
            else None
        )
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype == "str":  # cached formula string
        return v.text
    try:  # "n" (and untyped): int where exact, else float
        f = float(v.text)
        return int(f) if f.is_integer() and "." not in v.text and "e" not in v.text.lower() else f
    except ValueError:
        return v.text


def read_xlsx(path: str) -> pd.DataFrame:
    """First worksheet as a DataFrame, row 1 as the header — the same
    contract as ``pd.read_excel(path)`` on a plain table."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
        rows: dict[int, dict[int, object]] = {}
        max_col = -1
        for row in sheet.find(f"{_NS}sheetData").findall(f"{_NS}row"):
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                if ref is None:
                    continue
                m = _CELL_REF.fullmatch(ref)
                if m is None:
                    raise ValueError(f"malformed cell reference {ref!r}")
                col, r = _col_index(m.group(1)), int(m.group(2)) - 1
                rows.setdefault(r, {})[col] = _cell_value(c, shared)
                max_col = max(max_col, col)
    if not rows or 0 not in rows:
        return pd.DataFrame()
    header = [
        str(rows[0].get(i)) if rows[0].get(i) is not None else f"Unnamed: {i}"
        for i in range(max_col + 1)
    ]
    body = [
        [rows.get(r, {}).get(i) for i in range(max_col + 1)]
        for r in sorted(rows)
        if r > 0
    ]
    return pd.DataFrame(body, columns=header)


def write_xlsx(df: pd.DataFrame, path: str) -> None:
    """One-sheet xlsx with inline strings and bare numbers/booleans — a
    valid minimal OOXML package (Content_Types + package/workbook rels +
    workbook + one worksheet), readable by excel engines and by
    :func:`read_xlsx`."""

    def cell_xml(ref: str, v) -> str:
        if v is None or (isinstance(v, float) and v != v):
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
        )

    lines = []
    header_cells = "".join(
        cell_xml(f"{_col_letters(i)}1", col) for i, col in enumerate(df.columns)
    )
    lines.append(f'<row r="1">{header_cells}</row>')
    for rix, (_, row) in enumerate(df.iterrows(), start=2):
        cells = "".join(
            cell_xml(f"{_col_letters(i)}{rix}", v) for i, v in enumerate(row)
        )
        lines.append(f'<row r="{rix}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(lines)
        + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/worksheet"
        '" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.spreadsheetml."
        'worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", pkg_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
