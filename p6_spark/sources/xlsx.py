"""Dependency-free .xlsx reader (stdlib zipfile + xml.etree).

An xlsx file is a zip of XML parts; the subset a data pipeline needs —
sheet names, shared strings, cell values by reference — is small enough
to parse directly, which removes the openpyxl dependency the reference
loader needs (src/P6/loader.py:39-45) while reading the same workbooks
byte-for-byte. All values surface as strings (or None for empty cells):
the pipelines own the casts, exactly like the reference's row parsers
stringify every cell.

Coverage: shared strings (incl. rich-text runs), inline strings, formula
string results, booleans (-> 'True'/'False' like str(bool) in pandas),
numeric text as stored, sparse rows/cells via the r= cell reference.
Not covered (not used by the reference workbooks): date-style number
formatting, merged-cell fills.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int | None:
    """'A1' -> 0, 'AB12' -> 27; None when the cell has no r= attribute."""
    m = _CELL_REF.match(ref)
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _text_of(elem: ET.Element) -> str:
    """Concatenate every <t> descendant — handles rich-text <r> runs."""
    return "".join(t.text or "" for t in elem.iter() if t.tag.endswith("}t") or t.tag == "t")


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_text_of(si) for si in root if si.tag.endswith("}si") or si.tag == "si"]


def _sheet_targets(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member)] in workbook order via the rels part."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    target_by_rid = {}
    for rel in rels:
        target = rel.get("Target", "")
        if not target.startswith("/"):
            target = "xl/" + target
        else:  # absolute part name
            target = target.lstrip("/")
        target_by_rid[rel.get("Id")] = target
    out: list[tuple[str, str]] = []
    for sheet in wb.iter():
        if sheet.tag.endswith("}sheet"):
            rid = sheet.get(rid_ns)
            if rid in target_by_rid:
                out.append((sheet.get("name", ""), target_by_rid[rid]))
    return out


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        return _text_of(c)
    v = None
    for child in c:
        if child.tag.endswith("}v") or child.tag == "v":
            v = child.text
            break
    if v is None:
        return None
    if t == "s":
        return shared[int(v)]
    if t == "b":
        # str(bool) form, matching what pandas/openpyxl hands the
        # reference's str(row[...]) stringification
        return "True" if v == "1" else "False"
    if t == "e":
        return None
    return v  # 'n' numeric text as stored, 'str' formula result


def read_xlsx(path: str) -> dict[str, list[list[str | None]]]:
    """Parse every sheet into a dense row matrix (sheet order preserved).

    Rows are padded to the sheet's max width with None; fully-empty
    trailing cells stay None. Sheets with no rows at all map to []."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        out: dict[str, list[list[str | None]]] = {}
        for name, member in _sheet_targets(z):
            root = ET.fromstring(z.read(member))
            rows: list[list[str | None]] = []
            for row in root.iter():
                if not row.tag.endswith("}row"):
                    continue
                cells: list[str | None] = []
                next_idx = 0
                for c in row:
                    if not c.tag.endswith("}c"):
                        continue
                    idx = _col_index(c.get("r", ""))
                    if idx is None:
                        idx = next_idx
                    while len(cells) < idx:
                        cells.append(None)
                    val = _cell_value(c, shared)
                    if len(cells) == idx:
                        cells.append(val)
                    else:
                        cells[idx] = val
                    next_idx = idx + 1
                rows.append(cells)
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [None] * (width - len(r)) for r in rows]
    return out
