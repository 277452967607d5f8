"""Minimal stdlib OOXML *writer* for test fixtures.

The container ships no openpyxl, so fixtures that must travel through the
real ``.xlsx`` ingest path (zip container → sheet XML → grid →
``tidy_2024_to_frame``) are built here with ``zipfile`` + hand-rolled
sheet XML: inline strings for text cells, ``<v>`` numbers for numeric
cells.  Deliberately tiny — just enough OOXML for
``sources/xlsx_lite.read_xlsx_grid`` and any conformant reader.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{sheet}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return f'<c r="{ref}"><v>{value}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(value))}</t></is></c>'


def xlsx_bytes(rows: list[list], sheet_name: str = "Sheet1") -> bytes:
    """Serialize a positional grid to a minimal valid .xlsx byte string."""
    body = []
    for r, row in enumerate(rows):
        cells = "".join(
            _cell_xml(f"{_col_ref(c)}{r + 1}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{r + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(sheet=escape(sheet_name)))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


# --- 2024 ("API era") ASPEP fixture -------------------------------------
#
# The container has no network and /root/reference/data/raw ships no 2024
# workbook, so the real file is unreachable.  This fixture reconstructs the
# 2024 tidy format (sheet "Data", flat headers per reference
# constants.py:47-58, dirty comma-grouped numerics) and embeds the REAL
# golden cell values printed in reference asset_checks.py:22-28, so the
# full tidy-adapter → combine → derive_stats → extended chain reproduces
# all four 2024-era goldens.

_2024_HEADER = [
    "Geographic Area Name",
    "Meaning of Aggregate Description",
    "Full-Time Employment",
    "Full-Time Payroll",
    "Part-Time Employment",
    "Part-Time Payroll",
    "Part-Time Hours",
    "Full-Time Equivalent Employment",
    "Total Full-Time and Part-Time Employment",
    "Total Full-Time and Part-Time Payroll",
    "Unmapped API Field",  # 2024 era ships extra columns; adapter drops them
]

_2024_ROWS = [
    # golden: AZ electric power ft_employment = 4 (asset_checks.py:22)
    ["Arizona", "Electric Power", "4", "21,000", "1", "500", "40", "4", "5", "21,500", "x"],
    # golden: WA corrections ft_pay = 71,593,739 (asset_checks.py:23)
    ["Washington", "Corrections", "8,912", "71,593,739", "310", "801,220", "11,200", "9,020", "9,222", "72,394,959", "x"],
    # golden: MO corrections pay_per_fte = 38,884,335 / 9,591 (asset_checks.py:24)
    ["Missouri", "Corrections", "9,410", "38,100,000", "420", "784,335", "15,830", "9,591", "9,830", "38,884,335", "x"],
    # golden: IA hospitals ft_eq_employment = 10,004 (1yr/5yr deltas vs the
    # real 2023/2020 workbooks, asset_checks.py:26-27)
    ["Iowa", "Hospitals", "9,655", "180,221,004", "1,040", "3,112,884", "39,900", "10,004", "10,695", "183,333,888", "x"],
    # national rollup — exercises the US lookup-miss path in the 2024 era
    ["United States", "Corrections", "401,220", "2,210,443,120", "20,115", "41,220,835", "801,260", "408,100", "421,335", "2,251,663,955", "x"],
]


def aspep_2024_xlsx_bytes() -> bytes:
    return xlsx_bytes([_2024_HEADER] + _2024_ROWS, sheet_name="Data")
