"""Minimal xlwt-compatible Workbook writing Excel 2003 SpreadsheetML.

The reference emits .xls workbooks via xlwt (dataset.py:673,810-811); xlwt is
not available here, so this shim provides the same ``Workbook.add_sheet`` /
``sheet.write(row, col, value)`` / ``workbook.save(path)`` API and writes the
XML Spreadsheet 2003 format, which Excel/LibreOffice open as .xls.
"""

from typing import Dict, Tuple
from xml.sax.saxutils import escape


class Sheet:
    def __init__(self, name: str):
        self.name = name
        self._cells: Dict[Tuple[int, int], object] = {}

    def write(self, row: int, col: int, value):
        self._cells[(row, col)] = value

    def _to_xml(self) -> str:
        rows = {}
        for (r, c), v in self._cells.items():
            rows.setdefault(r, {})[c] = v
        parts = ['  <Worksheet ss:Name="{}">\n  <Table>\n'.format(
            escape(str(self.name)))]
        for r in sorted(rows):
            parts.append('   <Row ss:Index="{}">\n'.format(r + 1))
            for c in sorted(rows[r]):
                v = rows[r][c]
                if isinstance(v, bool):
                    cell_type, text = "Number", str(int(v))
                elif isinstance(v, (int, float)):
                    cell_type, text = "Number", repr(v)
                else:
                    cell_type, text = "String", escape(str(v))
                parts.append(
                    '    <Cell ss:Index="{}"><Data ss:Type="{}">{}</Data>'
                    '</Cell>\n'.format(c + 1, cell_type, text))
            parts.append('   </Row>\n')
        parts.append('  </Table>\n  </Worksheet>\n')
        return "".join(parts)


class Workbook:
    def __init__(self):
        self._sheets = []

    def add_sheet(self, name: str) -> Sheet:
        sheet = Sheet(name)
        self._sheets.append(sheet)
        return sheet

    def save(self, path: str) -> str:
        header = (
            '<?xml version="1.0"?>\n'
            '<?mso-application progid="Excel.Sheet"?>\n'
            '<Workbook xmlns="urn:schemas-microsoft-com:office:spreadsheet"\n'
            ' xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet">\n')
        with open(path, "w") as f:
            f.write(header)
            for sheet in self._sheets:
                f.write(sheet._to_xml())
            f.write("</Workbook>\n")
        return path
