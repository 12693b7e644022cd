"""Shared plumbing for the executed-reference fixture generators.

The sandbox has no openpyxl, so the reference's PTT xlsx is read manually
(zipfile + ElementTree, inlineStr cells) and `pandas.read_excel` is
monkey-patched to serve the rows; the reference tree's pickle-cache write is
disabled (its data directory is read-only). Driver-side only — the engine
never imports this.
"""
import re
import sys
import xml.etree.ElementTree as ET
import zipfile

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
XLSX = "/root/reference/data/ptt_data/turkiye_posta_kodlari.xlsx"


def read_xlsx_rows(path=XLSX):
    """All sheet rows (including the header) as [A, B, C, D, E] strings."""
    z = zipfile.ZipFile(path)
    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in sheet.iter(NS + "row"):
        vals = {}
        for c in row.iter(NS + "c"):
            col = re.match(r"([A-Z]+)", c.get("r")).group(1)
            if c.get("t") == "inlineStr":
                t = c.find(f"{NS}is/{NS}t")
                vals[col] = "" if t is None or t.text is None else t.text
            else:
                v = c.find(f"{NS}v")
                vals[col] = "" if v is None or v.text is None else v.text
        out.append([vals.get(k, "") for k in "ABCDE"])
    return out


def patch_reference_io(rows):
    """Monkey-patch pandas + the reference tree so `import` / `Turkey.load`
    work against the pre-read rows without openpyxl or cache writes.
    Returns the patched `data.ptt_data.map` module."""
    import pandas as pd
    pd.read_excel = lambda path, header=None: pd.DataFrame(rows)
    sys.path.insert(0, "/root/reference")
    import data.ptt_data.map as refmap
    refmap.Turkey._write_cache = lambda *a, **k: None
    return refmap
