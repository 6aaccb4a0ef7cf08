"""S5 — minimal XLSX reader for the grid-points table.

Reference (data_extraction_v2.py:353): `pd.read_excel(grid_points.xlsx)`
-> 19,129 (X, Y) sample points. No openpyxl in this container; an .xlsx
is a zip of SpreadsheetML, and a numeric two-column sheet needs only the
cell-value XML (<c r="A2"><v>39.41</v></c>) plus the sharedStrings table
for header cells. That is what this parses — enough for the reference's
input and any numeric point table; anything with styles-dependent typing
raises rather than guessing.

Driver-side (catalog-scale input); the result broadcasts into the
snap-to-grid sampling join (J2/J3)."""

from __future__ import annotations

import re
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CELL_RE = re.compile(
    rb'<c r="([A-Z]+)(\d+)"[^>]*?(?: t="(\w+)")?[^>]*>'
    rb'(?:<is><t[^>]*>(.*?)</t></is>|<v>(.*?)</v>)</c>', re.S)
_SST_RE = re.compile(rb"<si>(?:<t[^>]*>)?(.*?)(?:</t>)?</si>", re.S)


def read_xlsx_rows(path: str, sheet: str = "xl/worksheets/sheet1.xml"
                   ) -> list[dict[str, str | float]]:
    """First row = header; remaining rows -> list of dicts. Numeric cells
    become float, shared-string cells become str."""
    z = zipfile.ZipFile(path)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        raw = z.read("xl/sharedStrings.xml")
        shared = [re.sub(rb"<[^>]+>", rb"", m).decode("utf-8")
                  for m in _SST_RE.findall(raw)]
    data = z.read(sheet)
    rows: dict[int, dict[str, str | float]] = {}
    for col, rownum, typ, inline, val in _CELL_RE.findall(data):
        r = int(rownum)
        if inline:
            v: str | float = inline.decode("utf-8")
        elif typ == b"s":
            v = shared[int(val)]
        elif typ == b"str" or not val.replace(b".", b"").replace(
                b"-", b"").replace(b"e", b"").replace(b"E", b"").replace(
                b"+", b"").isdigit():
            v = val.decode("utf-8")
        else:
            v = float(val)
        rows.setdefault(r, {})[col.decode()] = v
    ordered = [rows[k] for k in sorted(rows)]
    if not ordered:
        return []
    header = ordered[0]
    cols = sorted(header, key=lambda c: (len(c), c))
    names = [str(header[c]) for c in cols]
    return [{names[i]: rec.get(cols[i]) for i in range(len(cols))}
            for rec in ordered[1:]]


def read_points_xlsx(spark: SparkSession, path: str,
                     x_col: str = "X", y_col: str = "Y") -> DataFrame:
    """grid_points.xlsx -> (lon, lat) DataFrame with the reference's 3-dp
    float-key rounding applied at the source (data_extraction_v2.py:342,
    355)."""
    recs = read_xlsx_rows(path)
    df = spark.createDataFrame(
        [(float(r[x_col]), float(r[y_col])) for r in recs
         if r.get(x_col) is not None and r.get(y_col) is not None],
        "lon double, lat double")
    return df.select(F.round("lon", 3).alias("lon"),
                     F.round("lat", 3).alias("lat"))
