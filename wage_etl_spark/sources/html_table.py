"""HTML results-table scan — the reference's extract layer (S3), distributed.

Parses the reference's wage-table shape (/root/reference/src/extract/
wage_scraper.py:60-166): a ``table.results_table`` with a 2-row ``thead``
whose first row uses colspan (composite headers = "top sub"), a ``tbody`` of
data rows, ragged rows padded/truncated to the header width, and a
"Last updated on Month D, YYYY" stamp in the page text.

Spark mapping: pages arrive as a DataFrame of (page_id, html). Parsing runs
in ``mapInPandas`` (one Arrow batch of pages in, long rows out) with a fixed
output schema — the *dynamic* wide schema becomes a ``values`` MAP column, so
downstream melt/normalize is schema-stable regardless of which family-config
columns a page carries. Pure stdlib ``html.parser`` (no bs4 in this sandbox).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    MapType, StringType, StructField, StructType,
)

UPDATED_RE = re.compile(r"([A-Z][a-z]+ \d{1,2}, \d{4})")

ROW_SCHEMA = StructType(
    [
        StructField("page_id", StringType()),
        StructField("category", StringType()),
        StructField("values", MapType(StringType(), StringType())),
        StructField("page_updated_raw", StringType()),
    ]
)


class _TableParser(HTMLParser):
    """Collects thead (2 rows, colspan-aware) + tbody rows of the first
    table whose class contains ``results_table``."""

    def __init__(self) -> None:
        super().__init__()
        self.in_table = False
        self.done = False
        self.section = None  # 'thead' | 'tbody'
        self.row: list[str] | None = None
        self.cell: list[str] | None = None
        self.cell_span = 1
        self.head_rows: list[list[tuple[str, int]]] = []
        self.body_rows: list[list[str]] = []
        self.text_chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table" and not self.done:
            if "results_table" in (a.get("class") or ""):
                self.in_table = True
        if not self.in_table:
            return
        if tag in ("thead", "tbody"):
            self.section = tag
        elif tag == "tr":
            self.row = []
        elif tag in ("td", "th"):
            self.cell = []
            self.cell_span = int(a.get("colspan") or 1)

    def handle_endtag(self, tag):
        if not self.in_table:
            return
        if tag in ("td", "th") and self.cell is not None and self.row is not None:
            text = re.sub(r"\s+", " ", "".join(self.cell)).strip()
            self.row.append((text, self.cell_span))
            self.cell = None
        elif tag == "tr" and self.row is not None:
            if self.section == "thead":
                self.head_rows.append(list(self.row))
            elif self.section == "tbody":
                self.body_rows.append([t for t, _ in self.row])
            self.row = None
        elif tag == "table" and self.in_table:
            self.in_table = False
            self.done = True

    def handle_data(self, data):
        if self.cell is not None:
            self.cell.append(data)
        self.text_chunks.append(data)


def composite_headers(head_rows: list[list[tuple[str, int]]]) -> list[str]:
    """2-row thead -> flat headers: the colspan'd top row label prefixes each
    sub-header ("2 ADULTS (1 WORKING)" + "1 Child" -> "2 ADULTS (1 WORKING) 1 Child").
    Mirrors wage_scraper.py:119-156."""
    if not head_rows:
        return []
    if len(head_rows) == 1:
        return [t for t, _ in head_rows[0]]
    top, sub = head_rows[0], head_rows[1]
    expanded: list[str] = []
    for text, span in top:
        expanded.extend([text] * span)
    subs = [t for t, _ in sub]
    headers = []
    # first top cell (usually empty/category) has no sub-header under it if
    # spans don't align; pad conservatively
    while len(subs) < len(expanded):
        subs.append("")
    for i, topname in enumerate(expanded):
        s = subs[i]
        headers.append((f"{topname} {s}".strip()) if s else topname)
    return headers


def parse_results_page(page_id: str, html: str) -> list[dict]:
    """One page -> long records (category, {header: value}) + updated stamp.
    Ragged rows are padded with '' / truncated to the header width
    (PERMISSIVE-mode analog of wage_scraper.py:102-111)."""
    p = _TableParser()
    p.feed(html)
    headers = composite_headers(p.head_rows)
    m = UPDATED_RE.search(" ".join(p.text_chunks))
    updated = m.group(1) if m else None
    out = []
    for row in p.body_rows:
        if not row:
            continue
        cells = list(row)
        width = len(headers)
        if len(cells) < width:
            cells += [""] * (width - len(cells))
        cells = cells[:width]
        category = cells[0]
        values = {h: v for h, v in zip(headers[1:], cells[1:])}
        out.append(
            {
                "page_id": page_id,
                "category": category,
                "values": values,
                "page_updated_raw": updated,
            }
        )
    return out


def scan_html_tables(pages: DataFrame, id_col: str = "page_id", html_col: str = "html") -> DataFrame:
    """Distributed scan: DataFrame[(page_id, html)] -> ROW_SCHEMA rows."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for pid, html in zip(pdf[id_col], pdf[html_col]):
                rows.extend(parse_results_page(str(pid), html))
            yield pd.DataFrame(
                rows, columns=["page_id", "category", "values", "page_updated_raw"]
            )

    return pages.mapInPandas(_parse, ROW_SCHEMA)


def wide_from_map(long_df: DataFrame, headers: list[str]) -> DataFrame:
    """Materialize the dynamic wide shape for a known header set (the melt
    input of operators/reshape.py)."""
    from pyspark.sql import functions as F

    return long_df.select(
        "page_id",
        F.col("category").alias("Category"),
        *[F.col("values")[h].alias(h) for h in headers],
        "page_updated_raw",
    )
