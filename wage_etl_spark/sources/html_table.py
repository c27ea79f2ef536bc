"""HTML results-table scan — the reference's extract layer (S3), distributed.

Parses the reference's page shape (/root/reference/src/extract/
wage_scraper.py:60-166): EVERY ``table.results_table`` on the page — the
reference's ``_parse_page`` requires at least two (``tables[0]`` = wages,
``tables[1]`` = expenses, wage_scraper.py:60-73) — each with a thead whose
first row may use colspan (composite headers = "top sub"), a tbody of data
rows, ragged rows padded/truncated to the header width, and a
"Last updated on Month D, YYYY" stamp in the page text.

Spark mapping: pages arrive as a DataFrame of (page_id, html). Parsing runs
in ``mapInPandas`` (one Arrow batch of pages in, long rows out) with a fixed
output schema — the *dynamic* wide schema becomes a ``values`` MAP column and
the table position becomes ``table_idx`` (0 = wages, 1 = expenses, by the
reference's convention), so downstream melt/normalize is schema-stable
regardless of which family-config columns a page carries. Pure stdlib
``html.parser`` (no bs4 in this sandbox).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, MapType, StringType, StructField, StructType,
)

UPDATED_RE = re.compile(r"([A-Z][a-z]+ \d{1,2}, \d{4})")

ROW_SCHEMA = StructType(
    [
        StructField("page_id", StringType()),
        StructField("table_idx", IntegerType()),
        StructField("category", StringType()),
        StructField("values", MapType(StringType(), StringType())),
        StructField("page_updated_raw", StringType()),
    ]
)


class _TableParser(HTMLParser):
    """Collects thead (colspan-aware) + tbody rows of EVERY table whose class
    contains ``results_table`` (reference ``find_all``, wage_scraper.py:62);
    decoy tables with other classes are skipped."""

    def __init__(self) -> None:
        super().__init__()
        self.in_table = False
        self.section = None  # 'thead' | 'tbody'
        self.row: list[str] | None = None
        self.cell: list[str] | None = None
        self.cell_span = 1
        # one (head_rows, body_rows) pair per results_table, in page order
        self.tables: list[tuple[list[list[tuple[str, int]]], list[list[str]]]] = []
        self.text_chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table" and not self.in_table:
            if "results_table" in (a.get("class") or ""):
                self.in_table = True
                self.tables.append(([], []))
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
            head_rows, body_rows = self.tables[-1]
            if self.section == "thead":
                head_rows.append(list(self.row))
            elif self.section == "tbody":
                body_rows.append([t for t, _ in self.row])
            self.row = None
        elif tag == "table" and self.in_table:
            self.in_table = False
            self.section = None

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


def parse_results_page(page_id: str, html: str, min_tables: int = 0) -> list[dict]:
    """One page -> long records (table_idx, category, {header: value}) +
    updated stamp, covering ALL results_tables in page order. Ragged rows
    are padded with '' / truncated to the header width (PERMISSIVE-mode
    analog of wage_scraper.py:102-111).

    ``min_tables`` > 0 mirrors the reference's strict contract
    (wage_scraper.py:64-66 raises when fewer than 2 results_tables exist);
    the default 0 is the permissive distributed mode — a malformed page
    yields fewer rows instead of failing the whole Spark task."""
    p = _TableParser()
    p.feed(html)
    if len(p.tables) < min_tables:
        raise ValueError(
            f"Expected at least {min_tables} tables, found {len(p.tables)}"
        )
    m = UPDATED_RE.search(" ".join(p.text_chunks))
    updated = m.group(1) if m else None
    out = []
    for table_idx, (head_rows, body_rows) in enumerate(p.tables):
        headers = composite_headers(head_rows)
        for row in body_rows:
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
                    "table_idx": table_idx,
                    "category": category,
                    "values": values,
                    "page_updated_raw": updated,
                }
            )
    return out


def scan_html_tables(
    pages: DataFrame,
    id_col: str = "page_id",
    html_col: str = "html",
    min_tables: int = 0,
) -> DataFrame:
    """Distributed scan: DataFrame[(page_id, html)] -> ROW_SCHEMA rows, one
    per (results_table, body row). ``min_tables=2`` enforces the reference's
    wages+expenses page contract inside the scan."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for pid, html in zip(pdf[id_col], pdf[html_col]):
                rows.extend(parse_results_page(str(pid), html, min_tables=min_tables))
            yield pd.DataFrame(
                rows,
                columns=["page_id", "table_idx", "category", "values", "page_updated_raw"],
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
