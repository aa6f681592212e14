"""Fixed-width multi-record-type scan — SURVEY S4, the FINWIRE format.

The reference slices each line by char offsets and dispatches on the
record-type tag at [15:18] (`Historical/test.py:66-181`). Here: one
``spark.read.text`` pass; per record type a projection of ``substring``
columns with empty→NULL trim (SURVEY P11). Filters and projections stay
inside whole-stage codegen; the text file is read once per requested type
(Catalyst pushes the type filter to the scan, and at scale the three
reads of one file are cheaper than caching a parsed union).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class FwField:
    name: str
    start: int  # 0-based char offset
    length: int
    dtype: str = "string"


# Layouts transcribed from the reference's slice offsets
# (`Historical/test.py:66-101` CMP, :103-130 SEC, :132-169 FIN).
PTS = FwField("pts", 0, 15)
REC_TYPE = FwField("rec_type", 15, 3)

CMP_FIELDS: tuple[FwField, ...] = (
    PTS,
    REC_TYPE,
    FwField("company_name", 18, 60),
    FwField("cik", 78, 10),
    FwField("status", 88, 4),
    FwField("industry_id", 92, 2),
    FwField("sp_rating", 94, 4),
    FwField("founding_date", 98, 8),
    FwField("addr_line1", 106, 80),
    FwField("addr_line2", 186, 80),
    FwField("postal_code", 266, 12),
    FwField("city", 278, 25),
    FwField("state_province", 303, 20),
    FwField("country", 323, 24),
    FwField("ceo_name", 347, 46),
    FwField("description", 393, 150),
)

SEC_FIELDS: tuple[FwField, ...] = (
    PTS,
    REC_TYPE,
    FwField("symbol", 18, 15),
    FwField("issue_type", 33, 6),
    FwField("status", 39, 4),
    FwField("name", 43, 70),
    FwField("ex_id", 113, 6),
    FwField("sh_out", 119, 13, "long"),
    FwField("first_trade_date", 132, 8),
    FwField("first_trade_exchg", 140, 8),
    FwField("dividend", 148, 12, "double"),
    FwField("co_name_or_cik", 160, 60),
)

FIN_FIELDS: tuple[FwField, ...] = (
    PTS,
    REC_TYPE,
    FwField("year", 18, 4, "int"),
    FwField("quarter", 22, 1, "int"),
    FwField("qtr_start_date", 23, 8),
    FwField("posting_date", 31, 8),
    FwField("revenue", 39, 17, "double"),
    FwField("earnings", 56, 17, "double"),
    FwField("eps", 73, 12, "double"),
    FwField("diluted_eps", 85, 12, "double"),
    FwField("margin", 97, 12, "double"),
    FwField("inventory", 109, 17, "double"),
    FwField("assets", 126, 17, "double"),
    FwField("liabilities", 143, 17, "double"),
    FwField("sh_out", 160, 13, "long"),
    FwField("diluted_sh_out", 173, 13, "long"),
    FwField("co_name_or_cik", 186, 60),
)

LAYOUTS = {"CMP": CMP_FIELDS, "SEC": SEC_FIELDS, "FIN": FIN_FIELDS}


def read_fixed_width(
    spark: SparkSession,
    path: str,
    rec_type: str,
    fields: Sequence[FwField] | None = None,
) -> DataFrame:
    """Scan one record type out of a FINWIRE-style multi-type file."""
    fields = fields or LAYOUTS[rec_type]
    lines = spark.read.text(path)
    typed = lines.filter(
        F.substring(F.col("value"), REC_TYPE.start + 1, REC_TYPE.length) == rec_type
    )
    cols = []
    for f in fields:
        raw = F.substring(F.col("value"), f.start + 1, f.length)
        c = F.nullif(F.trim(raw), F.lit(""))
        if f.dtype != "string":
            c = c.cast(f.dtype)  # bad casts -> NULL (SURVEY P2)
        cols.append(c.alias(f.name))
    return typed.select(*cols)
