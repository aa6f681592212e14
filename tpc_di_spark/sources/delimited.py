"""Delimited-text scans (SURVEY S1, S2, S6).

The reference hand-parses pipe-delimited extract files line by line
(`Incremental1/IncrementalCustomer.py:170-207` and 12 sibling parsers);
here each is one declarative ``spark.read.csv`` with an explicit schema —
header-less, '|'-separated, empty-string->NULL, casts inside the scan so
Catalyst prunes columns at the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_pipe_delimited(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = "|",
    header: bool = False,
) -> DataFrame:
    """Pipe-delimited extract scan — SURVEY S1 (`IncrementalAccount.py:
    74-87` et al.). ``emptyValue=None`` reproduces the parsers'
    empty-string→NULL convention; malformed casts become NULL (PERMISSIVE),
    matching the reference's `int(v) if v else None` (SURVEY P2)."""
    return (
        spark.read.schema(schema)
        .options(
            sep=sep,
            header=str(header).lower(),
            emptyValue=None,
            nullValue="",
            mode="PERMISSIVE",
        )
        .csv(path)
    )


def read_csv_with_header(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """CSV-with-header scan — SURVEY S2 (`Historical/prospect.py:71-104`
    csv.DictReader)."""
    return read_pipe_delimited(spark, path, schema, sep=",", header=True)


def read_batch_date(path: str) -> str:
    """Batch-metadata scalar — SURVEY S6 (`IncrementalFactProspect.py:
    195-210`): last non-empty line of BatchDate.txt. Driver-side, once per
    batch (the reference re-fetched it per row,
    `IncrementalFactCashBalances.py:133-148`)."""
    with open(os.path.join(path) if os.path.isfile(path) else path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if not lines:
        raise ValueError(f"no batch date found in {path}")
    return lines[-1]
