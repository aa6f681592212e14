"""Hierarchical XML action-log scan — SURVEY S3.

The reference walks CustomerMgmt.xml with ElementTree, namespace
``http://www.tpc.org/tpc-di``, extracting per-<Action> attributes plus
nested Customer/Name/Address/ContactInfo/TaxInfo and an Account array
(`Historical/DimCustomer.py:175-352`, `DimAccount.py:445-525`).

Spark 4 re-expression: split the document into one row per <Action>
element (a line-agnostic text read + regex extraction keeps the split
distributed), then ``from_xml`` with a nested StructType, then
``explode`` for per-account rows. No ElementTree, no driver-side loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PHONE = StructType(
    [
        StructField("C_CTRY_CODE", StringType()),
        StructField("C_AREA_CODE", StringType()),
        StructField("C_LOCAL", StringType()),
        StructField("C_EXT", StringType()),
    ]
)

ACTION_SCHEMA = StructType(
    [
        StructField("_ActionType", StringType()),
        StructField("_ActionTS", StringType()),
        StructField(
            "Customer",
            StructType(
                [
                    StructField("_C_ID", StringType()),
                    StructField("_C_TAX_ID", StringType()),
                    StructField("_C_GNDR", StringType()),
                    StructField("_C_TIER", IntegerType()),
                    StructField("_C_DOB", StringType()),
                    StructField(
                        "Name",
                        StructType(
                            [
                                StructField("C_L_NAME", StringType()),
                                StructField("C_F_NAME", StringType()),
                                StructField("C_M_NAME", StringType()),
                            ]
                        ),
                    ),
                    StructField(
                        "Address",
                        StructType(
                            [
                                StructField("C_ADLINE1", StringType()),
                                StructField("C_ADLINE2", StringType()),
                                StructField("C_ZIPCODE", StringType()),
                                StructField("C_CITY", StringType()),
                                StructField("C_STATE_PROV", StringType()),
                                StructField("C_CTRY", StringType()),
                            ]
                        ),
                    ),
                    StructField(
                        "ContactInfo",
                        StructType(
                            [
                                StructField("C_PRIM_EMAIL", StringType()),
                                StructField("C_ALT_EMAIL", StringType()),
                                StructField("C_PHONE_1", PHONE),
                                StructField("C_PHONE_2", PHONE),
                                StructField("C_PHONE_3", PHONE),
                            ]
                        ),
                    ),
                    StructField(
                        "TaxInfo",
                        StructType(
                            [
                                StructField("C_LCL_TX_ID", StringType()),
                                StructField("C_NAT_TX_ID", StringType()),
                            ]
                        ),
                    ),
                    StructField(
                        "Account",
                        ArrayType(
                            StructType(
                                [
                                    StructField("_CA_ID", StringType()),
                                    StructField("_CA_TAX_ST", IntegerType()),
                                    StructField("CA_B_ID", StringType()),
                                    StructField("CA_NAME", StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def read_actions(spark: SparkSession, path: str) -> DataFrame:
    """One row per <Action> element with the nested payload parsed."""
    raw = spark.read.text(path, wholetext=True)
    actions = raw.select(
        F.explode(
            F.regexp_extract_all(
                F.col("value"), F.lit(r"(?s)(<Action\b.*?</Action>)"), 1
            )
        ).alias("xml")
    )
    parsed = actions.select(
        F.from_xml(F.col("xml"), ACTION_SCHEMA).alias("a")
    ).select(
        F.col("a._ActionType").alias("action_type"),
        F.to_timestamp(F.col("a._ActionTS")).alias("action_ts"),
        F.col("a.Customer").alias("customer"),
    )
    return parsed


def explode_accounts(actions: DataFrame) -> DataFrame:
    """Per-account rows — the reference's nested Account[] handling
    (`Historical/DimAccount.py:512-521`)."""
    return actions.select(
        "action_type",
        "action_ts",
        F.col("customer._C_ID").alias("c_id"),
        F.explode_outer(F.col("customer.Account")).alias("acct"),
    ).select(
        "action_type",
        "action_ts",
        "c_id",
        F.col("acct._CA_ID").alias("ca_id"),
        F.col("acct._CA_TAX_ST").alias("ca_tax_st"),
        F.col("acct.CA_B_ID").alias("ca_b_id"),
        F.col("acct.CA_NAME").alias("ca_name"),
    )
