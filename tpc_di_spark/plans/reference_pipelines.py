"""Reference-shaped table pipelines: the TPC-DI loads recomposed from the
engine's operators, one function per warehouse table family.

These are the parity demonstrations for SURVEY.md §2/§3 — each pipeline
names the reference implementation it re-expresses and is a pure
DataFrame composition (broadcast lookup joins, LWW folds, windows), where
the reference runs per-row Python with per-row SQL round trips.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tpc_di_spark.functions.cleaning import (
    domain_validate,
    format_phone,
    gender_norm,
    nameplate_tags,
    nullif_trim,
)
from tpc_di_spark.operators.windows import running_balance

END_OF_TIME = "9999-12-31"


# ---------------------------------------------------------------------------
# DimCustomer historical load — `Historical/DimCustomer.py:659-663`:
# parse XML actions -> LWW-fold updates onto NEW -> project -> load.
# ---------------------------------------------------------------------------

def build_dim_customer(
    actions: DataFrame,
    tax_rate: DataFrame,
    batch_id: int = 1,
) -> DataFrame:
    """``actions``: output of sources.xml_actions.read_actions (action_type,
    action_ts, customer struct). Returns one SCD2-current row per customer
    that has a NEW action, with UPDCUST/INACT field updates folded in
    last-writer-wins (`DimCustomer.py:634-657`, SURVEY A7) and the
    tax-rate lookup as a broadcast join (`:105-127`, SURVEY J1)."""
    c = actions.select(
        "action_type",
        "action_ts",
        F.col("customer._C_ID").alias("customer_id"),
        F.col("customer._C_TAX_ID").alias("tax_id"),
        F.col("customer._C_GNDR").alias("gender_raw"),
        F.col("customer._C_TIER").alias("tier"),
        F.col("customer._C_DOB").alias("dob"),
        F.col("customer.Name.C_L_NAME").alias("last_name"),
        F.col("customer.Name.C_F_NAME").alias("first_name"),
        F.col("customer.Address.C_ADLINE1").alias("address_line1"),
        F.col("customer.Address.C_ZIPCODE").alias("postal_code"),
        F.col("customer.ContactInfo.C_PRIM_EMAIL").alias("email1"),
        F.col("customer.ContactInfo.C_PHONE_1.C_CTRY_CODE").alias("ph_ctry"),
        F.col("customer.ContactInfo.C_PHONE_1.C_AREA_CODE").alias("ph_area"),
        F.col("customer.ContactInfo.C_PHONE_1.C_LOCAL").alias("ph_local"),
        F.col("customer.ContactInfo.C_PHONE_1.C_EXT").alias("ph_ext"),
        F.col("customer.TaxInfo.C_LCL_TX_ID").alias("lcl_tx_id"),
        F.col("customer.TaxInfo.C_NAT_TX_ID").alias("nat_tx_id"),
    )
    payload = [x for x in c.columns if x not in ("action_type", "action_ts", "customer_id")]

    # LWW fold: last non-NULL value per field over the action sequence,
    # overlaid onto the NEW record; customers without NEW are dropped.
    w = (
        Window.partitionBy("customer_id")
        .orderBy("action_ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    folded = c.select(
        "customer_id",
        "action_type",
        *[F.last(col, ignorenulls=True).over(w).alias(col) for col in payload],
        F.max(F.when(F.col("action_type").isin("INACT", "CLOSEACCT"), F.col("action_ts"))).over(w).alias("inact_ts"),
        F.min(F.when(F.col("action_type") == "NEW", F.col("action_ts"))).over(w).alias("new_ts"),
    ).filter(F.col("action_type") == "NEW")

    # Status mapping (SURVEY P7: NEW->ACTIVE, INACT/CLOSEACCT->INACTIVE).
    status = F.when(F.col("inact_ts").isNotNull(), "INACTIVE").otherwise("ACTIVE")

    out = folded.select(
        "customer_id",
        "tax_id",
        gender_norm(F.col("gender_raw")).alias("gender"),
        "tier",
        F.to_date("dob").alias("dob"),
        nullif_trim(F.col("last_name")).alias("last_name"),
        nullif_trim(F.col("first_name")).alias("first_name"),
        "address_line1",
        "postal_code",
        "email1",
        format_phone(
            F.col("ph_ctry"), F.col("ph_area"), F.col("ph_local"), F.col("ph_ext")
        ).alias("phone1"),
        F.col("nat_tx_id"),
        status.alias("status"),
        F.col("new_ts").alias("effective_ts"),
    )
    # J1: broadcast tax-rate lookup with NULLs on miss.
    tr = tax_rate.select(
        F.col("tx_id").alias("nat_tx_id"),
        F.col("tx_name").alias("national_tax_rate_desc"),
        F.col("tx_rate").alias("national_tax_rate"),
    )
    out = out.join(F.broadcast(tr), "nat_tx_id", "left")
    # SCD2 defaults (SURVEY P8).
    return (
        out.withColumn("is_current", F.lit(True))
        .withColumn("end_ts", F.to_timestamp(F.lit(f"{END_OF_TIME} 00:00:00")))
        .withColumn("batch_id", F.lit(batch_id))
    )


# ---------------------------------------------------------------------------
# DimTrade — `Historical/DimTrade.py:162-272` + `Incremental1/
# IncrementalDimTrade.py`: lookups J2/J3/J4, create/close-date P10.
# ---------------------------------------------------------------------------

def build_dim_trade(
    trades: DataFrame,
    status_type: DataFrame,
    trade_type: DataFrame,
    dim_date: DataFrame,
    dim_time: DataFrame,
) -> DataFrame:
    t = trades.withColumn("trade_date", F.to_date("t_dts")).withColumn(
        "trade_time", F.date_format("t_dts", "HH:mm:ss")
    )
    t = t.join(
        F.broadcast(status_type.select(F.col("st_id").alias("t_st_id"), F.col("st_name").alias("status"))),
        "t_st_id", "left",
    )
    t = t.join(
        F.broadcast(trade_type.select(F.col("tt_id").alias("t_tt_id"), F.col("tt_name").alias("type_name"))),
        "t_tt_id", "left",
    )
    t = t.join(
        F.broadcast(dim_date.select(F.col("datevalue").alias("trade_date"), F.col("sk_dateid").alias("sk_dateid"))),
        "trade_date", "left",
    )
    t = t.join(
        F.broadcast(dim_time.select(F.col("timevalue").alias("trade_time"), F.col("sk_timeid").alias("sk_timeid"))),
        "trade_time", "left",
    )
    # P10: create vs close SK assignment by status/type.
    creating = F.col("t_st_id").isin("SBMT", "PNDG") | F.col("t_tt_id").isin("TMB", "TMS")
    closing = F.col("t_st_id").isin("CMPT", "CNCL")
    return t.select(
        "t_id",
        "t_dts",
        "status",
        "type_name",
        (F.col("t_is_cash") == F.lit(True)).alias("cash_flag"),
        F.when(creating, F.col("sk_dateid")).alias("sk_create_dateid"),
        F.when(creating, F.col("sk_timeid")).alias("sk_create_timeid"),
        F.when(closing, F.col("sk_dateid")).alias("sk_close_dateid"),
        F.when(closing, F.col("sk_timeid")).alias("sk_close_timeid"),
        "t_qty",
        "t_bid_price",
        "t_trade_price",
    )


# ---------------------------------------------------------------------------
# FactCashBalances — `Historical/fact_cash_balances.py:36-101` (SURVEY A1).
# ---------------------------------------------------------------------------

def build_fact_cash_balances(cash_txn: DataFrame) -> DataFrame:
    daily = (
        cash_txn.withColumn("day", F.to_date("ct_dts"))
        .groupBy("ct_ca_id", "day")
        .agg(F.sum(F.col("ct_amt").cast("decimal(18,2)")).alias("net_amt"))
    )
    out = running_balance(daily, ["ct_ca_id"], ["day"], "net_amt", alias="cash")
    return out.select(
        F.col("ct_ca_id").alias("account_id"),
        "day",
        F.col("net_amt").cast("double").alias("net_amt"),
        F.col("cash").cast("double").alias("cash"),
    )


# ---------------------------------------------------------------------------
# FactWatches — `Incremental1/IncrementalFactWatches.py:159-228` (SURVEY M4):
# ACTV places a watch, CNCL stamps DateRemoved on the matching pair.
# ---------------------------------------------------------------------------

def build_fact_watches(watch_history: DataFrame) -> DataFrame:
    placed = (
        watch_history.filter(F.col("w_action") == "ACTV")
        .groupBy("w_c_id", "w_s_symb")
        .agg(F.min("w_dts").alias("date_placed"))
    )
    removed = (
        watch_history.filter(F.col("w_action") == "CNCL")
        .groupBy("w_c_id", "w_s_symb")
        .agg(F.min("w_dts").alias("date_removed"))
    )
    out = placed.join(removed, ["w_c_id", "w_s_symb"], "left")
    # Only removals at/after placement count (the reference's update-if-
    # currently-NULL guard, `Historical/FactWatches.py:101-130`).
    return out.select(
        F.col("w_c_id").alias("customer_id"),
        F.col("w_s_symb").alias("symbol"),
        "date_placed",
        F.when(F.col("date_removed") >= F.col("date_placed"), F.col("date_removed")).alias("date_removed"),
    )


# ---------------------------------------------------------------------------
# DimCompany / Financial from FINWIRE — `Historical/test.py:217-368`:
# domain validation + alert side-output (P12), disjunctive-key join (J6).
# ---------------------------------------------------------------------------

VALID_SP_RATINGS = [
    "AAA", "AA", "AA+", "AA-", "A", "A+", "A-",
    "BBB", "BBB+", "BBB-", "BB", "BB+", "BB-",
    "B", "B+", "B-", "CCC", "CCC+", "CCC-", "CC", "C", "D",
]


def build_dim_company(cmp_records: DataFrame) -> DataFrame:
    rated = cmp_records.withColumn("sp_rating_valid", domain_validate(F.col("sp_rating"), VALID_SP_RATINGS))
    return rated.select(
        F.row_number()
        .over(Window.orderBy("pts", "cik"))
        .alias("sk_companyid"),  # M5: deterministic surrogate keys
        F.col("cik").cast("long").alias("company_id"),
        F.col("company_name").alias("name"),
        F.col("sp_rating_valid").alias("sp_rating"),
        # `Historical/test.py:239`: low grade = rating present and not
        # startswith ('A', 'BBB') — so BBB+/BBB- are NOT low grade, a NULL
        # rating gives False, and an invalid (non-domain) rating gives NULL.
        F.when(
            F.col("sp_rating_valid").isNull() & F.col("sp_rating").isNotNull(),
            F.lit(None).cast("boolean"),
        ).otherwise(
            F.col("sp_rating_valid").isNotNull()
            & ~(
                F.col("sp_rating_valid").startswith("A")
                | F.col("sp_rating_valid").startswith("BBB")
            )
        ).alias("is_low_grade"),
        (F.col("sp_rating_valid").isNull() & F.col("sp_rating").isNotNull()).alias("alert_invalid_rating"),
        F.to_timestamp(F.col("pts"), "yyyyMMdd-HHmmss").alias("effective_ts"),
    )


def build_financials(fin_records: DataFrame, dim_company: DataFrame) -> DataFrame:
    """Disjunctive-key join (SURVEY J6): CoNameOrCIK matches company name
    OR zero-padded CIK (`Historical/test.py:341-343`) — two broadcast
    equi-joins + coalesce, never an OR-condition theta join."""
    by_name = dim_company.select(
        F.col("name").alias("_match_name"), F.col("sk_companyid").alias("_sk_by_name")
    )
    by_cik = dim_company.select(
        F.format_string("%010d", F.col("company_id")).alias("_match_cik"),
        F.col("sk_companyid").alias("_sk_by_cik"),
    )
    f = fin_records.join(
        F.broadcast(by_name), fin_records.co_name_or_cik == by_name._match_name, "left"
    ).join(
        F.broadcast(by_cik), fin_records.co_name_or_cik == by_cik._match_cik, "left"
    )
    return f.select(
        F.coalesce(F.col("_sk_by_name"), F.col("_sk_by_cik")).alias("sk_companyid"),
        "year",
        "quarter",
        F.to_date(F.col("qtr_start_date"), "yyyyMMdd").alias("qtr_start_date"),
        "revenue",
        "earnings",
        "eps",
    )


# ---------------------------------------------------------------------------
# Prospect — `Historical/prospect.py` + `Incremental1/IncrementalFactProspect
# .py:234-307`: nameplate (P6) + 21-column change detection vs the stored
# row with SK retention (A8) + IsCustomer via demographic match (J7).
# ---------------------------------------------------------------------------

def build_prospect(
    prospect_new: DataFrame,
    prospect_stored: DataFrame | None,
    customers_active: DataFrame,
    batch_sk: int,
) -> DataFrame:
    # Exact tag predicates and order from `Historical/prospect.py:184-216`.
    tags = nameplate_tags(
        [
            ((F.col("net_worth") > 1_000_000) | (F.col("income") > 200_000), "HighValue"),
            ((F.col("number_children") > 3) | (F.col("number_credit_cards") > 5), "Expenses"),
            (F.col("age") > 45, "Boomer"),
            (
                (F.col("income") < 50_000)
                | (F.col("credit_rating") < 600)
                | (F.col("net_worth") < 100_000),
                "MoneyAlert",
            ),
            ((F.col("number_cars") > 3) | (F.col("number_credit_cards") > 7), "Spender"),
            ((F.col("age") < 25) & (F.col("net_worth") > 1_000_000), "Inherited"),
        ]
    )
    p = prospect_new.withColumn("marketing_nameplate", tags)

    compare_cols = [
        "last_name", "first_name", "gender", "address_line1", "postal_code",
        "income", "number_cars", "number_children", "age", "credit_rating", "net_worth",
    ]
    if prospect_stored is not None:
        stored = prospect_stored.select(
            "agency_id",
            F.col("sk_updatedateid").alias("_old_sk"),
            *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
        )
        p = p.join(stored, "agency_id", "left")
        changed = F.lit(False)
        for c in compare_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
        sk = (
            F.when(F.col("_old_sk").isNull(), F.lit(batch_sk))  # new agency
            .when(changed, F.lit(batch_sk))                     # any field differs
            .otherwise(F.col("_old_sk"))                        # unchanged: retain
        )
        p = p.withColumn("sk_updatedateid", sk).drop(
            "_old_sk", *[f"_old_{c}" for c in compare_cols]
        )
    else:
        p = p.withColumn("sk_updatedateid", F.lit(batch_sk))

    # J7: IsCustomer via case-insensitive demographic match vs ACTIVE
    # customers (`prospect.py:172-182`). The probe is ONE xxhash64 of the
    # four upper-cased fields (8 bytes/row) rather than the fields
    # themselves, and carries NO broadcast hint: at the 100x design point
    # the active-customer dimension is not broadcast-sized, so the plan is
    # left to AQE (which will still broadcast when the hashed probe fits —
    # and at 8 bytes/row it fits ~30x more customers than the string
    # projection did). Rows with any NULL field keep NULL keys on both
    # sides (never match), preserving the reference's NULL-equality
    # semantics; the only divergence from exact string matching is a
    # 64-bit hash collision.
    _match_fields = ("first_name", "last_name", "address_line1", "postal_code")

    def _match_key(qual) -> F.Column:
        cols = [F.upper(qual(c)) for c in _match_fields]
        all_present = F.lit(True)
        for c in cols:
            all_present = all_present & c.isNotNull()
        return F.when(all_present, F.xxhash64(*cols))

    probe = customers_active.select(
        _match_key(F.col).alias("_m_key")
    ).where(F.col("_m_key").isNotNull()).distinct()
    return (
        p.withColumn("_p_key", _match_key(lambda c: p[c]))
        .join(probe, F.col("_p_key") == F.col("_m_key"), "left")
        .withColumn("is_customer", F.col("_m_key").isNotNull())
        .drop("_p_key", "_m_key")
    )


# ---------------------------------------------------------------------------
# DimBroker — `Historical/DimBroker.py:43-67`: P3 filter on job code 314,
# A4 global-min EffectiveDate from DimDate, SCD2 defaults (P8), M5 SKs.
# ---------------------------------------------------------------------------

def build_dim_broker(hr: DataFrame, dim_date: DataFrame, batch_id: int = 1) -> DataFrame:
    """``hr``: HR.csv columns (employee_id, manager_id, first_name,
    last_name, middle_initial, job_code, branch, office, phone).
    EffectiveDate is the earliest DimDate value (`DimBroker.py:36-41`) —
    an A4 global-min scalar broadcast onto every row instead of the
    reference's per-run SELECT MIN round trip."""
    brokers = hr.filter(F.col("job_code") == "314")
    earliest = dim_date.agg(F.min("datevalue").alias("_earliest"))
    return brokers.crossJoin(F.broadcast(earliest)).select(
        F.row_number().over(Window.orderBy("employee_id")).alias("sk_brokerid"),  # M5
        F.col("employee_id").alias("broker_id"),
        F.col("manager_id"),
        F.col("first_name"),
        F.col("last_name"),
        nullif_trim(F.col("middle_initial")).alias("middle_initial"),  # P11
        F.col("branch"),
        F.col("office"),
        F.col("phone"),
        F.lit(True).alias("is_current"),
        F.lit(batch_id).alias("batch_id"),
        F.col("_earliest").alias("effective_date"),
        F.to_timestamp(F.lit(f"{END_OF_TIME} 00:00:00")).alias("end_date"),
    )


# ---------------------------------------------------------------------------
# DimSecurity — `Historical/test.py:389-440`: trim-to-NULL (P11), temporal
# disjunctive company match (J5+J6), status lookup (J2), SCD2 defaults (P8).
# ---------------------------------------------------------------------------

def build_dim_security(
    sec_records: DataFrame,
    dim_company: DataFrame,
    status_type: DataFrame,
    batch_id: int = 1,
) -> DataFrame:
    """``sec_records``: FINWIRE SEC rows (pts timestamp, symbol, issue_type,
    name, ex_id, sh_out, first_trade_date, first_trade_exchg, dividend,
    co_name_or_cik, status). ``dim_company`` must carry (sk_companyid,
    name, company_id, effective_ts, end_ts).

    The reference scans dim_company per SEC record for
    ``EffectiveDate <= pts < EndDate and (Name == c or CompanyID == c)``
    (`test.py:407-410`); here that is two broadcast band joins (name path,
    zero-padded-CIK path) + coalesce — J6's no-theta-join shape on top of
    J5's validity band."""
    s = sec_records.select(
        "pts",
        *[
            nullif_trim(F.col(c)).alias(c)
            for c in (
                "symbol", "issue_type", "name", "ex_id", "sh_out",
                "first_trade_date", "first_trade_exchg", "dividend",
                "co_name_or_cik", "status",
            )
        ],
    )
    # SIZE ASSUMPTION behind the two broadcast hints below: DimCompany is
    # a true dimension (one row per company + SCD2 history, 4 narrow
    # columns projected) — at TPC-DI SF10k that is ~5M rows / ~200 MB,
    # broadcastable on executor-sized memory, and the band join would
    # otherwise be a fact-sized SMJ on a range predicate. If the company
    # dim ever outgrows broadcast, drop the hints: the disjunctive
    # temporal join falls back to temporal_join.band_join's sort-merge
    # path (used by q39's fact-sized band join).
    by_name = dim_company.select(
        F.col("name").alias("_m_name"),
        F.col("effective_ts").alias("_eff_a"),
        F.col("end_ts").alias("_end_a"),
        F.col("sk_companyid").alias("_sk_a"),
    )
    by_cik = dim_company.select(
        F.format_string("%010d", F.col("company_id")).alias("_m_cik"),
        F.col("effective_ts").alias("_eff_b"),
        F.col("end_ts").alias("_end_b"),
        F.col("sk_companyid").alias("_sk_b"),
    )
    j = s.join(
        F.broadcast(by_name),
        (s.co_name_or_cik == F.col("_m_name"))
        & (F.col("_eff_a") <= s.pts) & (s.pts < F.col("_end_a")),
        "left",
    ).join(
        F.broadcast(by_cik),
        (s.co_name_or_cik == F.col("_m_cik"))
        & (F.col("_eff_b") <= s.pts) & (s.pts < F.col("_end_b")),
        "left",
    )
    st = status_type.select(
        F.col("st_id").alias("status"), F.col("st_name").alias("_status_name")
    )
    j = j.join(F.broadcast(st), "status", "left")
    return j.select(
        F.row_number().over(Window.orderBy("pts", "symbol")).alias("sk_securityid"),  # M5
        F.coalesce(F.col("_sk_a"), F.col("_sk_b")).alias("sk_companyid"),
        "symbol",
        F.col("issue_type").alias("issue"),
        "name",
        F.col("ex_id").alias("exchange_id"),
        F.col("sh_out").alias("shares_outstanding"),
        F.col("first_trade_date").alias("first_trade"),
        F.col("first_trade_exchg").alias("first_trade_on_exchange"),
        "dividend",
        F.col("_status_name").alias("status_name"),
        F.lit(True).alias("is_current"),
        F.col("pts").alias("effective_ts"),
        F.to_timestamp(F.lit(f"{END_OF_TIME} 00:00:00")).alias("end_ts"),
        F.lit(batch_id).alias("batch_id"),
    )


# ---------------------------------------------------------------------------
# FactHoldings — `Historical/FactHoldings.py:31-76`: J9 fact-enrich join
# replacing the reference's per-row DimTrade SELECT (the N+1 anti-pattern).
# ---------------------------------------------------------------------------

def build_fact_holdings(holding_history: DataFrame, dim_trade: DataFrame, batch_id: int = 1) -> DataFrame:
    """``holding_history``: (hh_t_id, hh_h_t_id, hh_before_qty,
    hh_after_qty). ``dim_trade``: (t_id, sk_customerid, sk_accountid,
    sk_securityid, sk_companyid, sk_closedateid, sk_closetimeid,
    t_trade_price). Plain shuffled equi-join — both sides are fact-sized,
    so AQE picks the physical strategy; no broadcast of a fact."""
    dt = dim_trade.select(
        F.col("t_id").alias("_t"),
        "sk_customerid", "sk_accountid", "sk_securityid", "sk_companyid",
        F.col("sk_closedateid").alias("sk_dateid"),
        F.col("sk_closetimeid").alias("sk_timeid"),
        F.col("t_trade_price").alias("current_price"),
    )
    return holding_history.join(dt, holding_history.hh_t_id == F.col("_t"), "left").select(
        F.col("hh_t_id").alias("trade_id"),
        F.col("hh_h_t_id").alias("current_trade_id"),
        "sk_customerid", "sk_accountid", "sk_securityid", "sk_companyid",
        "sk_dateid", "sk_timeid", "current_price",
        F.col("hh_after_qty").alias("current_holding"),
        F.lit(batch_id).alias("batch_id"),
    )


# ---------------------------------------------------------------------------
# FactMarketHistory — `Incremental1/IncrementalFactMarketHistory.py:169-329`:
# the full composition A2 (52-week high/low + arg-date) + A3/J9 (PERatio
# over FINWIRE financials) + J2-style dividend lookup for Yield.
# ---------------------------------------------------------------------------

def build_fact_market_history(
    daily_market: DataFrame,
    financials: DataFrame,
    dim_security: DataFrame,
) -> DataFrame:
    """``daily_market``: (dm_s_symb, dm_date timestamp, dm_close, dm_high,
    dm_low). ``financials``: build_financials output joined to a
    symbol (sk_companyid->symbol resolution done by the caller) as
    (dm_s_symb, qtr_start_date timestamp, eps). ``dim_security``:
    (symbol, dividend, is_current).

    Reference semantics reproduced exactly:
    - 52-wk bands are (d - 365d, d] — strictly greater than one year
      earlier (`:222-229`) — via ``lower_exclusive=True``; the current
      row participates, subsuming the reference's "if history < today's
      high, take today" fallback (`:241-243`, which exists only because
      its window scans the pre-insert table).
    - PERatio = dm_close / sum(eps) over quarters in (d-365d, d]
      (`:278-287`); eps sum NULL *or zero* -> NULL PERatio + alert
      (`:296-298`, ``if eps:`` is falsy for 0).
    - Yield = dividend / dm_close * 100 from the IsCurrent security row
      (`:305-325`); zero dividend -> NULL (``if dividend:``).

    Shape: ONE shared window pass for both extremes (same 365-day frame
    => a single Window node, appended in place — no join-back; VERDICT
    r04 #6) + a bounded band join against the quarterly financials
    (<= 4 rows/key/yr) + a broadcast dividend lookup.
    """
    from tpc_di_spark.operators.windows import trailing_extremes

    dm = trailing_extremes(
        daily_market, "dm_s_symb", "dm_date",
        [
            ("dm_high", "max", "fiftytwoweekhigh", "fiftytwoweekhighdate"),
            ("dm_low", "min", "fiftytwoweeklow", "fiftytwoweeklowdate"),
        ],
        days=365, lower_exclusive=True,
    )

    from tpc_di_spark.operators.windows import keyed_partitions

    # Explicit keyed repartition on both band-join sides: the join's cost
    # is the per-pair range predicate inside each symbol (compute, not
    # bytes), so AQE's byte-based coalescing collapsed it to 2 tasks on a
    # 32-core session — the same escape hatch as the trailing windows
    # (operators/windows.keyed_partitions).
    fin = keyed_partitions(
        financials.select(
            F.col("dm_s_symb"), F.col("qtr_start_date"), F.col("eps").cast("decimal(18,4)").alias("_eps")
        ),
        "dm_s_symb",
    )
    eps = (
        keyed_partitions(
            daily_market.select("dm_s_symb", "dm_date").distinct(), "dm_s_symb"
        )
        .join(
            fin,
            (daily_market.dm_s_symb == fin.dm_s_symb)
            & (fin.qtr_start_date > daily_market.dm_date - F.expr("INTERVAL 365 DAYS"))
            & (fin.qtr_start_date <= daily_market.dm_date),
            "left",
        )
        .groupBy(daily_market.dm_s_symb.alias("dm_s_symb"), "dm_date")
        .agg(F.sum("_eps").cast("double").alias("_eps_sum"))
    )

    div = dim_security.filter(F.col("is_current")).select(
        F.col("symbol").alias("dm_s_symb"), F.col("dividend").cast("double").alias("_dividend")
    )

    out = (
        dm
        .join(eps, ["dm_s_symb", "dm_date"], "left")
        .join(F.broadcast(div), "dm_s_symb", "left")
    )
    pe = F.when(
        F.col("_eps_sum").isNotNull() & (F.col("_eps_sum") != 0),
        F.col("dm_close") / F.col("_eps_sum"),
    )
    yld = F.when(
        F.col("_dividend").isNotNull() & (F.col("_dividend") != 0),
        F.col("_dividend") / F.col("dm_close") * 100,
    )
    return out.select(
        "dm_s_symb", "dm_date", "dm_close", "dm_high", "dm_low",
        "fiftytwoweekhigh", "fiftytwoweekhighdate",
        "fiftytwoweeklow", "fiftytwoweeklowdate",
        pe.alias("peratio"),
        (F.col("_eps_sum").isNull() | (F.col("_eps_sum") == 0)).alias("alert_no_earnings"),
        yld.alias("yield"),
    )


# ---------------------------------------------------------------------------
# Multi-fact surrogate-key cascade — SURVEY M2
# (`Incremental1/IncrementalCustomer.py:699-807`).
# ---------------------------------------------------------------------------

def sk_cascade_repoint(
    remap: DataFrame,
    facts: dict[str, dict],
) -> dict[str, DataFrame]:
    """When an SCD2 dimension update mints a new surrogate key, re-point
    every dependent table. The reference issues one UPDATE per changed
    customer per table (three server round trips per row,
    `IncrementalCustomer.py:705-760`); here each table gets ONE broadcast
    join against the remap — the remap is dimension-delta-sized, so no
    fact-side shuffle and the cascade cost is O(sum of fact scans).

    ``remap`` columns: ``old_sk``, ``new_sk``, plus any carried columns
    referenced by per-table ``set`` entries (e.g. the reference also sets
    DimAccount.status from the new customer row, `:705-709`).

    ``facts``: {table_name: {"df": DataFrame, "sk_col": str,
    "set": {fact_col: remap_col, ...}  # optional extra assignments}}

    Returns {table_name: re-pointed DataFrame}. Unmatched rows pass
    through untouched. Each output commits through its own table's
    transaction (single-table transactions, like Iceberg's — the
    reference has no cross-table atomicity either: each UPDATE
    autocommits)."""
    out: dict[str, DataFrame] = {}
    for name, spec in facts.items():
        df, sk_col = spec["df"], spec["sk_col"]
        set_cols: dict[str, str] = spec.get("set", {})
        carry = ["old_sk", "new_sk", *{v for v in set_cols.values()}]
        r = remap.select(*[F.col(c).alias(f"_r_{c}") for c in carry])
        j = df.join(F.broadcast(r), df[sk_col] == F.col("_r_old_sk"), "left")
        res = j.withColumn(sk_col, F.coalesce(F.col("_r_new_sk"), F.col(sk_col)))
        for fact_col, remap_col in set_cols.items():
            res = res.withColumn(
                fact_col,
                F.when(F.col("_r_old_sk").isNotNull(), F.col(f"_r_{remap_col}"))
                .otherwise(F.col(fact_col)),
            )
        out[name] = res.drop(*[f"_r_{c}" for c in carry])
    return out
