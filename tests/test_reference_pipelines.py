import datetime as dt
import textwrap

import pyspark.sql.functions as F

from tpc_di_spark.plans.reference_pipelines import (
    build_dim_company,
    build_dim_trade,
    build_fact_cash_balances,
    build_fact_watches,
    build_financials,
    build_prospect,
)


def test_dim_customer_from_xml_actions(spark, tmp_path):
    from tpc_di_spark.plans.reference_pipelines import build_dim_customer
    from tpc_di_spark.sources.xml_actions import read_actions

    xml = textwrap.dedent(
        """\
        <TPCDI:Actions xmlns:TPCDI="http://www.tpc.org/tpc-di">
          <Action ActionType="NEW" ActionTS="2024-01-01T10:00:00">
            <Customer C_ID="1" C_TAX_ID="t1" C_GNDR="f" C_TIER="1" C_DOB="1980-05-06">
              <Name><C_L_NAME>Doe</C_L_NAME><C_F_NAME>Jane</C_F_NAME></Name>
              <ContactInfo>
                <C_PRIM_EMAIL>j@x.com</C_PRIM_EMAIL>
                <C_PHONE_1><C_CTRY_CODE>1</C_CTRY_CODE><C_AREA_CODE>415</C_AREA_CODE><C_LOCAL>5550100</C_LOCAL></C_PHONE_1>
              </ContactInfo>
              <TaxInfo><C_LCL_TX_ID>L1</C_LCL_TX_ID><C_NAT_TX_ID>N1</C_NAT_TX_ID></TaxInfo>
            </Customer>
          </Action>
          <Action ActionType="UPDCUST" ActionTS="2024-03-01T10:00:00">
            <Customer C_ID="1" C_GNDR="q">
              <Name><C_L_NAME>Doe-Smith</C_L_NAME></Name>
            </Customer>
          </Action>
          <Action ActionType="NEW" ActionTS="2024-01-02T10:00:00">
            <Customer C_ID="2" C_GNDR="M">
              <Name><C_L_NAME>Roe</C_L_NAME><C_F_NAME>Rex</C_F_NAME></Name>
            </Customer>
          </Action>
          <Action ActionType="INACT" ActionTS="2024-04-01T10:00:00">
            <Customer C_ID="2"/>
          </Action>
          <Action ActionType="UPDCUST" ActionTS="2024-05-01T10:00:00">
            <Customer C_ID="99"><Name><C_L_NAME>Ghost</C_L_NAME></Name></Customer>
          </Action>
        </TPCDI:Actions>
        """
    )
    p = tmp_path / "CustomerMgmt.xml"
    p.write_text(xml)
    actions = read_actions(spark, str(p))
    tax = spark.createDataFrame(
        [("N1", "Federal", 0.25)], "tx_id string, tx_name string, tx_rate double"
    )
    dim = build_dim_customer(actions, tax)
    rows = {r.customer_id: r for r in dim.collect()}
    assert set(rows) == {"1", "2"}, "UPDCUST without NEW is dropped (LWW fold keeps NEW rows only)"
    c1 = rows["1"]
    assert c1.last_name == "Doe-Smith", "UPDCUST overlays the NEW record"
    assert c1.first_name == "Jane", "fields absent from the update are retained"
    assert c1.gender == "U", "invalid gender normalizes to U (P4)"
    assert c1.phone1 == "+1 (415) 5550100"
    assert c1.national_tax_rate == 0.25 and c1.national_tax_rate_desc == "Federal"
    assert c1.status == "ACTIVE"
    assert rows["2"].status == "INACTIVE"
    assert rows["2"].national_tax_rate is None, "tax lookup miss -> NULLs (J1 left join)"


def test_dim_trade_lookups_and_date_assignment(spark):
    trades = spark.createDataFrame(
        [
            ("T1", dt.datetime(2024, 1, 2, 9, 30, 0), "SBMT", "TLB", True, 10, 1.0, None),
            ("T2", dt.datetime(2024, 1, 2, 16, 0, 0), "CMPT", "TLS", False, 5, 2.0, 2.5),
        ],
        "t_id string, t_dts timestamp, t_st_id string, t_tt_id string, t_is_cash boolean, t_qty int, t_bid_price double, t_trade_price double",
    )
    status = spark.createDataFrame(
        [("SBMT", "Submitted"), ("CMPT", "Completed")], "st_id string, st_name string"
    )
    ttype = spark.createDataFrame(
        [("TLB", "Limit Buy"), ("TLS", "Limit Sell")], "tt_id string, tt_name string"
    )
    ddate = spark.createDataFrame(
        [(20240102, dt.date(2024, 1, 2))], "sk_dateid long, datevalue date"
    )
    dtime = spark.createDataFrame(
        [(93000, "09:30:00"), (160000, "16:00:00")], "sk_timeid long, timevalue string"
    )
    out = {r.t_id: r for r in build_dim_trade(trades, status, ttype, ddate, dtime).collect()}
    t1, t2 = out["T1"], out["T2"]
    assert t1.status == "Submitted" and t1.type_name == "Limit Buy"
    assert t1.sk_create_dateid == 20240102 and t1.sk_create_timeid == 93000
    assert t1.sk_close_dateid is None, "SBMT sets create SKs only (P10)"
    assert t2.sk_close_dateid == 20240102 and t2.sk_create_dateid is None
    assert t1.cash_flag is True and t2.cash_flag is False


def test_fact_cash_balances_running(spark):
    txns = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9), 100.0, "dep"),
            (1, dt.datetime(2024, 1, 1, 15), -30.0, "wd"),
            (1, dt.datetime(2024, 1, 3, 9), 10.0, "dep"),
            (2, dt.datetime(2024, 1, 1, 9), 7.0, "dep"),
        ],
        "ct_ca_id long, ct_dts timestamp, ct_amt double, ct_name string",
    )
    out = {(r.account_id, str(r.day)): r for r in build_fact_cash_balances(txns).collect()}
    assert out[(1, "2024-01-01")].net_amt == 70.0
    assert out[(1, "2024-01-01")].cash == 70.0
    assert out[(1, "2024-01-03")].cash == 80.0
    assert out[(2, "2024-01-01")].cash == 7.0


def test_fact_watches_actv_cncl(spark):
    wh = spark.createDataFrame(
        [
            ("C1", "AAA", dt.datetime(2024, 1, 1), "ACTV"),
            ("C1", "AAA", dt.datetime(2024, 2, 1), "CNCL"),
            ("C1", "BBB", dt.datetime(2024, 1, 5), "ACTV"),
            ("C2", "AAA", dt.datetime(2024, 3, 1), "CNCL"),  # cancel without watch
        ],
        "w_c_id string, w_s_symb string, w_dts timestamp, w_action string",
    )
    out = {(r.customer_id, r.symbol): r for r in build_fact_watches(wh).collect()}
    assert out[("C1", "AAA")].date_removed == dt.datetime(2024, 2, 1)
    assert out[("C1", "BBB")].date_removed is None
    assert ("C2", "AAA") not in out, "CNCL without a placed watch inserts nothing (M4)"


def test_dim_company_financial_disjunctive_join(spark):
    cmp = spark.createDataFrame(
        [
            ("20240101-090000", "CMP", "Acme Corp", "0000000007", "AAA"),
            ("20240101-090001", "CMP", "Bad Rating Inc", "0000000008", "ZZZ"),
            ("20240101-090002", "CMP", "Border Plus", "0000000009", "BBB+"),
            ("20240101-090003", "CMP", "Border Minus", "0000000010", "BBB-"),
            ("20240101-090004", "CMP", "No Rating Co", "0000000011", None),
            ("20240101-090005", "CMP", "Junk Co", "0000000012", "CCC"),
        ],
        "pts string, rec_type string, company_name string, cik string, sp_rating string",
    )
    dim = build_dim_company(cmp)
    rows = {r.company_id: r for r in dim.collect()}
    assert rows[7].sp_rating == "AAA" and rows[7].alert_invalid_rating is False
    assert rows[8].sp_rating is None and rows[8].alert_invalid_rating is True, (
        "invalid SPRating -> NULL + alert side-output (P12)"
    )
    # `Historical/test.py:239`: not rating.startswith(('A','BBB')) — so
    # BBB+/BBB- are investment grade, NULL rating gives False, and an
    # invalid rating gives NULL (the reference raises on None, yields
    # NULL-ish on out-of-domain).
    assert rows[7].is_low_grade is False
    assert rows[9].is_low_grade is False and rows[10].is_low_grade is False, (
        "BBB+/BBB- startswith('BBB') -> NOT low grade"
    )
    assert rows[11].is_low_grade is False, "NULL rating -> False, not low grade"
    assert rows[8].is_low_grade is None, "invalid rating -> NULL low-grade flag"
    assert rows[12].is_low_grade is True, "CCC is low grade"

    fin = spark.createDataFrame(
        [
            ("Acme Corp", 2024, 1, "20240101", 10.0, 1.0, 0.5),
            ("0000000008", 2024, 1, "20240101", 20.0, 2.0, 0.7),
            ("No Such Co", 2024, 1, "20240101", 30.0, 3.0, 0.9),
        ],
        "co_name_or_cik string, year int, quarter int, qtr_start_date string, revenue double, earnings double, eps double",
    )
    out = build_financials(fin, dim).collect()
    by_rev = {r.revenue: r.sk_companyid for r in out}
    assert by_rev[10.0] == rows[7].sk_companyid, "matched by name"
    assert by_rev[20.0] == rows[8].sk_companyid, "matched by zero-padded CIK"
    assert by_rev[30.0] is None, "no match -> NULL SK"


def test_prospect_change_detection_and_is_customer(spark):
    cols = (
        "agency_id string, last_name string, first_name string, gender string, "
        "address_line1 string, postal_code string, income long, number_cars int, "
        "number_children int, age int, credit_rating int, net_worth long, "
        "number_credit_cards int"
    )
    stored = spark.createDataFrame(
        [
            ("A1", "Doe", "Jane", "F", "1 Main", "12345", 80000, 1, 1, 50, 700, 2_000_000, 2),
            ("A2", "Roe", "Rex", "M", "2 Elm", "99999", 40000, 1, 0, 30, 550, 50_000, 1),
        ],
        cols,
    ).withColumn("sk_updatedateid", F.lit(100))
    new = spark.createDataFrame(
        [
            # A1 unchanged -> retains SK 100
            ("A1", "Doe", "Jane", "F", "1 Main", "12345", 80000, 1, 1, 50, 700, 2_000_000, 2),
            # A2 income changed -> bumped to batch SK
            ("A2", "Roe", "Rex", "M", "2 Elm", "99999", 45000, 1, 0, 30, 550, 50_000, 1),
            # A3 brand new
            ("A3", "New", "Nia", "F", "3 Oak", "11111", 200000, 4, 4, 22, 800, 2_000_000, 8),
        ],
        cols,
    )
    customers = spark.createDataFrame(
        [("jane", "doe", "1 main", "12345")],
        "first_name string, last_name string, address_line1 string, postal_code string",
    )
    out = {r.agency_id: r for r in build_prospect(new, stored, customers, batch_sk=200).collect()}
    assert out["A1"].sk_updatedateid == 100, "no field changed -> SK retained (A8)"
    assert out["A2"].sk_updatedateid == 200, "changed field -> SK bumped"
    assert out["A3"].sk_updatedateid == 200
    assert out["A1"].is_customer is True, "case-insensitive demographic match (J7)"
    assert out["A2"].is_customer is False
    assert out["A1"].marketing_nameplate == "HighValue+Boomer"
    assert out["A3"].marketing_nameplate == "HighValue+Expenses+Spender+Inherited"
    assert out["A2"].marketing_nameplate == "MoneyAlert"
    # Reference rule check: Inherited needs age<25 AND net_worth>1M
    # (prospect.py:210); A1 is 50yo so no Inherited despite net worth.


def test_dim_broker_job_code_filter_and_earliest_date(spark):
    from tpc_di_spark.plans.reference_pipelines import build_dim_broker

    hr = spark.createDataFrame(
        [
            ("E1", "M1", "Ann", "Ames", " ", "314", "B1", "O1", "555-0001"),
            ("E2", "M1", "Bob", "Beal", "Q", "314", "B1", "O2", "555-0002"),
            ("E3", "M2", "Cat", "Cole", "R", "200", "B2", "O3", "555-0003"),  # not a broker
        ],
        "employee_id string, manager_id string, first_name string, last_name string, "
        "middle_initial string, job_code string, branch string, office string, phone string",
    )
    dim_date = spark.createDataFrame(
        [(1, dt.datetime(1999, 1, 4)), (2, dt.datetime(1998, 12, 28))],
        "sk_dateid long, datevalue timestamp",
    )
    out = {r.broker_id: r for r in build_dim_broker(hr, dim_date).collect()}
    assert set(out) == {"E1", "E2"}, "P3: only job code 314 rows are brokers"
    assert out["E1"].middle_initial is None, "blank MI trims to NULL (P11)"
    assert out["E2"].middle_initial == "Q"
    assert out["E1"].effective_date == dt.datetime(1998, 12, 28), (
        "A4: EffectiveDate = global-min DimDate value (DimBroker.py:36-41)"
    )
    assert out["E1"].is_current is True and out["E1"].batch_id == 1
    assert {r.sk_brokerid for r in out.values()} == {1, 2}, "M5 deterministic SKs"


def test_dim_security_temporal_disjunctive_match(spark):
    from tpc_di_spark.plans.reference_pipelines import build_dim_security

    dim_company = spark.createDataFrame(
        [
            # Acme has two SCD2 versions; the SEC pts must hit the right band
            (10, "Acme Corp", 7, dt.datetime(2020, 1, 1), dt.datetime(2022, 1, 1)),
            (11, "Acme Corp", 7, dt.datetime(2022, 1, 1), dt.datetime(9999, 12, 31)),
            (20, "Beta Inc", 8, dt.datetime(2020, 1, 1), dt.datetime(9999, 12, 31)),
        ],
        "sk_companyid long, name string, company_id long, effective_ts timestamp, end_ts timestamp",
    )
    status = spark.createDataFrame([("ACTV", "Active")], "st_id string, st_name string")
    sec = spark.createDataFrame(
        [
            (dt.datetime(2021, 6, 1), "AAA", "COMMON", "Acme A", "NYSE", "1000",
             "19990101", "19990101", "0.50", "Acme Corp", "ACTV"),
            (dt.datetime(2023, 6, 1), "AAB", "COMMON", "Acme B", "NYSE", "1000",
             "19990101", "19990101", "0.75", "Acme Corp", "ACTV"),
            (dt.datetime(2021, 6, 1), "BBB", "COMMON", "Beta B", "NYSE", "500",
             "19990101", "19990101", " ", "0000000008", "ACTV"),
            (dt.datetime(2021, 6, 1), "ZZZ", "COMMON", "Ghost", "NYSE", "1",
             "19990101", "19990101", "0", "No Such Co", "XXXX"),
        ],
        "pts timestamp, symbol string, issue_type string, name string, ex_id string, "
        "sh_out string, first_trade_date string, first_trade_exchg string, dividend string, "
        "co_name_or_cik string, status string",
    )
    out = {r.symbol: r for r in build_dim_security(sec, dim_company, status).collect()}
    assert out["AAA"].sk_companyid == 10, "pts in first SCD2 band -> version 1 SK (J5)"
    assert out["AAB"].sk_companyid == 11, "pts in second band -> version 2 SK"
    assert out["BBB"].sk_companyid == 20, "matched by zero-padded CIK (J6)"
    assert out["ZZZ"].sk_companyid is None and out["ZZZ"].status_name is None
    assert out["BBB"].dividend is None, "blank dividend trims to NULL (P11)"
    assert out["AAA"].status_name == "Active" and out["AAA"].is_current is True


def test_fact_holdings_enrich_join(spark):
    from tpc_di_spark.plans.reference_pipelines import build_fact_holdings

    hh = spark.createDataFrame(
        [("T1", "H1", 0, 100), ("T2", "H2", 100, 50), ("T9", "H3", 0, 10)],
        "hh_t_id string, hh_h_t_id string, hh_before_qty int, hh_after_qty int",
    )
    dim_trade = spark.createDataFrame(
        [("T1", 1, 2, 3, 4, 11, 12, 9.5), ("T2", 5, 6, 7, 8, 13, 14, 2.25)],
        "t_id string, sk_customerid long, sk_accountid long, sk_securityid long, "
        "sk_companyid long, sk_closedateid long, sk_closetimeid long, t_trade_price double",
    )
    out = {r.trade_id: r for r in build_fact_holdings(hh, dim_trade).collect()}
    assert out["T1"].sk_customerid == 1 and out["T1"].current_price == 9.5
    assert out["T1"].current_holding == 100, "CurrentHolding = HH_AFTER_QTY"
    assert out["T2"].sk_dateid == 13 and out["T2"].sk_timeid == 14
    assert out["T9"].sk_customerid is None, (
        "unknown trade -> NULL SKs (set-based left join; the reference "
        "fabricates 1s per-row, FactHoldings.py:42)"
    )


def test_fact_market_history_composition(spark):
    from tpc_di_spark.plans.reference_pipelines import build_fact_market_history

    d = dt.datetime
    daily = spark.createDataFrame(
        [
            # 2024 is a leap year: 2024-12-31 minus 365d = 2024-01-01.
            ("S", d(2024, 1, 1), 10.0, 99.0, 1.0),   # exactly one year earlier: EXCLUDED
            ("S", d(2024, 1, 2), 10.0, 50.0, 2.0),
            ("S", d(2024, 12, 31), 20.0, 30.0, 5.0),
            ("Z", d(2024, 6, 1), 8.0, 8.0, 8.0),     # no financials, no dividend
        ],
        "dm_s_symb string, dm_date timestamp, dm_close double, dm_high double, dm_low double",
    )
    fin = spark.createDataFrame(
        [
            ("S", d(2024, 1, 1), 1.0),   # exactly one year before 2024-12-31: EXCLUDED
            ("S", d(2024, 6, 1), 2.0),
            ("S", d(2024, 12, 31), 3.0),  # same-day quarter start: INCLUDED
        ],
        "dm_s_symb string, qtr_start_date timestamp, eps double",
    )
    sec = spark.createDataFrame(
        [("S", "2.0", True), ("S", "9.9", False), ("Z", "0", True)],
        "symbol string, dividend string, is_current boolean",
    )
    out = {(r.dm_s_symb, str(r.dm_date.date())): r
           for r in build_fact_market_history(daily, fin, sec).collect()}
    r = out[("S", "2024-12-31")]
    assert r.fiftytwoweekhigh == 50.0, "(d-365d, d] band: the 99 at exactly -365d is out"
    assert str(r.fiftytwoweekhighdate.date()) == "2024-01-02"
    assert r.fiftytwoweeklow == 2.0 and str(r.fiftytwoweeklowdate.date()) == "2024-01-02"
    assert r.peratio == 20.0 / 5.0, "eps sum = 2+3 (the -365d quarter is out, same-day in)"
    assert r.alert_no_earnings is False
    assert r["yield"] == 2.0 / 20.0 * 100, "dividend from the IsCurrent row only"
    z = out[("Z", "2024-06-01")]
    assert z.peratio is None and z.alert_no_earnings is True
    assert z["yield"] is None, "zero dividend -> NULL yield (ref `if dividend:`)"
    first = out[("S", "2024-01-01")]
    assert first.fiftytwoweekhigh == 99.0, "window includes the current row"


def test_dimessages_log_and_orchestrator_status(spark, tmp_path):
    from tpc_di_spark.cdc import CdcOrchestrator
    from tpc_di_spark.cdc.orchestrator import bootstrap_table
    from tpc_di_spark.plans.messages import MessagesLog, alert_messages
    from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

    log = MessagesLog(spark, str(tmp_path / "messages"))
    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    orch = CdcOrchestrator(table, buckets_per_group=4, messages_log=log)
    ev = spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "hi", dt.datetime(2024, 1, 1)),
         ("I", 2, "c2", 0, "user", "yo", dt.datetime(2024, 1, 2))],
        "cdc_flag string, cdc_dsn long, conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    orch.apply_batch(ev, 1)
    # Alert rows from a validation pass land in the same queryable table.
    ratings = spark.createDataFrame(
        [(7, "AAA", dt.datetime(2024, 1, 1)), (8, "ZZZ", dt.datetime(2024, 1, 2))],
        "co_id long, sp_rate string, pts timestamp",
    )
    log.append(alert_messages(
        ratings, F.col("sp_rate") == "ZZZ",
        source="DimCompany", message_text="Invalid SPRating",
        data_cols=["co_id", "sp_rate"], ts_col="pts",
    ))
    msgs = log.read().collect()
    status = [m for m in msgs if m.message_type == "Status"]
    alerts = [m for m in msgs if m.message_type == "Alert"]
    assert len(status) == 1 and status[0].batch_id == 1
    assert "events = 2" in status[0].message_data and "snapshot = 1" in status[0].message_data
    assert len(alerts) == 1
    assert alerts[0].message_data == "co_id = 8, sp_rate = ZZZ", (
        "key=value payload shape of Historical/test.py:254"
    )
    # Idempotent re-apply emits no duplicate status row.
    orch.apply_batch(ev, 1)
    assert log.read().filter("message_type = 'Status'").count() == 1


def test_sk_cascade_repoint_multi_fact(spark):
    from tpc_di_spark.plans.reference_pipelines import sk_cascade_repoint

    remap = spark.createDataFrame(
        [(100, 200, "INACTIVE")], "old_sk long, new_sk long, status string"
    )
    dim_account = spark.createDataFrame(
        [(1, 100, "ACTIVE"), (2, 101, "ACTIVE")],
        "account_id long, sk_customerid long, status string",
    )
    fact_watches = spark.createDataFrame(
        [(100, "AAA"), (101, "BBB")], "sk_customerid long, symbol string"
    )
    dim_trade = spark.createDataFrame(
        [("T1", 100), ("T2", 102)], "t_id string, sk_customerid long"
    )
    out = sk_cascade_repoint(
        remap,
        {
            "dim_account": {"df": dim_account, "sk_col": "sk_customerid",
                            "set": {"status": "status"}},
            "fact_watches": {"df": fact_watches, "sk_col": "sk_customerid"},
            "dim_trade": {"df": dim_trade, "sk_col": "sk_customerid"},
        },
    )
    acc = {r.account_id: r for r in out["dim_account"].collect()}
    assert acc[1].sk_customerid == 200 and acc[1].status == "INACTIVE", (
        "matched account re-pointed AND status set (IncrementalCustomer.py:705-709)"
    )
    assert acc[2].sk_customerid == 101 and acc[2].status == "ACTIVE", "unmatched untouched"
    fw = {r.symbol: r.sk_customerid for r in out["fact_watches"].collect()}
    assert fw == {"AAA": 200, "BBB": 101}
    tr = {r.t_id: r.sk_customerid for r in out["dim_trade"].collect()}
    assert tr == {"T1": 200, "T2": 102}
