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
