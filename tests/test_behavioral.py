"""Semantic tests for event-sequence analytics (behavioral.py) beyond
the oracle-equality gate."""

from __future__ import annotations

from datetime import datetime

import pytest

import aws_iceberg_automation_spark.operators.behavioral as beh
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def test_sequence_pattern_counts_known_journey(spark):
    """A hand-built stream must count exactly its non-overlapping
    view(click)*purchase runs: v c c p | v p = 2 matches; a purchase
    reached through an error must not match; an event stream with no
    views matches nothing."""
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, i), 1, et, 0.0, "{}")
        for i, et in enumerate(
            ["view", "click", "click", "purchase", "view", "purchase",
             "view", "error", "purchase"]
        )
    ]
    rows.append((100, datetime(2024, 1, 1), 2, "signup", 0.0, "{}"))
    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        out = {
            r.user_id: r
            for r in SPECS["q177_sequence_pattern"].fn(spark, SF_DIR).collect()
        }
    finally:
        beh.load_table = orig
    assert out[1].n_matches == 2 and out[1].matched
    assert out[1].n_events == 9
    assert out[2].n_matches == 0 and not out[2].matched


def test_disorder_audit_detects_known_disorder(spark):
    """A hand-built arrival stream with one 120s-late event must report
    exactly that disorder; an in-order user must report zero."""
    rows = [
        # user 1: ts arrives 100, 200, 80(late by 120), 300
        (1, datetime(2024, 1, 1, 0, 1, 40), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 3, 20), 1, "click", 0.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 1, 20), 1, "view", 0.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 5, 0), 1, "purchase", 0.0, "{}"),
        # user 2: strictly increasing
        (5, datetime(2024, 1, 1, 0, 0, 1), 2, "view", 0.0, "{}"),
        (6, datetime(2024, 1, 1, 0, 0, 2), 2, "click", 0.0, "{}"),
    ]
    import aws_iceberg_automation_spark.operators.behavioral as beh

    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        out = {
            r.user_id: r
            for r in SPECS["q184_disorder_audit"].fn(spark, SF_DIR).collect()
        }
    finally:
        beh.load_table = orig
    assert out[1].n_out_of_order == 1
    assert out[1].max_lateness_s == 120
    assert out[1].mean_lateness_s == round(120 / 4, 6)
    assert out[2].n_out_of_order == 0 and out[2].max_lateness_s == 0


def test_ols_degenerate_group_yields_null_slope_under_ansi(spark, tmp_path):
    """q198 on a nation with exactly ONE distinct ship day: the OLS
    denominator n·Σx² − (Σx)² is 0. try_divide must yield a NULL slope
    in BOTH ANSI polarities — never a DIVIDE_BY_ZERO crash (the ANSI-ON
    hostile variant is a swept config)."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    day = datetime.datetime(1995, 6, 1)
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 2.0, 100.0, 0.05, 0.02, "N", "O", day),
            (2, 1, 1, 1, 3.0, 200.0, 0.00, 0.01, "N", "O", day),
        ],
        SCHEMAS["lineitem"],
    )
    sup = spark.createDataFrame([(1, "s1", 0, 10.0)], SCHEMAS["supplier"])
    nat = spark.createDataFrame([(0, "ONEDAY", 0)], SCHEMAS["nation"])
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    sup.write.parquet(str(tmp_path / "supplier.parquet"))
    nat.write.parquet(str(tmp_path / "nation.parquet"))
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        rows = SPECS["q198_revenue_trend_ols"].fn(spark, str(tmp_path)).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert len(rows) == 1
    assert rows[0].n_days == 1
    assert rows[0].slope_per_day is None
    assert rows[0].intercept is None


def test_ols_recovers_known_slope(spark, tmp_path):
    """q198 on synthetic exactly-linear daily revenue (one lineitem per
    day, price = 1000 + 7·day_index) must recover slope 7 and intercept
    1000 up to the output rounding — validates the closed-form moment
    algebra against a known ground truth, independent of the DuckDB
    oracle."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    base = datetime.datetime(1992, 1, 1)
    rows = []
    for i in range(50):
        x = 100 + i  # day index relative to 1992-01-01
        rows.append(
            (
                i,
                1,
                1,
                1,
                1.0,
                1000.0 + 7.0 * x,
                0.0,  # zero discount: revenue == extendedprice
                0.0,
                "N",
                "O",
                base + datetime.timedelta(days=x),
            )
        )
    spark.createDataFrame(rows, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    spark.createDataFrame([(1, "s1", 0, 10.0)], SCHEMAS["supplier"]).write.parquet(
        str(tmp_path / "supplier.parquet")
    )
    spark.createDataFrame([(0, "LIN", 0)], SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    row = SPECS["q198_revenue_trend_ols"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_days == 50
    assert abs(row.slope_per_day - 7.0) < 1e-6
    assert abs(row.intercept - 1000.0) < 1e-3


def test_rolling_corr_zero_variance_window_yields_null(spark, tmp_path):
    """q205 on a synthetic series whose quantity is CONSTANT: every
    30-day window has zero qty variance, so every emitted correlation
    must be NULL (variance<=0 guard) — and the query must not crash
    under ANSI (built-in corr() would: DIVIDE_BY_ZERO)."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    base = datetime.datetime(1995, 1, 1)
    rows = [
        (
            i,
            1,
            1,
            1,
            5.0,  # constant quantity
            1000.0 + i,  # varying revenue
            0.0,
            0.0,
            "N",
            "O",
            base + datetime.timedelta(days=i),
        )
        for i in range(40)
    ]
    spark.createDataFrame(rows, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    spark.createDataFrame([(1, "s1", 0, 10.0)], SCHEMAS["supplier"]).write.parquet(
        str(tmp_path / "supplier.parquet")
    )
    spark.createDataFrame([(0, "CONST", 0)], SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        rows_out = SPECS["q205_rolling_corr"].fn(spark, str(tmp_path)).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert len(rows_out) == 11  # days 30..40 have full windows
    assert all(r.corr_30d is None for r in rows_out)


def test_rfm_segments_perfectly_correlated_customers(spark, tmp_path):
    """q208 on 5 synthetic customers whose recency, frequency and
    monetary value all increase together: customer i must land in
    quintile i on ALL three axes, so the segment grid is exactly the
    diagonal (i,i,i) with one customer each and known cents."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    rows = []
    key = 0
    for i in range(1, 6):
        for _ in range(i):  # frequency = i
            key += 1
            rows.append(
                (
                    key,
                    i,  # custkey
                    "O",
                    100.0 * i,  # totalprice
                    datetime.datetime(1995, 1, i),  # recency grows with i
                    "1-URGENT",
                )
            )
    spark.createDataFrame(rows, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        (r.r_tile, r.f_tile, r.m_tile): r
        for r in SPECS["q208_rfm_segments"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(i, i, i) for i in range(1, 6)}
    for i in range(1, 6):
        seg = out[(i, i, i)]
        assert seg.n_customers == 1
        # i orders of 100*i dollars = 10000*i*i cents
        assert seg.monetary_cents == str(10000 * i * i)
        assert abs(seg.avg_frequency - i) < 1e-9


def test_pareto_abc_known_cut_points(spark, tmp_path):
    """q209 on 5 parts with revenues 80/10/5/3/2: the 80% boundary part
    is A (5·cum ≤ 4·tot holds WITH equality), the 95% boundary part is
    B, the tail is C — exercising both integer cross-multiplication
    boundaries exactly."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    import datetime

    revs = {1: 80.0, 2: 10.0, 3: 5.0, 4: 3.0, 5: 2.0}
    rows = [
        (
            pk,
            pk,
            1,
            1,
            1.0,
            rev,  # extendedprice; discount 0 -> revenue = rev
            0.0,
            0.0,
            "N",
            "O",
            datetime.datetime(1995, 1, 1),
        )
        for pk, rev in revs.items()
    ]
    spark.createDataFrame(rows, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r.abc_class: r
        for r in SPECS["q209_pareto_abc"].fn(spark, str(tmp_path)).collect()
    }
    assert out["A"].n_parts == 1 and out["A"].revenue_micros == "80000000"
    assert out["B"].n_parts == 2 and out["B"].revenue_micros == "15000000"
    assert out["C"].n_parts == 2 and out["C"].revenue_micros == "5000000"
    assert abs(out["A"].revenue_share - 0.8) < 1e-9
    assert abs(out["B"].revenue_share - 0.15) < 1e-9
    assert abs(out["C"].revenue_share - 0.05) < 1e-9


def test_segment_gini_equal_vs_concentrated(spark, tmp_path):
    """q210 on two hand-built segments: EQ has four equal spenders
    (Gini exactly 0), CONC has spends 1/1/1/97 (Gini 0.72 by the rank
    formula) — checked to 6dp."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    custs = [
        (i, f"c{i}", 0, 0.0, "EQ" if i <= 4 else "CONC") for i in range(1, 9)
    ]
    spends = {1: 25.0, 2: 25.0, 3: 25.0, 4: 25.0, 5: 1.0, 6: 1.0, 7: 1.0, 8: 97.0}
    orders = [
        (k, k, "O", spends[k], datetime.datetime(1995, 1, 1), "1-URGENT")
        for k in spends
    ]
    spark.createDataFrame(custs, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        r.seg: r for r in SPECS["q210_segment_gini"].fn(spark, str(tmp_path)).collect()
    }
    assert out["EQ"].gini == 0.0 and out["EQ"].n_customers == 4
    # 2*(1*100+2*100+3*100+4*9700)/(4*10000) - 5/4 = 0.72
    assert abs(out["CONC"].gini - 0.72) < 1e-9
    assert out["CONC"].total_cents == "10000"


def test_weekday_seasonality_known_week(spark, tmp_path):
    """q211 on one order per weekday of 1995-01-01..07 (the 1st was a
    Sunday): dow must map Sunday→0, and a flat week must index 1.0."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    orders = [
        (d, 1, "O", 100.0, datetime.datetime(1995, 1, d), "1-URGENT")
        for d in range(1, 8)
    ]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r.dow: r for r in SPECS["q211_weekday_seasonality"].fn(
        spark, str(tmp_path)).collect()}
    assert set(out) == set(range(7))
    for r in out.values():
        assert r.n_orders == 1
        assert abs(r.seasonality_index - 1.0) < 1e-9


def test_burstiness_periodic_user_is_minus_one(spark):
    """q212: a metronome user (constant gap) has burstiness exactly −1;
    a user with wildly varying gaps is positive."""
    rows = [
        (i, datetime(2024, 1, 1, 0, i, 0), 1, "view", 0.0, "{}")
        for i in range(10)  # user 1: 60s metronome
    ]
    # user 2: gaps 1s,1s,1s,3600s
    offs = [0, 1, 2, 3, 3603]
    rows += [
        (100 + i, datetime(2024, 1, 1, 1, 0, 0) + __import__("datetime").timedelta(seconds=s), 2, "view", 0.0, "{}")
        for i, s in enumerate(offs)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        out = {
            r.user_id: r
            for r in SPECS["q212_interarrival_burstiness"].fn(spark, SF_DIR).collect()
        }
    finally:
        beh.load_table = orig
    assert out[1].burstiness == -1.0
    assert out[1].n_gaps == 9 and out[1].mean_gap_s == 60.0
    # gaps 1,1,1,3600: mu=900.75, sigma=1799.5 -> B = 0.33284 exactly
    assert abs(out[2].burstiness - 0.33284) < 1e-9


def test_ship_delay_survival_known_curve(spark, tmp_path):
    """q213 on 4 lineitems shipped 0/3/10/20 days after order: weeks
    0,0,1,2 → survival after week 0 = 0.5, after week 1 = 0.25,
    after week 2 = 0."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    base = datetime.datetime(1995, 6, 1)
    lis = [
        (1, 1, 1, i, 1.0, 100.0, 0.0, 0.0, "N", "O",
         base + datetime.timedelta(days=d))
        for i, d in enumerate([0, 3, 10, 20], 1)
    ]
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    spark.createDataFrame(
        [(1, 1, "O", 100.0, base, "1-URGENT")], SCHEMAS["orders"]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.delay_weeks: r
        for r in SPECS["q213_ship_delay_survival"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0].n_items == 2 and abs(out[0].survival - 0.5) < 1e-9
    assert out[1].n_items == 1 and abs(out[1].survival - 0.25) < 1e-9
    assert out[2].n_items == 1 and out[2].survival == 0.0


def test_order_backlog_known_timeline(spark, tmp_path):
    """q214 on three orders: A(Jan→Feb), B(Jan→Apr), C(Mar→Mar):
    backlog EOM Jan=2, Feb=1, Mar=1, Apr=0. An order's close month is
    its LAST shipment."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    def d(m, day=15):
        return datetime.datetime(1995, m, day)

    orders = [
        (1, 1, "O", 10.0, d(1), "1-URGENT"),
        (2, 1, "O", 10.0, d(1), "1-URGENT"),
        (3, 1, "O", 10.0, d(3), "1-URGENT"),
    ]
    lis = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1, 20)),
        (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2)),   # A closes Feb
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(4)),   # B closes Apr
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(3, 20)),  # C closes Mar
    ]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r.month.month: r.backlog_eom
        for r in SPECS["q214_order_backlog"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: 2, 2: 1, 3: 1, 4: 0}


def test_new_vs_returning_known_timeline(spark, tmp_path):
    """q218 on three hand-built customers (c1: Jan+Feb, c2: Jan only,
    c3: Feb+Mar): new/returning/cumulative are known exactly."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    orders = [
        (1, 1, "O", 10.0, datetime.datetime(1995, 1, 5), "1-URGENT"),
        (2, 1, "O", 10.0, datetime.datetime(1995, 2, 5), "1-URGENT"),
        (3, 2, "O", 10.0, datetime.datetime(1995, 1, 20), "1-URGENT"),
        (4, 3, "O", 10.0, datetime.datetime(1995, 2, 20), "1-URGENT"),
        (5, 3, "O", 10.0, datetime.datetime(1995, 3, 1), "1-URGENT"),
    ]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        r.month.month: (r.n_active, r.n_new, r.n_returning, r.cum_known_customers)
        for r in SPECS["q218_new_vs_returning"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: (2, 2, 0, 2), 2: (2, 1, 1, 3), 3: (1, 0, 1, 3)}


def test_conversion_latency_guards_and_quartiles(spark):
    """q219: a purchase BEFORE any view is not a conversion; latencies
    100s and 200s give p50 = 150 exactly; viewers without purchases
    stay in the denominator."""
    rows = [
        # u1: view then purchase +100s
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 1, 40), 1, "purchase", 0.0, "{}"),
        # u2: view only
        (3, datetime(2024, 1, 1), 2, "view", 0.0, "{}"),
        # u3: purchase BEFORE its only view
        (4, datetime(2024, 1, 1, 0, 0, 0), 3, "purchase", 0.0, "{}"),
        (5, datetime(2024, 1, 1, 1, 0, 0), 3, "view", 0.0, "{}"),
        # u4: view then purchase +200s
        (6, datetime(2024, 1, 2, 0, 0, 0), 4, "view", 0.0, "{}"),
        (7, datetime(2024, 1, 2, 0, 3, 20), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        r = SPECS["q219_conversion_latency"].fn(spark, SF_DIR).collect()[0]
    finally:
        beh.load_table = orig
    assert r.n_viewers == 4 and r.n_converted == 2
    assert abs(r.conversion_rate - 0.5) < 1e-12
    assert r.p25_latency_s == 125.0
    assert r.p50_latency_s == 150.0
    assert r.p90_latency_s == 190.0


def test_discount_elasticity_exact_powerlaw(spark, tmp_path):
    """q220 on a synthetic brand whose per-item quantity is exactly
    (1-d)^-2: the OLS slope through (ln(1-d), ln qty) is -2.0 to 4dp."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    parts = [(1, "widget", "B1", "T", 1, 1.0)]
    lis = []
    k = 0
    for d in (0.0, 0.05, 0.10):
        qty = round((1 - d) ** -2, 2)
        for i in range(5):
            k += 1
            lis.append(
                (k, 1, 1, 1, qty, 1.0, d, 0.0, "N", "O",
                 datetime.datetime(1995, 1, 1))
            )
    spark.createDataFrame(parts, SCHEMAS["part"]).write.parquet(
        str(tmp_path / "part.parquet")
    )
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = SPECS["q220_discount_elasticity"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0].n_levels == 3
    # qty stored at 2dp bends the power law: 1.108->1.11 is ~2e-3 in
    # log space over an x-range of only 0.105, i.e. up to ~0.04 slope
    assert abs(rows[0].elasticity - (-2.0)) < 0.05


def test_cohort_ltv_known_matrix(spark, tmp_path):
    """q221 on two cohorts (Jan: c1+c2, Feb: c3), c1 returning in Feb:
    the cumulative revenue and avg LTV per cohort age are exact."""
    import datetime

    from aws_iceberg_automation_spark.io import SCHEMAS

    orders = [
        (1, 1, "O", 100.0, datetime.datetime(1995, 1, 5), "1-URGENT"),
        (2, 2, "O", 200.0, datetime.datetime(1995, 1, 9), "1-URGENT"),
        (3, 1, "O", 50.0, datetime.datetime(1995, 2, 5), "1-URGENT"),
        (4, 3, "O", 10.0, datetime.datetime(1995, 2, 20), "1-URGENT"),
    ]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        (r.cohort.month, r.age_months): r
        for r in SPECS["q221_cohort_ltv"].fn(spark, str(tmp_path)).collect()
    }
    jan0, jan1, feb0 = out[(1, 0)], out[(1, 1)], out[(2, 0)]
    assert jan0.n_customers == 2 and jan0.cohort_size == 2
    assert jan0.cum_revenue_cents == "30000" and jan0.avg_ltv_cents == 15000.0
    assert jan1.n_customers == 1 and jan1.cum_revenue_cents == "35000"
    assert jan1.avg_ltv_cents == 17500.0
    assert feb0.cohort_size == 1 and feb0.cum_revenue_cents == "1000"


def test_conversion_latency_zero_viewers_yields_null_rate(spark):
    """q219 on a stream with NO view events: n_viewers = 0 and the
    conversion rate must be NULL under ANSI (try_divide), never a
    crash or a NaN-vs-NULL engine divergence."""
    rows = [
        (1, datetime(2024, 1, 1), 1, "purchase", 0.0, "{}"),
        (2, datetime(2024, 1, 2), 2, "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        spark.conf.set("spark.sql.ansi.enabled", "true")
        r = SPECS["q219_conversion_latency"].fn(spark, SF_DIR).collect()[0]
    finally:
        beh.load_table = orig
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert r.n_viewers == 0 and r.n_converted == 0
    assert r.conversion_rate is None and r.p50_latency_s is None


def test_pareto_skyline_known_frontier(spark, tmp_path):
    """q224 on one brand+type group with four size levels: the level
    whose cheapest price is beaten by a cheaper-or-equal larger size
    is dominated; the frontier ranks by price with sizes strictly
    increasing along it."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    parts = [
        (1, "a", "B1", "T", 5, 90.0),
        (2, "b", "B1", "T", 10, 100.0),
        (3, "c", "B1", "T", 20, 150.0),
        (4, "d", "B1", "T", 20, 200.0),   # same level as #3, pricier
        (5, "e", "B1", "T", 15, 160.0),   # dominated by (20, 150)
    ]
    spark.createDataFrame(parts, SCHEMAS["part"]).write.parquet(
        str(tmp_path / "part.parquet")
    )
    rows = sorted(
        SPECS["q224_pareto_skyline"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.frontier_rank,
    )
    assert [(r.p_size, r.best_price, r.frontier_rank) for r in rows] == [
        (5, 90.0, 1),
        (10, 100.0, 2),
        (20, 150.0, 3),
    ]
    assert rows[2].n_parts == 2  # both size-20 parts fold into the level


def test_price_index_doubled_unit_price(spark, tmp_path):
    """q226: one part whose unit price doubles from the base year to
    1996-01 yields a Laspeyres index of exactly 2.0 (base-basket
    quantities fixed at the 1995 weights)."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    lis = [
        # base year: qty 10 at unit price 1.0
        (1, 1, 1, 1, 10.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 3, 1)),
        # current month: qty 4 at unit price 2.0 (current qty must NOT
        # affect the index -- Laspeyres weights are the base basket)
        (2, 1, 1, 1, 4.0, 8.0, 0.0, 0.0, "N", "O", datetime(1996, 1, 10)),
    ]
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = SPECS["q226_price_index"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].month.isoformat() == "1996-01-01"
    assert rows[0].n_parts == 1 and rows[0].laspeyres_index == 2.0


def test_revenue_acf_alternating_series(spark, tmp_path):
    """q227 on a perfectly alternating 10/20 daily series: every lag-1
    pair is one of two distinct points (corr exactly -1), every lag-2
    pair is on the identity line (corr exactly +1)."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    lis = [
        (i, 1, 1, 1, 1.0, 10.0 if i % 2 == 0 else 20.0, 0.0, 0.0,
         "N", "O", datetime(1995, 6, 1 + i))
        for i in range(8)
    ]
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r.lag: r for r in SPECS["q227_revenue_acf"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1].n_pairs == 7 and out[1].acf == -1.0
    assert out[2].n_pairs == 6 and out[2].acf == 1.0
    # lags longer than the series yield no pair rows at all
    assert 9 not in out or out[9].n_pairs < 1


def test_theil_decomposition_known_split(spark, tmp_path):
    """q229 with two equal-revenue customers per nation (100s in A,
    300s in B): within-Theil is exactly 0 for both, shares are
    0.25/0.75, and the between terms carry all the inequality."""
    import math

    from aws_iceberg_automation_spark.io import SCHEMAS

    orders = [
        (1, 1, "O", 100.0, datetime(1995, 1, 1), "1-URGENT"),
        (2, 2, "O", 100.0, datetime(1995, 1, 2), "1-URGENT"),
        (3, 3, "O", 300.0, datetime(1995, 1, 3), "1-URGENT"),
        (4, 4, "O", 300.0, datetime(1995, 1, 4), "1-URGENT"),
    ]
    customers = [
        (1, "c1", 0, 0.0, "BUILDING"),
        (2, "c2", 0, 0.0, "BUILDING"),
        (3, "c3", 1, 0.0, "BUILDING"),
        (4, "c4", 1, 0.0, "BUILDING"),
    ]
    nations = [(0, "ALPHA", 0), (1, "BETA", 0)]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(customers, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(nations, SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    out = {
        r.nation: r
        for r in SPECS["q229_theil_decomposition"].fn(spark, str(tmp_path)).collect()
    }
    a, b = out["ALPHA"], out["BETA"]
    assert a.theil_within == 0.0 and b.theil_within == 0.0
    assert a.rev_share == 0.25 and b.rev_share == 0.75
    assert a.mean_rev == 100.0 and b.mean_rev == 300.0
    assert a.between_term == round(0.25 * math.log(0.5), 6)
    assert b.between_term == round(0.75 * math.log(1.5), 6)
    # the decomposition sums to the global Theil (within terms are 0)
    total = a.between_term + b.between_term
    assert abs(total - 0.130812) < 1e-6


def test_theil_sen_median_of_pairwise_slopes(spark, tmp_path):
    """q231 with one brand over three months (rev 10, 20, 60): the
    pairwise slopes are {10, 25, 40} and Theil-Sen picks the median 25
    — while an outlier-free OLS would be dragged to ~25+ by the spike."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    parts = [(1, "w", "B1", "T", 1, 1.0)]
    lis = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 15)),
        (2, 1, 1, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", datetime(1995, 2, 15)),
        (3, 1, 1, 1, 1.0, 60.0, 0.0, 0.0, "N", "O", datetime(1995, 3, 15)),
    ]
    spark.createDataFrame(parts, SCHEMAS["part"]).write.parquet(
        str(tmp_path / "part.parquet")
    )
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = SPECS["q231_theil_sen_trend"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_months == 3 and r.n_pairs == 3 and r.sen_slope == 25.0


def test_hhi_known_shares(spark, tmp_path):
    """q232 with supplier revenue shares 50/30/20 in one nation: HHI =
    2500+900+400 = 3800, CR4 = 1.0 (only three suppliers)."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    suppliers = [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)]
    nations = [(0, "ALPHA", 0)]
    lis = [
        (1, 1, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)),
        (2, 1, 2, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 2)),
        (3, 1, 3, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 3)),
    ]
    spark.createDataFrame(suppliers, SCHEMAS["supplier"]).write.parquet(
        str(tmp_path / "supplier.parquet")
    )
    spark.createDataFrame(nations, SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    spark.createDataFrame(lis, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = SPECS["q232_hhi_concentration"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.nation == "ALPHA" and r.n_suppliers == 3
    assert r.revenue_cents == "10000" and r.hhi == 3800.0 and r.cr4 == 1.0


def test_activity_islands_known_streaks(spark):
    """q234 with one user active Jan 1-3, Jan 5, Jan 10-11: three
    islands, six active days, longest streak 3. Duplicate events on a
    day must not double-count it."""
    rows = [
        (1, datetime(2024, 1, 1, 9), 7, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 17), 7, "click", 0.0, "{}"),  # same day
        (3, datetime(2024, 1, 2, 9), 7, "view", 0.0, "{}"),
        (4, datetime(2024, 1, 3, 9), 7, "view", 0.0, "{}"),
        (5, datetime(2024, 1, 5, 9), 7, "view", 0.0, "{}"),
        (6, datetime(2024, 1, 10, 9), 7, "view", 0.0, "{}"),
        (7, datetime(2024, 1, 11, 9), 7, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        out = SPECS["q234_activity_islands"].fn(spark, SF_DIR).collect()
    finally:
        beh.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert r.n_active_days == 6 and r.n_islands == 3 and r.longest_streak == 3


def test_cusum_level_shift_found_at_boundary(spark, tmp_path):
    """q235 on a clean level shift (10 days at 100, then 10 at 200):
    σ = 50, the centered cumulative sum bottoms out at −500 exactly on
    the last pre-shift day, so max_dev = 10.0 at day 10."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    orders = [
        (i, 1, "O", 100.0 if i <= 10 else 200.0,
         datetime(1995, 1, i), "1-URGENT")
        for i in range(1, 21)
    ]
    customers = [(1, "c1", 0, 0.0, "BUILDING")]
    nations = [(0, "ALPHA", 0)]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(customers, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(nations, SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    rows = SPECS["q235_cusum_changepoint"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.nation == "ALPHA" and r.n_days == 20
    assert r.change_day.isoformat() == "1995-01-10"
    assert r.max_dev == 10.0


def test_cuped_perfect_covariate_equalizes_arms(spark, tmp_path):
    """q238 where post-period revenue equals pre-period revenue for
    every customer: θ = 1, ρ² = 1 (100% variance reduction), and BOTH
    arms' CUPED-adjusted means collapse to the pooled pre-period mean
    — the textbook sanity check that the adjustment removes all
    covariate-explained spread."""
    import hashlib

    from aws_iceberg_automation_spark.io import SCHEMAS

    # pick two custkeys per arm (md5 first hex digit < '8' = treatment)
    arms = {True: [], False: []}
    k = 1
    while len(arms[True]) < 2 or len(arms[False]) < 2:
        arm = hashlib.md5(str(k).encode()).hexdigest()[0] < "8"
        if len(arms[arm]) < 2:
            arms[arm].append(k)
        k += 1
    keys = arms[True] + arms[False]
    prices = {keys[0]: 100.0, keys[1]: 300.0, keys[2]: 150.0, keys[3]: 250.0}
    customers = [(ck, f"c{ck}", 0, 0.0, "BUILDING") for ck in keys]
    orders = []
    oid = 1
    for ck in keys:
        orders.append((oid, ck, "O", prices[ck], datetime(1995, 6, 1), "1-URGENT"))
        oid += 1
        orders.append((oid, ck, "O", prices[ck], datetime(1997, 6, 1), "1-URGENT"))
        oid += 1
    spark.createDataFrame(customers, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        r.arm: r for r in SPECS["q238_cuped_lift"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"treatment", "control"}
    pre_all = sum(prices.values()) / 4
    for r in out.values():
        assert r.n_customers == 2
        assert r.theta == 1.0 and r.variance_reduction == 1.0
        assert r.cuped_mean_revenue == round(pre_all, 4)
    assert out["treatment"].mean_revenue == round(
        (prices[keys[0]] + prices[keys[1]]) / 2, 4
    )


def test_seasonal_anomaly_flags_only_the_spike(spark, tmp_path):
    """q239 with six consecutive Mondays at 100 except one at 200: only
    the spike crosses |z| ≥ 2 (z = 5/√5 ≈ 2.2361); the five normal
    Mondays sit at z ≈ −0.45."""
    import math
    from datetime import timedelta

    from aws_iceberg_automation_spark.io import SCHEMAS

    # 1995-01-02 is a Monday
    prices = [100.0, 100.0, 100.0, 100.0, 100.0, 200.0]
    orders = [
        (i + 1, 1, "O", p, datetime(1995, 1, 2) + timedelta(days=7 * i), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = SPECS["q239_seasonal_anomaly"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.day.isoformat() == "1995-02-06" and r.revenue_cents == "20000"
    cents = [p * 100 for p in prices]
    mean = sum(cents) / 6
    sd = math.sqrt(sum((c - mean) ** 2 for c in cents) / 6)
    assert r.z == round((20000 - mean) / sd, 4)


def test_growth_accounting_known_lifecycle(spark, tmp_path):
    """q251 with user1 active weeks 0-2, user2 weeks {0,2}, user3 week
    {1}: week 0 = 2 new; week 1 = 1 new + 1 retained + user2 churned;
    week 2 = 1 retained + 1 resurrected + user3 churned; quick ratios
    1.0/1.0, NULL at week 0."""
    from datetime import timedelta

    from aws_iceberg_automation_spark.io import SCHEMAS

    t0 = datetime(2024, 1, 1, 12, 0)
    active = {1: [0, 1, 2], 2: [0, 2], 3: [1]}
    events = [
        (100 * u + k, t0 + timedelta(days=7 * k), u, "view", 1.0, "{}")
        for u, wks in active.items()
        for k in wks
    ]
    spark.createDataFrame(events, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r.wk: r
        for r in SPECS["q251_growth_accounting"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1, 2}
    w0, w1, w2 = out[0], out[1], out[2]
    assert (w0.n_new, w0.n_retained, w0.n_resurrected, w0.n_churned) == (2, 0, 0, 0)
    assert w0.quick_ratio is None
    assert (w1.n_new, w1.n_retained, w1.n_resurrected, w1.n_churned) == (1, 1, 0, 1)
    assert w1.quick_ratio == 1.0
    assert (w2.n_new, w2.n_retained, w2.n_resurrected, w2.n_churned) == (0, 1, 1, 1)
    assert w2.quick_ratio == 1.0


def test_experiment_power_matches_closed_form(spark, tmp_path):
    """q254 on ten hash-split customers with one order each: the MDE
    must equal the closed form recomputed from scratch in Python over
    the same md5 arm assignment and cent-scaled revenues."""
    import hashlib
    import math

    from aws_iceberg_automation_spark.io import SCHEMAS

    custs = [(k, f"c{k}", 0, 0.0, "SEG") for k in range(1, 11)]
    orders = [
        (k, k, "O", 100.0 + 10 * k, datetime(1995, 1, 1), "1-URGENT")
        for k in range(1, 11)
    ]
    spark.createDataFrame(custs, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    ys = {
        k: (100.0 + 10 * k) * 100
        for k in range(1, 11)
    }
    treat = {
        k: hashlib.md5(str(k).encode()).hexdigest()[0] < "8" for k in ys
    }
    yc = [ys[k] for k in ys if not treat[k]]
    yt = [ys[k] for k in ys if treat[k]]
    n_c, n_t = len(yc), len(yt)
    ss = sum((v - sum(g) / len(g)) ** 2 for g in (yc, yt) for v in g)
    sd = math.sqrt(ss / (n_c + n_t - 2))
    se = sd * math.sqrt(1 / n_c + 1 / n_t)
    mean_c = sum(yc) / n_c
    row = SPECS["q254_experiment_power"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_control, row.n_treatment) == (n_c, n_t)
    assert row.control_mean == pytest.approx(mean_c / 100, abs=1e-3)
    assert row.sd_pooled == pytest.approx(sd / 100, abs=1e-3)
    assert row.mde_abs_80 == pytest.approx(2.801585 * se / 100, abs=1e-3)
    assert row.mde_rel_80 == pytest.approx(2.801585 * se / mean_c, abs=1e-5)
    assert row.mde_rel_90 == pytest.approx(3.241516 * se / mean_c, abs=1e-5)


def test_seasonal_decomposition_constant_series_null_shares(spark, tmp_path):
    """q255 on a perfectly constant daily series: trend equals the
    series, every weekday effect is 0, total variance is 0 → all
    variance shares NULL (guard, not an ANSI crash)."""
    from datetime import timedelta

    from aws_iceberg_automation_spark.io import SCHEMAS

    base = datetime(1995, 1, 1)
    orders = [
        (i, 1, "O", 1.0, base + timedelta(days=i), "1-URGENT")
        for i in range(14)
    ]
    custs = [(1, "c1", 0, 0.0, "SEG")]
    nats = [(0, "FLATLAND", 0)]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(custs, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(nats, SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    rows = SPECS["q255_seasonal_decomposition"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.nation == "FLATLAND" and r.n_days == 14
        assert r.weekday_effect == 0.0
        assert r.trend_share is None
        assert r.weekly_share is None
        assert r.residual_share is None


def test_srm_check_balanced_and_imbalanced(spark, tmp_path):
    """q257 must flag a deliberately imbalanced assignment: customers
    chosen so md5 puts 1 in treatment and 9 in control → χ² = 6.4 >
    3.8415 → SRM flagged; shares and counts exact."""
    import hashlib

    from aws_iceberg_automation_spark.io import SCHEMAS

    # custkeys 1-5,7,8,10 are control ('c','c','e','a','e','8','c','d'),
    # 6 and 9 are treatment ('1','4'); drop 9 → 1 treat vs 9 control
    keys = [1, 2, 3, 4, 5, 6, 7, 8, 10, 11]
    treat = [
        k for k in keys
        if hashlib.md5(str(k).encode()).hexdigest()[0] < "8"
    ]
    custs = [(k, f"c{k}", 0, 0.0, "SEG") for k in keys]
    spark.createDataFrame(custs, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    row = SPECS["q257_ab_srm_check"].fn(spark, str(tmp_path)).collect()[0]
    n_t, n_c = len(treat), len(keys) - len(treat)
    half = len(keys) / 2
    chi2 = round((n_t - half) ** 2 / half + (n_c - half) ** 2 / half, 4)
    assert (row.n_control, row.n_treatment) == (n_c, n_t)
    assert row.chi2_stat == chi2
    assert row.srm_flag == (chi2 > 3.8415)


def test_experiment_power_degenerate_two_customers(spark, tmp_path):
    """q254 with exactly two customers (pooled df = 0): sd and every
    MDE column must be NULL — guarded identically on both engines, not
    Spark NaN vs DuckDB NULL (code-review r4 finding)."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    custs = [(6, "c6", 0, 0.0, "SEG"), (1, "c1", 0, 0.0, "SEG")]
    orders = [
        (1, 6, "O", 50.0, datetime(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 70.0, datetime(1995, 1, 2), "1-URGENT"),
    ]
    spark.createDataFrame(custs, SCHEMAS["customer"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    row = SPECS["q254_experiment_power"].fn(spark, str(tmp_path)).collect()[0]
    # custkey 6 -> treatment ('1' < '8'), custkey 1 -> control ('c')
    assert (row.n_control, row.n_treatment) == (1, 1)
    assert row.sd_pooled is None
    assert row.mde_abs_80 is None
    assert row.mde_rel_80 is None and row.mde_rel_90 is None
    # the ORACLE's guard branches must agree on the same degenerate
    # fixture (they are dead code at the sweep's sf — code-review r4):
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    od = con.execute(SPECS["q254_experiment_power"].oracle).fetchall()
    assert len(od) == 1
    n_c, n_t, _mean, sd, mde_a, mde_r80, mde_r90 = od[0]
    assert (n_c, n_t) == (1, 1)
    assert sd is None and mde_a is None
    assert mde_r80 is None and mde_r90 is None


def test_forecast_backtest_seasonal_beats_naive_on_weekly_pattern(spark, tmp_path):
    """q258 on an exactly-weekly series (rev = 100 + 10·(d mod 7) over
    14 days): seasonal-naive is perfect (MAE = MAPE = 0), naive pays
    the week-boundary reset; expected values recomputed closed-form."""
    from datetime import timedelta

    from aws_iceberg_automation_spark.io import SCHEMAS

    base = datetime(1995, 1, 2)
    orders = [
        (d, 1, "O", 100.0 + 10 * (d % 7), base + timedelta(days=d), "1-URGENT")
        for d in range(14)
    ]
    spark.createDataFrame(orders, SCHEMAS["orders"]).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        [(1, "c1", 0, 0.0, "SEG")], SCHEMAS["customer"]
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame([(0, "WEEKLY", 0)], SCHEMAS["nation"]).write.parquet(
        str(tmp_path / "nation.parquet")
    )
    rows = SPECS["q258_forecast_backtest"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    rev = {d: (100 + 10 * (d % 7)) * 100 for d in range(14)}
    evald = list(range(7, 14))
    ae_n = [abs(rev[d] - rev[d - 1]) for d in evald]
    assert r.n_eval_days == 7
    assert r.mae_naive == round(sum(ae_n) / 7 / 100, 2)
    assert r.mae_seasonal == 0.0
    assert r.mape_naive == round(
        sum(a / rev[d] for a, d in zip(ae_n, evald)) / 7, 6
    )
    assert r.mape_seasonal == 0.0
    assert bool(r.seasonal_wins)


def test_bulk_discount_curve_known_bands(spark, tmp_path):
    """q260 with one lineitem per band: exact band assignment, unit
    prices, and revenue shares."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    day = datetime(1995, 6, 1)
    li = [
        (1, 1, 1, 1, 5.0, 100.0, 0.10, 0.0, "N", "O", day),
        (2, 2, 1, 1, 15.0, 200.0, 0.05, 0.0, "N", "O", day),
    ]
    spark.createDataFrame(li, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r.qty_band: r
        for r in SPECS["q260_bulk_discount_curve"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"01-10", "11-20"}
    lo, hi = out["01-10"], out["11-20"]
    assert (lo.n_items, lo.avg_discount, lo.avg_unit_price) == (1, 0.1, 20.0)
    assert lo.revenue_share == round(100 / 300, 6)
    assert (hi.n_items, hi.avg_discount) == (1, 0.05)
    assert hi.avg_unit_price == round(200 / 15, 4)
    assert hi.revenue_share == round(200 / 300, 6)


def test_order_size_dispersion_known_counts(spark, tmp_path):
    """q261 with orders of 1, 1 and 4 lines: mean 2, population
    variance 2 → dispersion index exactly 1.0."""
    from aws_iceberg_automation_spark.io import SCHEMAS

    day = datetime(1995, 6, 1)
    li = []
    k = 0
    for okey, n in ((1, 1), (2, 1), (3, 4)):
        for _ in range(n):
            k += 1
            li.append((okey, 1, 1, k, 1.0, 10.0, 0.0, 0.0, "N", "O", day))
    spark.createDataFrame(li, SCHEMAS["lineitem"]).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r.n_lines: r
        for r in SPECS["q261_order_size_dispersion"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 4}
    assert out[1].n_orders_at == 2 and out[4].n_orders_at == 1
    assert out[1].share == round(2 / 3, 6)
    assert out[1].mean_lines == 2.0
    assert out[1].dispersion_index == 1.0
