"""Independent references for the round-8 shared-template statistics
queries. A _sql_twin query runs ONE SQL string on both engines, so the
oracle differential proves engine parity but not SEMANTICS (the q298
lesson: both sides can share a bug). These tests recompute each
statistic from first principles in NumPy/pure Python on the fixture
and hold the query to it."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.io import load_table
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    ).collect()


def test_ols_by_group_matches_numpy_lstsq(spark):
    rows = _events(spark)
    by_type: dict[str, tuple[list, list]] = {}
    for r in rows:
        # floor(v+0.5), not np.round: Spark/DuckDB round() is
        # half-away-from-zero while NumPy is half-to-even
        x, y = r.ts.day, float(np.floor(r.value + 0.5))
        by_type.setdefault(r.event_type, ([], []))[0].append(x)
        by_type[r.event_type][1].append(y)
    got = {
        r.event_type: (r.slope, r.intercept, r.r2)
        for r in SPECS["q334_ols_by_group"].fn(spark, SF_DIR).collect()
    }
    for t, (xs, ys) in by_type.items():
        slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
        corr = np.corrcoef(xs, ys)[0, 1]
        gs, gi, gr2 = got[t]
        assert abs(gs - slope) < 1e-4, (t, gs, slope)
        assert abs(gi - intercept) < 1e-3, (t, gi, intercept)
        assert abs(gr2 - corr**2) < 1e-4, (t, gr2, corr**2)


def test_welch_ttest_matches_first_principles(spark):
    rows = _events(spark)
    import hashlib

    def treat(uid):
        return hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"

    # floor(v+0.5): match engine round-half-away (python round is
    # half-to-even)
    t = np.array(
        [np.floor(r.value * 100 + 0.5) / 100 for r in rows
         if treat(r.user_id)]
    )
    c = np.array(
        [np.floor(r.value * 100 + 0.5) / 100 for r in rows
         if not treat(r.user_id)]
    )
    vt, vc = t.var(ddof=1), c.var(ddof=1)
    se2 = vt / len(t) + vc / len(c)
    t_stat = (t.mean() - c.mean()) / np.sqrt(se2)
    df = se2**2 / (
        (vt / len(t)) ** 2 / (len(t) - 1) + (vc / len(c)) ** 2 / (len(c) - 1)
    )
    row = SPECS["q335_welch_ttest"].fn(spark, SF_DIR).collect()[0]
    assert row.n_treat == len(t) and row.n_control == len(c)
    assert abs(row.mean_treat - t.mean()) < 1e-4
    assert abs(row.t_stat - t_stat) < 1e-3, (row.t_stat, t_stat)
    assert abs(row.df_welch - df) < 0.5, (row.df_welch, df)


def test_gini_matches_direct_formula(spark):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    by_grp: dict[str, list] = {}
    for r in orders:
        by_grp.setdefault(r.o_orderpriority, []).append(
            float(np.floor(r.o_totalprice + 0.5))
        )
    got = {
        r.o_orderpriority: r.gini
        for r in SPECS["q336_gini_by_segment"].fn(spark, SF_DIR).collect()
    }
    for g, vals in by_grp.items():
        x = np.sort(np.array(vals))
        n = len(x)
        gini = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (
            n + 1
        ) / n
        assert abs(got[g] - gini) < 1e-5, (g, got[g], gini)


def test_kaplan_meier_matches_manual_estimator(spark):
    """Rebuild sessions + the KM product in plain Python and compare
    survival at every churn bucket."""
    rows = sorted(
        _events(spark), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    sess: list[tuple[int, int]] = []  # (s0, s1) seconds
    cur_u, s0, s1 = None, None, None

    def ssec(ts):
        return (
            ((ts.month - 1) * 31 + ts.day) * 86400
            + ts.hour * 3600
            + ts.minute * 60
            + ts.second
        )

    for r in rows:
        t = ssec(r.ts)
        if r.user_id != cur_u or t - s1 > 1800:
            if cur_u is not None:
                sess.append((s0, s1))
            cur_u, s0, s1 = r.user_id, t, t
        else:
            s1 = t
    sess.append((s0, s1))
    horizon = max(s1 for _, s1 in sess)
    obs = [
        (min((s1 - s0) // 600, 48), 1 if s1 < horizon - 1800 else 0)
        for s0, s1 in sess
    ]
    from collections import Counter

    at_t = Counter(t for t, _ in obs)
    d_t = Counter(t for t, ch in obs if ch)
    ts_sorted = sorted(at_t)
    surv, out = 1.0, {}
    for t in ts_sorted:
        n_risk = sum(at_t[u] for u in ts_sorted if u >= t)
        d = d_t.get(t, 0)
        surv *= 1.0 - d / n_risk
        if d > 0:
            out[t] = (n_risk, d, surv)
    got = {
        r.duration_bucket: (r.n_risk, r.d_ended, r.survival)
        for r in SPECS["q340_kaplan_meier"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(out)
    for t, (nr, d, s) in out.items():
        gn, gd, gs = got[t]
        assert (gn, gd) == (nr, d), (t, got[t], out[t])
        assert abs(gs - s) < 1e-5, (t, gs, s)


def test_wasserstein_matches_scipy_style_reference(spark):
    """W₁ between each source's bucketed n_chars distribution and the
    corpus, recomputed as the plain |CDF difference| sum."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars"
    ).collect()
    xs = np.array([r.n_chars for r in docs], dtype=np.int64)
    lo, hi = xs.min(), xs.max()
    bkt = np.minimum((xs - lo) * 64 // (hi - lo + 1), 63)
    srcs = np.array([r.source for r in docs])
    grid = np.arange(64)
    gcdf = np.array([(bkt <= g).mean() for g in grid])
    got = {
        r.source: r.w1_buckets
        for r in SPECS["q342_wasserstein_1d"].fn(spark, SF_DIR).collect()
    }
    for s in np.unique(srcs):
        sb = bkt[srcs == s]
        scdf = np.array([(sb <= g).mean() for g in grid])
        present = np.isin(grid, np.unique(bkt))
        w1 = float(np.abs(scdf[present] - gcdf[present]).sum())
        assert abs(got[s] - w1) < 1e-5, (s, got[s], w1)


def test_wilson_ci_matches_formula(spark):
    rows = _events(spark)
    from collections import Counter

    n = Counter(r.event_type for r in rows)
    k = Counter(r.event_type for r in rows if r.value > 80)
    z = 1.959963984540054
    got = {
        r.event_type: r
        for r in SPECS["q339_wilson_ci"].fn(spark, SF_DIR).collect()
    }
    pooled = sum(k.values()) / sum(n.values())
    for t in n:
        p = k[t] / n[t]
        denom = 1 + z * z / n[t]
        center = p + z * z / (2 * n[t])
        half = z * np.sqrt((p * (1 - p) + z * z / (4 * n[t])) / n[t])
        lo, hi = (center - half) / denom, (center + half) / denom
        g = got[t]
        assert g.n_events == n[t] and g.n_hits == k[t]
        assert abs(g.wilson_lo - lo) < 1e-5 and abs(g.wilson_hi - hi) < 1e-5
        assert g.contains_pooled == (lo <= pooled <= hi)
    # non-degenerate: the proxy fires for some but not all events
    assert 0 < sum(k.values()) < sum(n.values())


def test_quantile_normalize_matches_reference(spark):
    """avg_norm_bucket per source recomputed by explicit inverse-CDF
    composition on the bucketed values."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars"
    ).collect()
    xs = np.array([r.n_chars for r in docs], dtype=np.int64)
    lo, hi = xs.min(), xs.max()
    bkt = np.minimum((xs - lo) * 64 // (hi - lo + 1), 63)
    srcs = np.array([r.source for r in docs])
    gvals, gcounts = np.unique(bkt, return_counts=True)
    gcum = np.cumsum(gcounts)
    N = len(bkt)
    got = {
        r.source: (r.n_docs, r.avg_raw_bucket, r.avg_norm_bucket)
        for r in SPECS["q341_quantile_normalize"].fn(spark, SF_DIR).collect()
    }
    for s in np.unique(srcs):
        sb = np.sort(bkt[srcs == s])
        ns = len(sb)
        svals, scounts = np.unique(sb, return_counts=True)
        scum = np.cumsum(scounts)
        mapped = {}
        for v, cum in zip(svals, scum):
            # smallest global bucket with gcum·ns >= scum·N
            idx = np.argmax(gcum * ns >= cum * N)
            mapped[v] = gvals[idx]
        avg_norm = sum(
            c * mapped[v] for v, c in zip(svals, scounts)
        ) / ns
        nd, raw, norm = got[s]
        assert nd == ns
        assert abs(raw - sb.mean()) < 1e-5
        assert abs(norm - avg_norm) < 1e-5, (s, norm, avg_norm)


def test_markov_stationary_matches_numpy_power_iteration(spark):
    rows = sorted(
        _events(spark), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    states = sorted({r.event_type for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    counts = np.zeros((len(states), len(states)))
    prev_u, prev_t = None, None
    for r in rows:
        if r.user_id == prev_u:
            counts[idx[prev_t], idx[r.event_type]] += 1
        prev_u, prev_t = r.user_id, r.event_type
    P = counts / counts.sum(axis=1, keepdims=True)
    v = np.full(len(states), 0.2)
    for _ in range(20):
        v = v @ P
    got = {
        r.state: r.pi
        for r in SPECS["q360_markov_stationary"].fn(spark, SF_DIR).collect()
    }
    for s, i in idx.items():
        assert abs(got[s] - v[i]) < 1e-5, (s, got[s], v[i])
    assert all(
        r.mass_conserved
        for r in SPECS["q360_markov_stationary"].fn(spark, SF_DIR).collect()
    )
