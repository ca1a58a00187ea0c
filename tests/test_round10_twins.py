"""Independent first-principles references for the round-10 statistics
queries (the round-8/9 habit, VERDICT r09 ask #8): a _sql_twin query
runs ONE SQL string on both engines, so the oracle differential proves
engine parity but not SEMANTICS — these tests recompute each statistic
in NumPy/pure Python on the fixture rows and hold the query to it."""

from __future__ import annotations

import collections
import math

import numpy as np

from aws_iceberg_automation_spark.io import load_table
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _row(spark, name):
    rows = SPECS[name].fn(spark, SF_DIR).collect()
    assert len(rows) == 1, (name, rows)
    return rows[0]


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").collect()


def _edges(spark):
    o = {r.o_orderkey: r.o_custkey
         for r in load_table(spark, SF_DIR, "orders").collect()}
    e = set()
    for r in load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_suppkey").collect():
        if r.l_orderkey in o:
            e.add((o[r.l_orderkey], r.l_suppkey))
    return e


def _tokens(spark):
    out = []
    for r in load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text").collect():
        out.append((r.doc_id, r.text.split(" ")))
    return out


def _daily(spark):
    by_day = collections.defaultdict(int)
    vol = collections.defaultdict(int)
    for r in _orders(spark):
        d = r.o_orderdate.date()
        by_day[d] += math.floor(r.o_totalprice + 0.5)
        vol[d] += 1
    return (
        {d: math.floor(v / 100.0) for d, v in by_day.items()},
        dict(vol),
    )


def _lag_moments(x):
    days = sorted(x)
    n = len(days)
    mu = sum(x[d] for d in days) / n
    s0 = sum(math.floor((x[d] - mu) ** 2) for d in days)
    return days, n, mu, s0


def _rk(x, k):
    import datetime

    days, n, mu, s0 = _lag_moments(x)
    sk = 0
    for d in days:
        d2 = d + datetime.timedelta(days=k)
        if d2 in x:
            sk += math.floor((x[d] - mu) * (x[d2] - mu))
    return sk / s0, n


def test_assortativity_matches_corrcoef(spark):
    e = sorted(_edges(spark))
    dc = collections.Counter(c for c, _ in e)
    ds = collections.Counter(s for _, s in e)
    xs = np.array([dc[c] for c, _ in e], dtype=float)
    ys = np.array([ds[s] for _, s in e], dtype=float)
    want = np.corrcoef(xs, ys)[0, 1]
    got = _row(spark, "q434_degree_assortativity")
    assert got.n_edges == len(e)
    assert abs(got.assortativity - want) < 1e-5


def test_zipf_slope_matches_polyfit(spark):
    cnt = collections.Counter(
        w for _, ws in _tokens(spark) for w in ws
    )
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    x = np.array([math.floor(math.log(i + 1) * 1e6 + 0.5) / 1e6
                  for i in range(len(ranked))])
    y = np.array([math.floor(math.log(c) * 1e6 + 0.5) / 1e6
                  for _, c in ranked])
    slope, intercept = np.polyfit(x, y, 1)
    got = _row(spark, "q436_zipf_slope")
    assert got.n_points == len(ranked)
    assert abs(got.zipf_slope - slope) < 1e-4
    assert abs(got.zipf_intercept - intercept) < 1e-4


def test_heaps_law_matches_polyfit(spark):
    pts = [
        (math.log(len(ws)), math.log(len(set(ws))))
        for _, ws in _tokens(spark)
        if len(ws) >= 2
    ]
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    beta, lnk = np.polyfit(x, y, 1)
    got = _row(spark, "q438_heaps_law")
    assert got.n_docs == len(pts)
    # the query snaps logs to 1e-4 before the fit
    assert abs(got.heaps_beta - beta) < 5e-3
    assert abs(got.heaps_k - math.exp(lnk)) < 5e-3


def _lifetimes(spark):
    first, last, dead = {}, {}, {}
    for r in load_table(spark, SF_DIR, "events").collect():
        d = r.ts.day
        u = r.user_id
        first[u] = min(first.get(u, 99), d)
        last[u] = max(last.get(u, 0), d)
        if r.event_type == "error" and r.value >= 150:
            dead[u] = min(dead.get(u, 99), d)
    out = []
    for u in first:
        if u in dead:
            out.append((dead[u] - first[u], 1))
        else:
            out.append((last[u] - first[u], 0))
    return out


def test_kaplan_meier_matches_product_limit(spark):
    life = _lifetimes(spark)
    times = sorted({t for t, _ in life})
    got = {r.day_t: r for r in
           SPECS["q443_kaplan_meier"].fn(spark, SF_DIR).collect()}
    surv = 1.0
    for t in times:
        d = sum(1 for tt, dd in life if tt == t and dd == 1)
        n_risk = sum(1 for tt, _ in life if tt >= t)
        if d > 0:
            surv *= 1 - d / n_risk
        r = got[t]
        assert r.n_deaths == d and r.n_risk == n_risk
        assert abs(r.km_survival - surv) < 1e-4, (t, r.km_survival, surv)


def test_logrank_matches_first_principles(spark):
    first, last, dead = {}, {}, {}
    for r in load_table(spark, SF_DIR, "events").collect():
        d, u = r.ts.day, r.user_id
        first[u] = min(first.get(u, 99), d)
        last[u] = max(last.get(u, 0), d)
        if r.event_type == "error" and r.value >= 150:
            dead[u] = min(dead.get(u, 99), d)
    life = []
    for u in first:
        t = (dead[u] - first[u]) if u in dead else (last[u] - first[u])
        life.append((t, 1 if u in dead else 0, u % 2))
    o1 = e1 = v1 = 0.0
    for t in sorted({t for t, _, _ in life}):
        dt = sum(1 for tt, dd, _ in life if tt == t and dd == 1)
        if dt == 0:
            continue
        nt = sum(1 for tt, _, _ in life if tt >= t)
        d1t = sum(1 for tt, dd, g in life if tt == t and dd == 1 and g == 1)
        n1t = sum(1 for tt, _, g in life if tt >= t and g == 1)
        o1 += d1t
        e1 += dt * n1t / nt
        if nt > 1:
            v1 += dt * (n1t / nt) * (1 - n1t / nt) * (nt - dt) / (nt - 1)
    want = (o1 - e1) ** 2 / v1
    got = _row(spark, "q444_logrank_test")
    assert got.observed_g1 == o1
    assert abs(got.logrank_chi2 - want) < 1e-2


def test_cramers_v_matches_contingency(spark):
    cust = load_table(spark, SF_DIR, "customer").collect()
    nreg = {r.n_nationkey: r.n_regionkey
            for r in load_table(spark, SF_DIR, "nation").collect()}
    cells = collections.Counter(
        (r.c_mktsegment, nreg[r.c_nationkey]) for r in cust
    )
    segs = sorted({k[0] for k in cells})
    regs = sorted({k[1] for k in cells})
    obs = np.array([[cells.get((s, g), 0) for g in regs] for s in segs],
                   dtype=float)
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    chi2 = ((obs - exp) ** 2 / exp)[obs > 0].sum()
    v = math.sqrt(chi2 / (n * (min(len(segs), len(regs)) - 1)))
    got = _row(spark, "q445_cramers_v")
    assert got.n_obs == n
    assert abs(got.chi2 - chi2) < 1e-2
    assert abs(got.cramers_v - v) < 1e-4


def test_cohens_kappa_matches(spark):
    a = b = ab = n = 0
    for r in _orders(spark):
        x = 1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
        y = 1 if r.o_totalprice > 150000 else 0
        a += x
        b += y
        ab += x * y
        n += 1
    n11, n10, n01 = ab, a - ab, b - ab
    n00 = n - a - b + ab
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n / n
    got = _row(spark, "q446_cohens_kappa")
    assert (got.n11, got.n00) == (n11, n00)
    assert abs(got.cohens_kappa - (po - pe) / (1 - pe)) < 1e-5


def _avg_ranks(values):
    """Tie-averaged ranks, 1-based."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def test_kruskal_wallis_matches(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars").collect()
    vals = [r.n_chars for r in docs]
    grp = [r.source for r in docs]
    ranks = _avg_ranks(vals)
    n = len(vals)
    bygrp = collections.defaultdict(list)
    for g, r in zip(grp, ranks):
        bygrp[g].append(r)
    h = 12 / (n * (n + 1)) * sum(
        # the query floors each R^2/n term to the unit grid
        math.floor(sum(rs) ** 2 / len(rs)) for rs in bygrp.values()
    ) - 3 * (n + 1)
    cnt = collections.Counter(vals)
    ties = sum(t ** 3 - t for t in cnt.values())
    h /= 1 - ties / (n ** 3 - n)
    got = _row(spark, "q447_kruskal_wallis")
    assert got.n_obs == n
    assert abs(got.kw_h - h) < 1e-3


def test_levene_matches(spark):
    cust = {r.c_custkey: r.c_mktsegment
            for r in load_table(spark, SF_DIR, "customer").collect()}
    by = collections.defaultdict(list)
    for r in _orders(spark):
        by[cust[r.o_custkey]].append(math.floor(r.o_totalprice))
    z = collections.defaultdict(list)
    for g, xs in by.items():
        mu = sum(xs) / len(xs)
        z[g] = [math.floor(abs(x - mu)) for x in xs]
    k = len(z)
    nn = sum(len(v) for v in z.values())
    gm = sum(sum(v) for v in z.values()) / nn
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in z.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v)
              for v in z.values())
    want = (ssb / (k - 1)) / (ssw / (nn - k))
    got = _row(spark, "q448_levene_variance")
    assert got.n_rows == nn
    assert abs(got.levene_w - want) < 1e-3


def test_jarque_bera_matches(spark):
    x = np.array([math.floor(r.o_totalprice / 1000) for r in _orders(spark)],
                 dtype=float)
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    s = m3 / m2 ** 1.5
    kx = m4 / m2 ** 2 - 3
    jb = n / 6 * (s ** 2 + kx ** 2 / 4)
    got = _row(spark, "q449_jarque_bera")
    assert got.n_obs == n
    assert abs(got.skewness - s) < 1e-4
    assert abs(got.jarque_bera - jb) < max(1e-2, jb * 1e-4)


def test_ljung_box_matches(spark):
    x, _ = _daily(spark)
    _, n, _, _ = _lag_moments(x)
    q = 0.0
    rs = {}
    for k in range(1, 6):
        rk, _ = _rk(x, k)
        rs[k] = rk
        q += rk ** 2 / (n - k)
    q *= n * (n + 2)
    got = _row(spark, "q450_ljung_box")
    assert got.n_days == n
    for k in range(1, 6):
        assert abs(getattr(got, f"r{k}") - rs[k]) < 1e-4
    assert abs(got.ljung_box_q - q) < max(1e-2, q * 1e-4)


def test_variance_ratio_matches(spark):
    import datetime

    x, _ = _daily(spark)

    def var_diffs(k):
        ds = [(x[d + datetime.timedelta(days=k)] - x[d])
              for d in x if d + datetime.timedelta(days=k) in x]
        a = np.array(ds, dtype=float)
        return ((a - a.mean()) ** 2).mean(), len(a)

    v1, n1 = var_diffs(1)
    v5, n5 = var_diffs(5)
    got = _row(spark, "q451_variance_ratio")
    assert (got.n_pairs_1d, got.n_pairs_5d) == (n1, n5)
    assert abs(got.variance_ratio - (v5 / 5) / v1) < 1e-4


def test_pacf_matches_durbin_levinson(spark):
    x, _ = _daily(spark)
    r1, _ = _rk(x, 1)
    r2, _ = _rk(x, 2)
    r3, _ = _rk(x, 3)
    phi11 = r1
    phi22 = (r2 - r1 ** 2) / (1 - r1 ** 2)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    got = _row(spark, "q452_acf_pacf")
    assert abs(got.pacf1 - phi11) < 1e-4
    assert abs(got.pacf2 - phi22) < 1e-4
    assert abs(got.pacf3 - phi33) < 1e-4


def test_psi_matches(spark):
    ref = collections.Counter()
    cur = collections.Counter()
    for r in _orders(spark):
        b = min(int(r.o_totalprice // 60000), 9)
        (ref if r.o_orderdate.year <= 1997 else cur)[b] += 1
    bins = set(ref) | set(cur)
    nr, nc = sum(ref.values()), sum(cur.values())
    psi = sum(
        ((cur.get(b, 0) + 1) / (nc + 10) - (ref.get(b, 0) + 1) / (nr + 10))
        * math.log(((cur.get(b, 0) + 1) / (nc + 10))
                   / ((ref.get(b, 0) + 1) / (nr + 10)))
        for b in bins
    )
    got = _row(spark, "q453_psi_stability")
    assert got.n_bins == len(bins)
    assert abs(got.psi - psi) < 1e-5


def test_kl_js_matches(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "lang").collect()
    cnt = collections.Counter((r.source, r.lang) for r in docs)
    nsrc = collections.Counter(r.source for r in docs)
    nlang = collections.Counter(r.lang for r in docs)
    t = len(docs)
    got = {r.source: r for r in
           SPECS["q454_kl_js_divergence"].fn(spark, SF_DIR).collect()}
    for s in nsrc:
        kl = js = 0.0
        for (src, lang), c in cnt.items():
            if src != s:
                continue
            p = c / nsrc[s]
            q = nlang[lang] / t
            m = (p + q) / 2
            kl += p * math.log(p / q)
            js += (p * math.log(p / m) + q * math.log(q / m)) / 2
        assert abs(got[s].kl_nats - kl) < 1e-5
        assert abs(got[s].js_nats - js) < 1e-5


def test_wasserstein_matches(spark):
    cust = {r.c_custkey: r.c_mktsegment
            for r in load_table(spark, SF_DIR, "customer").collect()}
    a, b = [], []
    for r in _orders(spark):
        seg = cust[r.o_custkey]
        if seg == "BUILDING":
            a.append(int(r.o_totalprice // 1000))
        elif seg == "MACHINERY":
            b.append(int(r.o_totalprice // 1000))
    grid = sorted(set(a) | set(b))
    ca = cb = 0.0
    w = 0.0
    for v in grid:
        ca += sum(1 for x in a if x == v) / len(a)
        cb += sum(1 for x in b if x == v) / len(b)
        w += abs(ca - cb)
    got = _row(spark, "q455_wasserstein_1d")
    assert got.n_buckets == len(grid)
    assert abs(got.wasserstein_1_kusd - w) < 1e-4


def test_cusum_matches(spark):
    x, _ = _daily(spark)
    days, n, mu, _ = _lag_moments(x)
    es = {d: math.floor((x[d] - mu) * 1e3) for d in days}
    cum, best, best_d = 0, -1, None
    path = {}
    for d in days:
        cum += es[d]
        path[d] = abs(cum)
    best = max(path.values())
    best_d = min(d for d in days if path[d] == best)
    sd = math.sqrt(np.var([x[d] for d in days]))
    got = _row(spark, "q456_cusum_changepoint")
    assert got.change_day == str(best_d)
    assert abs(got.normalized_cusum - (best / 1e3) / (sd * math.sqrt(n))) < 1e-3


def test_benford_matches(spark):
    cnt = collections.Counter(
        int(str(math.floor(r.o_totalprice))[0]) for r in _orders(spark)
    )
    n = sum(cnt.values())
    chi2 = mad = 0.0
    for d in sorted(cnt):
        e = n * math.log10(1 + 1 / d)
        chi2 += (cnt[d] - e) ** 2 / e
        mad += abs(cnt[d] / n - math.log10(1 + 1 / d))
    mad /= len(cnt)
    got = _row(spark, "q458_benford_digits")
    assert got.n_digits == len(cnt)
    assert abs(got.benford_chi2 - chi2) < 1e-2
    assert abs(got.benford_mad - mad) < 1e-6


def test_gini_matches(spark):
    rev = collections.Counter()
    for r in _orders(spark):
        rev[r.o_custkey] += math.floor(r.o_totalprice + 0.5)
    vals = sorted(math.floor(v / 10000) for v in rev.values())
    n = len(vals)
    ranks = _avg_ranks(vals)
    g = 2 * sum(r * v for r, v in zip(ranks, vals)) / (n * sum(vals)) \
        - (n + 1) / n
    got = _row(spark, "q459_gini_lorenz")
    assert got.n_customers == n
    assert abs(got.gini - g) < 1e-5


def test_theil_matches(spark):
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, SF_DIR, "customer").collect()}
    rev = collections.Counter()
    for r in _orders(spark):
        rev[r.o_custkey] += math.floor(r.o_totalprice + 0.5)
    xs = {c: math.floor(v / 10000) + 0.5 for c, v in rev.items()}
    tot = sum(xs.values())
    n = len(xs)
    mu = tot / n
    t_total = sum(x / tot * math.log(x / mu) for x in xs.values())
    bynat = collections.defaultdict(list)
    for c, x in xs.items():
        bynat[cust[c]].append(x)
    t_between = sum(
        sum(v) / tot * math.log((sum(v) / len(v)) / mu)
        for v in bynat.values()
    )
    got = _row(spark, "q460_theil_index")
    assert got.n_customers == n
    assert abs(got.theil_total - t_total) < 1e-4
    assert abs(got.theil_between_nations - t_between) < 1e-5


def test_hhi_matches(spark):
    sup = {r.s_suppkey: r.s_nationkey
           for r in load_table(spark, SF_DIR, "supplier").collect()}
    rev = collections.Counter()
    for r in load_table(spark, SF_DIR, "lineitem").select(
            "l_suppkey", "l_extendedprice").collect():
        rev[(sup[r.l_suppkey], r.l_suppkey)] += math.floor(
            r.l_extendedprice + 0.5)
    bynat = collections.defaultdict(dict)
    for (nk, sk), v in rev.items():
        bynat[nk][sk] = v
    got = {r.nationkey: r.hhi for r in
           SPECS["q461_hhi_concentration"].fn(spark, SF_DIR).collect()}
    for nk, sups in bynat.items():
        tot = sum(sups.values())
        hhi = sum((v / tot) ** 2 for v in sups.values()) * 10000
        assert abs(got[nk] - hhi) < 0.05, (nk, got[nk], hhi)


def test_max_drawdown_matches(spark):
    x, _ = _daily(spark)
    days = sorted(x)
    peak, best = -1, -1
    for d in days:
        if x[d] > peak:
            peak = x[d]
        best = max(best, peak - x[d])
    got = _row(spark, "q462_max_drawdown")
    assert abs(got.max_drawdown_kusd - best / 100 / 100) < 0.006


def test_sharpe_beta_matches(spark):
    cust = {r.c_custkey: r.c_mktsegment
            for r in load_table(spark, SF_DIR, "customer").collect()}
    seg_rev = collections.Counter()
    for r in _orders(spark):
        ym = r.o_orderdate.year * 12 + r.o_orderdate.month
        seg_rev[(cust[r.o_custkey], ym)] += math.floor(r.o_totalprice + 0.5)
    mkt = collections.Counter()
    for (s, ym), v in seg_rev.items():
        mkt[ym] += v
    got = {r.segment: r for r in
           SPECS["q464_sharpe_beta"].fn(spark, SF_DIR).collect()}
    segs = {s for s, _ in seg_rev}
    for s in segs:
        rg, rk = [], []
        for ym in sorted(mkt):
            if (s, ym) in seg_rev and (s, ym + 1) in seg_rev \
                    and ym + 1 in mkt:
                g = (seg_rev[(s, ym + 1)] - seg_rev[(s, ym)]) \
                    / seg_rev[(s, ym)]
                k = (mkt[ym + 1] - mkt[ym]) / mkt[ym]
                rg.append(math.floor(g * 1e6 + 0.5) / 1e6)
                rk.append(math.floor(k * 1e6 + 0.5) / 1e6)
        a, b = np.array(rg), np.array(rk)
        sharpe = a.mean() / a.std()
        beta = ((a * b).mean() - a.mean() * b.mean()) / b.var()
        assert abs(got[s].sharpe_monthly - sharpe) < 1e-3, s
        assert abs(got[s].beta_vs_market - beta) < 1e-3, s


def test_naive_bayes_matches(spark):
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, SF_DIR, "customer").collect()}
    seg = {r.c_custkey: r.c_mktsegment
           for r in load_table(spark, SF_DIR, "customer").collect()}
    nreg = {r.n_nationkey: r.n_regionkey
            for r in load_table(spark, SF_DIR, "nation").collect()}
    train, test = [], []
    for r in _orders(spark):
        f1 = seg[r.o_custkey]
        f2 = nreg[cust[r.o_custkey]]
        y = 1 if r.o_totalprice > 150000 else 0
        (train if r.o_orderdate.year <= 1997 else test).append((f1, f2, y))
    nc = collections.Counter(y for _, _, y in train)
    n = len(train)
    c1 = collections.Counter((f1, y) for f1, _, y in train)
    c2 = collections.Counter((f2, y) for _, f2, y in train)
    tp = fp = fn = tn = 0
    for f1, f2, y in test:
        lp = {}
        for cl in (0, 1):
            lp[cl] = (
                math.log((nc[cl] + 1) / (n + 2))
                + math.log((c1.get((f1, cl), 0) + 1) / (nc[cl] + 5))
                + math.log((c2.get((f2, cl), 0) + 1) / (nc[cl] + 5))
            )
        pred = 1 if lp[1] > lp[0] else 0
        if pred and y:
            tp += 1
        elif pred:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    got = _row(spark, "q466_naive_bayes")
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)


def test_decision_stump_matches(spark):
    pts = [(int(r.o_totalprice // 1000),
            1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0)
           for r in _orders(spark)]
    n = len(pts)
    p = sum(y for _, y in pts)
    best = None
    for thr in sorted({v for v, _ in pts}):
        nl = sum(1 for v, _ in pts if v <= thr)
        pl = sum(y for v, y in pts if v <= thr)
        if nl == 0 or nl == n:
            continue
        nr, pr = n - nl, p - pl
        gini = (nl * 2 * (pl / nl) * (1 - pl / nl)
                + nr * 2 * (pr / nr) * (1 - pr / nr)) / n
        if best is None or gini < best[1] - 1e-15:
            best = (thr, gini)
    got = _row(spark, "q467_decision_stump")
    assert got.best_threshold_kusd == best[0]
    assert abs(got.gini_after - best[1]) < 1e-5


def test_brier_decomposition_matches(spark):
    seg = {r.c_custkey: r.c_mktsegment
           for r in load_table(spark, SF_DIR, "customer").collect()}
    f = collections.Counter()
    fn_ = collections.Counter()
    t = collections.defaultdict(list)
    for r in _orders(spark):
        s = seg[r.o_custkey]
        y = 1 if r.o_totalprice > 150000 else 0
        if r.o_orderdate.year <= 1997:
            f[s] += y
            fn_[s] += 1
        else:
            t[s].append(y)
    gn = sum(len(v) for v in t.values())
    gp = sum(sum(v) for v in t.values())
    obar = gp / gn
    rel = sum(len(v) * (f[s] / fn_[s] - sum(v) / len(v)) ** 2
              for s, v in t.items()) / gn
    res = sum(len(v) * (sum(v) / len(v) - obar) ** 2
              for s, v in t.items()) / gn
    unc = obar * (1 - obar)
    got = _row(spark, "q468_brier_decomposition")
    assert abs(got.reliability - rel) < 1e-5
    assert abs(got.resolution - res) < 1e-5
    assert abs(got.brier_score - (rel - res + unc)) < 1e-5


def test_cmh_matches(spark):
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, SF_DIR, "customer").collect()}
    nreg = {r.n_nationkey: r.n_regionkey
            for r in load_table(spark, SF_DIR, "nation").collect()}
    cells = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in _orders(spark):
        st = nreg[cust[r.o_custkey]]
        e = 1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
        y = 1 if r.o_totalprice > 150000 else 0
        cells[st][(1 - e) * 2 + (1 - y)] += 1
    num = den = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
    got = _row(spark, "q469_cmh_odds_ratio")
    assert got.n_strata == len(cells)
    assert abs(got.or_mantel_haenszel - num / den) < 1e-4


def test_cronbach_matches(spark):
    items = []
    for r in _orders(spark):
        items.append((
            1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0,
            1 if r.o_totalprice > 100000 else 0,
            1 if r.o_totalprice > 200000 else 0,
            1 if r.o_orderstatus == "F" else 0,
        ))
    a = np.array(items, dtype=float)
    item_vars = a.var(axis=0).sum()
    total_var = a.sum(axis=1).var()
    want = 4 / 3 * (1 - item_vars / total_var)
    got = _row(spark, "q470_cronbach_alpha")
    assert abs(got.cronbach_alpha - want) < 1e-5


def test_deming_matches(spark):
    cnt = collections.Counter()
    rev = collections.Counter()
    for r in _orders(spark):
        cnt[r.o_custkey] += 1
        rev[r.o_custkey] += math.floor(r.o_totalprice + 0.5)
    x = np.array([cnt[c] for c in cnt], dtype=float)
    y = np.array([math.floor(rev[c] / 1000) for c in cnt], dtype=float)
    cxx, cyy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    slope = (cyy - cxx + math.sqrt((cyy - cxx) ** 2 + 4 * cxy ** 2)) \
        / (2 * cxy)
    got = _row(spark, "q471_deming_regression")
    assert got.n_customers == len(cnt)
    assert abs(got.deming_slope - slope) < 1e-4
    assert abs(got.deming_intercept - (y.mean() - slope * x.mean())) < 1e-3


def test_hotelling_matches(spark):
    seg = {r.c_custkey: r.c_mktsegment
           for r in load_table(spark, SF_DIR, "customer").collect()}
    d = collections.defaultdict(lambda: [0, 0])
    for r in _orders(spark):
        s = seg[r.o_custkey]
        if s in ("BUILDING", "MACHINERY"):
            d[(s, r.o_custkey)][0] += 1
            d[(s, r.o_custkey)][1] += math.floor(r.o_totalprice + 0.5)
    ga = np.array([[c, math.floor(v / 1000)] for (s, _), (c, v) in d.items()
                   if s == "BUILDING"], dtype=float)
    gb = np.array([[c, math.floor(v / 1000)] for (s, _), (c, v) in d.items()
                   if s == "MACHINERY"], dtype=float)
    na, nb = len(ga), len(gb)
    dvec = ga.mean(0) - gb.mean(0)
    w = (ga - ga.mean(0)).T @ (ga - ga.mean(0)) \
        + (gb - gb.mean(0)).T @ (gb - gb.mean(0))
    s = w / (na + nb - 2)
    t2 = na * nb / (na + nb) * dvec @ np.linalg.inv(s) @ dvec
    got = _row(spark, "q472_hotelling_t2")
    assert (got.n_building, got.n_machinery) == (na, nb)
    assert abs(got.hotelling_t2 - t2) < max(1e-2, t2 * 1e-4)


def test_friedman_matches(spark):
    cust = load_table(spark, SF_DIR, "customer").collect()
    nreg = {r.n_nationkey: r.n_regionkey
            for r in load_table(spark, SF_DIR, "nation").collect()}
    ckey = {r.c_custkey: (nreg[r.c_nationkey], r.c_mktsegment)
            for r in cust}
    s = collections.Counter()
    n = collections.Counter()
    for r in _orders(spark):
        blk, trt = ckey[r.o_custkey]
        s[(blk, trt)] += math.floor(r.o_totalprice + 0.5)
        n[(blk, trt)] += 1
    blocks = sorted({b for b, _ in s})
    trts = sorted({t for _, t in s})
    rj = collections.Counter()
    for b in blocks:
        avgs = {t: s[(b, t)] / n[(b, t)] for t in trts}
        ranks = _avg_ranks([avgs[t] for t in trts])
        for t, r in zip(trts, ranks):
            rj[t] += r
    bk, k = len(blocks), len(trts)
    chi2 = 12 / (bk * k * (k + 1)) * sum(v ** 2 for v in rj.values()) \
        - 3 * bk * (k + 1)
    got = _row(spark, "q473_friedman_test")
    assert (got.n_blocks, got.n_treatments) == (bk, k)
    assert abs(got.friedman_chi2 - chi2) < 1e-4


def test_theil_sen_matches(spark):
    mon = collections.Counter()
    for r in _orders(spark):
        ym = r.o_orderdate.year * 12 + r.o_orderdate.month
        mon[ym] += math.floor(r.o_totalprice + 0.5)
    pts = sorted((ym, math.floor(v / 1000)) for ym, v in mon.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (xa, ya), (xb, yb) = pts[i], pts[j]
            slopes.append(math.floor((yb - ya) * 1000 / (xb - xa)))
    slopes.sort()
    med = slopes[len(slopes) // 2]  # upper median (cum*2 >= np+1)
    got = _row(spark, "q475_theil_sen")
    assert got.n_pairs == len(slopes)
    assert abs(got.theil_sen_slope_kusd - med / 1000) < 1e-9


def test_mcc_f1_matches(spark):
    tp = fp = fn = tn = 0
    for r in _orders(spark):
        pred = 1 if r.o_totalprice > 150000 else 0
        y = 1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
        if pred and y:
            tp += 1
        elif pred:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    got = _row(spark, "q476_mcc_f1_suite")
    assert (got.tp, got.tn) == (tp, tn)
    assert abs(got.mcc - mcc) < 1e-5
    assert abs(got.f1 - 2 * tp / (2 * tp + fp + fn)) < 1e-5


def test_qq_deciles_matches(spark):
    cust = {r.c_custkey: r.c_mktsegment
            for r in load_table(spark, SF_DIR, "customer").collect()}
    a, b = [], []
    for r in _orders(spark):
        s = cust[r.o_custkey]
        if s == "BUILDING":
            a.append(int(r.o_totalprice // 1000))
        elif s == "MACHINERY":
            b.append(int(r.o_totalprice // 1000))
    a.sort()
    b.sort()

    def dec(xs, p):
        # smallest bucket whose cumulative count*10 >= p*n
        target = p * len(xs)
        c = 0
        for i, v in enumerate(sorted(set(xs))):
            c += sum(1 for x in xs if x == v)
            if c * 10 >= target:
                return v

    got = {r.decile: r for r in
           SPECS["q477_qq_deciles"].fn(spark, SF_DIR).collect()}
    for p in range(1, 10):
        assert got[p].building_kusd == dec(a, p), p
        assert got[p].machinery_kusd == dec(b, p), p


def test_cochran_q_matches(spark):
    g = [0, 0, 0]
    sl = sll = 0
    n = 0
    for r in _orders(spark):
        i = (
            1 if r.o_orderpriority in ("1-URGENT", "2-HIGH") else 0,
            1 if r.o_totalprice > 100000 else 0,
            1 if r.o_orderstatus == "F" else 0,
        )
        for j in range(3):
            g[j] += i[j]
        li = sum(i)
        sl += li
        sll += li * li
        n += 1
    q = 2 * (3 * sum(x * x for x in g) - sl * sl) / (3 * sl - sll)
    got = _row(spark, "q478_cochran_q")
    assert got.n_orders == n
    assert abs(got.cochran_q - q) < 1e-3


def test_attribution_matches(spark):
    ev = load_table(spark, SF_DIR, "events").collect()
    by_user = collections.defaultdict(list)
    for r in ev:
        tk = ((r.ts.day * 86400 + r.ts.hour * 3600 + r.ts.minute * 60
               + r.ts.second) * 17179869184 + r.event_id)
        by_user[r.user_id].append((tk, r.event_type))
    first_t = collections.Counter()
    last_t = collections.Counter()
    lin = collections.Counter()
    for u, evs in by_user.items():
        convs = [tk for tk, t in evs if t == "purchase"]
        if not convs:
            continue
        ck = min(convs)
        touches = sorted(
            (tk, t) for tk, t in evs
            if t in ("click", "view") and tk < ck
        )
        if not touches:
            continue
        first_t[touches[0][1]] += 1
        last_t[touches[-1][1]] += 1
        for _, t in touches:
            lin[t] += math.floor(1000000 / len(touches))
    got = {r.channel: r for r in
           SPECS["q441_attribution_models"].fn(spark, SF_DIR).collect()}
    for ch in got:
        assert got[ch].first_touch_conversions == first_t.get(ch, 0), ch
        assert got[ch].last_touch_conversions == last_t.get(ch, 0), ch
        assert got[ch].linear_credit_ppm == lin.get(ch, 0), ch


def test_association_rules_lift_matches(spark):
    part = {r.p_partkey: r.p_brand
            for r in load_table(spark, SF_DIR, "part").collect()}
    ob = set()
    for r in load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey").collect():
        ob.add((r.l_orderkey, part[r.l_partkey]))
    nb = collections.Counter(b for _, b in ob)
    by_order = collections.defaultdict(set)
    for o, b in ob:
        by_order[o].add(b)
    n = len(by_order)
    pairs = collections.Counter()
    for bs in by_order.values():
        bs = sorted(bs)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pairs[(bs[i], bs[j])] += 1
    rows = SPECS["q440_association_rules"].fn(spark, SF_DIR).collect()
    assert len(rows) == 15
    for r in rows:
        nab = pairs[(r.brand_a, r.brand_b)]
        assert r.support_ab == nab
        lift = nab * n / (nb[r.brand_a] * nb[r.brand_b])
        assert abs(r.lift - lift) < 1e-5
