"""Independent first-principles references for the round-9 statistics
queries (the round-8 habit, VERDICT r08 'keep the discipline'): a
_sql_twin query runs ONE SQL string on both engines, so the oracle
differential proves engine parity but not SEMANTICS — these tests
recompute each statistic in NumPy/pure Python on the fixture rows and
hold the query to it."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from aws_iceberg_automation_spark.io import load_table
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()


def _r2(v, s=1.0):
    """Engine round(): half away from zero (np.round is half-even)."""
    return math.floor(v * s + 0.5) / s


def _events(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect()
    )


def _mday(ts):
    return (ts.month - 1) * 31 + ts.day


def test_anderson_darling_matches_first_principles(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars"
    ).collect()
    import collections

    by_src = collections.defaultdict(list)
    for r in docs:
        by_src[r.source].append(r.n_chars)
    pooled = sorted(x for xs in by_src.values() for x in xs)
    nn = len(pooled)
    zs = sorted(set(pooled))
    got = {
        r.source: r.ad_component
        for r in SPECS["q382_anderson_darling_ksample"].fn(spark, SF_DIR).collect()
    }
    for src, xs in by_src.items():
        na = len(xs)
        comp = 0.0
        bj = 0
        maj = 0
        cnt = collections.Counter(pooled)
        cnta = collections.Counter(xs)
        for z in zs:
            lj = cnt[z]
            bj += lj
            maj += cnta[z]
            if bj < nn:
                # the query floors each term onto a 1e-6 grid
                term = (
                    lj * (nn * maj - na * bj) ** 2
                    / (bj * (nn - bj)) / na / nn
                )
                comp += math.floor(term * 1e6) / 1e6
            # terms with B_j == N are excluded on both sides
        assert abs(got[src] - comp) < 2e-4, (src, got[src], comp)


def test_kendall_tau_matches_pair_count(spark):
    cust = load_table(spark, SF_DIR, "customer").collect()
    orders = load_table(spark, SF_DIR, "orders").collect()
    x, y = {}, {}
    for c in cust:
        x[c.c_nationkey] = x.get(c.c_nationkey, 0) + int(
            _r2(c.c_acctbal * 100)
        )
    cust_nation = {c.c_custkey: c.c_nationkey for c in cust}
    for o in orders:
        nk = cust_nation[o.o_custkey]
        y[nk] = y.get(nk, 0) + int(_r2(o.o_totalprice * 100))
    pts = [(nk, x[nk], y.get(nk, 0)) for nk in x]
    nc = nd = tx = ty = n0 = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = (pts[i], pts[j]) if pts[i][0] < pts[j][0] else (pts[j], pts[i])
            n0 += 1
            p = (a[1] - b[1]) * (a[2] - b[2])
            nc += p > 0
            nd += p < 0
            tx += a[1] == b[1]
            ty += a[2] == b[2]
    tau = (nc - nd) / math.sqrt((n0 - tx) * (n0 - ty))
    row = SPECS["q383_kendall_tau"].fn(spark, SF_DIR).collect()[0]
    assert row.concordant == nc and row.discordant == nd
    assert abs(row.kendall_tau_b - tau) < 1e-5


def test_anova_f_matches_numpy(spark):
    orders = load_table(spark, SF_DIR, "orders").collect()
    cust = {
        c.c_custkey: c.c_mktsegment
        for c in load_table(spark, SF_DIR, "customer").collect()
    }
    groups: dict[str, list[float]] = {}
    for o in orders:
        groups.setdefault(cust[o.o_custkey], []).append(
            _r2(o.o_totalprice)
        )
    k = len(groups)
    allv = np.array([v for g in groups.values() for v in g])
    nn = len(allv)
    grand = allv.mean()
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    row = SPECS["q385_anova_oneway"].fn(spark, SF_DIR).collect()[0]
    assert row.n_groups == k and row.n_rows == nn
    assert abs(row.f_stat - f) / f < 1e-4, (row.f_stat, f)
    assert abs(row.eta_squared - ssb / (ssb + ssw)) < 1e-4


def test_ridge_matches_numpy_solve(spark):
    li = load_table(spark, SF_DIR, "lineitem").collect()
    orders = {
        o.o_orderkey: _r2(o.o_totalprice)
        for o in load_table(spark, SF_DIR, "orders").collect()
    }
    feats: dict[int, list[int]] = {}
    for r in li:
        f = feats.setdefault(r.l_orderkey, [0, 0])
        f[0] += 1
        f[1] += int(r.l_quantity)
    x1 = np.array([feats[k][0] for k in feats], dtype=float)
    x2 = np.array([feats[k][1] for k in feats], dtype=float)
    y = np.array([orders[k] for k in feats], dtype=float)
    xc = np.stack([x1 - x1.mean(), x2 - x2.mean()], axis=1)
    yc = y - y.mean()
    lam = 1000.0
    a = xc.T @ xc + lam * np.eye(2)
    w = np.linalg.solve(a, xc.T @ yc)
    b0 = y.mean() - w[0] * x1.mean() - w[1] * x2.mean()
    row = SPECS["q388_ridge_regression_2f"].fn(spark, SF_DIR).collect()[0]
    assert abs(row.w_lines - w[0]) < 1e-3, (row.w_lines, w[0])
    assert abs(row.w_qty - w[1]) < 1e-3, (row.w_qty, w[1])
    assert abs(row.intercept - b0) < 1e-2


def test_kmeans_trajectory_matches_numpy(spark):
    cust = load_table(spark, SF_DIR, "customer").collect()
    v = np.array([int(_r2(c.c_acctbal * 100)) for c in cust], dtype=float)
    ctrs = [v.min(), v.sum() / len(v), v.max()]
    for rnd in range(3):
        d = np.abs(v[:, None] - np.array(ctrs)[None, :])
        # tie -> lower cluster id: argmin takes the first minimum
        assign = d.argmin(axis=1)
        if rnd < 2:
            # the query reports the centroids DEFINING the final
            # assignment (round-3 input), so the last update is not
            # applied to the reported values
            ctrs = [
                v[assign == c].sum() / max(1, (assign == c).sum())
                for c in range(3)
            ]
    got = {
        r.cluster_id: (r.n_members, r.centroid, r.wss)
        for r in SPECS["q389_kmeans_1d_unrolled"].fn(spark, SF_DIR).collect()
    }
    for c in range(3):
        sel = v[assign == c]
        assert got[c][0] == len(sel)
        assert abs(got[c][1] - ctrs[c] / 100.0) < 1e-3
        wss = ((sel - ctrs[c]) ** 2).sum() / 10000.0
        assert abs(got[c][2] - wss) / max(1.0, wss) < 1e-6


def test_logistic_gd_matches_pure_python(spark):
    orders = load_table(spark, SF_DIR, "orders").collect()
    x = np.array([_r2(o.o_totalprice) / 100000.0 for o in orders])
    y = np.array(
        [1.0 if o.o_orderpriority == "1-URGENT" else 0.0 for o in orders]
    )
    w = b = 0.0
    n = len(x)
    for _ in range(3):
        z = w * x + b
        p = 0.5 + 0.5 * z / (1 + np.abs(z))
        # the engine floors per-row grad terms onto a 1e-9 grid
        gw = np.floor((p - y) * x * 1e8).sum() / 1e8 / n
        gb = np.floor((p - y) * 1e8).sum() / 1e8 / n
        w, b = w - gw, b - gb
    acc = ((w * x + b >= 0) == (y == 1.0)).mean()
    row = SPECS["q390_logistic_gd_unrolled"].fn(spark, SF_DIR).collect()[0]
    assert abs(row.w - w) < 1e-5 and abs(row.b - b) < 1e-5
    assert abs(row.train_accuracy - acc) < 1e-3


def test_james_stein_matches_formula(spark):
    orders = load_table(spark, SF_DIR, "orders").collect()
    cust = {
        c.c_custkey: c.c_mktsegment
        for c in load_table(spark, SF_DIR, "customer").collect()
    }
    groups: dict[str, list[float]] = {}
    for o in orders:
        groups.setdefault(cust[o.o_custkey], []).append(_r2(o.o_totalprice))
    k = len(groups)
    means = {s: np.mean(g) for s, g in groups.items()}
    se2 = {s: np.var(g, ddof=1) / len(g) for s, g in groups.items()}
    grand = np.mean(list(means.values()))
    avg_se2 = np.mean(list(se2.values()))
    dev = sum((m - grand) ** 2 for m in means.values())
    c = max(0.0, 1.0 - (k - 3) * avg_se2 / dev)
    got = {
        r.seg: (r.raw_mean, r.js_mean, r.shrink_factor)
        for r in SPECS["q414_james_stein_shrinkage"].fn(spark, SF_DIR).collect()
    }
    for s in groups:
        assert abs(got[s][0] - means[s]) < 1e-2
        assert abs(got[s][1] - (grand + c * (means[s] - grand))) < 5e-2
        assert abs(got[s][2] - c) < 1e-4


def test_gumbel_fit_matches_formula(spark):
    rows = _events(spark)
    daily: dict[int, int] = {}
    for r in rows:
        cents = int(_r2(r.value * 100))
        d = _mday(r.ts)
        daily[d] = max(daily.get(d, 0), cents)
    mx = np.array(list(daily.values()), dtype=float) / 100.0
    m, s = mx.mean(), mx.std(ddof=1)
    beta = s * math.sqrt(6) / math.pi
    mu = m - 0.5772156649015329 * beta
    level = mu - beta * math.log(-math.log(1 - 1 / 30))
    row = SPECS["q416_gumbel_block_maxima"].fn(spark, SF_DIR).collect()[0]
    assert row.n_days == len(daily)
    assert abs(row.gumbel_beta - beta) < 1e-4
    assert abs(row.gumbel_mu - mu) < 1e-4
    assert abs(row.return_level_30d - level) < 1e-2


def test_runs_test_matches_pure_python(spark):
    orders = load_table(spark, SF_DIR, "orders").collect()
    daily: dict = {}
    for o in orders:
        d = o.o_orderdate.date()
        daily[d] = daily.get(d, 0) + int(_r2(o.o_totalprice))
    got = {
        r.year: (r.n_up, r.n_down, r.n_runs, r.z_score)
        for r in SPECS["q421_runs_test"].fn(spark, SF_DIR).collect()
    }
    import collections

    by_year = collections.defaultdict(list)
    for d in sorted(daily):
        by_year[d.year].append(daily[d])
    for yr, ys in by_year.items():
        signs = [1 if b > a else 0 for a, b in zip(ys, ys[1:]) if b != a]
        np_, nm = sum(signs), len(signs) - sum(signs)
        if np_ == 0 or nm == 0:
            assert yr not in got
            continue
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        nn = np_ + nm
        mu = 2 * np_ * nm / nn + 1
        var = 2 * np_ * nm * (2 * np_ * nm - nn) / (nn * nn * (nn - 1))
        z = (runs - mu) / math.sqrt(var)
        assert got[yr][:3] == (np_, nm, runs), (yr, got[yr], np_, nm, runs)
        assert abs(got[yr][3] - z) < 1e-4


def test_durbin_watson_matches_numpy(spark):
    rows = _events(spark)
    import collections

    series = collections.defaultdict(dict)
    for r in rows:
        d = _mday(r.ts)
        series[r.event_type][d] = series[r.event_type].get(d, 0) + int(
            _r2(r.value)
        )
    got = {
        r.event_type: r.durbin_watson
        for r in SPECS["q425_durbin_watson"].fn(spark, SF_DIR).collect()
    }
    for t, dd in series.items():
        ds = sorted(dd)
        x = np.array(ds, dtype=float)
        y = np.array([dd[d] for d in ds], dtype=float)
        b1, b0 = np.polyfit(x, y, 1)
        e = y - b0 - b1 * x
        # the engine grids e^2 and (e_t - e_{t-1})^2 onto 1e-4
        see = np.floor(e * e * 1e4).sum()
        sdd = np.floor(np.diff(e) ** 2 * 1e4).sum()
        assert abs(got[t] - sdd / see) < 1e-3, (t, got[t], sdd / see)


def test_granger_f_matches_numpy(spark):
    rows = _events(spark)
    import collections

    days = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        d = _mday(r.ts)
        if r.event_type == "purchase":
            days[d][0] += 1
        elif r.event_type == "view":
            days[d][1] += 1
    ds = sorted(days)
    trip = [
        (days[d][0], days[d - 1][0], days[d - 1][1])
        for d in ds
        if d - 1 in days
    ]
    y = np.array([t[0] for t in trip], dtype=float)
    y1 = np.array([t[1] for t in trip], dtype=float)
    x1 = np.array([t[2] for t in trip], dtype=float)
    n = len(y)

    def rss(feats):
        a = np.stack([np.ones(n)] + feats, axis=1)
        coef, *_ = np.linalg.lstsq(a, y, rcond=None)
        e = y - a @ coef
        return np.floor(e * e).sum()

    rss_r, rss_u = rss([y1]), rss([y1, x1])
    f = (rss_r - rss_u) * (n - 3) / rss_u
    row = SPECS["q426_granger_1lag"].fn(spark, SF_DIR).collect()[0]
    assert row.n_days == n
    assert row.rss_restricted == rss_r
    assert row.rss_unrestricted == rss_u
    assert abs(row.f_stat - f) < 1e-2, (row.f_stat, f)


def test_mann_kendall_matches_pure_python(spark):
    rows = _events(spark)
    daily: dict[int, int] = {}
    for r in rows:
        d = _mday(r.ts)
        daily[d] = daily.get(d, 0) + int(_r2(r.value * 100))
    ds = sorted(daily)
    ys = [daily[d] for d in ds]
    n = len(ys)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += (ys[j] > ys[i]) - (ys[j] < ys[i])
            slopes.append(
                ((ys[j] - ys[i]) / (ds[j] - ds[i]), ds[i], ds[j])
            )
    import collections

    ties = collections.Counter(ys)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var)
    slopes.sort()
    m = len(slopes)
    sen = slopes[(m + 1) // 2 - 1][0]  # lower median, deterministic ties
    row = SPECS["q428_mann_kendall"].fn(spark, SF_DIR).collect()[0]
    assert row.s_stat == s
    assert abs(row.z_score - z) < 1e-4
    assert abs(row.sen_slope - sen) < 1e-4


def test_shapley_efficiency_and_values(spark):
    rows = _events(spark)
    import collections

    users = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        u = users[r.user_id]
        if r.event_type == "view":
            u[0] = 1
        elif r.event_type == "click":
            u[1] = 1
        elif r.event_type == "signup":
            u[2] = 1
        elif r.event_type == "purchase":
            u[3] = 1
    cells = collections.defaultdict(lambda: [0, 0])
    for v, c, s, conv in users.values():
        cells[(v, c, s)][0] += 1
        cells[(v, c, s)][1] += conv

    def rate(key):
        n, k = cells.get(key, (0, 0))
        return k / n if n else 0.0

    # brute-force Shapley over all 3! orderings
    import itertools

    phi = {0: 0.0, 1: 0.0, 2: 0.0}
    for perm in itertools.permutations(range(3)):
        have = [0, 0, 0]
        prev = rate(tuple(have))
        for p in perm:
            have[p] = 1
            cur = rate(tuple(have))
            phi[p] += (cur - prev) / 6.0
            prev = cur
    got = {
        r.channel: r.shapley
        for r in SPECS["q418_shapley_attribution"].fn(spark, SF_DIR).collect()
    }
    names = {0: "view", 1: "click", 2: "signup"}
    for i, name in names.items():
        assert abs(got[name] - phi[i]) < 1e-5, (name, got[name], phi[i])
    # efficiency: shapley values sum to v(grand) - v(empty)
    total = rate((1, 1, 1)) - rate((0, 0, 0))
    assert abs(sum(phi.values()) - total) < 1e-12


def test_apportionment_sums_and_bounds(spark):
    rows = SPECS["q401_largest_remainder_alloc"].fn(spark, SF_DIR).collect()
    assert sum(r.seats for r in rows) == 1000
    for r in rows:
        # Hamilton quota property: |seats - exact quota| < 1
        assert abs(r.seats - r.exact_quota) < 1.0, r


def test_label_propagation_matches_pure_python(spark):
    """Pure-Python LPA differential (VERDICT r08 ask #4 'numpy
    differential' criterion): rebuild the capped co-purchase graph and
    replay 4 synchronous min-tie-break rounds with self-vote."""
    import collections

    li = load_table(spark, SF_DIR, "lineitem").collect()
    orders = {
        o.o_orderkey: o.o_custkey
        for o in load_table(spark, SF_DIR, "orders").collect()
    }
    groups = collections.defaultdict(set)
    for r in li:
        groups[(r.l_suppkey, r.l_shipdate.date())].add(orders[r.l_orderkey])
    edges = set()
    for members in groups.values():
        capped = sorted(members)[:64]
        for i, a in enumerate(capped):
            for b in capped[i + 1:]:
                edges.add((a, b))
    nbrs = collections.defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {v: v for v in nbrs}
    for _ in range(4):
        new = {}
        for v in nbrs:
            votes = collections.Counter(lab[u] for u in nbrs[v])
            votes[lab[v]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    census = collections.Counter(lab.values())
    expected = sorted(
        census.items(), key=lambda kv: (-kv[1], kv[0])
    )[:50]
    got = [
        (r.community, r.n_members)
        for r in SPECS["q381_label_propagation"].fn(spark, SF_DIR)
        .orderBy("rk").collect()
    ]
    assert got == expected, (got[:5], expected[:5])


def test_mcnemar_matches_pure_python(spark):
    rows = _events(spark)
    users: dict[int, list[int]] = {}
    for r in rows:
        h = users.setdefault(r.user_id, [0, 0])
        if r.event_type == "purchase" and r.value > 300:
            if _mday(r.ts) <= 15:
                h[0] = 1
            else:
                h[1] = 1
    b = sum(1 for h1, h2 in users.values() if h1 and not h2)
    c = sum(1 for h1, h2 in users.values() if h2 and not h1)
    row = SPECS["q384_mcnemar_paired"].fn(spark, SF_DIR).collect()[0]
    assert (row.only_first_half, row.only_second_half) == (b, c)
    assert row.n_users == len(users)
    if b + c > 0:
        chi2 = (abs(b - c) - 1.0) ** 2 / (b + c)
        assert abs(row.mcnemar_chi2_cc - chi2) < 1e-6
    else:
        assert row.mcnemar_chi2_cc is None


def test_poisson_rate_matches_formula(spark):
    rows = _events(spark)
    k = {"A": 0, "B": 0}
    t = {"A": 0, "B": 0}
    for r in rows:
        g = "A" if r.user_id % 2 == 0 else "B"
        t[g] += 1
        if r.event_type == "error":
            k[g] += 1
    kk = k["A"] + k["B"]
    w = t["A"] / (t["A"] + t["B"])
    z = (k["A"] - kk * w) / math.sqrt(kk * w * (1 - w))
    row = SPECS["q413_poisson_rate_test"].fn(spark, SF_DIR).collect()[0]
    assert (row.errors_a, row.errors_b) == (k["A"], k["B"])
    assert abs(row.z_score - z) < 1e-5
    assert abs(
        row.rate_ratio - (k["A"] / t["A"]) / (k["B"] / t["B"])
    ) < 1e-5


def test_woe_iv_matches_formula(spark):
    li = load_table(spark, SF_DIR, "lineitem").collect()
    part = {
        p.p_partkey: p.p_brand
        for p in load_table(spark, SF_DIR, "part").collect()
    }
    import collections

    nb = collections.Counter()
    ng = collections.Counter()
    for r in li:
        brand = part[r.l_partkey]
        if r.l_returnflag == "R":
            nb[brand] += 1
        else:
            ng[brand] += 1
    tb, tg = sum(nb.values()), sum(ng.values())
    got = {
        r.brand: (r.woe, r.information_value)
        for r in SPECS["q396_woe_iv"].fn(spark, SF_DIR).collect()
    }
    iv = 0.0
    for brand in set(nb) | set(ng):
        if nb[brand] == 0 or ng[brand] == 0:
            assert brand not in got
            continue
        woe = math.log((nb[brand] / tb) / (ng[brand] / tg))
        term = (nb[brand] / tb - ng[brand] / tg) * woe
        iv += math.floor(term * 1e9) / 1e9
        assert abs(got[brand][0] - woe) < 1e-5, brand
    for brand in got:
        assert abs(got[brand][1] - iv) < 1e-6


def test_permutation_entropy_matches_pure_python(spark):
    rows = sorted(
        _events(spark),
        key=lambda r: (
            r.user_id,
            _mday(r.ts) * 86400
            + r.ts.hour * 3600 + r.ts.minute * 60 + r.ts.second,
            r.event_id,
        ),
    )
    import collections

    pats = collections.Counter()
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(int(_r2(r.value * 100)))
    for vs in by_user.values():
        for v1, v2, v3 in zip(vs, vs[1:], vs[2:]):
            if v1 <= v2 <= v3:
                p = "012"
            elif v1 <= v3 < v2:
                p = "021"
            elif v2 < v1 <= v3:
                p = "102"
            elif v3 < v1 <= v2:
                p = "120"
            elif v2 <= v3 < v1:
                p = "201"
            else:
                p = "210"
            pats[p] += 1
    nn = sum(pats.values())
    ent = sum(
        math.floor(-(n / nn) * math.log(n / nn) * 1e9) / 1e9
        for n in pats.values()
    ) / math.log(6)
    got = {
        r.pattern: (r.n_triples, r.normalized_perm_entropy)
        for r in SPECS["q397_permutation_entropy"].fn(spark, SF_DIR).collect()
    }
    for p, n in pats.items():
        assert got[p][0] == n, (p, got[p][0], n)
        assert abs(got[p][1] - ent) < 1e-6


def test_t_closeness_matches_emd(spark):
    docs = load_table(spark, SF_DIR, "documents").collect()
    import collections

    cnt = collections.Counter()
    for d in docs:
        cnt[(d.lang, min(9, d.n_chars // 100))] += 1
    langs = {d.lang for d in docs}
    bins = sorted({b for _, b in cnt})
    nn = len(docs)
    got = {
        r.lang: r.emd_t_closeness
        for r in SPECS["q399_t_closeness"].fn(spark, SF_DIR).collect()
    }
    for lang in langs:
        nl = sum(c for (lg, _), c in cnt.items() if lg == lang)
        cl = cg = 0
        emd = 0
        for b in bins:
            cl += cnt.get((lang, b), 0)
            cg += sum(c for (lg, bb), c in cnt.items() if bb == b)
            emd += math.floor(abs(cl / nl - cg / nn) * 1e9)
        assert abs(got[lang] - emd / 1e9 / 10) < 1e-6, lang


def test_randomized_response_debias(spark):
    rows = _events(spark)
    import collections

    truth = collections.defaultdict(int)
    seen = {}
    for r in rows:
        seen.setdefault(r.user_id, 0)
        if r.event_type == "error":
            truth[r.user_id] = 1
    got = {
        r.cohort: r for r in
        SPECS["q400_randomized_response"].fn(spark, SF_DIR).collect()
    }
    coh = collections.defaultdict(lambda: [0, 0, 0])  # n, reported, true
    for uid in seen:
        t = truth.get(uid, 0)
        flip = hashlib.md5(str(uid * 7919).encode()).hexdigest()[0] < "4"
        rep = 1 - t if flip else t
        c = coh[uid % 3]
        c[0] += 1
        c[1] += rep
        c[2] += t
    for k, (n, rep, t) in coh.items():
        r = got[k]
        assert r.n_users == n
        assert abs(r.reported_rate - rep / n) < 1e-6
        assert abs(r.debiased_estimate - (rep / n - 0.25) / 0.5) < 1e-6
        assert abs(r.true_rate - t / n) < 1e-6


def test_var_cvar_matches_rank_selection(spark):
    orders = load_table(spark, SF_DIR, "orders").collect()
    cust = {
        c.c_custkey: c.c_mktsegment
        for c in load_table(spark, SF_DIR, "customer").collect()
    }
    import collections

    groups = collections.defaultdict(list)
    for o in orders:
        groups[cust[o.o_custkey]].append(
            (int(_r2(o.o_totalprice * 100)), o.o_orderkey)
        )
    got = {
        r.seg: r for r in SPECS["q424_var_cvar"].fn(spark, SF_DIR).collect()
    }
    for seg, vals in groups.items():
        vals.sort()
        n = len(vals)
        k = (n * 5 + 99) // 100
        var = vals[k - 1][0]
        cvar = sum(v for v, _ in vals[:k]) / k
        r = got[seg]
        assert r.n_orders == n
        assert abs(r.var_95 - var / 100) < 1e-9
        assert abs(r.cvar_95 - cvar / 100) < 1e-3


def test_conformal_coverage_close_to_nominal(spark):
    """Conformal's finite-sample guarantee: coverage ≥ 0.9 − O(1/n_cal)
    in expectation; assert the measured test coverage lands in a wide
    but meaningful band (a broken q̂ would sit near 0 or 1)."""
    row = SPECS["q415_conformal_interval"].fn(spark, SF_DIR).collect()[0]
    assert row.n_train > row.n_cal > 0 and row.n_test > 0
    assert 0.75 <= row.test_coverage <= 1.0, row.test_coverage


def test_xcorr_lag_zero_matches_numpy(spark):
    rows = _events(spark)
    import collections

    days = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        d = _mday(r.ts)
        if r.event_type == "view":
            days[d][0] += 1
        elif r.event_type == "purchase":
            days[d][1] += 1
    ds = sorted(days)
    x = np.array([days[d][0] for d in ds], dtype=float)
    y = np.array([days[d][1] for d in ds], dtype=float)
    want = np.corrcoef(x, y)[0, 1]
    got = {
        r.lag: r.xcorr
        for r in SPECS["q387_lead_lag_xcorr"].fn(spark, SF_DIR).collect()
    }
    assert abs(got[0] - want) < 1e-4, (got[0], want)


def test_hurst_rs_matches_pure_python(spark):
    rows = _events(spark)
    import collections

    hourly = collections.defaultdict(int)
    for r in rows:
        h = (_mday(r.ts) - 1) * 24 + r.ts.hour
        hourly[h] += int(_r2(r.value))
    got = SPECS["q398_hurst_rs"].fn(spark, SF_DIR).collect()[0]

    def avg_rs(m):
        blocks = collections.defaultdict(list)
        for h in sorted(hourly):
            blocks[h // m].append(hourly[h])
        out = []
        for ys in blocks.values():
            n = len(ys)
            if n < m * 3 / 4 or n < 2:
                continue
            mean = sum(ys) / n
            var = (sum(v * v for v in ys) - sum(ys) ** 2 / n) / n
            if var <= 0:
                continue
            cum, lo, hi = 0.0, float("inf"), float("-inf")
            for v in ys:
                cum += v - mean
                lo, hi = min(lo, cum), max(hi, cum)
            out.append(math.floor((hi - lo) / math.sqrt(var) * 1e6) / 1e6)
        return sum(out) / len(out), len(out)

    rs24, n24 = avg_rs(24)
    rs72, n72 = avg_rs(72)
    assert got.n_blocks_24h == n24 and got.n_blocks_72h == n72
    assert abs(got.rs_24h - rs24) < 1e-3
    assert abs(got.rs_72h - rs72) < 1e-3
    assert abs(got.hurst_exponent - math.log(rs72 / rs24) / math.log(3)) < 1e-4
