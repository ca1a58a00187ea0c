"""Join operators (SURVEY.md §2.4 #28-34, #37).

Scale posture (100 TB): dimension tables (region/nation/customer at
TPC-H ratios, any side < ~200 MB) are broadcast — explicitly where we
know (``F.broadcast``), otherwise via AQE's runtime size estimate. Fact-
fact joins shuffle on the join key; at 1000 executors that is the plan
you want (hash-partitioned SMJ/SHJ), with AQE skew-split handling hot
keys. Non-equi joins never run as bare BroadcastNestedLoop against a
big probe side unless the build side is tiny (here: a 4-row band dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import SQL_DISC_PRICE, dec2, disc_price, dsum, sql_dsum
from ..io import load_table
from ..registry import register


@register(
    "q28_inner_equi_join",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 150000.0
""",
    tags=("join", "bench"),
)
def q28_inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (#28): fact⋈fact on the natural key. Catalyst
    picks SMJ/SHJ; at sf0.01 AQE converts to broadcast-hash since the
    filtered orders side is tiny. Filter pushes below the join."""
    li, o = load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").where(
        F.col("o_totalprice") > 150000.0
    ).select("l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice")


@register(
    "q29_outer_joins",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
  ON c.c_custkey = o.o_custkey AND c.c_acctbal > 0.0
""",
    tags=("join",),
)
def q29_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (#29) with null-producing rows on both sides
    (left/right outer are the two halves of this plan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    cond = (c.c_custkey == o.o_custkey) & (c.c_acctbal > 0.0)
    return c.join(o, cond, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q30_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
    tags=("join",),
)
def q30_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join / EXISTS (#30): returns each customer at most once
    — no fact-side fan-out, so the shuffle carries only distinct keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q31_anti_join",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
    tags=("join",),
)
def q31_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join / NOT EXISTS (#31): customers with no URGENT
    order. The right side is filtered because the fixture generator
    gives every customer at least one order — the unfiltered anti join
    returned the empty set, a vacuous oracle comparison."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q32_broadcast_dim_join",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       COUNT(*) AS customers,
       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS VARCHAR) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    tags=("join", "bench"),
)
def q32_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join (#32): nation/region are broadcast
    explicitly — zero shuffle for the joins; only the final aggregate
    exchanges data. The canonical snowflake pattern at any scale."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(dec2("c_acctbal")).cast("decimal(38,2)").cast("string").alias("total_acctbal"),
        )
    )


@register(
    "q33_range_band_join",
    oracle=f"""
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0.0, 20000.0), ('mid', 20000.0, 60000.0),
         ('large', 60000.0, 90000.0), ('jumbo', 90000.0, 1e18)
)
SELECT b.band, COUNT(*) AS n_items,
  {sql_dsum(SQL_DISC_PRICE, "revenue", 6)}
FROM lineitem l JOIN bands b
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
""",
    tags=("join",),
)
def q33_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (#33): fact × tiny band dimension on interval
    predicates. The 4-row build side is broadcast, so the non-equi join
    is a BroadcastNestedLoop over a trivially small inner — the only
    safe shape for theta joins at scale (never NLJ two big sides; for
    big-big range joins, pre-bucket into coarse equi-keys — see #36)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [
            ("small", 0.0, 20000.0),
            ("mid", 20000.0, 60000.0),
            ("large", 60000.0, 90000.0),
            ("jumbo", 90000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(disc_price(), "revenue", 6),
        )
    )


@register(
    "q34_cross_join",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
WHERE n.n_regionkey <> r.r_regionkey
""",
    tags=("join",),
)
def q34_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (#34), guarded: both sides are bounded dimensions
    (5×25). Cross joins over unbounded inputs are a bug, not an operator
    — the similarity operators (#83) always LSH/bucket-prune first."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).filter(F.col("n_regionkey") != F.col("r_regionkey")).select(
        "r_name", "n_name"
    )


@register(
    "q37_star_join_revenue",
    oracle=f"""
SELECT n.n_name AS nation,
  {sql_dsum(SQL_DISC_PRICE, "revenue", 6)},
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    tags=("join", "bench"),
)
def q37_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (#37, TPC-H Q5 shape): one shuffle join on the
    fact keys (lineitem⋈orders), everything else broadcast; region
    filter prunes before joining. AQE reorders/locally-optimizes the
    chain at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(disc_price(), "revenue", 6), F.count(F.lit(1)).alias("n_lineitems"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_expr=None,
) -> DataFrame:
    """Hot-key join salting (the join-side generalization of q38b's
    salted aggregation): the left (skewed) side gets a deterministic
    salt in [0, n_salt); the right side is replicated once per salt via
    an explode — so a single hot key's rows spread across ``n_salt``
    reduce partitions instead of landing on one straggler executor.
    Wire cost: |right| × n_salt extra rows — only worth it when the
    right side is too big to broadcast AND the key histogram is spiky
    (otherwise let AQE's skew-split handle it; this is the explicit
    tool for when the skew is known up front, e.g. the null-key or
    boilerplate-content hot spots in crawl corpora).

    ``salt_expr`` defaults to a hash of the whole left row — any
    expression with good spread works and determinism keeps reruns
    stable."""
    salt = (
        F.pmod(salt_expr if salt_expr is not None else F.hash(*left.columns), n_salt)
    ).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_s.join(r_s, [key, "__salt"]).drop("__salt")


@register(
    "q124_salted_hot_join",
    oracle=f"""
SELECT d.flag_desc, COUNT(*) AS n_items, {sql_dsum(SQL_DISC_PRICE, "revenue", 6)}
FROM lineitem l
JOIN (SELECT 'A' AS l_returnflag, 'accepted' AS flag_desc
      UNION ALL SELECT 'N', 'none'
      UNION ALL SELECT 'R', 'returned') d
  ON l.l_returnflag = d.l_returnflag
GROUP BY d.flag_desc
""",
    tags=("join",),
)
def q124_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-case key skew: the whole fact table joins on a 3-value key
    (every key is hot). The salted join spreads each key across 8
    partitions; the oracle computes the same result with a plain join,
    proving salting is semantics-free. In production this exact shape
    is hit by null-bucket keys and boilerplate-content hashes."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "none"), ("R", "returned")],
        "l_returnflag string, flag_desc string",
    )
    joined = salted_join(li, dim, "l_returnflag", n_salt=8)
    return joined.groupBy("flag_desc").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(disc_price(), "revenue", 6),
    )


@register(
    "q284_bucketed_join",
    oracle=f"""
SELECT c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {sql_dsum("o_totalprice", "sum_price")}
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("join", "layout", "bench"),
)
def q284_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed layout (the scale
    axis' "bucketing for co-located joins", driver-attested): write
    orders AND customer as managed tables bucketed 16 ways on the
    customer key (sources/bucketing.write_bucketed — bucket spec lives
    in the catalog), join on that key, and FAIL LOUDLY unless the bare
    join plans ZERO shuffle exchanges — the property that turns a
    recurring fact-dim join at 100 TB from a 2×-table network event
    into a bucket-local merge. The rollup after the join shuffles only
    the joined rows' mktsegment aggregate, which any physical layout
    pays.

    The oracle checks the VALUES (bucketed scan ≡ plain scan); the
    in-query exchange_count assertion checks the PLAN — together the
    hash row proves the layout path is both wired and correct."""
    from ..sources.bucketing import (
        bucketed_join,
        exchange_count,
        write_bucketed,
    )

    # Per-SESSION names + stale-copy GC (round-6 review finding, then
    # hardened): within a session, repeated invocations (bench ×3,
    # plan_report) OVERWRITE one copy; a FRESH session gets a new
    # applicationId-derived name — a truly fixed name would collide
    # with the on-disk location left by a previous session that the
    # new in-memory catalog knows nothing about (LOCATION_ALREADY_
    # EXISTS). Stale q284_* directories from prior sessions are
    # removed here, so warehouse growth is bounded at one table pair.
    # Spark gate processes never run concurrently (the q196 rule).
    import os as _os
    import shutil as _shutil

    tag = spark.sparkContext.applicationId.replace("-", "_").lower()
    t_orders, t_cust = f"q284_orders_{tag}", f"q284_customer_{tag}"
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file:")
    if _os.path.isdir(wh):
        for name in _os.listdir(wh):
            if name.startswith("q284_") and not name.endswith(tag):
                _shutil.rmtree(_os.path.join(wh, name), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # r11 (guide §2.6 — overlap independent jobs): the two bucketed
    # writes are independent; submitting them from a two-thread pool
    # lets the small customer write back-fill executor slots the
    # orders write's tail leaves idle, instead of paying the two jobs'
    # walls sequentially. inheritable_thread_target propagates the
    # driver thread's job-group/description locals per Spark docs.
    # A/B at sf0.1 (min-of-4, interleaved, same session):
    # 1.21 s sequential -> 0.88 s threaded. The in-query zero-exchange
    # assertion below is untouched.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    @inheritable_thread_target
    def _write(args) -> None:
        df, name = args
        write_bucketed(df, name, "k")

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _write,
                [
                    (o.withColumnRenamed("o_custkey", "k"), t_orders),
                    (c.withColumnRenamed("c_custkey", "k"), t_cust),
                ],
            )
        )
    joined = bucketed_join(spark, t_orders, t_cust, "k")
    n_ex = exchange_count(joined)
    if n_ex != 0:
        raise RuntimeError(
            f"bucketed join planned {n_ex} shuffle exchanges — the "
            "co-located layout was not honored (bucket counts differ, "
            "or spark.sql.sources.bucketing.enabled is off)"
        )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum(dec2("o_totalprice"), "sum_price"),
    )


def _q345_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    def pos(inner: str, i: int) -> str:
        return (
            sql_portable_hash64(f"CAST({inner} AS VARCHAR) || '#b{i}'")
            + " % 16380"
        )

    build_pos = " UNION ALL ".join(
        f"SELECT {pos('o_orderkey', i)} AS pos FROM f" for i in (0, 1)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT k, {pos('k', i)} AS pos FROM probe" for i in (0, 1)
    )
    return f"""
WITH f AS (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
), build AS ({build_pos}),
words AS (
  SELECT CAST(pos / 63 AS BIGINT) AS word,
    CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS BIGINT)
      AS mask
  FROM (SELECT CAST(floor(pos) AS BIGINT) AS pos FROM build)
  GROUP BY CAST(pos / 63 AS BIGINT)
), probe AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem
), pp AS ({probe_pos}),
hits AS (
  SELECT pp.k, COUNT(*) AS nbits
  FROM pp JOIN words ON words.word = CAST(pp.pos / 63 AS BIGINT)
  WHERE (mask & (CAST(1 AS BIGINT) << CAST(pp.pos % 63 AS INT))) <> 0
  GROUP BY pp.k
), passed AS (SELECT k FROM hits WHERE nbits = 2),
exact AS (SELECT DISTINCT p.k FROM probe p JOIN f ON f.o_orderkey = p.k),
m AS (
  SELECT CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_build,
    CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probe,
    CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_true,
    CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_pass
)
SELECT n_build, n_probe, n_true, n_pass,
  round(CAST(n_pass - n_true AS DOUBLE) / (n_probe - n_true), 6) AS fpr,
  (CAST(n_pass - n_true AS DOUBLE) / (n_probe - n_true)
     <= 1.5 * pow(1.0 - exp(-2.0 * n_build / 16380), 2) + 0.001)
    AS fpr_ok
FROM m
"""


@register(
    "q345_bloom_semijoin",
    oracle=_q345_oracle(),
    tags=("join", "sketch"),
)
def q345_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning — the classic pre-shuffle
    runtime filter (what Spark's own InjectRuntimeFilter does
    internally, here built as an explicit, persistable operator): the
    selective build side (urgent orders) condenses into a 16380-bit /
    2-hash Bloom bitmap — 260 int64 words via one hash agg — which
    broadcasts to the probe side and drops non-members BEFORE any
    shuffle of the 100 TB fact table. The census proves the contract:
    zero false negatives by construction (every true member passes,
    asserted via n_pass ≥ n_true in the fpr arithmetic), and the
    false-positive rate lands within 1.5× of the (1−e^{{-kn/m}})^k
    theory bound — the bound is computed from the SAME integers on
    both engines, so the boolean stays meaningful even when a bigger
    sf saturates the fixed-size demo filter.

    Portable md5 hashing → DuckDB rebuilds the bitmap word-for-word;
    production swaps xxhash64 (the q71b rule). 63 usable bits per
    word keep 1<<bit positive in both engines' signed int64.

    Scale shape: build = hash agg to 260 words; probe = distinct keys
    + broadcast-join membership test — the fact side never shuffles
    on the build side's account."""
    from ..functions.compat import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    f = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")

    def positions(df: DataFrame, key: str) -> DataFrame:
        parts = [
            df.select(
                F.col(key).alias("k"),
                (
                    portable_hash64(
                        F.concat(
                            F.col(key).cast("string"), F.lit(f"#b{i}")
                        )
                    )
                    % 16380
                ).alias("pos"),
            )
            for i in (0, 1)
        ]
        return parts[0].unionAll(parts[1])

    build = positions(f, "o_orderkey")
    words = (
        build.select(
            (F.col("pos") / 63).cast("bigint").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 63 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").cast("bigint").alias("mask"))
    )
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    pp = positions(probe, "k").withColumn(
        "word", (F.col("pos") / 63).cast("bigint")
    )
    hits = (
        pp.join(F.broadcast(words), "word")
        .filter(
            F.expr("(mask & shiftleft(1L, CAST(pos % 63 AS INT))) <> 0")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nbits"))
    )
    passed = hits.filter(F.col("nbits") == 2).select("k")
    exact = probe.join(F.broadcast(f), probe.k == f.o_orderkey, "left_semi")
    m = (
        f.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
        .crossJoin(
            F.broadcast(
                probe.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
            )
        )
        .crossJoin(
            F.broadcast(
                exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
            )
        )
        .crossJoin(
            F.broadcast(
                passed.agg(F.count(F.lit(1)).cast("bigint").alias("n_pass"))
            )
        )
    )
    fpr = (F.col("n_pass") - F.col("n_true")).cast("double") / (
        F.col("n_probe") - F.col("n_true")
    )
    theory = 1.5 * F.pow(
        F.lit(1.0) - F.exp(F.lit(-2.0) * F.col("n_build") / F.lit(16380)),
        2,
    ) + F.lit(0.001)
    return m.select(
        "n_build",
        "n_probe",
        "n_true",
        "n_pass",
        F.round(fpr, 6).alias("fpr"),
        (fpr <= theory).alias("fpr_ok"),
    )


def _q377_oracle() -> str:
    from ..functions.compat import sql_portable_hash64

    hx = sql_portable_hash64("CAST(c_custkey AS VARCHAR) || '#gx'")
    hy = sql_portable_hash64("CAST(c_custkey AS VARCHAR) || '#gy'")
    return f"""
WITH pts AS (
  SELECT c_custkey AS id,
    ({hx} % 1000001) / 1000000.0 AS x,
    ({hy} % 1000001) / 1000000.0 AS y
  FROM customer
), pairs AS (
  SELECT a.id AS a_id, b.id AS b_id,
    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a JOIN pts b ON a.id < b.id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= 0.0004
)
SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_points,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(a_id + b_id) AS BIGINT) AS pair_id_checksum,
  round(SUM(sqrt(d2)) / COUNT(*), 6) AS avg_dist
FROM pairs
"""


@register(
    "q377_geo_grid_join",
    oracle=_q377_oracle(),
    tags=("join", "spatial"),
)
def q377_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join via GRID BUCKETING — the standard
    distributed spatial-join strategy (geohash/S2/H3 cell + neighbor
    probe): points within distance r = 0.02 of each other in the unit
    square, where the all-pairs O(n²) the ORACLE runs becomes, on the
    engine, an EQUI-join on grid cells of side r — each point probes
    only its half-plane neighborhood (one side exploded ×5 — the
    {(0,0),(1,0),(0,1),(1,1),(1,-1)} set whose nonzero members plus
    negations tile all 8 directions exactly once), so cost is
    n·(5·points-per-cell), not n².
    A hash match against the brute-force oracle proves the grid
    decomposition loses no pair (points near cell borders are exactly
    the ones a naive same-cell join drops).

    Coordinates are deterministic hash ratios — identical doubles on
    both engines; the distance threshold compares identically (exact
    same expression tree per side).

    Scale shape: map-side cell keys, explode ×9 on the probe side,
    shuffle on cell — at 100 TB the cell key IS the partitioner, and
    skew (dense cities) is handled by the same salting the LSH bucket
    caps use."""
    from ..functions.compat import portable_hash64

    c = load_table(spark, sf_dir, "customer")
    r = 0.02
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            (
                portable_hash64(
                    F.concat(F.col("c_custkey").cast("string"), F.lit("#gx"))
                )
                % 1000001
            )
            / 1000000.0
        ).alias("x"),
        (
            (
                portable_hash64(
                    F.concat(F.col("c_custkey").cast("string"), F.lit("#gy"))
                )
                % 1000001
            )
            / 1000000.0
        ).alias("y"),
    ).withColumn("cx", F.floor(F.col("x") / r).cast("long")).withColumn(
        "cy", F.floor(F.col("y") / r).cast("long")
    )
    # HALF-PLANE neighbor set: {(0,0),(1,0),(0,1),(1,1),(1,-1)} — its
    # nonzero members plus their negations tile all 8 neighbor
    # directions with no overlap, so every cross-cell pair is probed
    # exactly once in exactly one direction (id order normalized after
    # the match) and only the same-cell case needs the a<b dedup.
    # Cuts the probe fan-out from 9× to 5× (measured 1.9× at the 20×
    # replica: 28.7 s → 14.8 s) with set-identical output — pinned by the brute-force
    # parity test.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1), (1, -1))
        ]
    )
    probe = pts.select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).alias("same_cell"),
    )
    build = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cx",
        "cy",
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = (
        probe.join(build, ["cx", "cy"])
        .filter(
            F.when(F.col("same_cell"), F.col("a_id") < F.col("b_id"))
            .otherwise(F.col("a_id") != F.col("b_id"))
        )
        .filter(d2 <= r * r)
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            d2.alias("d2"),
        )
    )
    n_pts = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("a_id") + F.col("b_id"))
        .cast("bigint")
        .alias("pair_id_checksum"),
        F.round(F.sum(F.sqrt("d2")) / F.count(F.lit(1)), 6).alias("avg_dist"),
    ).crossJoin(F.broadcast(n_pts)).select(
        "n_points", "n_pairs", "pair_id_checksum", "avg_dist"
    )
