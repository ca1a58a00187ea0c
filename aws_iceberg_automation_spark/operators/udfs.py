"""UDF / UDAF / UDTF surface (SURVEY.md §2.12 #87-91).

Doctrine: UDFs are the slow path — every operator elsewhere in this
engine is JVM expressions. This module exists to prove the full Python
extension surface with the right defaults when you *must* cross:

- #87 scalar Python UDF: Arrow-batched (spark 4 default via
  ``spark.sql.execution.pythonUDF.arrow.enabled``), still ~row-wise —
  last resort.
- #88 pandas (vectorized) UDF: Series→Series over Arrow batches; numpy
  vectorization, 10-100× the scalar path.
- #89 grouped-agg pandas UDF: usable inside agg()/over().
- #90 grouped-map applyInPandas: per-group DataFrame→DataFrame (UDTF
  shape; mapInPandas lives in multimodal.py).
- #91 SQL registration: spark.udf.register so SQL surfaces reach it.

Oracle note: numpy reductions are pairwise (not sequential), so UDF
outputs are rounded on both sides rather than compared exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..functions.compat import ts_sec
from ..io import load_table
from ..registry import register


@F.pandas_udf(DoubleType())
def vec_norm_udf(emb: pd.Series) -> pd.Series:
    """#88: vectorized L2 norm of ARRAY<FLOAT> via numpy per Arrow batch."""
    import numpy as np

    return emb.map(lambda v: float(np.sqrt(np.dot(v, v))))


@F.pandas_udf(DoubleType())
def grouped_mean_positive(v: pd.Series) -> float:  # type: ignore[misc]
    """#89: grouped-agg pandas UDF — mean of positive values per group."""
    pos = v[v > 0]
    return float(pos.mean()) if len(pos) else 0.0


@register(
    "q88_pandas_udf_vecnorm",
    oracle="""
SELECT vec_id,
  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6)
    AS l2_norm
FROM embeddings
""",
    tags=("udf", "vector"),
)
def q88_pandas_udf_vecnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (#88): per-batch numpy norms; rounded since
    numpy's pairwise reduction ≠ sequential fold at the last ulp."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(vec_norm_udf("embedding"), 6).alias("l2_norm"))


@register(
    "q89_grouped_agg_udf",
    oracle="""
SELECT l_returnflag,
  round(avg(l_extendedprice) FILTER (WHERE l_extendedprice > 0), 4) AS mean_positive
FROM lineitem GROUP BY l_returnflag
""",
    tags=("udf",),
)
def q89_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (#89) inside a regular agg()."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(grouped_mean_positive("l_extendedprice"), 4).alias("mean_positive")
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """#90 kernel: z-score normalize order totals within a priority
    class (population stddev; ddof=0 matches SQL stddev_pop)."""
    mu = pdf["o_totalprice"].mean()
    sd = pdf["o_totalprice"].std(ddof=0)
    out = pdf[["o_orderkey", "o_orderpriority"]].copy()
    # Degenerate group (sd == 0) → NaN, matching the oracle's
    # NULLIF(stddev_pop, 0) NULL (NULL and NaN unify in float64).
    z = (
        (pdf["o_totalprice"] - mu) / sd
        if sd > 0
        else pd.Series(float("nan"), index=pdf.index)
    )
    out["zscore"] = z.round(4)
    return out


@register(
    "q90_apply_in_pandas",
    oracle="""
SELECT o_orderkey, o_orderpriority,
  round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
        / NULLIF(stddev_pop(o_totalprice) OVER (PARTITION BY o_orderpriority), 0), 4)
    AS zscore
FROM orders
""",
    tags=("udf",),
)
def q90_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (#90): whole-group pandas transform —
    the shape for per-group model scoring / custom normalization. Each
    group must fit in one worker's memory: partition keys at scale are
    chosen with that bound in mind."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").applyInPandas(
        _zscore_group, schema="o_orderkey long, o_orderpriority string, zscore double"
    )


@register(
    "q91_sql_registered_udf",
    oracle="""
SELECT doc_id,
  CAST(round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) * 100, 0) AS BIGINT)
    AS verbosity_centi
FROM documents
""",
    tags=("udf",),
)
def q91_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-registered Python UDF (#91): register once, call from SQL —
    how notebook/SQL users reach Python logic. Arrow-batched scalar UDF
    (#87's path, with the batching that makes it tolerable). The kernel
    rounds half-away (Decimal ROUND_HALF_UP) — Python's built-in round
    is banker's rounding, which SQL engines don't use.

    Gotcha pinned by the registry-wide plan lint: ``spark.udf.register
    (name, fn, "type")`` ignores ``spark.sql.execution.pythonUDF.arrow.
    enabled`` and plans row-at-a-time BatchEvalPython; only registering
    an explicit ``F.udf(..., useArrow=True)`` object plans the
    Arrow-batched ArrowEvalPython."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udf_view")

    def verbosity_centi(text: str) -> int:
        from decimal import ROUND_HALF_UP, Decimal

        ratio = len(text) / len(text.split(" ")) * 100
        return int(Decimal(ratio).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    spark.udf.register(
        "verbosity_centi", F.udf(verbosity_centi, "bigint", useArrow=True)
    )
    return spark.sql(
        "SELECT doc_id, verbosity_centi(text) AS verbosity_centi FROM docs_udf_view"
    )


@register(
    "q123_udtf_sentences",
    oracle="""
WITH parts AS (
  SELECT doc_id,
         string_split(text, '. ') AS ps
  FROM documents WHERE doc_id < 500
)
SELECT doc_id,
       CAST(i AS INTEGER) AS sentence_idx,
       trim(ps[i]) AS sentence,
       CAST(len(string_split(trim(ps[i]), ' ')) AS INTEGER) AS n_tokens
FROM parts, UNNEST(range(1, len(ps) + 1)) AS t(i)
WHERE trim(ps[i]) <> ''
""",
    tags=("udf",),
)
def q123_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+): one input row → N
    output rows with their own schema — the lateral-view shape for
    tokenize/chunk/expand kernels that don't fit a scalar UDF. Arrow-
    batched via spark.sql.execution.pythonUDTF.arrow.enabled (session
    default here); the plan must show ArrowEvalPythonUDTF, never the
    pickled row path — the registry-wide lint enforces it. The same
    split is expressible with explode() in pure JVM (q68's pattern);
    the UDTF exists for the kernels that are NOT — stateful chunkers,
    tokenizer libraries — with sentence-split as the verifiable stand-in.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_tokens int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(". "), start=1):
                s = raw.strip()
                if s:
                    yield i, s, len(s.split(" "))

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 500
    ).createOrReplaceTempView("docs_udtf_view")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_tokens
        FROM docs_udtf_view d, LATERAL sentence_split(d.text) s
        """
    )


@register(
    "q150_udtf_dynamic_schema",
    oracle="""
SELECT event_id,
  CAST(props->>'$.k' AS INT) AS k,
  CAST(NULL AS INT) AS missing
FROM events
WHERE event_id < 2000
""",
    tags=("udf",),
)
def q150_udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a dynamic output schema (Spark 4 ``analyze``):
    the table function's columns are COMPUTED AT PLAN TIME from its
    constant argument — here ``'k,missing'`` pivots those JSON keys
    into one INT column each (absent keys → NULL column). This is the
    mechanism behind schema-on-read table functions (CSV header
    inference, key pivoting, feature expansion) where the schema cannot
    be hardcoded in the decorator: ``analyze`` runs once on the driver
    with foldable-argument values, the returned StructType becomes the
    plan's output schema, and the Arrow-batched ``eval`` then emits
    rows against it. Same lateral shape and lint guarantees as q123."""
    import json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class JsonPivot:
        @staticmethod
        def analyze(props: AnalyzeArgument, keys: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for k in str(keys.value).split(","):
                schema = schema.add(k.strip(), IntegerType())
            return AnalyzeResult(schema=schema)

        def eval(self, props: str, keys: str):
            d = json.loads(props) if props else {}
            vals = []
            for k in keys.split(","):
                v = d.get(k.strip())
                vals.append(int(v) if v is not None else None)
            yield tuple(vals)

    spark.udtf.register("json_pivot", udtf(JsonPivot))
    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 2000
    ).createOrReplaceTempView("events_udtf_view")
    return spark.sql(
        """
        SELECT e.event_id, p.k, p.missing
        FROM events_udtf_view e,
        LATERAL json_pivot(e.props, 'k,missing') p
        """
    )


@register(
    "q152_arrow_native_kernel",
    oracle="""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  md5(text) AS content_hash
FROM documents
""",
    tags=("udf",),
)
def q152_arrow_native_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the rawest sanctioned Python boundary: batches
    arrive as ``pyarrow.RecordBatch`` and the kernel runs *vectorized
    Arrow compute* (C++ kernels) with no pandas materialization at all.
    This is the shape for columnar feature extractors and tokenizer
    libraries that speak Arrow natively — one copy less than a pandas
    UDF, zero Python-loop rows. The verifiable stand-in computes byte
    length / token count / content hash per document; the oracle proves
    the Arrow path is value-identical to plain SQL."""
    import hashlib
    from collections.abc import Iterator

    import pyarrow as pa

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            n_bytes = pc.binary_length(text)
            n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
            # Arrow has no md5 kernel; hash per value via hashlib on the
            # raw buffer view (still batch-at-a-time, no pandas)
            hashes = pa.array(
                [
                    hashlib.md5(t.encode()).hexdigest() if t is not None else None
                    for t in text.to_pylist()
                ],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(n_tokens, pa.int64()),
                    hashes,
                ],
                names=["doc_id", "n_bytes", "n_tokens", "content_hash"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        kernel,
        "doc_id bigint, n_bytes bigint, n_tokens bigint, content_hash string",
    )


@register(
    "q295_clamped_running_balance",
    oracle="""
WITH RECURSIVE ev AS (
  SELECT user_id,
    CAST(round(value * 100) AS BIGINT)
      * (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END) AS delta,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY date_trunc('second', ts), event_id) AS rn
  FROM events WHERE event_type IN ('purchase', 'error')
), walk AS (
  SELECT user_id, rn, greatest(delta, 0) AS bal,
    CAST(CASE WHEN delta < 0 THEN 1 ELSE 0 END AS BIGINT) AS n_clamped
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
    greatest(w.bal + e.delta, 0),
    w.n_clamped + CASE WHEN w.bal + e.delta < 0 THEN 1 ELSE 0 END
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, bal AS balance_cents, n_clamped
FROM walk w
WHERE rn = (SELECT max(rn) FROM ev e2 WHERE e2.user_id = w.user_id)
""",
    tags=("udf", "behavioral"),
)
def q295_clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance with a floor at zero — credits ('purchase')
    add, debits ('error') subtract, and the balance CLAMPS at 0 (a
    prepaid wallet / inventory / quota shape). The clamp makes each
    step depend non-linearly on the previous one, so NO window
    function expresses it — this is the canonical case for a per-key
    imperative kernel: deltas are computed JVM-side in integer cents
    (exact, engine-identical rounding), then one Arrow-batched
    ``applyInPandas`` walks each user's sequence in a tight loop.
    The DuckDB oracle replays the same walk as a RECURSIVE CTE — a
    genuinely non-SQL-expressible-in-Spark operator with a full value
    oracle, not a rows-only waiver.

    Scale shape: one hash partition per user key, O(events-per-user)
    memory inside the kernel (a generator over Arrow batches per
    group), no driver collect; at 100 TB the only constraint is the
    usual stateful one — a single user's history must fit a task."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "event_id",
            ts_sec("ts").cast("string").alias("tsec"),
            (
                F.round(F.col("value") * 100).cast("long")
                * F.when(F.col("event_type") == "purchase", 1).otherwise(-1)
            ).alias("delta"),
        )
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tsec", "event_id"])
        bal, clamps = 0, 0
        for d in pdf["delta"]:
            nb = bal + int(d)
            if nb < 0:
                nb = 0
                clamps += 1
            bal = nb
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "balance_cents": [bal],
                "n_clamped": [clamps],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        walk, schema="user_id long, balance_cents long, n_clamped long"
    )
