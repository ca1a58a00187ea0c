"""File source/sink tests (SURVEY §2.2): schema'd CSV/JSON round-trips
and layout-aware partitioned writes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_iceberg_automation_spark.io import SCHEMAS, load_table
from aws_iceberg_automation_spark.sources import files
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def test_json_roundtrip(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("json_rt"))
    # JSON has no timestamp type — serialize ts as ISO strings
    out = events.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    out.coalesce(2).write.mode("overwrite").json(d)
    back = files.read_json(spark, d, out.schema)
    assert back.count() == events.count()
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_csv_roundtrip(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csv_rt"))
    c = load_table(spark, SF_DIR, "customer")
    c.coalesce(1).write.mode("overwrite").option("header", "true").csv(d)
    back = files.read_csv(spark, d, SCHEMAS["customer"])
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, c.collect()))


def test_csv_failfast_on_malformed(spark, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment\nnot_a_number,x,1,2.0,SEG\n")
    with pytest.raises(Exception, match="(?i)malformed|failfast|cannot"):
        files.read_csv(spark, str(bad), SCHEMAS["customer"]).collect()


def test_partitioned_write_layout(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part_out"))
    day = events.withColumn("day", F.col("ts").cast("date").cast("string"))
    files.write_partitioned(day, d, partition_by=["day"], sort_within=["user_id", "ts"])
    dirs = sorted(x for x in os.listdir(d) if x.startswith("day="))
    assert len(dirs) == 30  # events span 2024-01-01..30
    back = spark.read.schema(day.schema).parquet(d)
    assert back.count() == events.count()
    # one task per partition value → no small-file explosion
    files_in_first = [
        f for f in os.listdir(os.path.join(d, dirs[0])) if f.endswith(".parquet")
    ]
    assert len(files_in_first) == 1


def test_cli_create_table_and_diagnose(tmp_path, capsys):
    from aws_iceberg_automation_spark import cli

    spec = tmp_path / "spec.yml"
    spec.write_text(
        f"""
database: cli_db
table: cli_demo
location: {tmp_path}/wh/cli_db/cli_demo
columns:
  - {{name: id, type: bigint}}
  - {{name: name, type: string}}
"""
    )
    assert cli.main(["create-table", str(spec)]) == 0
    out = capsys.readouterr().out
    assert "CREATE TABLE IF NOT EXISTS cli_db.cli_demo" in out

    assert cli.main(["diagnose"]) == 0
    assert "cli_db" in capsys.readouterr().out

    bad = tmp_path / "bad.yml"
    bad.write_text("database: x\ntable: y\ncolumns:\n  - {name: a, type: nope}\n")
    assert cli.main(["create-table", str(bad)]) == 1


def test_json_quarantine_splits_clean_and_corrupt(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from aws_iceberg_automation_spark.sources.files import read_json_quarantine

    p = tmp_path / "drop"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"id": 1, "t": "ok"}\n'
        '{"id": 2, "t": "also ok"}\n'
        '{"id": broken!!\n'
        "not json at all\n"
        '{"id": "type-mismatch", "t": "x"}\n'
    )
    schema = StructType([StructField("id", LongType()), StructField("t", StringType())])
    clean, quar = read_json_quarantine(spark, str(p), schema)
    assert clean.schema == schema
    assert sorted((r.id, r.t) for r in clean.collect()) == [
        (1, "ok"),
        (2, "also ok"),
    ]
    got_bad = sorted(r.raw_line for r in quar.collect())
    assert '{"id": broken!!' in got_bad
    assert "not json at all" in got_bad
    assert '{"id": "type-mismatch", "t": "x"}' in got_bad
    assert len(got_bad) == 3


def test_write_sized_hits_target_file_count(spark, tmp_path):
    import glob

    from aws_iceberg_automation_spark.io import load_table
    from aws_iceberg_automation_spark.sources.files import write_sized
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    out = str(tmp_path / "sized")
    # tiny target forces multiple files even on the small fixture
    info = write_sized(li, out, target_file_mb=1)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == info["n_files"]
    assert spark.read.parquet(out).count() == info["rows"]

    # huge target → single file
    out2 = str(tmp_path / "sized_one")
    info2 = write_sized(li, out2, target_file_mb=1024)
    assert info2["n_files"] == 1
    assert len(glob.glob(out2 + "/*.parquet")) == 1


def test_python_datasource_partitions_and_determinism(spark):
    """The custom Python DataSource must honor requested read
    parallelism and produce bit-identical rows on re-read."""
    from aws_iceberg_automation_spark.sources.pyds import (
        SyntheticEventsDataSource,
    )

    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass
    rd = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .option("n_partitions", 5)
        .option("seed", "t1")
    )
    df = rd.load()
    assert df.rdd.getNumPartitions() == 5
    a = sorted(df.collect())
    assert len(a) == 1000
    assert len({r.event_id for r in a}) == 1000
    b = sorted(rd.load().collect())
    assert a == b
    # different seed -> different stream
    c = rd.option("seed", "t2").load().collect()
    assert sorted(c) != a


def test_orc_round_trip_preserves_rows_and_pushdown(spark, tmp_path):
    """ORC write → schema'd read must round-trip values exactly, and a
    filtered read must push the predicate into the ORC scan."""
    from aws_iceberg_automation_spark.io import SCHEMAS, load_table
    from aws_iceberg_automation_spark.sources.files import read_orc, write_orc

    src = load_table(spark, SF_DIR, "region")
    path = str(tmp_path / "region_orc")
    write_orc(src, path)
    back = read_orc(spark, path, SCHEMAS["region"])
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(F.col("r_regionkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(r_regionkey), EqualTo(r_regionkey,1)]" in plan


def test_cli_orphans_and_corpus_report(spark, tmp_path, capsys):
    """CLI: orphans lists/removes stranded files; corpus-report prints
    the datasheet JSON."""
    import json as _json

    from aws_iceberg_automation_spark.cli import main
    from aws_iceberg_automation_spark.versioning import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "cli_orph"))
    vt.write(spark.range(3).selectExpr("id", "id * 2 AS v"))
    import os as _os

    stranded = str(tmp_path / "cli_orph" / "data" / "v9" / "x.parquet")
    _os.makedirs(_os.path.dirname(stranded))
    open(stranded, "wb").write(b"junk")

    capsys.readouterr()  # drain anything earlier in the test
    # default age guard hides the fresh stranded file
    assert main(["orphans", vt.root]) == 0
    assert _json.loads(capsys.readouterr().out)["count"] == 0
    assert main(["orphans", vt.root, "--older-than", "0"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["count"] == 1 and out["orphans"] == [stranded]
    assert main(["orphans", vt.root, "--remove", "--older-than", "0"]) == 0
    assert not _os.path.exists(stranded)
    capsys.readouterr()

    assert main(["corpus-report", "--sf-dir", SF_DIR]) == 0
    rep = _json.loads(capsys.readouterr().out)
    assert rep["sf_dir"] == SF_DIR
    assert sum(c["n_docs"] for c in rep["cells"]) > 0


def test_bucketed_join_eliminates_shuffle(spark):
    """Differential proof of the co-located-join layout: the identical
    custkey join plans two shuffle exchanges on plain parquet inputs
    and ZERO on same-bucket-count bucketed tables (broadcast disabled
    so the comparison is SMJ vs SMJ)."""
    import uuid

    from aws_iceberg_automation_spark.io import load_table
    from aws_iceberg_automation_spark.sources.bucketing import (
        bucketed_join,
        exchange_count,
        write_bucketed,
    )
    from tests.conftest import SF_DIR

    db = f"buckets_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, SF_DIR, "orders")
        cust = load_table(spark, SF_DIR, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        write_bucketed(orders, f"{db}.orders_b", "o_custkey", n_buckets=4)
        write_bucketed(cust, f"{db}.cust_b", "o_custkey", n_buckets=4)

        plain = orders.join(cust, "o_custkey")
        assert exchange_count(plain) >= 2, "unbucketed join must shuffle"

        co = bucketed_join(spark, f"{db}.orders_b", f"{db}.cust_b", "o_custkey")
        assert exchange_count(co) == 0, "bucketed join must not shuffle"
        # same answer either way
        assert co.count() == plain.count()

        # groupBy on the bucket key is shuffle-free too
        agg = spark.table(f"{db}.orders_b").groupBy("o_custkey").count()
        assert exchange_count(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP DATABASE {db} CASCADE")
