"""Control-plane tests: catalog DDL, partition lifecycle, crawler, jobs.

Mirrors the reference's end-to-end test strategy (SURVEY.md §5) with the
moto-mocked Glue replaced by a local Spark warehouse — and asserts on
outputs, not just exit codes.
"""

from __future__ import annotations

import time
import uuid

import pytest
from pyspark.sql import functions as F

from gluettalax_spark import jobs as jobs_mod
from gluettalax_spark.exceptions import (
    CrawlerNotFound,
    InvalidOption,
    JobConcurrentRunsExceeded,
    JobNotFound,
    JobTimeout,
    PartitionAlreadyExists,
    PartitionNotFound,
    TableNotFound,
)
from gluettalax_spark.plans import catalog as cat


@pytest.fixture()
def db(spark, tmp_path):
    name = f"db_{uuid.uuid4().hex[:8]}"
    cat.create_database(spark, name, location=str(tmp_path / name))
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS `{name}` CASCADE")


@pytest.fixture()
def usage_table(spark, db, tmp_path, sf_dir):
    """Partitioned 'usage' table over events rewritten Hive-style
    (FIXTURES.md §B): .../usage/year=YYYY/month=MM/part-*.parquet."""
    from gluettalax_spark.tables import load

    base = tmp_path / "usage"
    events = load(spark, sf_dir, "events").withColumn(
        "year", F.date_format("ts", "yyyy")
    ).withColumn("month", F.date_format("ts", "MM"))
    events.write.partitionBy("year", "month").mode("overwrite").parquet(str(base))
    cat.create_external_table(
        spark,
        db,
        "usage",
        str(base),
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING",
        partition_keys=["year", "month"],
    )
    return str(base)


def test_partition_lifecycle(spark, db, usage_table):
    # Initially no partitions registered (external table, no recovery yet).
    parts = cat.list_partitions(spark, db, "usage")
    assert parts.partition_keys == ["year", "month"]
    assert parts.data == []

    loc = cat.add_partition(spark, db, "usage", {"year": "2024", "month": "01"})
    assert loc.rstrip("/").endswith("year=2024/month=01")

    # Duplicate → warning-class exception (CLI exit 0).
    with pytest.raises(PartitionAlreadyExists):
        cat.add_partition(spark, db, "usage", {"year": "2024", "month": "01"})

    # Data is readable through the registered partition.
    n = spark.sql(f"SELECT count(*) AS n FROM `{db}`.usage WHERE year='2024' AND month='01'").collect()[0].n
    assert n > 0

    parts = cat.list_partitions(spark, db, "usage")
    assert len(parts.data) == 1
    assert parts.data[0][:2] == ("2024", "01")
    assert parts.max_lengths[0] >= len("year")

    cat.delete_partition(spark, db, "usage", {"year": "2024", "month": "01"})
    with pytest.raises(PartitionNotFound):
        cat.delete_partition(spark, db, "usage", {"year": "2024", "month": "01"})


def test_partition_validation(spark, db, usage_table):
    with pytest.raises(InvalidOption):
        cat.add_partition(spark, db, "usage", {"year": "2024"})  # missing key
    with pytest.raises(InvalidOption):
        cat.add_partition(spark, db, "usage", {"year": "2024", "day": "01"})  # wrong key
    with pytest.raises(TableNotFound):
        cat.add_partition(spark, db, "nope", {"year": "2024"})
    assert cat.get_partition_values({"a": "1", "b": "2"}, ["b", "a"]) == ["2", "1"]


def test_add_partitions_by_location(spark, db, usage_table, tmp_path):
    result = cat.add_partitions_by_location(spark, db, "usage")
    assert len(result["added"]) > 0
    assert result["skipped"] == []
    # Re-run: everything already exists (idempotent, warning-not-error).
    again = cat.add_partitions_by_location(spark, db, "usage")
    assert again["added"] == []
    assert len(again["existed"]) == len(result["added"])
    # Full data readable through partitions.
    total = spark.table(f"`{db}`.usage").count()
    assert total > 0

    # A non-conforming dir is SKIPPED (reference bug fixed: it would
    # fall through and create a bogus partition).
    bogus = tmp_path / "usage" / "not_a_partition"
    bogus.mkdir(parents=True, exist_ok=True)
    (bogus / "data.txt").write_text("junk")
    res2 = cat.add_partitions_by_location(spark, db, "usage")
    assert any("not_a_partition" in d for d in res2["skipped"])


def test_positional_partition_layout(spark, db, tmp_path):
    """'not-Hive style': keys all named partition_* → location is the bare
    value path (gluettalax.py:463-465)."""
    base = tmp_path / "usage_pos"
    (base / "2024" / "01").mkdir(parents=True)
    cat.create_external_table(
        spark, db, "usage_pos", str(base), "event_id LONG",
        partition_keys=["partition_year", "partition_month"],
    )
    loc = cat.add_partition(
        spark, db, "usage_pos", {"partition_year": "2024", "partition_month": "01"}
    )
    assert loc.rstrip("/").endswith("usage_pos/2024/01")
    parts = cat.list_partitions(spark, db, "usage_pos")
    assert parts.data[0][:2] == ("2024", "01")


def test_derive_partition_location():
    assert (
        cat.derive_partition_location("/w/t", ["year", "month"], ["2024", "01"])
        == "/w/t/year=2024/month=01/"
    )
    assert (
        cat.derive_partition_location("/w/t/", ["partition_a", "partition_b"], ["x", "y"])
        == "/w/t/x/y/"
    )


def test_list_tables_glob(spark, db, usage_table):
    tables = cat.list_tables(spark)
    assert any(t.table_name == "usage" and t.database_name == db for t in tables)
    assert all(t.table_name == "usage" for t in cat.list_tables(spark, "usa*"))


def test_crawler(spark, db, tmp_path, sf_dir):
    from gluettalax_spark.tables import load

    cat.Crawler.clear_registry()
    base = tmp_path / "crawl_me"
    docs = load(spark, sf_dir, "documents").withColumn("lang2", F.col("lang"))
    docs.write.partitionBy("lang2").mode("overwrite").parquet(str(base))

    crawler = cat.Crawler(spark, "test_crawler", db, "crawled_docs", str(base))
    assert crawler.is_ready and crawler.status == "READY"
    crawler.run()
    assert crawler.is_ready

    df = spark.table(f"`{db}`.crawled_docs")
    assert df.count() == load(spark, sf_dir, "documents").count()
    # Partition column declared STRING (reference: values are strings).
    assert dict(df.dtypes)["lang2"] == "string"

    # Rerun path + registry lookups.
    cat.run_crawler("test_crawler", rerun=True, timeout=120)
    with pytest.raises(CrawlerNotFound):
        cat.Crawler.get("missing")
    assert [c.name for c in cat.Crawler.registered()] == ["test_crawler"]


# --------------------------------------------------------------------------
# Jobs
# --------------------------------------------------------------------------


@pytest.fixture()
def registry():
    reg = jobs_mod.JobRegistry()
    yield reg
    reg.clear()


def _pricing(spark, sf_dir="/root/testdata/sf0.001", **kargs):
    from gluettalax_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, sf_dir)


def test_job_sync_success_and_history(spark, registry):
    registry.register("nightly_etl", _pricing)
    assert registry.run(spark, "nightly_etl", THE_DATE="20191112") is True
    runs = registry.list_runs(spark, "nightly_etl")
    assert len(runs) == 1
    assert runs[0].state == "SUCCEEDED"
    assert runs[0].arguments == {"THE_DATE": "20191112"}
    assert registry.get_run_state(runs[0].run_id) == "SUCCEEDED"


def test_job_failure(spark, registry):
    def boom(spark, **kargs):
        raise ValueError("bad input")

    registry.register("bad_job", boom)
    assert registry.run(spark, "bad_job") is False
    runs = registry.list_runs(spark, "bad_job")
    assert runs[0].state == "FAILED"
    assert "bad input" in runs[0].error


def test_job_not_found(spark, registry):
    with pytest.raises(JobNotFound):
        registry.run(spark, "ghost")


def test_job_timeout(spark, registry):
    def slow(spark, **kargs):
        time.sleep(5)

    registry.register("slow_job", slow)
    with pytest.raises(JobTimeout):
        registry.run(spark, "slow_job", timeout=0.5)
    runs = registry.list_runs(spark, "slow_job")
    assert runs[0].state == "TIMEOUT"


def test_job_concurrency_limit(spark, registry):
    def slow(spark, **kargs):
        time.sleep(3)

    registry.register("limited", slow, max_concurrent_runs=1)
    run_id = registry.run(spark, "limited", op_async=True)
    assert isinstance(run_id, str)
    try:
        with pytest.raises(JobConcurrentRunsExceeded):
            registry.run(spark, "limited")
    finally:
        # Let the async run drain so the registry fixture can clear.
        deadline = time.monotonic() + 10
        while registry.get_run_state(run_id) == "RUNNING" and time.monotonic() < deadline:
            time.sleep(0.1)


def test_job_async_and_window_report(spark, registry):
    registry.register("a_job", _pricing)
    registry.register("b_job", _pricing)
    assert registry.run(spark, "a_job") is True
    assert registry.run(spark, "a_job") is True
    assert registry.run(spark, "b_job") is True
    # D7: last-1 run per job.
    last = registry.last_runs_per_job(spark, lines=1)
    assert [r.job_name for r in last] == ["a_job", "b_job"]
    # D5: exclude SUCCEEDED → empty.
    assert registry.list_runs(spark, include_succeeded=False) == []
    # D6: limit.
    assert len(registry.list_runs(spark, "a_job", lines=1)) == 1
    assert registry.list_jobs() == ["a_job", "b_job"]


def test_builtin_jobs_run_via_cli_registry(spark):
    """The shipped jobs are registered and runnable with reference-style
    string args (README: runj nightly_etl --THE_DATE=...)."""
    import gluettalax_spark.builtin_jobs as bj
    from gluettalax_spark.jobs import default_registry

    bj.register_builtin_jobs()
    assert {"nightly_etl", "dedup_report", "corpus_stats"} <= set(default_registry.list_jobs())
    df = bj.nightly_etl(spark, THE_DATE="19970101")
    rows = df.collect()
    assert rows and set(df.columns) == {
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order",
    }
    assert default_registry.run(spark, "corpus_stats") is True


def test_csv_external_catalog_table(spark, db, sf_dir, tmp_path):
    """Non-parquet formats register as catalog tables too (SURVEY §2.F
    scans row: 'csv/json/orc via same API; registered as catalog
    tables') — schema-on-read, queryable via SQL."""
    from gluettalax_spark.plans.catalog import create_external_table
    from gluettalax_spark.sources.io import write_table
    from gluettalax_spark.tables import load

    nation = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_table(nation, path, fmt="csv")
    create_external_table(
        spark, db, "nation_csv", path, fmt="csv",
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
        options={"header": "true"},
    )
    got = spark.sql(f"SELECT count(*) AS n FROM `{db}`.nation_csv").collect()[0].n
    assert got == nation.count()
    top = spark.sql(
        f"SELECT n_name FROM `{db}`.nation_csv WHERE n_regionkey = 0 ORDER BY n_nationkey"
    ).collect()
    want = [r.n_name for r in nation.filter("n_regionkey = 0").orderBy("n_nationkey").collect()]
    assert [r.n_name for r in top] == want


def test_crawler_sync_waits_for_running_crawl(spark, db, tmp_path, sf_dir):
    """rerun=False + crawler RUNNING: sync run() must WAIT for READY
    (reference gluettalax.py:220-224) instead of returning early; it must
    not start a second crawl. Async returns immediately."""
    import time as _time

    from gluettalax_spark.tables import load

    cat.Crawler.clear_registry()
    base = tmp_path / "crawl_wait"
    load(spark, sf_dir, "documents").write.mode("overwrite").parquet(str(base))
    crawler = cat.Crawler(spark, "wait_crawler", db, "crawled_wait", str(base))

    crawls = []
    orig = crawler._crawl

    def slow_crawl():
        crawls.append(1)
        _time.sleep(0.4)
        orig()

    crawler._crawl = slow_crawl
    crawler.run(op_async=True)  # leaves the crawler RUNNING
    t0 = _time.monotonic()
    crawler.run(rerun=False, timeout=30)  # sync: must block until READY
    assert crawler.is_ready
    assert _time.monotonic() - t0 > 0.1  # actually waited
    assert len(crawls) == 1  # and did NOT start a second crawl
