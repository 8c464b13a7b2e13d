"""Generic source/sink round-trips: partitioned parquet layout control
and schema-first JSONL/CSV scans with corrupt-record capture."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ml_data_wrangler_spark.sources.readers import read_csv, read_jsonl
from ml_data_wrangler_spark.sources.sinks import write_partitioned_parquet


def test_partitioned_parquet_layout_and_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(k="a" if i % 2 == 0 else "b", v=i) for i in range(100)]
    ).repartition(16)  # deliberately over-parallel input
    out = str(tmp_path / "out")
    write_partitioned_parquet(df, out, ["k"], files_per_partition=1)
    # exactly one data file per partition value, hive-style dirs
    for k in ("a", "b"):
        files = [
            f for f in glob.glob(os.path.join(out, f"k={k}", "*"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, files
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_partitioned_parquet_multi_file(spark, tmp_path):
    df = spark.createDataFrame([Row(k="a", v=i) for i in range(1000)])
    out = str(tmp_path / "out")
    write_partitioned_parquet(df, out, ["k"], files_per_partition=4)
    files = [
        f for f in glob.glob(os.path.join(out, "k=a", "*"))
        if f.endswith(".parquet")
    ]
    assert 2 <= len(files) <= 4  # salted across up to 4 writers
    assert spark.read.parquet(out).count() == 1000
    with pytest.raises(ValueError):
        write_partitioned_parquet(df, out, ["k"], files_per_partition=0)


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def test_read_jsonl_captures_corrupt_lines(spark, tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{{{not json\n{"id": 2, "name": "also"}\n')
    df = read_jsonl(spark, str(p), SCHEMA).cache()  # see reader docstring
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 1


def test_read_csv_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("id,name\n1,ok\nnot_a_number,x\n2,also\n")
    df = read_csv(spark, str(p), SCHEMA).cache()  # see reader docstring
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 1


def test_read_csv_delimiter_and_headerless(spark, tmp_path):
    p = tmp_path / "feed.tsv"
    p.write_text("5\tfive\n6\tsix\n")
    df = read_csv(spark, str(p), SCHEMA, header=False, delimiter="\t")
    assert {(r["id"], r["name"]) for r in df.collect()} == {(5, "five"), (6, "six")}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from ml_data_wrangler_spark.sources.readers import read_orc
    from ml_data_wrangler_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [Row(k="a" if i % 2 == 0 else "b", v=i, s=f"x{i}") for i in range(100)]
    )
    out = str(tmp_path / "orc")
    write_orc(df, out, partition_by=["k"])
    back = read_orc(spark, out)
    assert back.count() == 100
    got = back.where((F.col("k") == "a") & (F.col("v") < 10)).select("v")
    assert sorted(r["v"] for r in got.collect()) == [0, 2, 4, 6, 8]
    # partition pruning: only the k=a directory is scanned
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan, plan


def test_text_lines_reader(spark, tmp_path):
    from ml_data_wrangler_spark.sources.readers import read_text_lines

    p = tmp_path / "corpus.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = read_text_lines(spark, str(p))
    assert [r["value"] for r in df.orderBy("value").collect()] == [
        "alpha", "beta", "gamma",
    ]
    assert all(r["file"].endswith("corpus.txt") for r in df.collect())


def test_read_table_normalizes_both_events_ts_layouts(spark, tmp_path):
    """The driver's testdata generator has stored events.ts as parquet
    TIMESTAMP(NANOS) (rounds 1-2) and as plain µs TIMESTAMP (round 3+).
    read_table must normalize BOTH physical layouts to the same
    session-tz TimestampType values."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ml_data_wrangler_spark.sources.readers import read_table

    ts_vals = [
        datetime.datetime(2026, 1, 1, 12, 0, 0, 123456),
        datetime.datetime(2026, 1, 2, 3, 4, 5, 654321),
    ]
    base = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["view", "click"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    results = []
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(base["event_id"], pa.int64()),
                "ts": pa.array(ts_vals, pa.timestamp(unit)),
                "user_id": pa.array(base["user_id"], pa.int64()),
                "event_type": pa.array(base["event_type"], pa.string()),
                "value": pa.array(base["value"], pa.float64()),
                "props": pa.array(base["props"], pa.string()),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        df = read_table(spark, str(d), "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
        results.append(
            [r["ts"] for r in df.orderBy("event_id").select("ts").collect()]
        )
    assert results[0] == results[1] == ts_vals


def test_read_parquet_evolving_merges_schema_generations(spark, tmp_path):
    from ml_data_wrangler_spark.sources.readers import read_parquet_evolving

    gen1 = spark.createDataFrame(
        [Row(doc_id=1, text="old row")],
    )
    gen2 = spark.createDataFrame(
        [Row(doc_id=2, text="new row", quality=0.9)],
    )
    gen1.write.parquet(str(tmp_path / "d" / "gen=1"))
    gen2.write.parquet(str(tmp_path / "d" / "gen=2"))
    df = read_parquet_evolving(spark, str(tmp_path / "d"))
    assert "quality" in df.columns
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["quality"] is None  # pre-evolution rows NULL-fill
    assert rows[2]["quality"] == 0.9


def test_corpus_shards_manifest_matches_written_data(spark, tmp_path):
    from ml_data_wrangler_spark.sources.sinks import write_corpus_shards_with_manifest

    df = spark.range(1, 501).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    out = str(tmp_path / "corpus")
    manifest = write_corpus_shards_with_manifest(
        df, out, id_col="doc_id", n_shards=4
    ).collect()
    assert [m["shard"] for m in manifest] == [0, 1, 2, 3]
    assert sum(m["n_rows"] for m in manifest) == 500
    # exactly one data file per shard (bounded-file-count contract)
    for m in manifest:
        files = [
            f
            for f in glob.glob(os.path.join(out, f"shard={m['shard']}", "*"))
            if not f.endswith((".crc", "_SUCCESS"))
        ]
        assert len(files) == 1, files
        assert files[0].endswith(".json.gz")
    # re-read what was written; recompute counts and the
    # order-independent content hash — must equal the manifest
    back = spark.read.json(os.path.join(out))
    assert back.count() == 500
    re_manifest = {
        r["shard"]: (r["n"], r["h"])
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.xxhash64(
                    F.to_json(F.struct(F.col("doc_id"), F.col("text")))
                ).cast("decimal(38,0)")
            ).cast("decimal(38,0)").alias("h"),
        )
        .collect()
    }
    for m in manifest:
        assert re_manifest[m["shard"]] == (m["n_rows"], m["content_hash"])


def test_corpus_shards_hash_distinguishes_null_position(spark, tmp_path):
    """Rows that differ only in WHICH column is NULL must hash
    differently (a positional xxhash64 over columns skips NULLs
    without advancing state and collides them — the canonical-JSON
    row hash must not)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ml_data_wrangler_spark.sources.sinks import write_corpus_shards_with_manifest

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("a", StringType()),
            StructField("b", StringType()),
        ]
    )
    m1 = write_corpus_shards_with_manifest(
        spark.createDataFrame([(1, "x", None)], schema),
        str(tmp_path / "m1"), id_col="doc_id", n_shards=1,
    ).collect()
    m2 = write_corpus_shards_with_manifest(
        spark.createDataFrame([(1, None, "x")], schema),
        str(tmp_path / "m2"), id_col="doc_id", n_shards=1,
    ).collect()
    assert m1[0]["content_hash"] != m2[0]["content_hash"]


def test_corpus_shards_empty_input(spark, tmp_path):
    """An empty corpus must produce an empty manifest (schema intact),
    not a crash — resume/retry flows hit this."""
    from ml_data_wrangler_spark.sources.sinks import write_corpus_shards_with_manifest

    df = spark.createDataFrame([], "doc_id long, text string")
    manifest = write_corpus_shards_with_manifest(
        df, str(tmp_path / "empty"), id_col="doc_id", n_shards=2
    )
    assert manifest.columns == ["shard", "n_rows", "content_hash"]
    assert manifest.count() == 0


def test_corpus_shards_validates_n_shards(spark, tmp_path):
    from ml_data_wrangler_spark.sources.sinks import write_corpus_shards_with_manifest

    df = spark.range(1, 5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        write_corpus_shards_with_manifest(df, str(tmp_path / "x"), "doc_id", 0)
