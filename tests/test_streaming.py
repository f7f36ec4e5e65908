"""Structured Streaming ingest: batch/stream parity + incremental manifest."""

import os

import pytest
from pyspark.sql import functions as F

from knowledge_graph_studio_spark.io.catalog import RunManifest
from knowledge_graph_studio_spark.pipeline import triples_from_pages
from knowledge_graph_studio_spark.sources.pages import synthetic_pages
from knowledge_graph_studio_spark.streaming.ingest import (
    first_seen_entities, mention_rollup, page_mentions_with_ts,
    run_incremental_build,
)

N_PAGES = 120


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "pages")
    # two "crawl segments" (separate files => separate stream micro-batch units)
    synthetic_pages(spark, N_PAGES // 2, seed=42, partitions=2).write.mode(
        "overwrite").parquet(path)
    (
        synthetic_pages(spark, N_PAGES, seed=42, partitions=2)
        .orderBy("url").offset(N_PAGES // 2)  # disjoint second half
        .coalesce(2).write.mode("append").parquet(path)
    )
    return path


def test_incremental_build_matches_batch(spark, pages_dir, tmp_path):
    workdir = str(tmp_path / "work")
    run_incremental_build(spark, pages_dir, workdir, max_files_per_trigger=2)

    got = spark.read.parquet(f"{workdir}/triples")
    batch = triples_from_pages(spark, spark.read.parquet(pages_dir))
    key = ["url", "chunk_id", "head", "relation", "tail"]
    g = {tuple(r) for r in got.select(*key).collect()}
    b = {tuple(r) for r in batch.select(*key).collect()}
    assert g == b and g, "streamed triples must equal batch triples"

    recs = [r for r in RunManifest(workdir, "stream0").records()
            if r["stage"] == "stream_extract"]
    assert recs and all(r["status"] == "committed" for r in recs)
    assert sum(r["triples_emitted"] for r in recs) == len(
        spark.read.parquet(f"{workdir}/triples").collect())
    assert os.path.isdir(f"{workdir}/_checkpoint")


def test_incremental_build_is_idempotent_on_rerun(spark, pages_dir, tmp_path):
    workdir = str(tmp_path / "work2")
    run_incremental_build(spark, pages_dir, workdir)
    n1 = spark.read.parquet(f"{workdir}/triples").count()
    # rerun with the same checkpoint: no new input -> no new rows
    run_incremental_build(spark, pages_dir, workdir)
    n2 = spark.read.parquet(f"{workdir}/triples").count()
    assert n1 == n2


def test_first_seen_entities_stateful(spark, pages_dir):
    """applyInPandasWithState: each entity is emitted exactly once across
    micro-batches, carrying its earliest event time in the emitting batch."""
    batch_pages = spark.read.parquet(pages_dir)
    all_entities = {
        (r["name"], r["type"])
        for r in page_mentions_with_ts(batch_pages)
        .select("name", "type").distinct().collect()
    }
    assert all_entities

    stream = spark.readStream.schema(batch_pages.schema).option(
        "maxFilesPerTrigger", 2).parquet(pages_dir)
    q = (
        first_seen_entities(page_mentions_with_ts(stream))
        .writeStream.format("memory").queryName("first_seen")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from first_seen").collect()
    got = [(r["name"], r["type"]) for r in rows]
    assert len(got) == len(set(got)), "an entity was emitted twice"
    assert set(got) == all_entities
    assert all(r["first_seen"] is not None and r["first_url"] for r in rows)


def test_mention_rollup_stream_equals_batch(spark, pages_dir, tmp_path):
    batch_pages = spark.read.parquet(pages_dir)
    batch_out = mention_rollup(page_mentions_with_ts(batch_pages))
    expected = {
        (r["window_start"], r["name"], r["type"]): r["mentions"]
        for r in batch_out.collect()
    }
    assert expected, "rollup must be non-empty"

    stream = (
        spark.readStream.schema(batch_pages.schema).parquet(pages_dir)
    )
    q = (
        mention_rollup(page_mentions_with_ts(stream))
        .writeStream.format("memory").queryName("rollup")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["name"], r["type"]): r["mentions"]
        for r in spark.sql("select * from rollup").collect()
    }
    assert got == expected
