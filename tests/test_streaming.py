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


# --- streaming incremental dedup (bloom) -----------------------------------


def test_streaming_dedup_across_segments(spark, tmp_path):
    from knowledge_graph_studio_spark.streaming.curation import (
        run_streaming_dedup,
    )

    docs_path = str(tmp_path / "docs")
    # segment 0: 40 docs (ids 0..39; doc 7 repeated in-batch under a new id)
    seg0 = [(i, f"content number {i} body") for i in range(40)]
    seg0.append((900, "content number 7 body"))
    spark.createDataFrame(seg0, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(docs_path)
    # segment 1: 20 fresh docs + 10 replays of segment-0 content
    seg1 = [(100 + i, f"fresh item {i} text") for i in range(20)]
    seg1 += [(800 + i, f"content number {i} body") for i in range(10)]
    spark.createDataFrame(seg1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(docs_path)

    workdir = str(tmp_path / "work")
    run_streaming_dedup(spark, docs_path, workdir, m_bits=1 << 16, k=5,
                        max_files_per_trigger=1)

    out = spark.read.parquet(f"{workdir}/docs")
    texts = [r["text"] for r in out.collect()]
    # every distinct content survives exactly once, across batch boundaries
    assert len(texts) == len(set(texts)) == 60
    recs = sorted(
        (r for r in RunManifest(workdir, "stream_dedup0").records()
         if r["stage"] == "stream_dedup"),
        key=lambda r: r["partition_id"])
    assert len(recs) == 2
    assert sum(r["n_kept"] for r in recs) == 60
    assert sum(r["n_batch_dup"] for r in recs) == 1   # the in-batch repeat
    assert sum(r["n_seen"] for r in recs) == 10       # the cross-batch replays
    # the index grew per batch and is bounded by k * accepted
    pos = spark.read.parquet(f"{workdir}/bloom_positions")
    assert 0 < pos.count() <= 5 * 60

    # rerun is a no-op: checkpoint already drained both files
    before = sorted(texts)
    run_streaming_dedup(spark, docs_path, workdir, m_bits=1 << 16, k=5,
                        max_files_per_trigger=1)
    after = sorted(r["text"] for r in
                   spark.read.parquet(f"{workdir}/docs").collect())
    assert after == before


def test_streaming_dedup_replayed_batch_ignores_own_positions(spark, tmp_path):
    """A batch replayed after a crash between its positions write and the
    checkpoint commit must not flag its own docs as seen (it would emit an
    empty batch). Simulated by pre-writing the batch's own positions, then
    running the stream fresh (no checkpoint -> batch 0 'replays')."""
    from knowledge_graph_studio_spark.operators.dedup import (
        bloom_index_positions,
    )
    from knowledge_graph_studio_spark.streaming.curation import (
        run_streaming_dedup,
    )

    docs_path = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(i, f"replay doc {i} text") for i in range(20)],
        "doc_id long, text string")
    docs.coalesce(1).write.mode("overwrite").parquet(docs_path)

    workdir = str(tmp_path / "work")
    # crash artifact: batch 0's own positions already on disk
    bloom_index_positions(docs, m_bits=1 << 16, k=5).write.mode(
        "overwrite").parquet(f"{workdir}/bloom_positions/batch=0")

    run_streaming_dedup(spark, docs_path, workdir, m_bits=1 << 16, k=5)
    out = spark.read.parquet(f"{workdir}/docs")
    assert out.count() == 20  # all docs kept despite the stale positions


def test_sessionize_gap_semantics(spark):
    from datetime import datetime, timedelta

    from knowledge_graph_studio_spark.operators.events import sessionize

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events within gaps, then a 31-min jump -> 2 sessions
        (1, 1, t0),
        (2, 1, t0 + timedelta(minutes=10)),
        (3, 1, t0 + timedelta(minutes=20)),
        (4, 1, t0 + timedelta(minutes=51)),
        # user 2: single event -> one 1-event session
        (5, 2, t0),
        # user 1: exact 30-min gap is NOT a new session (strictly greater)
        (6, 1, t0 + timedelta(minutes=81)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz")
    got = {(r["user_id"], r["session_idx"]):
           (r["n_events"], r["duration_us"])
           for r in sessionize(df, gap_sec=1800).collect()}
    assert got == {
        (1, 1): (3, 20 * 60 * 1_000_000),
        (1, 2): (2, 30 * 60 * 1_000_000),   # events at +51 and +81 min
        (2, 1): (1, 0),
    }


def test_retention_cohorts_triangle(spark):
    from datetime import datetime, timedelta

    from knowledge_graph_studio_spark.operators.events import (
        retention_cohorts)

    d0 = datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(user, day):
        nonlocal eid
        eid += 1
        rows.append((eid, user, d0 + timedelta(days=day)))

    # cohort week 0: users 1,2,3; user 1 returns wk1+wk2, user 2 wk1 only
    for u, days in ((1, [0, 7, 14]), (2, [1, 8]), (3, [2])):
        for d in days:
            ev(u, d)
    # cohort week 1: user 4, returns week 3
    for d in (7, 21):
        ev(4, d)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz")
    base = (d0.date() - datetime(1970, 1, 1).date()).days // 7
    got = {(r["cohort"] - base, r["periods_since"]): r["n_users"]
           for r in retention_cohorts(df, period_days=7).collect()}
    assert got == {(0, 0): 3, (0, 1): 2, (0, 2): 1,
                   (1, 0): 1, (1, 2): 1}


def test_event_funnel_strictly_after_chaining(spark):
    from datetime import datetime, timedelta

    from knowledge_graph_studio_spark.operators.events import funnel

    t0 = datetime(2024, 3, 1)
    rows, eid = [], 0

    def ev(user, et, minute):
        nonlocal eid
        eid += 1
        rows.append((eid, user, et, t0 + timedelta(minutes=minute)))

    # user 1 completes A -> B -> C in order
    ev(1, "A", 0); ev(1, "B", 5); ev(1, "C", 10)
    # user 2 does B BEFORE A: that B must not count; no later B -> stops at A
    ev(2, "B", 0); ev(2, "A", 5)
    # user 3: A then B at the SAME timestamp as A -> strictly-after fails
    ev(3, "A", 0); ev(3, "B", 0)
    # user 4 never does A but does B, C: excluded from step 0 onward
    ev(4, "B", 1); ev(4, "C", 2)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz")
    got = {(r["step_idx"], r["step"]): r["n_users"]
           for r in funnel(df, ["A", "B", "C"]).collect()}
    assert got == {(0, "A"): 3, (1, "B"): 1, (2, "C"): 1}


def test_streaming_sessions_parity_and_watermark_gate(spark, tmp_path):
    from datetime import datetime, timedelta

    from knowledge_graph_studio_spark.streaming.sessions import (
        run_streaming_sessions, streaming_sessions)

    t0 = datetime(2024, 5, 1)
    rows, eid = [], 0

    def ev(user, minute):
        nonlocal eid
        eid += 1
        rows.append((eid, user, t0 + timedelta(minutes=minute)))

    # user 1: two sessions well apart; user 2: one session
    for m in (0, 5, 10, 120, 125):
        ev(1, m)
    for m in (0, 2):
        ev(2, m)
    # a sentinel ahead of the real data advances the watermark (to minute
    # 140) so every real session above is finalized by the time the stream
    # drains — but NOT so far that the resume batch's events would be late
    ev(99, 200)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    src = str(tmp_path / "events")
    df.repartition(4).write.parquet(src)

    out = run_streaming_sessions(
        spark, src, str(tmp_path / "wd"), gap_sec=1800, watermark="1 hour")
    got = {(r["user_id"], r["session_start"], r["n_events"])
           for r in out.collect()}
    # batch parity: the same expression on a batch DF yields ALL sessions;
    # streaming-append must emit exactly those whose END (last event + gap)
    # the watermark passed: cutoff = max event time - watermark
    cutoff = t0 + timedelta(minutes=200) - timedelta(hours=1)
    batch = {(r["user_id"], r["session_start"], r["n_events"])
             for r in streaming_sessions(df, gap_sec=1800).collect()
             if r["session_end"] <= cutoff}
    assert got == batch
    # finalized by run 1: user 1's first session + user 2's (user 1's
    # second session ends at minute 155 > cutoff 140 — still open state)
    by_user = sorted((u, n) for u, _, n in got)
    assert by_user == [(1, 3), (2, 2)]

    # resume: append new events for user 2 (a new later session, ABOVE the
    # carried watermark of minute 140) + a fresh sentinel that finalizes
    # it; the rerun emits ONLY newly-finalized sessions, no dupes
    rows2 = [(100, 2, t0 + timedelta(minutes=300)),
             (101, 2, t0 + timedelta(minutes=305)),
             (102, 98, t0 + timedelta(minutes=1000))]
    spark.createDataFrame(
        rows2, "event_id long, user_id long, ts timestamp"
    ).write.mode("append").parquet(src)
    out2 = run_streaming_sessions(
        spark, src, str(tmp_path / "wd"), gap_sec=1800, watermark="1 hour")
    counts = out2.groupBy("user_id", "session_start").count()
    assert counts.filter("count > 1").count() == 0  # exactly-once
    assert out2.filter("user_id = 2").count() == 2  # old + newly closed
    # the carried state finalized user 1's held second session on rerun
    assert out2.filter("user_id = 1").count() == 2


def test_streaming_sessions_accepts_timestamp_ntz(spark, tmp_path):
    """Parquet-inferred naive timestamps read as TIMESTAMP_NTZ, which
    streaming watermarks reject — the operator must cast internally
    (regression for [EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE])."""
    from datetime import datetime, timedelta

    from knowledge_graph_studio_spark.streaming.sessions import (
        run_streaming_sessions)

    t0 = datetime(2024, 6, 1)
    rows = [(1, 7, t0), (2, 7, t0 + timedelta(minutes=1)),
            (3, 99, t0 + timedelta(hours=5))]  # sentinel finalizes user 7
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    src = str(tmp_path / "ev")
    df.write.parquet(src)
    out = run_streaming_sessions(spark, src, str(tmp_path / "wd"),
                                 gap_sec=1800, watermark="1 hour")
    got = {(r["user_id"], r["n_events"]) for r in out.collect()}
    assert got == {(7, 2)}
