"""End-to-end graph construction (the reference's Entry B,
routers/graphs.py:286-323 -> graph_service.create_or_update_graph:1226-1402,
re-expressed as one Spark lineage):

    pages --(fused mapInPandas: text -> chunks -> pattern extraction)--> triples
          --(L1 broadcast rule join)--> triples'
          --(L7 fuzzy pairs + connected components)--> canonical triples
          --(L2 salted groupBy merge)--> nodes
          --(L4 salted groupBy merge + chunk-intersection law)--> edges

Two entry points:
  * build_graph          direct, in-memory lineage (bench path).
  * build_graph_resumable  bucketed by xxhash64(url) with per-bucket manifest
    commits: a killed run restarts from the last committed bucket and never
    recomputes committed work (north-rule resume clause; tested by
    tests/test_resume.py).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io.catalog import GraphStatus, RunManifest, read_table
from .operators.extraction import TRIPLES_SCHEMA, pages_to_triples
from .operators.linking import (
    apply_canonical_mapping, apply_merge_rules, build_edges, build_nodes,
    canonical_mapping, rules_to_alias_df, upsert_edges, upsert_nodes,
)
from .schema_model import default_gazetteer, default_rules, default_schema
from .session import size_input_splits


def _config(spark: SparkSession, schema=None, gazetteer=None, rules=None):
    schema = schema or default_schema()
    gazetteer = gazetteer or default_gazetteer()
    rules = default_rules() if rules is None else rules
    alias_df = rules_to_alias_df(spark, rules) if rules else None
    return schema, gazetteer, alias_df


def triples_from_pages(
    spark: SparkSession, pages: DataFrame, schema=None, gazetteer=None, rules=None
) -> DataFrame:
    """pages -> rule-rewritten in-flight triples (no aggregation yet)."""
    schema, gazetteer, alias_df = _config(spark, schema, gazetteer, rules)
    t = pages_to_triples(pages, schema.pattern_dicts(), gazetteer)
    if alias_df is not None:
        t = apply_merge_rules(t, alias_df)
    return t


def build_graph(
    spark: SparkSession,
    pages: DataFrame,
    graph: str = "default",
    schema=None,
    gazetteer=None,
    rules=None,
    fuzzy: bool = True,
    max_chunks: int | None = None,
    max_prop_vals: int | None = None,
    workspace: str = "default",
    created_by: str = "default",
) -> dict[str, DataFrame]:
    """Full construction; returns {"triples", "mapping", "nodes", "edges"}.

    ``max_chunks`` bounds per-row chunk-provenance arrays and
    ``max_prop_vals`` property value lists (hot-entity guards at web scale;
    None = exact reference set-union semantics). See build_nodes.

    ``workspace``/``created_by``: the tenant context the build runs in (the
    reference scopes every upsert by user+workspace, graph_service.py:557-563)
    — stamped on nodes/edges and folded into their identity hashes."""
    triples = triples_from_pages(spark, pages, schema, gazetteer, rules)
    # localCheckpoint (non-eager), not persist: same compute-once reuse for
    # CC + node agg + edge agg, but no CacheManager entries left behind in a
    # long-lived session after callers drop the returned frames.
    triples = triples.localCheckpoint(eager=False)
    if fuzzy:
        # no checkpoint here: canonical_mapping returns either a literal
        # relation (driver-finalized small path, free to re-evaluate) or an
        # internally checkpointed plan (distributed path).
        mapping = canonical_mapping(triples, alias_df=None, fuzzy=True)
        # empty mapping (no fuzzy merges found) -> skip the two broadcast
        # rewrite joins entirely; isEmpty is ~free on the literal/
        # checkpointed relation canonical_mapping returns.
        canon = triples if mapping.isEmpty() \
            else apply_canonical_mapping(triples, mapping)
    else:
        mapping = None
        canon = triples
    nodes = build_nodes(canon, graph=graph, max_chunks=max_chunks,
                        max_prop_vals=max_prop_vals,
                        workspace=workspace,
                        created_by=created_by).localCheckpoint(eager=False)
    edges = build_edges(canon, nodes, graph=graph, max_chunks=max_chunks,
                        max_prop_vals=max_prop_vals,
                        workspace=workspace, created_by=created_by)
    return {"triples": triples, "mapping": mapping, "nodes": nodes, "edges": edges}


def build_graph_resumable(
    spark: SparkSession,
    pages_path: str,
    workdir: str,
    n_buckets: int = 8,
    graph: str = "default",
    schema=None,
    gazetteer=None,
    rules=None,
    fail_after_bucket: int | None = None,
    workspace: str = "default",
    created_by: str = "default",
    max_chunks: int | None = 2048,
    max_prop_vals: int | None = 2048,
) -> dict[str, DataFrame]:
    """Checkpointed build over a materialized pages table.

    Stage 1 (per url-hash bucket, resumable): extraction -> triples parquet +
    manifest commit. Stage 2 (global, idempotent overwrite): CC + node/edge
    aggregation over all committed triples. ``fail_after_bucket`` injects a
    crash for the resume test.

    ``max_chunks``/``max_prop_vals`` bound per-node/edge provenance arrays,
    exactly as in build_graph — but here they DEFAULT ON (2048): this is
    the cluster entry point (tools/run_build.py), and a hot entity's
    uncapped chunk list grows with the corpus (measured: the 38-entity
    synthetic corpus at 384k pages spent over half its wall in the
    node/edge aggregation hauling ~100k-chunk provenance arrays; at
    10^12 documents the array IS the corpus). Pass None for the exact
    uncapped reference semantics on small graphs.

    Graph lifecycle: a pollable status row (io.catalog.GraphStatus) follows
    the reference's creating/updating/ready/failed transitions
    (graph_service.py:751-832): creating on first run, updating on a rerun
    after ready, failed (with the error recorded) on any exception."""
    schema, gazetteer, alias_df = _config(spark, schema, gazetteer, rules)
    manifest = RunManifest(workdir)
    status = GraphStatus(workdir)
    prior = status.get(graph)
    status.set(graph, "updating" if prior and prior["status"] == "ready"
               else "creating")
    try:
        pages = spark.read.parquet(pages_path).withColumn(
            "_bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        done = manifest.committed("extract")
        for b in range(n_buckets):
            if b in done:
                continue
            t0 = time.time()
            part = pages.filter(F.col("_bucket") == b).drop("_bucket")
            triples_b = triples_from_pages(spark, part, schema, gazetteer, rules)
            out = f"{workdir}/triples/bucket={b}"
            triples_b.write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            manifest.commit("extract", b, t0, triples_emitted=n)
            if fail_after_bucket is not None and b >= fail_after_bucket:
                raise RuntimeError(f"injected failure after bucket {b}")

        # Size the link stage's SCAN parallelism by split sizing, not by a
        # repartition: the committed triples table is often far smaller than
        # the pages conf's split size (run_build sizes maxPartitionBytes for
        # the PAGES table), so a default read hands the whole link stage to
        # a handful of tasks (measured 122 s vs 23 s at 16 cores). An
        # explicit repartition().localCheckpoint() fixes parallelism too but
        # pays a full extra shuffle of every triple plus a driver-memory
        # materialization — measured 40% slower end-to-end than just reading
        # with right-sized splits (A/B, r5). Re-scanning the columnar table
        # per consumer (names agg, node build, edge build) is the cheap and
        # cluster-correct pattern: that is what the triples table is FOR.
        size_input_splits(spark, f"{workdir}/triples")
        triples = (
            spark.read.schema(TRIPLES_SCHEMA).parquet(f"{workdir}/triples")
            .select([f.name for f in TRIPLES_SCHEMA.fields])  # drop bucket col
        )
        mapping = canonical_mapping(triples, alias_df=None, fuzzy=True)
        canon = triples if mapping.isEmpty() \
            else apply_canonical_mapping(triples, mapping)
        nodes = build_nodes(canon, graph=graph, workspace=workspace,
                            created_by=created_by, max_chunks=max_chunks,
                            max_prop_vals=max_prop_vals).persist()
        edges = build_edges(canon, nodes, graph=graph, workspace=workspace,
                            created_by=created_by, max_chunks=max_chunks,
                            max_prop_vals=max_prop_vals)
        t0 = time.time()
        nodes.write.mode("overwrite").parquet(f"{workdir}/nodes")
        edges.write.mode("overwrite").parquet(f"{workdir}/edges")
        nodes.unpersist()  # both consumers (edge build + write) are done
        n_nodes = read_table(spark, f"{workdir}/nodes").count()
        n_edges = read_table(spark, f"{workdir}/edges").count()
        manifest.commit("materialize", 0, t0, nodes=n_nodes, edges=n_edges)
    except Exception as exc:  # status row must record the failure (ref :806-832)
        status.set(graph, "failed", errors=[f"{type(exc).__name__}: {exc}"])
        raise
    status.set(graph, "ready", nodes=n_nodes, edges=n_edges)
    return {
        "triples": triples,
        "mapping": mapping,
        "nodes": read_table(spark, f"{workdir}/nodes"),
        "edges": read_table(spark, f"{workdir}/edges"),
    }


def refresh_ann_index(
    spark: SparkSession, workdir: str, edges: DataFrame,
    mode: str = "extend", n_planes: int = 4, n_tables: int = 16,
    seed: int = 7,
):
    """Keep the Entry C ANN index in step with the latest committed edge
    table (VERDICT r3 #5: update_graph_incremental used to leave the index
    stale, so post-update edges could never become text-query candidates
    and recall silently degraded).

    mode="extend": embed + bucket ONLY edges whose edge_id is absent from
    the stored index and append them (plans/query.EdgeAnnIndex.extend) —
    exact for the incremental path, whose pattern-extracted edges have
    stable verbalizations; an edge whose embedding changed IN PLACE (inputs
    that mutate verbalized properties) keeps old buckets, so callers with
    property-mutating upserts should pass mode="rebuild" (full re-embed).

    The refreshed index is written next to the tables ({workdir}/ann_index)
    as a NEW versioned directory pair ({path}_v{k}, {path}_v{k}_meta) and
    committed by atomically replacing the `{path}.ptr` pointer file
    (os.replace — the filesystem's rename atomicity; the same pointer-commit
    shape an Iceberg deployment gets from a snapshot). A crash at ANY point
    leaves either the old pointer (old index fully intact) or the new
    pointer (new data+meta fully written before the pointer moves) — never
    a missing directory or a data/meta mismatch (ADVICE r4); concurrent
    readers holding the old version keep their files because superseded
    versions are only pruned AFTER the commit, best-effort. NOTE: previously
    loaded EdgeAnnIndex handles reference the superseded version and must be
    re-loaded to observe the refresh. Returns the freshly loaded index."""
    import os
    import shutil

    from .functions.embeddings import embed_edges
    from .plans.query import EdgeAnnIndex

    path = f"{workdir}/ann_index"
    ptr = f"{path}.ptr"
    have_old = os.path.exists(ptr) or os.path.exists(f"{path}_meta")
    if mode == "extend" and have_old:
        idx = EdgeAnnIndex.load(spark, path)
        new = edges.join(idx.index_df.select("edge_id").distinct(),
                         "edge_id", "left_anti")
        idx = idx.extend(embed_edges(new).localCheckpoint(eager=False))
    else:
        idx = EdgeAnnIndex.build(embed_edges(edges), n_planes=n_planes,
                                 n_tables=n_tables, seed=seed)
    vdir = os.path.dirname(path) or "."
    base = os.path.basename(path)
    versions = [
        int(d[len(base) + 2:]) for d in os.listdir(vdir)
        if d.startswith(f"{base}_v") and d[len(base) + 2:].isdigit()
    ]
    k = max(versions, default=0) + 1
    vpath = f"{path}_v{k}"
    idx.save(vpath)  # writes vpath AND vpath_meta before the pointer moves
    tmp_ptr = f"{ptr}.tmp"
    with open(tmp_ptr, "w") as fh:
        fh.write(vpath)
    os.replace(tmp_ptr, ptr)  # the commit point (atomic rename)
    for v in versions:  # prune superseded versions, best-effort
        for suffix in ("", "_meta"):
            shutil.rmtree(f"{path}_v{v}{suffix}", ignore_errors=True)
    for suffix in ("", "_meta"):  # legacy un-versioned layout, now shadowed
        shutil.rmtree(f"{path}{suffix}", ignore_errors=True)
    return EdgeAnnIndex.load(spark, path)


def _committed_versions(manifest: RunManifest) -> list[dict]:
    return sorted(
        (r for r in manifest.records()
         if r["stage"] == "table_version" and r["status"] == "committed"),
        key=lambda r: r["partition_id"],
    )


def current_tables(spark: SparkSession, workdir: str) -> dict | None:
    """Latest committed versioned node/edge tables written by
    update_graph_incremental (None before the first version commit)."""
    vs = _committed_versions(RunManifest(workdir))
    if not vs:
        return None
    k = vs[-1]["partition_id"]
    return {
        "version": k,
        "segments": vs[-1]["segments"],
        "nodes": read_table(spark, f"{workdir}/nodes_v{k}"),
        "edges": read_table(spark, f"{workdir}/edges_v{k}"),
    }


def update_graph_incremental(
    spark: SparkSession,
    pages_path: str,
    workdir: str,
    graph: str = "default",
    schema=None,
    gazetteer=None,
    rules=None,
    workspace: str = "default",
    created_by: str = "default",
    max_chunks: int | None = None,
    max_prop_vals: int | None = None,
    ann_index: bool = False,
    ann_mode: str = "extend",
) -> dict:
    """The reference's UPDATE path at scale: extract only NEW crawl segments,
    build delta nodes/edges from just their triples, and UPSERT onto the last
    committed tables (operators/linking.upsert_nodes/upsert_edges) — history
    is never re-aggregated. Segments are the `segment=*` partitions of the
    pages table (at 100 TB: the table format's partition listing); each is
    extracted once, manifest-committed, and its chunk ids are disjoint from
    every other segment's (chunk_id = url:start and a url lives in one
    segment), so the upsert counters stay exact.

    Canonicalization: L1 rules only (applied during extraction). Global
    fuzzy re-clustering is deliberately NOT incremental — reference parity:
    Entry B's build upserts extracted triples directly
    (graph_service.py:524-710); fuzzy resolve is the separate interactive
    endpoint (:2184-2345) to run offline over the full node table.

    Atomicity: tables are written to fresh nodes_v{k}/edges_v{k} dirs and the
    version record (stage `table_version`, carrying the included segment
    list) is published atomically AFTER both writes; a crash in between
    orphans the dirs and the rerun recomputes the same delta against the
    same base — deterministic, so reruns converge.
    """
    import os

    schema, gazetteer, alias_df = _config(spark, schema, gazetteer, rules)
    manifest = RunManifest(workdir)
    status = GraphStatus(workdir)
    prior = status.get(graph)
    status.set(graph, "updating" if prior and prior["status"] == "ready"
               else "creating")
    try:
        segments = sorted(
            d.split("=", 1)[1] for d in os.listdir(pages_path)
            if d.startswith("segment="))
        done = {r["segment"] for r in manifest.records()
                if r["stage"] == "seg_extract" and r["status"] == "committed"}
        for s in segments:
            if s in done:
                continue
            t0 = time.time()
            part = spark.read.parquet(f"{pages_path}/segment={s}")
            triples_s = triples_from_pages(spark, part, schema, gazetteer,
                                           rules)
            out = f"{workdir}/triples/segment={s}"
            triples_s.write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            # deterministic manifest id per segment (Python hash() is
            # process-randomized and would mint duplicate records on resume)
            import zlib

            manifest.commit("seg_extract", zlib.crc32(s.encode()), t0,
                            segment=s, triples_emitted=n)

        extracted = sorted(
            r["segment"] for r in manifest.records()
            if r["stage"] == "seg_extract" and r["status"] == "committed")
        prev = current_tables(spark, workdir)
        included = set(prev["segments"]) if prev else set()
        new_segs = [s for s in extracted if s not in included]
        if not new_segs:
            status.set(graph, "ready")
            return prev

        delta = spark.read.schema(TRIPLES_SCHEMA).parquet(
            *[f"{workdir}/triples/segment={s}" for s in new_segs]
        ).select([f.name for f in TRIPLES_SCHEMA.fields])
        # ``max_chunks``/``max_prop_vals`` bound hot-entity provenance
        # arrays (see build_nodes) — WITHOUT them the hot node's chunk set
        # grows with HISTORY and every update pays O(history) to union and
        # rewrite it, defeating the linear-in-delta claim (measured in
        # tools/scaling_bench.py --worker-incremental).
        d_nodes = build_nodes(delta, graph=graph, workspace=workspace,
                              created_by=created_by, max_chunks=max_chunks,
                              max_prop_vals=max_prop_vals).persist()
        d_edges = build_edges(delta, d_nodes, graph=graph,
                              workspace=workspace, created_by=created_by,
                              max_chunks=max_chunks,
                              max_prop_vals=max_prop_vals)
        if prev is None:
            nodes, edges = d_nodes, d_edges
        else:
            nodes = upsert_nodes(prev["nodes"], d_nodes,
                                 max_chunks=max_chunks).persist()
            edges = upsert_edges(prev["edges"], d_edges, nodes,
                                 max_chunks=max_chunks)

        k = (prev["version"] + 1) if prev else 0
        t0 = time.time()
        nodes.write.mode("overwrite").parquet(f"{workdir}/nodes_v{k}")
        edges.write.mode("overwrite").parquet(f"{workdir}/edges_v{k}")
        d_nodes.unpersist()
        if nodes is not d_nodes:
            nodes.unpersist()
        n_nodes = read_table(spark, f"{workdir}/nodes_v{k}").count()
        n_edges = read_table(spark, f"{workdir}/edges_v{k}").count()
        manifest.commit("table_version", k, t0,
                        segments=sorted(included | set(new_segs)),
                        nodes=n_nodes, edges=n_edges)
        if ann_index:
            # keep the Entry C text-query index in step with this version
            # (VERDICT r3 #5); see refresh_ann_index for the extend/rebuild
            # exactness contract
            refresh_ann_index(spark, workdir,
                              read_table(spark, f"{workdir}/edges_v{k}"),
                              mode=ann_mode)
    except Exception as exc:
        status.set(graph, "failed", errors=[f"{type(exc).__name__}: {exc}"])
        raise
    status.set(graph, "ready", nodes=n_nodes, edges=n_edges)
    return {
        "version": k,
        "segments": sorted(included | set(new_segs)),
        "nodes": read_table(spark, f"{workdir}/nodes_v{k}"),
        "edges": read_table(spark, f"{workdir}/edges_v{k}"),
    }


def diff_graph_versions(
    spark: SparkSession, workdir: str,
    old_version: int | None = None, new_version: int | None = None,
):
    """Changelog between two committed graph versions written by
    :func:`update_graph_incremental` -> the plans/admin.graph_diff report
    (kind, change, key): "what did that crawl delta do to the graph".
    Defaults to the two most recent committed versions; raises if fewer
    than two exist (or a requested version was never committed)."""
    from .plans.admin import graph_diff

    vs = [r["partition_id"] for r in _committed_versions(RunManifest(workdir))]
    if new_version is None or old_version is None:
        if len(vs) < 2:
            raise ValueError(
                f"need two committed versions to diff, have {vs}")
        old_version = vs[-2] if old_version is None else old_version
        new_version = vs[-1] if new_version is None else new_version
    for v in (old_version, new_version):
        if v not in vs:
            raise ValueError(f"version {v} not committed (have {vs})")
    return graph_diff(
        read_table(spark, f"{workdir}/nodes_v{old_version}"),
        read_table(spark, f"{workdir}/nodes_v{new_version}"),
        read_table(spark, f"{workdir}/edges_v{old_version}"),
        read_table(spark, f"{workdir}/edges_v{new_version}"),
    )
