"""V1/V2/E10: deterministic embedder + verbalization parity (SURVEY.md §2.4)."""

import numpy as np
from pyspark.sql import functions as F

from knowledge_graph_studio_spark.functions.embedding_core import (
    CHUNK_DIM, TRIPLE_DIM, cosine, embed_text,
)
from knowledge_graph_studio_spark.functions.embeddings import (
    embed_edges, verbalize_edges, with_embedding,
)
from knowledge_graph_studio_spark.textcore import convert_triple_to_text


def test_embed_text_deterministic_and_normalized():
    a = embed_text("OpenAI offers graph search", TRIPLE_DIM)
    b = embed_text("OpenAI offers graph search", TRIPLE_DIM)
    assert a.shape == (TRIPLE_DIM,)
    assert np.array_equal(a, b)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-6


def test_embed_text_similarity_orders_correctly():
    base = embed_text("acme corp offers cloud hosting in berlin", CHUNK_DIM)
    near = embed_text("acme corp offers cloud hosting in tokyo", CHUNK_DIM)
    far = embed_text("unrelated walrus pigment flotilla", CHUNK_DIM)
    assert cosine(base, near) > cosine(base, far)
    assert cosine(base, near) > 0.5
    assert cosine(base, base) > 0.999


def test_with_embedding_matches_core(spark):
    df = spark.createDataFrame(
        [("a", "graph search engine"), ("b", None)], ["id", "txt"])
    out = {r["id"]: r["embedding"]
           for r in with_embedding(df, "txt", dim=64).collect()}
    expected = embed_text("graph search engine", 64)
    assert np.allclose(out["a"], expected, atol=1e-6)
    assert out["b"] is not None and float(np.linalg.norm(out["b"])) == 0.0


def _edges_df(spark):
    return spark.createDataFrame(
        [
            ("e1", "Ada Lovelace", "person", "runs", "Acme Corp", "company",
             {"since": ["1840"]}),
            ("e2", "Acme Corp", "company", "has service", "graph search",
             "service", None),
        ],
        "edge_id string, head string, head_type string, rel_type string, "
        "tail string, tail_type string, properties map<string,array<string>>",
    )


def test_verbalize_edges_exact_parity_with_textcore(spark):
    got = {r["edge_id"]: r["verbalized"]
           for r in verbalize_edges(_edges_df(spark)).collect()}
    exp1 = convert_triple_to_text(
        {"head": "Ada Lovelace", "head_type": "person", "relation": "runs",
         "tail": "Acme Corp", "tail_type": "company",
         "relation_properties": {"since": ["1840"]}})
    exp2 = convert_triple_to_text(
        {"head": "Acme Corp", "head_type": "company", "relation": "has service",
         "tail": "graph search", "tail_type": "service"})
    assert got["e1"] == exp1
    assert "due to since of 1840" in exp1
    assert got["e2"] == exp2


def test_embed_edges_dim_and_determinism(spark):
    rows = embed_edges(_edges_df(spark)).select(
        "edge_id", "verbalized", "embedding").collect()
    assert all(len(r["embedding"]) == TRIPLE_DIM for r in rows)
    for r in rows:
        expected = embed_text(r["verbalized"], TRIPLE_DIM)
        assert np.allclose(r["embedding"], expected, atol=1e-6)
