"""L8/L9 administrative mutations."""

from knowledge_graph_studio_spark.plans.admin import (
    assign_chunks, delete_graph, unassign_chunks,
)


def _nodes(spark):
    return spark.createDataFrame(
        [(1, "g1", "A", "person", ["c1"]),
         (2, "g1", "B", "company", ["c1", "c2"]),
         (3, "g2", "C", "person", [])],
        "node_id bigint, graph string, name string, type string, "
        "chunks array<string>")


def test_delete_graph_cascade(spark):
    left = delete_graph(_nodes(spark), "g1")
    assert [r["node_id"] for r in left.collect()] == [3]


def test_assign_chunks_tristate_report(spark):
    new, report = assign_chunks(_nodes(spark), [1, 2, 99], ["c2", "c9"])
    got = {r["node_id"]: r["chunks"] for r in new.collect()}
    assert got[1] == ["c1", "c2", "c9"]
    assert got[2] == ["c1", "c2", "c9"]
    assert got[3] == []  # untouched
    rep = {r["target_id"]: r for r in report.collect()}
    assert rep[1]["status"] == "assigned" and rep[1]["newly_added"] == ["c2", "c9"]
    assert rep[2]["already_assigned"] == ["c2"] and rep[2]["newly_added"] == ["c9"]
    assert rep[99]["status"] == "not_found"


def test_unassign_chunks(spark):
    out = unassign_chunks(_nodes(spark), [2], ["c1"])
    got = {r["node_id"]: r["chunks"] for r in out.collect()}
    assert got[2] == ["c2"] and got[1] == ["c1"]
