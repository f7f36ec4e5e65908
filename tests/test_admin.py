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


def test_table_diff_three_changes_and_arrays(spark):
    from knowledge_graph_studio_spark.plans.admin import table_diff

    old = spark.createDataFrame(
        [("a", 1, ["x"]), ("b", 2, ["y"]), ("c", 3, ["z"])],
        "k string, v long, tags array<string>")
    new = spark.createDataFrame(
        [("a", 1, ["x"]),              # unchanged -> dropped
         ("b", 2, ["y", "w"]),         # array change -> changed
         ("d", 9, ["q"])],             # added; c removed
        "k string, v long, tags array<string>")
    got = {(r["change"], r["k"])
           for r in table_diff(old, new, ["k"]).collect()}
    assert got == {("changed", "b"), ("removed", "c"), ("added", "d")}


def test_table_diff_null_values_and_composite_key(spark):
    from knowledge_graph_studio_spark.plans.admin import table_diff

    old = spark.createDataFrame(
        [("a", "x", None), ("a", "y", 5)], "k1 string, k2 string, v long")
    new = spark.createDataFrame(
        [("a", "x", None), ("a", "y", None)], "k1 string, k2 string, v long")
    got = {(r["change"], r["k1"], r["k2"])
           for r in table_diff(old, new, ["k1", "k2"]).collect()}
    # null == null under eqNullSafe -> (a,x) unchanged; 5 -> null -> changed
    assert got == {("changed", "a", "y")}


def test_graph_diff_combined_report(spark):
    from knowledge_graph_studio_spark.plans.admin import graph_diff

    on = spark.createDataFrame([("A", "t", 1)], "name string, type string, deg long")
    nn = spark.createDataFrame([("A", "t", 2), ("B", "t", 1)],
                               "name string, type string, deg long")
    oe = spark.createDataFrame([("A", "r", "A", 1)],
                               "head string, rel_type string, tail string, w long")
    ne = spark.createDataFrame([("A", "r", "B", 1)],
                               "head string, rel_type string, tail string, w long")
    got = {(r["kind"], r["change"], r["key"])
           for r in graph_diff(on, nn, oe, ne).collect()}
    assert got == {("node", "changed", "A|t"), ("node", "added", "B|t"),
                   ("edge", "removed", "A|r|A"), ("edge", "added", "A|r|B")}
