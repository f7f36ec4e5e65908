"""Cypher export sink (S10) — edges table -> Neo4j CREATE CONSTRAINT + MERGE
statements.

Semantics parity with the reference's exporter
(utilities/cypher_export.py:9-133): one uniqueness constraint per node label,
one MERGE h / MERGE t / MERGE (h)-[:`rel`]->(t) line per triple, names escaped
(backslash, quotes, newline/CR/tab). Deviation (documented): the reference
iterates a Python set for constraint order (nondeterministic); we sort labels
so the export is byte-stable — required for value-hash checks and idempotent
re-exports.

Scale shape: this is a driver-side formatter over a *collected* edge set, same
as the reference — exports are human/Neo4j-scale, not 100 TB scans. For bulk
loads at scale use ``export_cypher_distributed``, which writes the MERGE lines
as a text table (one shuffle-free map) and only collects the tiny label set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ESCAPES = [
    ("\\", "\\\\"), ("'", "\\'"), ('"', '\\"'),
    ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
]


def escape_string(s: str) -> str:
    """Escape Cypher string specials (utilities/cypher_export.py:94-133)."""
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def constraint_statement(label: str) -> str:
    return (
        f"CREATE CONSTRAINT unique_{label}_name IF NOT EXISTS "
        f"FOR (n:{label}) REQUIRE n.name IS UNIQUE;"
    )


def merge_statement(head_label: str, head_name: str, rel_type: str,
                    tail_label: str, tail_name: str) -> str:
    return (
        f"MERGE (h:{head_label} {{name: '{escape_string(head_name)}'}}) "
        f"MERGE (t:{tail_label} {{name: '{escape_string(tail_name)}'}}) "
        f"MERGE (h)-[:`{rel_type}`]->(t);"
    )


def generate_cypher_statements(triples: list[dict]) -> list[str]:
    """Driver-side export, reference-shaped input rows
    ({head_node:{label,name}, relation:{name}, tail_node:{label,name}})."""
    labels = sorted(
        {t["head_node"]["label"] for t in triples}
        | {t["tail_node"]["label"] for t in triples}
    )
    out = [constraint_statement(lb) for lb in labels]
    out.extend(
        merge_statement(
            t["head_node"]["label"], t["head_node"]["name"],
            t["relation"]["name"],
            t["tail_node"]["label"], t["tail_node"]["name"],
        )
        for t in triples
    )
    return out


def export_cypher(edges: DataFrame) -> list[str]:
    """Collect an edges DataFrame (head, head_type, rel_type, tail, tail_type)
    and format it; ordering is deterministic (sorted labels, then edge order
    by (head, rel_type, tail))."""
    rows = (
        edges.select("head", "head_type", "rel_type", "tail", "tail_type")
        .orderBy("head", "rel_type", "tail")
        .collect()
    )
    triples = [
        {
            "head_node": {"label": r["head_type"], "name": r["head"]},
            "relation": {"name": r["rel_type"]},
            "tail_node": {"label": r["tail_type"], "name": r["tail"]},
        }
        for r in rows
    ]
    return generate_cypher_statements(triples)


def export_cypher_distributed(edges: DataFrame, path: str) -> list[str]:
    """Scale path: MERGE lines written as a distributed text table (no
    collect); returns just the constraint statements (tiny distinct)."""
    esc = F.col("head")
    for raw, escaped in _ESCAPES:
        esc = F.replace(esc, F.lit(raw), F.lit(escaped))
    tesc = F.col("tail")
    for raw, escaped in _ESCAPES:
        tesc = F.replace(tesc, F.lit(raw), F.lit(escaped))
    lines = edges.select(
        F.concat(
            F.lit("MERGE (h:"), F.col("head_type"), F.lit(" {name: '"), esc,
            F.lit("'}) MERGE (t:"), F.col("tail_type"), F.lit(" {name: '"),
            tesc, F.lit("'}) MERGE (h)-[:`"), F.col("rel_type"),
            F.lit("`]->(t);"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    labels = sorted(
        r["t"]
        for r in edges.select(F.col("head_type").alias("t"))
        .union(edges.select(F.col("tail_type").alias("t")))
        .distinct().collect()
    )
    return [constraint_statement(lb) for lb in labels]
