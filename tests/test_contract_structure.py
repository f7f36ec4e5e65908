"""Non-vacuity guards for contract oracles (DuckDB-only, no Spark).

A value-paired contract entry only proves something if its fixture data
exercises the interesting structure. These tests pin that structure so a
silent testdata regeneration can't hollow an entry out without failing CI.
"""

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "customer"):
        path = os.path.join(SF_DIR, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_kg_connected_components_oracle_is_multi_component(con):
    """The nearest-cooc-partner graph must have >=2 components with >=2
    members each — otherwise the CC entry degenerates to 'everything maps
    to the global min' and stops discriminating a broken label loop."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    rows = con.execute(ORACLE_SQL["kg_connected_components"]).fetchall()
    assert rows, "CC oracle returned no members"
    comps = {}
    for member, component in rows:
        comps.setdefault(component, []).append(member)
    multi = [c for c, ms in comps.items() if len(ms) >= 2]
    assert len(comps) >= 2, f"degenerate: single component {comps}"
    assert len(multi) >= 2, f"need >=2 non-trivial components, got {comps}"
    # min-label law: every component label is its own lexicographic minimum
    for c, ms in comps.items():
        assert c == min(ms), f"component {c} is not min of {sorted(ms)}"


def test_hashed_entries_discriminate(con):
    """The hashed top-k and Entry C text entries must actually SELECT:
    top-10/top-8 strictly smaller than their candidate pools, and the text
    entry's relevance stage must keep at least one row — otherwise a broken
    scorer that returns everything (or nothing) would still 'match'."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    topk = con.execute(ORACLE_SQL["kg_triple_topk_hashed"]).fetchall()
    pool = con.execute(ORACLE_SQL["kg_cooccurrence"]).fetchall()
    assert len(topk) == 10 < len(pool)

    qtext = con.execute(ORACLE_SQL["kg_query_text_hashed"]).fetchall()
    assert 1 <= len(qtext) <= 8
    heads_tails = {x for r in qtext for x in (r[0], r[2])}
    flt = {"spark", "join", "sort", "vector", "hash", "window"}
    assert all(r[0] in flt or r[2] in flt for r in qtext), \
        f"prefilter leaked: {heads_tails - flt}"


def test_fuzzy_pairs_oracle_nonempty(con):
    """The L7 entry must keep matching real near-duplicate names."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    if "fuzzy_pairs" not in ORACLE_SQL:
        pytest.skip("fuzzy_pairs not oracle-paired")
    n = len(con.execute(ORACLE_SQL["fuzzy_pairs"]).fetchall())
    assert n > 0, "fuzzy oracle matched nothing — blocking test is vacuous"


def test_lm_unigram_score_oov_binds_and_buckets_nondegenerate(con):
    """The lm_unigram_score entry only proves the OOV path if the sf0.01
    vocabulary exceeds the entry's vocab_size=20 cut, and only proves the
    bucketing if all three buckets are non-empty."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    vocab = con.execute(
        "select count(distinct tok) from (select unnest(string_split(text,"
        "' ')) as tok from documents)").fetchone()[0]
    assert vocab > 20, f"vocab {vocab} <= cut: OOV path never exercised"
    rows = con.execute(ORACLE_SQL["lm_unigram_score"]).fetchall()
    buckets = {r[3] for r in rows}
    assert buckets == {"head", "middle", "tail"}, buckets


def test_kg_pagerank_oracle_discriminates(con):
    """Ranks must spread: a degenerate graph (regular/complete) gives every
    node the same rank and the entry stops discriminating a broken loop.
    Also pins mass conservation in the fixed-point convention."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    rows = con.execute(ORACLE_SQL["kg_pagerank"]).fetchall()
    assert rows, "pagerank oracle returned no members"
    ranks = [r[1] for r in rows]
    assert len(set(ranks)) >= 3, f"degenerate rank spread: {sorted(set(ranks))}"
    total, n = sum(ranks), len(ranks)
    assert total <= 10**12
    assert total >= 10**12 - 2 * 5 * n * 100 - n  # truncation-loss bound


def test_kg_triangles_oracle_discriminates(con):
    """Needs nodes WITH and WITHOUT full clustering, and at least one
    triangle — else the wedge/closing machinery is untested."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    rows = con.execute(ORACLE_SQL["kg_triangles"]).fetchall()
    assert rows
    tri = [r[2] for r in rows]
    coef = [r[3] for r in rows]
    assert max(tri) > 0, "no triangles in the fixture graph"
    assert len(set(tri)) >= 2, "triangle counts do not discriminate"
    assert any(c < 1_000_000 for c in coef), "every node fully clustered"
    # handshake-style consistency: per-node totals count each triangle 3x
    assert sum(tri) % 3 == 0


def test_kg_khop_oracle_has_depth(con):
    """The BFS entry must exercise depth: >= 2 distinct nonzero distances,
    otherwise a broken frontier loop that only does 1 hop still matches."""
    from knowledge_graph_studio_spark.driver_contract import (
        _KHOP_MAX, _KHOP_SEEDS, ORACLE_SQL)

    rows = con.execute(ORACLE_SQL["kg_khop"]).fetchall()
    dist = {m: d for m, d in rows}
    assert all(dist[s] == 0 for s in _KHOP_SEEDS)
    nonzero = sorted({d for d in dist.values() if d > 0})
    assert len(nonzero) >= 2, f"no multi-hop structure: {nonzero}"
    assert max(nonzero) <= _KHOP_MAX


def test_bm25_oracle_selects_and_spreads(con):
    """Top-k must be a strict SELECTION (more matching docs than k) with a
    real score spread — a scorer returning a constant would still hash-match
    if the fixture didn't discriminate."""
    from knowledge_graph_studio_spark.driver_contract import (
        _BM25_K, _BM25_QUERY, ORACLE_SQL)

    rows = con.execute(ORACLE_SQL["bm25_topk"]).fetchall()
    assert len(rows) == _BM25_K
    scores = [r[1] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(set(scores)) >= 3, f"degenerate score spread: {set(scores)}"
    terms = [t for t in _BM25_QUERY.split()]
    matching = con.execute(
        "select count(*) from documents where "
        + " or ".join(f"text like '%{t}%'" for t in terms)).fetchone()[0]
    assert matching > _BM25_K, "top-k is not a selection at this fixture"


def test_kg_pagerank_weighted_oracle_discriminates(con):
    """On the COMPLETE cooc graph the unweighted ranks are uniform; the
    weighted entry must spread — proving the weight division (not the
    topology) is what the entry checks."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    rows = con.execute(ORACLE_SQL["kg_pagerank_weighted"]).fetchall()
    assert rows
    ranks = [r[1] for r in rows]
    assert len(set(ranks)) >= 3, f"weights did not spread: {sorted(set(ranks))}"


def test_kg_graph_diff_oracle_exercises_all_changes(con):
    """The diff entry must produce added AND removed AND changed rows for
    BOTH kinds — otherwise a table_diff that, say, never emits `removed`
    would still hash-match."""
    from knowledge_graph_studio_spark.driver_contract import ORACLE_SQL

    rows = con.execute(ORACLE_SQL["kg_graph_diff"]).fetchall()
    seen = {(k, c) for k, c, _ in rows}
    need = {(k, c) for k in ("node", "edge")
            for c in ("added", "removed", "changed")}
    missing = need - seen
    # the node side has no `removed` only if every old node survives; the
    # probed fixture (windows [0,8) vs [8,16), thresholds 6/7) has all six
    assert not missing, f"diff fixture does not exercise: {missing}"


def test_hybrid_rrf_oracle_mixes_both_sides(con):
    """The fusion entry must draw on BOTH rankings: its top-k has to
    contain a doc promoted by the vector side that the BM25 top-k alone
    does not surface (and vice versa is allowed) — otherwise the entry
    degenerates to re-testing bm25_topk."""
    from knowledge_graph_studio_spark.driver_contract import (
        _BM25_K, ORACLE_SQL, _bm25_oracle_sql)

    fused = [r[0] for r in con.execute(ORACLE_SQL["hybrid_rrf_topk"]).fetchall()]
    lex_only = [r[0] for r in con.execute(_bm25_oracle_sql(k=len(fused))).fetchall()]
    assert fused != lex_only, "fusion output identical to lexical ranking"
    assert set(fused) - set(lex_only), \
        "no vector-promoted doc in the fused top-k"
