"""corpus.text_scale: realistic page sizes must not change the fact set."""

from knowledge_graph_studio_spark.corpus import expected_triples, make_page


def test_text_scale_grows_text_not_facts():
    n = 60
    base = {(t["url"], t["head"], t["relation"], t["tail"])
            for t in expected_triples(n, seed=42, text_scale=1)}
    fat = {(t["url"], t["head"], t["relation"], t["tail"])
           for t in expected_triples(n, seed=42, text_scale=8)}
    assert base == fat and base

    sizes1 = [len(make_page(i, 42, 1)["html"]) for i in range(20)]
    sizes8 = [len(make_page(i, 42, 8)["html"]) for i in range(20)]
    assert sum(sizes8) > 4 * sum(sizes1)


def test_make_page_deterministic():
    a, b = make_page(7, 42, 8), make_page(7, 42, 8)
    assert a == b
    assert make_page(7, 43, 8)["html"] != a["html"]


def test_zipf_corpus_entity_codes_fuzzy_safe():
    """The high-cardinality corpus' entity codes must be pairwise
    levenshtein >= 2 within a type, or the L7 fuzzy pass (maxEdits=1) would
    silently merge planted entities and collapse the cardinality the
    scaling variant exists to provide."""
    import itertools

    from knowledge_graph_studio_spark.corpus import _entity_code

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    codes = [_entity_code(j) for j in range(64)]
    assert len(set(codes)) == 64
    for a, b in itertools.combinations(codes, 2):
        assert lev(a, b) >= 2, (a, b)


def test_zipf_corpus_deterministic_and_skewed():
    """make_page_zipf is a pure function of (seed, i); alpha>0 concentrates
    mentions on low-index entities (hot-key skew the salt must absorb)."""
    from collections import Counter

    from knowledge_graph_studio_spark.corpus import (
        make_page_zipf, zipf_config,
    )
    from knowledge_graph_studio_spark.textcore import extract_page_triples

    p1 = make_page_zipf(7, seed=42, alpha=1.1)
    p2 = make_page_zipf(7, seed=42, alpha=1.1)
    assert p1 == p2
    assert p1["url"].startswith("https://zipf.example.org/42/")

    schema, gaz, (people, companies, cities) = zipf_config()
    heads = Counter()
    for i in range(300):
        pg = make_page_zipf(i, seed=42, alpha=1.1)
        for t in extract_page_triples(pg["html"], pg["text"], pg["lang"],
                                      schema.pattern_dicts(), gaz):
            heads[t["tail"]] += 1
    assert heads, "zipf corpus must produce triples"
    top = heads.most_common(1)[0]
    total = sum(heads.values())
    # web-like skew: the hottest tail entity concentrates well above uniform
    assert top[1] / total > 5.0 / (len(companies) + len(cities)), heads.most_common(3)
    # and the hot entity is a low-index one (Zipf head of the distribution)
    assert top[0] in (companies[:8] + cities[:4]), top
