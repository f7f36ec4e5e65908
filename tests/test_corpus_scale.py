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
