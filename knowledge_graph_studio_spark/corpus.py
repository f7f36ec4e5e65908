"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Generates the input table of BASELINE.json's input_hint:
  pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Every page is a pure function of (seed, index) — ``make_page(i, seed)`` — so
generation is stateless per row and therefore distributable: the Spark source in
``sources/pages.py`` fans ``spark.range(n)`` through ``mapInPandas`` calling this
module, which means a 10^12-row layout generates in parallel with no driver
materialization. Tests and the fixture oracle call the same function.

Skew: HOT_ENTITY appears in ~20%% of pages (FIXTURES.md §1) so the node-key
groupBy and connected-components stages exercise hot-key handling. ~10%% of pages
are non-"en" (filter cases); ~15%% carry a precomputed ``text`` column that must
equal the html extraction byte-for-byte (per-row invariant).
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Any

from .schema_model import (
    CITIES, COMPANIES, COMPANY_ALIASES, HOT_ENTITY, PEOPLE, SERVICES,
    default_gazetteer, default_schema,
)
from .textcore import html_to_text

_BASE_TS = _dt.datetime(2025, 6, 1, 0, 0, 0)

_DISTRACTOR_WORDS = (
    "the quick archive of public web data holds many curious pages about "
    "weather markets recipes gardens music travel history science sports and "
    "assorted trivia that no extractor should ever mistake for a real fact"
).split()

_FACT_TEMPLATES = {
    "runs": ["{h} {t_trigger} {t}.", "As everyone knows, {h} {t_trigger} {t}."],
    "has service": ["{h} {t_trigger} {t}.", "{h} {t_trigger} {t} to enterprise clients."],
    "located in": ["{h} {t_trigger} {t}.", "{h} {t_trigger} {t}, near the river."],
    "acquired": ["{h} {t_trigger} {t}.", "Last year {h} {t_trigger} {t}."],
}

_LANGS = ["de", "fr", "zh"]


def _company_surface(rng: random.Random, name: str) -> str:
    aliases = COMPANY_ALIASES.get(name)
    if aliases and rng.random() < 0.35:
        return rng.choice(aliases)
    return name


def _fact_sentence(rng: random.Random, schema) -> str:
    pat = rng.choice(schema.patterns)
    trigger = rng.choice(pat.triggers)
    if pat.head_type == "person":
        head = rng.choice(PEOPLE)
    else:
        head = _company_surface(rng, rng.choice(COMPANIES))
    if pat.tail_type == "company":
        tail = _company_surface(rng, rng.choice(COMPANIES))
    elif pat.tail_type == "service":
        tail = rng.choice(SERVICES)
    else:
        tail = rng.choice(CITIES)
    tpl = rng.choice(_FACT_TEMPLATES[pat.relation])
    return tpl.format(h=head, t=tail, t_trigger=trigger)


def _distractor(rng: random.Random) -> str:
    k = rng.randint(6, 18)
    words = [rng.choice(_DISTRACTOR_WORDS) for _ in range(k)]
    return (" ".join(words)).capitalize() + "."


def make_page(i: int, seed: int = 42, text_scale: int = 1) -> dict[str, Any]:
    """Deterministic page row for global index ``i``.

    ``text_scale`` appends (text_scale-1)x the base paragraph count of
    distractor-only paragraphs (no gazetteer surfaces, so the page's fact/
    triple set is IDENTICAL at any scale — asserted in tests). The base page
    is ~1-3 KB of text; real web pages average 5-30 KB extracted text, so
    scale 8 approximates realistic pages. The scaling benchmark's official
    run uses text_scale=1 (the stable config on this noisy shared VM —
    tools/scaling_bench.py --text-scale documents the tradeoff)."""
    rng = random.Random((seed << 32) ^ i)
    lang = rng.choice(_LANGS) if rng.random() < 0.10 else "en"

    paragraphs: list[str] = []
    n_par = rng.randint(2, 6) if rng.random() < 0.9 else rng.randint(10, 24)
    hot = rng.random() < 0.20
    for p in range(n_par):
        sents = [_distractor(rng) for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.7:
            sents.insert(rng.randrange(len(sents) + 1), _fact_sentence(rng, _SCHEMA))
        paragraphs.append(" ".join(sents))
    if hot:
        person = rng.choice(PEOPLE)
        paragraphs.insert(
            rng.randrange(len(paragraphs) + 1),
            f"{person} runs {HOT_ENTITY}. {HOT_ENTITY} offers "
            f"{rng.choice(SERVICES)}.",
        )
    for _ in range((text_scale - 1) * n_par):
        paragraphs.append(
            " ".join(_distractor(rng) for _ in range(rng.randint(2, 5))))

    title = f"Crawl record {i}"
    body = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    html = (
        "<html><head><title>" + title + "</title>"
        "<style>p{margin:0}</style><script>var x=1;</script></head>"
        "<body><nav>home &amp; about</nav>" + body +
        "<footer>&copy; crawl fixtures</footer></body></html>"
    ).encode("utf-8")

    text = html_to_text(html) if (lang == "en" and rng.random() < 0.15) else None
    return {
        "url": f"https://example.org/{seed}/{i:010d}",
        "warc_ts": _BASE_TS + _dt.timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": lang,
    }


_SCHEMA = default_schema()
_GAZETTEER = default_gazetteer()


# --------------------------------------------------------------------------- #
# High-cardinality / Zipf-skew corpus (VERDICT r3 #4 + #1-alt): the default
# corpus has 38 distinct entities, which makes the node/edge aggregation
# stages a tiny fixed tail that Amdahl-limits any strong-scaling read. This
# parametric variant generates hundreds-to-thousands of distinct entities
# with a Zipf(alpha) mention distribution (alpha=0 uniform, ~1.1 web-like),
# so the linking stages carry real key cardinality AND real hot-key skew.
# --------------------------------------------------------------------------- #

# syllable alphabet with pairwise-distinct chars at BOTH positions: any two
# syllables are levenshtein 2 apart, so two distinct entity codes are >= 2
# edits apart and the L7 fuzzy pass (maxEdits=1) never merges them — entity
# cardinality stays exactly what the generator planted.
_SYL = ["bq", "cw", "de", "fr", "gt", "hy", "ju", "ki",
        "lo", "mp", "na", "ps", "rd", "sf", "tg", "vh"]


def _entity_code(j: int) -> str:
    """3-syllable code, 4096 distinct, pairwise levenshtein >= 2."""
    return _SYL[(j >> 8) & 15] + _SYL[(j >> 4) & 15] + _SYL[j & 15]


def zipf_config(n_people: int = 256, n_companies: int = 256,
                n_cities: int = 32):
    """(schema, gazetteer) for the high-cardinality corpus. Surfaces are
    prefix+code ("Pe…" person, "Co…" company, "To…" town); cross-type
    near-collisions are irrelevant because fuzzy blocking is type-equi."""
    from .schema_model import (
        KGSchema, SchemaEntity, SchemaPattern, SchemaRelation,
    )

    people = [f"Pe{_entity_code(j)}" for j in range(n_people)]
    companies = [f"Co{_entity_code(j)}" for j in range(n_companies)]
    cities = [f"To{_entity_code(j)}" for j in range(n_cities)]
    gaz: dict[str, tuple[str, str]] = {}
    for p in people:
        gaz[p.lower()] = (p, "person")
    for cmp_ in companies:
        gaz[cmp_.lower()] = (cmp_, "company")
    for ct in cities:
        gaz[ct.lower()] = (ct, "city")
    schema = KGSchema(
        entities=[SchemaEntity("person"), SchemaEntity("company"),
                  SchemaEntity("city")],
        relations=[SchemaRelation("runs"), SchemaRelation("located in")],
        patterns=[
            SchemaPattern("person", "runs", "company", triggers=("runs",)),
            SchemaPattern("company", "located in", "city",
                          triggers=("located in",)),
        ],
    )
    return schema, gaz, (people, companies, cities)


_ZIPF_CDF_CACHE: dict[tuple[int, float], list[float]] = {}


def _zipf_pick(rng: random.Random, n: int, alpha: float) -> int:
    """Inverse-CDF Zipf(alpha) index in [0, n); alpha<=0 = uniform.
    The CDF is cached per (n, alpha) per process (executor prologue cost)."""
    if alpha <= 0:
        return rng.randrange(n)
    key = (n, alpha)
    cdf = _ZIPF_CDF_CACHE.get(key)
    if cdf is None:
        w = [1.0 / (k + 1) ** alpha for k in range(n)]
        tot = sum(w)
        acc = 0.0
        cdf = []
        for x in w:
            acc += x
            cdf.append(acc / tot)
        _ZIPF_CDF_CACHE[key] = cdf
    import bisect

    return bisect.bisect_left(cdf, rng.random())


def make_page_zipf(
    i: int, seed: int = 42, n_people: int = 256, n_companies: int = 256,
    n_cities: int = 32, alpha: float = 0.0, text_scale: int = 1,
) -> dict[str, Any]:
    """Deterministic page for the high-cardinality corpus (same
    (seed, index) purity and html/text/lang shape as make_page)."""
    _, _, (people, companies, cities) = _zipf_entities(
        n_people, n_companies, n_cities)
    rng = random.Random(((seed << 32) ^ i) * 0x9E3779B97F4A7C15 + 0x5A1F)
    lang = rng.choice(_LANGS) if rng.random() < 0.10 else "en"

    paragraphs: list[str] = []
    n_par = rng.randint(2, 6)
    for _p in range(n_par):
        sents = [_distractor(rng) for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.8:
            if rng.random() < 0.7:
                fact = (f"{people[_zipf_pick(rng, n_people, alpha)]} runs "
                        f"{companies[_zipf_pick(rng, n_companies, alpha)]}.")
            else:
                fact = (f"{companies[_zipf_pick(rng, n_companies, alpha)]} is "
                        f"located in {cities[_zipf_pick(rng, n_cities, alpha)]}.")
            sents.insert(rng.randrange(len(sents) + 1), fact)
        paragraphs.append(" ".join(sents))
    for _ in range((text_scale - 1) * n_par):
        paragraphs.append(
            " ".join(_distractor(rng) for _ in range(rng.randint(2, 5))))

    title = f"Crawl record {i}"
    body = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    html = (
        "<html><head><title>" + title + "</title>"
        "<style>p{margin:0}</style><script>var x=1;</script></head>"
        "<body><nav>home &amp; about</nav>" + body +
        "<footer>&copy; crawl fixtures</footer></body></html>"
    ).encode("utf-8")
    text = html_to_text(html) if (lang == "en" and rng.random() < 0.15) else None
    return {
        "url": f"https://zipf.example.org/{seed}/{i:010d}",
        "warc_ts": _BASE_TS + _dt.timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": lang,
    }


_ZIPF_ENT_CACHE: dict[tuple[int, int, int], tuple] = {}


def _zipf_entities(n_people: int, n_companies: int, n_cities: int):
    key = (n_people, n_companies, n_cities)
    hit = _ZIPF_ENT_CACHE.get(key)
    if hit is None:
        hit = zipf_config(n_people, n_companies, n_cities)
        _ZIPF_ENT_CACHE[key] = hit
    return hit


def make_pages(n: int, seed: int = 42, text_scale: int = 1) -> list[dict[str, Any]]:
    """Driver-side batch (tests / small fixtures only — Spark path streams)."""
    return [make_page(i, seed, text_scale) for i in range(n)]


def expected_triples(n: int, seed: int = 42,
                     text_scale: int = 1) -> list[dict[str, Any]]:
    """Golden oracle: run the shared extractor over each page (pure Python)."""
    from .textcore import extract_page_triples

    pats = _SCHEMA.pattern_dicts()
    out: list[dict[str, Any]] = []
    for i in range(n):
        page = make_page(i, seed, text_scale)
        for t in extract_page_triples(
            page["html"], page["text"], page["lang"], pats, _GAZETTEER
        ):
            out.append({"url": page["url"], **t})
    return out
