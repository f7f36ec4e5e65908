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
