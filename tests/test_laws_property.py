"""Property-based tests (hypothesis) for the pure-core laws the distributed
aggregations rely on. The reference ships no property tests (SURVEY.md §5);
these pin the algebra that makes the Spark groupBys correct: the splitter's
exact-offset invariant and the commutative/associative/idempotent merge law.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_studio_spark.functions.embedding_core import embed_text
from knowledge_graph_studio_spark.operators.extraction import (
    generate_schema_from_questions,
)
from knowledge_graph_studio_spark.textcore import (
    html_to_text, merge_string_props, split_text_into_chunks,
)

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
    max_size=5000,
)
props = st.dictionaries(
    st.text(max_size=8),
    st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=4),
    max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(min_value=1, max_value=300))
def test_splitter_reassembles_exactly(text, max_chars):
    chunks = split_text_into_chunks(text, max_chars=max_chars)
    assert "".join(c["content"] for c in chunks) == text
    for c in chunks:
        assert 0 < len(c["content"]) <= max_chars or text == ""
        assert text[c["start"]:c["end"]] == c["content"]
    # offsets are contiguous
    for a, b in zip(chunks, chunks[1:]):
        assert a["end"] == b["start"]


@settings(max_examples=200, deadline=None)
@given(st.lists(props, max_size=5))
def test_merge_props_commutative_associative_idempotent(dicts):
    merged = merge_string_props(dicts)
    assert merge_string_props(list(reversed(dicts))) == merged   # commutative
    assert merge_string_props([merged, merged]) == merged        # idempotent
    if len(dicts) >= 2:                                          # associative
        left = merge_string_props(
            [merge_string_props(dicts[:1]), merge_string_props(dicts[1:])])
        assert left == merged


@settings(max_examples=100, deadline=None)
@given(texts)
def test_html_to_text_strips_all_tags(text):
    out = html_to_text(f"<html><body><p>{text}</p></body></html>")
    assert "<p>" not in out and "</p>" not in out
    # deterministic
    assert html_to_text(f"<html><body><p>{text}</p></body></html>") == out


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200), st.sampled_from([64, 256, 1024]))
def test_embed_text_unit_norm_or_zero(text, dim):
    v = embed_text(text, dim)
    n = float(np.linalg.norm(v))
    assert v.shape == (dim,)
    assert abs(n - 1.0) < 1e-5 or n == 0.0


def test_generate_schema_from_questions_e5():
    sch = generate_schema_from_questions(
        ["Who runs OpenAI?", "Which services does Acme offer?"],
        entity_vocab={"who": "person", "services": "service"},
        relation_vocab={"runs": ("person", "runs", "company"),
                        "offer": ("company", "has service", "service")},
    )
    assert {e["name"] for e in sch["entities"]} == \
        {"person", "company", "service"}
    assert {p["relation"] for p in sch["patterns"]} == {"runs", "has service"}
    # dedup across repeated questions
    again = generate_schema_from_questions(
        ["Who runs OpenAI?", "Who runs Globex?"],
        entity_vocab={"who": "person"},
        relation_vocab={"runs": ("person", "runs", "company")},
    )
    assert len(again["patterns"]) == 1
