"""Pure-function law tests — ports of the reference's unit-test targets
(SURVEY.md §5): merge_dicts doctest laws (graph_service.py:247-277), splitter
offsets (crud/chunks.py:198-231), cleaners, verbalization, extraction."""

from knowledge_graph_studio_spark import textcore as tc


def test_merge_dicts_reference_laws():
    # the exact example set from the reference's doctests
    assert tc.merge_dicts({"a": 1, "b": 2}, {"b": 3, "c": 4}) == {
        "a": 1, "b": [2, 3], "c": 4}
    assert tc.merge_dicts({"a": [1, 2], "b": [3]}, {"a": [4], "b": [5], "c": [6]}) == {
        "a": [1, 2, 4], "b": [3, 5], "c": [6]}
    assert tc.merge_dicts({"a": {"x": 1}, "b": {"y": 2}},
                          {"a": {"z": 3}, "b": {"y": 4}, "c": {"w": 5}}) == {
        "a": {"x": 1, "z": 3}, "b": {"y": [2, 4]}, "c": {"w": 5}}
    assert tc.merge_dicts({"a": [1, 2], "b": {"x": 3}}, {"a": {"y": 4}, "b": [5]}) == {
        "a": [1, 2, {"y": 4}], "b": [{"x": 3}, 5]}
    assert tc.merge_dicts({"a": [1, 2], "b": 3}, {"a": 4, "b": [5, 6]}) == {
        "a": [1, 2, 4], "b": [3, 5, 6]}
    assert tc.merge_dicts({"a": 1, "b": 2}, {"a": 1, "b": 3}) == {"a": 1, "b": [2, 3]}


def test_merge_string_props_commutative_idempotent():
    a = {"k": ["2", "1"]}
    b = {"k": ["3", "1"], "m": ["x"]}
    ab = tc.merge_string_props([a, b])
    ba = tc.merge_string_props([b, a])
    assert ab == ba == {"k": ["1", "2", "3"], "m": ["x"]}
    assert tc.merge_string_props([ab, a]) == ab  # idempotent


def test_splitter_offsets_and_cap():
    text = "para one. " * 300 + "\n\n" + "para two continues. " * 200
    chunks = tc.split_text_into_chunks(text)
    assert all(len(c["content"]) <= tc.MAX_CHARS_PER_CHUNK for c in chunks)
    # exact contiguous offsets: text reassembles byte-identically
    assert "".join(c["content"] for c in chunks) == text
    for c in chunks:
        assert text[c["start"]:c["end"]] == c["content"]
    # page_number threading (reference page offset variant)
    with_page = tc.split_text_into_chunks(text, page_number=3)
    assert all(c["page"] == 3 for c in with_page)


def test_clean_text_reference_semantics():
    assert tc.clean_text("He_llo,  world!! (x)") == "He llo, world x"
    assert tc.clean_text("a_b;c.d") == "a b;c.d"
    assert tc.remove_punctuation("Hello, World!") == "hello world"
    assert tc.count_frequency("OpenAI rocks. openai!", "OpenAI") == 2


def test_html_to_text_deterministic_spec():
    html = (b"<html><head><title>T</title><script>x</script></head>"
            b"<body><p>A &amp; B</p><div>C<span>D</span></div>"
            b"<!-- nope --><p>&#65;&#x42;</p></body></html>")
    # <head> subtree (incl. title) is dropped per spec
    assert tc.html_to_text(html) == "A & B\nCD\nAB"
    # idempotent byte-identity: same input -> same output
    assert tc.html_to_text(html) == tc.html_to_text(html.decode())


def test_verbalization_reference_format():
    t = {
        "head": "OpenAI", "head_type": "company",
        "relation": "has_service", "tail": "graph search", "tail_type": "service",
        "head_properties": {"Location": "SF"},
        "relation_properties": {"since": "2023"},
    }
    s = tc.convert_triple_to_text(t)
    assert s == ("OpenAI which is a company with Location of SF has service "
                 "graph search, a service due to since of 2023")


def test_extraction_finds_planted_fact():
    gaz = {"ada lovelace": ("Ada Lovelace", "person"),
           "openai": ("OpenAI", "company")}
    pats = [{"head_type": "person", "relation": "runs", "tail_type": "company",
             "triggers": ["runs", "leads"]}]
    got = tc.extract_pattern_triples(
        "We know Ada Lovelace runs OpenAI. Nothing else.", pats, gaz)
    assert got == [{"head": "Ada Lovelace", "head_type": "person",
                    "relation": "runs", "tail": "OpenAI", "tail_type": "company"}]
    # no trigger between mentions -> no triple
    assert tc.extract_pattern_triples(
        "Ada Lovelace met OpenAI staff.", pats, gaz) == []
    # tail before head -> no triple (direction matters)
    assert tc.extract_pattern_triples(
        "OpenAI runs Ada Lovelace.", pats, gaz) == []


def test_mention_longest_surface_wins():
    gaz = {"open ai": ("Open AI", "company"), "ai": ("AI", "field")}
    ms = tc.detect_mentions("Open AI is here", gaz)
    assert [m["name"] for m in ms] == ["Open AI"]


def test_zeroshot_extraction_e3():
    from knowledge_graph_studio_spark.textcore import extract_zeroshot_triples

    gaz = {"ada lovelace": ("Ada Lovelace", "person"),
           "acme corp": ("Acme Corp", "company"),
           "globex": ("Globex", "company")}
    text = ("Ada Lovelace founded Acme Corp. "
            "Acme Corp later merged quietly and amicably with Globex over many years. "
            "Globex thrived.")
    got = extract_zeroshot_triples(text, gaz)
    assert {"head": "Ada Lovelace", "head_type": "person",
            "relation": "founded",
            "tail": "Acme Corp", "tail_type": "company"} in got
    # 8-word gap exceeds the max_rel_words guard (the "count(',')==2" analog)
    assert not any(t["head"] == "Acme Corp" and t["tail"] == "Globex"
                   for t in got)
    assert extract_zeroshot_triples(text, gaz) == got  # deterministic


def test_split_chunks_overlap_windows():
    from knowledge_graph_studio_spark.textcore import split_text_into_chunks

    text = "word " * 200  # 1000 chars
    chunks = split_text_into_chunks(text.strip(), max_chars=100, overlap=20)
    # exact offsets always hold
    t = text.strip()
    for ch in chunks:
        assert t[ch["start"]:ch["end"]] == ch["content"]
    # consecutive windows overlap by ~20 chars (boundary-adjusted, > 0)
    for a, b in zip(chunks, chunks[1:]):
        assert 0 < a["end"] - b["start"] <= 20
    # full coverage: every position belongs to some chunk
    covered = set()
    for ch in chunks:
        covered.update(range(ch["start"], ch["end"]))
    assert covered == set(range(len(t)))
    # overlap=0 reproduces the legacy exact partition
    legacy = split_text_into_chunks(t, max_chars=100)
    assert legacy == split_text_into_chunks(t, max_chars=100, overlap=0)
    assert [c["start"] for c in legacy][1:] == [c["end"] for c in legacy][:-1]


def test_split_chunks_overlap_bounds():
    import pytest as _pytest

    from knowledge_graph_studio_spark.textcore import split_text_into_chunks

    with _pytest.raises(ValueError):
        split_text_into_chunks("abc", max_chars=10, overlap=10)
    # maximal legal overlap still terminates (forward-progress guard)
    out = split_text_into_chunks("a" * 50, max_chars=10, overlap=9)
    assert out[-1]["end"] == 50 and len(out) < 60
