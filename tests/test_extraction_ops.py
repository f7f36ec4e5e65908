"""E1 mentions, E4 structured extraction, E6-E8 schema ops, E11 Contains."""

from pyspark.sql import functions as F

from knowledge_graph_studio_spark.operators.chunking import (
    pages_to_chunks, rows_to_object_chunks,
)
from knowledge_graph_studio_spark.operators.extraction import (
    chunks_to_mentions, contains_triples, extend_schema,
    extract_structured_triples, induce_schema, structured_patterns,
    validate_triples,
)
from knowledge_graph_studio_spark.schema_model import (
    SchemaEntity, default_gazetteer,
)
from knowledge_graph_studio_spark.sources.pages import synthetic_pages
from knowledge_graph_studio_spark.textcore import detect_mentions, page_text


def test_mentions_match_pure_python_oracle(spark):
    pages = synthetic_pages(spark, 40, seed=5, partitions=4)
    chunks = pages_to_chunks(pages)
    got = {
        (r["chunk_id"], r["name"], r["type"]): r["count"]
        for r in chunks_to_mentions(chunks, default_gazetteer()).collect()
    }
    assert got
    rows = chunks.collect()
    gaz = default_gazetteer()
    exp = {}
    for r in rows:
        for m in detect_mentions(r["content"], gaz):
            exp[(r["chunk_id"], m["name"], m["type"])] = m["count"]
    assert got == exp


def test_contains_triples_shape(spark):
    pages = synthetic_pages(spark, 20, seed=5, partitions=2)
    mentions = chunks_to_mentions(pages_to_chunks(pages), default_gazetteer())
    ct = contains_triples(mentions)
    row = ct.limit(1).collect()[0]
    assert row["relation"] == "Contains"
    assert row["head"] == row["chunk_id"] and row["head_type"] == "chunk"
    assert row["relation_properties"]["count"][0].isdigit()


def test_structured_extraction_with_unnamed_and_props(spark):
    ents = [
        SchemaEntity("person", fields={"CEO": ["CEO Age"]}),
        SchemaEntity("company", fields={"Company": ["Location"]}),
    ]
    pats = structured_patterns(ents)
    # cross product of 2 fields minus self-pairs = 2 patterns
    assert {(p["head_field"], p["tail_field"]) for p in pats} == \
        {("CEO", "Company"), ("Company", "CEO")}
    rows = spark.createDataFrame(
        [("u1", {"CEO": "Ada", "Company": "Acme", "CEO Age": "36",
                 "Location": "London"}),
         ("u2", {"CEO": "Alan"})],  # missing Company -> tail "Unnamed"
        "url string, content_obj map<string,string>",
    ).withColumn("data_type", F.lit("object")).withColumn(
        "chunk_id", F.concat_ws(":", "url", F.lit("0")))
    out = extract_structured_triples(rows, pats).collect()
    by_key = {(r["url"], r["head_field"] if False else r["head"],
               r["relation"], r["tail"]): r for r in out}
    full = by_key[("u1", "Ada", "has company", "Acme")]
    assert full["head_properties"] == {"CEO Age": ["36"]}
    assert full["tail_properties"] == {"Location": ["London"]}
    # u2: head present, tail Unnamed is kept (only both-Unnamed is dropped)
    assert ("u2", "Alan", "has company", "Unnamed") in by_key
    assert ("u2", "Unnamed", "has ceo", "Alan") in by_key


def test_schema_induce_validate_extend(spark):
    triples = spark.createDataFrame(
        [("Ada", "person", "runs", "Acme", "company"),
         ("Acme", "company", "located in", "London", "city")],
        "head string, head_type string, relation string, tail string, "
        "tail_type string",
    )
    sch = induce_schema(triples)
    assert [e["name"] for e in sch["entities"]] == \
        ["city", "company", "person"]
    assert {p["relation"] for p in sch["patterns"]} == {"runs", "located in"}

    valid, invalid = validate_triples(
        triples, [{"head_type": "person", "relation": "runs",
                   "tail_type": "company"}])
    assert valid.count() == 1 and invalid.count() == 1

    ext = extend_schema(sch, [{"head_type": "company", "relation": "acquired",
                               "tail_type": "company"}])
    assert {r["name"] for r in ext["relations"]} == \
        {"runs", "located in", "acquired"}
    assert len(ext["patterns"]) == 3
    # idempotent
    again = extend_schema(ext, [{"head_type": "company", "relation": "acquired",
                                 "tail_type": "company"}])
    assert len(again["patterns"]) == 3


def test_object_chunks_stringify_cells(spark):
    df = spark.createDataFrame([("u", 1, 2.5, True)],
                               "url string, a int, b double, c boolean")
    row = rows_to_object_chunks(df).collect()[0]
    assert row["content_obj"] == {"a": "1", "b": "2.5", "c": "true"}
    assert row["data_type"] == "object"


def test_chunk_text_byte_identical_per_url(spark):
    pages = synthetic_pages(spark, 30, seed=9, partitions=3)
    chunks = pages_to_chunks(pages).collect()
    src = {r["url"]: (r["html"], r["text"]) for r in pages.collect()}
    by_url: dict[str, list] = {}
    for c in chunks:
        by_url.setdefault(c["url"], []).append(c)
    for url, cs in by_url.items():
        full = page_text(*src[url])
        rebuilt = "".join(c["content"]
                          for c in sorted(cs, key=lambda c: c["start"]))
        assert rebuilt == full, f"byte-identical invariant broken for {url}"


def test_aggregate_chapters_c5_semantics(spark):
    """C5 (utilities/processors.py:279-338): PROLOGUE before the first
    header, case-insensitive 'CHAPTER <word>' match at line start, chapter
    key uppercased, duplicate chapter names merge (dict semantics), header
    lines are keys not content, in-book line order preserved."""
    from knowledge_graph_studio_spark.operators.chunking import (
        aggregate_chapters, chapter_counts,
    )

    book = [
        "intro line one",
        "intro line two",
        "CHAPTER One",
        "first chapter text",
        "chapter two  ",          # lowercase header still matches
        "second chapter text",
        "CHAPTER one",            # duplicate name -> merges into CHAPTER ONE
        "more of chapter one",
        "the chapter word mid-line does not match",
    ]
    # b2: starts with a header (empty PROLOGUE) and has an empty chapter
    # (header immediately followed by another header) — the reference keeps
    # BOTH keys with [] (processors.py:309-324, ADVICE r3)
    book2 = ["CHAPTER Alpha", "CHAPTER Beta", "beta text"]
    lines = spark.createDataFrame(
        [("b1", i, ln) for i, ln in enumerate(book)]
        + [("b2", i, ln) for i, ln in enumerate(book2)],
        "book_id string, line_no long, line string")
    rows = aggregate_chapters(lines).collect()
    got = {r["chapter"]: r for r in rows if r["book_id"] == "b1"}
    got2 = {r["chapter"]: r for r in rows if r["book_id"] == "b2"}
    assert got["PROLOGUE"]["lines"] == ["intro line one", "intro line two"]
    # the duplicate 'CHAPTER one' header switches current_chapter BACK, so
    # the trailing line merges into CHAPTER ONE (reference dict semantics)
    assert got["CHAPTER ONE"]["lines"] == [
        "first chapter text", "more of chapter one",
        "the chapter word mid-line does not match"]
    assert got["CHAPTER TWO"]["lines"] == ["second chapter text"]
    assert set(got) == {"PROLOGUE", "CHAPTER ONE", "CHAPTER TWO"}
    assert set(got2) == {"PROLOGUE", "CHAPTER ALPHA", "CHAPTER BETA"}
    assert got2["PROLOGUE"]["lines"] == []          # empty but present
    assert got2["PROLOGUE"]["n_lines"] == 0
    assert got2["CHAPTER ALPHA"]["lines"] == []     # empty chapter kept
    assert got2["CHAPTER ALPHA"]["first_line_no"] is None
    assert got2["CHAPTER BETA"]["lines"] == ["beta text"]
    counts = {r["book_id"]: r["chapter_count"]
              for r in chapter_counts(aggregate_chapters(lines)).collect()}
    # PROLOGUE excluded (processors.py:330-333); empty chapters counted
    assert counts == {"b1": 2, "b2": 2}
