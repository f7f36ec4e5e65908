"""Crawl-cleaning operator laws: line-level boilerplate removal semantics
(order preserved, all-boilerplate docs survive as empty rows) and URL
canonicalization cases (host case-folding, default ports, fragments,
tracking params in every position)."""

from pyspark.sql import functions as F

from knowledge_graph_studio_spark.operators.cleaning import (
    canonicalize_urls, strip_boilerplate, url_dedup_groups,
)


def test_strip_boilerplate_semantics(spark):
    docs = spark.createDataFrame(
        [(0, "NAV\ncontent zero\nFOOT"), (1, "NAV\ncontent one\nFOOT"),
         (2, "NAV\ncontent two\nFOOT"), (3, "NAV\nFOOT"),
         (4, "unique a\nunique b"), (5, "NAV\ncontent five\nFOOT")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           strip_boilerplate(docs, max_df_frac=0.5).collect()}
    assert len(got) == 6  # every doc emits a row, even all-boilerplate ones
    assert got[0]["clean_text"] == "content zero"
    assert got[0]["n_kept"] == 1 and got[0]["n_dropped"] == 2
    assert got[3]["clean_text"] == "" and got[3]["n_kept"] == 0
    assert got[3]["n_dropped"] == 2
    # rare lines survive untouched, in order
    assert got[4]["clean_text"] == "unique a\nunique b"
    assert got[4]["n_dropped"] == 0


def test_strip_boilerplate_threshold_boundary(spark):
    # a line in exactly max_df_frac of docs is KEPT (strictly-greater drop)
    docs = spark.createDataFrame(
        [(i, ("shared\n" if i < 2 else "") + f"own {i}") for i in range(4)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"] for r in
           strip_boilerplate(docs, max_df_frac=0.5).collect()}
    assert got[0] == "shared\nown 0"  # df 2/4 == 0.5, not > 0.5
    got2 = {r["doc_id"]: r["clean_text"] for r in
            strip_boilerplate(docs, max_df_frac=0.49).collect()}
    assert got2[0] == "own 0"


def test_canonicalize_urls_cases(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTP://Example.COM:80/Path?utm_source=x&q=1&utm_medium=y#frag",
         "http://example.com/Path?q=1"),
        ("https://A.org:443/p?gclid=z", "https://a.org/p"),
        ("HTTPS://a.ORG/p?utm_campaign=c", "https://a.org/p"),
        ("http://h.io/p?a=1&fbclid=f&b=2", "http://h.io/p?a=1&b=2"),
        ("http://h.io:8080/p", "http://h.io:8080/p"),  # non-default port kept
        ("http://h.io/CaseSensitive/Path", "http://h.io/CaseSensitive/Path"),
        ("/relative/path?utm_source=x", "/relative/path"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    got = {r["url"]: r["canonical_url"]
           for r in canonicalize_urls(df).collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_url_dedup_groups(spark):
    urls = spark.createDataFrame(
        [("http://a.io/x",), ("HTTP://A.IO/x#f",),
         ("http://a.io:80/x?utm_source=s",), ("http://a.io/y",)],
        "url string")
    got = {r["canonical_url"]: r for r in url_dedup_groups(urls).collect()}
    assert got["http://a.io/x"]["n_variants"] == 3
    assert got["http://a.io/x"]["first_variant"] == "HTTP://A.IO/x#f"
    assert got["http://a.io/y"]["n_variants"] == 1


def test_span_dedup_c4_semantics(spark):
    """C4's rule: EVERY occurrence of a span occurring more than once goes;
    units not covered by any duplicated span survive in order, and the hash
    and raw-span grouping modes agree."""
    from knowledge_graph_studio_spark.operators.cleaning import span_dedup

    docs = spark.createDataFrame(
        [(0, "a\nb\nc\nd\ne"), (1, "x\nb\nc\nd"), (2, "p\nq\nr\ns"),
         (3, "b\nc")],  # shorter than the span: no spans, untouched
        "doc_id long, text string")
    for hash_spans in (True, False):
        got = {r["doc_id"]: r
               for r in span_dedup(docs, hash_spans=hash_spans).collect()}
        assert got[0]["clean_text"] == "a\ne"       # b,c,d removed
        assert got[0]["n_kept"] == 2 and got[0]["n_dropped"] == 3
        assert got[1]["clean_text"] == "x"          # both occurrences go
        assert got[2]["clean_text"] == "p\nq\nr\ns"  # unique doc untouched
        assert got[3]["clean_text"] == "b\nc"       # sub-span-length doc
        assert got[3]["n_dropped"] == 0


def test_gopher_filter_rules(spark):
    """Gopher rules (Rae et al. 2021) with per-rule failure attribution:
    each rule trips independently and the failed list keeps fixed order."""
    from knowledge_graph_studio_spark.operators.textstats import gopher_filter

    passing = ("the be to of and that have with " + "word " * 50).strip()
    short = "the be only few words"                       # < 50 words
    symbols = ("the be to of and that have with "
               + "# " * 20 + "word " * 40).strip()        # symbol ratio > 0.1
    nostop = ("lorem ipsum " * 30).strip()                # < 2 gopher stops
    docs = spark.createDataFrame(
        [(0, passing), (1, short), (2, symbols), (3, nostop), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert got[0]["passes"] == 1 and got[0]["failed"] == ""
    assert got[1]["passes"] == 0 and "word_count" in got[1]["failed"]
    # the '#' tokens trip BOTH the symbol ratio and the alpha-word floor,
    # reported in fixed rule order
    assert got[2]["passes"] == 0
    assert got[2]["failed"] == "symbol_ratio,alpha_words"
    assert got[3]["passes"] == 0 and got[3]["failed"] == "stopwords"
    # empty text: fails word_count (and stopwords), never divides by zero
    assert got[4]["passes"] == 0 and "word_count" in got[4]["failed"]


def test_tracking_param_name_is_delimiter_anchored(spark):
    # ADVICE r4: a non-tracking param whose name merely CONTAINS or ENDS
    # WITH a tracking name must survive intact — the match is anchored to
    # the preceding ?/& delimiter
    cases = [
        ("http://h.io/p?xgclid=1&b=2", "http://h.io/p?xgclid=1&b=2"),
        ("http://h.io/p?autm_x=1&b=2", "http://h.io/p?autm_x=1&b=2"),
        ("http://h.io/p?a=1&myfbclid=2", "http://h.io/p?a=1&myfbclid=2"),
        # the real tracking params still go, in every position
        ("http://h.io/p?gclid=1&b=2", "http://h.io/p?b=2"),
        ("http://h.io/p?b=2&gclid=1", "http://h.io/p?b=2"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    got = {r["url"]: r["canonical_url"]
           for r in canonicalize_urls(df).collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_strip_boilerplate_regex_metachar_sep(spark):
    # ADVICE r4: a regex-metacharacter separator ('.') must split on the
    # literal character and reassemble identically
    docs = spark.createDataFrame(
        [(0, "NAV.content zero.FOOT"), (1, "NAV.content one.FOOT"),
         (2, "NAV.content two.FOOT")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           strip_boilerplate(docs, sep=".", max_df_frac=0.5).collect()}
    assert got[0]["clean_text"] == "content zero"
    assert got[0]["n_dropped"] == 2


def test_span_dedup_regex_metachar_sep(spark):
    from knowledge_graph_studio_spark.operators.cleaning import span_dedup

    docs = spark.createDataFrame(
        [(0, "a0|S1|S2|S3|z0"), (1, "a1|S1|S2|S3|z1"), (2, "a2|b2|c2|d2|z2")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup(docs, sep="|").collect()}
    assert got[0]["clean_text"] == "a0|z0" and got[0]["n_dropped"] == 3
    assert got[2]["clean_text"] == "a2|b2|c2|d2|z2"


def _decontam_fixture(spark):
    from knowledge_graph_studio_spark.operators.cleaning import decontaminate

    docs = spark.createDataFrame([
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "completely unrelated words about spark shuffles and joins"),
        (2, "prefix filler quick brown fox jumps over suffix filler"),
    ], "doc_id long, text string")
    ev = spark.createDataFrame(
        [("quick brown fox jumps over",)], "text string")
    return decontaminate, docs, ev


def test_decontaminate_planted_overlap(spark):
    decontaminate, docs, ev = _decontam_fixture(spark)
    got = {r["doc_id"]: r for r in
           decontaminate(docs, ev, n=5).collect()}
    # docs 0 and 2 contain the planted eval 5-gram; doc 1 is clean
    assert got[0]["contaminated"] == 1 and got[0]["n_hits"] == 1
    assert got[2]["contaminated"] == 1
    assert got[1]["contaminated"] == 0 and got[1]["n_hits"] == 0


def test_decontaminate_hash_and_raw_keys_agree(spark):
    decontaminate, docs, ev = _decontam_fixture(spark)
    a = sorted(map(tuple, decontaminate(docs, ev, n=5,
                                        hash_shingles=True).collect()))
    b = sorted(map(tuple, decontaminate(docs, ev, n=5,
                                        hash_shingles=False).collect()))
    assert a == b


def test_decontaminate_drop_mode_keeps_original_columns(spark):
    decontaminate, docs, ev = _decontam_fixture(spark)
    out = decontaminate(docs, ev, n=5, mode="drop")
    assert out.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_decontaminate_eval_side_broadcasts(spark):
    decontaminate, docs, ev = _decontam_fixture(spark)
    plan = decontaminate(docs, ev, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_pii_families_and_boundaries(spark):
    from knowledge_graph_studio_spark.operators.cleaning import redact_pii

    docs = spark.createDataFrame([
        (0, "mail a.b+c@sub.example.org and x@y.io now"),
        (1, "call +1 (555) 123-4567 or 555.987.6543"),
        (2, "hosts 10.0.3.44 and 192.168.1.1 up"),
        # boundary decoys: versions, long digit runs, dotted runs
        (3, "v1.2.3 release 1.2.3 and 1.2.3.4.5 chain 12345678901234"),
        (4, "ratio 3.14 date 2026.08.17 order #123-456-7890x"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[0]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert got[0]["n_emails"] == 2
    assert got[1]["redacted"] == "call <PHONE> or <PHONE>"
    assert got[1]["n_phones"] == 2
    assert got[2]["redacted"] == "hosts <IP> and <IP> up"
    assert got[2]["n_ips"] == 2
    # 3-part versions and 5-part dotted chains are NOT IPs; no phone inside
    # an unbroken 14-digit run
    assert got[3]["redacted"] == docs.collect()[3]["text"]
    assert got[3]["n_ips"] == 0 and got[3]["n_phones"] == 0
    # trailing x blocks nothing (match ends at digit boundary) but the
    # (?!\d) guard stops partial matches inside longer runs; 2026.08.17 is
    # not 3-3-4 shaped
    assert "2026.08.17" in got[4]["redacted"]
    assert got[4]["n_emails"] == 0 and got[4]["n_ips"] == 0


def test_extract_domains_registered_suffixes(spark):
    from knowledge_graph_studio_spark.operators.cleaning import (
        extract_domains,
    )

    docs = spark.createDataFrame([
        (0, "http://WWW.Example.COM:80/path?q=1"),
        (1, "https://news.bbc.co.uk/story"),
        (2, "http://user:pw@deep.sub.host.example.com/a"),
        (3, "http://localhost/x"),
        (4, "https://example.com/"),
        (5, "http://custom.two.level.test/x"),
    ], "doc_id long, url string")
    got = {r["doc_id"]: r for r in
           extract_domains(docs, extra_suffixes=("level.test",)).collect()}
    assert got[0]["host"] == "www.example.com"
    assert got[0]["registered_domain"] == "example.com"
    # two-level public suffix: last THREE labels
    assert got[1]["registered_domain"] == "bbc.co.uk"
    # userinfo stripped; deep subdomains fold to the registrable pair
    assert got[2]["host"] == "deep.sub.host.example.com"
    assert got[2]["registered_domain"] == "example.com"
    # single-label host passes through
    assert got[3]["registered_domain"] == "localhost"
    assert got[4]["registered_domain"] == "example.com"
    # caller-supplied extra suffix behaves like the built-ins
    assert got[5]["registered_domain"] == "two.level.test"


def test_domain_filter_suffix_semantics(spark):
    from knowledge_graph_studio_spark.operators.cleaning import (
        domain_filter,
    )

    docs = spark.createDataFrame([
        (0, "http://badsite.com/a"),
        (1, "http://x.y.badsite.com/b"),      # subdomain -> blocked
        (2, "http://notbadsite.com/c"),       # name-suffix only -> kept
        (3, "http://good.org/d"),
        (4, "http://ADS.Example.com/e"),      # case-folded host match
        (5, "http://example.com/f"),          # parent of a blocked sub: kept
    ], "doc_id long, url string")
    blocked = spark.createDataFrame(
        [("badsite.com",), ("Ads.example.COM",)], "domain string")
    kept = sorted(r["doc_id"] for r in
                  domain_filter(docs, blocked).collect())
    assert kept == [2, 3, 5]
    tagged = {r["doc_id"]: r["blocked"] for r in
              domain_filter(docs, blocked, mode="tag").collect()}
    assert tagged == {0: 1, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}
    # the blocklist side must broadcast: no shuffle of the doc side for
    # membership, no cartesian anywhere
    plan = domain_filter(docs, blocked)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_domain_stats_and_cap(spark):
    from knowledge_graph_studio_spark.operators.cleaning import (
        domain_cap, domain_stats,
    )

    rows = [(i, f"http://h{i % 3}.dom{i % 2}.com/p", "x" * (i + 1))
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    stats = {r["registered_domain"]: r for r in
             domain_stats(docs, text_col="text").collect()}
    assert stats["dom0.com"]["n_docs"] == 5   # even ids
    assert stats["dom0.com"]["n_hosts"] == 3  # h0/h1/h2 alternate
    assert stats["dom1.com"]["total_chars"] == sum(
        i + 1 for i in range(10) if i % 2 == 1)
    capped = domain_cap(docs, 2)
    got = sorted(r["doc_id"] for r in capped.collect())
    assert got == [0, 1, 2, 3]  # lowest two ids per domain
    assert capped.columns == docs.columns  # helper cols dropped


# --- ExactSubstr dedup (Lee et al. 2022) -----------------------------------


def _py_exact_substr(docs, k):
    occ = {}
    for d, t in docs.items():
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p:p + k]), []).append((d, p))
    cov = {d: set() for d in docs}
    for lst in occ.values():
        if len(lst) < 2:
            continue
        first = min(lst)
        for d, p in lst:
            if (d, p) != first:
                cov[d].update(range(p, p + k))
    out = {}
    for d, t in docs.items():
        toks = t.split(" ")
        keep = [tok for i, tok in enumerate(toks) if i not in cov[d]]
        out[d] = (" ".join(keep), len(keep), len(toks) - len(keep))
    return out


def _substr_corpus():
    passage = " ".join(f"shared{i}" for i in range(12))
    docs = {
        0: "intro words here " + passage + " tail zero",
        1: "other beginning " + passage + " different end one",
        2: " ".join(f"u2w{i}" for i in range(20)),          # unique
        3: "short doc",                                      # < k tokens
        # self-repeat: the same 8-token run twice within one doc
        4: ("rep0 rep1 rep2 rep3 rep4 rep5 rep6 rep7 middle "
            "rep0 rep1 rep2 rep3 rep4 rep5 rep6 rep7 done"),
    }
    return docs


def test_exact_substring_dedup_matches_reference(spark):
    from knowledge_graph_studio_spark.operators.cleaning import (
        exact_substring_dedup,
    )

    docs = _substr_corpus()
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    want = _py_exact_substr(docs, 8)
    for fam in ("raw", "xxhash64"):
        got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
               for r in exact_substring_dedup(df, k=8,
                                              hash_fn=fam).collect()}
        assert got == want, fam
    # semantic spot-checks: first occurrence survives, later ones removed
    assert "shared0" in want[0][0] and "shared0" not in want[1][0]
    assert want[4][0].count("rep0") == 1      # in-doc self-repeat collapsed
    assert want[2][1] == 20 and want[3][2] == 0   # unique/short untouched


def test_exact_substring_dedup_deterministic_under_repartition(spark):
    from knowledge_graph_studio_spark.operators.cleaning import (
        exact_substring_dedup,
    )

    docs = _substr_corpus()
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    a = sorted(map(tuple, exact_substring_dedup(df, k=8).collect()))
    b = sorted(map(tuple, exact_substring_dedup(
        df.repartition(7), k=8).collect()))
    assert a == b
