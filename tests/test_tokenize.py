"""BPE laws: exact equality with an independently written reference
implementation (regex-based, Sennrich-style), roundtrip reconstruction,
and determinism under repartition."""

import re
from collections import Counter

from pyspark.sql import functions as F

from knowledge_graph_studio_spark.operators.tokenize import (
    EOW, bpe_segment, bpe_token_counts, fit_bpe, word_counts,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wider wide widest wider",
    "low new wide lower",
]


def _ref_fit(texts, num_merges):
    """Independent reference: Counter + regex replacement (the original
    subword-nmt style), instead of the engine's dict/tuple rewrite."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[" ".join(list(w) + [EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for word, n in vocab.items():
            syms = word.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)")
        vocab = Counter(
            {pat.sub("".join(best), w): n for w, n in vocab.items()})
    return merges


def _ref_segment(word, merges):
    syms = list(word) + [EOW]
    ranks = {m: i for i, m in enumerate(merges)}
    while True:
        cands = [(ranks[p], i) for i, p in enumerate(zip(syms, syms[1:]))
                 if p in ranks]
        if not cands:
            return syms
        _, i = min(cands)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]


def _df(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_fit_bpe_matches_reference(spark):
    for k in (1, 5, 12):
        assert fit_bpe(_df(spark), k) == _ref_fit(CORPUS, k)


def test_fit_bpe_deterministic_under_repartition(spark):
    d = _df(spark)
    assert fit_bpe(d, 10) == fit_bpe(d.repartition(7), 10)


def test_fit_bpe_pre_counted(spark):
    d = _df(spark)
    wc = word_counts(d)
    assert fit_bpe(wc, 8, pre_counted=True) == fit_bpe(d, 8)


def test_segment_matches_reference_and_roundtrips(spark):
    d = _df(spark)
    merges = fit_bpe(d, 10)
    seg = {r["doc_id"]: list(r["tokens"])
           for r in bpe_segment(d, merges).collect()}
    for i, text in enumerate(CORPUS):
        want = []
        for w in text.split(" "):
            want.extend(_ref_segment(w, merges))
        assert seg[i] == want
        # roundtrip: EOW marks word ends exactly
        assert "".join(seg[i]).replace(EOW, " ").strip() == text


def test_segment_unseen_words_fall_back_to_chars(spark):
    d = _df(spark)
    merges = fit_bpe(d, 5)
    out = bpe_segment(
        _df(spark, ["zzq xyzzy"]), merges).collect()[0]
    toks = list(out["tokens"])
    assert "".join(toks).replace(EOW, " ").strip() == "zzq xyzzy"
    # unseen chars stay unmerged (no merge rule can apply)
    assert all(len(t.replace(EOW, "")) <= max(
        len(a + b) for a, b in merges) for t in toks)


def test_bpe_token_counts_and_empty_merges(spark):
    d = _df(spark)
    merges = fit_bpe(d, 10)
    seg = bpe_segment(d, merges)
    cnt = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_token_counts(d, merges).collect()}
    for r in seg.collect():
        assert cnt[r["doc_id"]] == len(r["tokens"])
    # zero merges -> pure character+EOW stream
    chars = bpe_segment(d, []).collect()
    for r in chars:
        i = r["doc_id"]
        n_chars = sum(len(w) + 1 for w in CORPUS[i].split(" ") if w)
        assert r["bpe_tokens"] == n_chars


def test_segment_deterministic_under_repartition(spark):
    d = _df(spark)
    merges = fit_bpe(d, 10)
    a = sorted((r["doc_id"], tuple(r["tokens"]))
               for r in bpe_segment(d, merges).collect())
    b = sorted((r["doc_id"], tuple(r["tokens"]))
               for r in bpe_segment(d.repartition(5), merges).collect())
    assert a == b


def test_word_counts_is_one_aggregation(spark):
    plan = (word_counts(_df(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1  # single shuffle, map-side combined


# --- property laws (pure python, hypothesis) -------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from knowledge_graph_studio_spark.operators.tokenize import (  # noqa: E402
    _segment_word,
)

_words = st.lists(st.text(alphabet="abc", min_size=1, max_size=6),
                  min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(_words, st.integers(min_value=0, max_value=12))
def test_bpe_segment_roundtrips_and_matches_reference(words, n_merges):
    """For ANY corpus and ANY merge budget: the engine encoder applied to
    the reference-fit merge table (a) reconstructs every word exactly and
    (b) equals the independent reference encoder token-for-token."""
    merges = _ref_fit([" ".join(words)], n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in words:
        seg = _segment_word(w, ranks)
        assert "".join(seg) == w + EOW
        assert seg == _ref_segment(w, merges)


@settings(max_examples=100, deadline=None)
@given(_words)
def test_bpe_full_merge_budget_collapses_words(words):
    """With an unbounded merge budget every in-corpus word becomes a
    single token (BPE converges to the word vocabulary)."""
    budget = sum(len(w) + 1 for w in set(words))
    merges = _ref_fit([" ".join(words)], budget)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in words:
        assert _segment_word(w, ranks) == [w + EOW]
