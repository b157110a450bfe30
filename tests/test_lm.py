"""Bigram-LM perplexity scoring (operators/lm.py): hand-computed
probabilities, transfer-mode smoothing fallbacks, short-doc handling,
and the fluent-vs-shuffled ranking property."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.lm import (
    bigram_lm,
    bm25_topk,
    lm_perplexity,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_bigram_lm_counts(spark):
    docs = _df(spark, [("a", "the cat sat"), ("b", "the cat ran")])
    m = {(r.w1, r.w2): (r.c_bigram, r.c_context)
         for r in bigram_lm(docs, "doc_id", "text").collect()}
    # bigrams: (the,cat) x2, (cat,sat), (cat,ran)
    assert m[("the", "cat")] == (2, 2)
    assert m[("cat", "sat")] == (1, 2)
    assert m[("cat", "ran")] == (1, 2)
    assert len(m) == 3


def test_lm_perplexity_hand_computed(spark):
    docs = _df(spark, [("a", "the cat sat"), ("b", "the cat ran")])
    out = {r.doc_id: r for r in
           lm_perplexity(docs, "doc_id", "text", k=0.5).collect()}
    # vocab = distinct contexts {the, cat} -> V = 2
    p_the_cat = (2 + 0.5) / (2 + 0.5 * 2)
    p_cat_sat = (1 + 0.5) / (2 + 0.5 * 2)
    nll = -(math.log(p_the_cat) + math.log(p_cat_sat)) / 2
    assert out["a"].n_bigrams == 2
    assert abs(out["a"].nll - round(nll, 6)) < 1e-9
    assert abs(out["a"].ppl - round(math.exp(round(nll, 6)), 4)) < 1e-9
    assert out["a"].nll == out["b"].nll  # symmetric corpus


def test_lm_transfer_mode_unseen_fallbacks(spark):
    """Unseen bigram with a seen context uses c(w1); a fully unseen
    context hits the smoothing floor k/(kV)."""
    train = _df(spark, [("t", "the cat sat the cat ran")])
    model = bigram_lm(train, "doc_id", "text")
    test = _df(spark, [("x", "the dog"), ("y", "zebra quux")])
    out = {r.doc_id: r for r in
           lm_perplexity(test, "doc_id", "text", model=model, k=0.5)
           .collect()}
    # train contexts: the(x2), cat(x2), sat(x1) -> V = 3
    p_the_dog = 0.5 / (2 + 0.5 * 3)        # seen context, unseen pair
    p_floor = 0.5 / (0 + 0.5 * 3)          # unseen context
    assert abs(out["x"].nll - round(-math.log(p_the_dog), 6)) < 1e-9
    assert abs(out["y"].nll - round(-math.log(p_floor), 6)) < 1e-9


def test_lm_short_docs_reported_null(spark):
    docs = _df(spark, [("a", "one"), ("b", ""), ("c", "two words")])
    out = {r.doc_id: r for r in
           lm_perplexity(docs, "doc_id", "text").collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"].n_bigrams == 0 and out["a"].nll is None
    assert out["b"].n_bigrams == 0 and out["b"].ppl is None
    assert out["c"].n_bigrams == 1


def test_lm_fluent_beats_shuffled(spark):
    """The curation property: natural repetition of common bigrams
    scores lower perplexity than the same unigrams in a rare order."""
    base = "the cat sat on the mat and the cat ran to the mat"
    docs = _df(spark, [
        ("f1", base), ("f2", base), ("f3", base),
        ("g", "mat the to cat on sat ran the and mat cat the the"),
    ])
    out = {r.doc_id: r.ppl for r in
           lm_perplexity(docs, "doc_id", "text").collect()}
    assert out["f1"] < out["g"]


def test_pmi_collocations(spark):
    """'new york' always co-occurs (high PMI); 'the the' is frequent
    but independent (PMI near 0); min_count filters rare pairs."""
    import math

    rows = []
    for i in range(30):
        rows.append((f"d{i}", "new york is the city the people the like"))
    rows.append(("x", "rare pair here"))
    docs = _df(spark, rows)
    from graphrag_kb_server_spark.operators.lm import pmi_collocations

    res = pmi_collocations(docs, "doc_id", "text", min_count=5, top_k=50)
    out = {(r.w1, r.w2): r for r in res.collect()}
    assert ("rare", "pair") not in out          # min_count
    assert ("new", "york") in out
    # hand-check: c(new,york)=30, N=8*30+2=242, c1(new)=30, c2(york)=30
    want = round(math.log(30 * 242 / (30 * 30)), 6)
    assert abs(out[("new", "york")].pmi - want) < 1e-9
    # 'the like' vs 'new york': "the" appears 3x/doc in slot1 => lower pmi
    assert out[("new", "york")].pmi > out[("the", "like")].pmi


def test_bm25_topk(spark):
    """Hand-checkable BM25: rarer query terms dominate; tf saturates;
    the query-matching doc outranks partial matches."""
    import math

    docs = _df(spark, [
        ("a", "spark shuffle join " * 3),           # both terms, tf 3
        ("b", "spark spark spark spark spark x y"), # common term only
        ("c", "shuffle only here"),                 # rare term, tf 1
        ("d", "nothing relevant at all"),
        ("e", "spark here"),
    ])
    out = [(r.doc_id, r.score) for r in
           bm25_topk(docs, "doc_id", "text", "spark shuffle", k=5)
           .collect()]
    ids = [i for i, _ in out]
    assert ids[0] == "a"              # matches both terms
    assert "d" not in ids             # no query term
    # independent recompute for doc 'a'
    N, avgdl = 5.0, (9 + 7 + 3 + 4 + 2) / 5.0
    def idf(df_):
        return math.log(1 + (N - df_ + 0.5) / (df_ + 0.5))
    def part(tf, dl, df_):
        return idf(df_) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    want_a = round(part(3, 9, 3.0) + part(3, 9, 2.0), 6)
    got = dict(out)
    assert abs(got["a"] - want_a) < 1e-9


def test_trigram_stupid_backoff(spark):
    """Hand-computed: seen trigram, bigram-backoff, unigram-backoff,
    and unseen-word floor."""
    import math

    from graphrag_kb_server_spark.operators.lm import trigram_backoff_nll

    train = _df(spark, [("t", "a b c d b c e")])
    # train trigrams: abc bcd cdb dbc bce; c(w2)=counts in w2 slot
    test = _df(spark, [
        ("x", "a b c"),    # seen trigram: c3(abc)=1 / c12(ab)=1 -> 1.0
        ("y", "z b c"),    # unseen tri, seen bigram (b,c): .4 * c23(bc)=2/c2(b)=2
        ("z", "z z c"),    # unseen tri+bigram, seen unigram c: .16 * cu(c)/N
        ("w", "z z q"),    # q unseen anywhere: .16 * 0.5/N
    ])
    out = {r.doc_id: r for r in
           trigram_backoff_nll(test, "doc_id", "text", train=train)
           .collect()}
    N = 7.0
    assert out["x"].nll == round(-math.log(1.0), 6)
    assert out["y"].nll == round(-math.log(0.4 * 2 / 2), 6)
    assert out["z"].nll == round(-math.log(0.16 * 2 / N), 6)
    assert out["w"].nll == round(-math.log(0.16 * 0.5 / N), 6)
    assert out["x"].n_trigrams == 1
