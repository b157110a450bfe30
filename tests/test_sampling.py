"""Training-data curation ops (operators/sampling.py): determinism,
rate fidelity, shuffle-freedom, URL host extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.sampling import (
    domain_stats,
    stratified_sample,
    train_val_split,
    url_domain,
)


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("zh"), F.lit("de")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"en": 0.5, "es": 0.2, "zh": 0.0}
    s1 = stratified_sample(docs, "doc_id", "lang", rates, seed="9",
                           default_rate=1.0)
    s2 = stratified_sample(docs, "doc_id", "lang", rates, seed="9",
                           default_rate=1.0)
    r1 = {(r["doc_id"], r["lang"]) for r in s1.collect()}
    r2 = {(r["doc_id"], r["lang"]) for r in s2.collect()}
    assert r1 == r2  # bit-stable across runs
    per = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per.get("zh", 0) == 0  # rate 0 drops everything
    assert per["de"] == 1000  # default_rate 1.0 keeps everything
    # 1000 docs/stratum, md5 uniform: expect rate±~5%
    assert abs(per["en"] / 1000 - 0.5) < 0.05
    assert abs(per["es"] / 1000 - 0.2) < 0.05
    # a different seed draws a different (but equally sized-ish) set
    s3 = stratified_sample(docs, "doc_id", "lang", rates, seed="10",
                           default_rate=1.0)
    r3 = {(r["doc_id"], r["lang"]) for r in s3.collect()}
    assert r3 != r1


def test_sample_is_shuffle_free(spark):
    docs = _docs(spark)
    plan = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5}, seed="1"
    )._jdf.queryExecution().executedPlan().toString()
    # the mixture spec arrives via broadcast; the corpus itself must
    # never hash-repartition
    assert "Exchange hashpartitioning" not in plan


def test_sampling_ops_draw_independently(spark):
    """Composing sample → split under the SAME seed must not correlate:
    without per-op hash salts, every survivor of a rate-r sample with
    val_fraction f >= r would land in 'val' (empty train split)."""
    docs = _docs(spark)
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.1}, seed="42", default_rate=0.0
    )
    out = train_val_split(kept, "doc_id", val_fraction=0.1, seed="42")
    per = {r["split"]: r["n"] for r in
           out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(per.values())
    assert total > 50  # the sample itself kept ~0.1 * 1000 'en' docs
    # train must dominate: val stays near 10% of the sample, not 100%
    assert per.get("train", 0) / total > 0.8


def test_train_val_split_stable_and_disjoint(spark):
    docs = _docs(spark)
    out = train_val_split(docs, "doc_id", val_fraction=0.25, seed="5")
    rows = out.collect()
    assert {r["split"] for r in rows} == {"train", "val"}
    n_val = sum(1 for r in rows if r["split"] == "val")
    assert abs(n_val / len(rows) - 0.25) < 0.03
    # same doc -> same split on recompute (contamination guarantee)
    again = {r["doc_id"]: r["split"] for r in
             train_val_split(docs, "doc_id", 0.25, seed="5").collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_url_domain_forms(spark):
    cases = [
        ("https://WWW.Example.COM/path?q=1", "www.example.com"),
        ("http://user:pw@Sub.host.org:8080/x", "sub.host.org"),
        ("ftp://files.example.net", "files.example.net"),
        ("bare.example.io/no/scheme", "bare.example.io"),
        ("host-only.de", "host-only.de"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["d"] for r in df.select(url_domain(F.col("url")).alias("d")).collect()]
    assert got == [d for _, d in cases]


def test_pack_sequences_invariants(spark):
    from graphrag_kb_server_spark.operators.sampling import pack_sequences

    docs = spark.range(500).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 97 * 7 + 10).alias("n_tokens"),  # 10..682
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", budget=600, n_buckets=4)
    rows = out.collect()
    assert len(rows) == 500  # every doc placed exactly once
    # bin capacity: total tokens per (bucket, bin) <= budget, except a
    # bin holding a single oversize doc
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r["bucket"], r["bin_ix"])].append(r)
    for members in bins.values():
        total = sum(r["tokens"] for r in members)
        if total > 600:
            assert len(members) == 1 and members[0]["oversize"]
    # oversize flag matches the contract
    for r in rows:
        assert r["oversize"] == (r["tokens"] >= 600)
    # deterministic across runs
    again = pack_sequences(docs, "doc_id", "n_tokens", 600, n_buckets=4)
    assert {(r["id"], r["bucket"], r["bin_ix"]) for r in rows} == {
        (r["id"], r["bucket"], r["bin_ix"]) for r in again.collect()
    }
    # FFD actually packs: non-oversize bins are well filled on average
    # (FFD's asymptotic fill is >= ~0.7; allow slack for small buckets)
    reg = [m for m in bins.values() if not any(r["oversize"] for r in m)]
    fill = sum(sum(r["tokens"] for r in m) for m in reg) / (600.0 * len(reg))
    assert fill > 0.6
    assert len(bins) < 500  # strictly fewer bins than docs


def test_pack_sequences_matches_golden_twin(spark):
    """Distributed applyInPandas packing == the sequential pure-python
    twin (independent re-derivation of hash, order, and placement)."""
    from graphrag_kb_server_spark import golden
    from graphrag_kb_server_spark.functions import text as TXT
    from graphrag_kb_server_spark.operators.sampling import pack_sequences
    from graphrag_kb_server_spark import corpus as corpus_mod

    pages = corpus_mod.generate(spark, 60)
    toks = pages.select(
        "url",
        F.size(
            F.split(F.regexp_replace(TXT.extract_text(F.col("text"), F.col("url")), r"^\s+|\s+$", ""), r"\s+")
        ).alias("n_tokens"),
    )
    got = {
        (r["id"], r["tokens"], r["bucket"], r["bin_ix"], r["oversize"])
        for r in pack_sequences(toks, "url", "n_tokens", 512, n_buckets=8).collect()
    }
    want = {
        tuple(t)
        for t in golden.golden_pack_sequences(60).itertuples(index=False)
    }
    assert got == want


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [("https://a.com/1", 100), ("https://a.com/2", 300),
         ("http://b.org/x", 50)],
        "source string, n_chars bigint",
    )
    rows = {r["domain"]: r for r in domain_stats(df).collect()}
    assert rows["a.com"]["n_docs"] == 2
    assert rows["a.com"]["total_chars"] == 400
    assert rows["a.com"]["mean_chars"] == 200.0
    assert rows["b.org"]["n_docs"] == 1


def _brute_cap(rows, cap):
    """Reference semantics: per domain, the cap smallest (hash, id)."""
    import hashlib
    from collections import defaultdict

    by_dom = defaultdict(list)
    for doc_id, dom in rows:
        payload = f"{doc_id}\x1fdomcap\x1f7".encode()
        h = int(hashlib.md5(payload).hexdigest()[:8], 16)
        by_dom[dom].append((h, doc_id))
    keep = set()
    for dom, items in by_dom.items():
        for _, doc_id in sorted(items)[:cap]:
            keep.add((doc_id, dom))
    return keep


def _cap_input(spark):
    # one mega-domain (600 rows), one mid (40), several small (<= cap)
    return spark.range(700).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 600, F.lit("mega.com"))
        .when(F.col("id") < 640, F.lit("mid.org"))
        .otherwise(
            F.concat(F.lit("tiny"), (F.col("id") % 5).cast("string"),
                     F.lit(".net"))
        ).alias("source"),
    )


def test_domain_cap_exact_and_passthrough(spark):
    from graphrag_kb_server_spark.operators.sampling import domain_cap

    docs = _cap_input(spark)
    out = domain_cap(docs, "doc_id", url_col="source", cap=25, seed="7",
                     margin=4.0)
    got = {(r.doc_id, r.domain) for r in out.collect()}
    want = _brute_cap(
        [(r.doc_id, r.source) for r in docs.collect()], cap=25
    )
    assert got == want
    # small domains pass through untouched (12 docs each < cap)
    per_dom = {r.domain: r.n for r in
               out.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    assert per_dom["mega.com"] == 25 and per_dom["mid.org"] == 25
    for d, n in per_dom.items():
        if d.startswith("tiny"):
            assert n == 12


def test_domain_cap_fallback_branch_is_exact(spark):
    """margin=0.05 makes the prefilter keep ~1-2 rows per oversized
    domain (< cap) — the fallback re-rank must restore exactness."""
    from graphrag_kb_server_spark.operators.sampling import domain_cap

    docs = _cap_input(spark)
    out = domain_cap(docs, "doc_id", url_col="source", cap=25, seed="7",
                     margin=0.05)
    got = {(r.doc_id, r.domain) for r in out.collect()}
    want = _brute_cap(
        [(r.doc_id, r.source) for r in docs.collect()], cap=25
    )
    assert got == want


def test_domain_cap_deterministic_across_partitionings(spark):
    from graphrag_kb_server_spark.operators.sampling import domain_cap

    docs = _cap_input(spark)
    a = domain_cap(docs.repartition(1), "doc_id", cap=10, seed="3")
    b = domain_cap(docs.repartition(13), "doc_id", cap=10, seed="3")
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_temperature_sample_flattens_mixture(spark):
    """alpha<1 must upsample tail strata and downsample the head; the
    realized rates must match the analytic q_l formula."""
    import math

    from graphrag_kb_server_spark.operators.sampling import (
        temperature_sample,
    )

    # Zipf-ish: en 3200, es 640, zh 128, de 32
    sizes = {"en": 3200, "es": 640, "zh": 128, "de": 32}
    parts = []
    off = 0
    for lang, n in sizes.items():
        parts.append(
            spark.range(off, off + n).select(
                F.col("id").alias("doc_id"), F.lit(lang).alias("lang")
            )
        )
        off += n
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)

    alpha, frac = 0.3, 0.25
    out = temperature_sample(docs, "doc_id", "lang", alpha=alpha,
                             target_fraction=frac, seed="11")
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}

    N = sum(sizes.values())
    zsum = sum((n / N) ** alpha for n in sizes.values())
    for lang, n in sizes.items():
        rate = min(1.0, (n / N) ** alpha / zsum * frac * N / n)
        expect = rate * n
        sd = math.sqrt(n * rate * (1 - rate)) if rate < 1 else 0.0
        assert abs(got.get(lang, 0) - expect) <= max(5 * sd, 2), (
            lang, got.get(lang, 0), expect)
    # head rate < tail rate (flattening), and tiny stratum clips at 1.0
    n_en, n_de = got["en"], got.get("de", 0)
    assert n_en / sizes["en"] < n_de / sizes["de"]
    rate_de = min(1.0, (sizes["de"] / N) ** alpha / zsum * frac
                  * N / sizes["de"])
    assert rate_de == 1.0 and n_de == sizes["de"]


def test_temperature_sample_deterministic(spark):
    from graphrag_kb_server_spark.operators.sampling import (
        temperature_sample,
    )

    docs = _docs(spark, 1000)
    a = temperature_sample(docs, "doc_id", "lang", seed="2")
    b = temperature_sample(docs.repartition(7), "doc_id", "lang", seed="2")
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_split_leak_audit(spark):
    from graphrag_kb_server_spark.operators.sampling import (
        split_leak_audit,
    )

    split = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "val"), (5, "val")],
        "id long, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.9),   # val 2 leaks via train 1
         (2, 3, 0.8),   # val 2 leaks again via train 3
         (4, 5, 0.99),  # val-val pair: NOT a leak
         (1, 3, 0.7)],  # train-train pair: not a leak
        "a long, b long, cos double",
    )
    out = {r.id: r for r in
           split_leak_audit(split, pairs, "id", score_col="cos").collect()}
    assert set(out) == {2}
    assert out[2].n_train_neighbors == 2
    assert out[2].max_score == 0.9


def test_weighted_sample_without_replacement(spark):
    import hashlib
    import math

    from graphrag_kb_server_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, float(1 + i % 7)) for i in range(500)]
    rows.append((999, 1e9))    # giant weight: certain inclusion
    rows.append((998, 0.0))    # zero weight: certain exclusion
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", k=40, seed="8")
    got = [(r.id, r._key) for r in out.collect()]
    assert len(got) == 40
    ids = {i for i, _ in got}
    assert 999 in ids and 998 not in ids

    # exact twin: same hash, same formula, same rounding
    def key(i, w):
        payload = f"{i}\x1fwsample\x1f8".encode()
        u = int(hashlib.md5(payload).hexdigest()[:8], 16) / 2**32
        return round(math.log(u) / w, 9)

    want = sorted(
        ((i, key(i, w)) for i, w in rows if w > 0),
        key=lambda t: (-t[1], t[0]),
    )[:40]
    assert got == want

    # partitioning-invariant
    out2 = weighted_sample(df.repartition(13), "id", "w", k=40, seed="8")
    assert [(r.id, r._key) for r in out2.collect()] == got


def test_weighted_sample_respects_weights(spark):
    """Across 60 seeds, heavy items must be sampled far more often."""
    from graphrag_kb_server_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, 10.0 if i < 10 else 1.0) for i in range(110)],
        "id long, w double",
    )
    heavy = light = 0
    for s in range(60):
        ids = {r.id for r in
               weighted_sample(df, "id", "w", k=11, seed=str(s)).collect()}
        heavy += sum(1 for i in ids if i < 10)
        light += sum(1 for i in ids if i >= 10)
    # heavy items are 10/110 of rows with 10x weight: inclusion rate
    # should be several times the light rate per item
    assert heavy / 10 > 3 * (light / 100)


def test_group_split_no_leakage(spark):
    from graphrag_kb_server_spark.operators.sampling import group_split

    docs = spark.createDataFrame(
        [(i, f"host{i % 23}") for i in range(900)],
        "doc_id long, domain string",
    )
    out = group_split(
        docs, "domain", {"train": 0.7, "val": 0.2, "test": 0.1}, seed="3"
    )
    # every group entirely inside ONE split
    leak = (
        out.select("domain", "split").distinct()
        .groupBy("domain").count().where("count > 1").count()
    )
    assert leak == 0
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # deterministic across partitionings
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in
         group_split(docs.repartition(7), "domain",
                     {"train": 0.7, "val": 0.2, "test": 0.1},
                     seed="3").collect()}
    assert a == b
