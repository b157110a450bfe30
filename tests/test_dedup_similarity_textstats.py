import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from graphrag_kb_server_spark.operators.linking import (
    abbreviation_pairs,
    candidate_pairs,
    canonical_map,
)
from graphrag_kb_server_spark.operators.similarity import (
    brute_force_topk_batch,
    ivf_topk_batch,
)
from graphrag_kb_server_spark.operators.textstats import (
    bpe_ish_token_count,
    extract_links,
    language_id,
    quality_features,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"
NEAR = "the quick brown fox jumps over the lazy dog and runs far away now"
OTHER = "completely different content about spark shuffle partitions and joins here"


def _docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "text", "id").orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 3, 4]
    assert out[0]["dup_group_size"] == 2


def test_minhash_lsh_finds_near_dup(spark):
    pairs = minhash_lsh_pairs(_docs(spark), "text", "id", num_hashes=16, bands=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got  # exact dup always collides
    assert (1, 3) in got or (2, 3) in got  # near dup shares most shingles
    assert (1, 4) not in got
    kept = minhash_lsh_dedup(_docs(spark), "text", "id").orderBy("id").collect()
    assert [r["id"] for r in kept] == [1, 4]


def test_simhash_pairs(spark):
    pairs = simhash_dedup_pairs(_docs(spark), "text", "id").collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(p != (1, 4) and p != (2, 4) for p in got)


def test_ngram_jaccard(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), "text", "id", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] >= 0.5
    assert (1, 4) not in got


def test_embedding_near_dup(spark):
    out = embedding_near_dup_pairs(
        _docs(spark), "id", content_col="text", threshold=0.9
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in got
    assert (1, 4) not in got


def test_linking_candidates_and_canonical(spark):
    nodes = spark.createDataFrame(
        [("Artificial Intelligence",), ("AI",), ("Artificial Inteligence",), ("Berlin",)],
        "name string",
    )
    ab = abbreviation_pairs(nodes).collect()
    assert {(r["name_a"], r["name_b"]) for r in ab} == {
        ("AI", "Artificial Intelligence"),
        ("AI", "Artificial Inteligence"),  # the typo variant shares initials
    }
    cp = candidate_pairs(nodes).collect()
    got = {tuple(sorted((r["name_a"], r["name_b"]))) for r in cp}
    assert ("Artificial Inteligence", "Artificial Intelligence") in got
    m = {
        r["name"]: r["canonical_name"]
        for r in canonical_map(nodes, threshold=0.8).collect()
    }
    assert m["AI"] == m["Artificial Intelligence"] == m["Artificial Inteligence"]
    assert m["Berlin"] == "Berlin"


def _emb_table(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 8)).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(50), "embedding": list(vecs)})
    return spark.createDataFrame(pdf), vecs


def test_brute_force_topk_batch_exact(spark):
    table, vecs = _emb_table(spark)
    queries = table.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
    out = brute_force_topk_batch(table, queries, 5, "vec_id", "qid").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["id"], r["score"]))
    for qid, rows in by_q.items():
        rows.sort()
        assert rows[0][1] == qid and abs(rows[0][2] - 1.0) < 1e-9
        # verify vs numpy
        q = vecs[qid] / np.linalg.norm(vecs[qid])
        sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ q
        exp = np.argsort(-sims)[:5]
        assert [r[1] for r in rows] == list(exp)


def test_ivf_topk_self_hit(spark):
    table, _ = _emb_table(spark)
    queries = table.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
    out = ivf_topk_batch(table, queries, 3, "vec_id", "qid", n_planes=3).collect()
    firsts = {r["qid"]: r["id"] for r in out if r["rank"] == 1}
    assert all(firsts[q] == q for q in firsts)  # self always in own cell


def test_textstats(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog walk to the park in the morning",),
            ("der hund und die katze sind nicht mit der maus",),
            ("le chat est dans la maison pour une nuit",),
            ("!!!???...",),
        ],
        "text string",
    )
    langs = [r["l"] for r in df.select(language_id(F.col("text")).alias("l")).collect()]
    assert langs[0] == "en" and langs[1] == "de" and langs[2] == "fr" and langs[3] == "und"
    q = quality_features(df, "text").collect()
    assert q[0]["quality_score"] > q[3]["quality_score"]
    toks = df.select(bpe_ish_token_count(F.col("text")).alias("n")).first()["n"]
    assert toks == 12
    links = spark.createDataFrame(
        [("see https://a.example/x. and http://b.example/y), done",)], "t string"
    ).select(extract_links(F.col("t")).alias("u")).first()["u"]
    assert links == ["https://a.example/x", "http://b.example/y"]


def test_multimodal_plumbing(spark):
    from graphrag_kb_server_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_to_text,
        image_features,
        sample_video_frames,
    )

    rows = [
        ("m1", "image", b"imgbytes", "image/png", 640, 480, None),
        ("m2", "video", b"vidbytes", "video/mp4", 1280, 720, 3500),
        ("m3", "audio", b"audbytes", "audio/wav", None, None, 2000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = image_features(media).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 16
    frames = sample_video_frames(media, every_ms=1000).collect()
    assert [f["frame_ix"] for f in frames] == [0, 1, 2]
    txt = audio_to_text(media).first()
    assert txt["transcript"].startswith("transcript-")
