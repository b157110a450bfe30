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


def test_mega_bucket_split_not_dropped(spark):
    """LSH skew guard: a bucket over max_bucket is SPLIT into
    hash-derived sub-buckets — members still pair within sub-buckets
    (the old count-and-drop silently lost every duplicate in a
    mega-bucket), the pair set matches the md5-prefix-mod mirror
    exactly, and the oversize is reported by the stats helper."""
    import hashlib

    from graphrag_kb_server_spark.operators.dedup import oversized_bucket_stats

    # 12 identical docs: every band bucket has 12 members > max_bucket=4
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(12)]
    docs = spark.createDataFrame(rows, "id int, text string")
    pairs = minhash_lsh_pairs(
        docs, "text", "id", num_hashes=16, bands=8, max_bucket=4
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got, "mega-bucket produced pairs instead of being dropped"
    # the split is the documented hash-mod scheme: nsub = ceil(12/4) = 3,
    # sub(id) = int(md5(str(id))[:8], 16) % 3 — identical docs share every
    # band key, so the pair set is exactly the within-sub-bucket pairs
    sub = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 3
        for i in range(12)
    }
    expected = {
        (a, b) for a in range(12) for b in range(a + 1, 12) if sub[a] == sub[b]
    }
    assert got == expected
    # and the skew is visible in metrics
    from pyspark.sql import functions as F
    from graphrag_kb_server_spark.functions import hashing as H

    sh = docs.select("id", H.word_shingles(F.lower(F.col("text")), 3).alias("_sh"))
    hx = sh.select("id", H.shingle_hexes(F.col("_sh"), 16).alias("_hx"))
    sig = hx.select("id", H.minhash_from_hexes(F.col("_hx"), 16).alias("_sig"))
    b = sig.select(
        "id", F.explode(H.lsh_bands(F.col("_sig"), 8, 2)).alias("band")
    )
    stats = oversized_bucket_stats(b, "band", 4).first()
    assert stats["n_oversized"] >= 1 and stats["max_size"] == 12


def test_simhash_multipermutation_rotations(spark):
    """A near-dup pair differing ONLY inside the leading prefix nibbles
    is missed by single-prefix blocking (rotations=1) but caught by the
    multi-permutation rotated-prefix index (rotations=4)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # find a token tweak that flips a leading nibble but stays within
    # hamming<=k overall: brute-force a few suffix words
    from graphrag_kb_server_spark.operators.dedup import simhash_dedup_pairs

    candidates = [base.replace("alpha", w) for w in
                  ["alphas", "alphax", "alpba", "aloha", "alpho", "halpa"]]
    docs = spark.createDataFrame(
        [(0, base)] + [(i + 1, c) for i, c in enumerate(candidates)],
        "id int, text string",
    )
    single = simhash_dedup_pairs(
        docs, "text", "id", prefix_nibbles=4, max_hamming_nibbles=6, rotations=1
    )
    multi = simhash_dedup_pairs(
        docs, "text", "id", prefix_nibbles=4, max_hamming_nibbles=6, rotations=4
    )
    got1 = {(r["id_a"], r["id_b"]) for r in single.collect()}
    got4 = {(r["id_a"], r["id_b"]) for r in multi.collect()}
    # multi-permutation recall strictly dominates single-prefix
    assert got1 <= got4
    assert len(got4) > len(got1), (
        "expected at least one near-dup pair visible only under rotation"
    )


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


def test_ivf_auto_planes_track_corpus_size(spark):
    """n_planes=None sizes cells from the corpus: plane count grows
    with rows (expected cell ≈ target_cell_rows, never rows/2^4 as the
    fixed default would), clamps at [1, 28], and the auto-sized path
    still returns self as its own nearest neighbour."""
    from graphrag_kb_server_spark.operators.similarity import auto_n_planes

    assert auto_n_planes(200, 50) == 2
    assert auto_n_planes(3200, 50) == 6
    assert auto_n_planes(3200 * 4, 50) == 8  # 4x corpus -> +2 planes
    assert auto_n_planes(10, 4096) == 1  # lower clamp
    assert auto_n_planes(2**40, 1) == 28  # upper clamp

    table, _ = _emb_table(spark)
    queries = table.limit(5).select(F.col("vec_id").alias("qid"), "embedding")
    out = ivf_topk_batch(
        table, queries, 3, "vec_id", "qid", n_planes=None, target_cell_rows=8
    ).collect()
    firsts = {r["qid"]: r["id"] for r in out if r["rank"] == 1}
    assert firsts and all(firsts[q] == q for q in firsts)


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


def _tiny_bmp() -> bytes:
    """2x2 24-bit BMP: top row red+green, bottom row blue+white."""
    import struct

    width, height = 2, 2
    row = width * 3
    pad = (4 - row % 4) % 4
    # rows bottom-up, pixels BGR
    pixels = (
        bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00" * pad   # blue, white
        + bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00" * pad     # red, green
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def _tiny_wav(rate: int = 8000, n: int = 800) -> bytes:
    """PCM-16 mono WAV: a square wave (half amplitude 16000, alternating
    every sample → zero-crossing rate ~1)."""
    import struct

    import numpy as np

    samples = (np.tile([16000, -16000], n // 2)).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )


def test_multimodal_real_bmp_wav_decode(spark):
    """S3 decode is REAL for codec-free formats: BMP pixel statistics
    and WAV sample statistics come from the actual payload bytes."""
    from graphrag_kb_server_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_bmp,
        decode_wav,
        image_features,
    )

    bmp, wav = _tiny_bmp(), _tiny_wav()
    w, h, px = decode_bmp(bmp)
    assert (w, h) == (2, 2)
    assert px[0, 0].tolist() == [255, 0, 0]   # red top-left (RGB)
    assert px[1, 1].tolist() == [255, 255, 255]
    rate, ch, samples = decode_wav(wav)
    assert (rate, ch, len(samples)) == (8000, 1, 800)

    rows = [
        ("img", "image", bmp, "image/bmp", None, None, None),
        ("imgfake", "image", b"\x89PNGfake", "image/png", 640, 480, None),
        ("aud", "audio", wav, "audio/wav", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert feats["img"]["width"] == 2 and feats["img"]["height"] == 2
    # mean RGB of {red, green, blue, white} = (510/4, 510/4, 510/4)/255
    assert abs(feats["img"]["feature"][0] - 0.5) < 1e-6
    assert len(feats["imgfake"]["feature"]) == 16  # fake path intact
    af = audio_features(media).first()
    assert af["duration_ms"] == 100  # 800 samples @ 8 kHz
    assert abs(af["rms"] - 16000 / 32768) < 1e-3
    assert af["zero_crossing_rate"] > 0.9


def test_embedding_multiprobe_recovers_boundary_pair(spark):
    """probe_hamming=1 (one-deletion masked keys): a true near-dup pair
    straddling exactly ONE hyperplane is invisible to exact-bucket
    blocking but blocked together by the multi-probe keys."""
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((4, 8))  # same seed/planes as operator
    # seed chosen so u has comfortable margins on planes 1-3 (the pair
    # must straddle EXACTLY one plane for the hamming-1 probe to apply)
    u = np.random.default_rng(8).standard_normal(8)
    u = u - (u @ planes[0]) / (planes[0] @ planes[0]) * planes[0]
    v1 = (u + 0.01 * planes[0]).astype("float32")
    v2 = (u - 0.01 * planes[0]).astype("float32")
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [v1, v2]})
    )
    exact = embedding_near_dup_pairs(
        df, "vec_id", vec_col="embedding", threshold=0.9, n_planes=4, seed=42
    ).collect()
    assert exact == [], "pair straddles plane 0 → different exact buckets"
    probed = embedding_near_dup_pairs(
        df, "vec_id", vec_col="embedding", threshold=0.9, n_planes=4,
        seed=42, probe_hamming=1,
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in probed] == [(1, 2)]
    assert probed[0]["cosine"] > 0.99


def test_multimodal_null_metadata_and_malformed_wav(spark):
    """Regression (ADVICE r2): Arrow hands nullable ints to pandas as
    NaN — the fake path must not crash on NULL width/height/duration;
    a malformed WAV fmt (channels=0) must fall to the fake path as a
    ValueError, not escape as ZeroDivisionError."""
    import struct

    from graphrag_kb_server_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_wav,
        image_features,
        sample_video_frames,
    )

    # PCM WAV header claiming channels=0 (division bait)
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 2, 16)
    bad_wav = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(bad_wav)

    rows = [
        ("i_null", "image", b"\x89PNGfake", "image/png", None, None, None),
        ("a_null", "audio", b"mp3fake", "audio/mpeg", None, None, None),
        ("a_bad", "audio", bad_wav, "audio/wav", None, None, None),
        ("v_null", "video", b"vidfake", "video/mp4", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert feats["i_null"]["width"] == 0 and feats["i_null"]["height"] == 0
    af = {r["media_id"]: r for r in audio_features(media).collect()}
    assert af["a_null"]["duration_ms"] == 0
    assert af["a_bad"]["duration_ms"] == 0  # fake path absorbed it
    frames = sample_video_frames(media, every_ms=1000).collect()
    assert [f["frame_ix"] for f in frames] == [0]  # null duration → 1 frame


def _encode_png(px, color, filters, palette=None):
    """Minimal PNG writer for the decoder test: 8-bit, chosen color
    type, one chosen filter byte per row (applying the spec's forward
    transform so decode must invert it)."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype, body):
        c = ctype + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    h, w = px.shape[0], px.shape[1]
    nch = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * nch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        enc = np.zeros_like(cur)
        for i in range(w * nch):
            a = int(cur[i - nch]) if i >= nch else 0
            b = int(prev[i])
            c = int(prev[i - nch]) if i >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (int(cur[i]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_png_decode_all_filters_and_color_types():
    """decode_png inverts every scanline filter (0/1/2/3/4) and maps
    each supported color type to RGB — against a spec-faithful inline
    encoder, not a library."""
    import numpy as np

    from graphrag_kb_server_spark.operators.multimodal import (
        bmp_feature,
        decode_png,
    )

    rng = np.random.default_rng(7)
    # RGB, 6x5, every filter type used across rows
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    w, h, got = decode_png(_encode_png(px, 2, [0, 1, 2, 3, 4, 3]))
    assert (w, h) == (5, 6)
    assert np.array_equal(got, px)

    # grayscale replicated to RGB
    g = rng.integers(0, 256, size=(4, 7, 1), dtype=np.uint8)
    _, _, got_g = decode_png(_encode_png(g, 0, [4, 2, 1, 3]))
    assert np.array_equal(got_g, np.repeat(g, 3, axis=2))

    # RGBA drops alpha
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    _, _, got_a = decode_png(_encode_png(rgba, 6, [1, 4, 2]))
    assert np.array_equal(got_a, rgba[:, :, :3])

    # palette lookup
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    _, _, got_p = decode_png(_encode_png(idx, 3, [0, 1], palette=pal))
    assert got_p[0, 0].tolist() == [255, 0, 0]
    assert got_p[1, 0].tolist() == [0, 0, 255]

    # the image-features entry point now takes PNG for real
    w2, h2, feat = bmp_feature(_encode_png(px, 2, [0]))
    assert (w2, h2) == (5, 6) and len(feat) == 19

    # unsupported variants stay on the declared-slot (ValueError) path
    import pytest

    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):
        # 16-bit: flip bits field
        bad = bytearray(_encode_png(px, 2, [0]))
        bad[24] = 16
        decode_png(bytes(bad))


def test_ivf_multi_probe_recall_dominates(spark):
    """probe_bits=1 searches the query's cell plus every one-bit-
    flipped cell: per-query best score is >= the single-cell best, and
    at least one query sees a strictly better candidate set on random
    data (neighbours straddling one hyperplane become visible)."""
    table, _ = _emb_table(spark)
    queries = table.limit(8).select(F.col("vec_id").alias("qid"), "embedding")

    def best(df):
        return {r["qid"]: r["score"] for r in df.collect() if r["rank"] == 1}

    plain = best(ivf_topk_batch(table, queries, 3, "vec_id", "qid", n_planes=4))
    probed = best(
        ivf_topk_batch(table, queries, 3, "vec_id", "qid", n_planes=4, probe_bits=1)
    )
    assert set(plain) <= set(probed)  # probing never loses a query
    for qid, s in plain.items():
        assert probed[qid] >= s - 1e-9
    # candidate coverage strictly grows somewhere on 50 random vectors
    n_plain = ivf_topk_batch(table, queries, 50, "vec_id", "qid", n_planes=4).count()
    n_probe = ivf_topk_batch(
        table, queries, 50, "vec_id", "qid", n_planes=4, probe_bits=1
    ).count()
    assert n_probe > n_plain


def test_language_id_web_scale_cascade(spark):
    """The two-stage language-ID cascade: dominant non-Latin script →
    Unicode-block language (with the Han+kana→Japanese rule); Latin
    text → stopword markers across all 12 supported languages."""
    from pyspark.sql import functions as F

    from graphrag_kb_server_spark.operators.textstats import language_id

    samples = [
        ("zh", "这是一个关于知识图谱的中文文档，包含许多汉字。"),
        ("ja", "これは日本語のドキュメントです。漢字とかなが混ざっています。"),
        ("ko", "이것은 한국어 문서입니다. 지식 그래프에 관한 내용입니다."),
        ("ru", "Это документ на русском языке о графах знаний."),
        ("ar", "هذه وثيقة باللغة العربية حول الرسوم البيانية المعرفية."),
        ("hi", "यह ज्ञान ग्राफ के बारे में एक हिंदी दस्तावेज़ है।"),
        ("el", "Αυτό είναι ένα ελληνικό έγγραφο σχετικά με γράφους γνώσης."),
        ("pt", "Este documento não é uma página com mais informações como dos outros."),
        ("it", "Questo è il documento che descrive la rete per gli utenti, sono anche del tipo."),
        ("nl", "Dit is het document van een netwerk, niet met voor zijn ook."),
        ("pl", "To nie jest dokument, że się przez oraz tego."),
        ("sv", "Detta är och att det som på av inte dokumentet."),
        ("tr", "Bu bir belge ve bu için ile olarak daha gibi."),
        ("id", "Ini yang dan di untuk dengan ini tidak pada dokumen."),
        ("ro", "Acesta este documentul și pentru care sunt din mai să."),
        ("en", "This is the document and of the knowledge graph with info for you."),
        ("und", "12345 67890 !!! ???"),
    ]
    df = spark.createDataFrame(samples, "expected string, text string")
    rows = df.select(
        "expected", language_id(F.col("text")).alias("got")
    ).collect()
    misses = [(r["expected"], r["got"]) for r in rows if r["expected"] != r["got"]]
    assert not misses, misses


def test_tfidf_top_terms(spark):
    """Rare terms outrank common ones; ties break on the term string;
    k bounds rows per doc."""
    from graphrag_kb_server_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common common common"),
            (2, "banana cherry common common"),
            (3, "common words only common"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 1: apple (tf=2, df=1) is the clear winner over common (df=3)
    top1 = sorted(by_doc[1], key=lambda r: r["term_rank"])
    assert top1[0]["term"] == "apple"
    assert (top1[0]["tf"], top1[0]["df"]) == (2, 1)
    # doc 2: common wins on tf=2 (smoothed idf keeps universal terms
    # alive — 2·(ln(4/4)+1)=2.0); cherry's rarity (df=1, 1.693) is 2nd
    top2 = sorted(by_doc[2], key=lambda r: r["term_rank"])
    assert [r["term"] for r in top2] == ["common", "cherry"]
    # scores decrease with rank everywhere
    for rows in by_doc.values():
        rows = sorted(rows, key=lambda r: r["term_rank"])
        assert all(
            rows[i]["tfidf"] >= rows[i + 1]["tfidf"]
            for i in range(len(rows) - 1)
        )


def test_minhash_dedup_winner_rule(spark):
    """order_col picks the keeper: with -length the longest member of
    each near-dup component survives (tie -> min id)."""
    from pyspark.sql import functions as F

    from graphrag_kb_server_spark.operators.dedup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    rows = [
        (1, base),
        (2, base + " extended with extra trailing words here"),  # longest
        (3, "completely different text about spark catalyst engines "
            "and distributed shuffle joins at massive scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    default = {r.doc_id for r in
               minhash_lsh_dedup(docs, "text", "doc_id")
               .select("doc_id").collect()}
    winner = {r.doc_id for r in
              minhash_lsh_dedup(
                  docs.withColumn("_neg_len", -F.length("text")),
                  "text", "doc_id", order_col="_neg_len")
              .select("doc_id").collect()}
    assert default == {1, 3}   # min id kept
    assert winner == {2, 3}    # longest kept


def test_iqr_outlier_filter(spark):
    """Per-group fences: the same value survives in a wide group and
    is cut in a tight one; bounds surfaced for audit."""
    from graphrag_kb_server_spark.operators.textstats import (
        iqr_outlier_filter,
    )

    rows = [("tight", float(v)) for v in
            [100, 101, 102, 103, 104, 105, 106, 107]]
    rows += [("tight", 500.0)]          # extreme in the tight group
    rows += [("wide", float(v)) for v in
             [100, 200, 300, 400, 500, 600, 700, 800]]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = iqr_outlier_filter(df, "grp", "v", k=1.5)
    kept = {(r.grp, r.v) for r in out.collect()}
    assert ("tight", 500.0) not in kept
    assert ("wide", 500.0) in kept
    assert len([1 for g, _ in kept if g == "tight"]) == 8
    bounds = {r.grp: (r.lo, r.hi) for r in out.collect()}
    assert bounds["tight"][1] < 500 < bounds["wide"][1]
