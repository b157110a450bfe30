"""The per-row invariant: byte-identical extracted text per url
(reference framing index_support.py:50-53 + special-token strip
lightrag_index_support.py:27-35)."""

from pyspark.sql import functions as F

from graphrag_kb_server_spark.corpus import generate
from graphrag_kb_server_spark.functions.text import (
    extract_text,
    extract_text_py,
    sanitize_special_tokens,
    sanitize_special_tokens_py,
)
from graphrag_kb_server_spark.golden import golden_documents


def test_framing_byte_identical(spark):
    pages = generate(spark, 50)
    got = {
        r["url"]: r["content"]
        for r in pages.select(
            "url", extract_text(F.col("text"), F.col("url")).alias("content")
        ).collect()
    }
    golden = golden_documents(50)
    assert len(got) == 50
    for url, content in zip(golden["url"], golden["content"]):
        assert got[url] == content  # byte-identical
        assert content.endswith(f"\n\nSource: {url}\n")


def test_sanitize_matches_reference_regex(spark):
    raw = "a<|endoftext|>b<|im_start|>c<|fim_middle|>d plain <|x|> kept"
    expected = "abcd plain <|x|> kept"
    assert sanitize_special_tokens_py(raw) == expected
    df = spark.createDataFrame([(raw,)], "t string")
    assert df.select(sanitize_special_tokens(F.col("t")).alias("s")).first()["s"] == expected


def test_extract_text_py_twin():
    assert extract_text_py("hello<|endoftext|> world", "https://u") == (
        "hello world\n\nSource: https://u\n"
    )
