from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.chunking import chunk_documents, chunk_text
from graphrag_kb_server_spark.tokenizer import count_tokens, decode, encode


def test_tokenizer_lossless():
    samples = [
        "Hello, world!  Multi  space\nand\nnewlines.",
        "Alice Johnson acquired Acme Systems.",
        "",
        "   leading ws",
        "unicode: café — ok?",
    ]
    for s in samples:
        assert decode(encode(s)) == s


def test_chunk_windows():
    text = " ".join(f"word{i}" for i in range(3000))
    n = count_tokens(text)
    chunks = chunk_text(text, max_token_size=1024, overlap_token_size=128)
    # windows step 896
    assert chunks[0]["tokens"] == 1024
    assert chunks[1]["chunk_ix"] == 1
    starts = list(range(0, n, 896))
    assert len(chunks) == len([s for s in starts if s < n])
    # overlap: last 128 tokens of chunk k = first 128 of chunk k+1 region
    assert sum(c["tokens"] for c in chunks) >= n


def test_chunk_small_doc_single_chunk():
    chunks = chunk_text("one two three.")
    assert len(chunks) == 1
    assert chunks[0]["content"] == "one two three."


def test_chunk_documents_spark_matches_pure(spark):
    docs = spark.createDataFrame(
        [("d1", " ".join(f"tok{i}" for i in range(2500)), "f1"),
         ("d2", "short doc.", "f2")],
        "doc_id string, content string, file_path string",
    )
    out = chunk_documents(docs).orderBy("doc_id", "chunk_ix").collect()
    pure = chunk_text(" ".join(f"tok{i}" for i in range(2500)))
    d1 = [r for r in out if r["doc_id"] == "d1"]
    assert [r["content"] for r in d1] == [c["content"] for c in pure]
    assert [r["n_tokens"] for r in d1] == [c["tokens"] for c in pure]
    assert all(r["chunk_id"].startswith("chunk-") for r in out)
    # chunk_id is content-hash (md5)
    import hashlib
    assert d1[0]["chunk_id"] == "chunk-" + hashlib.md5(d1[0]["content"].encode()).hexdigest()


def test_duplicate_content_chunks_collapse(spark):
    """Byte-identical chunks from different docs share a content-hash
    id; the chunks table keeps ONE row per id with the deterministic
    min-(doc_id, chunk_ix) winner — mirroring the reference's id-keyed
    chunk store, where duplicates collapse on upsert."""
    from graphrag_kb_server_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            ("doc-b", "same tiny body", "http://b"),
            ("doc-a", "same tiny body", "http://a"),
            ("doc-c", "a different body", "http://c"),
        ],
        "doc_id string, content string, file_path string",
    )
    rows = chunk_documents(docs).collect()
    assert len(rows) == 2  # the two identical docs share one chunk row
    winner = next(r for r in rows if r["content"] == "same tiny body")
    assert winner["doc_id"] == "doc-a" and winner["file_path"] == "http://a"
