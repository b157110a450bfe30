"""Hash-family column builders: shingles, MinHash, SimHash, rolling
fingerprints.

All built from ``md5`` (identical hex output in Spark and DuckDB, so the
DuckDB oracle can recompute signatures exactly). MinHash uses the
lexicographic MIN of ``md5(seed || shingle)`` per hash function — a
string-valued minhash avoids hex→int conversion differences between
engines while keeping the LSH property (min of a uniformly-hashed set).

Reference analogue: candidate generation for entity linking is the
north-rule MinHash-LSH blocking step; the reference's own dedup is the
dense-cosine greedy pass at
/root/reference/graphrag_kb_server/service/search/matching.py:100-128 —
LSH replaces its O(n^2) similarity matrix at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct character k-grams of a string (ARRAY<STRING>).

    Pure expression: sequence + transform + substring, then
    array_distinct. Empty/short strings yield the whole string.
    """
    n = F.greatest(F.length(col) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(col, i, k)
    )
    return F.array_distinct(grams)


def word_shingles(col: Column, k: int = 2) -> Column:
    """Distinct word k-gram shingles (ARRAY<STRING>), whitespace split."""
    words = F.split(F.trim(col), r"\s+")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def _seeded_md5(prefix: str):
    """Closure factory: a ONE-parameter lambda for F.transform.

    (A two-parameter lambda — e.g. with a default arg — would be bound
    by Spark as (element, index) and silently corrupt the seed.)
    """
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """ARRAY<STRING> of length ``num_hashes``: per hash function h,
    min(md5(h || ':' || shingle)) over the shingle set."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_md5(f"{h}:")))
            for h in range(num_hashes)
        ]
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys for LSH bucketing: ARRAY<STRING>, one key per band,
    key = band index + concatenated minhashes of that band. Two sets
    collide on a band iff that band's minhashes all match."""
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.element_at(signature, b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, as a 16-char hex STRING.

    Per token, take md5 → first 16 hex chars → 64 bits; majority vote
    per bit across tokens. Expressed with aggregate over bit positions
    kept JVM-side: we sum +1/-1 per bit using conv() on hex nibbles.

    Implementation detail: to stay in Catalyst we compute, for each of
    16 nibble positions, the 4 bit-majorities from the nibble value.
    """
    def _nib_at(pos: int):
        return lambda h: F.conv(F.substring(h, pos + 1, 1), 16, 10).cast("int")

    def _vote(mask: int):
        return lambda acc, v: acc + F.when(
            v.bitwiseAND(F.lit(mask)) > 0, 1
        ).otherwise(-1)

    # per-token 16-hex-char hash
    hashes = F.transform(tokens, lambda t: F.substring(F.md5(t), 1, 16))
    nibble_exprs = []
    for pos in range(16):  # nibble position in hex string
        nib = F.transform(hashes, _nib_at(pos))
        bits = []
        for bit in range(4):  # bit within nibble, MSB first
            mask = 1 << (3 - bit)
            votes = F.aggregate(nib, F.lit(0), _vote(mask))
            bits.append(F.when(votes > 0, F.lit(1)).otherwise(F.lit(0)))
        nibble_val = bits[0] * 8 + bits[1] * 4 + bits[2] * 2 + bits[3]
        nibble_exprs.append(F.lower(F.conv(nibble_val.cast("string"), 10, 16)))
    return F.concat(*nibble_exprs)


def rolling_fingerprint(col: Column, window: int = 8, keep: int = 4) -> Column:
    """Winnowing-style document fingerprint: the ``keep`` smallest
    md5 hashes over character windows of length ``window`` —
    ARRAY<STRING>. Deterministic and SQL-expressible."""
    n = F.greatest(F.length(col) - (window - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.md5(F.substring(col, i, window))
    )
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
