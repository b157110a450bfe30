"""Multimodal (image/audio/video) column plumbing.

Reference analogue: S3 doc-format conversion — pdf/docx/pptx→markdown
via LLM, audio→text via Whisper
(/root/reference/graphrag_kb_server/service/file_conversion.py:16-63,
service/index_support.py:76-93). In the Spark engine, media are opaque
``BINARY`` columns with typed metadata; decode / feature-extract /
frame-sample run as Arrow-batched ``mapInPandas`` stages.

The decode bodies are STUBS (codec libraries are not in this container):
``deterministic_fake=True`` produces seeded, shape-correct outputs so
the Spark-side plumbing — schema, batching, partitioning, one-to-many
frame explosion — is real and tested; ``deterministic_fake=False``
raises NotImplementedError at the exact line a real codec call belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "media_id string, frame_ix int, ts_ms int, feature array<float>"


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    d = hashlib.md5(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(d[:8], "big"))
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def image_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract images. Real plumbing: Arrow batches of
    binary payloads in, fixed-width float vectors out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires a codec library (PIL/opencv); "
                    "install and replace this branch with e.g. "
                    "PIL.Image.open(io.BytesIO(payload))"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].fillna(0).astype("int32"),
                    "height": pdf["height"].fillna(0).astype("int32"),
                    "feature": [ _fake_feature(p, dim) for p in pdf["payload"] ],
                }
            )

    return media.where("kind = 'image'").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """One-to-many frame sampling: each video row explodes into
    duration/every_ms frame rows, each with a feature vector — the
    mapInPandas one-to-many shape shared with chunking/extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg/pyav; replace this branch"
                )
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(int((dur or 0) // every_ms), 1)
                for i in range(n):
                    seed_payload = (payload or b"") + i.to_bytes(4, "big")
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_ix": i,
                            "ts_ms": i * every_ms,
                            "feature": _fake_feature(seed_payload, dim),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_ix", "ts_ms", "feature"]
            )

    return media.where("kind = 'video'").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def audio_to_text(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """The Whisper slot (file_conversion.py convert_audio): binary →
    transcript string."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio transcription requires a speech model client"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "transcript": [
                        f"transcript-{hashlib.md5(p or b'').hexdigest()[:12]}"
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.where("kind = 'audio'").mapInPandas(
        run, schema="media_id string, transcript string"
    )
