"""Multimodal (image/audio/video) column plumbing.

Reference analogue: S3 doc-format conversion — pdf/docx/pptx→markdown
via LLM, audio→text via Whisper
(/root/reference/graphrag_kb_server/service/file_conversion.py:16-63,
service/index_support.py:76-93). In the Spark engine, media are opaque
``BINARY`` columns with typed metadata; decode / feature-extract /
frame-sample run as Arrow-batched ``mapInPandas`` stages.

Decode reality, by format:
- **BMP (24-bit uncompressed), PNG (8-bit gray/RGB/palette/alpha,
  non-interlaced) and WAV (PCM)** are decoded FOR REAL — pure struct
  parsing + stdlib zlib + numpy, no codec library needed
  (``decode_bmp`` / ``decode_png`` / ``decode_wav``). Image features
  are actual pixel statistics; audio features are actual sample
  statistics.
- Formats needing external codecs (JPEG/MP4/MP3, 16-bit or interlaced
  PNG): ``deterministic_fake=True`` produces seeded, shape-correct
  outputs so the Spark-side plumbing — schema, batching, partitioning,
  one-to-many frame explosion — is real and tested;
  ``deterministic_fake=False`` raises NotImplementedError at the exact
  line a real codec call belongs.
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


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a 24-bit uncompressed BMP (pure struct + numpy):
    returns (width, height, H×W×3 uint8 RGB). Raises ValueError on
    anything that isn't plain BI_RGB 24bpp."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=pixel_off
    ).reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        raw = raw[::-1]
    return width, height, raw[:, :, ::-1]  # BGR → RGB


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of an 8-bit non-interlaced PNG (stdlib zlib + numpy,
    no codec library): color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA); all five scanline filters. Returns
    (width, height, H×W×3 uint8 RGB — alpha dropped, gray replicated).
    Raises ValueError on non-PNG or unsupported variants (16-bit,
    interlaced), keeping those on the declared-slot path."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            # valid magic but chunk body shorter than declared — keep
            # the decoder's ValueError contract (image_features falls
            # back to the deterministic fake) instead of struct.error
            # escaping and killing the whole mapInPandas task
            raise ValueError("PNG chunk truncated")
        if ctype == b"IHDR":
            if ln != 13:
                raise ValueError(f"PNG IHDR length {ln} != 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bits, color, comp, filt, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if bits != 8 or comp != 0 or filt != 0 or interlace != 0 or nch is None:
        raise ValueError(
            f"unsupported PNG (bits={bits}, color={color}, interlace={interlace})"
        )
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG inflate failed: {exc}") from None
    stride = w * nch
    if w == 0 or h == 0 or len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    at = 0
    for y in range(h):
        f = raw[at]
        cur = np.frombuffer(raw, np.uint8, stride, at + 1).copy()
        at += stride + 1
        if f == 0:
            pass
        elif f == 2:  # up — vectorized, uint8 wraps mod 256
            cur += prev
        elif f == 1:  # sub — per-channel running sum along the row;
            # cumsum with dtype=uint8 accumulates mod 256, which IS the
            # spec's wrap semantics, so the whole row is one numpy op
            cur = np.cumsum(
                cur.reshape(-1, nch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 3:  # average — sequential recurrence (floor makes it
            # nonlinear, no closed form); run over python ints from
            # tolist() instead of numpy scalar indexing (~10× per byte)
            c_l, p_l = cur.tolist(), prev.tolist()
            for i in range(nch):
                c_l[i] = (c_l[i] + (p_l[i] >> 1)) & 0xFF
            for i in range(nch, stride):
                c_l[i] = (c_l[i] + ((c_l[i - nch] + p_l[i]) >> 1)) & 0xFF
            cur = np.asarray(c_l, dtype=np.uint8)
        elif f == 4:  # paeth — same sequential-int strategy
            c_l, p_l = cur.tolist(), prev.tolist()
            for i in range(nch):
                c_l[i] = (c_l[i] + p_l[i]) & 0xFF  # a=c=0 → pred=b
            for i in range(nch, stride):
                a, b, c = c_l[i - nch], p_l[i], p_l[i - nch]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                c_l[i] = (c_l[i] + pred) & 0xFF
            cur = np.asarray(c_l, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, nch)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[: len(pal) // 3 * 3].reshape(-1, 3)
        if len(pal) == 0 or int(px.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        px = pal[px[:, :, 0]]
    elif color == 0:
        px = np.repeat(px, 3, axis=2)
    elif color == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif color == 6:
        px = px[:, :, :3]
    return w, h, px


def _pixel_feature(width: int, height: int, px: np.ndarray) -> tuple[int, int, np.ndarray]:
    """[mean R, mean G, mean B] + 16-bin normalized grayscale histogram
    (19-dim float32) from decoded RGB pixels."""
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    gray = px.mean(axis=2)
    hist, _ = np.histogram(gray, bins=16, range=(0, 255))
    hist = hist / max(hist.sum(), 1)
    return width, height, np.concatenate([means, hist]).astype(np.float32)


def bmp_feature(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real image feature from decoded pixels — tries BMP then PNG
    (both dependency-free real decoders); ValueError for anything else."""
    if payload[:2] == b"BM":
        return _pixel_feature(*decode_bmp(payload))
    return _pixel_feature(*decode_png(payload))


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a PCM-16 WAV (pure struct + numpy): returns
    (sample_rate, channels, samples int16 [n_frames, channels])."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if not channels or not rate:  # malformed fmt: keep failures on ValueError
        raise ValueError(f"malformed WAV fmt (channels={channels}, rate={rate})")
    samples = np.frombuffer(data, dtype="<i2")
    samples = samples[: len(samples) // channels * channels].reshape(-1, channels)
    return rate, channels, samples


AUDIO_FEATURES_SCHEMA = (
    "media_id string, duration_ms int, rms double, zero_crossing_rate double"
)


def audio_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode + feature-extract audio: REAL for PCM WAV payloads
    (duration/RMS/zero-crossing from actual samples); the seeded fake
    covers compressed formats under ``deterministic_fake``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                try:
                    rate, _, samples = decode_wav(payload or b"")
                    mono = samples.mean(axis=1)
                    n = len(mono)
                    rms = float(np.sqrt(np.mean((mono / 32768.0) ** 2))) if n else 0.0
                    zcr = (
                        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        if n > 1
                        else 0.0
                    )
                    rows.append(
                        {
                            "media_id": mid,
                            "duration_ms": int(n / rate * 1000),
                            "rms": rms,
                            "zero_crossing_rate": zcr,
                        }
                    )
                except ValueError:
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "compressed audio decode requires a codec "
                            "library (ffmpeg/soundfile); replace this branch"
                        ) from None
                    f = _fake_feature(payload or b"", 2)
                    rows.append(
                        {
                            "media_id": mid,
                            # Arrow hands nullable ints to pandas as NaN (truthy)
                            "duration_ms": int(dur) if pd.notna(dur) else 0,
                            "rms": float(abs(f[0])),
                            "zero_crossing_rate": float(abs(f[1])),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_ms", "rms", "zero_crossing_rate"],
            )

    return media.where("kind = 'audio'").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def image_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract images: REAL pixel statistics for
    24-bit BMP and 8-bit PNG payloads (decode_bmp/decode_png need no
    codec library); the seeded fake covers the remaining formats under
    ``deterministic_fake``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                try:
                    rw, rh, feat = bmp_feature(payload or b"")
                    rows.append(
                        {"media_id": mid, "width": rw, "height": rh, "feature": feat}
                    )
                except ValueError:
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "compressed image decode requires a codec library "
                            "(PIL/opencv); install and replace this branch with "
                            "e.g. PIL.Image.open(io.BytesIO(payload))"
                        ) from None
                    rows.append(
                        {
                            "media_id": mid,
                            # NaN-safe: nullable ints arrive as NaN via Arrow
                            "width": int(w) if pd.notna(w) else 0,
                            "height": int(h) if pd.notna(h) else 0,
                            "feature": _fake_feature(payload, dim),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "feature"]
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
                n = max(int(dur // every_ms) if pd.notna(dur) else 0, 1)
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
