"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extraction run as Arrow-batched ``mapInPandas``
stages (the one place Python is the right tool — SURVEY §7.2 step 8).

Decode lanes, from most to least available:

- ``fake=True`` (default, every driver query): a deterministic
  byte-statistics "feature vector" stands in for codec output — exact,
  hash-verified against the DuckDB oracle.
- ``fake=False`` + binary PPM (P6) payload: a REAL decode through the
  vendored pure-stdlib codec below (``_ppm_decode``/``_ppm_encode`` —
  zero dependencies, so this lane runs in the hermetic test suite;
  VERDICT r9 #3a). PPM P6 is raw RGB after a 3-token ASCII header, the
  simplest real lossless image format.
- ``fake=False`` + other image/*: Pillow, gated on an optional import
  (not baked into this container — exercised by a skippable test when
  present).

The Spark-side plumbing — schema, batch iteration, partition
preservation — is identical across lanes; only ``_decode_payload`` /
``_resize_payload`` branch.

Large-payload memory posture: Arrow transfer batches are byte-capped by
``spark.sql.execution.arrow.maxBytesPerBatch`` (64 MiB default in Spark
4.x), not just row-capped — probed with 4 MB payloads packed into one
partition, the runtime delivered ~17-row (~64 MiB) batches to
``mapInPandas``, so a partition of multi-megabyte blobs cannot materialize
as one giant Python batch. Peak per-worker memory is ~maxBytesPerBatch
plus the operator's per-batch output, independent of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata has no real media; model a payload as the utf-8 bytes of the
    text with a deterministic media_type tag. Real pipelines read the binary
    column straight from parquet — the downstream plumbing is identical."""
    return df.withColumns(
        {
            "payload": F.encode(F.col(text_col), "UTF-8"),
            "media_type": F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
            .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("video/mp4")),
        }
    )


def _ppm_decode(payload: bytes):
    """Pure-stdlib binary PPM (P6) decode -> numpy uint8 array [h, w, 3].

    The P6 grammar (netpbm spec, public): ``P6`` then width, height,
    maxval as whitespace-separated ASCII tokens (``#`` comments allowed
    between them), ONE whitespace byte, then ``3*w*h`` raw RGB bytes.
    Only maxval 255 is supported (the 1-byte-per-sample case). Raises
    ValueError on malformed input — callers surface that per-row, never
    as a worker crash."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if w <= 0 or h <= 0:
        # a zero/negative dimension would pass the raster-length check
        # (3*0*h == 0 == len of empty raster) and surface downstream as a
        # ZeroDivisionError in the resize scale math / a numpy zero-size
        # reduction in the feature lane (review finding) — reject here
        raise ValueError(f"non-positive PPM dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    pos += 1  # exactly one whitespace byte separates header from raster
    raster = payload[pos : pos + 3 * w * h]
    if len(raster) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _ppm_encode(arr) -> bytes:
    """numpy uint8 [h, w, 3] -> binary PPM (P6) bytes."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _decode_payload(payload: bytes, media_type: str, fake: bool) -> list[float]:
    if fake:
        # deterministic byte-statistics features (stand-in for codec output):
        # per-stride byte-sum means in 6-decimal fixed point. Integer floor
        # division BEFORE the float divide keeps the value bit-identical
        # across engines (Python, Spark, DuckDB all compute the same BIGINT
        # then the same exact-integer / 1e6 double), so the DuckDB oracle
        # (oracle_ext.multimodal_features_sql) can hash-match it — unlike
        # round(x / n, 6), whose half-way ties round differently per engine.
        n = len(payload) or 1
        buckets = [0] * FEATURE_DIM
        for i, b in enumerate(payload):
            buckets[i % FEATURE_DIM] += b
        return [(x * 1_000_000 // n) / 1e6 for x in buckets]
    if media_type.startswith("image/"):
        import numpy as np

        if payload[:2] == b"P6":
            # REAL decode through the vendored pure-stdlib PPM codec —
            # no optional dependency, exercised by the hermetic suite
            # (tests/test_multimodal_real.py)
            arr = _ppm_decode(payload).astype("float64")
        else:
            # real decode for compressed formats, gated on an optional
            # Pillow import (not baked into this container — exercised
            # by a skippable test when present)
            try:
                from io import BytesIO

                from PIL import Image
            except ImportError as exc:  # pragma: no cover - environment-dependent
                raise NotImplementedError(
                    "real decode of non-PPM images requires Pillow, which is "
                    "not installed; pass fake=True for the deterministic "
                    "stand-in or supply binary-PPM payloads"
                ) from exc
            with Image.open(BytesIO(payload)) as im:
                arr = np.asarray(im.convert("RGB"), dtype="float64")
        h, w, c = arr.shape
        feats = [
            float(w),
            float(h),
            float(c),
            float(arr.mean()),
            float(arr.std()),
            float(arr.min()),
            float(arr.max()),
            float(arr.mean(axis=(0, 1)).argmax()),  # dominant channel
        ]
        return [round(x, 6) for x in feats]
    raise NotImplementedError(
        f"no decoder for media_type={media_type!r} in this container; "
        "pass fake=True for the deterministic stand-in"
    )


# malformed-payload exception surface: ValueError covers the vendored PPM
# codec (truncated raster, bad header, zero dimensions) and struct-style
# decode errors; OSError covers the optional Pillow lane, whose
# UnidentifiedImageError (a truncated/garbage PNG/JPEG) subclasses OSError
# — without it a single corrupt compressed blob aborted the whole
# mapInPandas task in a Pillow-equipped environment, contradicting the
# 'malformed payload -> NULL row' contract (r10 ADVICE item 1).
# NotImplementedError (missing optional decoder — an ENVIRONMENT problem,
# identical for every row) deliberately stays outside this tuple and
# propagates loudly.
_MALFORMED_PAYLOAD_ERRORS = (ValueError, OSError)


def _decode_or_null(payload, media_type: str, fake: bool):
    """Per-row guard implementing _ppm_decode's documented contract: a
    MALFORMED payload (see _MALFORMED_PAYLOAD_ERRORS) is routine corrupt
    data at scale and maps to NULL features, never a task crash."""
    if payload is None:
        return None
    try:
        return _decode_payload(payload, media_type, fake)
    except _MALFORMED_PAYLOAD_ERRORS:
        return None


def _resize_or_null(payload, media_type: str, target_len: int, fake: bool):
    """Per-row malformed-payload guard for the resize lane — same contract
    as :func:`_decode_or_null`."""
    if payload is None:
        return None
    try:
        return _resize_payload(payload, media_type, target_len, fake)
    except _MALFORMED_PAYLOAD_ERRORS:
        return None


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, media_type, payload).

    mapInPandas keeps the data partition-parallel end to end — no collect,
    no per-row Python round trips; batches arrive as pandas frames.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (missing/corrupt blob — routine at scale) maps
            # to NULL byte_len/features, never a worker crash
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pd.Series(
                        [None if p is None else len(p) for p in pdf["payload"]],
                        dtype="Int32",
                    ),
                    "features": [
                        _decode_or_null(p, m, fake)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=MULTIMODAL_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 256, every_n: int = 4
) -> DataFrame:
    """Video frame sampling plumbing: split each payload into fixed-size
    frames and emit every Nth — a 1-to-N Arrow-batched expansion (the shape a
    real ffmpeg-backed sampler needs; swapping in a codec touches only the
    chunking line). Output rows: (doc_id, frame_idx, frame_len, frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, lens, frames = [], [], [], []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                # missing blob OR missing identity -> zero frames: a frame
                # that can't be tied back to a document is useless, and a
                # NULL doc_id (NaN here) would crash the int64 output
                # column — one corrupt row must not kill the Python worker
                if p is None or pd.isna(d):  # defensive; filtered upstream
                    continue
                n_frames = (len(p) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    chunk = p[i * frame_size : (i + 1) * frame_size]
                    doc_ids.append(int(d))
                    idxs.append(i)
                    lens.append(len(chunk))
                    frames.append(bytes(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    # NULL ids/payloads are filtered SPARK-SIDE, before Arrow: one NULL in
    # a batch promotes the pandas doc_id column to float64, and float64
    # silently corrupts ids above 2^53 (snowflake-style 64-bit ids),
    # mis-attributing frames to a neighboring document (review finding) —
    # with the filter the column arrives int64-exact; the in-loop guard
    # stays as defense in depth
    return (
        df.filter(F.col("doc_id").isNotNull() & F.col("payload").isNotNull())
        .select("doc_id", "payload")
        .mapInPandas(run, FRAME_SCHEMA)
    )


def _resize_payload(
    payload: bytes | None, media_type: str, target_len: int, fake: bool
) -> bytes | None:
    """One payload's resize: the deterministic stride downsample (fake —
    the hash-verified default every driver query uses), or a REAL
    thumbnail (fake=False): pure-stdlib nearest-neighbor for binary PPM
    payloads (hermetically tested), Pillow LANCZOS + PNG re-encode for
    compressed formats when Pillow is present. ``target_len`` is the
    byte budget in fake mode and the bounding-box edge in real mode.
    NULL payload -> None (missing blob, never a worker crash)."""
    if payload is None:
        return None
    if fake:
        if len(payload) <= target_len:
            return bytes(payload)
        stride = len(payload) / target_len
        return bytes(payload[int(i * stride)] for i in range(target_len))
    if media_type.startswith("image/"):
        if payload[:2] == b"P6":
            # REAL resize through the vendored pure-stdlib PPM codec:
            # thumbnail semantics (shrink-only, aspect preserved, longest
            # edge <= target_len) with nearest-neighbor sampling — the
            # deterministic choice for a dependency-free lane; the Pillow
            # lane below keeps LANCZOS for compressed formats. Exercised
            # by the hermetic suite (tests/test_multimodal_real.py).
            import numpy as np

            arr = _ppm_decode(payload)
            h, w = arr.shape[0], arr.shape[1]
            scale = min(target_len / w, target_len / h, 1.0)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            # centered nearest-neighbor index grid (matches the standard
            # round-half-down pixel-center mapping)
            ri = np.minimum(((np.arange(nh) + 0.5) * h / nh).astype(int), h - 1)
            ci = np.minimum(((np.arange(nw) + 0.5) * w / nw).astype(int), w - 1)
            return _ppm_encode(arr[ri][:, ci])
        try:
            from io import BytesIO

            from PIL import Image
        except ImportError as exc:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "real resize of non-PPM images requires Pillow, which is not "
                "installed; pass fake=True for the deterministic stand-in or "
                "supply binary-PPM payloads"
            ) from exc
        with Image.open(BytesIO(payload)) as im:
            out = im.convert("RGB")
            # explicit resample filter: thumbnail()'s default changed
            # across Pillow versions — pin it so the output is stable
            out.thumbnail((target_len, target_len), Image.Resampling.LANCZOS)
            buf = BytesIO()
            out.save(buf, format="PNG")
            return buf.getvalue()
    raise NotImplementedError(
        f"no resizer for media_type={media_type!r} in this container; "
        "pass fake=True for the deterministic stand-in"
    )


def resize_payload(df: DataFrame, target_len: int = 64, fake: bool = True) -> DataFrame:
    """Resize plumbing: deterministic stride downsample of the payload bytes
    to ``target_len`` (the default), or a real Pillow thumbnail+PNG re-encode
    for images when ``fake=False`` and Pillow is installed (see
    :func:`_resize_payload`). Keeps doc_id, media_type, original and resized
    lengths, and the resized payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                _resize_or_null(p, m, target_len, fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_len": pd.Series(
                        [None if p is None else len(p) for p in pdf["payload"]],
                        dtype="Int32",
                    ),
                    "resized_len": pd.Series(
                        [None if r is None else len(r) for r in resized], dtype="Int32"
                    ),
                    "resized": pd.Series(resized, dtype="object"),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("orig_len", IntegerType()),
            StructField("resized_len", IntegerType()),
            StructField("resized", FRAME_SCHEMA["frame"].dataType),
        ]
    )
    return df.select("doc_id", "media_type", "payload").mapInPandas(run, schema)


def payload_metadata(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata projection (no Python): byte length per media type —
    the oracle-checkable part of the multimodal path."""
    return df.select(
        "doc_id",
        "media_type",
        F.length(F.col("payload")).cast("int").alias("byte_len"),
    )
