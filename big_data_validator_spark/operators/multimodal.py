"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Everything Spark-side is real and tested: schemas, Arrow-batched
``mapInPandas`` plumbing, batch shapes, partition sizing.  Decoding:

- **images decode for real** via :func:`decode_image` — Pillow when
  importable, else the built-in pure-stdlib PNG decoder
  (:func:`decode_png`), exercised end-to-end by
  :func:`image_decode_features` and its pytest;
- audio/video decode still needs libav/soundfile (not in this
  container) and raises ``NotImplementedError`` at the clearly-marked
  dispatch (:func:`_decode_asset`);
- the deterministic fake kernels (byte histogram / truncate-tile
  resize) remain the ORACLE path — byte math the DuckDB oracles can
  reproduce — and the default for the registry queries.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical schema for a multimodal asset column: opaque payload + typed
#: metadata.  At 100 TB the payload column dominates storage — keep it in
#: its own parquet column chunk (columnar pruning skips it for
#: metadata-only queries) and size ``spark.sql.files.maxPartitionBytes``
#: so a task's payload batch fits executor memory.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def assets_from_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a deterministic synthetic asset table from the documents table
    (the container has no real media): payload = utf-8 bytes of the text,
    media_type round-robins, dimensions derive from lengths.  Lets every
    downstream operator run with real binary columns and realistic sizes."""
    return df.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        (F.length(text_col) * 10).cast("int").alias("duration_ms"),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Minimal pure-stdlib PNG decoder: ``(width, height, channels,
    raw_pixels)`` with pixels in row-major channel-interleaved order.

    Supports the common subset — bit depth 8, color types 0 (grey),
    2 (RGB), 4 (grey+alpha), 6 (RGBA), no interlace — and all five
    scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9).  Exists
    so the real-decode path is exercisable end-to-end in environments
    without Pillow; :func:`decode_image` prefers Pillow when importable.
    """
    if not payload or not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    import struct
    import zlib

    pos = len(_PNG_MAGIC)
    width = height = channels = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} interlace={interlace} "
                    "outside the supported subset"
                )
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise NotImplementedError(f"PNG color_type={color_type}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("malformed PNG: missing IHDR or IDAT")
    raw = zlib.decompress(idat)
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0  # left
            b = prev[i]  # up
            c = prev[i - channels] if i >= channels else 0  # up-left
            if ftype == 1:  # Sub
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:  # Up
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:  # Average
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
            elif ftype != 0:
                raise ValueError(f"PNG filter type {ftype}")
        out += line
        prev = line
    return width, height, channels, bytes(out)


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real image decode — THE swap-in point the stubs document.

    Prefers Pillow when importable (any format PIL reads); falls back to
    the built-in :func:`decode_png` for PNG payloads so the real-decode
    path stays testable in this container (no media libs installed).
    Anything else raises ``NotImplementedError`` — callers that want the
    always-available deterministic path keep using the fake kernels,
    which remain the oracle-checked default.
    """
    try:
        import io

        from PIL import Image  # optional dependency

        img = Image.open(io.BytesIO(payload))
        img.load()
        channels = len(img.getbands())
        return img.width, img.height, channels, img.tobytes()
    except ImportError:
        pass
    if payload and payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    raise NotImplementedError(
        "media decoding beyond PNG requires Pillow/libav; not available "
        "in this environment — see module docstring"
    )


def _decode_asset(media_type: str, payload: bytes) -> bytes:
    """Decode dispatch for the feature/resize kernels: images route to
    :func:`decode_image` (real decode — Pillow or built-in PNG); audio
    and video still require external libraries and raise."""
    if media_type == "image":
        return decode_image(payload)[3]
    raise NotImplementedError(
        f"{media_type} decoding requires libav/soundfile; not available "
        "in this environment — see module docstring"
    )


def image_decode_features(assets: DataFrame) -> DataFrame:
    """REAL-decode feature extraction for image assets: decode each
    payload (:func:`decode_image`), emit per-channel pixel means as the
    feature vector — the same Arrow ``mapInPandas`` shape as
    :func:`extract_features`, but over decoded pixels instead of raw
    payload bytes.  Non-image and undecodable payloads yield a null
    feature rather than failing the batch (at 100 TB a corrupt asset
    must not kill the stage; the null rows are the failure sink)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                try:
                    if mt != "image":
                        raise NotImplementedError
                    w, h, ch, pixels = decode_image(p)
                    n = w * h
                    feats.append(
                        [
                            sum(pixels[c::ch]) / n / 255.0
                            for c in range(ch)
                        ]
                    )
                except (NotImplementedError, ValueError):
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature vector (stands in for a real encoder):
    byte-histogram folded to ``dim`` buckets, L1-normalized."""
    buckets = [0.0] * dim
    for i, byte in enumerate(payload or b""):
        buckets[byte % dim] += 1.0
    total = sum(buckets) or 1.0
    return [b / total for b in buckets]


def extract_features(
    assets: DataFrame,
    dim: int = 16,
    batch_decoder: Callable[[str, bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams Arrow record batches into Python — the payload
    bytes cross the JVM↔Python boundary once per batch, vectorized, never
    per-row (pickled-row UDFs would be ~10-100× slower at this width).
    The default kernel is the deterministic fake; pass ``batch_decoder``
    to plug a real one in.
    """
    kernel = batch_decoder or (lambda mt, p: _fake_feature(p, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf.apply(
                        lambda r: kernel(r["media_type"], r["payload"]), axis=1
                    ),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("ts_ms", IntegerType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB standing in for a real PIL/libav resample: deterministic
    truncate-or-tile of the payload to width*height bytes, so output size
    actually tracks the requested dimensions and tests can assert on it."""
    target = max(width * height, 1)
    data = payload or b"\x00"
    reps = target // len(data) + 1
    return (data * reps)[:target]


def resize_assets(
    assets: DataFrame,
    width: int,
    height: int,
    batch_resizer: Callable[[str, bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every image/video payload to ``width``×``height``.

    Same Arrow-batched ``mapInPandas`` shape as :func:`extract_features`:
    payloads cross the JVM↔Python boundary once per record batch.  The
    default kernel is the deterministic stub (no media libs in this
    container); pass ``batch_resizer`` for a real one.  Audio assets pass
    through unchanged (no spatial dims)."""
    kernel = batch_resizer or (
        lambda mt, p, w, h: _fake_resize(p, w, h)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            spatial = pdf["media_type"].isin(["image", "video"])
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": [
                        kernel(mt, p, width, height) if sp else p
                        for mt, p, sp in zip(
                            pdf["media_type"], pdf["payload"], spatial
                        )
                    ],
                    "width": [
                        width if sp else w
                        for w, sp in zip(pdf["width"], spatial)
                    ],
                    "height": [
                        height if sp else h
                        for h, sp in zip(pdf["height"], spatial)
                    ],
                }
            )
            yield out

    return assets.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, num_frames: int = 4) -> DataFrame:
    """Sample ``num_frames`` evenly-spaced frames from each video asset —
    a one-to-many ``mapInPandas`` (each input row yields multiple output
    rows; Arrow batches amortize the fan-out).  Frame payloads are
    deterministic byte slices standing in for decoded frames; ``ts_ms``
    spaces frames evenly across the asset's duration.

    Scale note: the output is ``num_frames``× the video row count but each
    frame row is payload/num_frames wide — total bytes stay ~constant and
    the exploded rows inherit the input partitioning (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_index": [], "ts_ms": [], "frame_payload": []}
            for _, r in pdf[pdf["media_type"] == "video"].iterrows():
                payload = r["payload"] or b""
                dur = r["duration_ms"] or 0
                step = max(len(payload) // num_frames, 1)
                for i in range(num_frames):
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_index"].append(i)
                    rows["ts_ms"].append(int(dur * i / num_frames))
                    rows["frame_payload"].append(
                        payload[i * step : (i + 1) * step]
                    )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


def payload_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only profile of a multimodal table — expression-only, and
    because payload is untouched, parquet column pruning means the scan
    never reads the heavy bytes (verify via ReadSchema in explain)."""
    return assets.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("asset_count"),
        F.sum(F.octet_length("payload")).alias("total_payload_bytes"),
        F.round(F.avg(F.octet_length("payload")), 4).alias("avg_payload_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


def phash_hashes(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """64-bit difference-hash (dHash) per binary payload — the
    perceptual-fingerprint device image dedup pipelines run, expressed
    over the payload's first 65 bytes (bit *i* = byte *i* < byte *i+1*).
    With a real decoder the same operator runs over the 8×9 downsampled
    grayscale grid; the bit rule, packing, and banding are identical —
    only the byte source changes (decode_image's pixel output slots in
    behind the same hex device).

    Everything is built from JVM-side expressions — hex the payload
    once, compare adjacent 2-char hex pairs (lexicographic hex-pair
    order == byte order within an engine regardless of hex case), pack
    into two BIGINT halves — so the hash job is one map-side pass with
    no Python in the plan, and the shipped integers are engine-portable
    (comparison results, never hex strings, cross the wire).

    Returns ``(id, lo, hi)`` — bits 0-31 and 32-63.
    """
    bits = F.expr(
        "transform(sequence(0, 63), i -> "
        f"IF(substr(hex({payload_col}), 2*i + 1, 2) < "
        f"substr(hex({payload_col}), 2*i + 3, 2), 1L, 0L))"
    )
    out = (
        assets.filter(F.length(F.col(payload_col)) >= 65)
        .select(F.col(id_col).alias("id"), bits.alias("_b"))
        .select(
            "id",
            F.expr(
                "aggregate(transform(sequence(1, 32), "
                "j -> element_at(_b, j) * shiftleft(1L, j - 1)), "
                "0L, (a, x) -> a + x)"
            ).alias("lo"),
            F.expr(
                "aggregate(transform(sequence(33, 64), "
                "j -> element_at(_b, j) * shiftleft(1L, j - 33)), "
                "0L, (a, x) -> a + x)"
            ).alias("hi"),
        )
    )
    return out


def phash_near_dup_pairs(
    assets: DataFrame,
    max_hamming: int = 3,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_bucket_size: Optional[int] = 1000,
) -> DataFrame:
    """Perceptual-hash NEAR-DUP pairs over binary assets — the
    multimodal dedup tier (image/frame near-dup by dHash), completing
    the dedup ladder's media column alongside the text tiers.

    Candidates come from LSH-style BANDING, never all-pairs: the 64-bit
    hash splits into ``max_hamming + 1`` bands (16-bit bands at the
    default 3), and by pigeonhole two hashes within ``max_hamming`` bits
    of each other agree on AT LEAST one full band — so a bucket join on
    (band index, band value) through
    :func:`~big_data_validator_spark.operators.dedup.capped_bucket_pairs`
    is provably LOSSLESS for the threshold while touching only
    same-band candidates (tests pin banded == brute-force).  The exact
    integer verdict is ``bit_count(lo⊕lo') + bit_count(hi⊕hi') ≤ t``.

    Returns ``(asset_a, asset_b, hamming)`` with ``asset_a < asset_b``.
    Scale: hashing is one map-side pass; the shuffle carries 4 band
    rows of 3 BIGINTs per asset; per-bucket pair work is bounded by the
    bucket cap (a degenerate corpus — all-black thumbnails — caps into
    leader edges instead of exploding).
    """
    from big_data_validator_spark.operators.dedup import (
        capped_bucket_pairs,
        pinned_caches,
    )

    if not 0 <= max_hamming <= 16:
        raise ValueError(f"max_hamming must be in [0, 16], got {max_hamming}")
    n_bands = max_hamming + 1
    hashes = phash_hashes(assets, id_col=id_col, payload_col=payload_col)
    # 64 bits into n_bands BALANCED contiguous spans: band b covers
    # 0-based bits [b*64//n_bands, (b+1)*64//n_bands).  Balanced
    # boundaries keep every band non-empty for any n_bands <= 64 —
    # the ceil-width split left phantom (empty) trailing bands for
    # n_bands in {9, 12, 14, 15, 17}, which silently broke the
    # pigeonhole losslessness at those thresholds.
    full = F.concat(
        F.expr("transform(sequence(0, 31), j -> shiftright(lo, j) & 1)"),
        F.expr("transform(sequence(0, 31), j -> shiftright(hi, j) & 1)"),
    )
    bands = (
        hashes.withColumn("_full", full)
        .select(
            "id",
            "lo",
            "hi",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {n_bands - 1}), b -> "
                    f"aggregate(transform(sequence("
                    f"CAST(b * 64 div {n_bands} + 1 AS INT), "
                    f"CAST((b + 1) * 64 div {n_bands} AS INT)), "
                    "j -> element_at(_full, j) * shiftleft(1L, "
                    f"CAST(j - b * 64 div {n_bands} - 1 AS INT))), "
                    "0L, (a, x) -> a + x))"
                )
            ).alias("_band_idx", "_band_val"),
        )
    )
    raw = capped_bucket_pairs(
        bands.select("id", "_band_idx", "_band_val", "lo", "hi"),
        ["_band_idx", "_band_val"],
        max_bucket_size,
        payload_cols=["lo", "hi"],
    )
    ham = F.expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)")
    out = (
        raw.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("id_a").alias("asset_a"),
            F.col("id_b").alias("asset_b"),
            "hamming",
        )
    )
    out._bdv_pinned = pinned_caches(raw)
    return out
