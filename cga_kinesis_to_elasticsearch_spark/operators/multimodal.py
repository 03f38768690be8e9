"""Multimodal columns (north star): image/audio/video as opaque binary
columns + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched pandas stages over ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. The actual media decode is STUBBED:
`decode_image` raises NotImplementedError unless an image library is
importable (none is baked into this container), and
`fake_decode_features` provides a deterministic stand-in so the
pipeline shape can be exercised end-to-end.

Design for 100 TB: binaries ride in their own column so column pruning
keeps them out of every query that doesn't touch them; feature
extraction is a mapInPandas pass (Arrow batches, no per-row Python
dispatch); repartition before decode bounds batch memory by
``maxRecordsPerBatch`` x typical blob size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_binary",
    "decode_image",
    "fake_decode_features",
    "extract_features",
    "resize_media",
    "sample_frames",
    "average_hash",
    "hamming_near_pairs",
]

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/audio/video
        StructField("format", StringType()),  # png/jpeg/wav/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_binary(
    df: DataFrame, payload_col: str, media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Wrap a column as an opaque media payload: ``media`` (binary) +
    ``media_meta`` (typed struct). In production the binary arrives
    from the source (S3 pointer dereference / inline blob)."""
    binary = F.col(payload_col).cast("binary")
    return df.withColumn("media", binary).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(binary).cast("long").alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes) -> Any:
    """Real image decode — requires a decoder library (PIL/cv2), which
    this container does not ship. The call site and batch plumbing are
    the real engine surface; swap this body on a cluster with the
    libraries installed."""
    try:
        from PIL import Image  # type: ignore
        import io as _io

        return Image.open(_io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not available in this container); "
            "use fake_decode_features for plumbing tests"
        ) from exc


def fake_decode_features(payload: bytes, n_features: int = 4) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: byte-bucket
    histogram normalized to [0,1]. Same contract (bytes -> fixed-length
    float vector) as a real embedding/feature extractor."""
    if not payload:
        return [0.0] * n_features
    counts = [0] * n_features
    for b in payload:
        counts[b % n_features] += 1
    total = len(payload)
    return [round(c / total, 6) for c in counts]


def extract_features(
    df: DataFrame, media_col: str = "media", n_features: int = 4
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out,
    appending ``media_features array<double>``. This is the template
    every real decoder plugs into (resize / frame-sample swap the inner
    function only)."""
    schema = StructType(
        df.schema.fields + [StructField("media_features", ArrayType(DoubleType()))]
    )

    # The closure is deliberately self-contained (no module-global refs)
    # so cloudpickle ships it by value and executor Python workers never
    # need this package importable — the driver may run the entry file
    # from outside the repo.
    def run(batches: Iterator[Any]) -> Iterator[Any]:
        def feats(p: Any) -> list[float]:
            payload = bytes(p) if p is not None else b""
            if not payload:
                return [0.0] * n_features
            counts = [0] * n_features
            for byte in payload:
                counts[byte % n_features] += 1
            total = len(payload)
            return [round(c / total, 6) for c in counts]

        for pdf in batches:
            pdf["media_features"] = pdf[media_col].map(feats)
            yield pdf

    return df.mapInPandas(run, schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
) -> DataFrame:
    """Resize stage: rewrites ``media`` and stamps the new dimensions
    into ``media_meta``. The pixel work is STUBBED deterministically
    (payload truncated/padded to width*height bytes — a stand-in with
    the same bytes->bytes contract a PIL/cv2 resize has); the Spark
    plumbing (mapInPandas batch shape, schema preservation, meta
    update) is the real surface.
    """
    schema = df.schema

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        target = width * height

        def rz(p: Any) -> bytes:
            payload = bytes(p) if p is not None else b""
            if len(payload) >= target:
                return payload[:target]
            return payload + b"\x00" * (target - len(payload))

        for pdf in batches:
            pdf[media_col] = pdf[media_col].map(rz)
            pdf["media_meta"] = pdf["media_meta"].map(
                lambda meta: {
                    **(dict(meta) if meta is not None else {}),
                    "width": width,
                    "height": height,
                    "n_bytes": target,
                }
            )
            yield pdf

    return df.mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    media_col: str = "media",
    out_col: str = "frames",
) -> DataFrame:
    """Frame-sampling stage for video payloads: emits ``out_col`` as
    ARRAY<BINARY>, one entry per sampled frame. Sampling is uniform
    over the payload (deterministic byte-slice stand-in for a real
    keyframe decoder — same contract: bytes -> K frame blobs)."""
    from pyspark.sql.types import BinaryType

    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(BinaryType()))]
    )

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        def frames(p: Any) -> list[bytes]:
            payload = bytes(p) if p is not None else b""
            if not payload:
                return []
            step = max(1, len(payload) // n_frames)
            return [payload[i * step : (i + 1) * step] for i in range(n_frames)]

        for pdf in batches:
            pdf[out_col] = pdf[media_col].map(frames)
            yield pdf

    return df.mapInPandas(run, schema)


def detect_scene_changes(
    df: DataFrame,
    id_col: str = "doc_id",
    frames_col: str = "frames",
    n_features: int = 4,
    threshold: float = 0.25,
) -> DataFrame:
    """Scene-change detection over sampled video frames: per-frame
    features (the deterministic byte-bucket stub — swap for a real
    frame embedding on a cluster with decoders), then the L1 distance
    between consecutive frames within each video; a boundary fires
    where the distance exceeds ``threshold``.

    Output: ``(id, frame_idx, dist_prev, is_scene_change)``; frame 0
    has NULL distance and never starts a scene change (it starts the
    video). Shape: one mapInPandas feature pass over exploded frames,
    then ONE window exchange on the video id — the same per-key
    ordered analysis as sessionization, applied to media."""
    frames = df.select(
        F.col(id_col), F.posexplode(frames_col).alias("frame_idx", "frame")
    )
    feats = extract_features(frames, media_col="frame", n_features=n_features)
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    prev = F.lag("media_features").over(w)
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("media_features"), prev, lambda a, b: F.abs(a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return (
        feats.select(
            id_col, "frame_idx", dist.alias("dist_prev")
        )
        .withColumn(
            "is_scene_change",
            F.coalesce(F.col("dist_prev") > threshold, F.lit(False)),
        )
    )


def audio_energy_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    window_bytes: int = 9,
    threshold: float = 0.5,
) -> DataFrame:
    """Audio activity segmentation (the VAD-shaped stage of an audio
    curation pipeline): the payload is cut into fixed byte windows,
    each window gets a deterministic energy proxy (mean byte value
    normalized to [0,1] — the stub contract a real RMS/spectral-energy
    extractor drops into), and consecutive same-side-of-threshold
    windows merge into (active|silent) segments via the standard
    boundary-running-count trick.

    Output: ``(id, segment_no, active, n_windows, from_window,
    to_window)`` — one row per contiguous segment. Shape: one
    mapInPandas energy pass over exploded windows, then one window
    exchange on the audio id (lag + running sum + group), the same
    per-key ordered analysis as sessionization."""
    from pyspark.sql import Window as W

    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.length(media_col) / window_bytes) - 1, F.lit(0)
                    ).cast("int"),
                ),
                lambda i: F.col(media_col).substr(
                    (i * window_bytes + 1).cast("int"), F.lit(window_bytes)
                ),
            )
        ).alias("window_idx", "chunk"),
    )

    schema = StructType(
        [f for f in exploded.schema.fields] + [StructField("energy", DoubleType())]
    )

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        def energy(p: Any) -> float:
            payload = bytes(p) if p is not None else b""
            if not payload:
                return 0.0
            return round(sum(payload) / (255.0 * len(payload)), 6)

        for pdf in batches:
            pdf["energy"] = pdf["chunk"].map(energy)
            yield pdf

    scored = exploded.mapInPandas(run, schema).drop("chunk")
    w = W.partitionBy(id_col).orderBy("window_idx")
    active = F.col("energy") > threshold
    is_boundary = (
        F.lag(active).over(w).isNull() | (F.lag(active).over(w) != active)
    )
    run_w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    numbered = scored.select(
        id_col,
        "window_idx",
        active.alias("active"),
        F.sum(is_boundary.cast("long")).over(run_w).alias("segment_no"),
    )
    return numbered.groupBy(id_col, "segment_no").agg(
        F.first("active").alias("active"),
        F.count(F.lit(1)).alias("n_windows"),
        F.min("window_idx").alias("from_window"),
        F.max("window_idx").alias("to_window"),
    )


def average_hash(
    df: DataFrame, media_col: str = "media", out_col: str = "media_ahash"
) -> DataFrame:
    """Perceptual average-hash over a fixed-size media payload: bit i
    of the signature is set iff byte i is strictly above the payload's
    mean byte value (the classic 8x8 aHash, computed here on the
    deterministic resize stub's bytes; a real image pipeline feeds
    grayscale pixels through the identical contract). The comparison
    is pure integer arithmetic (byte*n > sum) so the signature is
    bit-reproducible across engines — near-duplicate payloads differ
    in a handful of bits, enabling banded Hamming-distance search
    (see plans/mediahash.py) instead of exact-hash dedup only.

    Payloads must be pre-sized (resize_media) to <= 63 bytes so the
    signature fits a signed LONG. Arrow-batched mapInPandas, one pass,
    appends ``out_col LONG``.
    """

    schema = StructType(df.schema.fields + [StructField(out_col, LongType())])

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        def ahash(p: Any) -> int:
            payload = bytes(p) if p is not None else b""
            n = len(payload)
            if n == 0:
                return 0
            if n > 63:
                raise ValueError(f"payload too long for LONG ahash: {n}")
            total = sum(payload)
            h = 0
            for i, b in enumerate(payload):
                if b * n > total:
                    h |= 1 << i
            return h

        for pdf in batches:
            pdf[out_col] = pdf[media_col].map(ahash)
            yield pdf

    return df.mapInPandas(run, schema)


def hamming_near_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    n_bits: int = 36,
    n_bands: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """Banded Hamming-distance pair search over fixed-width integer
    signatures (aHash/pHash/SimHash alike): split the signature into
    ``n_bands`` contiguous bit bands; any pair within Hamming distance
    ``max_distance`` < n_bands must agree on at least one whole band
    (pigeonhole), so candidate generation is n_bands equi-joins on
    (band_no, band_bits) — never a cross join. Candidates are verified
    with the exact popcount of the XOR.

    Scale shape: the shuffle moves (band_key, id, hash) triples, not
    payloads; bucket sizes follow the band-value distribution exactly
    like MinHash-LSH banding (operators/similarity.py), and the
    distinct on (id_a, id_b) collapses multi-band hits. Output:
    ``(id_a, id_b, hamming)`` with id_a < id_b.
    """
    if max_distance >= n_bands:
        raise ValueError(
            f"banding guarantee needs max_distance < n_bands: "
            f"{max_distance} >= {n_bands}"
        )
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    sig = df.select(
        F.col(id_col).alias("__id"), F.col(hash_col).cast("long").alias("__h")
    )
    banded = sig.select(
        "__id",
        "__h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        F.shiftright("__h", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_bits"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("__id", "__h", "band.band_no", "band.band_bits")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_no") == F.col("r.band_no"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.bit_count(
                F.col("l.__h").bitwiseXOR(F.col("r.__h"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_distance)
        .distinct()
    )
    return pairs
