"""Multimodal columns: image/audio/video as opaque `binary` payloads +
typed metadata, with decode / feature-extract / resize / frame-sample
as Arrow-batched Pandas UDFs over `mapInPandas`.

The image/audio codec libraries are NOT in this container, so the
actual decode step is STUBBED (deterministic fake features / explicit
NotImplementedError) — but the Spark-side plumbing is real and tested:
binary column schema, metadata struct, mapInPandas batch iteration,
and the partitioning contract (payloads never shuffle unless the
caller asks; feature extraction is a narrow map over Arrow batches).

At 100 TB: payload columns dominate bytes, so every transform prunes
them as early as possible (`drop("payload")` right after features are
derived), and `spark.sql.files.maxPartitionBytes` bounds the per-task
Arrow batch footprint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, feat array<double>"
)


def as_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a table into the multimodal layout: (id, payload binary,
    meta struct). The synthetic documents' text stands in for an
    encoded media blob."""
    return docs.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.octet_length(F.col(text_col).cast("binary")).alias("n_bytes"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decode would use PIL/libvips — not in this container."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; use extract_features (deterministic stub) instead"
    )


def extract_features(mm: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches via mapInPandas — the real
    codec call would replace the fake feature fn. Narrow operation: no
    shuffle, payload pruned from the output.

    The worker fn is fully self-contained (nested defs, no references
    to this module) so cloudpickle ships it BY VALUE — Python workers
    must not need the engine package importable on their sys.path."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_features(payload, n=4):
            if payload is None or len(payload) == 0:
                return [0.0] * n
            total = len(payload)
            return [
                float(total),
                float(payload[0]),
                float(payload[-1]),
                float(sum(payload[:: max(1, total // 64)]) % 997),
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "format": pdf["meta"].map(lambda m: m["format"]),
                    "feat": pdf["payload"].map(fake_features),
                }
            )

    return mm.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(mm: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """'Frame sampling' stub: emit one row per fixed-size chunk of the
    payload (the video analog: one row per sampled frame). Built-ins
    only — the chunk indexing happens JVM-side; a real codec would
    decode the chunk in a follow-up mapInPandas."""
    n_frames = F.ceil(F.col("meta.n_bytes") / F.lit(every_n_bytes)).cast("int")
    return (
        mm.withColumn("frame_id", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "doc_id",
            "frame_id",
            F.substring(
                F.col("payload").cast("string"),
                F.col("frame_id") * every_n_bytes + 1,
                every_n_bytes,
            ).alias("frame_payload"),
        )
    )


RESIZE_SCHEMA = (
    "doc_id bigint, out_h int, out_w int, checksum bigint, resized binary"
)


def resize_nearest(
    mm: DataFrame, src_width: int = 64, out_h: int = 16, out_w: int = 16
) -> DataFrame:
    """Nearest-neighbor resize over the opaque payload interpreted as a
    single-channel 8-bit raster: row width `src_width`, height =
    n_bytes // src_width (ragged tail dropped), source index pure
    integer floor math src_y = (y*H)//out_h, src_x = (x*src_width)//out_w
    — the thumbnail/normalize step an image-curation pipeline runs
    before embedding. A real decoder (PIL/libvips, absent here) would
    replace the raw-raster interpretation; the Spark contract is real:
    vectorized numpy fancy-indexing over Arrow batches (mapInPandas),
    narrow (zero shuffles), payload pruned to a fixed out_h·out_w
    thumbnail + an exact positional checksum
    Σ byte(p)·((p mod 97)+1) — all integer, so the whole Arrow path is
    certifiable BY VALUE via the ascii(substr) DuckDB replay
    (multimodal_features recipe; payloads are ASCII so char positions
    == byte positions). Payloads shorter than one row emit nothing."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        w_src, oh, ow = src_width, out_h, out_w
        weights = (np.arange(oh * ow, dtype=np.int64) % 97) + 1
        xs = (np.arange(ow, dtype=np.int64) * w_src) // ow

        def rows(doc_id, payload):
            if payload is None or len(payload) < w_src:
                return None
            b = np.frombuffer(payload, dtype=np.uint8)
            h = len(b) // w_src
            img = b[: h * w_src].reshape(h, w_src)
            ys = (np.arange(oh, dtype=np.int64) * h) // oh
            out = img[ys][:, xs]
            flat = out.reshape(-1).astype(np.int64)
            return doc_id, oh, ow, int((flat * weights).sum()), out.tobytes()

        for pdf in batches:
            out = [
                r
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
                if (r := rows(doc_id, payload)) is not None
            ]
            yield pd.DataFrame(
                out, columns=["doc_id", "out_h", "out_w", "checksum", "resized"]
            )

    return mm.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


AUDIO_ENERGY_SCHEMA = "doc_id bigint, frame_id int, n_samples int, energy bigint"


def audio_frame_energy(mm: DataFrame, frame_bytes: int = 128) -> DataFrame:
    """Audio-shaped feature extraction: treat the payload as 8-bit PCM
    and emit per-frame energy Σ(sample−128)² — the silence/activity
    detector every audio-curation pipeline runs first (drop silent
    spans before the expensive ASR/codec stage). A real decoder would
    replace the PCM interpretation; the Spark-side contract is real:
    vectorized numpy over Arrow batches (mapInPandas), payload pruned
    from the output, zero shuffles.

    Energy is an exact INTEGER (each term ≤ 128², frames of k bytes sum
    to ≤ k·2^14 — no float summation anywhere), so the whole Arrow path
    is certifiable BY VALUE against an ascii(substr)-replica oracle
    (the multimodal_features recipe: the synthetic payloads are ASCII,
    so char positions == byte positions in both engines)."""

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        k = frame_bytes

        def rows(doc_id, payload):
            if payload is None or len(payload) == 0:
                return
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            for f in range(0, (len(b) + k - 1) // k):
                seg = b[f * k : (f + 1) * k] - 128
                yield doc_id, f, len(seg), int((seg * seg).sum())

        for pdf in batches:
            out = [
                r
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
                for r in rows(doc_id, payload)
            ]
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_id", "n_samples", "energy"]
            )

    return mm.select("doc_id", "payload").mapInPandas(
        energies, AUDIO_ENERGY_SCHEMA
    )
