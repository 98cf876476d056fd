"""Multimodal column plumbing: binary media + typed metadata.

Image/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batch
``mapInPandas`` stages.  The decode kernels themselves are STUBBED — the
sandbox has no image/audio libraries — behind deterministic fakes clearly
marked below, but the Spark-side plumbing (schemas, batch iteration,
partitioning, UDF signatures) is real and tested, so swapping in PIL/ffmpeg
on a real cluster changes only the kernel body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def synthesize_media(spark, sf_dir: str):
    """documents.parquet → deterministic media table (MEDIA_SCHEMA shape):
    payload = utf-8 bytes of the text, kind cycles image/audio/video,
    video duration = (doc_id % 10 + 1) seconds.  Pure column expressions so
    the DuckDB oracle can mirror every derived field."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.when(kind == "image", ((F.col("doc_id") % 16) + 1) * 64)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("width"),
        F.when(kind == "image", ((F.col("doc_id") % 9) + 1) * 64)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("height"),
        F.when(kind == "video", ((F.col("doc_id") % 10) + 1) * 1000)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("duration_ms"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode_features(payload: bytes, dim: int = 16) -> list[float]:
    """STUB decode/feature-extract: deterministic bytes→vector fake.

    A real deployment replaces this with PIL/torchvision/ffmpeg decoding.
    Deterministic: sha256 of the payload expanded to `dim` floats in [0,1).
    """
    h = hashlib.sha256(payload).digest()
    out: list[float] = []
    i = 0
    while len(out) < dim:
        chunk = hashlib.sha256(h + i.to_bytes(4, "big")).digest()
        for b in range(0, 32, 4):
            if len(out) >= dim:
                break
            out.append(int.from_bytes(chunk[b : b + 4], "big") / 2**32)
        i += 1
    return out


def _pil_image_kernel():
    """Real image kernel, importable only where Pillow exists: decode →
    grayscale → resize to (dim, 1) → normalized pixel vector."""
    import io

    from PIL import Image  # noqa: F401  (raises ImportError in the sandbox)

    def decode(payload: bytes, dim: int) -> list[float]:
        img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
        return [px / 255.0 for px in img.getdata()]

    return decode


_REAL_KERNEL_FACTORIES = {
    # video decode wants ffmpeg bindings; none importable in the sandbox, so
    # image is the only real factory wired — the seam is the same for all
    "image": _pil_image_kernel,
}


def select_kernel(kind: str, override=None, use_real: bool = False):
    """Kernel-selection seam: ``(name, fn)`` — an injected override, else
    (only when the caller OPTS IN with ``use_real``) the real library
    kernel when its import succeeds, else the deterministic fake.

    The fake is the default even where Pillow is installed: the oracle
    contract pins the deterministic features, and real decoding only makes
    sense on corpora whose payloads actually are encoded media — opting in
    is the caller's assertion of that.  Resolution happens on the EXECUTOR
    (inside the mapInPandas closure) so library availability is evaluated
    where the work runs.
    """
    if override is not None:
        return ("override", override)
    factory = _REAL_KERNEL_FACTORIES.get(kind) if use_real else None
    if factory is not None:
        try:
            return ("real", factory())
        except ImportError:
            pass
    return ("fake", _fake_decode_features)


def extract_features(
    media: DataFrame, dim: int = 16, kernel_override=None, use_real: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    One ``mapInPandas`` stage; batches stream through the kernel chosen by
    ``select_kernel`` per media kind (deterministic fake by default; real
    library kernel when ``use_real=True`` and importable).  Output
    partitioning follows the input — no shuffle introduced, and kernel
    resolution happens once per task, not per row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernels: dict[str, object] = {}
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind not in kernels:
                    kernels[kind] = select_kernel(kind, kernel_override, use_real)[1]
                feats.append(kernels[kind](bytes(payload), dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: real impl decodes + resamples; the fake passes payload
    through and rewrites metadata, preserving schema + batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].map(
                lambda m: {
                    "mime": (m or {}).get("mime"),
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                }
            )
            yield pdf.assign(meta=meta)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampling for video rows: emits one synthetic frame row per
    ``every_ms`` of duration (real impl: ffmpeg keyframe extraction)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for mid, payload, meta in zip(vids["media_id"], vids["payload"], vids["meta"]):
                dur = (meta or {}).get("duration_ms") or 0
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows.append((mid, i, ts, bytes(payload)[:64]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "payload"])

    return media.mapInPandas(run, schema=out_schema)
