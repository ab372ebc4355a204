"""Multimodal columns: opaque binary blobs + typed metadata + Arrow-batch
decode / feature plumbing.

Beyond the reference (text-only); required of a training-data pipeline at
100 TB: images/audio/video ride along as `binary` columns with a typed
metadata struct, and every decode / feature-extract step is a vectorized
`mapInPandas` over Arrow batches — the Spark-side shapes (schema,
partitioning, batch signature) are real and tested.

The actual pixel/sample decode needs PIL / libav, which this container
does not ship. `decode_image_real` is therefore a clearly-marked stub
(NotImplementedError), and the tested path decodes a deterministic fake
blob format:

    IMG:{width:04d}x{height:04d}:{payload hex}
    AUD:{sample_rate:05d}:{n_samples:08d}:{payload hex}
    VID:{width:04d}x{height:04d}x{n_frames:04d}:{payload hex}

ASCII headers keep the fake oracle-checkable (DuckDB `decode(blob)` +
regexp), while the Spark-side plumbing is identical to what a real codec
UDF would use.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "url string, kind string, width int, height int, n_frames int, "
    "sample_rate int, n_samples int, n_bytes long"
)

_HDR = re.compile(
    rb"^(?:IMG:(\d{4})x(\d{4}):|AUD:(\d{5}):(\d{8}):|VID:(\d{4})x(\d{4})x(\d{4}):)"
)


def synthesize_media(docs: DataFrame, key: str = "url") -> DataFrame:
    """Deterministic media blobs derived from doc identity (no external
    data): doc hash picks kind and dimensions; payload = the md5 hex.
    Pure Column expressions — the synthesis itself is JVM-side. md5 (not
    xxhash64) so any engine, incl. the DuckDB oracle, reproduces it."""
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    kind = (h % 3).cast("int")
    hexpay = F.md5(key)
    img = F.format_string("IMG:%04dx%04d:", (h % 1920) + 1, (h % 1080) + 1)
    aud = F.format_string("AUD:%05d:%08d:", F.lit(16000) + (h % 32000), (h % 99999999) + 1)
    vid = F.format_string(
        "VID:%04dx%04dx%04d:", (h % 1280) + 1, (h % 720) + 1, (h % 9000) + 1
    )
    header = F.when(kind == 0, img).when(kind == 1, aud).otherwise(vid)
    return docs.select(
        F.col(key).alias("url"),
        F.encode(F.concat(header, hexpay), "UTF-8").alias("blob"),
    )


def decode_image_real(blob: bytes):
    """Real image decode — NOT IMPLEMENTED in this container (no PIL /
    imageio). On a real cluster, replace with `PIL.Image.open(BytesIO(
    blob))` inside the same mapInPandas batch loop as `decode_media_meta`;
    the schema and batch shape do not change."""
    raise NotImplementedError(
        "image codec libraries are not available in this sandbox; "
        "decode_media_meta() decodes the deterministic fake format instead"
    )


def _decode_one(url: str, blob) -> dict:
    b = bytes(blob) if blob is not None else b""
    m = _HDR.match(b)
    row = {
        "url": url, "kind": None, "width": None, "height": None,
        "n_frames": None, "sample_rate": None, "n_samples": None,
        "n_bytes": len(b),
    }
    if m is None:
        row["kind"] = "unknown"
        return row
    if m.group(1) is not None:
        row.update(kind="image", width=int(m.group(1)), height=int(m.group(2)))
    elif m.group(3) is not None:
        row.update(kind="audio", sample_rate=int(m.group(3)), n_samples=int(m.group(4)))
    else:
        row.update(
            kind="video", width=int(m.group(5)), height=int(m.group(6)),
            n_frames=int(m.group(7)),
        )
    return row


def decode_media_meta(media: DataFrame) -> DataFrame:
    """(url, blob) → typed metadata rows via mapInPandas Arrow batches.

    This is the exact plumbing a real codec would use: iterate Arrow
    batches, per-batch vectorized work, never a per-row Python UDF at the
    JVM boundary. Column pruning still applies upstream (only url+blob
    are read)."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [_decode_one(u, b) for u, b in zip(pdf["url"], pdf["blob"])]
            )

    return media.select("url", "blob").mapInPandas(go, META_SCHEMA)


def resize_plan(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize targets for image/video rows — pure
    Column math over the decoded metadata (JVM-side, codegen)."""
    scale = F.lit(float(max_side)) / F.greatest("width", "height").cast("double")
    eff = F.least(scale, F.lit(1.0))
    return meta.filter(F.col("kind").isin("image", "video")).select(
        "url",
        "kind",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * eff).cast("int"), F.lit(1)).alias("out_w"),
        F.greatest(F.round(F.col("height") * eff).cast("int"), F.lit(1)).alias("out_h"),
    )


def frame_sample(meta: DataFrame, every_n: int = 100) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index.

    `sequence` + `explode` keeps it JVM-side; the downstream frame decode
    would be another mapInPandas over (url, frame_idx) batches."""
    return (
        # n_frames <= 0 (corrupt/empty container) contributes no rows —
        # without the filter, sequence(0, -1, +step) raises and one bad
        # row kills the whole job
        meta.filter((F.col("kind") == "video") & (F.col("n_frames") > 0))
        .select(
            "url",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
