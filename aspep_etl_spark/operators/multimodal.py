"""[EXT] Multimodal column plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payload columns with typed
metadata maps.  The Spark-side plumbing — schema, partition-friendly batch
iteration, Arrow-batched pandas UDF signatures — is real and tested; the
actual codec work is stubbed (``decode_stub``) because media libraries are
not in this container.  Swapping the stub for PIL/ffmpeg keeps every
signature and plan shape intact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic fake decoder.

    A real deployment replaces this with PIL / libav decode; the container
    has neither, so dimensions are derived deterministically from payload
    bytes (stable across runs, good enough to exercise the plumbing).
    Raise ``NotImplementedError`` here to surface unstubbed codecs loudly.
    """
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    if modality == "image":
        return {"width": 64 + h[0] % 192, "height": 64 + h[1] % 192, "duration_ms": None}
    if modality in ("audio", "video"):
        return {"width": None, "height": None, "duration_ms": 1000 + int.from_bytes(h[2:4], "big")}
    raise NotImplementedError(f"unknown modality: {modality}")


def extract_media_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches through Python once — the only
    acceptable shape for Python-side media work at scale (per-row UDFs are
    10-100× slower).  Output schema is fixed (FEATURE_SCHEMA) so Catalyst
    can prune upstream columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                d = decode_stub(raw, modality)
                feats.append(
                    {
                        "asset_id": asset_id,
                        "modality": modality,
                        "n_bytes": len(raw),
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        "width": d["width"],
                        "height": d["height"],
                        "duration_ms": d["duration_ms"],
                    }
                )
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def documents_as_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the binary
    plumbing is exercisable on the driver's testdata (no media files in the
    container)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("media_meta"),
    )
