"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partitioning, Arrow batch shape) real and the
codec-level decode STUBBED (no image/audio libs in this container).

Pattern for a 100 TB multimodal corpus:
    media(doc_id, kind, payload:binary, meta:struct<width,height,n_frames>)
- payloads are opaque binary columns; NEVER decoded in Catalyst expressions
- decode / feature-extract / resize / frame-sample run as mapInPandas over
  Arrow record batches, bounded by maxRecordsPerBatch so a batch of payloads
  fits worker memory
- the deterministic fake header (8 bytes: magic u16 | width u16 | height u16
  | frames u16, big-endian) stands in for a real container format so the
  plumbing is testable end-to-end; swap `_decode_header_numpy` for PIL/ffmpeg
  on a real cluster
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = 0x6D6D  # 'mm'
HEADER_FMT = ">HHHH"
DECODED_SCHEMA = "doc_id long, kind string, width int, height int, n_frames int, payload_bytes long"


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: the payload is
    the fake header + the utf-8 text bytes (opaque to the engine)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def encode(batches):
        for pdf in batches:
            payloads = []
            kinds = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = 16 + (int(doc_id) * 7) % 240
                h = 16 + (int(doc_id) * 13) % 240
                frames = 1 + (int(doc_id)) % 4
                header = struct.pack(HEADER_FMT, MAGIC, w, h, frames)
                payloads.append(header + str(text).encode("utf-8"))
                kinds.append("video" if frames > 1 else "image")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": kinds, "payload": payloads}
            )

    return d.select("doc_id", "text").mapInPandas(
        encode, schema="doc_id long, kind string, payload binary"
    )


def _decode_header_numpy(payloads: pd.Series) -> pd.DataFrame:
    """Vectorized fake-header parse. THE REAL DECODER GOES HERE — e.g.
    PIL.Image.open(io.BytesIO(p)) per payload; raise for real formats."""
    heads = np.frombuffer(
        b"".join(bytes(p)[:8].ljust(8, b"\0") for p in payloads), dtype=">u2"
    ).reshape(-1, 4)
    if not (heads[:, 0] == MAGIC).all():
        raise NotImplementedError(
            "real media decoding not available in this container (no PIL/ffmpeg); "
            "payloads must carry the deterministic fake header"
        )
    return pd.DataFrame(
        {
            "width": heads[:, 1].astype(np.int32),
            "height": heads[:, 2].astype(np.int32),
            "n_frames": heads[:, 3].astype(np.int32),
        }
    )


def decode_media(media: DataFrame) -> DataFrame:
    """payload binary -> typed metadata via Arrow-batched mapInPandas."""

    def decode(batches):
        for pdf in batches:
            meta = _decode_header_numpy(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": meta["width"],
                    "height": meta["height"],
                    "n_frames": meta["n_frames"],
                    "payload_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (payload slicing stubbed — the explode/batch shape is the real part)."""
    decoded = decode_media(media)
    return decoded.select(
        "doc_id",
        "kind",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))).alias("frame_idx"),
        "width",
        "height",
    )


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: synthesize media + decode metadata (deterministic, so
    it is oracle-checkable: width/height/frames are pure doc_id arithmetic
    and payload_bytes = 8 + octet_length(text))."""
    return decode_media(synth_media(spark, sf_dir))


FEATURES_SCHEMA = "doc_id long, kind string, features array<double>"


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction over the opaque payload: normalized byte histogram
    of the body (past the 8-byte header) as a dense vector — a REAL,
    deterministic computation (no codec needed), vectorized with numpy over
    Arrow batches. On a real corpus the histogram swaps for a CNN/CLIP-style
    embedding; the batch shape, schema and downstream use (the vector feeds
    the ANN/near-dup operators unchanged) are identical."""

    def feats(batches):
        # ONE numpy pass per Arrow batch (no per-payload Python loop): all
        # bodies concatenated, then a single bincount over the composite key
        # (row_index * n_bins + bin) gives every row's histogram at once.
        # Real codec-backed embedders replace this whole function body — the
        # per-payload seam lives in decode/resize, not here.
        shift = int(8 - np.log2(n_bins))
        for pdf in batches:
            bufs = [bytes(p)[8:] for p in pdf["payload"]]
            n = len(bufs)
            if n == 0:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "kind": pdf["kind"],
                     "features": pd.Series([], dtype=object)}
                )
                continue
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
            data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            keys = np.repeat(
                np.arange(n, dtype=np.int64) * n_bins, lens
            ) + (data >> shift)
            counts = np.bincount(keys, minlength=n * n_bins).reshape(n, n_bins)
            denom = np.where(lens > 0, lens, 1).astype(np.float64)
            vecs = counts / denom[:, None]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": pdf["kind"],
                 "features": list(vecs.tolist())}
            )

    return media.mapInPandas(feats, schema=FEATURES_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize as payload transformation: rewrites the header dims (a real
    transformation of the fake container format; the body resample is where
    PIL/ffmpeg plugs in — same mapInPandas seam, same batch bounds). Output
    schema == input schema, so resize composes with decode/feature-extract."""

    def resize(batches):
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                out.append(struct.pack(HEADER_FMT, MAGIC, width, height,
                                       struct.unpack(HEADER_FMT, b[:8])[3]) + b[8:])
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return media.mapInPandas(resize, schema=media.schema)
