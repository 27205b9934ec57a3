"""Multimodal column plumbing: opaque binary payloads + typed metadata.

For a 100 TB multimodal training-data pipeline, image/audio/video assets are
opaque ``binary`` columns with typed metadata beside them; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas``. The decode step itself needs codec libraries that are NOT
in this environment, so it is STUBBED: ``decoder="fake"`` produces
deterministic synthetic outputs (shape-correct, seeded by content hash) so
the Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested; ``decoder="real"`` raises NotImplementedError
where Pillow/librosa/pyav would be called.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def synthesize_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table (asset_id, kind, payload, metadata) —
    the fixture for multimodal plumbing tests; payload = sha256 stream bytes."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                payload = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 4)
                rows.append((
                    i, kind, payload,
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    64 + (i % 8) * 16 if kind != "audio" else 0,
                    64 + (i % 5) * 16 if kind != "audio" else 0,
                    0 if kind == "image" else 1000 + i * 37,
                ))
            yield pd.DataFrame(rows, columns=[
                "asset_id", "kind", "payload", "mime", "width", "height", "duration_ms",
            ])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    # deterministic pseudo-features from the payload hash — stands in for the
    # decoder+model forward pass; stable across runs/partitionings
    h = hashlib.sha256(payload).digest()
    rng = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype="<u8")
    return (rng % 10_000).astype("float64") / 10_000.0


def extract_features(assets: DataFrame, dim: int = 32,
                     decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract → ``(asset_id, kind, features array<double>)``.

    Arrow-batched; one numpy pass per batch. ``decoder='real'`` marks where
    the actual codec call goes (NotImplementedError here — codec libs are
    not in this container)."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real decode requires Pillow/librosa/pyav — not available; "
                    "use decoder='fake' for plumbing tests"
                )
            feats = [_fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy("int64"),
                "kind": pdf["kind"],
                "features": feats,
            })

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema="asset_id long, kind string, features array<double>"
    )


def resize_images(assets: DataFrame, target_w: int = 224, target_h: int = 224,
                  decoder: str = "fake") -> DataFrame:
    """Resize plumbing → ``(asset_id, width, height, payload)``; fake mode
    rewrites metadata + re-hashes payload deterministically."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sub = pdf[pdf["kind"] == "image"]
            if decoder == "real":
                raise NotImplementedError("real resize requires Pillow")
            payloads = [
                hashlib.sha256(bytes(p) + f"{target_w}x{target_h}".encode()).digest()
                for p in sub["payload"]
            ]
            yield pd.DataFrame({
                "asset_id": sub["asset_id"].to_numpy("int64"),
                "width": np.full(len(sub), target_w, dtype="int32"),
                "height": np.full(len(sub), target_h, dtype="int32"),
                "payload": payloads,
            })

    return assets.mapInPandas(
        run, schema="asset_id long, width int, height int, payload binary"
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000,
                  decoder: str = "fake") -> DataFrame:
    """Frame sampling plumbing → ``(asset_id, frame_idx, ts_ms, payload)`` for
    video assets; fake mode emits hash-derived frame payloads at the right
    timestamps (the schema/batch shape the real decoder would produce)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sub = pdf[pdf["kind"] == "video"]
            if decoder == "real":
                raise NotImplementedError("real frame sampling requires pyav")
            out = {"asset_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for aid, dur, payload in zip(sub["asset_id"], sub["duration_ms"], sub["payload"]):
                n = max(1, int(dur) // every_ms)
                for fi in range(n):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(fi)
                    out["ts_ms"].append(fi * every_ms)
                    out["payload"].append(
                        hashlib.sha256(bytes(payload) + fi.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run, schema="asset_id long, frame_idx int, ts_ms int, payload binary"
    )
