"""Multimodal column plumbing (extension goal, SURVEY M5).

Design: image/audio/video travel as opaque `binary` columns + typed metadata
structs; decode/feature steps are Arrow-batched pandas UDFs over mapInPandas.
The decode internals are STUBBED (codec libraries are not in this container)
behind `register_decoder` — the Spark-side plumbing (schemas, batch iteration,
partition sizing) is real and tested with a deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of decode_batch: per-asset metadata + fixed-size feature vec.
DECODED_SCHEMA = (
    "path string, modality string, n_bytes bigint, width int, height int, "
    "n_frames int, feature array<float>"
)

_DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {}


def register_decoder(modality: str, fn: Callable[[bytes], dict[str, Any]]) -> None:
    """Plug a real decoder (e.g. PIL/librosa-backed) for a modality.

    fn(payload_bytes) -> {"width": int, "height": int, "n_frames": int,
    "feature": list[float]}."""
    _DECODERS[modality] = fn


def deterministic_fake_decoder(payload: bytes) -> dict[str, Any]:
    """Container-safe stand-in: derives stable pseudo-metadata from the bytes
    themselves, so tests exercise the full distributed path end-to-end."""
    h = sum(payload[:64]) if payload else 0
    return {
        "width": 16 + h % 64,
        "height": 16 + (h // 64) % 64,
        "n_frames": 1,
        "feature": [float((b % 17)) / 17.0 for b in payload[:8].ljust(8, b"\0")],
    }


def decode_assets(binary_df: DataFrame, modality: str = "image") -> DataFrame:
    """Decode a binaryFile-sourced DataFrame (path, content, …) into metadata +
    features via mapInPandas (Arrow batches; decoder runs once per row inside
    a batch, never per-row Python round trips)."""
    decoder = _DECODERS.get(modality, deterministic_fake_decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                try:
                    meta = decoder(payload)
                except NotImplementedError:
                    meta = {"width": None, "height": None, "n_frames": None, "feature": None}
                out.append(
                    {
                        "path": path,
                        "modality": modality,
                        "n_bytes": len(payload),
                        **meta,
                    }
                )
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing: keep every nth frame index per asset
    (pure Catalyst: posexplode over a synthesized frame-index array)."""
    return (
        decoded.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .where(F.pmod(F.col("frame_idx"), F.lit(every_nth)) == 0)
    )


RESIZED_SCHEMA = (
    "path string, width int, height int, new_width int, new_height int, resized_fp string"
)


def resize_assets(decoded: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Aspect-preserving resize plumbing: fit (width, height) into a
    (max_w, max_h) box, never upscaling — new = max(1, floor(dim * scale)),
    scale = min(1, max_w/w, max_h/h), exact double math.

    The PIXEL work is stubbed (this container has no image codecs — same
    policy as decode_assets): the stand-in emits a deterministic fingerprint
    md5(path:new_wxnew_h) where a real deployment would emit the resized
    bytes, registered the same way via register_decoder. Everything
    Spark-side is real and tested: Arrow-batched mapInPandas, output schema,
    batch shape, and the fit arithmetic the oracle replays in SQL."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            scale = (max_w / w).clip(upper=1.0).combine(max_h / h, min)
            nw = (w * scale).apply(lambda x: max(1, int(x)))
            nh = (h * scale).apply(lambda x: max(1, int(x)))
            fp = [
                hashlib.md5(f"{p}:{a}x{b}".encode()).hexdigest()
                for p, a, b in zip(pdf["path"], nw, nh)
            ]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": nw,
                    "new_height": nh,
                    "resized_fp": fp,
                }
            )

    return decoded.select("path", "width", "height").mapInPandas(batches, RESIZED_SCHEMA)
