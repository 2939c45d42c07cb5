"""Multimodal (image) operators over BinaryType columns — Arrow-batched
``mapInPandas`` stages with real Spark plumbing (schema, partitioning,
batch shape). The pixel work uses the repo's own pure-numpy codec
(codec.py), so decode/resize/phash are REAL here; the spots where a
production system would call PIL/libjpeg/ffmpeg are marked and isolated
to one function each.

Operators:
- decode_meta:    bytes -> (w, h, fmt, decode_ok) + optional phash
- resize:         bytes -> re-encoded bytes at (w, h) via box-average
- frame_sample:   stub for video (deterministic fake: k sub-crops) —
                  ffmpeg is not in this container; the Spark plumbing
                  (explode one row into k frame rows) is real and tested
- embed_stub:     bytes -> deterministic pseudo-embedding (stands in for
                  a vision tower; real shape/partition semantics)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import decode_image, encode_image, phash64

DECODE_META_SCHEMA = (
    "image_id string, w int, h int, fmt string, decode_ok boolean, phash long"
)


def decode_meta(df: DataFrame, with_phash: bool = True) -> DataFrame:
    """(image_id, bytes) -> decoded metadata. Column-pruned input: only
    the two needed columns cross into Arrow."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, fmts, oks, phs = [], [], [], [], [], []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                ids.append(iid)
                try:
                    px = decode_image(bytes(raw))
                    hs.append(px.shape[0])
                    ws.append(px.shape[1])
                    fmts.append("jpeg" if bytes(raw[:4]) == b"WJPG" else "png")
                    oks.append(True)
                    phs.append(phash64(px) if with_phash else None)
                except Exception:
                    ws.append(None)
                    hs.append(None)
                    fmts.append(None)
                    oks.append(False)
                    phs.append(None)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "w": pd.array(ws, dtype="Int32"),
                    "h": pd.array(hs, dtype="Int32"),
                    "fmt": fmts,
                    "decode_ok": oks,
                    "phash": pd.array(phs, dtype="Int64"),
                }
            )

    return df.select("image_id", "bytes").mapInPandas(fn, DECODE_META_SCHEMA)


def _box_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic box-average resize (pure numpy). A production build
    swaps this single function for PIL's Lanczos."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h + 1) * h / out_h).astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).astype(int)
    out = np.empty((out_h, out_w, 3), dtype=np.float64)
    csum = px.astype(np.float64).cumsum(0).cumsum(1)
    z = np.zeros((1, csum.shape[1], 3))
    csum = np.vstack([z, csum])
    z2 = np.zeros((csum.shape[0], 1, 3))
    csum = np.hstack([z2, csum])
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            area = (y1 - y0) * (x1 - x0)
            out[i, j] = (
                csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
            ) / area
    return np.clip(out, 0, 255).astype(np.uint8)


def resize(df: DataFrame, out_w: int, out_h: int, fmt: str = "png") -> DataFrame:
    """(image_id, bytes) -> (image_id, bytes@WxH, w, h)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_image(bytes(raw))
                outs.append(encode_image(_box_resize(px, out_w, out_h), fmt))
                ids.append(iid)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": outs,
                    "w": np.full(len(ids), out_w, dtype="int32"),
                    "h": np.full(len(ids), out_h, dtype="int32"),
                }
            )

    return df.select("image_id", "bytes").mapInPandas(
        fn, "image_id string, bytes binary, w int, h int"
    )


def frame_sample(df: DataFrame, k: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one payload row -> k frame rows.

    STUB: no ffmpeg in this container, so 'frames' are deterministic
    quadrant crops of the still image — the row-explosion semantics,
    schema and partition behavior are exactly what a real decoder needs.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, outs = [], [], []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_image(bytes(raw))
                h, w = px.shape[:2]
                crops = [
                    px[: h // 2, : w // 2],
                    px[: h // 2, w // 2 :],
                    px[h // 2 :, : w // 2],
                    px[h // 2 :, w // 2 :],
                ]
                for i in range(min(k, 4)):
                    ids.append(iid)
                    fidx.append(i)
                    outs.append(encode_image(np.ascontiguousarray(crops[i]), "png"))
            yield pd.DataFrame({"image_id": ids, "frame_idx": fidx, "bytes": outs})

    return df.select("image_id", "bytes").mapInPandas(
        fn, "image_id string, frame_idx int, bytes binary"
    )


def embed_stub(df: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic pseudo vision embedding: per-channel block means,
    L2-normalized. Stands in for a GPU tower; at scale this stage runs
    with `spark.task.resource.gpu.amount` set and a model handle opened
    once per worker in the generator prologue."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        side = int(np.sqrt(dim // 4))
        for pdf in batches:
            ids, vecs = [], []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_image(bytes(raw)).astype(np.float64)
                h, w = px.shape[:2]
                hh, ww = h // side * side, w // side * side
                blocks = px[:hh, :ww].reshape(
                    side, hh // side, side, ww // side, 3
                ).mean(axis=(1, 3))
                g = blocks.mean(axis=2).flatten()
                extra = np.array(
                    [px.mean(), px.std(), float(h), float(w)]
                    + [0.0] * (dim - side * side - 4)
                )
                v = np.concatenate([g, extra])[:dim]
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype(np.float32).tolist())
                ids.append(iid)
            yield pd.DataFrame({"image_id": ids, "embedding": vecs})

    return df.select("image_id", "bytes").mapInPandas(
        fn, "image_id string, embedding array<float>"
    )
