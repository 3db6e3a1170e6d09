"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque `binary` payload columns with typed metadata, and a
decode / feature-extract stage over `mapInPandas`.

The Spark-side architecture is the real thing and fully tested:

- payloads travel as BinaryType columns (Arrow `binary`), so executors
  stream them in columnar batches without base64 inflation;
- decode runs in `mapInPandas` — per-batch Python with access to every
  column, the right shape for codec work (one batch ≈ one GPU/codec
  call), unlike a scalar UDF which would re-enter per column;
- batch size is controlled by `spark.sql.execution.arrow.maxRecordsPerBatch`
  so a 100 MB-per-row video table can cap memory per task;
- downstream metadata (width/height/frames) is plain columns →
  predicate pushdown works on it after the decoded table is persisted.

The actual codec step is STUBBED: this container has no image/audio
libraries (no PIL/cv2/ffmpeg). `decoder="real"` raises
NotImplementedError at the exact integration point; the default
deterministic fake derives metadata from the payload bytes themselves
(length + md5), which keeps the full pipeline testable end-to-end and
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id bigint, media_type string, byte_len bigint, "
                 "width bigint, height bigint, n_frames bigint, fp string")


def attach_payload(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Simulate a multimodal lake row: binary payload + modality tag.
    (In production the payload arrives from the object store; here it
    is the utf-8 text bytes, which keeps an SQL oracle possible.)"""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video").alias("media_type"))


def _fake_decode_row(payload: bytes, media_type: str) -> tuple:
    """Deterministic stand-in for the codec: metadata from the bytes."""
    n = len(payload)
    width = 64 + n % 192
    height = 64 + (n * 7) % 128
    if media_type == "video":
        frames = 1 + n % 24
    elif media_type == "audio":
        frames = 1 + n % 16
    else:
        frames = 1
    return n, width, height, frames, hashlib.md5(payload).hexdigest()


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract stage over binary payloads."""
    if decoder == "real":  # pragma: no cover - integration point
        raise NotImplementedError(
            "real decode needs PIL/cv2/soundfile/ffmpeg — not shipped "
            "in this container; wire them in here (per-batch loop "
            "below stays identical).")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            meta = [_fake_decode_row(p, m)
                    for p, m in zip(b["payload"], b["media_type"])]
            out = pd.DataFrame(
                meta, columns=["byte_len", "width", "height",
                               "n_frames", "fp"])
            out.insert(0, "media_type", b["media_type"].values)
            out.insert(0, "doc_id", b["doc_id"].values)
            yield out

    return df.mapInPandas(_decode, schema=DECODE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8,
                     extractor: str = "fake") -> DataFrame:
    """Feature-extraction stage: binary payload → a dim-length float
    vector (emitted as scalar columns f0..f{dim-1} — pushdown-friendly
    and exactly hashable). In production this batch is one model
    forward pass (CLIP/wav2vec/...) at the marked integration point;
    the deterministic fake derives each component from
    md5(payload ‖ ':' ‖ k) as a 48-bit integer scaled by 2⁻⁴⁸ — every
    step exact in double on both engines, so the stage is
    oracle-checkable. Narrow map, no shuffle; the output feeds the
    similarity operators directly."""
    if extractor == "real":  # pragma: no cover - integration point
        raise NotImplementedError(
            "real feature extraction needs a vision/audio model — "
            "batch forward pass goes here; the per-batch loop below "
            "stays identical.")
    dim_ = int(dim)
    schema = ("doc_id bigint, media_type string, "
              + ", ".join(f"f{k} double" for k in range(dim_)))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cols = {"doc_id": b["doc_id"], "media_type": b["media_type"]}
            feats = [[int(hashlib.md5(bytes(p) + f":{k}".encode())
                          .hexdigest()[:12], 16) / 2.0 ** 48
                      for p in b["payload"]] for k in range(dim_)]
            for k in range(dim_):
                cols[f"f{k}"] = feats[k]
            yield pd.DataFrame(cols)

    return df.mapInPandas(_extract, schema=schema)


RESIZE_SCHEMA = ("doc_id bigint, media_type string, width bigint, "
                 "height bigint, out_w bigint, out_h bigint, fp string")


def resize_media(df: DataFrame, max_w: int, max_h: int,
                 decoder: str = "fake") -> DataFrame:
    """Resize stage over decoded media: caps each payload at
    (max_w, max_h) preserving nothing fancy — the real transform is a
    codec call at the marked integration point; the fake derives the
    output dims + a new fingerprint deterministically so the stage is
    oracle-checkable. Input is `decode_media` output; narrow map, no
    shuffle — at 100 TB this pipelines with the decode stage inside one
    task."""
    if decoder == "real":  # pragma: no cover - integration point
        raise NotImplementedError(
            "real resize needs PIL/cv2 — wire in here; the per-batch "
            "loop below stays identical.")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_w = b["width"].clip(upper=max_w)
            out_h = b["height"].clip(upper=max_h)
            fp = [hashlib.md5(f"{f}:{w}x{h}".encode()).hexdigest()
                  for f, w, h in zip(b["fp"], out_w, out_h)]
            yield pd.DataFrame({
                "doc_id": b["doc_id"], "media_type": b["media_type"],
                "width": b["width"], "height": b["height"],
                "out_w": out_w, "out_h": out_h, "fp": fp})

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_fp string"


def sample_frames(df: DataFrame, step: int,
                  decoder: str = "fake") -> DataFrame:
    """Frame-sampling stage: one video row → one row per kept frame
    (every ``step``-th of its n_frames) — the UDTF shape, expressed as
    `mapInPandas` emitting more rows than it consumes. The fake keeps
    the reference frame count rule (n_frames = 1 + byte_len % 24) and
    fingerprints each frame from (payload text, index); a real extractor
    replaces the fingerprint with the decoded frame bytes at the marked
    point. Narrow map: the explode happens inside the task, so row
    blowup never shuffles."""
    if decoder == "real":  # pragma: no cover - integration point
        raise NotImplementedError(
            "real frame extraction needs ffmpeg/cv2 — wire in here.")
    step_ = int(step)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, fps = [], [], []
            for doc_id, payload, mt in zip(b["doc_id"], b["payload"],
                                           b["media_type"]):
                if mt != "video":
                    continue
                text = bytes(payload).decode("utf-8")
                n_frames = 1 + len(payload) % 24
                for k in range(0, n_frames, step_):
                    ids.append(doc_id)
                    idxs.append(k)
                    fps.append(hashlib.md5(
                        f"{text}:{k}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_fp": fps})

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)
