"""Multimodal column handling: media spans as opaque binary payloads with
typed metadata, plus decode / resize / frame-sample stages.

The engine treats image/audio/video as ``binary`` columns: media spans
are extracted from interleaved documents into a media table
(``doc_id, span_idx, media_ref, media_type, payload``), processed by
actor-pool ``map_batches`` stages, and the RESULTS (tensors/features)
travel as fixed-shape list columns.

The actual codec step is environment-dependent: image/audio libraries
are not available in this container, so ``MediaDecoder`` tries to import
them and otherwise raises ``NotImplementedError`` — while
``FakeMediaDecoder`` produces deterministic payload-derived tensors so
ALL the Ray-side plumbing (schemas, batch sizing, actor signature,
output layout, downstream resize/frame-sample math) is real and tested.
Swapping in a real decoder changes one class, nothing else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import stable_u64_md5

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("media_ref", pa.string()),
        ("height", pa.int32()),
        ("width", pa.int32()),
        ("channels", pa.int32()),
        ("pixels", pa.list_(pa.uint8())),  # row-major H*W*C
    ]
)


def extract_media_spans(documents: rd.Dataset) -> rd.Dataset:
    """Interleaved documents → media table (one row per non-text span).

    Payload is the (possibly empty) bytes behind ``media_ref``; in this
    sandbox refs are synthetic so the payload is the ref itself — the
    plumbing (schema, explode, downstream batching) is what matters.
    """

    def explode(batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in MEDIA_SCHEMA.names}
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for idx, span in enumerate(spans):
                if span["kind"] == "text":
                    continue
                rows["doc_id"].append(doc_id)
                rows["span_idx"].append(idx)
                rows["media_ref"].append(span["media_ref"])
                rows["media_type"].append(span["kind"])
                rows["payload"].append(span["media_ref"].encode("utf-8"))
        return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)

    return documents.map_batches(explode, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage backed by a real image library.

    Raises NotImplementedError in environments without PIL — use
    ``FakeMediaDecoder`` there (same signature, same output schema).
    """

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError as e:  # pragma: no cover - sandbox has no PIL
            raise NotImplementedError(
                "MediaDecoder needs an image library (PIL); this environment "
                "has none — use FakeMediaDecoder for plumbing tests"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError("real decode path requires PIL")


class FakeMediaDecoder:
    """Deterministic stand-in decoder: tensor content derived from the
    payload hash; dimensions bounded so batch memory stays predictable.

    The hash is md5-based (``stable_u64_md5``) so a DuckDB oracle can
    reproduce the decoded dimensions exactly:
    ``('0x' || substr(md5(ref), 1, 16))::UBIGINT`` → ``4 + h % 13`` /
    ``4 + (h // 256) % 13`` at the default ``max_side=16`` — the
    ``media_decode`` driver query value-checks the whole
    inject → extract → actor-pool decode path against SQL.

    Large binary payloads need small ``batch_size`` — callers should pass
    ``batch_size≈32`` and let the object store spill, exactly as a real
    decoder stage would.
    """

    def __init__(self, max_side: int = 16, channels: int = 3):
        self._max_side = max_side
        self._c = channels

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in DECODED_SCHEMA.names}
        for doc_id, span_idx, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["span_idx"].to_pylist(),
            batch["media_ref"].to_pylist(), batch["payload"].to_pylist(),
        ):
            h64 = stable_u64_md5(payload or b"")
            height = 4 + (h64 % (self._max_side - 3))
            width = 4 + ((h64 >> 8) % (self._max_side - 3))
            rng = np.random.RandomState(h64 % (2**32))
            pixels = rng.randint(0, 256, size=(height * width * self._c,), dtype=np.uint8)
            rows["doc_id"].append(doc_id)
            rows["span_idx"].append(span_idx)
            rows["media_ref"].append(ref)
            rows["height"].append(int(height))
            rows["width"].append(int(width))
            rows["channels"].append(self._c)
            rows["pixels"].append(pixels.tolist())
        return pa.Table.from_pydict(rows, schema=DECODED_SCHEMA)


def resize_batch(batch: pa.Table, out_h: int, out_w: int) -> pa.Table:
    """Nearest-neighbor resize to (out_h, out_w) — real vectorized math
    over the decoded tensors (works identically on fake or real pixels)."""
    rows = {n: [] for n in DECODED_SCHEMA.names}
    for i in range(batch.num_rows):
        h = batch["height"][i].as_py()
        w = batch["width"][i].as_py()
        c = batch["channels"][i].as_py()
        px = np.asarray(batch["pixels"][i].as_py(), dtype=np.uint8).reshape(h, w, c)
        ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        resized = px[ys][:, xs]
        rows["doc_id"].append(batch["doc_id"][i].as_py())
        rows["span_idx"].append(batch["span_idx"][i].as_py())
        rows["media_ref"].append(batch["media_ref"][i].as_py())
        rows["height"].append(out_h)
        rows["width"].append(out_w)
        rows["channels"].append(c)
        rows["pixels"].append(resized.reshape(-1).tolist())
    return pa.Table.from_pydict(rows, schema=DECODED_SCHEMA)


def media_features_batch(batch: pa.Table) -> pa.Table:
    """Feature-extract stage: per-media channel means + std (vectorized)."""
    feats, ids, refs = [], [], []
    for i in range(batch.num_rows):
        c = batch["channels"][i].as_py()
        px = np.asarray(batch["pixels"][i].as_py(), dtype=np.float32).reshape(-1, c)
        feats.append(
            np.concatenate([px.mean(axis=0), px.std(axis=0)]).astype(np.float32).tolist()
        )
        ids.append(batch["doc_id"][i].as_py())
        refs.append(batch["media_ref"][i].as_py())
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "media_ref": pa.array(refs, type=pa.string()),
            "features": pa.array(feats, type=pa.list_(pa.float32())),
        }
    )


def frame_sample(num_frames: int, every_k: int) -> list[int]:
    """Deterministic frame-sampling indices (video path): every k-th frame."""
    return list(range(0, num_frames, every_k))
