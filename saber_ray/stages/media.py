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
    """Nearest-neighbor resize to (out_h, out_w) over the decoded
    tensors (fake or real pixels alike).

    The pixel list column is flattened ONCE into a single numpy view;
    each row is a zero-copy slice of it (dims vary per row, so the
    gather itself is per-row, but no Python pixel lists are ever
    built), and the output pixels are assembled as one flat buffer →
    ListArray."""
    import pyarrow.compute as pc

    n = batch.num_rows
    pixels = batch["pixels"].combine_chunks()
    flat = pixels.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(pixels).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    hs = batch["height"].to_numpy(zero_copy_only=False)
    ws = batch["width"].to_numpy(zero_copy_only=False)
    cs = batch["channels"].to_numpy(zero_copy_only=False)

    out_px = np.empty((n, out_h * out_w * (cs[0] if n else 0)), dtype=np.uint8) \
        if n and (cs == cs[0]).all() else None
    out_rows = []
    for i in range(n):
        h, w, c = int(hs[i]), int(ws[i]), int(cs[i])
        px = flat[offs[i]:offs[i + 1]].reshape(h, w, c)
        ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        resized = px[ys][:, xs].reshape(-1)
        if out_px is not None:
            out_px[i] = resized
        else:
            out_rows.append(resized)
    flat_out = (out_px.reshape(-1) if out_px is not None
                else (np.concatenate(out_rows) if out_rows
                      else np.array([], dtype=np.uint8)))
    out_lens = (np.full(n, out_h * out_w, dtype=np.int64) * cs.astype(np.int64)
                if n else np.array([], dtype=np.int64))
    out_offs = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int32)
    pixels_arr = pa.ListArray.from_arrays(
        pa.array(out_offs, type=pa.int32()),
        pa.array(flat_out, type=DECODED_SCHEMA.field("pixels").type.value_type),
    )
    return pa.Table.from_arrays(
        [
            batch["doc_id"], batch["span_idx"], batch["media_ref"],
            pa.array(np.full(n, out_h, dtype=np.int64)),
            pa.array(np.full(n, out_w, dtype=np.int64)),
            pa.array(cs.astype(np.int64)),
            pixels_arr,
        ],
        schema=DECODED_SCHEMA,
    )


def media_features_batch(batch: pa.Table) -> pa.Table:
    """Feature-extract stage: per-media channel means + std.

    One flatten of the pixel column; per-row stats run on zero-copy
    numpy slices (no per-row ``as_py()`` list materialization)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    pixels = batch["pixels"].combine_chunks()
    flat = pixels.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    lens = pc.list_value_length(pixels).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    cs = batch["channels"].to_numpy(zero_copy_only=False)
    feats = []
    for i in range(n):
        c = int(cs[i])
        px = flat[offs[i]:offs[i + 1]].reshape(-1, c)
        feats.append(
            np.concatenate([px.mean(axis=0), px.std(axis=0)]).astype(np.float32)
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "media_ref": batch["media_ref"],
            "features": pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())),
        }
    )


def frame_sample(num_frames: int, every_k: int) -> list[int]:
    """Deterministic frame-sampling indices (video path): every k-th frame."""
    return list(range(0, num_frames, every_k))


def pair_media_captions(documents: rd.Dataset) -> rd.Dataset:
    """Interleaved-structure kernel: pair every NON-text span with its
    nearest PRECEDING text span in the same document's span order — the
    "caption" a curation pass keeps alongside an image/audio segment
    before packing multimodal training rows.

    Fully vectorized over the Arrow list column: flatten once, compute
    per-span document membership from the list offsets, and find each
    media span's caption with ONE running maximum over text positions
    (reset at document boundaries via the offset compare) — no Python
    loop over docs or spans. One row per media span:
    (doc_id, span_idx, media_ref, caption, caption_chars);
    caption is null when no text span precedes the media span.
    """
    import numpy as np
    import pyarrow.compute as pc

    def pair(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        empty = pa.table({
            "doc_id": pa.array([], type=doc_ids.type),
            "span_idx": pa.array([], type=pa.int64()),
            "media_ref": pa.array([], type=pa.string()),
            "caption": pa.array([], type=pa.string()),
            "caption_chars": pa.array([], type=pa.int64()),
        })
        if len(spans) == 0:
            return empty
        offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]   # re-base: a SLICED ListArray's
        # raw offsets don't start at 0, but flatten() re-bases values
        flat = spans.flatten()                      # StructArray of spans
        n_flat = len(flat)
        if n_flat == 0:
            return empty
        # doc index of each flattened span, and each span's doc start
        doc_of = np.repeat(np.arange(len(spans), dtype=np.int64),
                           np.diff(offsets))
        doc_start = offsets[doc_of]
        pos = np.arange(n_flat, dtype=np.int64)
        is_text = pc.fill_null(
            pc.equal(flat.field("kind"), pa.scalar("text")), False
        ).to_numpy(zero_copy_only=False).astype(bool)
        # running "position of the latest text span so far" (global);
        # a value before the span's own doc start means "no caption"
        last_text = np.maximum.accumulate(np.where(is_text, pos, -1))
        media_rows = np.nonzero(~is_text)[0]
        if len(media_rows) == 0:
            return empty
        cap_pos = last_text[media_rows]
        has_cap = cap_pos >= doc_start[media_rows]
        texts = flat.field("text")
        cap_idx = np.where(has_cap, cap_pos, 0)
        captions = texts.take(pa.array(cap_idx, type=pa.int64()))
        captions = pc.if_else(pa.array(has_cap), captions,
                              pa.nulls(len(media_rows), pa.string()))
        return pa.table({
            "doc_id": doc_ids.take(pa.array(doc_of[media_rows])),
            "span_idx": pa.array(media_rows - doc_start[media_rows],
                                 type=pa.int64()),
            "media_ref": flat.field("media_ref").take(
                pa.array(media_rows, type=pa.int64())),
            "caption": captions,
            "caption_chars": pc.coalesce(
                pc.cast(pc.utf8_length(captions), pa.int64()),
                pa.scalar(0, pa.int64())),
        })

    return documents.map_batches(pair, batch_format="pyarrow")
