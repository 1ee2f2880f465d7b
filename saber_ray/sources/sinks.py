"""Output sinks: annotation JSON records (S6), metrics JSON (S7), and
the gated remote-fetch source stub (S3).

S6 reproduces the reference's public annotation record —
``{'text', 'title', 'ents': [{'start','end','text','label','xrefs'}]}``
(saber/saber.py:107-114) — from the engine's annotated-documents table,
so a consumer of the reference's JSON API can switch over directly.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data as rd


def annotation_records_batch(batch: pa.Table) -> pa.Table:
    """Annotated documents → reference-shaped annotation records.

    ``text`` is the concatenation of the document's text spans (media
    spans excluded, their refs listed separately so nothing is lost).
    Mention offsets are REMAPPED from span-local to document-level so
    ``record['text'][start:end] == mention text`` holds for every ent —
    the contract the reference's consumers rely on
    (saber/saber.py:107-112). ``span_idx`` is preserved for projecting
    back to the source span.
    """
    rows = {"doc_id": [], "title": [], "text": [], "ents": [], "media_refs": []}
    for doc_id, spans, ents in zip(
        batch["doc_id"].to_pylist(), batch["spans"].to_pylist(), batch["ents"].to_pylist()
    ):
        text_parts, media = [], []
        # doc-level char offset of each span's text within the joined text
        span_base: dict[int, int] = {}
        cursor = 0
        for idx, s in enumerate(spans):
            if s["kind"] == "text":
                span_base[idx] = cursor
                cursor += len(s["text"]) + 1  # the " " joiner
                text_parts.append(s["text"])
            else:
                media.append(s["media_ref"])
        rows["doc_id"].append(doc_id)
        rows["title"].append("")
        rows["text"].append(" ".join(text_parts))
        rows["ents"].append(
            [
                {
                    "start": span_base.get(e["span_idx"], 0) + e["start"],
                    "end": span_base.get(e["span_idx"], 0) + e["end"],
                    "text": e["text"],
                    "label": e["label"],
                    "span_idx": e["span_idx"],
                    "xrefs": e.get("xrefs", []),
                }
                for e in ents
            ]
        )
        rows["media_refs"].append(media)
    return pa.Table.from_pydict(rows)


def write_annotation_json(annotated: rd.Dataset, path: str) -> None:
    """S6: annotated documents → newline-delimited JSON records."""
    annotated.map_batches(annotation_records_batch, batch_format="pyarrow").write_json(
        path
    )


def write_metrics_json(scores: dict, path: str, partition: str = "eval") -> str:
    """S7: evaluation scores → JSON file (reference writes per-epoch
    ``epoch_NNN.txt`` score files, saber/metrics.py:240-284)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "partition": partition,
        "scores": {
            label: {
                "precision": v[0], "recall": v[1], "f1": v[2], "support": v[3]
            }
            for label, v in scores.items()
        },
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    return path


def fetch_pubmed_stub(*_args, **_kwargs):
    """S3: the reference fetches title/abstract from NCBI eutils
    (saber/utils/app_utils.py:19-80). This environment has no network;
    the connector is intentionally a stub."""
    raise NotImplementedError(
        "PubMed fetching requires network access; not available in this "
        "environment (reference: saber/utils/app_utils.py:19-80)"
    )


def compact_parquet(
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
    delete_src: bool = False,
) -> dict:
    """Small-file compaction for a checkpointed parquet directory: a
    resumable job's per-partition commits leave hundreds of sub-MB
    files (one per retried task per partition); readers then pay
    per-file open/footer costs and tiny row groups. Rewrites the tree
    into ~``target_mb`` files by streaming the directory through Ray
    Data with a block size matched to the target — rows are preserved
    exactly, layout is rebuilt.

    Returns {files_before, files_after, rows} for the job manifest.
    Scale shape: a pure streaming read→write (no shuffle); file count
    after ≈ bytes/target, independent of how fragmented the input was.
    Crash safety: the compacted set is written to a temp sibling and
    RENAMED into place only after the row-count check, so a crash at
    any point leaves the source intact plus at most a temp dir to
    sweep; rerunning after a completed rename fails loudly on the
    existing dst instead of double-writing. ``delete_src`` removes the
    fragmented tree only after the rename.
    """
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    import ray.data as rd

    src_abs = os.path.abspath(src_dir)
    dst_abs = os.path.abspath(dst_dir)
    if os.path.commonpath([src_abs, dst_abs]) == src_abs:
        raise ValueError(
            f"dst_dir {dst_dir!r} is inside src_dir {src_dir!r}: "
            "delete_src would remove the compacted output, and a rerun's "
            "recursive source glob would re-ingest it")
    if os.path.exists(dst_abs):
        raise FileExistsError(
            f"dst_dir {dst_dir!r} already exists — a prior compaction "
            "completed (or left a partial tree); remove it to recompact")

    files = sorted(glob.glob(os.path.join(src_dir, "**", "*.parquet"),
                             recursive=True))
    if not files:
        raise FileNotFoundError(f"no parquet files under {src_dir}")
    total_bytes = sum(os.path.getsize(f) for f in files)
    rows_before = sum(pq.read_metadata(f).num_rows for f in files)

    n_out = max(1, round(total_bytes / (target_mb * (1 << 20))))
    ds = rd.read_parquet(files)
    tmp_dir = dst_abs + ".inprogress"
    shutil.rmtree(tmp_dir, ignore_errors=True)  # stale crash leftover
    ds.repartition(n_out).write_parquet(tmp_dir)

    out_files = glob.glob(os.path.join(tmp_dir, "*.parquet"))
    rows_after = sum(pq.read_metadata(f).num_rows for f in out_files)
    if rows_after != rows_before:
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} in, {rows_after} out")
    os.rename(tmp_dir, dst_abs)
    if delete_src:
        shutil.rmtree(src_dir)
    return {"files_before": len(files), "files_after": len(out_files),
            "rows": rows_after}
