"""Resumable partitioned KG job runner.

``run_kg_job`` executes the flagship pipeline over a parquet corpus with
per-partition checkpointing:

* input fragments (parquet files) are grouped into partitions; each
  partition runs the streaming annotate → mentions/triples pass and
  writes partitioned parquet under ``out/<table>/part=<id>/``;
* a manifest record (lineage: input fragments; metrics: rows, wall_ms;
  integrity: spot-check span hash; identity: config hash) is written
  atomically AFTER the partition's outputs are complete — on resume,
  partitions with a matching "done" record are skipped entirely;
* the graph stage (salted canonicalization over ALL staged
  mentions/triples) runs at the end in two checkpointed levels: one
  partials pass staged to parquet hive-partitioned by key-hash group,
  then one reduce PER group — a crash mid-graph resumes at group
  granularity instead of redoing the whole reduce.

Partition granularity is the resume granularity: at 100 TB a partition
should be ~one storage fragment group (tens of GB), so a failed run
loses at most one partition of work while the inner Dataset still
parallelizes across the whole cluster.

The per-row span-sequence invariant is enforced INSIDE the stages
(stages/annotate.py asserts it when a ``span_hash`` column is present);
the manifest's ``span_hash`` is a deterministic spot-check fingerprint
of the partition's first input rows, recorded so a resumed run can
detect that an input fragment changed underneath a completed partition.
"""

from __future__ import annotations

import glob
import os
import shutil
from dataclasses import asdict

import pyarrow.parquet as pq

import ray.data as rd

from .. import __version__
from ..functions.hashing import span_sequence_hash, stable_hex
from ..state.manifest import Manifest, PartitionRecord, StageTimer, config_hash
from ..stages.preprocess import validate_documents
from ..stages.triples import emit_triples, explode_mentions
from .kg import KGConfig, annotate, dedicated_pool


def _staged_read(path, columns: list[str] | None = None) -> rd.Dataset:
    """Re-read a staged table in ~cluster-CPU-count blocks.

    Staged dirs hold one small file per upstream block; re-reading them
    1:1 yields sub-100ms tasks, and the driver dispatches only ~100
    tasks/s — the downstream stage then runs ~10-wide no matter how many
    CPUs exist (measured: canonicalize 5.2 s -> 2.7 s at 2M docs /
    32 cpus after coalescing the read).

    ``columns`` prunes the read at the parquet layer — each consumer of
    the staged annotated table names exactly what it uses (quarantine
    never reads ``ents``, triples never reads the raw ``spans``
    payload), so unneeded column bytes never leave storage.
    """
    import ray

    try:
        nb = max(16, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        nb = 16
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)


def _partition_inputs(paths: list[str], partitions: int) -> list[list[str]]:
    """Fragment grouping by FILENAME HASH — appending new fragments to
    the corpus moves only the groups that receive them, so an
    incremental re-run re-processes those partitions and skips the rest
    (round-robin by index would reshuffle every group on any append)."""
    from ..functions.hashing import stable_u64

    n = max(1, partitions)
    groups: list[list[str]] = [[] for _ in range(n)]
    for p in sorted(paths):
        groups[stable_u64(os.path.basename(p)) % n].append(p)
    return groups


def _spot_hash(files: list[str], sample_rows: int = 64) -> str:
    """Deterministic fingerprint of a partition's input: fragment names,
    row counts, and the span hashes of the first ``sample_rows`` rows of
    the first fragment (metadata-cheap; detects changed inputs)."""
    parts = []
    per_fragment = max(1, sample_rows // max(1, len(files)))
    for f in sorted(files):
        md = pq.ParquetFile(f)
        parts.append(f"{os.path.basename(f)}:{md.metadata.num_rows}")
        # sample rows from EVERY fragment (a change confined to one
        # fragment must invalidate the partition), tolerating empties
        batch = next(iter(md.iter_batches(batch_size=per_fragment)), None)
        if batch is not None and "spans" in batch.schema.names:
            for spans in batch.column("spans").to_pylist():
                spans = spans or []
                parts.append(
                    span_sequence_hash(
                        [s["kind"] for s in spans],
                        [s["text"] for s in spans],
                        [s["media_ref"] for s in spans],
                    )
                )
    return stable_hex("\x1f".join(parts), size=16)


def _written_rows(path: str) -> int:
    total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def run_kg_job(
    input_glob: str,
    out_dir: str,
    config: KGConfig | None = None,
    partitions: int = 8,
    max_partitions: int | None = None,
) -> dict:
    """Run (or resume) the partitioned KG job. Returns a summary dict.

    ``max_partitions`` limits how many incomplete partitions this call
    processes (used by tests to simulate an interrupted run).
    """
    config = config or KGConfig()
    if config.tagger_concurrency is None:
        # the job runner owns the cluster and every stage is
        # single-branch, so the annotate pool(s) can be pinned at width —
        # autoscaling would ramp ~1 actor/s at every partition start
        # (kg.dedicated_pool). The bundle path runs TWO chained pools
        # (NeuralTagger → EntityLinker), so each gets a half-width pin:
        # chained pinned pools are still single-branch (the 1.5x-cluster
        # deadlock only bites parallel join branches). The config
        # identity hash below uses asdict_like, which excludes pool
        # sizing, so resume records stay valid across cluster sizes.
        from dataclasses import replace

        n_pools = 2 if config.bundle_path else 1
        config = replace(config, tagger_concurrency=dedicated_pool(n_pools))
        if config.bundle_path and config.linker_concurrency is None:
            config = replace(config, linker_concurrency=dedicated_pool(2))
    # partition count is part of the job identity: a different grouping
    # maps fragments to different part dirs, so mixing is invalidated
    cfg_hash = config_hash(
        repr(asdict_like(config)) + f"|partitions={partitions}", __version__
    )
    manifest = Manifest(out_dir, cfg_hash)
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input fragments match {input_glob}")
    groups = _partition_inputs(files, partitions)

    ran, skipped = [], []
    for pid, group in enumerate(groups):
        if not group:
            skipped.append(pid)
            continue
        rec = manifest.read("annotate", pid)
        # computed once: the resume check AND the manifest record reuse
        # it (it re-opens every fragment to hash spot rows)
        group_hash = _spot_hash(group)
        if (
            rec is not None
            and rec.status == "done"
            and rec.config_hash == cfg_hash
            # resume is only valid if the partition's INPUT is unchanged:
            # same fragment set and same spot-check content hash
            and rec.input_fragments == [os.path.basename(f) for f in group]
            and rec.span_hash == group_hash
        ):
            skipped.append(pid)
            continue
        if max_partitions is not None and len(ran) >= max_partitions:
            continue
        # this partition WILL re-run: the previously aggregated dedup
        # drop-list, curation sample and graph are now stale — invalidate
        # their records persistently BEFORE doing any work, so a crash
        # mid-way cannot leave a trusted stale aggregate
        manifest.invalidate("dedup", 0)
        manifest.invalidate("curation", 0)
        manifest.invalidate("graph_partials", 0)
        manifest.invalidate_stage("graph")
        with StageTimer() as timer:
            docs = rd.read_parquet(group)
            rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in group)
            ann_dir = os.path.join(out_dir, "annotated", f"part={pid:06d}")
            mentions_dir = os.path.join(out_dir, "mentions", f"part={pid:06d}")
            triples_dir = os.path.join(out_dir, "triples", f"part={pid:06d}")
            quarantine_dir = os.path.join(out_dir, "quarantine", f"part={pid:06d}")
            # a crash between data write and manifest write leaves partial
            # output; the rerun must start from empty dirs or the uniquely
            # named parquet files accumulate as duplicate rows
            for d in (ann_dir, mentions_dir, triples_dir, quarantine_dir):
                shutil.rmtree(d, ignore_errors=True)
            # ONE pass over the input: validation flags travel with the
            # rows (the annotator is null-safe and yields 0 mentions for
            # invalid docs), and the staged annotated table — Saber's
            # per-doc output, saber/saber.py:114, a first-class output —
            # carries them. Quarantine (M10: flagged, never silently
            # dropped) and mentions/triples all derive from the staged
            # parquet, so neither the input read nor the tagger runs
            # twice.
            flagged = docs.map_batches(validate_documents, batch_format="pyarrow")
            annotate(flagged, config).write_parquet(ann_dir)
            # quarantine keeps the WHOLE document payload (any extra
            # corpus metadata columns included — an operator triaging
            # quarantined rows needs provenance) but never reads the
            # (large) derived ents column; mentions/triples read ONLY
            # doc_id + ents — the raw spans payload never leaves
            # storage for them
            import pyarrow.dataset as pads

            quarantine_cols = [
                c for c in pads.dataset(ann_dir).schema.names
                if c not in ("ents", "span_hash")
            ]
            _staged_read(
                ann_dir, columns=quarantine_cols
            ).filter(expr="valid == False").write_parquet(quarantine_dir)
            n_quarantined = _written_rows(quarantine_dir)
            _staged_read(ann_dir, columns=["doc_id", "ents"]).map_batches(
                explode_mentions, batch_format="pyarrow"
            ).write_parquet(mentions_dir)
            # capture only the bool: a `config` closure would pickle the
            # whole KGConfig (incl. production-scale gazetteer dicts)
            # into every task of this stateless stage
            same_sentence = config.same_sentence
            _staged_read(ann_dir, columns=["doc_id", "ents"]).map_batches(
                lambda b: emit_triples(b, same_sentence=same_sentence),
                batch_format="pyarrow",
            ).write_parquet(triples_dir)
        manifest.write(
            PartitionRecord(
                stage="annotate",
                partition_id=pid,
                input_fragments=[os.path.basename(f) for f in group],
                rows_in=rows_in,
                rows_out=_written_rows(triples_dir),
                span_hash=group_hash,
                wall_ms=timer.wall_ms,
                status="done",
                config_hash=cfg_hash,
                extra={"mentions_rows": _written_rows(mentions_dir),
                       "quarantined_rows": n_quarantined},
            )
        )
        ran.append(pid)

    nonempty = [p for p in range(len(groups)) if groups[p]]
    summary = {
        "partitions": len(groups),
        "ran": ran,
        "skipped": skipped,
        "complete": all(p in ran or p in skipped for p in nonempty),
    }
    if not summary["complete"]:
        return summary

    # the graph stage globs every part dir under the output tables: part
    # dirs from a previous partitioning scheme (different partition
    # count) or from fragments that no longer exist must not leak into
    # the aggregate
    valid_pids = set(ran) | {p for p in skipped if groups[p]}
    stale = _remove_stale_parts(out_dir, valid_pids)
    if stale:
        manifest.invalidate("dedup", 0)
        manifest.invalidate("curation", 0)
        manifest.invalidate("graph_partials", 0)
        manifest.invalidate_stage("graph")

    # ---- dedup stage: global dup drop-list over staged documents ----
    # (optional; checkpointed like the graph stage — any annotate
    # partition re-run invalidated it above). The drop-list is written
    # as partitioned parquet by the cluster, never materialized on the
    # driver.
    drop_dir = os.path.join(out_dir, "dedup", "dropped")
    if config.dedup:
        if not manifest.is_done("dedup", 0):
            # graph AND curation both derive from the drop-list
            manifest.invalidate("graph_partials", 0)
            manifest.invalidate_stage("graph")
            manifest.invalidate("curation", 0)
            with StageTimer() as timer:
                shutil.rmtree(os.path.join(out_dir, "dedup"), ignore_errors=True)
                # exact dedup fingerprints via the span_hash invariant;
                # minhash shingles the span text — neither reads ents
                dedup_cols = (["doc_id", "valid", "span_hash"]
                              if config.dedup == "exact"
                              else ["doc_id", "valid", "spans"])
                ann = _staged_read(os.path.join(out_dir, "annotated"),
                                   columns=dedup_cols)
                _dropped_ids(ann, config).write_parquet(drop_dir)
            manifest.write(
                PartitionRecord(
                    stage="dedup",
                    partition_id=0,
                    input_fragments=["annotated/"],
                    rows_in=_written_rows_tree(os.path.join(out_dir, "annotated")),
                    rows_out=_written_rows(drop_dir),
                    span_hash="",
                    wall_ms=timer.wall_ms,
                    status="done",
                    config_hash=cfg_hash,
                    extra={"method": config.dedup},
                )
            )
            summary["dedup"] = "ran"
        else:
            summary["dedup"] = "skipped"

    # ---- curation stage: sampling + sequence packing over staged docs ----
    # (optional; checkpointed). Carries its OWN config hash derived from
    # the job hash + curation params, so tuning the sample or the pack
    # budget re-runs ONLY this stage — the annotate partitions (the
    # expensive tagger work) stay valid. Any annotate re-run invalidated
    # the record above.
    if config.curation:
        k_repr = (repr(sorted(config.curation_k.items()))
                  if isinstance(config.curation_k, dict)
                  else repr(config.curation_k))
        curation_hash = config_hash(
            cfg_hash + f"|curation={config.curation}|k={k_repr}"
            f"|pack={config.pack_budget}", __version__)
        rec = manifest.read("curation", 0)
        if not (rec is not None and rec.status == "done"
                and rec.config_hash == curation_hash):
            with StageTimer() as timer:
                shutil.rmtree(os.path.join(out_dir, "curation"),
                              ignore_errors=True)
                ann = _staged_read(
                    os.path.join(out_dir, "annotated"),
                    columns=["doc_id", "valid", "spans"],
                ).filter(expr="valid == True")
                texts = ann.map_batches(_doc_text, batch_format="pyarrow")
                if config.dedup:
                    # curation samples AFTER dedup: duplicated documents
                    # must not multiply their sampling probability or
                    # land as duplicate copies in the packed output
                    dup_set = _read_drop_ids(drop_dir)
                    if dup_set is not None and len(dup_set):
                        def not_dup(batch, _ds=dup_set):
                            import pyarrow.compute as _pc

                            return batch.filter(_pc.invert(
                                _pc.is_in(batch["doc_id"], value_set=_ds)))

                        texts = texts.map_batches(
                            not_dup, batch_format="pyarrow")
                # doc_id type from a staged parquet FOOTER (metadata-only
                # read) — Dataset.schema() on a map_batches lineage would
                # execute the UDF chain for a block just to learn a type
                ann_files = glob.glob(os.path.join(
                    out_dir, "annotated", "**", "*.parquet"), recursive=True)
                id_type = pq.read_schema(ann_files[0]).field("doc_id").type
                kept_dir = os.path.join(out_dir, "curation", "kept")
                packed_dir = os.path.join(out_dir, "curation", "packed")
                _curation_kept_ids(texts, config).write_parquet(kept_dir)
                # both samplers return O(k) rows by construction, so the
                # kept-id set broadcasts as an is_in mask — the corpus
                # streams once with no shuffle (the dedup drop-list shape)
                keep_ids = _read_keep_ids(kept_dir, id_type)

                def keep(batch, _ks=keep_ids):
                    import pyarrow.compute as _pc

                    return batch.filter(
                        _pc.is_in(batch["doc_id"], value_set=_ks))

                from ..stages.packing import pack_sequences

                pack_sequences(
                    texts.map_batches(keep, batch_format="pyarrow"),
                    budget=config.pack_budget,
                ).write_parquet(packed_dir)
            manifest.write(
                PartitionRecord(
                    stage="curation",
                    partition_id=0,
                    input_fragments=["annotated/"],
                    rows_in=_written_rows_tree(os.path.join(out_dir, "annotated")),
                    rows_out=_written_rows(packed_dir),
                    span_hash="",
                    wall_ms=timer.wall_ms,
                    status="done",
                    config_hash=curation_hash,
                    extra={"method": config.curation,
                           "kept_rows": _written_rows(kept_dir),
                           "pack_budget": config.pack_budget},
                )
            )
            summary["curation"] = "ran"
        else:
            summary["curation"] = "skipped"

    # ---- graph stage: global canonicalization over all staged outputs ----
    # Two checkpointed levels (re-run partitions invalidated both above):
    #
    # * ``graph_partials`` (ONE record): a single streaming pass over the
    #   staged mentions/triples computing per-batch partial aggregates,
    #   written as parquet hive-partitioned by ``group = stable_u64(key)
    #   % graph_groups`` (entity_id for nodes, (src,pred,dst) for edges —
    #   deterministic, so every partial of a key lands in one group);
    # * ``graph`` (one record PER group): the salted two-level reduce of
    #   one group's partials → ``nodes/group=<g>/``, ``edges/group=<g>/``.
    #
    # A crash mid-graph resumes at GROUP granularity: completed groups'
    # reduces are skipped entirely. At 100 TB the global reduce is the
    # long tail of the job — an all-or-nothing stage record would redo
    # all of it on a crash in the last group.
    from ..stages.canonicalize import (
        partial_edges,
        partial_nodes,
        reduce_edge_partials,
        reduce_node_partials,
    )

    n_groups = max(1, config.graph_groups)
    # graph identity: its OWN hash (job hash + grouping), so retuning
    # graph_groups re-runs only the graph stage, never annotate
    graph_hash = config_hash(cfg_hash + f"|graph_groups={n_groups}", __version__)
    gp_dir = os.path.join(out_dir, "graph_partials")
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    num_salts = config.num_salts

    def _graph_done(stage: str, pid: int) -> bool:
        rec = manifest.read(stage, pid)
        return (rec is not None and rec.status == "done"
                and rec.config_hash == graph_hash)

    ran_graph = False
    if not _graph_done("graph_partials", 0):
        # stale partials invalidate every group reduce AND their outputs
        manifest.invalidate_stage("graph")
        with StageTimer() as timer:
            for d in (gp_dir, nodes_dir, edges_dir):
                shutil.rmtree(d, ignore_errors=True)
            # partial_nodes reads (text, entity_id, doc_id); partial_edges
            # reads (doc_id, subj, pred, obj, score) — offsets/labels/xrefs
            # never leave storage for the graph reduce
            mentions = _staged_read(os.path.join(out_dir, "mentions"),
                                    columns=["doc_id", "text", "entity_id"])
            triples = _staged_read(os.path.join(out_dir, "triples"),
                                   columns=["doc_id", "subj", "pred",
                                            "obj", "score"])
            drop_set = _read_drop_ids(drop_dir) if config.dedup else None
            if drop_set is not None and len(drop_set):
                # the drop-list (dup doc ids) is orders of magnitude
                # smaller than the corpus — broadcast anti-semi-join:
                # one is_in mask per batch, mentions/triples stream with
                # no shuffle. (A drop-list approaching corpus size would
                # need the co-partitioned join in stages/pairs.py.)
                def keep(batch, _ds=drop_set):
                    import pyarrow.compute as _pc

                    return batch.filter(
                        _pc.invert(_pc.is_in(batch["doc_id"], value_set=_ds))
                    )

                mentions = mentions.map_batches(keep, batch_format="pyarrow")
                triples = triples.map_batches(keep, batch_format="pyarrow")
            mentions.map_batches(
                lambda b: _with_group(
                    partial_nodes(b, num_salts), ["entity_id"], n_groups),
                batch_format="pyarrow",
            ).write_parquet(os.path.join(gp_dir, "nodes"),
                            partition_cols=["group"])
            triples.map_batches(
                lambda b: _with_group(
                    partial_edges(b, num_salts), ["src", "pred", "dst"],
                    n_groups),
                batch_format="pyarrow",
            ).write_parquet(os.path.join(gp_dir, "edges"),
                            partition_cols=["group"])
        manifest.write(
            PartitionRecord(
                stage="graph_partials",
                partition_id=0,
                input_fragments=["mentions/", "triples/"],
                rows_in=_written_rows_tree(os.path.join(out_dir, "triples")),
                rows_out=_written_rows_tree(gp_dir),
                span_hash="",
                wall_ms=timer.wall_ms,
                status="done",
                config_hash=graph_hash,
                extra={"graph_groups": n_groups},
            )
        )
        ran_graph = True

    for g in range(n_groups):
        if _graph_done("graph", g):
            continue
        with StageTimer() as timer:
            out_n = os.path.join(nodes_dir, f"group={g}")
            out_e = os.path.join(edges_dir, f"group={g}")
            for d in (out_n, out_e):
                shutil.rmtree(d, ignore_errors=True)
            part_n = os.path.join(gp_dir, "nodes", f"group={g}")
            part_e = os.path.join(gp_dir, "edges", f"group={g}")
            # a group can be empty (no key hashed to it) — valid, 0 rows
            if os.path.isdir(part_n):
                reduce_node_partials(_staged_read(part_n)).write_parquet(out_n)
            if os.path.isdir(part_e):
                reduce_edge_partials(_staged_read(part_e)).write_parquet(out_e)
        manifest.write(
            PartitionRecord(
                stage="graph",
                partition_id=g,
                input_fragments=[f"graph_partials/*/group={g}/"],
                rows_in=(_written_rows(part_n) if os.path.isdir(part_n) else 0)
                + (_written_rows(part_e) if os.path.isdir(part_e) else 0),
                rows_out=_written_rows(out_e) if os.path.isdir(out_e) else 0,
                span_hash="",
                wall_ms=timer.wall_ms,
                status="done",
                config_hash=graph_hash,
                extra={"nodes_rows":
                       _written_rows(out_n) if os.path.isdir(out_n) else 0},
            )
        )
        ran_graph = True
    summary["graph"] = "ran" if ran_graph else "skipped"
    return summary


def read_job_output(out_dir: str, table: str) -> "rd.Dataset":
    """Schema-stable reader for a :func:`run_kg_job` output table.

    The on-disk layout is resumable-by-construction — ``part=N`` (input
    shard) and ``group=N`` (graph reduce group) subdirectories — which
    hive-style dataset discovery would surface as an EXTRA inferred
    partition column. This reader strips those bookkeeping columns so
    consumers see exactly the NODES/EDGES/mentions schema regardless of
    how the job was partitioned or resumed.
    """
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(out_dir, table))
    drop = [c for c in ("part", "group") if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


def _with_group(t, key_cols: list[str], num_groups: int):
    """Append ``group = stable_u64(key) % num_groups`` to a partials
    table. The key is the REDUCE key (entity_id / (src,pred,dst)), not
    the salt — every partial of one key must land in one group so each
    group's two-level reduce is self-contained. stable_u64 (blake2b) is
    stable across processes and runs, which the resume contract needs
    (partials written by run A are reduced by run B). blake2b runs once
    per DISTINCT key in the batch (np.unique + inverse gather — partials
    repeat each key once per salt/batch)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import stable_u64

    if t.num_rows == 0:
        return t.append_column("group", pa.array([], type=pa.int64()))
    if len(key_cols) == 1:
        keys = t[key_cols[0]].to_pylist()
    else:
        keys = ["\x1f".join(vals)
                for vals in zip(*(t[c].to_pylist() for c in key_cols))]
    uniq, inverse = np.unique(np.array(keys, dtype=object), return_inverse=True)
    uniq_groups = np.array(
        [stable_u64(k) % num_groups for k in uniq.tolist()], dtype=np.int64
    )
    return t.append_column(
        "group", pa.array(uniq_groups[inverse], type=pa.int64())
    )


def _remove_stale_parts(out_dir: str, valid_pids: set[int]) -> int:
    """Delete output part dirs not produced by the current partitioning.
    Returns how many were removed (each removal invalidates the graph)."""
    removed = 0
    for table in ("annotated", "mentions", "triples", "quarantine"):
        for d in glob.glob(os.path.join(out_dir, table, "part=*")):
            try:
                pid = int(os.path.basename(d).split("=", 1)[1])
            except ValueError:
                continue
            if pid not in valid_pids:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
    return removed


def _doc_text(batch):
    """Interleaved documents → (doc_id, text): the text-span contents
    joined with spaces (media spans contribute nothing to shingles)."""
    import pyarrow as pa

    texts = []
    for spans in batch["spans"].to_pylist():
        texts.append(" ".join(
            s["text"] for s in (spans or [])
            if s["kind"] == "text" and s["text"]
        ))
    return pa.table({
        "doc_id": batch["doc_id"],
        "text": pa.array(texts, type=pa.string()),
    })


def _dropped_ids(ann: rd.Dataset, config: KGConfig) -> rd.Dataset:
    """The configured dedup flavor's drop-list over staged annotated docs."""
    from ..stages.dedup import (
        edit_dup_dropped_ids,
        exact_dropped_ids,
        near_dup_dropped_ids,
    )

    # quarantined (invalid) docs all share an empty span sequence — they
    # must not collapse into one giant "dup group" (they contribute no
    # mentions/triples anyway)
    ann = ann.filter(expr="valid == True")
    if config.dedup == "exact":
        return exact_dropped_ids(ann)
    if config.dedup == "minhash":
        texts = ann.map_batches(_doc_text, batch_format="pyarrow")
        return near_dup_dropped_ids(
            texts, min_jaccard=config.dedup_min_jaccard
        )
    if config.dedup == "edit":
        texts = ann.map_batches(_doc_text, batch_format="pyarrow")
        return edit_dup_dropped_ids(texts, k=config.dedup_edit_k)
    raise ValueError(
        f"unknown dedup method {config.dedup!r} "
        "(expected '', 'exact', 'minhash', 'edit')"
    )


def _curation_kept_ids(texts: rd.Dataset, config: KGConfig) -> rd.Dataset:
    """The configured curation sampler's keep-list over (doc_id, text).

    ``weighted``: Efraimidis–Spirakis length-weighted sample of
    ``curation_k`` docs (probability ∝ token count — long docs carry
    more training signal). ``mixture``: per-length-stratum quotas
    (short <16 / medium <64 / long tokens), ``curation_k`` an int quota
    or a per-stratum dict. Both are deterministic two-phase top-k — the
    shuffle moves O(k × batches) id rows, never the text.
    """
    from ..stages.sampling import stratified_sample, weighted_sample
    from ..stages.textstats import token_count_batch

    counted = texts.map_batches(
        lambda b: token_count_batch(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    if config.curation == "weighted":
        return weighted_sample(
            counted, "n_tokens", int(config.curation_k)
        ).select_columns(["doc_id"])
    if config.curation == "mixture":
        def bucketize(batch):
            import pyarrow as _pa
            import pyarrow.compute as _pc

            n = batch["n_tokens"]
            stratum = _pc.if_else(
                _pc.less(n, 16), _pa.scalar("short"),
                _pc.if_else(_pc.less(n, 64), _pa.scalar("medium"),
                            _pa.scalar("long")),
            )
            return _pa.table({"doc_id": batch["doc_id"], "stratum": stratum})

        return stratified_sample(
            counted.map_batches(bucketize, batch_format="pyarrow"),
            "stratum", config.curation_k,
        ).select_columns(["doc_id"])
    raise ValueError(
        f"unknown curation method {config.curation!r} "
        "(expected '', 'weighted', 'mixture')"
    )


def _read_keep_ids(kept_dir: str, id_type):
    """Keep-list parquet dir → one combined doc_id array. ``id_type``
    types the empty case (an empty sampler output writes no files; a
    string-typed empty default would make ``is_in`` against an int64
    doc_id column raise instead of keeping nothing)."""
    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(kept_dir, "*.parquet")))
    if not files:
        return pa.array([], type=id_type)
    cols = [pq.read_table(f, columns=["doc_id"])["doc_id"] for f in files]
    chunks = [c for col in cols for c in col.chunks]
    if not chunks:  # files exist but hold zero rows → zero chunks
        return pa.array([], type=id_type)
    return pa.concat_arrays(chunks)


def _read_drop_ids(drop_dir: str):
    """Drop-list parquet dir → one combined doc_id array (None if absent).
    An empty drop-list may have written zero files — that's 'no drops'."""
    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(drop_dir, "*.parquet")))
    if not files:
        return None
    cols = [pq.read_table(f, columns=["doc_id"])["doc_id"] for f in files]
    chunks = [c for col in cols for c in col.chunks]
    if not chunks:  # files exist but hold zero rows → zero chunks
        return None
    return pa.concat_arrays(chunks)


def _written_rows_tree(path: str) -> int:
    total = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def asdict_like(config: KGConfig) -> dict:
    """Stable, hashable repr of the pipeline config (dict fields sorted)."""
    return {
        "surfaces": sorted(config.surfaces.items()),
        "grounding": sorted(
            (k, tuple(v)) for k, v in config.grounding.items()
        ),
        "same_sentence": config.same_sentence,
        "num_salts": config.num_salts,
        "batch_size": config.batch_size,
        "dedup": config.dedup,
        "dedup_min_jaccard": config.dedup_min_jaccard,
        "dedup_edit_k": config.dedup_edit_k,
        # hash bundle CONTENTS, not the path: retrained weights at the
        # same path must invalidate completed partitions
        "bundle_digest": _bundle_digest(config.bundle_path),
    }


def _bundle_digest(bundle_path: str) -> str:
    if not bundle_path:
        return ""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    for name in ("weights.npz", "vocab.json", "config.json"):
        p = os.path.join(bundle_path, name)
        if os.path.exists(p):
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()
