"""Checkpoint-manifest + resume tests (north rule: resumable from
checkpoint with per-partition lineage + metrics)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from saber_ray.pipelines.kg import KGConfig
from saber_ray.pipelines.run import asdict_like, run_kg_job
from saber_ray.sources.synthetic import generate_documents
from saber_ray.state.manifest import Manifest, config_hash


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    table, _, _ = generate_documents(240, seed=9)
    for i in range(8):
        pq.write_table(table.slice(i * 30, 30), str(d / f"frag-{i:02d}.parquet"))
    return str(d)


def test_interrupted_run_resumes(corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    cfg = KGConfig(batch_size=64, num_salts=4)

    # simulate an interrupted run: only 2 of 4 partitions complete
    s1 = run_kg_job(f"{corpus_dir}/*.parquet", out, cfg, partitions=4, max_partitions=2)
    assert len(s1["ran"]) == 2 and not s1["complete"]
    assert not os.path.exists(os.path.join(out, "edges"))

    # resume: remaining partitions run, completed ones are skipped
    s2 = run_kg_job(f"{corpus_dir}/*.parquet", out, cfg, partitions=4)
    assert sorted(s2["skipped"]) == sorted(s1["ran"])
    assert len(s2["ran"]) == 2 and s2["complete"] and s2["graph"] == "ran"

    # idempotent third run: everything skipped
    s3 = run_kg_job(f"{corpus_dir}/*.parquet", out, cfg, partitions=4)
    assert len(s3["ran"]) == 0 and len(s3["skipped"]) == 4
    assert s3["graph"] == "skipped"

    # outputs are complete and consistent
    mentions = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/mentions/**/*.parquet", recursive=True)
    )
    node_support = sum(
        sum(pq.read_table(f)["support"].to_pylist())
        for f in glob.glob(f"{out}/nodes/**/*.parquet", recursive=True)
    )
    assert node_support == mentions
    assert mentions > 0

    # manifest records carry lineage + metrics
    cfg_hash = config_hash(repr(asdict_like(cfg)) + "|partitions=4", __import__("saber_ray").__version__)
    man = Manifest(out, cfg_hash)
    recs = man.records("annotate")
    assert len(recs) == 4
    assert all(r.status == "done" and r.wall_ms >= 0 for r in recs)
    # hash-based grouping: fragment counts vary per partition, but the
    # union must cover the corpus exactly once
    assert sum(len(r.input_fragments) for r in recs) == 8
    assert all(r.span_hash for r in recs)
    frag_union = sorted(f for r in recs for f in r.input_fragments)
    assert frag_union == sorted(os.path.basename(f) for f in glob.glob(f"{corpus_dir}/*.parquet"))

    # the public reader strips the resumable layout's part=/group=
    # bookkeeping columns — consumers see the logical schema only
    from saber_ray.pipelines.run import read_job_output

    nodes = read_job_output(out, "nodes")
    assert "group" not in nodes.schema().names
    assert sum(r["support"] for r in nodes.take_all()) == mentions
    ments = read_job_output(out, "mentions")
    assert "part" not in ments.schema().names
    assert ments.count() == mentions


def test_config_change_invalidates(corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out2"))
    cfg = KGConfig(batch_size=64, num_salts=4)
    run_kg_job(f"{corpus_dir}/*.parquet", out, cfg, partitions=2)

    changed = KGConfig(batch_size=64, num_salts=8)
    h_old = config_hash(repr(asdict_like(cfg)) + "|partitions=2", __import__("saber_ray").__version__)
    h_new = config_hash(repr(asdict_like(changed)) + "|partitions=2", __import__("saber_ray").__version__)
    assert h_old != h_new
    # records written under the old hash do not satisfy the new config
    man_new = Manifest(out, h_new)
    assert not man_new.is_done("annotate", 0)
    man_old = Manifest(out, h_old)
    assert man_old.is_done("annotate", 0)


def test_manifest_atomic_overwrite(tmp_path):
    from saber_ray.state.manifest import PartitionRecord

    man = Manifest(str(tmp_path), "abc")
    rec = PartitionRecord(
        stage="s", partition_id=3, input_fragments=["a"], rows_in=1, rows_out=2,
        span_hash="h", wall_ms=5, status="done", config_hash="abc",
    )
    man.write(rec)
    rec2 = PartitionRecord(
        stage="s", partition_id=3, input_fragments=["a", "b"], rows_in=2, rows_out=4,
        span_hash="h2", wall_ms=9, status="done", config_hash="abc",
    )
    man.write(rec2)  # last writer wins, no stray temp files
    got = man.read("s", 3)
    assert got.rows_in == 2 and got.input_fragments == ["a", "b"]
    stray = [f for f in os.listdir(os.path.join(str(tmp_path), "_manifest", "s"))
             if f.endswith(".tmp")]
    assert stray == []


def test_invalid_docs_quarantined(tmp_path_factory):
    import pyarrow as pa

    from saber_ray.schemas import DOCUMENTS

    d = tmp_path_factory.mktemp("qcorpus")
    table, _, _ = generate_documents(30, seed=12)
    bad = pa.Table.from_pylist(
        [{"doc_id": "", "spans": []},
         {"doc_id": "nulltext",
          "spans": [{"kind": "text", "text": None, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS,
    )
    pq.write_table(pa.concat_tables([table, bad]), str(d / "frag-0.parquet"))

    out = str(tmp_path_factory.mktemp("qout"))
    cfg = KGConfig(batch_size=16, num_salts=2)
    s = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=1)
    assert s["complete"]
    qrows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/quarantine/**/*.parquet", recursive=True)
    )
    assert qrows == 2
    ann_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/annotated/**/*.parquet", recursive=True)
    )
    assert ann_rows == 32  # invalid docs stay, flagged, with zero mentions
    ann = pa.concat_tables([
        pq.read_table(f)
        for f in glob.glob(f"{out}/annotated/**/*.parquet", recursive=True)
    ])
    bad = ann.filter(pa.compute.equal(ann["valid"], False))
    assert bad.num_rows == 2
    assert all(len(e) == 0 for e in bad["ents"].to_pylist())
    cfg_hash = config_hash(repr(asdict_like(cfg)) + "|partitions=1",
                           __import__("saber_ray").__version__)
    rec = Manifest(out, cfg_hash).read("annotate", 0)
    assert rec.extra["quarantined_rows"] == 2


def test_incremental_append_reruns_only_affected(tmp_path_factory):
    """Appending new corpus fragments re-processes only the partitions
    that received them (hash-stable grouping + input verification)."""
    d = tmp_path_factory.mktemp("inc_corpus")
    table, _, _ = generate_documents(300, seed=23)
    for i in range(6):
        pq.write_table(table.slice(i * 40, 40), str(d / f"frag-{i:02d}.parquet"))

    out = str(tmp_path_factory.mktemp("inc_out"))
    cfg = KGConfig(batch_size=32, num_salts=2)
    s1 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=4)
    assert s1["complete"]

    # append two new fragments
    pq.write_table(table.slice(240, 30), str(d / f"frag-90.parquet"))
    pq.write_table(table.slice(270, 30), str(d / f"frag-91.parquet"))
    s2 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=4)
    assert s2["complete"]
    # only partitions whose input changed re-ran
    assert 0 < len(s2["ran"]) <= 2
    assert len(s2["ran"]) + len(s2["skipped"]) == 4
    # the graph stage re-aggregated over ALL staged partitions
    assert s2["graph"] == "ran"
    mentions = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/mentions/**/*.parquet", recursive=True)
    )
    node_support = sum(
        sum(pq.read_table(f)["support"].to_pylist())
        for f in glob.glob(f"{out}/nodes/**/*.parquet", recursive=True)
    )
    assert node_support == mentions

    # tampering with an existing fragment invalidates its partition
    frag = str(d / "frag-00.parquet")
    t2, _, _ = generate_documents(40, seed=99)
    pq.write_table(t2, frag)
    s3 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=4)
    assert len(s3["ran"]) >= 1  # the tampered partition re-ran


def test_crash_between_rerun_and_graph_invalidates_graph(tmp_path_factory):
    """A partition re-run persistently invalidates the graph record
    BEFORE any work, so a crash before the graph stage cannot leave a
    stale trusted graph on the next resume."""
    import json

    d = tmp_path_factory.mktemp("crash_corpus")
    table, _, _ = generate_documents(80, seed=31)
    for i in range(2):
        pq.write_table(table.slice(i * 40, 40), str(d / f"frag-{i}.parquet"))
    out = str(tmp_path_factory.mktemp("crash_out"))
    cfg = KGConfig(batch_size=16, num_salts=2)
    run_kg_job(f"{d}/*.parquet", out, cfg, partitions=2)

    # change one fragment, then simulate a crash: run ONLY the affected
    # partition (max_partitions exhausts before the graph stage is reached)
    t2, _, _ = generate_documents(40, seed=77)
    pq.write_table(t2, sorted(glob.glob(f"{d}/*.parquet"))[0])
    s2 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=2, max_partitions=0)
    # the stale graph record must already be gone even though nothing ran
    cfg_hash = config_hash(repr(asdict_like(cfg)) + "|partitions=2",
                           __import__("saber_ray").__version__)
    # (max_partitions=0 means the partition was detected but not run, so
    # the graph record is only invalidated once the partition actually
    # starts; run it for real now, killing before graph via max_partitions)
    s3 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=2, max_partitions=1)
    assert len(s3["ran"]) == 1
    # graph records carry their OWN hash (job hash + graph grouping)
    graph_hash = config_hash(cfg_hash + f"|graph_groups={cfg.graph_groups}",
                             __import__("saber_ray").__version__)
    man = Manifest(out, graph_hash)
    if s3["complete"]:
        # single affected partition: graph re-ran in the same call
        assert s3["graph"] == "ran"
    else:
        # invalidated, not stale: no partials record, no group records
        assert man.read("graph_partials", 0) is None
        assert all(man.read("graph", g) is None
                   for g in range(cfg.graph_groups))
    # final resume completes and re-aggregates every group
    s4 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=2)
    assert s4["complete"] and man.is_done("graph_partials", 0)
    assert all(man.is_done("graph", g) for g in range(cfg.graph_groups))


def test_keep_drop_readers_handle_zero_row_files(tmp_path):
    """A kept/drop list parquet written with ZERO rows yields a
    zero-chunk column; the readers must return an empty typed array /
    None instead of crashing in pa.concat_arrays([])."""
    import pyarrow as pa

    from saber_ray.pipelines.run import _read_drop_ids, _read_keep_ids

    # a ParquetWriter closed without writing emits a 0-row-group file
    # (this pyarrow normalizes it to one empty chunk on read; older /
    # other readers yield zero chunks, which the guard covers)
    schema = pa.schema([("doc_id", pa.string())])
    pq.ParquetWriter(str(tmp_path / "part-0.parquet"), schema).close()
    kept = _read_keep_ids(str(tmp_path), pa.string())
    assert len(kept) == 0 and kept.type == pa.string()
    drop = _read_drop_ids(str(tmp_path))
    assert drop is None or len(drop) == 0


def test_graph_stage_resumes_at_group_granularity(tmp_path_factory):
    """A crash mid-graph (some key-hash groups reduced, some not) must
    resume by re-reducing ONLY the missing groups: completed groups'
    outputs are untouched on disk and their partials are not re-read."""
    d = tmp_path_factory.mktemp("gg_corpus")
    table, _, _ = generate_documents(120, seed=53)
    pq.write_table(table, str(d / "frag-0.parquet"))
    out = str(tmp_path_factory.mktemp("gg_out"))
    cfg = KGConfig(batch_size=32, num_salts=2, graph_groups=4)

    run_kg_job(f"{d}/*.parquet", out, cfg, partitions=1)
    edge_rows = sorted(
        tuple(r)
        for f in glob.glob(f"{out}/edges/**/*.parquet", recursive=True)
        for r in zip(*[pq.read_table(f)[c].to_pylist()
                       for c in ("src", "pred", "dst", "support")])
    )
    assert edge_rows

    # simulate a crash after groups 0-1 reduced: drop groups 2-3's
    # records + outputs (exactly what a mid-loop kill leaves behind)
    cfg_hash = config_hash(repr(asdict_like(cfg)) + "|partitions=1",
                           __import__("saber_ray").__version__)
    graph_hash = config_hash(cfg_hash + "|graph_groups=4",
                             __import__("saber_ray").__version__)
    man = Manifest(out, graph_hash)
    import shutil
    for g in (2, 3):
        man.invalidate("graph", g)
        shutil.rmtree(f"{out}/nodes/group={g}", ignore_errors=True)
        shutil.rmtree(f"{out}/edges/group={g}", ignore_errors=True)

    survivors = glob.glob(f"{out}/nodes/group=0/*.parquet") + \
        glob.glob(f"{out}/edges/group=0/*.parquet")
    mtimes = {f: os.path.getmtime(f) for f in survivors}

    s2 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=1)
    assert s2["graph"] == "ran"            # groups 2-3 re-reduced
    assert man.is_done("graph_partials", 0)  # partials pass NOT redone
    assert all(man.is_done("graph", g) for g in range(4))
    # completed groups untouched (same files, same mtimes)
    assert {f: os.path.getmtime(f) for f in survivors} == mtimes
    # and the union of groups is byte-identical to the uninterrupted run
    edge_rows2 = sorted(
        tuple(r)
        for f in glob.glob(f"{out}/edges/**/*.parquet", recursive=True)
        for r in zip(*[pq.read_table(f)[c].to_pylist()
                       for c in ("src", "pred", "dst", "support")])
    )
    assert edge_rows2 == edge_rows


def test_partition_count_change_no_double_count(tmp_path_factory):
    """Re-running the same out_dir with a different partition count must
    not leak old part dirs into the re-aggregated graph."""
    d = tmp_path_factory.mktemp("pc_corpus")
    table, _, _ = generate_documents(120, seed=41)
    for i in range(6):
        pq.write_table(table.slice(i * 20, 20), str(d / f"frag-{i}.parquet"))
    out = str(tmp_path_factory.mktemp("pc_out"))
    cfg = KGConfig(batch_size=32, num_salts=2)

    run_kg_job(f"{d}/*.parquet", out, cfg, partitions=6)
    mentions_before = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/mentions/**/*.parquet", recursive=True)
    )

    s2 = run_kg_job(f"{d}/*.parquet", out, cfg, partitions=2)
    assert s2["complete"]
    mentions_after = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/mentions/**/*.parquet", recursive=True)
    )
    assert mentions_after == mentions_before  # same corpus, no duplicates
    node_support = sum(
        sum(pq.read_table(f)["support"].to_pylist())
        for f in glob.glob(f"{out}/nodes/**/*.parquet", recursive=True)
    )
    assert node_support == mentions_after


def test_curation_stage_checkpointed(corpus_dir, tmp_path_factory):
    """Curation (mixture sample + packing) between annotate and graph:
    runs once, skips on resume, re-runs alone on a curation-param
    change (annotate partitions stay valid), and re-runs when an
    annotate partition reruns."""
    out = str(tmp_path_factory.mktemp("out"))
    cfg = KGConfig(batch_size=64, num_salts=4, curation="mixture",
                   curation_k={"short": 20, "medium": 30, "long": 10},
                   pack_budget=64)

    s1 = run_kg_job(f"{corpus_dir}/*.parquet", out, cfg, partitions=4)
    assert s1["complete"] and s1["curation"] == "ran" and s1["graph"] == "ran"
    kept = pq.read_table(glob.glob(f"{out}/curation/kept/*.parquet")[0].rsplit("/", 1)[0])
    packed_files = glob.glob(f"{out}/curation/packed/*.parquet")
    packed = sum(pq.ParquetFile(f).metadata.num_rows for f in packed_files)
    # quotas respected: every kept doc is packed, each pack within budget
    assert 0 < kept.num_rows <= 60
    assert packed == kept.num_rows
    import pyarrow.parquet as _pq

    for f in packed_files:
        t = _pq.read_table(f)
        assert max(t["n_tokens"].to_pylist(), default=0) <= 64

    # resume: nothing re-runs
    s2 = run_kg_job(f"{corpus_dir}/*.parquet", out, cfg, partitions=4)
    assert s2["curation"] == "skipped" and s2["graph"] == "skipped"
    assert len(s2["ran"]) == 0

    # curation-only param change: annotate partitions stay valid,
    # curation re-runs, graph (independent of curation) stays skipped
    cfg2 = KGConfig(batch_size=64, num_salts=4, curation="weighted",
                    curation_k=25, pack_budget=64)
    s3 = run_kg_job(f"{corpus_dir}/*.parquet", out, cfg2, partitions=4)
    assert len(s3["ran"]) == 0 and len(s3["skipped"]) == 4
    assert s3["curation"] == "ran" and s3["graph"] == "skipped"
    kept2 = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(f"{out}/curation/kept/*.parquet"))
    assert kept2 == 25


def test_curation_invalidated_by_annotate_rerun(tmp_path_factory):
    import pyarrow.parquet as _pq

    corpus = str(tmp_path_factory.mktemp("corpus2"))
    table, _, _ = generate_documents(120, seed=13)
    for i in range(4):
        _pq.write_table(table.slice(i * 30, 30),
                        os.path.join(corpus, f"frag-{i:02d}.parquet"))
    out = str(tmp_path_factory.mktemp("out2"))
    cfg = KGConfig(batch_size=64, num_salts=4, curation="weighted",
                   curation_k=15, pack_budget=64)
    s1 = run_kg_job(f"{corpus}/*.parquet", out, cfg, partitions=2)
    assert s1["curation"] == "ran"

    # change one input fragment: its partition re-runs and the curation
    # aggregate is invalidated with it
    table2, _, _ = generate_documents(30, seed=99)
    _pq.write_table(table2, os.path.join(corpus, "frag-00.parquet"))
    s2 = run_kg_job(f"{corpus}/*.parquet", out, cfg, partitions=2)
    assert len(s2["ran"]) >= 1
    assert s2["curation"] == "ran" and s2["graph"] == "ran"


def test_curation_samples_after_dedup(tmp_path_factory):
    """Duplicated documents must not reach the curated keep-list or the
    packed output (curation draws from the dedup SURVIVORS)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    corpus = str(tmp_path_factory.mktemp("corpus3"))
    table, _, _ = generate_documents(50, seed=21)
    dup = table.slice(0, 10).set_column(
        0, "doc_id", pa.array([f"dup{i:03d}" for i in range(10)]))
    _pq.write_table(table, os.path.join(corpus, "a.parquet"))
    _pq.write_table(dup, os.path.join(corpus, "b.parquet"))
    out = str(tmp_path_factory.mktemp("out3"))
    cfg = KGConfig(batch_size=32, num_salts=2, dedup="exact",
                   curation="weighted", curation_k=100, pack_budget=64)
    s = run_kg_job(f"{corpus}/*.parquet", out, cfg, partitions=2)
    assert s["complete"] and s["curation"] == "ran"
    kept, dropped, packed = set(), set(), set()
    for f in glob.glob(f"{out}/curation/kept/*.parquet"):
        kept |= set(_pq.read_table(f)["doc_id"].to_pylist())
    for f in glob.glob(f"{out}/dedup/dropped/*.parquet"):
        dropped |= set(_pq.read_table(f)["doc_id"].to_pylist())
    for f in glob.glob(f"{out}/curation/packed/*.parquet"):
        packed |= set(_pq.read_table(f)["doc_id"].to_pylist())
    # every planted duplicate drops ('doc-*' < 'dup*', so originals are
    # the min-id survivors); the generator may add natural dups too
    assert {f"dup{i:03d}" for i in range(10)} <= dropped
    assert not (kept & dropped)        # sampled from survivors only
    assert not (packed & dropped)
    assert packed == kept              # every kept doc packed
