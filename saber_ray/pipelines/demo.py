"""Demo KG pipeline over the driver testdata corpus
(/root/testdata/sf*/documents.parquet — bag-of-words docs over a
data-engine vocabulary).

Runs the SAME stages as the flagship biomedical pipeline (tagger →
linker → triples → salted canonicalization) with the DEMO gazetteer,
and exposes each logical output in a shape a DuckDB oracle can
reproduce exactly (single-token surfaces; doc-level co-occurrence with
the subject being the earlier occurrence; integer supports).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..gazetteer import DEMO_GAZETTEER, DEMO_GROUNDING
from ..sources.testdata import read_documents_interleaved
from ..stages.canonicalize import canonicalize_edges, canonicalize_nodes
from ..stages.triples import emit_triples, explode_mentions
from .kg import KGConfig, annotate


def demo_config(batch_size: int | None = 256) -> KGConfig:
    return KGConfig(
        surfaces=dict(DEMO_GAZETTEER),
        grounding=dict(DEMO_GROUNDING),
        same_sentence=False,  # testdata docs are single-sentence word bags
        batch_size=batch_size,
    )


def demo_annotated(sf_dir: str, config: KGConfig | None = None) -> rd.Dataset:
    docs = read_documents_interleaved(sf_dir)
    return annotate(docs, config or demo_config())


# Per-user cache root: a fixed world-writable /tmp path lets another
# local user pre-seed a stage dir that the marker check would trust,
# and a shared path means one session's cache clear deletes another's.
_STAGE_ROOT = os.path.join(
    tempfile.gettempdir(),
    f"saber_ray_stage-{getattr(os, 'getuid', lambda: 0)()}",
)


def staged_commit(path: str, marker_name: str, build_fn) -> str:
    """Crash/concurrency-safe build-once cache commit, shared by every
    staged artifact (annotate stage, IVF index, MinHash dedup index).

    ``build_fn(tmp_dir)`` must create ``<tmp_dir>/<marker_name>`` as its
    LAST artifact — the marker is the completeness witness, so the
    atomic rename of ``tmp_dir`` → ``path`` is the commit point:
    path-exists-with-marker ⇒ complete. A marker-less ``path`` (torn
    pre-marker layout) is moved ASIDE atomically, never rmtree'd in
    place, so a concurrent builder that commits between our marker check
    and the cleanup cannot have its fresh artifact deleted. If the
    rename race is lost, the winner's artifact is used iff its marker
    exists; otherwise the original error propagates.
    """
    import shutil

    marker = os.path.join(path, marker_name)
    if os.path.exists(marker):
        return path
    tmp = f"{path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    build_fn(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        if not os.path.exists(marker):
            stale = f"{path}.stale.{os.getpid()}"
            try:
                os.rename(path, stale)  # atomic move-aside
            except OSError:
                pass
            shutil.rmtree(stale, ignore_errors=True)
            try:
                os.rename(tmp, path)
            except OSError:
                pass
        # concurrent builder may have won either rename: theirs is
        # complete iff the marker now exists
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    return path


def _demo_stage_tag() -> str:
    """Cache-key tag derived from the package version + the demo
    pipeline's effective config (surfaces, grounding, salts, batch
    size) — any change to demo semantics re-stages automatically
    instead of silently serving a stale cache behind a hand-bumped
    literal."""
    from .. import __version__
    from ..state.manifest import config_hash
    from .run import asdict_like

    return config_hash(repr(asdict_like(demo_config())), __version__)


def demo_annotated_staged(sf_dir: str) -> rd.Dataset:
    """Annotate the corpus ONCE per ``sf_dir`` and stage the result as
    parquet; callers read the staged table instead of re-running the
    tagger/linker actor pool. The whole ``kg_*`` query family derives
    from this one annotate pass, so without staging a 12-query sweep
    re-executes the most expensive stage 12 times (Ray Data has no
    common-subexpression reuse across separately-built Datasets).

    This is the same staged-barrier layout ``run_kg_job`` uses at ingest
    scale (BASELINE.md measured staged parquet beating re-derived
    lineage); here it also lets a time-budgeted correctness driver
    finish the full query contract. Cache key = (realpath, mtime, size)
    of ``documents.parquet`` + a pipeline version tag, so a regenerated
    corpus or changed demo semantics re-stages; the ``_SUCCESS`` marker
    makes a torn write invisible.
    """
    import hashlib

    real = os.path.realpath(sf_dir)
    doc = os.path.join(real, "documents.parquet")
    st = os.stat(doc)
    key = hashlib.md5(
        f"{real}|{st.st_mtime_ns}|{st.st_size}|{_demo_stage_tag()}".encode()
    ).hexdigest()[:16]

    def build(tmp: str) -> None:
        demo_annotated(sf_dir).write_parquet(tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass

    path = staged_commit(os.path.join(_STAGE_ROOT, key), "_SUCCESS", build)
    # exclude the marker: read the parquet files only
    return rd.read_parquet(path, file_extensions=["parquet"])


def demo_mentions(sf_dir: str) -> rd.Dataset:
    """(doc_id:int64, mention, label) — one row per mention occurrence."""
    ann = demo_annotated_staged(sf_dir)
    ments = ann.map_batches(explode_mentions, batch_format="pyarrow")

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "mention": batch["text"],
                "label": batch["label"],
            }
        )

    return ments.map_batches(shape, batch_format="pyarrow")


def demo_mention_counts(sf_dir: str) -> rd.Dataset:
    """(label, mention, n) — global mention frequency."""
    counts = demo_mentions(sf_dir).groupby(["label", "mention"]).count()
    return counts.rename_columns({"count()": "n"})


def demo_triples(sf_dir: str) -> rd.Dataset:
    """(doc_id:int64, subj, pred, obj, n) — per-doc co-occurrence triples."""
    ann = demo_annotated_staged(sf_dir)
    trip = ann.map_batches(
        lambda b: emit_triples(b, same_sentence=False), batch_format="pyarrow"
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "subj": batch["subj"],
                "pred": batch["pred"],
                "obj": batch["obj"],
                "n": pc.cast(batch["score"], pa.int64()),
            }
        )

    return trip.map_batches(shape, batch_format="pyarrow")


def demo_graph(sf_dir: str) -> dict[str, rd.Dataset]:
    """Full demo graph: salted canonicalization to nodes + edges."""
    config = demo_config()
    ann = demo_annotated_staged(sf_dir)
    mentions = ann.map_batches(explode_mentions, batch_format="pyarrow")
    triples = ann.map_batches(
        lambda b: emit_triples(b, same_sentence=False), batch_format="pyarrow"
    )
    return {
        "nodes": canonicalize_nodes(mentions, num_salts=config.num_salts),
        "edges": canonicalize_edges(triples, num_salts=config.num_salts),
    }


def demo_nodes(sf_dir: str) -> rd.Dataset:
    nodes = demo_graph(sf_dir)["nodes"]
    return nodes.select_columns(["node_id", "label", "canonical_name", "support"])


def demo_edges(sf_dir: str) -> rd.Dataset:
    edges = demo_graph(sf_dir)["edges"]
    return edges.select_columns(["src", "pred", "dst", "support"])


def demo_chunk_spans(sf_dir: str) -> rd.Dataset:
    """(doc_id:int64, label, tok_start, tok_end, surface) — the BIO/BIOES
    chunker (M7/M8) driven end-to-end over the testdata corpus.

    Per document: tokenize (the oracle's token definition — lowercased
    alnum runs), label each token through the demo gazetteer, encode the
    label runs as BIOES (``bioes_tags``), then chunk with the REAL
    reference-quirk kernel (``chunk_entities``,
    saber/preprocessor.py:195-227): ``E-`` run ends fall OUTSIDE the
    chunk and ``S-`` singletons produce no chunk — so the oracle is
    "label runs of length >= 2, excluding the final token".
    """
    import re

    from ..functions.chunking import bioes_tags, chunk_entities
    from ..sources.testdata import read_documents_flat

    token_re = re.compile(r"[0-9a-z]+")
    gaz = dict(DEMO_GAZETTEER)

    def chunks(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "label": [], "tok_start": [], "tok_end": [],
                "surface": []}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = token_re.findall(text.lower()) if text else []
            tags = bioes_tags([gaz.get(t) for t in toks])
            for label, s, e in chunk_entities(tags):
                rows["doc_id"].append(doc_id)
                rows["label"].append(label)
                rows["tok_start"].append(s)
                rows["tok_end"].append(e)
                rows["surface"].append(" ".join(toks[s:e]))
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "label": pa.array(rows["label"], type=pa.string()),
                "tok_start": pa.array(rows["tok_start"], type=pa.int64()),
                "tok_end": pa.array(rows["tok_end"], type=pa.int64()),
                "surface": pa.array(rows["surface"], type=pa.string()),
            }
        )

    return read_documents_flat(sf_dir).map_batches(chunks, batch_format="pyarrow")
