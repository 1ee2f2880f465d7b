"""End-to-end KG-construction pipeline assembly (the engine's flagship).

documents → DictionaryTagger (actor pool) → EntityLinker (actor pool,
broadcast dictionary) → {mentions, triples} (stateless explodes) →
{nodes, edges} (salted canonicalization shuffles).

Everything stays a lazy ``ray.data.Dataset`` — the streaming executor
pipelines the stages with backpressure; nothing is materialized except
the (small) final graph tables when a caller asks for them.

The reference equivalent is ``Saber.annotate`` looped per document
(saber/saber.py:52-128) plus the post-NER steps its roadmap names but
never implements (docs/index.md:5-12).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import ray
import ray.data as rd

from ..gazetteer import SABER_GROUNDING, SABER_SURFACES, build_linker_dict
from ..stages.annotate import Annotator
from ..stages.canonicalize import canonicalize_edges, canonicalize_nodes
from ..stages.triples import emit_triples, explode_mentions


@dataclass
class KGConfig:
    surfaces: dict[str, str] = field(default_factory=lambda: dict(SABER_SURFACES))
    grounding: dict[tuple[str, str], list[tuple[str, str]]] = field(
        default_factory=lambda: dict(SABER_GROUNDING)
    )
    same_sentence: bool = True     # triple co-occurrence scope
    num_salts: int = 16            # canonicalization salt fan-out
    bundle_path: str = ""          # set → weights-backed NeuralTagger path
    tagger_concurrency: Any = None  # None → autoscale pool sized to cluster CPUs
    linker_concurrency: Any = None
    batch_size: int | None = 256   # mirrors the reference's PRED_BATCH_SIZE
    dedup: str = ""                # run_kg_job dedup stage: "", "exact", "minhash", "edit"
    dedup_min_jaccard: float = 0.8  # near-dup verification threshold (minhash)
    dedup_edit_k: int = 2          # Levenshtein radius for dedup="edit"
    # run_kg_job curation stage: "", "weighted" (length-weighted
    # Efraimidis-Spirakis sample of curation_k docs) or "mixture"
    # (per-length-stratum quotas; curation_k an int or a per-stratum
    # dict like {"short": 30, "long": 10})
    curation: str = ""
    curation_k: Any = 64
    pack_budget: int = 2048        # token budget per packed sequence
    # run_kg_job graph stage: number of key-hash groups the
    # canonicalization reduce is split into — each group is its own
    # checkpointed unit (crash mid-graph resumes at group granularity).
    # NOT part of the job identity hash (the graph stage carries its own
    # hash), so retuning it never re-runs the annotate partitions.
    graph_groups: int = 4


def _pool_width(n_pools: int = 1) -> int:
    """3/4 of cluster CPUs split across ``n_pools`` chained pools — the
    annotate stage must leave slots for the downstream stateless task
    operators (triple emission, writes); measured on the 8M-doc job 3/4
    beats both a full-width pool and a half-width pool."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1 if cpus < 16 else 2, (cpus * 3) // 4 // n_pools)


def _default_pool(n_pools: int = 1) -> tuple[int, int]:
    """AUTOSCALING actor-pool bounds — the deadlock-safe default for
    ad-hoc queries whose DAG shape is unknown.

    A Dataset DAG with two branches over the same annotate lineage (a
    self-join re-executes the upstream per branch — Ray Data has no
    common-subexpression reuse) runs two pools CONCURRENTLY, plus the
    join's own hash-shuffle aggregator actors. Pools sized min == 3/4
    cluster would then demand 1.5x the cluster and gridlock (idle actors
    HOLD their CPUs; measured: the two-hop query hangs indefinitely with
    pinned pools at 8 cpus). Autoscaling pools start small and only grow
    into free CPUs, so branches degrade instead of deadlocking.

    The cost of autoscaling is ramp speed: Ray's actor autoscaler adds
    ONE actor per scaling event and holds while any actor is pending
    (~1 actor/s), so a long single-branch ingest job should use
    ``dedicated_pool()`` instead — pinned width, launched in one batch.
    """
    width = _pool_width(n_pools)
    return (1 if width < 12 else max(2, width // 4), width)


def dedicated_pool(n_pools: int = 1) -> tuple[int, int]:
    """PINNED actor-pool bounds (min == max) for a single-branch
    pipeline that owns the cluster (the ingest jobs: ``run_kg_job``,
    the scaling benchmark).

    Ray's autoscaling pool upscales roughly one actor per second
    (autoscaler: delta=1 per event, no-op while an actor is pending),
    so a ``(2, 24)`` pool spends the first ~20 s of every job mostly
    idle — measured on this host a trivial 4-s-ideal pool job took
    17.6 s autoscaled vs 7.0 s pinned, and the 6M-doc scaling run went
    from 0.44 to 0.94 efficiency largely from this. Actor setup is cheap
    (``Annotator.__init__`` ~70 ms), and min-size actors are launched in
    ONE batch.

    Only for single-branch DAGs: a pinned 3/4-cluster pool in each
    branch of a self-join demands 1.5x the cluster and deadlocks (see
    ``_default_pool``).
    """
    width = _pool_width(n_pools)
    return (width, width)


def annotate(documents: rd.Dataset, config: KGConfig | None = None) -> rd.Dataset:
    """documents → annotated documents (adds ``ents`` + ``span_hash``).

    One fused actor-pool stage (``Annotator`` = tagger + linker in a
    single pass over the batch, columnar output) — gazetteer compilation
    and the broadcast grounding dictionary load once per actor, not per
    batch. ``DictionaryTagger`` / ``EntityLinker`` remain available as
    separate stages; unit tests assert the fusion is semantics-preserving.
    """
    config = config or KGConfig()
    linker_ref = ray.put(build_linker_dict(config.grounding))
    if config.bundle_path:
        # weights-backed path: bundle-loaded tagger actor pool followed by
        # the broadcast-dictionary linker (the reference's two-model shape)
        from ..stages.linker import EntityLinker
        from ..stages.neural import NeuralTagger

        tagged = documents.map_batches(
            NeuralTagger,
            fn_constructor_kwargs={"bundle_path": config.bundle_path},
            batch_format="pyarrow",
            batch_size=config.batch_size,
            concurrency=config.tagger_concurrency or _default_pool(n_pools=2),
        )
        return tagged.map_batches(
            EntityLinker,
            fn_constructor_kwargs={"linker_ref": linker_ref},
            batch_format="pyarrow",
            batch_size=config.batch_size,
            concurrency=config.linker_concurrency or _default_pool(n_pools=2),
        )
    return documents.map_batches(
        Annotator,
        fn_constructor_kwargs={
            "surfaces": config.surfaces,
            "linker_ref": linker_ref,
        },
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=config.tagger_concurrency or _default_pool(),
    )


def build_graph(
    documents: rd.Dataset,
    config: KGConfig | None = None,
    materialize_annotated: bool = False,
) -> dict[str, rd.Dataset]:
    """Full pipeline; returns datasets for every logical table.

    The outputs are LAZY and share the annotate stage: consuming k of
    them re-executes the (dominant) tagger+linker pass k times. When a
    caller will consume more than one output, either pass
    ``materialize_annotated=True`` (pins the annotated table in the
    object store — fine when it fits) or stage the annotated table to
    storage and derive from the staged copy, which is what
    ``pipelines/run.py`` does for the checkpointed job.
    """
    config = config or KGConfig()
    annotated = annotate(documents, config)
    if materialize_annotated:
        annotated = annotated.materialize()
    mentions = annotated.map_batches(explode_mentions, batch_format="pyarrow")
    triples = annotated.map_batches(
        lambda b: emit_triples(b, same_sentence=config.same_sentence),
        batch_format="pyarrow",
    )
    nodes = canonicalize_nodes(mentions, num_salts=config.num_salts)
    edges = canonicalize_edges(triples, num_salts=config.num_salts)
    return {
        "annotated": annotated,
        "mentions": mentions,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }
