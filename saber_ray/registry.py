"""Stage registry — the engine's user-extension surface (SURVEY.md §2.9).

The reference dispatches models through a ``MODEL_NAMES`` allow-list
(saber/constants.py:70, saber/saber.py:344-363); the engine generalizes
that to a registry mapping stage name → (callable | actor class,
default resources), so pipelines can be assembled from configuration::

    ds = apply_stage(ds, "annotate")
    ds = apply_stage(ds, "triples")

or, equivalently, ``build_pipeline(ds, ["annotate", "triples"])``.
Per-stage resource defaults (batch size, concurrency, num_cpus,
num_gpus) live with the registration and can be overridden per call —
the knob surface for sizing stages so none starves the others.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data as rd


@dataclass
class StageSpec:
    name: str
    fn: Any                         # callable batch fn or actor class
    is_actor: bool = False
    batch_size: int | None = None
    concurrency: Any = None         # actors only
    num_cpus: float | None = None
    num_gpus: float | None = None
    fn_constructor_kwargs: dict = field(default_factory=dict)
    description: str = ""


_REGISTRY: dict[str, StageSpec] = {}


def register(spec: StageSpec) -> StageSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get(name: str) -> StageSpec:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def registered_stages() -> list[str]:
    return sorted(_REGISTRY)


def apply_stage(ds: rd.Dataset, name: str, **overrides) -> rd.Dataset:
    """Apply a registered stage to a Dataset with optional overrides
    (batch_size, concurrency, num_cpus, num_gpus, fn_constructor_kwargs)."""
    spec = get(name)
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    batch_size = overrides.get("batch_size", spec.batch_size)
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    for res in ("num_cpus", "num_gpus"):
        val = overrides.get(res, getattr(spec, res))
        if val:
            kwargs[res] = val
    if spec.is_actor:
        from .functions.partitioning import pinned_pool

        kwargs["concurrency"] = (
            overrides.get("concurrency", spec.concurrency) or pinned_pool(4)
        )
        ctor = dict(spec.fn_constructor_kwargs)
        ctor.update(overrides.get("fn_constructor_kwargs", {}))
        if ctor:
            kwargs["fn_constructor_kwargs"] = ctor
    return ds.map_batches(spec.fn, **kwargs)


def build_pipeline(ds: rd.Dataset, stages: list[str | tuple[str, dict]]) -> rd.Dataset:
    """Chain registered stages; each entry is a name or (name, overrides)."""
    for entry in stages:
        if isinstance(entry, tuple):
            name, overrides = entry
        else:
            name, overrides = entry, {}
        ds = apply_stage(ds, name, **overrides)
    return ds


def _register_builtins() -> None:
    from .stages.annotate import Annotator
    from .stages.media import FakeMediaDecoder
    from .stages.neural import NeuralTagger
    from .stages.preprocess import validate_documents
    from .stages.tagger import DictionaryTagger
    from .stages.textstats import (
        doc_stats_batch,
        fingerprint_batch,
        lang_id_batch,
        repetition_stats_batch,
        sterilize_batch,
        token_count_batch,
        token_count_bpe_batch,
    )
    from .stages.triples import emit_triples, explode_mentions

    register(StageSpec("validate", validate_documents,
                       description="M10 input validation + quarantine flags"))
    register(StageSpec("sterilize", sterilize_batch, description="M1"))
    register(StageSpec("token_count", token_count_batch, description="vectorized token counts"))
    register(StageSpec("doc_stats", doc_stats_batch, description="quality stats"))
    register(StageSpec("fingerprint", fingerprint_batch, description="md5 token fingerprint"))
    register(StageSpec("lang_id", lang_id_batch, description="language heuristic"))
    register(StageSpec("token_count_bpe", token_count_bpe_batch,
                       description="BPE-pretokenizer counts (training-cost estimate)"))
    register(StageSpec("repetition_stats", repetition_stats_batch,
                       description="dup-line / top-bigram boilerplate stats"))
    register(StageSpec("annotate", Annotator, is_actor=True, batch_size=256,
                       description="fused tagger+linker (T1+T3)"))
    register(StageSpec("dictionary_tagger", DictionaryTagger, is_actor=True,
                       batch_size=256, description="T1 gazetteer tagger"))
    register(StageSpec("neural_tagger", NeuralTagger, is_actor=True, batch_size=256,
                       description="T1 bundle-weighted tagger (set bundle_path; "
                                   "num_gpus>0 schedules actors on GPU workers, "
                                   "where backend='auto' selects the torch/CUDA "
                                   "forward — numpy elsewhere)"))
    register(StageSpec("triples", emit_triples, description="A6 co-occurrence triples"))
    register(StageSpec("mentions", explode_mentions, description="mention explode"))
    register(StageSpec("media_decode_fake", FakeMediaDecoder, is_actor=True,
                       batch_size=32, description="deterministic media decode"))


_register_builtins()
