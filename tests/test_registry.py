"""Stage-registry tests (§2.9 user-extension surface)."""

import pyarrow as pa
import pytest
import ray.data as rd

from saber_ray.registry import (
    StageSpec,
    apply_stage,
    build_pipeline,
    get,
    register,
    registered_stages,
)
from saber_ray.schemas import DOCUMENTS
from saber_ray.sources.synthetic import generate_documents


def test_builtins_registered():
    names = registered_stages()
    for expected in ("annotate", "triples", "mentions", "sterilize",
                     "neural_tagger", "validate", "media_decode_fake"):
        assert expected in names


def test_unknown_stage_raises():
    with pytest.raises(KeyError):
        get("nope")


def test_config_driven_pipeline():
    table, _, _ = generate_documents(40, seed=2)
    ds = rd.from_arrow(table)
    out = build_pipeline(ds, [("annotate", {"batch_size": 16}), "mentions"])
    rows = out.take_all()
    assert rows and all("entity_id" in r for r in rows)


def test_custom_stage_registration():
    def add_len(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column("n", pc.list_value_length(batch["spans"]))

    register(StageSpec("span_count", add_len, description="test stage"))
    table, _, _ = generate_documents(10, seed=2)
    out = apply_stage(rd.from_arrow(table), "span_count").take_all()
    assert all(r["n"] == len(r["spans"]) for r in out)


def test_stage_overrides_resources():
    table, _, _ = generate_documents(10, seed=2)
    ds = apply_stage(rd.from_arrow(table), "annotate",
                     concurrency=2, num_cpus=0.5, batch_size=4)
    assert ds.count() == 10


def test_num_gpus_and_backend_override_reach_map_batches():
    """The registry's num_gpus / fn_constructor_kwargs overrides must
    actually land in map_batches kwargs — the knob that schedules the
    neural tagger's actors on GPU workers (where backend='auto' picks
    the torch/CUDA forward)."""
    from saber_ray.registry import apply_stage

    captured = {}

    class FakeDS:
        def map_batches(self, fn, **kwargs):
            captured["fn"] = fn
            captured.update(kwargs)
            return self

    apply_stage(
        FakeDS(), "neural_tagger",
        num_gpus=0.25, concurrency=3,
        fn_constructor_kwargs={"bundle_path": "/b", "backend": "auto"},
    )
    from saber_ray.stages.neural import NeuralTagger

    assert captured["fn"] is NeuralTagger
    assert captured["num_gpus"] == 0.25
    assert captured["concurrency"] == 3
    assert captured["fn_constructor_kwargs"]["backend"] == "auto"
    assert captured["batch_size"] == 256
