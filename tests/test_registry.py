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
