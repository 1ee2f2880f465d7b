"""CLI curate subcommand: one-command quality->cut->dedup->mixture
composition over parquet in/out."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from saber_ray.cli import main


def test_cli_curate_end_to_end(tmp_path, capsys):
    boiler = " ".join(f"b{i}" for i in range(9))
    prose = ("the cat and the dog were in the house because it was "
             "raining and they could not go out for a walk")
    rows = []
    for i in range(12):
        rows.append({"doc_id": i, "text": f"{prose} item{i}",
                     "source": "web" if i % 3 else "books"})
    rows.append({"doc_id": 100, "text": f"{prose} {boiler} tail words",
                 "source": "web"})
    rows.append({"doc_id": 101, "text": f"{boiler} {prose} other end",
                 "source": "web"})
    rows.append({"doc_id": 102, "text": "short", "source": "web"})  # gated
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.Table.from_pylist(rows), src)

    out = tmp_path / "curated"
    main(["curate", "--input", str(src), "--out", str(out),
          "--mixture-by", "source", "--mixture-total", "10"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 15
    assert stats["quality_kept"] == 14          # doc 102 fails min_tokens
    assert 0 < stats["written"] <= 10           # mixture budget respected

    got = pq.read_table(out).to_pydict()
    assert set(got) >= {"doc_id", "clean_text"}
    # cut docs: the shared boilerplate must be gone from any survivor
    for did, text in zip(got["doc_id"], got["clean_text"]):
        if did in (100, 101):
            assert "b0 b1 b2" not in text


def test_cli_curate_mixture_single_survivor(tmp_path, capsys):
    """One surviving doc with mixture fan-out 2: a hash-join partition
    would receive zero left rows (the schema-loss crash); the bucketed
    lookup_join path must survive and write the one doc."""
    prose = ("the cat and the dog were in the house because it was "
             "raining and they could not go out for a walk")
    rows = [
        {"doc_id": 1, "text": f"{prose} unique tail", "source": "web"},
        {"doc_id": 2, "text": "too short", "source": "web"},  # quality-gated
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.Table.from_pylist(rows), src)

    out = tmp_path / "curated"
    main(["curate", "--input", str(src), "--out", str(out),
          "--mixture-by", "source", "--mixture-total", "5"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["quality_kept"] == 1
    assert stats["written"] == 1
    got = pq.read_table(out)
    assert got.num_rows == 1 and got["doc_id"].to_pylist() == [1]
