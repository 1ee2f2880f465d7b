"""CoNLL TSV corpus reader (S1).

The reference reads ``train.*``/``valid.*``/``test.*`` TSVs — one
``token \\t tag`` per line, blank line = sentence break — through NLTK's
``ConllCorpusReader`` (saber/dataset.py:42,58-136;
saber/utils/data_utils.py:15-49). Here a FILE is the unit of parallelism
(``read_binary_files`` keeps each file intact so sentence boundaries
never straddle blocks — a line-oriented ``read_text`` would split
sentences at block edges), and a stateless ``map_batches`` parser emits
one row per sentence:

    file: string, sent_id: int64, tokens: list<string>, tags: list<string>

Partition discovery mirrors the reference: a directory with
``train.*``/``valid.*``/``test.*`` maps to dataset splits.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data as rd

SENTENCES_SCHEMA = pa.schema(
    [
        ("file", pa.string()),
        ("sent_id", pa.int64()),
        ("tokens", pa.list_(pa.string())),
        ("tags", pa.list_(pa.string())),
    ]
)


def parse_conll(text: str) -> list[tuple[list[str], list[str]]]:
    """One CoNLL file body → [(tokens, tags), ...] per sentence."""
    sentences: list[tuple[list[str], list[str]]] = []
    tokens: list[str] = []
    tags: list[str] = []
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line.strip():
            if tokens:
                sentences.append((tokens, tags))
                tokens, tags = [], []
            continue
        parts = line.split("\t")
        tokens.append(parts[0])
        # `or "O"`: a trailing tab with no tag ('token\t') must fall back
        # like an untagged token, not mint a phantom '' label
        tags.append((parts[1] if len(parts) > 1 else "") or "O")
    if tokens:
        sentences.append((tokens, tags))
    return sentences


def _parse_batch(batch: pa.Table) -> pa.Table:
    rows = {name: [] for name in SENTENCES_SCHEMA.names}
    for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        for sent_id, (tokens, tags) in enumerate(parse_conll(data.decode("utf-8"))):
            rows["file"].append(os.path.basename(path))
            rows["sent_id"].append(sent_id)
            rows["tokens"].append(tokens)
            rows["tags"].append(tags)
    return pa.Table.from_pydict(rows, schema=SENTENCES_SCHEMA)


def read_conll(paths: str | list[str]) -> rd.Dataset:
    """Glob/paths of CoNLL TSV files → sentence Dataset."""
    if isinstance(paths, str):
        paths = sorted(glob.glob(paths)) if any(c in paths for c in "*?[") else [paths]
    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_parse_batch, batch_format="pyarrow")


def read_conll_partitions(directory: str) -> dict[str, rd.Dataset]:
    """Reference-style partition discovery: train/valid/test file prefixes
    (saber/utils/data_utils.py:15-49)."""
    out: dict[str, rd.Dataset] = {}
    for split in ("train", "valid", "test"):
        files = sorted(glob.glob(os.path.join(directory, f"{split}.*")))
        if files:
            out[split] = read_conll(files)
    return out
