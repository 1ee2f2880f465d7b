"""Checkpoint manifest: per-partition lineage + metrics records enabling
mid-pipeline resume (SURVEY.md §4; the reference has no data-pipeline
resume at all — only per-epoch Keras weight checkpoints,
saber/utils/model_utils.py:86-112).

Layout: ``<out_dir>/_manifest/<stage>/part-<id>.json``, one JSON record
per completed (stage, partition). Writes are atomic-ish (temp file +
``os.replace``; last writer wins), so a crashed run never leaves a
half-written record, and a record's presence == the partition's output
files are complete.

Records carry a ``config_hash`` (pipeline config + engine version): on
resume, records whose hash differs from the current run are IGNORED —
a changed pipeline invalidates stale partitions instead of silently
mixing outputs.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field

from ..functions.hashing import stable_hex


@dataclass
class PartitionRecord:
    stage: str
    partition_id: int
    input_fragments: list[str]
    rows_in: int
    rows_out: int
    span_hash: str          # spot-check hash of the partition's input spans
    wall_ms: int
    status: str             # "done" | "failed"
    config_hash: str
    extra: dict = field(default_factory=dict)


class Manifest:
    def __init__(self, out_dir: str, config_hash: str):
        self.root = os.path.join(out_dir, "_manifest")
        self.config_hash = config_hash
        os.makedirs(self.root, exist_ok=True)

    def _path(self, stage: str, partition_id: int) -> str:
        return os.path.join(self.root, stage, f"part-{partition_id:06d}.json")

    def read(self, stage: str, partition_id: int) -> PartitionRecord | None:
        path = self._path(stage, partition_id)
        try:
            with open(path) as f:
                rec = PartitionRecord(**json.load(f))
        except (FileNotFoundError, json.JSONDecodeError, TypeError):
            return None
        return rec

    def is_done(self, stage: str, partition_id: int) -> bool:
        rec = self.read(stage, partition_id)
        return (
            rec is not None
            and rec.status == "done"
            and rec.config_hash == self.config_hash
        )

    def write(self, record: PartitionRecord) -> None:
        stage_dir = os.path.join(self.root, record.stage)
        os.makedirs(stage_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=stage_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(asdict(record), f, indent=1, sort_keys=True)
            os.replace(tmp, self._path(record.stage, record.partition_id))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def invalidate(self, stage: str, partition_id: int) -> None:
        """Persistently remove a record (e.g. the aggregated-graph record
        when a source partition is about to re-run)."""
        try:
            os.unlink(self._path(stage, partition_id))
        except FileNotFoundError:
            pass

    def invalidate_stage(self, stage: str) -> None:
        """Persistently remove EVERY record of a stage (used for stages
        whose partition count is config-dependent, e.g. the per-group
        graph reduces — a stale group record from an old grouping must
        never be trusted)."""
        d = os.path.join(self.root, stage)
        if not os.path.isdir(d):
            return
        for name in os.listdir(d):
            if name.endswith(".json"):
                try:
                    os.unlink(os.path.join(d, name))
                except FileNotFoundError:
                    pass

    def records(self, stage: str | None = None) -> list[PartitionRecord]:
        out: list[PartitionRecord] = []
        stages = [stage] if stage else sorted(os.listdir(self.root))
        for s in stages:
            d = os.path.join(self.root, s)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.endswith(".json"):
                    try:
                        with open(os.path.join(d, name)) as f:
                            out.append(PartitionRecord(**json.load(f)))
                    except (FileNotFoundError, json.JSONDecodeError, TypeError):
                        # tolerate stale/foreign records exactly like
                        # read() — listing must not crash on an upgrade
                        continue
        return out


class StageTimer:
    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.wall_ms = int((time.perf_counter() - self._t0) * 1000)
        return False


def config_hash(config_repr: str, engine_version: str) -> str:
    return stable_hex(f"{engine_version}\x1f{config_repr}", size=8)
