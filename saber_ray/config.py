"""INI-file configuration surface (S8).

The reference harmonizes a ``config.ini`` with CLI overrides
(saber/config.py:29-135; every knob in CONFIG_ARGS,
saber/constants.py:87-92). The engine's equivalent maps an INI file to
``KGConfig`` — the same object whose stable hash identifies checkpoint
manifests — with CLI-style overrides applied on top::

    [pipeline]
    same_sentence = true
    num_salts = 16
    batch_size = 256

    [gazetteer]            ; optional: surface = LABEL lines replace the
    p53 = PRGE             ; built-in surface table when present
    glucose = CHED
"""

from __future__ import annotations

import configparser

from .pipelines.kg import KGConfig


def load_config(path: str, **overrides) -> KGConfig:
    """INI file → KGConfig; keyword overrides win (CLI harmonization)."""
    # raw keys (gazetteer surfaces are case-sensitive data, and may
    # contain '%' which BasicInterpolation would choke on)
    parser = configparser.ConfigParser(interpolation=None)
    parser.optionxform = str
    with open(path) as f:
        parser.read_file(f)
    kwargs: dict = {}
    if parser.has_section("pipeline"):
        sec = parser["pipeline"]
        if "same_sentence" in sec:
            kwargs["same_sentence"] = sec.getboolean("same_sentence")
        if "num_salts" in sec:
            kwargs["num_salts"] = sec.getint("num_salts")
        if "batch_size" in sec:
            raw = sec.get("batch_size")
            kwargs["batch_size"] = None if raw in ("", "none", "None") else int(raw)
        if "dedup" in sec:
            kwargs["dedup"] = sec.get("dedup")
        if "dedup_min_jaccard" in sec:
            kwargs["dedup_min_jaccard"] = sec.getfloat("dedup_min_jaccard")
        if "dedup_edit_k" in sec:
            kwargs["dedup_edit_k"] = sec.getint("dedup_edit_k")
    if parser.has_section("gazetteer") and parser["gazetteer"]:
        kwargs["surfaces"] = {
            surface: label.strip().upper()
            for surface, label in parser["gazetteer"].items()
        }
    kwargs.update(overrides)
    return KGConfig(**kwargs)


def save_config(config: KGConfig, path: str) -> str:
    """KGConfig → INI (the reference saves its config with every model
    bundle for reproducibility, saber/saber.py:161-162)."""
    parser = configparser.ConfigParser(interpolation=None)
    parser.optionxform = str
    parser["pipeline"] = {
        "same_sentence": str(config.same_sentence).lower(),
        "num_salts": str(config.num_salts),
        "batch_size": "" if config.batch_size is None else str(config.batch_size),
        "dedup": config.dedup,
        "dedup_min_jaccard": str(config.dedup_min_jaccard),
        "dedup_edit_k": str(config.dedup_edit_k),
    }
    parser["gazetteer"] = {s: l for s, l in sorted(config.surfaces.items())}
    with open(path, "w") as f:
        parser.write(f)
    return path
