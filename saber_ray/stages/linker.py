"""Entity-linking (grounding) stage: broadcast-dictionary actor pool.

Replaces the reference's remote EXTRACT 2.0 API round-trip
(saber/utils/grounding_utils.py:11-68) with a hermetic broadcast
dictionary: the surface-form → xrefs map is ``ray.put`` once on the
driver and each actor fetches it a single time in ``__init__`` — a
broadcast-small-side hash join, never a shuffle and never re-shipped per
batch.

Semantics (matching the reference's goldens,
saber/tests/test_grounding_utils.py:20-152):

* lookup key is ``(normalized surface, label)`` where normalization =
  lowercase + whitespace collapse;
* matched mentions get the full candidate xref list in fixture order;
* unmatched mentions keep ``xrefs = []`` — left-outer semantics
  (saber/utils/grounding_utils.py:63-66);
* every mention gets a deterministic ``entity_id``: the top candidate's
  ``label:namespace:id`` when grounded, else ``label:surface:<norm>`` —
  this is the canonicalization key downstream.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray

from .tagger import _ENT_TYPE

_XREF_TYPE = pa.struct(
    [("namespace", pa.string()), ("id", pa.string()), ("organism_id", pa.string())]
)
GROUNDED_ENT_TYPE = pa.struct(
    list(_ENT_TYPE)
    + [("xrefs", pa.list_(_XREF_TYPE)), ("entity_id", pa.string())]
)

_WS = re.compile(r"\s+")


def normalize_surface(text: str) -> str:
    return _WS.sub(" ", text.strip().lower())


def entity_id_for(label: str, norm_surface: str, xrefs: list[dict]) -> str:
    if xrefs:
        top = xrefs[0]
        return f"{label}:{top['namespace']}:{top['id']}"
    return f"{label}:surface:{norm_surface}"


class EntityLinker:
    """Actor-pool stage: enrich ``ents`` with xrefs + canonical entity ids.

    ``linker_ref`` is either a plain dict (tests) or a ``ray.ObjectRef``
    from ``ray.put`` (pipelines) of
    ``{(surface, label): [xref_dict, ...]}``.
    """

    def __init__(self, linker_ref=None):
        if linker_ref is None:
            from ..gazetteer import SABER_GROUNDING, build_linker_dict

            self._dict = build_linker_dict(SABER_GROUNDING)
        elif isinstance(linker_ref, ray.ObjectRef):
            self._dict = ray.get(linker_ref)
        else:
            self._dict = linker_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        ents_col = batch["ents"].to_pylist()
        out_col: list[list[dict]] = []
        for ents in ents_col:
            grounded = []
            for ent in ents:
                norm = normalize_surface(ent["text"])
                xrefs = self._dict.get((norm, ent["label"]), [])
                grounded.append(
                    {
                        **ent,
                        "xrefs": xrefs,
                        "entity_id": entity_id_for(ent["label"], norm, xrefs),
                    }
                )
            out_col.append(grounded)
        idx = batch.column_names.index("ents")
        return batch.set_column(
            idx, "ents", pa.array(out_col, type=pa.list_(GROUNDED_ENT_TYPE))
        )
