"""Lance table IO with parquet fallback.

The target input (BASELINE.json input_hint) is a Lance table of
interleaved documents; Ray Data ships ``read_lance``/``write_lance``,
but the ``lance`` package itself is an optional dependency. These
helpers use Lance when importable and otherwise fall back to parquet
with the SAME schema and partition layout, so pipelines are agnostic to
the storage format and flip to Lance by installing one package.
"""

from __future__ import annotations

import ray.data as rd


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(uri: str, **kwargs) -> rd.Dataset:
    """Read an interleaved-documents table from Lance (preferred) or
    parquet (fallback). ``uri`` ending in ``.lance`` requires Lance."""
    if uri.endswith(".lance"):
        if not lance_available():
            raise NotImplementedError(
                "the 'lance' package is not installed in this environment; "
                "write the corpus as parquet or install lance"
            )
        return rd.read_lance(uri, **kwargs)
    if lance_available():
        try:
            return rd.read_lance(uri, **kwargs)
        except Exception as ex:
            # fall back to parquet but never SILENTLY: a corrupt/real
            # Lance dataset failing here would otherwise surface as an
            # unrelated parquet error (or read the wrong files)
            import logging

            logging.getLogger(__name__).warning(
                "read_lance(%s) failed (%s: %s); falling back to parquet",
                uri, type(ex).__name__, ex)
    return rd.read_parquet(uri, **kwargs)


def write_table(ds: rd.Dataset, uri: str, **kwargs) -> None:
    """Write via Lance when available, parquet otherwise. A ``.lance``
    URI without the lance package raises — silently writing parquet
    under a .lance name would break the read_documents round-trip
    (reads of that URI demand real Lance)."""
    if uri.endswith(".lance"):
        if not lance_available():
            raise NotImplementedError(
                "the 'lance' package is not installed; cannot write a "
                ".lance dataset — use a parquet path instead"
            )
        ds.write_lance(uri, **kwargs)
    else:
        ds.write_parquet(uri, **kwargs)
