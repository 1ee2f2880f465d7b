"""Arrow-coerced Dataset schemas.

Ray Datasets whose blocks are pandas-backed (``from_pandas``, fresh
``map_groups(..., batch_format="pandas")`` lineage) report NUMPY dtypes
from ``.schema()``; feeding those to ``pa.nulls(type=...)`` /
``pc.cast`` raises ``TypeError: DataType expected``. Every operator
that captures a column type on the driver goes through
:func:`arrow_types` so pandas-blocked inputs work too.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

#: object-dtype columns already warned about (one log line per name per
#: process, not per call)
_WARNED_OBJECT_COLUMNS: set = set()


def arrow_types(ds) -> dict:
    """``{column: pyarrow.DataType}`` for a Dataset whose blocks may be
    pandas-backed. Numpy dtypes convert via ``pa.from_numpy_dtype``.

    Pandas ``object`` columns carry no element type in the schema, so
    they are ASSUMED to be strings — right for text/id columns, wrong
    for object-of-list payloads (embedding vectors built via pandas):
    those must arrive Arrow-backed (``from_arrow`` / parquet / any
    ``batch_format="pyarrow"`` stage), and the assumption is logged
    once per column name so a mistyped pipeline is diagnosable.
    """
    sch = ds.schema()
    out = {}
    for name, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, pa.lib.ArrowNotImplementedError):
                if name not in _WARNED_OBJECT_COLUMNS:
                    _WARNED_OBJECT_COLUMNS.add(name)
                    logger.warning(
                        "arrow_types: pandas object column %r assumed "
                        "string; non-string payloads (lists, mixed) must "
                        "arrive Arrow-backed", name)
                t = pa.string()
        out[name] = t
    return out
