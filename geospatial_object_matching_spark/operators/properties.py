"""objects → properties: the 25-column geometric property operator
(SURVEY.md §2.8; reference object_properties.py).

One ``mapInPandas`` pass emits all 25 columns from the geometry buffers —
the reference's per-property ``multiprocessing.Pool`` fan-out
(object_properties.py:43-48) collapses into partition parallelism, and its
area/perimeter/volume memoization (:101-107,176-186,204-215) collapses into
computing each base quantity once per object inside the kernel.

log1p normalization (object_properties.py:63-65) is a kernel flag so the
normalized and raw variants share one code path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.types as T

from ..config import OBJECT_PROPERTIES
from ..functions.geometry import compute_properties_batch

PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
    ]
    + [T.StructField(p, T.DoubleType(), True) for p in OBJECT_PROPERTIES]
)


def compute_properties(objects: DataFrame, log1p: bool = True) -> DataFrame:
    """Wide property table ``properties(obj_id, source, p1..p25)``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            coords_list = [np.asarray(c, dtype=np.float64) for c in pdf["coords"]]
            offsets_list = [np.asarray(o, dtype=np.int64) for o in pdf["ring_offsets"]]
            cols = compute_properties_batch(coords_list, offsets_list, log1p=log1p)
            out = pd.DataFrame({"obj_id": pdf["obj_id"].values, "source": pdf["source"].values})
            for name in OBJECT_PROPERTIES:
                out[name] = cols[name]
            yield out

    return objects.select("obj_id", "source", "coords", "ring_offsets").mapInPandas(
        kernel, schema=PROPERTIES_SCHEMA
    )
