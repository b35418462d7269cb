"""Arrow-vectorized Pandas UDFs — the engine's slow-path floor.

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the eval type from *evaluated* type hints, and PEP 563 string annotations
break that inference (UNSUPPORTED_SIGNATURE).
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def norm_text(s: pd.Series) -> pd.Series:
    """Whitespace-collapse + lowercase normalization, one Arrow batch at a
    time (~10-100x over row-at-a-time Python UDFs)."""
    return s.str.strip().str.replace(r"\s+", " ", regex=True).str.lower()
