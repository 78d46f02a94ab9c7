"""Deterministic uniform draws — the no-RNG-state primitive under soft
dedup, weighted sampling and mixture materialization.

Every sampling operator in this repo draws randomness as a pure
function of the row id so reruns/retries/resumes see identical samples
(SURVEY.md §4.3 determinism contract); this module is the single home
for that expression so the cross-engine contract lives in one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def md5_uniform(col: Column | str, hex_chars: int = 8) -> Column:
    """U[0, 1) from the leading ``hex_chars`` hex digits of
    ``md5(col)``.

    Engine-replicable by construction — the DuckDB oracle mirror is
    ``('0x' || substr(md5(c), 1, h))::BIGINT / 2^(4h)``.  The default
    8 chars give a 32-bit grid (plenty for keep/drop draws and exactly
    representable in a double); 15 chars give a 60-bit grid for rate
    comparisons where 2^-32 quantization would bias tiny expected
    counts.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    return (
        F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("double")
        / F.lit(float(1 << (4 * hex_chars)))
    )
