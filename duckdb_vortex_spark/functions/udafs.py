"""Grouped-aggregate UDAF surface via ``applyInPandas`` (SURVEY.md §2B
"UDF/UDAF/UDTF"): the escape hatch for aggregations Spark's built-ins
can't express. Completes the Python-surface matrix alongside scalar
pandas UDFs (functions/geo.py), mapInPandas (operators/multimodal.py),
UDTFs (functions/udtfs.py) and applyInPandasWithState
(streaming/stateful.py).

The demo aggregate — a 10%-trimmed mean — is chosen because it is
order-statistic-based (genuinely awkward as column algebra) yet still
exactly SQL-expressible via window row_numbers, so the UDAF path gets
a value-exact DuckDB oracle rather than the usual rows-only check.

Scale: applyInPandas shuffles once on the group key and streams each
group through Arrow as a pandas frame — groups must fit in worker
memory (fine for per-source/per-partition rollups; NOT for a single
global group). Arithmetic inside is exact-int sum → one float divide,
so results are partitioning-independent.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query

_OUT_SCHEMA = "source string, trimmed_mean_chars double, n_kept bigint"


def _trimmed_mean(pdf: pd.DataFrame) -> pd.DataFrame:
    # Keep ranks (k, n-k] of the value-sorted group, k = n//10 — the
    # exact row set the oracle's row_number window selects. Which of
    # several tied rows are dropped cannot affect the mean.
    v = pdf["n_chars"].sort_values(ignore_index=True)
    n = len(v)
    k = n // 10
    kept = v.iloc[k : n - k] if n - 2 * k > 0 else v
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "trimmed_mean_chars": [float(int(kept.sum())) / len(kept)],
            "n_kept": [len(kept)],
        }
    )


def trimmed_mean_by(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    sel = df.select(F.col(group_col).alias("source"), F.col(value_col).alias("n_chars"))
    return sel.groupBy("source").applyInPandas(_trimmed_mean, _OUT_SCHEMA)


TRIMMED_MEAN_ORACLE = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT
  source,
  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS trimmed_mean_chars,
  COUNT(*) AS n_kept
FROM r
WHERE rn > n // 10 AND rn <= n - n // 10
GROUP BY source
"""


@query("udaf_trimmed_mean_pandas", oracle=TRIMMED_MEAN_ORACLE, tags=("udf", "agg"))
def udaf_trimmed_mean_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of document length per source as a pandas
    grouped-aggregate UDAF, value-exact against the window-based SQL
    formulation (see module docstring)."""
    return trimmed_mean_by(load(spark, sf_dir, "documents"), "source", "n_chars")
