"""Python UDTF surface (SURVEY.md §2B "UDF/UDAF/UDTF"): the Spark 4
``@udtf`` table-function shape, registered so SQL can LATERAL-join it
— the Spark analogue of the reference registering table functions
through the DuckDB extension ABI
(/root/reference/src/vortex_extension.cpp:31-33).

``split_sentences`` is the demonstration op: one row per '.'-delimited
sentence with its position. NOTE: Python UDTFs run row-at-a-time in
the Python worker — correct but the slow path. For bulk text
splitting at 100 TB use the column-algebra equivalent
(``posexplode(split(...))``, as operators/chunking.py does); the UDTF
exists for the cases that genuinely need per-row imperative logic
with multi-row output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from ..catalog import load, query

_SENTENCE_SCHEMA = T.StructType(
    [
        T.StructField("sentence_id", T.LongType()),
        T.StructField("sentence", T.StringType()),
    ]
)


@udtf(returnType=_SENTENCE_SCHEMA, useArrow=True)
class SplitSentences:
    """Yield (position, trimmed sentence) for each non-empty
    '.'-separated span of the input text."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        i = 0
        for raw in text.split("."):
            s = raw.strip()
            if s:
                yield i, s
                i += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface against the session (parity with the
    reference's extension-bootstrap registration, SURVEY.md §3.1)."""
    spark.udtf.register("split_sentences", SplitSentences)


SENTENCES_ORACLE = """
WITH s AS (
  SELECT
    doc_id,
    list_filter(list_transform(string_split(text, '.'), x -> trim(x)), x -> x != '') AS parts
  FROM documents
  WHERE doc_id % 20 = 0
)
SELECT
  doc_id,
  CAST(generate_subscripts(parts, 1) - 1 AS BIGINT) AS sentence_id,
  unnest(parts) AS sentence
FROM s
"""


@query("udtf_split_sentences", oracle=SENTENCES_ORACLE, tags=("udtf", "text"))
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join against the registered Python UDTF."""
    register_udtfs(spark)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    ).createOrReplaceTempView("docs_sample")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_id, s.sentence
        FROM docs_sample d, LATERAL split_sentences(d.text) s
        """
    )
