"""User-defined function surface: vectorized UDF, grouped UDAF, UDTF.

The reference has no extension points at all (SURVEY.md §2.2
"UDF/UDAF/UDTF surface: none"); the engine exposes all three Spark
flavors, each demonstrated on the documents corpus and oracle-checked
(the UDF bodies are deterministic arithmetic, so DuckDB can replay
them in SQL):

- ``p_udf_vectorized``  — Arrow-batched scalar ``pandas_udf`` (the
  10-100× faster path vs row-at-a-time Python; the ONLY acceptable
  Python scalar UDF shape at 100 TB).
- ``p_udaf_grouped``    — grouped-map ``applyInPandas`` aggregation.
- ``p_udtf_explode``    — Python UDTF (Spark 4 lateral table
  function) emitting one row per token.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def _readability_body(text: pd.Series) -> pd.Series:
    """Toy readability score: 100 − 2·(mean word length) − (words/10),
    clamped at 0. Pure vectorized pandas — one Arrow batch per call."""
    words = text.str.split(" ")
    n_words = words.str.len().clip(lower=1)
    mean_len = (text.str.len() - (n_words - 1)) / n_words
    return (100.0 - 2.0 * mean_len - n_words / 10.0).clip(lower=0.0)


@query(
    "p_udf_vectorized",
    oracle="""
    SELECT doc_id,
           round(greatest(
               100.0
               - 2.0 * (CAST(length(text) - (greatest(len(string_split(text,' ')),1) - 1) AS DOUBLE)
                        / greatest(len(string_split(text,' ')), 1))
               - greatest(len(string_split(text,' ')), 1) / 10.0,
               0.0), 4) AS readability
    FROM documents
    """,
)
def p_udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf; DuckDB replays the arithmetic."""
    # created here, not at module scope: pandas_udf parses its DDL
    # return type through the active SparkContext
    readability = pandas_udf(_readability_body, "double")
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(readability("text"), 4).alias("readability")
    )


def _source_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: per-source corpus statistics."""
    n_tokens = pdf["text"].str.split(" ").str.len()
    return pd.DataFrame(
        [
            {
                "source": pdf["source"].iloc[0],
                "n_docs": len(pdf),
                "total_tokens": int(n_tokens.sum()),
                "mean_tokens": round(float(n_tokens.mean()), 4),
                "max_chars": int(pdf["text"].str.len().max()),
            }
        ]
    )


@query(
    "p_udaf_grouped",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(len(string_split(text, ' '))), 4) AS mean_tokens,
           CAST(max(length(text)) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    """,
)
def p_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas aggregation (custom UDAF shape).

    One shuffle on the group key; each group is one Arrow batch in
    pandas. For unbounded groups prefer built-in aggs — this shape is
    for genuinely custom per-group logic."""
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("source").applyInPandas(
        _source_stats,
        "source string, n_docs long, total_tokens long, "
        "mean_tokens double, max_chars long",
    )


class _TokenizeUDTF:
    """Python UDTF body: lateral-explode a text into (position, token).

    Decorated with ``udtf(...)`` inside the query function — the
    decorator parses its DDL return type via the active context."""

    def eval(self, doc_id: int, text: str):  # noqa: ANN001
        if text is None:
            return
        for pos, tok in enumerate(text.split(" ")):
            if len(tok) >= 8:
                yield pos, tok


@query(
    "p_udtf_explode",
    oracle="""
    SELECT pos, token, count(*) AS n FROM (
        SELECT CAST(i - 1 AS INTEGER) AS pos, ts[i] AS token
        FROM (SELECT string_split(text, ' ') AS ts FROM documents),
             unnest(generate_series(1, len(ts))) AS u(i)
    )
    WHERE length(token) >= 8
    GROUP BY pos, token
    """,
)
def p_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF as a lateral table function: 8+-char token positions."""
    d = read_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("docs_for_udtf")
    spark.udtf.register(
        "tokenize_long", udtf(_TokenizeUDTF, returnType="pos int, token string")
    )
    return spark.sql(
        """
        SELECT t.pos, t.token, count(*) AS n
        FROM docs_for_udtf,
             LATERAL tokenize_long(doc_id, text) t
        GROUP BY t.pos, t.token
        """
    )
