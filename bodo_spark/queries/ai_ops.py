"""LLM-ops battery (reference SURVEY.md 2.11): tokenize / embed /
vector-sink plumbing over the documents table. The fallback tokenizer's
md5-derived ids are reproducible in DuckDB SQL, so tokenization gets a
full value oracle; the numpy embedding path gets a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ai
from ._util import QueryDef, tbl


def ai_tokenize_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed tokenization (mapInPandas fallback tokenizer):
    per-language token counts and id checksums."""
    d = ai.tokenize(tbl(spark, sf, "documents"))
    return (d.select("lang", "tokens")
            .groupBy("lang").agg(
                F.sum(F.size("tokens")).cast("bigint").alias("total_tokens"),
                F.sum(F.element_at("tokens", 1).cast("bigint")).alias("sum_first_id"),
                F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang"))


# fallback tokenizer: md5(token)[:4 bytes] big-endian % 2^31
_AI_TOK_SQL = """
WITH toks AS (
  SELECT lang,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]') AS ts
  FROM documents)
SELECT lang,
       CAST(SUM(len(ts)) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(concat('0x', substr(md5(ts[1]), 1, 8)) AS BIGINT) % 2147483648)
            AS BIGINT) AS sum_first_id,
       COUNT(*) AS n_docs
FROM toks GROUP BY lang ORDER BY lang
"""


def ai_embed_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-projection embeddings feeding the ANN operator (rows-only:
    the numpy path is not SQL-expressible)."""
    from ..operators.similarity import brute_force_topk
    emb = (ai.embed(tbl(spark, sf, "documents"), dim=16)
           .select(F.col("doc_id").alias("vec_id"), "embedding"))
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    return brute_force_topk(emb, queries, k=5).orderBy("q_id", "rn")


QUERIES: dict[str, QueryDef] = {
    "ai_tokenize_stats": QueryDef(ai_tokenize_stats, _AI_TOK_SQL),
    "ai_embed_neighbors": QueryDef(ai_embed_neighbors, None),
}
