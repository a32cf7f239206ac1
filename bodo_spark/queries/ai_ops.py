"""LLM-ops battery (reference SURVEY.md 2.11): tokenize / embed /
vector-sink plumbing over the documents table. Both the fallback
tokenizer's md5-derived ids and the fallback embedding's signed md5
bag-of-words projection are reproducible in DuckDB SQL, so both get
full value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ai
from ..rowframe import local_df
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
    """Hash-projection embeddings feeding the ANN operator. FULL value
    oracle: the fallback embedding is a signed md5 bag-of-words
    projection (bucket = digest byte 0 % dim, sign = byte 1 parity,
    L2-normalized, float32), all of which DuckDB re-derives from
    md5-hex + regexp tokens -- the embed->ANN path is hash-checked end
    to end, not rows-only."""
    from ..operators.similarity import brute_force_topk
    emb = (ai.embed(tbl(spark, sf, "documents"), dim=16)
           .select(F.col("doc_id").alias("vec_id"), "embedding"))
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    return brute_force_topk(emb, queries, k=5).orderBy("q_id", "rn")


# ai.embed fallback twin: v[md5(tok)[0] % 16] += (md5(tok)[1] % 2 ? 1 :
# -1) over the same token regex, L2-normalize, quantize to float32;
# then the standard brute-force cosine top-5 (round-6, id tiebreak).
_AI_EMB_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
           AS tok
  FROM documents),
tw AS (SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 1, 2)) AS INT) % 16 AS b,
         CASE WHEN CAST(concat('0x', substr(md5(tok), 3, 2)) AS INT) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS s
       FROM toks),
w AS (SELECT doc_id, b, SUM(s) AS ws FROM tw GROUP BY 1, 2),
grid AS (SELECT d.doc_id, r.range AS d
         FROM (SELECT doc_id FROM documents) d CROSS JOIN range(0, 16) r),
raw AS (SELECT g.doc_id, list(COALESCE(w.ws, 0.0) ORDER BY g.d) AS v
        FROM grid g LEFT JOIN w ON w.doc_id = g.doc_id AND w.b = g.d
        GROUP BY g.doc_id),
emb AS (SELECT doc_id AS vec_id,
          list_transform(v, x -> CAST(CASE WHEN n > 0 THEN x / n ELSE x END
                                      AS REAL)) AS embedding
        FROM (SELECT doc_id,
                     sqrt(list_sum(list_transform(v, x -> x * x))) AS n, v
              FROM raw)),
q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM emb WHERE vec_id < 3),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.q_vec AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(q.q_vec AS DOUBLE[]),
                                    CAST(q.q_vec AS DOUBLE[])))), 6) AS cos
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id)
SELECT q_id, vec_id, cos,
       row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
FROM scored
QUALIFY rn <= 5
ORDER BY q_id, rn
"""


def ai_llm_generate_stats(spark: SparkSession, sf: str) -> DataFrame:
    """llm_generate through the REAL transport under the correctness
    gate: an in-process OpenAI-compatible endpoint (ThreadingHTTPServer,
    same shape as tests/test_ai_ops.py) serves deterministic echo
    completions and force-fails the first two requests with 503 so the
    retry/backoff path executes; openai_client_factory issues batched
    concurrent POSTs from executor workers. Model quality is NOT faked
    -- the oracle restates only the deterministic echo contract
    (response = 'echo:' || first 20 chars of the prompt): n_match
    counts rows whose response matches it exactly, and the oracle
    asserts n_match = n_docs. The tiny per-language aggregate is
    materialized before the server shuts down."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"failures_left": 2}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            with lock:
                fail = state["failures_left"] > 0
                if fail:
                    state["failures_left"] -= 1
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            if fail:
                self.send_response(503)
                self.end_headers()
                return
            prompt = body["messages"][0]["content"]
            resp = json.dumps({"choices": [{"message": {
                "content": f"echo:{prompt[:20]}"}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        d = tbl(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
        out = ai.llm_generate(
            d, prompt_col="text",
            client_factory=ai.openai_client_factory(
                f"http://127.0.0.1:{port}/v1", model="gate",
                api_key="sk-gate", concurrency=8, max_retries=3,
                backoff=0.01),
            batch_size=16)
        expected = F.concat(F.lit("echo:"), F.substring("text", 1, 20))
        rows = (out.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("response") == expected).cast("bigint"))
             .alias("n_match"),
            F.sum(F.length("response")).cast("bigint")
             .alias("sum_resp_len"))
            .orderBy("lang")).collect()
    finally:
        srv.shutdown()
        srv.server_close()
    return local_df(
            spark,
        [tuple(r) for r in rows],
        "lang string, n_docs bigint, n_match bigint, sum_resp_len bigint")


_AI_LLM_SQL = """
SELECT lang, COUNT(*) AS n_docs, COUNT(*) AS n_match,
       CAST(SUM(5 + LEAST(20, length(text))) AS BIGINT) AS sum_resp_len
FROM documents WHERE doc_id % 5 = 0
GROUP BY lang ORDER BY lang
"""


def ai_vector_sink_count(spark: SparkSession, sf: str) -> DataFrame:
    """Vector-store sink dry-run under the gate (reference frame.py:721
    to_s3_vectors): every embedding row flows through the real
    foreachPartition + batched-put path (batch assembly, per-partition
    writer lifecycle) with no external store attached; the accumulator
    count of vectors "written" must equal the corpus size. Also checks
    a non-trivial batch size so the tail-batch flush path runs."""
    emb = tbl(spark, sf, "embeddings")
    n = ai.to_vector_sink(emb, "vec_id", "embedding", batch_size=64)
    return local_df(spark, [(int(n),)], "n_vectors bigint")


_AI_VSINK_SQL = """
SELECT COUNT(*) AS n_vectors FROM embeddings
"""


QUERIES: dict[str, QueryDef] = {
    "ai_tokenize_stats": QueryDef(ai_tokenize_stats, _AI_TOK_SQL),
    "ai_embed_neighbors": QueryDef(ai_embed_neighbors, _AI_EMB_SQL),
    "ai_llm_generate_stats": QueryDef(ai_llm_generate_stats, _AI_LLM_SQL),
    "ai_vector_sink_count": QueryDef(ai_vector_sink_count, _AI_VSINK_SQL),
}
