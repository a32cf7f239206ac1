"""LLM-ops surface: tokenize / embed / llm_generate / vector sink.

Reference parity (SURVEY.md 2.11):
  - Series.ai.tokenize      -> reference bodo/pandas/series.py:1903
  - Series.ai.llm_generate  -> reference series.py:1932,2038 (OpenAI-
                               compatible endpoint or Bedrock)
  - Series.ai.embed         -> reference series.py:2088,2187
  - df.to_s3_vectors        -> reference frame.py:721

All four follow one pattern: Arrow-batched mapInPandas over the text
column, external client calls batched per partition. The HTTP/tokenizer
libraries are not in this container, so each operator takes an optional
callable; without one, tokenize falls back to a deterministic regex
tokenizer, embed to a deterministic hash-projection embedding, and
llm_generate raises NotImplementedError (a remote LLM cannot be faked
meaningfully). The Spark plumbing -- batch shapes, schemas, async
batching seams, partition-level client reuse -- is real and tested.

Scale: one Python hop, no shuffle; with 1000 executors each partition
holds its own client/tokenizer instance (created once per partition,
not per row), and batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans import ensure_scan_width

_WORD_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def tokenize(df: DataFrame, text_col: str = "text",
             tokenizer_factory: Optional[Callable[[], Callable]] = None,
             out_col: str = "tokens") -> DataFrame:
    """Token-id arrays per document. ``tokenizer_factory()`` is invoked
    once per partition (e.g. ``lambda: AutoTokenizer.from_pretrained(...)
    .encode``); the fallback maps regex word-pieces to stable 32-bit ids.
    """
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    # bigint ids: external tokenizers (and the BPE factory's 2^62 OOV
    # space) may exceed int32; the fallback's 31-bit ids fit either way
    schema += f", {out_col} array<bigint>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if tokenizer_factory is not None:
            encode = tokenizer_factory()  # once per partition
        else:
            def encode(s: str) -> list[int]:
                return [int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:4], "big") % (1 << 31)
                    for t in _WORD_RE.findall(s)]
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(encode)
            yield pdf

    # row-proportional Python stage: don't inherit a 1-file scan's width.
    # External tokenizer_factory may be latency-bound (a remote service):
    # skip the byte cap so width = concurrency, as in embed/llm_generate.
    return ensure_scan_width(
        df, bytes_per_partition=None if tokenizer_factory else 1 << 20
    ).mapInPandas(run, schema)


def embed(df: DataFrame, text_col: str = "text", dim: int = 32,
          embed_factory: Optional[Callable[[], Callable]] = None,
          out_col: str = "embedding") -> DataFrame:
    """Embedding per document -> array<float>. ``embed_factory()`` is
    created once per partition and must map list[str] -> list[vector]
    (the batch seam an HTTP embedding API needs). Fallback: deterministic
    hashed bag-of-words projection, L2-normalized -- a real (if weak)
    embedding that exercises identical plumbing."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema += f", {out_col} array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if embed_factory is not None:
            embed_batch = embed_factory()
        else:
            def embed_batch(texts: list[str]) -> list[np.ndarray]:
                out = []
                for s in texts:
                    v = np.zeros(dim, dtype=np.float64)
                    for t in _WORD_RE.findall(s):
                        h = hashlib.md5(t.encode()).digest()
                        v[h[0] % dim] += 1.0 if h[1] % 2 else -1.0
                    n = np.linalg.norm(v)
                    out.append((v / n if n > 0 else v).astype(np.float32))
                return out
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = embed_batch(pdf[text_col].tolist())
            yield pdf

    # row-proportional Python stage: don't inherit a 1-file scan's width.
    # With an external embed_factory the per-row cost is request latency,
    # not bytes -- width IS the API concurrency, so skip the byte cap
    # (mirrors llm_generate); the cap only applies to the local fallback.
    return ensure_scan_width(
        df, bytes_per_partition=None if embed_factory else 1 << 20
    ).mapInPandas(run, schema)


def openai_client_factory(base_url: str, model: str = "default",
                          api_key: Optional[str] = None,
                          concurrency: int = 8, max_retries: int = 3,
                          timeout: float = 30.0,
                          backoff: float = 0.1) -> Callable[[], Callable]:
    """Batched/retrying OpenAI-compatible chat client for llm_generate
    (reference bodo/pandas/series.py:1932 async-batched generation).

    Transport is stdlib urllib (the container has no HTTP client
    libraries); concurrency within a batch comes from a per-partition
    thread pool -- the same overlap an asyncio client gives, without an
    event-loop dependency inside executor workers. Each prompt is one
    POST to {base_url}/chat/completions; 429/5xx and connection errors
    retry with exponential backoff (capped at ``max_retries``), other
    HTTP errors raise immediately. The returned factory is
    serialization-safe (the pool is created inside the partition, never
    on the driver)."""

    def factory() -> Callable:
        import json as _json
        import time as _time
        import urllib.error
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        url = base_url.rstrip("/") + "/chat/completions"
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"

        def one(prompt: str) -> str:
            body = _json.dumps({
                "model": model,
                "messages": [{"role": "user", "content": prompt}],
            }).encode()
            last: Exception | None = None
            for attempt in range(max_retries + 1):
                try:
                    req = urllib.request.Request(url, data=body,
                                                 headers=headers)
                    with urllib.request.urlopen(req, timeout=timeout) as r:
                        out = _json.loads(r.read())
                    return out["choices"][0]["message"]["content"]
                except urllib.error.HTTPError as e:
                    if e.code not in (429, 500, 502, 503, 504):
                        raise
                    last = e
                except (urllib.error.URLError, OSError, TimeoutError) as e:
                    last = e
                _time.sleep(backoff * (2 ** attempt))
            raise RuntimeError(
                f"llm_generate: request failed after "
                f"{max_retries + 1} attempts: {last}") from last

        def call(prompts: list[str]) -> list[str]:
            # pool per call, context-managed: executor Python workers are
            # reused across tasks, so a partition-lifetime pool would leak
            # non-daemon threads; pool startup is negligible next to the
            # HTTP round-trips it overlaps. map preserves input order
            # regardless of completion order -- responses line up with
            # their rows.
            with ThreadPoolExecutor(max_workers=concurrency) as pool:
                return list(pool.map(one, prompts))

        return call

    return factory


def llm_generate(df: DataFrame, prompt_col: str = "text",
                 client_factory: Optional[Callable[[], Callable]] = None,
                 out_col: str = "response",
                 batch_size: int = 16) -> DataFrame:
    """Batched generation against an OpenAI-compatible endpoint
    (reference series.py:1932). ``client_factory()`` runs once per
    partition and must map list[str] -> list[str]; requests are issued
    in ``batch_size`` groups (the async-batching seam). No fake
    fallback: raises unless a client is provided."""
    if client_factory is None:
        raise NotImplementedError(
            "llm_generate needs an endpoint client: pass "
            "client_factory=openai_client_factory(base_url, model, ...) "
            "for an OpenAI-compatible endpoint, or any callable mapping "
            "list[str] -> list[str]. There is deliberately no fake "
            "fallback -- model output cannot be honestly simulated.")
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema += f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        call = client_factory()
        for pdf in batches:
            prompts = pdf[prompt_col].tolist()
            outs: list[str] = []
            for i in range(0, len(prompts), batch_size):
                outs.extend(call(prompts[i:i + batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    # effective request concurrency = partitions x client threads; a
    # 1-split input would serialize every batch through one worker.
    # bytes_per_partition=None: request latency, not bytes, is the work
    # unit here -- always widen to full cluster width.
    return ensure_scan_width(df, bytes_per_partition=None) \
        .mapInPandas(run, schema)


def to_vector_sink(df: DataFrame, id_col: str, vec_col: str,
                   writer_factory: Optional[Callable[[], Callable]] = None,
                   batch_size: int = 128) -> int:
    """Vector-store sink (reference frame.py:721 to_s3_vectors):
    foreachPartition with one client per partition, batched puts.
    Returns the number of vectors written. Without a writer_factory the
    rows are counted through the same code path (dry-run)."""
    count = df.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows) -> None:
        writer = writer_factory() if writer_factory else None
        buf = []
        n = 0
        for row in rows:
            buf.append((row[id_col], row[vec_col]))
            if len(buf) >= batch_size:
                if writer:
                    writer(buf)
                n += len(buf)
                buf = []
        if buf:
            if writer:
                writer(buf)
            n += len(buf)
        count.add(n)

    df.select(id_col, vec_col).foreachPartition(write_partition)
    return count.value
