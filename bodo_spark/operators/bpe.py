"""Byte-pair-encoding tokenizer: distributed frequency counting, a
driver-side merge-table trainer, and an Arrow-batched encoder.

The split of work mirrors production tokenizer training (the
HuggingFace tokenizers / SentencePiece shape): the corpus-scale part --
counting word frequencies over TBs of text -- is one Spark groupBy;
training then runs over the BOUNDED word-frequency table (capped at
``max_words`` entries; beyond-cap tail words contribute negligible pair
mass), so the driver loop is O(max_words), independent of corpus size.
Encoding broadcasts the merge ranks and runs vectorized over Arrow
batches with a per-batch word memo (corpora repeat words heavily, so
the memo turns per-word merge loops into dict hits).

This extends the reference's tokenizer seam (reference
bodo/pandas/series.py:1903 Series.ai.tokenize, which delegates to an
external tokenizers library) with a self-contained trainer/encoder.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "train_bpe", "bpe_encode_udf", "bpe_tokens"]


def word_frequencies(df: DataFrame, text_col: str = "text", *,
                     max_words: int = 20_000,
                     lowercase: bool = True) -> list[tuple[str, int]]:
    """(word, count) list for the ``max_words`` most frequent words.

    The only corpus-scale work: explode + groupBy(word). The cap bounds
    what the driver ever sees; ties broken by word so the table (and
    everything trained from it) is deterministic.
    """
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    wc = (df.select(F.explode(F.split(F.trim(c), r"\s+")).alias("w"))
          .where(F.length("w") > 0)
          .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
          .orderBy(F.col("n").desc(), "w")
          .limit(max_words))
    return [(r.w, r.n) for r in wc.collect()]


def train_bpe(word_freqs: list[tuple[str, int]], *,
              num_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE training (Sennrich et al. 2016) over a word-frequency
    table: repeatedly merge the most frequent adjacent symbol pair.
    Ties break lexicographically, so training is fully deterministic.

    Pair counts are maintained incrementally (only words containing the
    merged pair are re-tokenized), the same bookkeeping real trainers
    use; cost is O(num_merges * words-touched), fine for the capped
    table sizes word_frequencies returns.
    """
    words = [(tuple(w), n) for w, n in word_freqs if len(w) >= 2]
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += n
            pair_words.setdefault(p, set()).add(idx)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            syms, n = words[idx]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(idx)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new = tuple(out)
            words[idx] = (new, n)
            for p in zip(new, new[1:]):
                pair_counts[p] += n
                pair_words.setdefault(p, set()).add(idx)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) >= 2:
        pairs = [(ranks.get((a, b)), i)
                 for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        cands = [(r, i) for r, i in pairs if r is not None]
        if not cands:
            break
        rank = min(r for r, _ in cands)
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and ranks.get((syms[i], syms[i + 1])) == rank):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_udf(merges: list[tuple[str, str]], *,
                   lowercase: bool = True):
    """pandas_udf: text column -> array<string> of BPE tokens.

    The merge ranks ship to executors via udf-closure broadcast; a
    per-batch word memo makes repeated words dict lookups. Apply to a
    whole document column -- tokens of all its words, concatenated.
    """
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            toks: list[str] = []
            t = text.lower() if lowercase else text
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return _enc


def bpe_tokens(col: Column | str, merges: list[tuple[str, str]], *,
               lowercase: bool = True) -> Column:
    """Column expression: BPE tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return bpe_encode_udf(merges, lowercase=lowercase)(c)


def bpe_vocab(word_freqs: list[tuple[str, int]],
              merges: list[tuple[str, str]]) -> dict[str, int]:
    """token string -> id table: base characters (sorted) first, then
    merged tokens in merge order -- the id layout real BPE vocabs use,
    deterministic given the same training inputs."""
    chars = sorted({ch for w, _ in word_freqs for ch in w})
    vocab = {ch: i for i, ch in enumerate(chars)}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_tokenizer_factory(merges: list[tuple[str, str]],
                          vocab: dict[str, int], *,
                          lowercase: bool = True):
    """Factory for operators/ai.py `tokenize(tokenizer_factory=...)`:
    returns a zero-arg callable producing text -> list[int] encoders --
    the same per-partition contract an external tokenizers library
    satisfies, fulfilled by the in-repo trainer. Out-of-vocabulary
    tokens map to stable negative ids (hash-derived) rather than
    failing, so encoding is total."""
    ranks = {p: i for i, p in enumerate(merges)}
    _MEMO_CAP = 1 << 20  # bound per-encoder word cache on hot partitions

    def factory():
        memo: dict[str, list[int]] = {}

        def encode(text: str) -> list[int]:
            ids: list[int] = []
            t = text.lower() if lowercase else text
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    import hashlib
                    # 8 hash bytes into a 2^62 id space: OOV collisions
                    # negligible past millions of distinct OOVs (a 2^30
                    # space collided noticeably beyond ~30k); ids ride
                    # tokenize()'s array<bigint> schema
                    got = [
                        vocab.get(tok, -1 - int.from_bytes(
                            hashlib.md5(tok.encode()).digest()[:8],
                            "big") % (1 << 62))
                        for tok in _encode_word(w, ranks)]
                    if len(memo) >= _MEMO_CAP:  # high-cardinality corpus:
                        memo.clear()            # drop, don't grow unbounded
                    memo[w] = got
                ids.extend(got)
            return ids

        return encode

    return factory
