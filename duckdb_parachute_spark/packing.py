"""Training-sequence packing: greedy first-fit of documents into fixed
token-length bins (the "sequence packing" step of an LLM data pipeline —
brief-mandated beyond-reference scope, alongside dedup/ and similarity/).

Packing is inherently sequential WITHIN a bin stream, so the distributed
decomposition is shard-parallel greedy packing: documents are assigned to a
deterministic shard (``id % n_shards``), each shard packs its documents in
id order with the classic greedy rule (open a new bin when the running fill
would exceed ``max_len``; an oversized document gets a bin of its own), and
bins are namespaced by ``(shard, bin_id)`` so no cross-shard coordination
exists. At 100 TB: one shuffle to co-locate shards, then every shard is an
independent linear scan inside an Arrow-batched ``applyInPandas`` — the
parallelism knob is ``n_shards``, sized to the cluster, and the result is
deterministic for any value of it (each shard's packing depends only on its
own ordered documents).

The greedy loop itself is a few lines of per-group pandas — the blessed
custom-operator path for logic Spark's built-ins cannot express (a
cumulative sum with data-dependent resets)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_len: int,
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign each row a ``(shard, bin_id, bin_offset)``: greedy first-fit
    packing of ``tokens_col`` into bins of capacity ``max_len``, sharded by
    ``id % n_shards`` and ordered by id within each shard."""
    if max_len <= 0:
        raise ValueError("max_len must be positive")
    from pyspark.sql.types import LongType, StructField, StructType

    src = df.withColumn(shard_col, (F.col(id_col) % F.lit(n_shards)).cast("long"))
    # copy the field list — StructType.add mutates in place, and src.schema
    # is the DataFrame's live schema object
    out_schema = StructType(
        list(src.schema.fields)
        + [StructField("bin_id", LongType()), StructField("bin_offset", LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, offs = [], []
        b, fill = 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if fill > 0 and fill + t > max_len:
                b += 1
                fill = 0
            bins.append(b)
            offs.append(fill)
            fill += t
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    return src.groupBy(shard_col).applyInPandas(pack, out_schema)


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    stride: int,
) -> DataFrame:
    """Overlapping token-window chunking (the RAG/pretraining chunker that
    pairs with pack_greedy): each document's whitespace tokens split into
    windows of ``window`` tokens advancing by ``stride`` (< window gives
    overlap). Emits ``(id, chunk_idx, chunk_start, chunk_text, n_chunk_tokens)``.

    Pure Catalyst: tokens → sequence of window starts → posexplode + slice —
    embarrassingly parallel, no UDF, no shuffle (a per-row flatMap in the
    scan stage). The last window is the truncated tail unless a full window
    already covers the end (no empty or duplicate-tail chunks)."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # starts: 1, 1+stride, … while start <= n - begin only when more tokens
    # remain past the previous window; greatest(…,1) keeps ≥1 chunk per doc
    n_chunks = F.greatest(F.ceil((n - F.lit(window)) / F.lit(stride)) + 1, F.lit(1)).cast("int")
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride + 1)
    base = df.select(F.col(id_col), toks.alias("__toks"), n.alias("__n"), starts.alias("__starts"))
    exploded = base.select(
        id_col, "__toks", "__n", F.posexplode("__starts").alias("chunk_idx", "chunk_start")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.array_join(F.slice("__toks", F.col("chunk_start"), window), " ").alias("chunk_text"),
        F.least(F.col("__n") - F.col("chunk_start") + 1, F.lit(window))
        .cast("long")
        .alias("n_chunk_tokens"),
    )
