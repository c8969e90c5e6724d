"""Training-sequence preparation: document chunking and sequence packing.

The last mile of a pretraining pipeline: long documents split into
overlapping chunks, then (short) documents packed densely into fixed-length
training sequences ("concat-and-chop").

Scale design — the packing offset is a GLOBAL running sum of token counts
in doc_id order, and the naive formulation (a window ordered by doc_id
with no partition key) plans a single-task WholeWindow that serializes the
corpus through one reducer.  ``pack_sequences`` instead computes a
TWO-LEVEL prefix sum: per-group running sums (window partitioned by a
doc_id range group) plus a broadcast prefix of group totals — every stage
stays parallel, the only global object is one tiny row per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_fns import words


def chunk_documents(
    docs: DataFrame,
    chunk_words: int = 4,
    stride: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping word-window chunks: starts 0, stride, 2*stride, ...
    while start < n_words (so a trailing short chunk is kept; every word
    lands in at least one chunk when stride <= chunk_words).

    Pure generator-explode + slice — no shuffle, embarrassingly parallel.
    Output: (doc_id, chunk_id, chunk_text, n_chunk_words)."""
    if stride < 1 or chunk_words < 1:
        raise ValueError("chunk_words and stride must be >= 1")
    ws = words(F.col(text_col))
    base = docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("n"))
    n_chunks = F.floor((F.col("n") - 1) / F.lit(stride)) + 1  # ceil(n / stride)
    # empty docs emit ZERO chunks: sequence(0, -1) would yield a DESCENDING
    # [0, -1] array (two spurious chunks, one with a negative id)
    chunk_ids = F.when(
        F.col("n") >= 1, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select(
        "doc_id", "ws", F.explode(chunk_ids).alias("chunk_id")
    )
    chunk = F.slice(
        F.col("ws"), F.col("chunk_id") * stride + 1, chunk_words
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_chunk_words"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 64,
    group_width: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chop packing plan: documents concatenate in doc_id order
    into an infinite token tape chopped every ``seq_len`` tokens; each doc
    gets its tape position (pack_id, pack_offset).

    Two-level prefix sum (see module docstring): group = doc_id //
    group_width; within-group running sum is a partitioned window; group
    PREFIX totals are a tiny aggregate joined back by broadcast.  Output:
    (doc_id, n_tokens, pack_id, pack_offset, spans_boundary)."""
    n_tokens = F.size(words(F.col(text_col))).cast("long")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") / group_width).cast("long").alias("grp"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    totals = base.groupBy("grp").agg(F.sum("n_tokens").alias("grp_total"))
    wg = (
        Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    )  # tiny: one row per group — the ONLY global window, bounded input
    prefix = totals.withColumn(
        "grp_before", F.coalesce(F.sum("grp_total").over(wg), F.lit(0))
    ).select("grp", "grp_before")
    cum_before = F.col("grp_before") + F.col("local_before")
    return (
        within.join(F.broadcast(prefix), "grp")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(cum_before / seq_len).cast("long").alias("pack_id"),
            F.pmod(cum_before, F.lit(seq_len)).cast("int").alias("pack_offset"),
            # a zero-token doc cannot span anything, even when its position
            # lands exactly on a pack boundary
            (
                (F.col("n_tokens") > 0)
                & (
                    F.floor(cum_before / seq_len)
                    != F.floor((cum_before + F.col("n_tokens") - 1) / seq_len)
                )
            ).alias("spans_boundary"),
        )
    )
