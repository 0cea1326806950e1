"""Sequence packing: fit tokenized documents into fixed-size context
windows — the training-data serialization step between dedup/filtering
and the tokenizer shards. Two disciplines exist in the repo:

- `plans/queries.pack_shards_token_budget`: cumulative-sum CHUNKING —
  documents may straddle shard boundaries (the concat-then-chunk
  recipe). Purely windowed SQL, zero waste.
- THIS module: NO-STRADDLE packing — every document lands whole inside
  exactly one window of `budget` tokens (next-fit on a pinned order),
  trading waste (the tail of each window) for intact documents — the
  recipe used when examples must not cross attention boundaries.

Next-fit is sequential by nature (window state resets when a doc
doesn't fit), so the corpus-scale form shards first: documents are
hash-sharded, packing runs independently per shard inside ONE
`applyInPandas` pass (Arrow-batched, vectorized pandas inside), and
parallelism comes from shard count — the exact structure a 1000-
executor cluster wants, since packing quality is shard-local anyway.
State per task is one (acc, window) pair; memory is the shard's rows.

No reference counterpart (the reference is three linear streaming
scripts, SURVEY.md §2); build-brief "operators a large-scale
training-data pipeline would need" family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of sequence_pack_nextfit
_PACK_SCHEMA = (
    "shard bigint, doc_id bigint, n_tokens bigint, elen bigint, "
    "window_id bigint, off bigint"
)


def sequence_pack_nextfit(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack whole documents into fixed `budget`-token windows, next-fit
    in pinned `id_col` order within each of `n_shards` hash shards.

    Per document: (shard, doc_id, n_tokens, elen, window_id, off) —
    `elen` = min(n_tokens, budget) is the PLACED length (a document
    longer than the budget is truncated to fill a window alone rather
    than silently overflow it), `off` is the token offset of the
    document inside its window. Invariants (pytest-pinned):
    every input doc appears exactly once; per (shard, window_id)
    Σ elen ≤ budget; offsets tile [0, Σ elen) without overlap.

    Deterministic: shard = doc_id % n_shards, order = doc_id — both
    columns, so the packing is a pure function of the input and the
    DuckDB oracle replays it with a recursive CTE stepping rn→rn+1
    per shard (plans/simjoin._sequence_pack_oracle)."""
    counted = docs.select(
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    ).withColumn(
        "elen", F.least(F.col("n_tokens"), F.lit(budget).cast("bigint"))
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        wins, offs = [], []
        win, acc = 1, 0
        for elen in pdf["elen"]:
            if acc + elen > budget:
                win += 1
                acc = 0
            wins.append(win)
            offs.append(acc)
            acc += elen
        out = pdf[["shard", "doc_id", "n_tokens", "elen"]].copy()
        out["window_id"] = pd.Series(wins, dtype="int64")
        out["off"] = pd.Series(offs, dtype="int64")
        return out

    return counted.groupBy("shard").applyInPandas(_pack, _PACK_SCHEMA)


def packing_fill_report(packed: DataFrame, budget: int = 256) -> DataFrame:
    """Per-window fill accounting over sequence_pack_nextfit output:
    (shard, window_id, n_docs, used, waste, fill_milli) — the exact
    efficiency metric a packing sweep optimizes (waste = budget − used;
    fill in exact integer milli-units, no float division)."""
    return (
        packed.groupBy("shard", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("elen").alias("used"),
        )
        .select(
            "shard",
            "window_id",
            "n_docs",
            "used",
            (F.lit(budget) - F.col("used")).cast("bigint").alias("waste"),
            F.expr(f"CAST((used * 1000) div {budget} AS BIGINT)").alias(
                "fill_milli"
            ),
        )
    )
