"""Capture .explain('formatted') for registry queries into
plans/r13/<name>_<tag>.txt — the judge-checkable plan artifacts for the
r13 optimization round.

VERDICT r12 #10: queries whose final plan truncates at a
localCheckpoint (`Scan ExistingRDD`) additionally get PRE-CHECKPOINT
PROBE frames — the internal sub-pipeline rebuilt without pins so the
plan shows the actual operators (FlatMapGroupsInPandas for the GEMM
scorer, xxhash64 in the LSH band table, the count-join verify). Probe
dumps land in plans/r13/<probe>_<tag>.txt.

Usage:
    python scripts/r13_plans.py <tag> q1 q2 ...        # query plans
    python scripts/r13_plans.py <tag> --probes p1 ...  # probe plans
    (no names after --probes = all probes)
"""
import os
import sys

# repo root derived from THIS file so the script runs correctly from a
# git worktree (before-dumps at HEAD import the worktree's code, not
# the working tree's)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (  # noqa: E402
    get_spark,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (  # noqa: E402
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def _probe_lsh_band_table(spark, sf_dir):
    """The minhash kernel under every dedup_minhash_* consumer — shows
    the per-exploded-row xxhash64 (whole-stage codegen, r12)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        lsh_band_table,
    )

    return lsh_band_table(load_table(spark, sf_dir, "documents"))


def _probe_gemm_scorer(spark, sf_dir):
    """dedup_semantic_embedding's pair scorer input — shows
    FlatMapGroupsInPandas over exactly (vid, cell, q, n2) (r12 GEMM)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        _cell_pair_edges_gemm,
        semantic_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").alias("v")
    )
    return _cell_pair_edges_gemm(semantic_index(emb), 900)


def _probe_minhash_verify(spark, sf_dir):
    """The exact-Jaccard verify stage of the minhash pipeline (r13
    count-join form) on a synthetic un-pinned candidate frame — shows
    the two hash joins + count aggregate replacing the interpreted
    array_intersect/array_union projection."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        ngram_jaccard,
    )

    docs = load_table(spark, sf_dir, "documents")
    cands = docs.select(F.col("doc_id").alias("doc_a")).withColumn(
        "doc_b", F.col("doc_a") + 1
    )
    return ngram_jaccard(docs, cands)


PROBES = {
    "probe_lsh_band_table": _probe_lsh_band_table,
    "probe_gemm_scorer": _probe_gemm_scorer,
    "probe_minhash_verify": _probe_minhash_verify,
}


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(
        app_name="r13-plans",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if names and names[0] == "--probes":
        todo = {n: PROBES[n] for n in (names[1:] or PROBES)}
        builders = todo.items()
    else:
        builders = ((n, None) for n in names)
    for name, builder in builders:
        try:
            if builder is None:
                fn, _ = REGISTRY[name]
                df = fn(spark, SF_DIR)
            else:
                df = builder(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR building plan: {exc}"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
