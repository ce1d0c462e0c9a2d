"""Dedup self-join plan discipline (r15, verdict #1): the r14
shuffle-hash hints claimed the banded/shingled signature subtree is
built ONCE and reused on the second join side — but the static plan
prints the subtree under both inputs, so the claim is only visible in
the EXECUTED (AQE final) plan as a ``ReusedExchange`` node. This test
pins that runtime behavior so a Spark upgrade or hint regression that
silently starts building the signature subtree twice fails loudly.
"""

from __future__ import annotations

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators import dedup
from algorithmic_data_ingestion_for_cryptocurrencies_spark.plans.inspect import explain_str


def _final_plan(df) -> str:
    """Executed-plan text, truncated to the AQE Final Plan section."""
    df.collect()
    plan = explain_str(df, "formatted")
    return plan.split("== Initial Plan ==")[0]


def test_minhash_self_join_reuses_exchange_at_runtime(spark):
    docs = spark.createDataFrame(
        [
            (i, f"the quick brown fox {i % 7} jumps over {i % 5} lazy dogs and "
                f"then runs far away {i % 3}")
            for i in range(80)
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_dedup_pairs(
        docs, id_col="doc_id", text_col="text", num_hashes=8, bands=4,
        threshold=0.5,
    )
    final = _final_plan(pairs)
    assert "ShuffledHashJoin" in final, final
    assert "ReusedExchange" in final, (
        "banded-signature exchange was NOT reused at runtime — the "
        "signature subtree is being built twice:\n" + final
    )


def test_jaccard_self_join_reuses_exchange_at_runtime(spark):
    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma {i % 6} delta epsilon {i % 4} zeta eta "
                f"theta iota kappa {i % 3}")
            for i in range(80)
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.jaccard_similar_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.5
    )
    final = _final_plan(pairs)
    assert "ShuffledHashJoin" in final, final
    assert "ReusedExchange" in final, final
