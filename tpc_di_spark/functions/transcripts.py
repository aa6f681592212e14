"""Transcript-shaped exports: turn-ordered conversation assembly.

The canonical serving operation of a transcripts lake (input_hint's
(conv_id, turn_idx, role, text, ts) shape): reassemble each
conversation's live turns, in stable turn order, into ONE training
document — the "export to pretraining corpus" step downstream tokenizers
consume. The north rule's correctness invariant ("per-turn text equality
under stable (conv_id, turn_idx) ordering") is exactly what this
operator's output makes observable in one string per conversation.

Scale shape: one hash shuffle on conv_id, then per-key assembly entirely
JVM-side (``collect_list`` → ``array_sort`` → ``transform`` →
``array_join`` — no Python, no UDF). A conversation must land on one
reducer by definition of the output; that is safe because conversation
LENGTH is bounded (10^2-10^4 turns) even when conversation COUNT is
10^8 — the skew story is many conversations per partition, which hash
partitioning already balances. This is the one grouping in the engine
where salting would be WRONG (a salted group cannot emit one ordered
document without a second shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def assemble_conversations(
    df: DataFrame,
    sep: str = "\n",
    template: str = "<%s> %s",
) -> DataFrame:
    """(conv_id, turn_idx, role, text, ...) → one row per conversation:

    - ``document``: turns sorted by turn_idx, each rendered as
      ``template % (role, text)``, joined by ``sep``;
    - ``n_turns``: live turn count;
    - ``n_chars``: document length (corpus sizing / budget cuts).

    NULL text renders as the empty string (a deleted-payload turn keeps
    its slot in the document rather than silently reordering neighbors).
    """
    turn = F.struct(
        F.col("turn_idx").alias("i"),
        F.col("role").alias("r"),
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
    )
    turns = F.array_sort(F.collect_list(turn))  # struct sort: turn_idx first
    return (
        df.groupBy("conv_id")
        .agg(turns.alias("_turns"))
        .select(
            "conv_id",
            F.array_join(
                F.transform(
                    "_turns", lambda s: F.format_string(template, s.r, s.t)
                ),
                sep,
            ).alias("document"),
            F.size("_turns").alias("n_turns"),
        )
        .withColumn("n_chars", F.length("document"))
    )
