"""Collapse turns into one entity record per conversation (SURVEY W5).

The reference consumes one raw string per record (entity_col,
/root/reference/entity_resolver/resolver.py:200); our input is the
transcript turn table, so the collapse — window-ordered concatenation
under stable (conv_id, turn_idx) ordering — is the ingestion operator.

Invariant (BASELINE input_hint): per-turn text equality under stable
ordering. The collapse is a pure reorder+concat — `doc` is built from
the UNMODIFIED text of turns sorted by turn_idx; all normalization
happens later on a derived column only (exactly as the reference keeps
the raw entity column untouched and derives normalized_text,
normalizer.py:248,396). `turns` (array of structs) is carried through
so the invariant is checkable by exploding the output.

Scale notes: one shuffle on conv_id with map-side partial aggregation
(ObjectHashAggregate for collect_list). Turn counts per conversation
are small and bounded, so no skew handling is needed here; the heavy
keys at 100TB are downstream blocking keys, handled in blocking.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# \x1e = ASCII record separator: the repo's one reserved character.
# Normalization folds all C0 controls to space (normalize.py), so it
# can never occur in normalized/canonical text — validate.py uses it
# as the collision-free Q2 repair separator.
TURN_SEP = "\x1e"


def collapse_turns(turns: DataFrame, turn_sep: str = " ") -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) -> one row per conv.

    Output columns:
      conv_id, doc (ordered concat of raw turn text), n_turns,
      roles (sorted distinct), tools (sorted distinct, '' removed),
      ts_min, ts_max, turns (array<struct<turn_idx,role,text,tool,ts>>
      sorted by turn_idx — the integrity carrier).
    """
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
    )
    return (
        turns.groupBy("conv_id")
        .agg(
            ordered.alias("turns"),
            F.count("*").alias("n_turns"),
            F.array_sort(F.collect_set("role")).alias("roles"),
            F.array_sort(
                F.collect_set(F.when(F.col("tool") != "", F.col("tool")))
            ).alias("tools"),
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
        )
        .withColumn(
            "doc",
            F.array_join(F.transform(F.col("turns"), lambda t: t["text"]), turn_sep),
        )
    )


def completeness_expr(
    doc=None, roles=None, tools=None, ts_min=None, ts_max=None
):
    """P10 analog: weighted metadata-presence score in [0,1].

    The reference scores address completeness with street_name
    weighted 2 and the other components 1, zip gated on a validity
    pattern (utils/address.py:38-44,340-380). The transcript analog:
    document text present (weight 2 — the primary matching signal),
    more than one role (1), any tool recorded (1), a valid non-zero
    time range (1); normalized by the total weight 5. Pure SQL, so the
    driver's DuckDB oracle checks it value-for-value."""
    doc = F.col("doc") if doc is None else doc
    roles = F.col("roles") if roles is None else roles
    tools = F.col("tools") if tools is None else tools
    ts_min = F.col("ts_min") if ts_min is None else ts_min
    ts_max = F.col("ts_max") if ts_max is None else ts_max
    score = (
        F.when(F.length(F.trim(doc)) > 0, 2).otherwise(0)
        + F.when(F.size(roles) > 1, 1).otherwise(0)
        + F.when(F.size(tools) > 0, 1).otherwise(0)
        + F.when(ts_max > ts_min, 1).otherwise(0)
    )
    return score.cast("double") / 5.0


def explode_back(collapsed: DataFrame) -> DataFrame:
    """Inverse of collapse for the integrity check: back to one row per
    turn with the original columns (used by tests and the lineage gate)."""
    return collapsed.select(
        "conv_id", F.posexplode("turns").alias("pos", "t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )


def integrity_violations(turns: DataFrame, collapsed: DataFrame) -> DataFrame:
    """Rows of the source turn table NOT reproduced exactly by exploding
    the collapsed records (must be empty — input_hint invariant)."""
    back = explode_back(collapsed).select("conv_id", "turn_idx", "text")
    src = turns.select("conv_id", "turn_idx", "text")
    return src.exceptAll(back).unionAll(back.exceptAll(src))
