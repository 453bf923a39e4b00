"""Incremental view maintenance (IVM) over the manifest's row-level
change feed: keep a keyed SUM/COUNT aggregate current by folding in a
merge's classified change rows — never rescanning the base table.

This is WHY a row-level CDF exists (VERDICT r8 #6's consumer side):
at 100 TB a downstream aggregate cannot re-read the fact per merge,
and the file-level feed only says "these partitions changed — rebuild
your state for them".  With ``merge(cdf=True)`` the feed carries
insert / update_preimage / update_postimage rows, and SUM/COUNT-class
aggregates update algebraically:

    new_agg(key) = old_agg(key) + Σ postimage/insert − Σ preimage

i.e. one aggregation over the CHANGE SET plus one keyed outer join
against the (already aggregate-sized) view — cost bounded by change
volume and view cardinality, not table size.  The same delta algebra
is what materialized-view engines (e.g. the DBSP/differential-dataflow
formulation, or Snowflake/Databricks incremental MVs — the reference's
warehouse would maintain such aggregates server-side) apply; AVG
derives as sum/count downstream, while MIN/MAX are deliberately NOT
offered — deletions make them non-incremental without per-group state.

Exactness discipline: double sums are association-order-dependent, so
a float fold of base + delta could differ from a rebuild at the last
ulp and poison hash comparisons.  Monetary columns therefore fold as
integer MICROS (``floor(x * 1e6)`` — one double multiply + floor,
identical on every engine; the ``label_centroids`` pattern), making
the delta algebra exact and associative."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: CDF change types and their algebraic sign in the delta fold:
#: rows leaving the table (a replaced key's preimage, a DELETE's
#: removed row) subtract; rows entering (insert, update_postimage) add
_SIGN = F.when(F.col("_change_type").isin("update_preimage", "delete"),
               F.lit(-1)).otherwise(F.lit(1))


def micros(col) -> "F.Column":
    """Exact integer-micros projection of a double column (single
    multiply + floor — bit-identical across engines)."""
    return F.floor(F.col(col).cast("double") * F.lit(1000000.0)) \
        .cast("long")


def sum_count_view(rows: DataFrame, keys: list[str],
                   sum_cols: list[str]) -> DataFrame:
    """The maintained view's full-build form: per-key integer-micros
    sums plus a row count.  Used once at view creation — afterwards
    :func:`apply_cdf_delta` keeps it current from change feeds."""
    aggs = [F.sum(micros(c)).alias(f"sum_{c}_micros") for c in sum_cols]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return rows.groupBy(*keys).agg(*aggs)


def apply_cdf_delta(view: DataFrame, cdf: DataFrame, keys: list[str],
                    sum_cols: list[str]) -> DataFrame:
    """Fold one merge's row-level change feed into the maintained
    view: aggregate the change set with ±1 signs (preimages subtract,
    postimages/inserts add), then full-outer join onto the view —
    groups that gained their first row appear, groups whose count
    reaches zero drop.  Cost: O(|changes|) + O(|view|), independent
    of base-table size."""
    signed = cdf.withColumn("__sign", _SIGN)
    d_aggs = [F.sum(micros(c) * F.col("__sign"))
              .alias(f"d_{c}") for c in sum_cols]
    d_aggs.append(F.sum(F.col("__sign")).alias("d_n"))
    delta = signed.groupBy(*keys).agg(*d_aggs)
    z = F.lit(0).cast("long")
    # NULL-SAFE key equality (r9 ADVICE item 4): groupBy puts NULL
    # keys in one group, so the fold join must treat NULL = NULL the
    # same way — a name-list (USING) join's plain equality would
    # leave a NULL-keyed view row and its delta row unmerged (stale
    # row plus delta-only row instead of one folded row)
    v, d = view.alias("__v"), delta.alias("__d")
    cond = None
    for k in keys:
        c = F.col(f"__v.{k}").eqNullSafe(F.col(f"__d.{k}"))
        cond = c if cond is None else (cond & c)
    merged = v.join(d, cond, "full_outer")
    cols = [F.coalesce(F.col(f"__v.{k}"), F.col(f"__d.{k}")).alias(k)
            for k in keys]
    for c in sum_cols:
        cols.append((F.coalesce(F.col(f"sum_{c}_micros"), z)
                     + F.coalesce(F.col(f"d_{c}"), z))
                    .alias(f"sum_{c}_micros"))
    cols.append((F.coalesce(F.col("n_rows"), z)
                 + F.coalesce(F.col("d_n"), z)).alias("n_rows"))
    return merged.select(*cols).where(F.col("n_rows") > 0)
