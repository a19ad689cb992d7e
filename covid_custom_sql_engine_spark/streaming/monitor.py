"""Streaming data-drift monitoring: per-micro-batch PSI against a
static baseline via foreachBatch — the ingest-time alarm that pairs
with the batch `psi_drift` registry query (same 0.5-Laplace-smoothed
formula, same fixed-width binning).

The monitor answers "is the data arriving RIGHT NOW distributed like
what the model trained on" without waiting for a nightly batch job:
each micro-batch is reduced to a bin histogram (one hash aggregate),
joined full-outer against the precomputed baseline histogram (a
broadcast — the baseline is a bounded bin table, not the baseline
DATA), and collapsed to one (batch_id, n_rows, psi) row appended to
the monitoring sink. State is O(bins); nothing about the stream is
buffered across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def value_bins(events: DataFrame, bin_width: float = 50.0) -> DataFrame:
    """Fixed-width histogram of the `value` column: (bin, n) with
    NULLs dropped — shared by the baseline build and the per-batch
    reduction so both sides bin identically."""
    return (
        events.filter(F.col("value").isNotNull())
        .select(F.floor(F.col("value") / F.lit(bin_width)).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def psi_row(batch_bins: DataFrame, baseline_bins: DataFrame) -> DataFrame:
    """One-row PSI of a batch histogram against the baseline histogram
    (0.5-Laplace smoothing over the union of bins, the psi_drift
    formula — empty-on-one-side bins stay finite)."""
    b = batch_bins.select(F.col("bin"), F.col("n").alias("n_new"))
    r = baseline_bins.select(F.col("bin"), F.col("n").alias("n_base"))
    j = (
        b.join(F.broadcast(r), "bin", "full_outer")
        .select(
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
            F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base"),
        )
        .localCheckpoint(eager=False)  # totals + contribution pass
    )
    t = F.broadcast(
        j.agg(
            F.sum("n_new").alias("tn"),
            F.sum("n_base").alias("tb"),
            F.count(F.lit(1)).alias("nb"),
        )
    )
    half = F.lit(0.5)
    pn = (F.col("n_new") + half) / (F.col("tn") + half * F.col("nb"))
    pb = (F.col("n_base") + half) / (F.col("tb") + half * F.col("nb"))
    return (
        j.crossJoin(t)
        .agg(
            F.sum("n_new").cast("bigint").alias("n_rows"),
            F.round(
                F.sum((pn - pb) * F.log(pn / pb)), 6
            ).alias("psi"),
        )
    )


def start_psi_monitor(
    stream_events: DataFrame,
    baseline_events: DataFrame,
    target_path: str,
    checkpoint_path: str,
    bin_width: float = 50.0,
    available_now: bool = True,
):
    """Attach the PSI monitor to a streaming events frame: per
    micro-batch, append ONE (batch_id, n_rows, psi) row to
    ``target_path``. The baseline histogram is computed once from the
    static ``baseline_events`` and pinned — the per-batch work is one
    aggregate over the batch plus a broadcast join against the bounded
    bin table. Returns the started StreamingQuery."""
    baseline = value_bins(baseline_events, bin_width).localCheckpoint(
        eager=True
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = psi_row(value_bins(batch_df, bin_width), baseline).select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "n_rows",
            "psi",
        )
        out.write.mode("append").parquet(target_path)

    writer = stream_events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
