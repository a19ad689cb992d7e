"""Streaming data-drift monitoring: per-micro-batch PSI via
foreachBatch — the ingest-time alarm that pairs with the batch
`psi_drift` registry query (same 0.5-Laplace-smoothed formula, same
fixed-width binning).

Two monitors share the same per-batch reduction:

- ``start_psi_monitor``: PSI against a STATIC baseline histogram —
  "is the data arriving right now distributed like what the model
  trained on".
- ``start_adaptive_psi_monitor`` (round 12): PSI against a SLOWLY
  DECAYING baseline — after each batch the baseline bin counts are
  multiplied by ``decay`` and the batch's histogram is added, so the
  baseline tracks a permanent regime change (its PSI decays back
  toward 0 over subsequent batches) while a transient drift spike
  still fires. Closed form after batches 0..k-1 with initial
  histogram H and per-batch histograms B_i:

      baseline_k(bin) = decay^k * H(bin)
                        + sum_i decay^(k-1-i) * B_i(bin)

  which the batch-twin test reproduces exactly. State is O(bins) —
  one bounded (bin, weight) table pinned on the driver's session,
  re-pinned per batch; nothing about the stream is buffered.

Each micro-batch is reduced to a bin histogram (one hash aggregate),
joined full-outer against the baseline histogram (a broadcast — the
baseline is a bounded bin table, not the baseline DATA), and collapsed
to one (batch_id, n_rows, psi) row written to the monitoring sink.
The sink is partitioned by batch_id and written with dynamic partition
overwrite, so a retried micro-batch replaces its own row instead of
appending a duplicate (foreachBatch offers at-least-once delivery;
idempotent-by-batch_id is the documented upgrade path). The adaptive
monitor's decay state is in-memory per run: a restart from the
checkpoint replays unprocessed batches against the initial baseline,
and the idempotent sink keeps the output table consistent.
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
    formula — empty-on-one-side bins stay finite). Accepts integer or
    decayed-float baseline counts. n_rows/psi coalesce to 0/0.0 when
    both histograms are empty (sum over zero rows is NULL otherwise —
    an empty micro-batch must not write a null record)."""
    b = batch_bins.select(F.col("bin"), F.col("n").alias("n_new"))
    r = baseline_bins.select(F.col("bin"), F.col("n").alias("n_base"))
    j = (
        b.join(F.broadcast(r), "bin", "full_outer")
        .select(
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
            F.coalesce(F.col("n_base").cast("double"), F.lit(0.0)).alias("n_base"),
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
            F.coalesce(F.sum("n_new"), F.lit(0)).cast("bigint").alias("n_rows"),
            F.coalesce(
                F.round(F.sum((pn - pb) * F.log(pn / pb)), 6), F.lit(0.0)
            ).alias("psi"),
        )
    )


def _write_idempotent(out: DataFrame, batch_id: int, target_path: str) -> None:
    """Write one (batch_id, n_rows, psi) row, replacing any prior row
    for the same batch_id (retried micro-batches must not duplicate)."""
    (
        out.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        .select("batch_id", "n_rows", "psi")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(target_path)
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
    micro-batch, write ONE (batch_id, n_rows, psi) row to
    ``target_path`` (idempotent by batch_id). The baseline histogram is
    computed once from the static ``baseline_events`` and pinned — the
    per-batch work is one aggregate over the batch plus a broadcast
    join against the bounded bin table. Returns the started
    StreamingQuery."""
    baseline = value_bins(baseline_events, bin_width).localCheckpoint(
        eager=True
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = psi_row(value_bins(batch_df, bin_width), baseline)
        _write_idempotent(out, batch_id, target_path)

    writer = stream_events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def decay_fold(
    baseline_bins: DataFrame,
    batch_bins: DataFrame,
    decay: float,
    prune_below: float = 0.0,
) -> DataFrame:
    """One decayed-baseline update: decay·baseline + batch histogram
    over the union of bins (full-outer join of two bounded bin
    tables). With ``prune_below`` > 0, bins whose decayed weight falls
    below the threshold AND received nothing from the batch are
    dropped — without pruning, state is O(distinct bins EVER seen),
    which grows without bound on a stream whose value range drifts
    forever; with it, a bin that stops receiving data is forgotten
    after log(prune_below/weight)/log(decay) batches and state is
    O(bins active in the recent window). Pruning removes only
    negligible mass but does change the PSI's union-of-bins smoothing
    denominator, so the zero-default keeps the closed-form batch-twin
    parity exact."""
    old = baseline_bins.select("bin", F.col("n").alias("n_old"))
    new = batch_bins.select("bin", F.col("n").alias("n_batch"))
    folded = old.join(new, "bin", "full_outer").select(
        "bin",
        (
            F.lit(decay) * F.coalesce(F.col("n_old"), F.lit(0.0))
            + F.coalesce(F.col("n_batch").cast("double"), F.lit(0.0))
        ).alias("n"),
    )
    if prune_below > 0.0:
        folded = folded.filter(F.col("n") >= prune_below)
    return folded


def start_adaptive_psi_monitor(
    stream_events: DataFrame,
    baseline_events: DataFrame,
    target_path: str,
    checkpoint_path: str,
    bin_width: float = 50.0,
    decay: float = 0.9,
    prune_below: float = 0.0,
    available_now: bool = True,
):
    """PSI monitor with a slowly-updating baseline: each micro-batch is
    scored against the CURRENT baseline, then folded into it —

        baseline <- decay * baseline + batch_histogram

    so a one-off drifted batch spikes and washes out, while a regime
    change spikes once and then decays toward 0 as the new regime
    becomes the baseline (geometric at rate ``decay``). The update is
    one full-outer join of two bounded bin tables, eagerly pinned
    (flat plan across batches — the iterative-state discipline); the
    batch histogram is pinned lazily because it has two consumers
    (the PSI row and the fold). Returns the started StreamingQuery."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    state = {
        "baseline": value_bins(baseline_events, bin_width)
        .select("bin", F.col("n").cast("double").alias("n"))
        .localCheckpoint(eager=True)
    }

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bins = value_bins(batch_df, bin_width).localCheckpoint(eager=False)
        out = psi_row(bins, state["baseline"])
        _write_idempotent(out, batch_id, target_path)
        state["baseline"] = decay_fold(
            state["baseline"], bins, decay, prune_below
        ).localCheckpoint(eager=True)

    writer = stream_events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
