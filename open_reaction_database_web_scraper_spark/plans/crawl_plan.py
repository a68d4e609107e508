"""Crawl-plan configuration → DataFrame pipeline (SURVEY.md §3.1).

The reference's interactive configurator (get_user_input,
web_scrpaer_2.py:291-334) produces a plan-config dict with five
modes; main() dispatches it into enumerate/slice behavior
(web_scrpaer_2.py:509-527, scrape_all_datasets_parallel :470-507).
This module is that surface minus the CLI: ``CrawlPlan`` is the
validated config, ``apply_plan`` compiles it onto a reactions
DataFrame as filters + windowed ordinal slices that Catalyst folds
into the scan.

Semantics preserved from the reference:

- indices are 1-based and END-INCLUSIVE (``start-1`` slice lower
  bound, ``end`` as the exclusive python-slice bound over 1-based
  positions — web_scrpaer_2.py:283-286, 425-430);
- out-of-range bounds clamp, they never error (:427-428);
- ``custom_ranges`` slices only the datasets it names; every other
  dataset flows through whole (:489-494);
- ``single_target`` is dataset ordinal == reaction ordinal == target
  with one worker (:527).

Parallelism mapping: the reference's ``max_workers`` thread pool
(:485) does not become a ``repartition`` — Spark's task scheduler is
the pool, and partition count (spark.sql.shuffle.partitions /
maxPartitionBytes) is the concurrency knob. The field is carried for
plan fidelity and ignored by execution on purpose.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MODES = ("all", "specific_datasets", "uniform_range", "custom_ranges",
         "single_target")


@dataclass(frozen=True)
class CrawlPlan:
    mode: str = "all"
    max_workers: int = 3
    dataset_start: int | None = None
    dataset_end: int | None = None
    reaction_start: int | None = None
    reaction_end: int | None = None
    dataset_ids: tuple[str, ...] = ()
    dataset_ranges: dict[str, tuple[int | None, int | None]] = field(
        default_factory=dict)

    def __post_init__(self) -> None:
        if self.mode not in MODES:
            raise ValueError(f"unknown mode {self.mode!r}; one of {MODES}")


def parse_config(config: dict) -> CrawlPlan:
    """The reference's plan-config dict (get_user_input return shape,
    web_scrpaer_2.py:291-334) → validated CrawlPlan. Mode 5's
    dataset_target/reaction_target collapse to equal start/end bounds
    exactly as main() does (:527)."""
    mode = config.get("mode", "all")
    if mode == "single_target":
        d = config["dataset_target"]
        r = config.get("reaction_target", 1)
        return CrawlPlan(mode=mode, max_workers=1,
                         dataset_start=d, dataset_end=d,
                         reaction_start=r, reaction_end=r)
    return CrawlPlan(
        mode=mode,
        max_workers=config.get("max_workers", 3),
        dataset_start=config.get("dataset_start"),
        dataset_end=config.get("dataset_end"),
        reaction_start=config.get("reaction_start"),
        reaction_end=config.get("reaction_end"),
        dataset_ids=tuple(config.get("dataset_ids", ())),
        dataset_ranges=dict(config.get("dataset_ranges", {})))


def _dataset_ordinal(reactions: DataFrame) -> DataFrame:
    """1-based dataset ordinal by ascending dataset_id — the engine's
    deterministic analog of the reference's crawl/listing order
    (which the engine must replace with an explicit order,
    SURVEY.md §2.6)."""
    ids = (reactions.select("dataset_id").distinct()
           .withColumn("dataset_ord",
                       F.row_number().over(Window.orderBy("dataset_id"))))
    return reactions.join(F.broadcast(ids), "dataset_id")


def _reaction_ordinal(df: DataFrame) -> DataFrame:
    """1-based reaction ordinal within each dataset, by ingestion
    position (reaction_pos) — the reference's listing order within a
    dataset (web_scrpaer_2.py:445).

    The bronze grain keeps EMPTY datasets as a single
    reaction_pos=NULL row (posexplode_outer); that placeholder must
    get a NULL ordinal, not row_number 1 — otherwise any reaction
    slice covering ordinal 1 emits a phantom reaction for every
    empty dataset (the reference's loop body simply never runs
    there)."""
    w = Window.partitionBy("dataset_id").orderBy("reaction_pos")
    return df.withColumn(
        "reaction_ord",
        F.when(F.col("reaction_pos").isNotNull(),
               F.row_number().over(w)))


def _between(ord_col: str, start: int | None, end: int | None) -> F.Column:
    """1-based inclusive range with the reference's clamping: None →
    unbounded, start < 1 → 1 (web_scrpaer_2.py:427-428)."""
    cond = F.lit(True)
    if start is not None:
        cond = cond & (F.col(ord_col) >= max(start, 1))
    if end is not None:
        cond = cond & (F.col(ord_col) <= end)
    return cond


def apply_plan(reactions: DataFrame, plan: CrawlPlan) -> DataFrame:
    """Compile a CrawlPlan onto a reactions frame (the
    read_ord_documents output grain: one row per reaction with
    dataset_id / reaction_pos). Returns the sliced frame with the
    ordinal columns attached (dataset_ord, reaction_ord)."""
    df = _reaction_ordinal(_dataset_ordinal(reactions))

    if plan.mode == "specific_datasets":
        return df.filter(F.col("dataset_id").isin(list(plan.dataset_ids)))

    if plan.mode == "custom_ranges":
        if not plan.dataset_ranges:
            return df
        ranges = df.sparkSession.createDataFrame(
            [(k, s, e) for k, (s, e) in plan.dataset_ranges.items()],
            "dataset_id string, r_start int, r_end int")
        out = df.join(F.broadcast(ranges), "dataset_id", "left")
        keep = (
            F.col("r_start").isNull() & F.col("r_end").isNull()
        ) | (
            (F.col("reaction_ord") >=
             F.greatest(F.coalesce("r_start", F.lit(1)), F.lit(1)))
            & (F.col("reaction_ord") <=
               F.coalesce("r_end", F.lit(2 ** 31 - 1)))
        )
        return out.filter(keep).drop("r_start", "r_end")

    # all / uniform_range / single_target: dataset slice + optional
    # uniform reaction slice.
    df = df.filter(_between("dataset_ord", plan.dataset_start,
                            plan.dataset_end))
    if plan.reaction_start is not None or plan.reaction_end is not None:
        df = df.filter(_between("reaction_ord", plan.reaction_start,
                                plan.reaction_end))
    return df
