"""CrawlPlan mode semantics (web_scrpaer_2.py:291-334, 470-527):
1-based inclusive slicing with clamping, per-dataset custom ranges
leaving unnamed datasets whole, and target-mode collapse."""

from __future__ import annotations

import pytest

from open_reaction_database_web_scraper_spark.plans.crawl_plan import (
    CrawlPlan,
    apply_plan,
    parse_config,
)


@pytest.fixture(scope="module")
def reactions(spark):
    rows = [(f"ds{d}", p, f"ord-{d}-{p}", True)
            for d in range(1, 5) for p in range(d + 1)]  # ds1:2 … ds4:5 rx
    return spark.createDataFrame(
        rows, "dataset_id string, reaction_pos int, reaction_id string, "
              "success boolean")


def _got(df):
    return sorted((r.dataset_id, r.reaction_id)
                  for r in df.select("dataset_id", "reaction_id").collect())


def test_mode_all_dataset_slice(spark, reactions):
    plan = parse_config({"mode": "all", "dataset_start": 2,
                         "dataset_end": 3})
    got = _got(apply_plan(reactions, plan))
    assert {d for d, _ in got} == {"ds2", "ds3"}
    assert len(got) == 3 + 4


def test_mode_specific_datasets(spark, reactions):
    plan = parse_config({"mode": "specific_datasets",
                         "dataset_ids": ["ds1", "ds4"]})
    got = _got(apply_plan(reactions, plan))
    assert {d for d, _ in got} == {"ds1", "ds4"}


def test_mode_uniform_range_clamps(spark, reactions):
    # start<1 clamps to 1; end beyond length clamps to length
    plan = parse_config({"mode": "uniform_range",
                         "dataset_start": -5, "dataset_end": 99,
                         "reaction_start": 2, "reaction_end": 99})
    got = _got(apply_plan(reactions, plan))
    # every dataset keeps reactions 2..n (drops exactly one each)
    assert len(got) == (2 - 1) + (3 - 1) + (4 - 1) + (5 - 1)
    assert ("ds1", "ord-1-0") not in got


def test_mode_custom_ranges_leaves_unnamed_whole(spark, reactions):
    plan = parse_config({"mode": "custom_ranges",
                         "dataset_ranges": {"ds3": (2, 3),
                                            "ds4": (None, 2)}})
    got = _got(apply_plan(reactions, plan))
    by_ds = {}
    for d, r in got:
        by_ds.setdefault(d, []).append(r)
    assert len(by_ds["ds1"]) == 2 and len(by_ds["ds2"]) == 3  # untouched
    assert by_ds["ds3"] == ["ord-3-1", "ord-3-2"]             # 2..3
    assert by_ds["ds4"] == ["ord-4-0", "ord-4-1"]             # ..2


def test_mode_single_target(spark, reactions):
    plan = parse_config({"mode": "single_target", "dataset_target": 2,
                         "reaction_target": 3})
    assert plan.max_workers == 1
    got = _got(apply_plan(reactions, plan))
    assert got == [("ds2", "ord-2-2")]


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        CrawlPlan(mode="mode7")


def test_empty_dataset_placeholder_not_sliced_as_reaction_one(spark):
    """The bronze grain keeps empty datasets as one reaction_pos=NULL
    row (posexplode_outer); a reaction slice covering ordinal 1 must
    NOT emit that placeholder as a phantom reaction (the reference's
    per-reaction loop never runs on an empty dataset)."""
    rows = [("dsA", 0, "ord-A-0", True),
            ("dsA", 1, "ord-A-1", True),
            ("dsEmpty", None, None, None)]
    reactions = spark.createDataFrame(
        rows, "dataset_id string, reaction_pos int, reaction_id string, "
              "success boolean")
    plan = CrawlPlan(mode="uniform_range", dataset_start=1,
                     dataset_end=10, reaction_start=1, reaction_end=1)
    got = _got(apply_plan(reactions, plan))
    assert got == [("dsA", "ord-A-0")]
    # whole-dataset mode still carries the empty-dataset record
    plan2 = CrawlPlan(mode="specific_datasets",
                      dataset_ids=("dsA", "dsEmpty"))
    got2 = _got(apply_plan(reactions, plan2))
    assert ("dsEmpty", None) in got2
