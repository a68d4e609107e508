"""Property tests (SURVEY.md §5): formatter invariants under
adversarial inputs — missing keys, unknown enum codes, multiple
oneof branches populated, empty/absent arrays.

Each hypothesis example is a raw-payload dict batch; one Spark job
per example keeps runtime sane (examples are small, jobs are wide).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.functions.enums import (
    IDENTIFIER_TYPES,
    REACTION_ROLES,
)
from open_reaction_database_web_scraper_spark.sources import ord as ord_src

_SETTINGS = settings(max_examples=25, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])

code = st.integers(min_value=-3, max_value=15)  # beyond every enum's domain
value = st.floats(min_value=0, max_value=1e6,
                  allow_nan=False, allow_infinity=False)

unit_amount = st.fixed_dictionaries({"value": value, "units": code})

# Oneof stress: any subset of branches may be present in the raw dict.
amount = st.dictionaries(
    st.sampled_from(["moles", "volume", "mass"]), unit_amount, max_size=3)

identifier = st.fixed_dictionaries({"type": code, "value": st.text(
    alphabet="CcOoNn123()=#@+-", max_size=20)})

component = st.builds(
    lambda ids, amt, role: {
        "identifiersList": ids, **({"amount": amt} if amt else {}),
        "reactionRole": role},
    st.lists(identifier, max_size=3), amount, code)

raw_reaction = st.builds(
    lambda rid, tabs: {
        "reactionId": f"ord-{rid:08x}",
        "inputsMap": [[name, comps] for name, comps in tabs],
    },
    st.integers(min_value=0, max_value=2**32 - 1),
    st.lists(st.tuples(
        st.text(alphabet="abcxyz_ ", min_size=1, max_size=8),
        st.builds(lambda cs: {"componentsList": cs},
                  st.lists(component, max_size=3))),
        max_size=3, unique_by=lambda t: t[0]))


def _format(spark, reactions: list[dict]):
    rows = [(json.dumps({
        **r, "inputsMap": [[k, json.dumps(v)] for k, v in r["inputsMap"]],
    }), True) for r in reactions]
    scraped = spark.createDataFrame(rows, "data string, success boolean")
    return ord_src.format_reactions(scraped)


@_SETTINGS
@given(st.lists(raw_reaction, min_size=1, max_size=8))
def test_oneof_amount_invariant(spark, reactions):
    """After normalization, at most one amount branch is non-null,
    and the populated branch follows the reference's if/elif priority
    moles > volume > mass (web_scrpaer_2.py:126-145)."""
    comps = (_format(spark, reactions)
             .select(F.explode("inputs").alias("tab", "inp"))
             .select(F.explode("inp.components").alias("c"))
             .select("c.amount.*").collect())
    raw_amounts = [c.get("amount", {})
                   for r in reactions for _, inp in r["inputsMap"]
                   for c in inp["componentsList"]]
    assert len(comps) == len(raw_amounts)  # same multiplicity
    for row in comps:
        present = [k for k in ("moles", "volume", "mass")
                   if row[k] is not None]
        assert len(present) <= 1
    got = sorted((row["moles"] is not None, row["volume"] is not None,
                  row["mass"] is not None) for row in comps)
    want = sorted((
        "moles" in a, "moles" not in a and "volume" in a,
        "moles" not in a and "volume" not in a and "mass" in a)
        for a in raw_amounts)
    assert got == want


@_SETTINGS
@given(st.lists(raw_reaction, min_size=1, max_size=8))
def test_enum_decode_total(spark, reactions):
    """Every enum decode yields a non-null string; codes outside the
    mapping decode to 'UNKNOWN' (the reference's .get(x, 'UNKNOWN'),
    web_scrpaer_2.py:108,148)."""
    comps = (_format(spark, reactions)
             .select(F.explode("inputs").alias("tab", "inp"))
             .select(F.explode("inp.components").alias("c"))
             .select(F.col("c.reaction_role").alias("role"),
                     F.col("c.identifiers").alias("ids")).collect())
    valid_roles = set(REACTION_ROLES.values()) | {"UNKNOWN"}
    valid_types = set(IDENTIFIER_TYPES.values()) | {"UNKNOWN"}
    for row in comps:
        assert row.role is not None and row.role in valid_roles
        for ident in row.ids:
            assert ident.type is not None and ident.type in valid_types


@_SETTINGS
@given(st.lists(raw_reaction, min_size=1, max_size=8))
def test_formatter_never_throws_one_row_per_input(spark, reactions):
    """PERMISSIVE end to end: one output row per input row, id
    preserved, success defaulted — even for garbage payloads."""
    df = _format(spark, reactions)
    rows = df.collect()
    assert len(rows) == len(reactions)
    assert {r.reaction_id for r in rows} == \
        {r["reactionId"] for r in reactions}
    # corrupt payloads: nulls flow through, never exceptions
    bad = spark.createDataFrame(
        [("{not json", None), (None, True), ("42", False)],
        "data string, success boolean")
    out = ord_src.format_reactions(bad).collect()
    assert len(out) == 3
    assert [r.success for r in out] == [True, True, False]


@_SETTINGS
@given(st.lists(raw_reaction, min_size=1, max_size=6))
def test_renest_explode_identity(spark, reactions):
    """renest ∘ (ingest-shaped rows) keeps every successful reaction
    exactly once, in ordinal order, per dataset."""
    formatted = _format(spark, reactions).withColumn(
        "dataset_id", F.lit("ds-prop")).withColumn(
        "reaction_pos", F.monotonically_increasing_id())
    nested = ord_src.renest_documents(formatted).collect()
    assert len(nested) == 1
    rec = nested[0]
    assert rec.total_reactions_scraped == len(reactions)
    assert [r.reaction_id for r in rec.reactions] == \
        [r["reactionId"] for r in reactions]


# --- salted-join equivalence under arbitrary key skew -------------

_key_lists = st.lists(
    st.integers(min_value=0, max_value=20), min_size=1, max_size=300)


@given(fact_keys=_key_lists, dim_keys=_key_lists)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_salted_join_equals_plain_join(spark, fact_keys, dim_keys):
    """salted_equi_join must equal the plain inner join row-for-row
    on ANY key multiset — arbitrary skew, duplicate dim keys,
    disjoint keys, single-key degenerate inputs."""
    from collections import Counter

    from open_reaction_database_web_scraper_spark.operators.joins import (
        salted_equi_join,
    )

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "fk bigint, row_id bigint")
    dim = spark.createDataFrame(
        [(k, i) for i, k in enumerate(dim_keys)], "dk bigint, dim_id bigint")
    salted = salted_equi_join(fact, dim, "fk", "dk",
                              salt_cols=["fk", "row_id"])
    got = Counter((r.row_id, r.dim_id) for r in salted.collect())
    want = Counter((r.row_id, r.dim_id)
                   for r in fact.join(dim, fact.fk == dim.dk).collect())
    assert got == want
