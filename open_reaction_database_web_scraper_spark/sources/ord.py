"""ORD reaction-document ingestion, normalization and re-nesting.

This is the reference's semantic core rebuilt Spark-first:

* ``read_ord_documents`` ingests the nested per-dataset JSON document
  store the reference emits (web_scrpaer_2.py:530-548) into one row
  per reaction.
* ``format_reactions`` is the formatter (format_reaction_data,
  web_scrpaer_2.py:82-192) as a single declarative column
  expression: enum decode, oneof-amount normalization,
  outcomesList×productsList flattening — no Python in the plan.
* ``components_flat`` / ``outcomes_flat`` / ``dataset_rollup`` are
  the silver tables (FIXTURES.md A.3).
* ``renest_documents`` rebuilds the per-dataset nested shape
  (agg_collect_list semantics, web_scrpaer_2.py:541-543).

The raw ``inputsMap`` is a protobuf-map-as-entry-list whose entries
are *heterogeneous* JSON pairs ``[tab_name, input_object]``; Spark's
JSON reader can't type that directly, so the bronze pass reads each
pair as ``array<string>`` (the parser stringifies the object) and a
second ``from_json`` inside a ``transform`` lambda parses the
payload half — the two-pass parse stays entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.enums import (
    IDENTIFIER_TYPES,
    MASS_UNITS,
    MOLES_UNITS,
    REACTION_ROLES,
    VOLUME_UNITS,
    decode_enum,
)

# ---------------------------------------------------------------------------
# Schemas (DDL strings; SURVEY.md §1.3 canonical shape)

UNIT_F = "struct<value: double, units: string>"
AMOUNT_F = (f"struct<moles: {UNIT_F}, volume: {UNIT_F}, mass: {UNIT_F}>")
IDENT_F = "struct<type: string, value: string>"
MEAS_F = f"struct<type: int, details: string, mass: {UNIT_F}>"
COMPONENT_F = (f"struct<identifiers: array<{IDENT_F}>, amount: {AMOUNT_F}, "
               "reaction_role: string>")
INPUT_F = f"struct<components: array<{COMPONENT_F}>>"
OUTCOME_F = (f"struct<identifiers: array<{IDENT_F}>, reaction_role: string, "
             f"is_desired_product: boolean, measurements: array<{MEAS_F}>>")

# Golden-file reaction (formatted, enum codes already strings).
GOLDEN_REACTION = ("struct<reaction_id: string, success: boolean, "
                   "inputsMap: array<array<string>>, "
                   f"outcomes: array<{OUTCOME_F}>>")
GOLDEN_DATASET = ("struct<dataset_id: string, total_reactions_scraped: long, "
                  f"reactions: array<{GOLDEN_REACTION}>>")
GOLDEN_DOC = f"map<string, {GOLDEN_DATASET}>"

# Raw scraped reaction payload (pre-formatter; int enum codes,
# protobuf-style *List field names — web_scrpaer_2.py:104-182).
UNIT_R = "struct<value: double, units: int>"
IDENT_R = "struct<type: int, value: string>"
RAW_COMPONENT = (f"struct<identifiersList: array<{IDENT_R}>, "
                 f"amount: struct<moles: {UNIT_R}, volume: {UNIT_R}, "
                 f"mass: {UNIT_R}>, reactionRole: int>")
RAW_INPUT = f"struct<componentsList: array<{RAW_COMPONENT}>>"
RAW_MEAS = (f"struct<type: int, details: string, "
            f"amount: struct<mass: {UNIT_R}>>")
RAW_PRODUCT = (f"struct<identifiersList: array<{IDENT_R}>, "
               f"isDesiredProduct: boolean, "
               f"measurementsList: array<{RAW_MEAS}>>")
RAW_REACTION = ("struct<reactionId: string, "
                "inputsMap: array<array<string>>, "
                f"outcomesList: array<struct<"
                f"productsList: array<{RAW_PRODUCT}>>>>")


# ---------------------------------------------------------------------------
# Bronze: golden document ingestion

def _pairs_to_map(pairs: Column, payload_schema: str) -> Column:
    """[key, json-string] pair array → map<string, parsed struct>."""
    return F.map_from_entries(F.transform(
        pairs,
        lambda p: F.struct(
            p[0].alias("key"),
            F.from_json(p[1], payload_schema).alias("value"))))


def read_ord_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read a formatted ORD document store → one row per reaction.

    Output: dataset_id, total_reactions_scraped, reaction_pos,
    reaction_id, success, inputs map<tab, INPUT_F>, outcomes.
    PERMISSIVE parsing: a malformed file yields a null map (the
    reference's try/except guard, web_scrpaer_2.py:451-456).
    """
    raw = spark.read.text(path, wholetext=True)
    docs = raw.select(F.from_json(
        "value", GOLDEN_DOC, {"mode": "PERMISSIVE"}).alias("doc"))
    ds = docs.select(F.explode("doc").alias("map_key", "ds"))
    reactions = ds.select(
        F.col("ds.dataset_id").alias("dataset_id"),
        F.col("ds.total_reactions_scraped").alias("total_reactions_scraped"),
        F.posexplode_outer("ds.reactions").alias("reaction_pos", "r"))
    return reactions.select(
        "dataset_id", "total_reactions_scraped", "reaction_pos",
        F.col("r.reaction_id").alias("reaction_id"),
        F.col("r.success").alias("success"),
        _pairs_to_map(F.col("r.inputsMap"), INPUT_F).alias("inputs"),
        F.col("r.outcomes").alias("outcomes"))


# ---------------------------------------------------------------------------
# The formatter: raw scrape records → canonical formatted rows

def _decode_identifiers(ids: Column) -> Column:
    """identifiersList (int type) → identifiers (string type).

    ``.get('type', 0)`` → UNKNOWN fallback reproduces
    web_scrpaer_2.py:104-113."""
    return F.transform(ids, lambda i: F.struct(
        decode_enum(F.coalesce(i["type"], F.lit(0)), IDENTIFIER_TYPES)
        .alias("type"),
        i["value"].alias("value")))


def _decode_unit(u: Column, mapping: dict[int, str]) -> Column:
    return F.struct(
        u["value"].alias("value"),
        decode_enum(F.coalesce(u["units"], F.lit(0)), mapping)
        .alias("units"))


def _normalize_amount(amt: Column) -> Column:
    """Oneof pick: first present of moles/volume/mass, decoded —
    exactly the if/elif chain at web_scrpaer_2.py:126-145."""
    null_unit = F.lit(None).cast(UNIT_F)
    return (
        F.when(amt["moles"].isNotNull(), F.struct(
            _decode_unit(amt["moles"], MOLES_UNITS).alias("moles"),
            null_unit.alias("volume"), null_unit.alias("mass")))
        .when(amt["volume"].isNotNull(), F.struct(
            null_unit.alias("moles"),
            _decode_unit(amt["volume"], VOLUME_UNITS).alias("volume"),
            null_unit.alias("mass")))
        .when(amt["mass"].isNotNull(), F.struct(
            null_unit.alias("moles"), null_unit.alias("volume"),
            _decode_unit(amt["mass"], MASS_UNITS).alias("mass")))
        .otherwise(F.struct(null_unit.alias("moles"),
                            null_unit.alias("volume"),
                            null_unit.alias("mass"))))


def _or_empty(col: F.Column, elem_ddl: str) -> F.Column:
    """NULL-to-empty-array default (``coalesce(col, [])``) with the
    element type spelled once — the formatter needs this six times
    and the copies must stay in lockstep."""
    return F.coalesce(col, F.array().cast(f"array<{elem_ddl}>"))


def format_reactions(scraped: DataFrame,
                     data_col: str = "data",
                     success_col: str = "success") -> DataFrame:
    """The reference formatter as one declarative projection.

    Input: one row per scrape result with ``data`` a raw JSON string
    (shape RAW_REACTION) and a ``success`` flag — the reference's
    result dict (web_scrpaer_2.py:378,385). Rows with null/corrupt
    data yield null structures, never errors (PERMISSIVE semantics,
    matching the try/except at :451-456).

    Output columns: reaction_id, success, inputs map<string,INPUT_F>,
    outcomes array<OUTCOME_F> — the canonical schema §1.3.
    """
    d = F.from_json(F.col(data_col), RAW_REACTION, {"mode": "PERMISSIVE"})

    inputs = F.map_from_entries(F.transform(
        d["inputsMap"],
        lambda pair: F.struct(
            pair[0].alias("key"),
            F.struct(F.transform(
                _or_empty(F.from_json(pair[1], RAW_INPUT)["componentsList"],
                          RAW_COMPONENT),
                lambda c: F.struct(
                    _decode_identifiers(
                        _or_empty(c["identifiersList"], IDENT_R))
                    .alias("identifiers"),
                    _normalize_amount(c["amount"]).alias("amount"),
                    decode_enum(c["reactionRole"], REACTION_ROLES)
                    .alias("reaction_role"),
                )).alias("components")).alias("value"))))

    outcomes = F.flatten(F.transform(
        _or_empty(d["outcomesList"],
                  f"struct<productsList: array<{RAW_PRODUCT}>>"),
        lambda o: F.transform(
            _or_empty(o["productsList"], RAW_PRODUCT),
            lambda p: F.struct(
                _decode_identifiers(
                    _or_empty(p["identifiersList"], IDENT_R))
                .alias("identifiers"),
                F.lit("PRODUCT").alias("reaction_role"),
                F.coalesce(p["isDesiredProduct"], F.lit(False))
                .alias("is_desired_product"),
                F.transform(
                    _or_empty(p["measurementsList"], RAW_MEAS),
                    lambda m: F.struct(
                        m["type"].alias("type"),
                        m["details"].alias("details"),
                        F.when(m["amount"]["mass"].isNotNull(),
                               _decode_unit(m["amount"]["mass"], MASS_UNITS))
                        .alias("mass"))).alias("measurements")))))

    return scraped.select(
        d["reactionId"].alias("reaction_id"),
        F.coalesce(F.col(success_col), F.lit(True)).alias("success"),
        F.when(d["inputsMap"].isNotNull(), inputs)
        .otherwise(F.map_from_entries(
            F.array().cast("array<struct<key: string, "
                           f"value: {INPUT_F}>>"))).alias("inputs"),
        outcomes.alias("outcomes"))


# ---------------------------------------------------------------------------
# Silver: flattened relational views (FIXTURES.md A.3)

def components_flat(reactions: DataFrame) -> DataFrame:
    """One row per (input tab, component, identifier)."""
    tabs = reactions.select(
        "dataset_id", "reaction_id",
        F.explode("inputs").alias("tab", "input"))
    comps = tabs.select(
        "dataset_id", "reaction_id", "tab",
        F.posexplode("input.components").alias("component_idx", "c"))
    amount_kind = (
        F.when(F.col("c.amount.moles").isNotNull(), "moles")
        .when(F.col("c.amount.volume").isNotNull(), "volume")
        .when(F.col("c.amount.mass").isNotNull(), "mass"))
    amount = F.coalesce("c.amount.moles", "c.amount.volume", "c.amount.mass")
    return comps.select(
        "dataset_id", "reaction_id", "tab", "component_idx",
        F.posexplode_outer("c.identifiers").alias("identifier_idx", "ident"),
        amount_kind.alias("amount_kind"),
        amount["value"].alias("amount_value"),
        amount["units"].alias("amount_units"),
        F.col("c.reaction_role").alias("reaction_role"),
    ).select(
        "dataset_id", "reaction_id", "tab", "component_idx",
        "identifier_idx",
        F.col("ident.type").alias("id_type"),
        F.col("ident.value").alias("id_value"),
        "amount_kind", "amount_value", "amount_units", "reaction_role")


def outcomes_flat(reactions: DataFrame) -> DataFrame:
    """One row per (product, identifier), first measurement joined."""
    prods = reactions.select(
        "dataset_id", "reaction_id",
        F.posexplode("outcomes").alias("product_idx", "o"))
    # try_element_at: plain element_at on an EMPTY (non-null) array
    # THROWS under Spark 4's default ANSI mode — and the formatter
    # (and the reference, web_scrpaer_2.py product_info) emit
    # "measurements": [] routinely; try_ returns NULL instead.
    meas = F.try_element_at("o.measurements", F.lit(1))
    return prods.select(
        "dataset_id", "reaction_id", "product_idx",
        F.posexplode_outer("o.identifiers").alias("identifier_idx", "ident"),
        F.col("o.is_desired_product").alias("is_desired_product"),
        meas["type"].alias("meas_type"),
        meas["details"].alias("meas_details"),
        meas["mass"]["value"].alias("meas_mass_value"),
        meas["mass"]["units"].alias("meas_mass_units"),
    ).select(
        "dataset_id", "reaction_id", "product_idx", "identifier_idx",
        F.col("ident.type").alias("id_type"),
        F.col("ident.value").alias("id_value"),
        "is_desired_product", "meas_type", "meas_details",
        "meas_mass_value", "meas_mass_units")


def dataset_rollup(reactions: DataFrame) -> DataFrame:
    """Per-dataset totals — web_scrpaer_2.py:461-462."""
    return reactions.groupBy("dataset_id").agg(
        F.count("reaction_id").alias("total_reactions"),
        F.sum(F.when(F.col("success"), 1).otherwise(0))
        .alias("successful_scrapes"))


# ---------------------------------------------------------------------------
# Re-nest: rows → per-dataset nested document (round-trip)

def renest_documents(reactions: DataFrame) -> DataFrame:
    """Rebuild the per-dataset nested record the reference writes
    (web_scrpaer_2.py:530-543): successful reactions only, reaction
    order preserved via the ingestion ordinal."""
    keep = F.col("reaction_id").isNotNull() & F.col("success")
    per_row = reactions.select(
        "dataset_id",
        # collect_list drops nulls → zero-reaction datasets keep an
        # empty array (reference keeps empty dataset records,
        # web_scrpaer_2.py:441-442). The null must wrap the OUTER
        # struct, not a field of it.
        F.when(keep, F.struct(
            "reaction_pos",
            F.struct(
                "reaction_id", "success",
                F.map_entries("inputs").alias("inputsMap"),
                "outcomes").alias("reaction"))).alias("pr"))
    return (per_row.groupBy("dataset_id")
            .agg(F.transform(
                F.array_sort(F.collect_list("pr")),
                lambda s: s["reaction"]).alias("reactions"))
            .select("dataset_id",
                    F.size("reactions").cast("long")
                    .alias("total_reactions_scraped"),
                    "reactions"))
