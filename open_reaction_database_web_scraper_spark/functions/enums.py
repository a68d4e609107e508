"""ORD enum dimension tables and decode helpers.

The reference decodes protobuf-style integer enums to strings with
constant Python dicts (reaction roles web_scrpaer_2.py:64-68,
identifier types :69-79, unit maps :96-102). Here each map is a
plain dict that can become either (a) an inlined CASE WHEN /
``create_map`` literal — constant-folded by Catalyst, zero join — or
(b) a broadcast-joined dimension DataFrame when the decode is part
of a relational demo. Unknown codes decode to 'UNKNOWN', matching
the reference's ``.get(x, 'UNKNOWN')`` (web_scrpaer_2.py:108,148).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

REACTION_ROLES: dict[int, str] = {
    0: "UNSPECIFIED", 1: "REACTANT", 2: "REAGENT", 3: "SOLVENT",
    4: "CATALYST", 5: "WORKUP", 6: "INTERNAL_STANDARD",
    7: "AUTHENTIC_STANDARD", 8: "PRODUCT", 9: "BYPRODUCT",
    10: "SIDE_PRODUCT",
}

IDENTIFIER_TYPES: dict[int, str] = {
    0: "UNSPECIFIED", 1: "CUSTOM", 2: "SMILES", 3: "INCHI",
    4: "MOLBLOCK", 5: "FINGERPRINT", 6: "NAME", 7: "IUPAC_NAME",
    8: "CAS_NUMBER",
}

MOLES_UNITS: dict[int, str] = {
    0: "UNSPECIFIED", 1: "MOLE", 2: "MILLIMOLE", 3: "MICROMOLE",
    4: "NANOMOLE",
}

VOLUME_UNITS: dict[int, str] = {
    0: "UNSPECIFIED", 1: "LITER", 2: "MILLILITER", 3: "MICROLITER",
    4: "NANOLITER",
}

MASS_UNITS: dict[int, str] = {
    0: "UNSPECIFIED", 1: "KILOGRAM", 2: "GRAM", 3: "MILLIGRAM",
    4: "MICROGRAM",
}


def decode_enum(code: Column, mapping: dict[int, str],
                default: str = "UNKNOWN") -> Column:
    """Inline enum decode: map literal + coalesce default.

    Catalyst constant-folds the map literal; the lookup runs inside
    whole-stage codegen — no join, no shuffle, no Python.
    """
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    return F.coalesce(m[code], F.lit(default))


def enum_dim(spark: SparkSession, mapping: dict[int, str],
             code_col: str = "code", name_col: str = "name") -> DataFrame:
    """Enum map as a tiny dimension DataFrame (for broadcast joins)."""
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"{code_col} int, {name_col} string")
