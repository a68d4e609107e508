"""Golden-file tests: the engine's ORD pipeline must reproduce the
reference's captured outputs (SURVEY.md §5 test strategy).

The five ord_formatted_data*.json files are end-to-end formatter
outputs at different crawl scopes; we re-ingest them, re-nest, and
assert structural equality — and run the engine's native formatter
over inverse-encoded raw payloads to prove formatter parity with
format_reaction_data (web_scrpaer_2.py:82-192).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.sources import ord as ord_src

# Inverse enum maps (string → int) for building raw payloads.
ID_TYPES_INV = {"UNSPECIFIED": 0, "CUSTOM": 1, "SMILES": 2, "INCHI": 3,
                "MOLBLOCK": 4, "FINGERPRINT": 5, "NAME": 6,
                "IUPAC_NAME": 7, "CAS_NUMBER": 8}
ROLES_INV = {"UNSPECIFIED": 0, "REACTANT": 1, "REAGENT": 2, "SOLVENT": 3,
             "CATALYST": 4, "WORKUP": 5, "INTERNAL_STANDARD": 6,
             "AUTHENTIC_STANDARD": 7, "PRODUCT": 8, "BYPRODUCT": 9,
             "SIDE_PRODUCT": 10}
UNITS_INV = {
    "moles": {"UNSPECIFIED": 0, "MOLE": 1, "MILLIMOLE": 2, "MICROMOLE": 3,
              "NANOMOLE": 4},
    "volume": {"UNSPECIFIED": 0, "LITER": 1, "MILLILITER": 2,
               "MICROLITER": 3, "NANOLITER": 4},
    "mass": {"UNSPECIFIED": 0, "KILOGRAM": 1, "GRAM": 2, "MILLIGRAM": 3,
             "MICROGRAM": 4},
}


def _strip_nones(v):
    """Mimic JSON serialization that drops null fields."""
    if isinstance(v, dict):
        return {k: _strip_nones(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_strip_nones(x) for x in v]
    return v


def _normalize_golden_reaction(r: dict) -> dict:
    """Canonicalize a golden reaction for comparison: outcomes'
    vestigial empty ``amount`` dropped, absent measurements → []."""
    out = dict(r)
    out["outcomes"] = []
    for o in r.get("outcomes", []):
        o2 = {k: v for k, v in o.items() if k != "amount"}
        o2.setdefault("measurements", [])
        o2["measurements"] = [
            {"type": m.get("type"), "details": m.get("details"),
             **({"mass": m["mass"]} if m.get("mass") is not None else {})}
            for m in o2["measurements"]]
        out["outcomes"].append(o2)
    return _strip_nones(out)


def _engine_reaction_to_dict(row) -> dict:
    d = row.asDict(recursive=True)
    rx = {
        "reaction_id": d["reaction_id"],
        "success": d["success"],
        "inputsMap": [[e["key"], _strip_nones(e["value"])]
                      for e in d["inputsMap"]],
        "outcomes": _strip_nones(d["outcomes"]),
    }
    _canon_engine_fields(rx)
    return rx


def _canon_engine_fields(rx: dict) -> None:
    """Components keep an "amount" key even when empty (reference
    emits amount_data = {} — web_scrpaer_2.py:124); outcomes default
    to an empty measurements list."""
    for _tab, inp in rx["inputsMap"]:
        for c in inp.get("components", []):
            c.setdefault("amount", {})
    for o in rx["outcomes"]:
        o.setdefault("measurements", [])


def _load_golden(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def test_read_counts(spark, golden_files):
    """Dataset/reaction counts must match the raw JSON exactly."""
    for path in golden_files:
        doc = _load_golden(path)
        df = ord_src.read_ord_documents(spark, path)
        n_datasets = df.select("dataset_id").distinct().count()
        n_reactions = df.filter(F.col("reaction_id").isNotNull()).count()
        assert n_datasets == len(doc), path
        assert n_reactions == sum(len(v["reactions"]) for v in doc.values())


def test_round_trip(spark, golden_files):
    """ingest → re-nest reproduces every golden document."""
    for path in golden_files:
        doc = _load_golden(path)
        df = ord_src.read_ord_documents(spark, path)
        nested = ord_src.renest_documents(df)
        got = {r["dataset_id"]: r for r in nested.collect()}
        assert set(got) == set(doc), path
        for ds_id, rec in doc.items():
            g = got[ds_id]
            assert g["total_reactions_scraped"] == len(rec["reactions"])
            engine_rx = [_engine_reaction_to_dict(r) for r in g["reactions"]]
            golden_rx = [_normalize_golden_reaction(r)
                         for r in rec["reactions"]]
            assert engine_rx == golden_rx, f"{path}:{ds_id}"


def _encode_raw_reaction(r: dict) -> dict:
    """Inverse of the formatter: golden reaction → raw ORD payload."""
    raw = {"reactionId": r["reaction_id"], "inputsMap": [], "outcomesList": []}
    for tab, inp in r.get("inputsMap", []):
        comps = []
        for c in inp.get("components", []):
            rc = {"identifiersList": [
                {"type": ID_TYPES_INV[i["type"]], "value": i["value"]}
                for i in c.get("identifiers", [])]}
            amt = c.get("amount") or {}
            if amt:
                kind, ua = next(iter(amt.items()))
                rc["amount"] = {kind: {
                    "value": ua["value"],
                    "units": UNITS_INV[kind][ua["units"]]}}
            rc["reactionRole"] = ROLES_INV[c["reaction_role"]]
            comps.append(rc)
        raw["inputsMap"].append([tab, {"componentsList": comps}])
    products = []
    for o in r.get("outcomes", []):
        p = {"identifiersList": [
            {"type": ID_TYPES_INV[i["type"]], "value": i["value"]}
            for i in o.get("identifiers", [])],
            "isDesiredProduct": o.get("is_desired_product", False)}
        meas_list = []
        for m in o.get("measurements", []) or []:
            rm = {"type": m.get("type"), "details": m.get("details")}
            if m.get("mass"):
                rm["amount"] = {"mass": {
                    "value": m["mass"]["value"],
                    "units": UNITS_INV["mass"][m["mass"]["units"]]}}
            meas_list.append(rm)
        if meas_list:
            p["measurementsList"] = meas_list
        products.append(p)
    if products:
        raw["outcomesList"] = [{"productsList": products}]
    return raw


def test_formatter_parity(spark, golden_files):
    """Native-column formatter == reference formatter on the whole
    corpus: inverse-encode every golden reaction to its raw payload,
    run ``format_reactions``, compare against the golden nested doc."""
    for path in golden_files:
        doc = _load_golden(path)
        rows, expected = [], []
        for rec in doc.values():
            for r in rec["reactions"]:
                rows.append((json.dumps(_encode_raw_reaction(r)),
                             r.get("success", True)))
                expected.append(_normalize_golden_reaction(r))
        scraped = spark.createDataFrame(rows, "data string, success boolean")
        formatted = ord_src.format_reactions(scraped)
        got = [
            _engine_reaction_to_dict_formatted(r)
            for r in formatted.collect()]
        # Order-insensitive: compare as multisets keyed by reaction_id.
        got_by_id = {g["reaction_id"]: g for g in got}
        exp_by_id = {e["reaction_id"]: e for e in expected}
        assert set(got_by_id) == set(exp_by_id), path
        for rid in exp_by_id:
            # inputs travel as MapType → Python dict order is not
            # meaningful; compare pair lists sorted by tab name.
            for rx in (got_by_id[rid], exp_by_id[rid]):
                rx["inputsMap"] = sorted(rx["inputsMap"],
                                         key=lambda kv: kv[0])
            assert got_by_id[rid] == exp_by_id[rid], f"{path}:{rid}"


def _engine_reaction_to_dict_formatted(row) -> dict:
    d = row.asDict(recursive=True)
    rx = {
        "reaction_id": d["reaction_id"],
        "success": d["success"],
        "inputsMap": [[k, _strip_nones(v)] for k, v in d["inputs"].items()],
        "outcomes": _strip_nones(d["outcomes"]),
    }
    _canon_engine_fields(rx)
    return rx


def test_silver_domain_stats(spark, golden_files):
    """FIXTURES.md A.2 observed domains, asserted over the union of
    all golden files (dedup'd by (dataset, reaction))."""
    dfs = [ord_src.read_ord_documents(spark, p) for p in golden_files]
    union = dfs[0]
    for d in dfs[1:]:
        union = union.unionByName(d)
    # Sum grain across the five files (SURVEY §1.3 counts duplicates
    # of reactions appearing in several capture files); 51 distinct
    # dataset ids, 55 dataset records in total.
    reactions = union.filter(F.col("reaction_id").isNotNull())
    assert union.select("dataset_id").distinct().count() == 51
    assert reactions.count() == 237

    comp = ord_src.components_flat(reactions)
    # One row per component: identifier_idx==0, or NULL for the 49
    # components with zero identifiers (posexplode_outer keeps them).
    first_ident = comp.filter(
        (F.col("identifier_idx") == 0) | F.col("identifier_idx").isNull())
    assert first_ident.count() == 1119
    assert comp.filter(F.col("identifier_idx").isNull()).count() == 49

    roles = dict(first_ident.groupBy("reaction_role").count().collect())
    assert roles == {"REACTANT": 724, "SOLVENT": 297, "CATALYST": 72,
                     "REAGENT": 16, "UNSPECIFIED": 5,
                     "INTERNAL_STANDARD": 5}
    kinds = dict(first_ident.filter(F.col("amount_kind").isNotNull())
                 .groupBy("amount_kind").count().collect())
    assert kinds == {"moles": 418, "volume": 354, "mass": 1}

    out = ord_src.outcomes_flat(reactions)
    assert out.filter(
        (F.col("identifier_idx") == 0)
        | F.col("identifier_idx").isNull()).count() == 284
    assert out.filter(F.col("identifier_idx").isNull()).count() == 29

    roll = ord_src.dataset_rollup(reactions)
    total = roll.agg(F.sum("total_reactions")).collect()[0][0]
    assert total == 237


def test_corrupt_document_is_tolerated(spark, tmp_path):
    """PERMISSIVE ingestion (the reference's try/except guard,
    web_scrpaer_2.py:451-456): a malformed document store yields null
    rows, never an exception; a valid file alongside it still parses."""
    import shutil

    bad = tmp_path / "bad.json"
    bad.write_text("{this is not json")
    good_src = "/root/reference/ord_formatted_data_single.json"
    shutil.copy(good_src, tmp_path / "good.json")
    df = ord_src.read_ord_documents(spark, str(tmp_path / "*.json"))
    rows = df.collect()
    # the good file contributes its 1 reaction; the bad one nothing
    assert len([r for r in rows if r.reaction_id is not None]) == 1
