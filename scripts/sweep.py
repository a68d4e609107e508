"""Tri-SF correctness sweep → checked-in JSON artifact.

Usage: python scripts/sweep.py [out.json] [sf_dir ...]
Runs EVERY registered query at each scale factor (default all three
driver SFs) against its DuckDB oracle via the driver-faithful compare
(vacuous-empty guard ON, same as scripts/diffcheck.py), and writes a
single JSON artifact with per-query, per-SF status + row count +
seconds — the independently checkable record the round-3/4 verdicts
asked for (103 queries had only the builder's prose claim).

Statuses: "pass" (oracle match), "rows_only" (no oracle; executed,
row count recorded), "vacuous" (both engines empty — a FAIL),
"fail" (mismatch), "error" (exception; message recorded). A
rows-only query returning 0 rows is ALSO flagged vacuous unless
allow-listed in RO_EMPTY_OK with a justification — a rows-only
check that counts nothing verified nothing.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, ".")

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from open_reaction_database_web_scraper_spark.testing import (  # noqa: E402
    RO_EMPTY_OK, VACUOUS_ALLOWED, compare_full)

DEFAULT_SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    out_path = next((a for a in args if a.endswith(".json")),
                    "SWEEP_r5.json")
    sf_dirs = [a for a in args if not a.endswith(".json")] \
        or list(DEFAULT_SFS)
    load_all_operators()
    spark = get_session("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"sf_dirs": sf_dirs, "n_queries": len(REGISTRY),
                    "queries": {}}
    n_bad = 0
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        result["queries"][name] = {}
        for sf in sf_dirs:
            key = sf.rsplit("/", 1)[-1]
            t0 = time.time()
            try:
                df = spec.fn(spark, sf)
                if spec.oracle is None:
                    n = df.count()
                    if n == 0 and name in RO_EMPTY_OK:
                        cell = {"status": "rows_only", "rows": 0,
                                "empty_ok": RO_EMPTY_OK[name]}
                    elif n == 0:
                        cell = {"status": "vacuous", "rows": 0}
                    else:
                        cell = {"status": "rows_only", "rows": n}
                else:
                    r = compare_full(
                        df, spec.oracle, sf, name,
                        fail_on_empty=name not in VACUOUS_ALLOWED)
                    if r.ok:
                        cell = {"status": "pass", "rows": r.rows}
                    elif r.vacuous:
                        cell = {"status": "vacuous", "rows": 0}
                    else:
                        cell = {"status": "fail",
                                "detail": r.message.split("\n")[0]}
            except Exception:
                cell = {"status": "error",
                        "detail": traceback.format_exc(limit=1)
                        .splitlines()[-1]}
            # release anything a query cached internally (e.g. the
            # minhash signature frame) so storage can't accumulate
            # across the 200+-query x 3-SF sweep
            spark.catalog.clearCache()
            cell["sec"] = round(time.time() - t0, 2)
            bad = cell["status"] in ("fail", "vacuous", "error")
            n_bad += bad
            result["queries"][name][key] = cell
            print(f"{'FAIL' if bad else 'ok  '} {name} @ {key}: "
                  f"{cell['status']} [{cell['sec']}s]", flush=True)
    result["n_bad_cells"] = n_bad
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"\nwrote {out_path}: {len(REGISTRY)} queries x "
          f"{len(sf_dirs)} SFs, {n_bad} bad cells")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
