"""Build a synthetic sf10 directory (100× sf0.1) for the round-11
VALUE-CHECKED decade gate (VERDICT r10 next-round #3): the sf1 sweep
caught a real 1-ulp ROUND divergence in round 9, so the decimal- and
window-heavy top-20 get the full oracle gate (rows+schema+hash) one
more decade up — 60M-row lineitem puts sql_tpch_q1's sum_charge
decimal image near its documented 2^53 argument's empirical range.

Same structured replication as make_sf1.py (PK/FK domains shifted
per copy, region/nation verbatim) with two DOCUMENTED divergences,
both because this gate's subset is decimal/window aggregates, not
similarity structure:
- documents are VERBATIM copies (id-shifted, no salt interleave):
  token-frequency aggregates (zipf/perplexity/entropy) scale their
  counts exactly ×copies, which is precisely the precision stress
  wanted; no dedup/near-dup query runs at this SF, so the identical
  copies can't plant quadratic output.
- embeddings are SKIPPED entirely (no chosen query reads them);
  generating 6M fresh vectors would only burn disk.

Usage: python scripts/make_sf10.py [out_dir] (default /tmp/ordspark_sf10)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
COPIES = 100


def _shift(tb: pa.Table, col: str, off: int) -> pa.Table:
    i = tb.schema.get_field_index(col)
    shifted = pc.add(tb.column(col),
                     pa.scalar(off, tb.schema.field(col).type))
    return tb.set_column(i, tb.schema.field(col), shifted)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ordspark_sf10"
    os.makedirs(out, exist_ok=True)

    base = {}
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        base[t] = pq.read_table(os.path.join(BASE, f"{t}.parquet"))

    for t in ("region", "nation"):
        pq.write_table(base[t], os.path.join(out, f"{t}.parquet"))
        print(f"  {t}: {base[t].num_rows} rows (verbatim)", flush=True)

    span = {
        "c": pc.max(base["customer"]["c_custkey"]).as_py() + 1,
        "s": pc.max(base["supplier"]["s_suppkey"]).as_py() + 1,
        "p": pc.max(base["part"]["p_partkey"]).as_py() + 1,
        "o": pc.max(base["orders"]["o_orderkey"]).as_py() + 1,
        "e": pc.max(base["events"]["event_id"]).as_py() + 1,
        "u": pc.max(base["events"]["user_id"]).as_py() + 1,
        "d": pc.max(base["documents"]["doc_id"]).as_py() + 1,
    }
    plans = {
        "customer": [("c_custkey", "c")],
        "supplier": [("s_suppkey", "s")],
        "part": [("p_partkey", "p")],
        "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
        "lineitem": [("l_orderkey", "o"), ("l_partkey", "p"),
                     ("l_suppkey", "s")],
        "events": [("event_id", "e"), ("user_id", "u")],
        "documents": [("doc_id", "d")],
    }
    for t, shifts in plans.items():
        writer = None
        path = os.path.join(out, f"{t}.parquet")
        for c in range(COPIES):
            tb = base[t]
            for col, k in shifts:
                tb = _shift(tb, col, c * span[k])
            if writer is None:
                writer = pq.ParquetWriter(path, tb.schema)
            writer.write_table(tb)
        writer.close()
        n = base[t].num_rows * COPIES
        print(f"  {t}: {n} rows ({COPIES} copies)", flush=True)
    print("sf10 ready at", out, flush=True)


if __name__ == "__main__":
    main()
