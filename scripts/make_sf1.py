"""Build a synthetic sf1 directory (10× sf0.1) for the full-surface
scale sweep (round-9 verdict item: the 3-SF sweep tops out at sf0.1;
one decade up catches knees the per-op probes never visit).

The driver's generator is not available, so sf1 is a structured
10×-replication of the driver's sf0.1 tables with every key domain
shifted per copy (PKs and FKs consistently), document copies SALTED
(interleaved per-copy tokens — cross-copy shingle overlap 0, the
probe-corpus convention) and embedding copies ISOTROPIC (fresh
deterministic directions — no planted near-dups; the round-8b
decomposition showed dup-saturated growth measures output structure,
not plan scaling). region/nation stay fixed (TPC-H dims). Everything
is pyarrow/pandas — no Spark session, so it can run next to probes.

Usage: python scripts/make_sf1.py [out_dir]  (default /tmp/ordspark_sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
COPIES = 10


def _write(out: str, name: str, tables: list[pa.Table]) -> None:
    tb = pa.concat_tables(tables)
    pq.write_table(tb, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {tb.num_rows} rows", flush=True)


def _shift(tb: pa.Table, col: str, off: int) -> pa.Table:
    import pyarrow.compute as pc
    i = tb.schema.get_field_index(col)
    shifted = pc.add(tb.column(col), pa.scalar(off, tb.schema.field(col).type))
    return tb.set_column(i, tb.schema.field(col), shifted)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ordspark_sf1"
    os.makedirs(out, exist_ok=True)

    base = {}
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        base[t] = pq.read_table(os.path.join(BASE, f"{t}.parquet"))

    # fixed dims
    for t in ("region", "nation"):
        pq.write_table(base[t], os.path.join(out, f"{t}.parquet"))
        print(f"  {t}: {base[t].num_rows} rows (verbatim)", flush=True)

    import pyarrow.compute as pc
    key_span = {  # PK stride per copy = max(key)+1, shared with FKs
        "c": pc.max(base["customer"]["c_custkey"]).as_py() + 1,
        "s": pc.max(base["supplier"]["s_suppkey"]).as_py() + 1,
        "p": pc.max(base["part"]["p_partkey"]).as_py() + 1,
        "o": pc.max(base["orders"]["o_orderkey"]).as_py() + 1,
        "e": pc.max(base["events"]["event_id"]).as_py() + 1,
        "u": pc.max(base["events"]["user_id"]).as_py() + 1,
        "d": pc.max(base["documents"]["doc_id"]).as_py() + 1,
        "v": pc.max(base["embeddings"]["vec_id"]).as_py() + 1,
    }

    # customer names get a per-copy LENGTH-DISTINCT suffix ("X"*c):
    # verbatim-copied names make every name a 10-way distance-0
    # family (dedup_fuzzy_levenshtein's answer set would grow
    # quadratically with copies — output structure, not plan cost),
    # while distinct lengths keep cross-copy pairs out of the
    # equal-length gate and leave within-copy structure 1x-like.
    plans = {
        "customer": [("c_custkey", "c")],
        "supplier": [("s_suppkey", "s")],
        "part": [("p_partkey", "p")],
        "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
        "lineitem": [("l_orderkey", "o"), ("l_partkey", "p"),
                     ("l_suppkey", "s")],
        "events": [("event_id", "e"), ("user_id", "u")],
    }
    for t, shifts in plans.items():
        parts = []
        for c in range(COPIES):
            tb = base[t]
            for col, k in shifts:
                tb = _shift(tb, col, c * key_span[k])
            if t == "customer" and c > 0:
                i = tb.schema.get_field_index("c_name")
                suffixed = pc.binary_join_element_wise(
                    tb.column("c_name").cast(pa.string()),
                    pa.scalar("X" * c), "")
                tb = tb.set_column(i, tb.schema.field("c_name"),
                                   suffixed)
            parts.append(tb)
        _write(out, t, parts)

    # documents: salt copies > 0 by interleaving DOC-DEPENDENT salt
    # tokens (' s<copy>d<doc%97>x<pos> ') between every pair of
    # original tokens, then recompute n_chars. Doc-dependence
    # matters: a single per-copy token (the probe corpora's
    # transform) carries weight ~n_tokens/2 per doc and DOMINATES
    # token-frequency-weighted signatures, so every doc in a copy
    # becomes every other's simhash/fuzzy near-dup — 25M planted
    # pairs per copy, the r8b "output structure" artifact. Unique-ish
    # salts (1/97 cross-doc overlap) break shingles and blocks
    # exactly the same while leaving similarity structure 1x-like.
    dparts = [base["documents"]]
    dpdf = base["documents"].to_pandas()
    for c in range(1, COPIES):
        pdf = dpdf.copy()
        pdf["doc_id"] = pdf["doc_id"] + c * key_span["d"]

        def salt(row):
            toks = row.text.split(" ")
            d = row.doc_id % 97
            mixed = []
            for j, t in enumerate(toks):
                mixed.append(t)
                if j < len(toks) - 1:
                    mixed.append(f"s{c}d{d}x{j}")
            return " ".join(mixed)

        pdf["text"] = pdf.apply(salt, axis=1)
        pdf["n_chars"] = pdf["text"].str.len().astype("int64")
        dparts.append(pa.Table.from_pandas(
            pdf, schema=base["documents"].schema, preserve_index=False))
    _write(out, "documents", dparts)

    # embeddings: isotropic copies (deterministic fresh directions,
    # labels preserved), copy 0 verbatim
    eparts = [base["embeddings"]]
    epdf = base["embeddings"].to_pandas()
    dim = len(epdf["embedding"].iloc[0])
    for c in range(1, COPIES):
        rng = np.random.default_rng(1_000_003 * c)
        vecs = rng.uniform(-0.5, 0.5,
                           (len(epdf), dim)).astype(np.float32)
        pdf = pd.DataFrame({
            "vec_id": epdf["vec_id"] + c * key_span["v"],
            "embedding": list(vecs),
            "label": epdf["label"],
        })
        eparts.append(pa.Table.from_pandas(
            pdf, schema=base["embeddings"].schema, preserve_index=False))
    _write(out, "embeddings", eparts)
    print("sf1 ready at", out, flush=True)


if __name__ == "__main__":
    main()
