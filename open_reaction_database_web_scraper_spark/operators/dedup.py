"""Deduplication family (SURVEY.md §2.11 / north-star extensions).

The LLM-training-data staples over the ``documents`` table:
exact content-hash dedup, MinHash+LSH near-dup detection, SimHash,
and exact n-gram Jaccard. All are pure DataFrame compositions — the
only shuffles are the groupBys/joins the algorithms require, and all
hashing is JVM-side (no Python in the hot path). The minhash family
hashes PORTABLY (md5-derived + (a·h+b) mod p) so DuckDB recomputes
identical signatures and the LSH pairs are fully oracle-checked.

Scale notes (100 TB): exact dedup is one hash-aggregate on a 32-byte
key; MinHash is explode→min-agg (shingle fan-out is bounded per doc)
and the LSH band join only shuffles (band, hash) pairs, never text.
"""

from __future__ import annotations

import os
import shutil
import threading

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fanout, load
from ..registry import register

N_HASHES = 32          # minhash signature length
N_BANDS = 8            # LSH bands (r = N_HASHES / N_BANDS = 4)
SHINGLE_W = 3          # words per shingle

# --- portable hashing (engine-recomputable: Spark == DuckDB) -------------
#
# Through round 6 the minhash family hashed with Spark's xxhash64 —
# fast but engine-private, so the whole family was rows-only. The
# text_fingerprint idiom (md5 → leading 8 hex chars → bigint) is
# bit-identical in every engine; the per-seed signatures then come
# from the classic universal family h_i(x) = (a_i·x + b_i) mod p —
# pure 64-bit arithmetic both engines compute exactly (a_i < 2^30,
# x < 2^32 ⇒ product < 2^62, no overflow in either). One md5 per
# shingle + 32 multiply-mods ≈ the old one xxhash64 + 32 xxhash64s,
# so this costs nothing and flips dedup_minhash_lsh to fully
# DuckDB-oracled.
MINHASH_P = 4294967291          # largest 32-bit prime
_SEED_LCG_A, _SEED_LCG_C, _SEED_LCG_M = 6364136223846793005, 1442695040888963407, 1 << 63


def _minhash_coeffs() -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) per seed — a fixed-seed LCG walk, no
    runtime randomness (the same constants are baked into the DuckDB
    oracle SQL, so both engines share the exact hash family)."""
    a, b, state = [], [], 88172645463325252
    for _ in range(N_HASHES):
        state = (_SEED_LCG_A * state + _SEED_LCG_C) % _SEED_LCG_M
        a.append(state % ((1 << 30) - 1) + 1)      # 1 ≤ a < 2^30
        state = (_SEED_LCG_A * state + _SEED_LCG_C) % _SEED_LCG_M
        b.append(state % MINHASH_P)                # 0 ≤ b < p
    return a, b


MINHASH_A, MINHASH_B = _minhash_coeffs()


def _path_bytes(path: str) -> int:
    """Size of a parquet file-or-directory (0 if absent — e.g. a
    non-filesystem URI, where the floor width applies)."""
    import os
    if os.path.isfile(path):
        return os.path.getsize(path)
    if os.path.isdir(path):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(path) for f in fs)
    return 0


def _auto_width(sf_dir: str, table: str = "documents") -> int:
    """Data-sized exchange width: one partition per ~512 KiB of
    compressed parquet, floored at the local default (32) and capped
    at 8192. This is the formula that fixed the minhash/simhash 100×
    knees BY DEFAULT (SCALING.md round-7): a corpus-growth-aware
    width where the stock 32-partition default kneed superlinear.
    The statistic is file metadata — zero Spark jobs; on a real
    cluster this is table statistics. One home (round-8 advice):
    the divisor retunes in exactly one place."""
    return min(max(_path_bytes(f"{sf_dir}/{table}.parquet")
                   // (512 * 1024), 32), 8192)


def portable_hash32(col: F.Column) -> F.Column:
    """First 32 bits of md5 as a bigint — identical in Spark
    (conv(substr(md5, 1, 8), 16, 10)) and DuckDB
    (CAST('0x' || substr(md5, 1, 8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8),
                  16, 10).cast("long")


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def _shingles(tokens: F.Column) -> F.Column:
    """w-word shingles via a sequence of sliding slices (JVM-side).

    Guarded for short docs: ``sequence(0, -1)`` in Spark generates a
    DESCENDING array, not an empty one, so n ≤ 0 must short-circuit.
    """
    n = F.size(tokens) - (SHINGLE_W - 1)
    return F.when(n >= 1, F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, SHINGLE_W)))
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) pairs, duplicates KEPT: the only consumer
    (minhash_signatures) reduces by per-doc MIN, which is
    duplicate-insensitive — min over the multiset equals min over
    the set — so an explicit distinct() here would add a full
    exchange of 3-word shingle STRINGS for nothing (at 100 TB that
    text shuffle would dominate the whole minhash job).

    Docs are hash-REPARTITIONED by doc_id (width sized from table
    bytes, same formula as the banding exchange) BEFORE the explode,
    the round-7 simhash lesson applied here too: the downstream
    32-column min aggregate then runs on co-partitioned input, so
    its per-partition partial-agg hash map holds only that
    partition's keys — round-robin fanout let every partition's map
    grow toward the FULL corpus key set (the state blow-up that
    OOMed simhash's 60-column vote at 100× on one JVM). The doc
    exchange this adds carries each doc's text ONCE — strictly
    smaller than the shingle explosion it prevents from spilling."""
    docs = (load(spark, sf_dir, "documents").select("doc_id", "text")
            .repartition(_auto_width(sf_dir), "doc_id"))
    return docs.select("doc_id",
                       F.explode(_shingles(_tokens())).alias("shingle"))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig array<long>[N_HASHES]) — one explode + one
    hash-agg. Each shingle STRING is md5'd once (portable_hash32);
    the N_HASHES per-seed values derive from that 32-bit value via
    the universal family (a_i·h + b_i) mod p — one string traversal
    per shingle instead of N_HASHES, identical uniformity, and (new
    in round 7) bit-identical in DuckDB, so the LSH output is fully
    oracle-checkable. (At sf0.1 the job is overhead-bound either
    way — the single-traversal form is a per-row CPU saving for the
    100 TB regime.)"""
    sh = doc_shingles(spark, sf_dir).withColumn(
        "h", portable_hash32(F.col("shingle")))
    mins = sh.groupBy("doc_id").agg(*[
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
              % F.lit(MINHASH_P)).alias(f"h{i}")
        for i in range(N_HASHES)])
    return mins.select(
        "doc_id", F.array(*[f"h{i}" for i in range(N_HASHES)]).alias("sig"))


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_sha,
           COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
    tags=("dedup",),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: SHA-256 the text, keep the lowest doc_id
    per digest. A single hash aggregate — the content never shuffles
    twice, only the 32-byte digest does."""
    docs = load(spark, sf_dir, "documents")
    return (docs.withColumn("content_sha", F.sha2("text", 256))
            .groupBy("content_sha")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count("*").alias("n_copies"))
            .select("doc_id", "content_sha", "n_copies"))


_R = N_HASHES // N_BANDS  # rows per band


def shingle_hash_unnest_sql(toks: str = "t") -> str:
    """DuckDB expression UNNESTing a doc's w-word shingles, each
    hashed with the portable md5-head-32 idiom — the ONE home for
    the shingle-hash recipe (round-8 review: it had grown a second
    copy in text_ngram_novelty's oracle). Shared by the minhash CTE
    chain and llmdata6; a retune of SHINGLE_W or the hash idiom now
    lands everywhere at once."""
    w = SHINGLE_W
    return f"""UNNEST(list_transform(
        range(1, greatest(len({toks}) - {w - 1}, 0) + 1),
        i -> CAST(('0x' || substr(md5(array_to_string(
               {toks}[CAST(i AS BIGINT):CAST(i + {w - 1} AS BIGINT)],
               ' ')), 1, 8)) AS BIGINT)))"""


def _minhash_pair_ctes() -> str:
    """CTE chain defining ``mh_pairs(doc_a, doc_b, est_jaccard)`` —
    the exact minhash+LSH pipeline in DuckDB SQL: same md5-derived
    shingle hash, same (a·h+b) mod p family (constants interpolated
    from MINHASH_A/B), same banding and ≥0.5 gate. One home, shared
    by the pair oracle and (round 8) the recursive-CTE
    connected-components cluster oracles."""
    sig_cols = ", ".join(
        f"MIN(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MINHASH_P})"
        f" AS h{i}" for i in range(N_HASHES))
    sig_arr = ", ".join(f"h{i}" for i in range(N_HASHES))
    matches = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
        for i in range(N_HASHES))
    return f"""toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, {shingle_hash_unnest_sql("t")} AS h
      FROM toks
    ), sig AS (
      SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id
    ), sigarr AS (
      SELECT doc_id, [{sig_arr}] AS sig FROM sig
    ), bands AS (
      SELECT doc_id, b.b AS band_idx,
             CAST(('0x' || substr(md5(array_to_string(list_transform(
               sig[CAST(b.b * {_R} + 1 AS BIGINT)
                   :CAST(b.b * {_R} + {_R} AS BIGINT)],
               v -> CAST(v AS VARCHAR)), ',')), 1, 8)) AS BIGINT)
             AS band_hash
      FROM sigarr, range(0, {N_BANDS}) AS b(b)
    ), mh_cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), mh_pairs AS (
      SELECT c.doc_a, c.doc_b,
             ({matches}) / {N_HASHES}.0 AS est_jaccard
      FROM mh_cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
      WHERE ({matches}) / {N_HASHES}.0 >= 0.5
    )"""


def _minhash_oracle_sql() -> str:
    """Pair-level oracle: the shared CTE chain's final table."""
    return (f"WITH {_minhash_pair_ctes()} "
            "SELECT doc_a, doc_b, est_jaccard FROM mh_pairs")


def _clusters_oracle_sql(include_exact: bool) -> str:
    """DuckDB recursive-CTE connected components over the (fully
    oracled) duplicate-pair graph — min-label clusters as SQL, so the
    iterative Spark CC loop is value-checked end-to-end instead of
    rows-only (round-8 plan item 2).

    ``reach`` is the symmetric-closure transitive reachability set;
    a vertex's cluster id is the minimum of itself and everything it
    reaches — exactly the fixpoint min-label propagation converges
    to. Closure is O(Σ component²) pairs, fine at oracle SFs where
    components are small chains (the 100 TB path stays the Spark
    O(diameter) loop; this is the CHECK, not the plan). With
    ``include_exact`` the edge set adds the sha-256 hub-star edges,
    mirroring dedup_clusters' union of exact and near-dup sources."""
    star = """, shas AS (
      SELECT doc_id, sha256(text) AS cs FROM documents
    ), hubs AS (
      SELECT cs, MIN(doc_id) AS hub FROM shas GROUP BY cs
    ), star AS (
      SELECT h.hub AS src, s.doc_id AS dst
      FROM shas s JOIN hubs h ON h.cs = s.cs
      WHERE s.doc_id <> h.hub
    )""" if include_exact else ""
    edge_src = ("SELECT src, dst FROM star UNION "
                "SELECT doc_a AS src, doc_b AS dst FROM mh_pairs"
                if include_exact else
                "SELECT doc_a AS src, doc_b AS dst FROM mh_pairs")
    return f"""
    WITH RECURSIVE {_minhash_pair_ctes()}{star},
    edges AS ({edge_src}),
    sym AS (
      SELECT src, dst FROM edges
      UNION
      SELECT dst AS src, src AS dst FROM edges
    ),
    reach(a, b) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b
    ),
    comp AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS cluster_size FROM comp
      GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c JOIN sizes s ON s.cluster_id = c.cluster_id
    WHERE s.cluster_size >= 2
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle_sql(),
          tags=("dedup", "approx"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs.

    shingle → 32 minhashes → 8 bands of 4 → band-bucket self-join →
    candidate pairs → estimated Jaccard = matching-minhash fraction,
    kept at ≥ 0.5. Deterministic AND engine-portable: the shingle
    hash is md5-derived and the per-seed family is (a·h+b) mod p, so
    the DuckDB oracle recomputes the identical pairs (rows-only
    through round 6, fully value-hashed from round 7).

    Round 11: identical-signature collapse before banding (see
    :func:`signature_groups`) — output unchanged (same oracle), but
    a k-identical duplicate cluster now lands ONE row per band
    bucket instead of k, so the within-bucket k²/2 candidate blow-up
    cannot happen for duplicate clusters.

    Cache ownership: :func:`minhash_pairs` caches the members frame
    (read thrice: banding + within-group + expansion). This entry point
    materializes the pairs eagerly (localCheckpoint — lineage
    truncated, blocks owned by the ContextCleaner, released on GC)
    and unpersists the signature cache before returning, so running
    the query standalone leaves no orphaned cached RDDs behind.
    """
    pairs, members = minhash_pairs(spark, sf_dir)
    out = pairs.localCheckpoint(eager=True)
    members.unpersist()
    return out


# Per-call diagnostics, THREAD-LOCAL (round-11 advice: module-level
# mutable globals are racy under concurrent query execution in one
# process). Readers keep the legacy spelling — ``dedup.
# LAST_LSH_HOT_BUCKETS`` / ``dedup.LAST_CC_ROUNDS`` resolve through
# the PEP-562 module __getattr__ below to the CALLING thread's most
# recent value, so a probe interleaving queries on two threads reads
# its own thread's diagnostic, never the other's.
#   LAST_LSH_HOT_BUCKETS — residual hot buckets excluded by the most
#     recent minhash_pairs call with a hot_cap set (count of
#     (band_idx, band_hash) buckets dropped). 0 whenever hot_cap is
#     None (the registered-query default, which is LOSSLESS).
#   LAST_CC_ROUNDS — rounds taken by the most recent
#     connected_components call (≈ graph diameter; grows with chain
#     length, not corpus size). Read by scripts/scaleup_r6.py etc.
_DIAG = threading.local()


def __getattr__(name: str):
    if name == "LAST_LSH_HOT_BUCKETS":
        return getattr(_DIAG, "lsh_hot_buckets", 0)
    if name == "LAST_CC_ROUNDS":
        return getattr(_DIAG, "cc_rounds", 0)
    if name == "LAST_CC_CHECKPOINT_MODE":
        return getattr(_DIAG, "cc_checkpoint_mode", "local")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def signature_groups(sig: DataFrame, sig_col: str = "sig",
                     id_col: str = "doc_id") -> DataFrame:
    """Identical-signature collapse (round 11, the LSH hot-bucket
    guard): annotate each row with its signature group's
    representative (min id) and size — ONE window exchange keyed on
    the signature value itself.

    This is exact-dedup-first made STRUCTURAL: only one row per
    distinct signature enters the band self-join downstream, so a
    k-identical duplicate cluster (million-fold boilerplate is
    routine in web corpora) contributes exactly one row per band
    bucket instead of k — the within-bucket k²/2 candidate blow-up
    (8·5×10⁷ join rows for k=10⁴) becomes structurally impossible
    for identical docs, while the OUTPUT stays bit-identical: pairs
    inside a group are emitted directly (all signature-derived
    scores are reflexive — est_jaccard 1.0, Hamming 0) and
    cross-group pairs expand from the representative-level verdict
    (candidate-ness and every score are pure functions of the
    signature, so each member pair inherits its reps' result
    exactly). Returns (id, <sig_col>, rep, gsize)."""
    w = Window.partitionBy(sig_col)
    return sig.select(
        id_col, sig_col,
        F.min(id_col).over(w).alias("rep"),
        F.count(F.lit(1)).over(w).alias("gsize"))


def expand_rep_pairs(rep_pairs: DataFrame, members: DataFrame,
                     score_col: str, reflexive_score: F.Column,
                     id_a: str = "doc_a",
                     id_b: str = "doc_b") -> DataFrame:
    """Expand representative-level verdicts back to member pairs —
    the inverse of :func:`signature_groups`, shared by the minhash /
    simhash / phash band joins.

    ``rep_pairs`` is (rep_a, rep_b, <score_col>) over DISTINCT
    representatives; ``members`` is signature_groups' output.
    Cross-group member pairs inherit the rep pair's score verbatim
    (score is a function of the signature); within-group pairs are
    emitted directly with ``reflexive_score`` (identical signatures
    ⇒ est_jaccard 1.0 / Hamming 0, always past every gate, and they
    share ALL bands so they were candidates in the uncollapsed
    plan). The two sets are disjoint (same group vs different
    groups), so no distinct() is needed. Expansion joins exchange
    only narrow (id, rep) rows — the price of the guard is three
    id-width shuffles; what it removes is the quadratic
    within-bucket candidate tail."""
    idc = members.columns[0]  # signature_groups puts the id first
    ma = members.select(F.col("rep").alias("rep_a"),
                        F.col(idc).alias("_ida"))
    mb = members.select(F.col("rep").alias("rep_b"),
                        F.col(idc).alias("_idb"))
    cross = (rep_pairs.join(ma, "rep_a").join(mb, "rep_b")
             .select(F.least("_ida", "_idb").alias(id_a),
                     F.greatest("_ida", "_idb").alias(id_b),
                     score_col))
    grp = members.filter(F.col("gsize") >= 2)
    x, y = grp.alias("x"), grp.alias("y")
    within = (x.join(y, (F.col("x.rep") == F.col("y.rep"))
                     & (F.col(f"x.{idc}") < F.col(f"y.{idc}")))
              .select(F.col(f"x.{idc}").alias(id_a),
                      F.col(f"y.{idc}").alias(id_b),
                      reflexive_score.alias(score_col)))
    return cross.unionByName(within)


def minhash_pairs(spark: SparkSession, sf_dir: str,
                  hot_cap: int | None = None
                  ) -> tuple[DataFrame, DataFrame]:
    """(pairs, cached members handle): the full member-level near-dup
    pair set — :func:`minhash_rep_pairs`' representative verdicts
    expanded back through the signature groups. The CALLER owns the
    members unpersist — a query that materializes the pairs should
    release it, a caller returning the lazy pairs frame must not."""
    rep_pairs, members = minhash_rep_pairs(spark, sf_dir, hot_cap)
    pairs = expand_rep_pairs(rep_pairs, members, "est_jaccard",
                             F.lit(1.0))
    return pairs, members


def minhash_rep_pairs(spark: SparkSession, sf_dir: str,
                      hot_cap: int | None = None
                      ) -> tuple[DataFrame, DataFrame]:
    """(rep_pairs, cached members handle) — near-dup verdicts at the
    REPRESENTATIVE level (one row per distinct signature), plus the
    signature-group membership needed to expand or star them out.
    The members frame is consumed by several operators downstream,
    so it is cached here; the CALLER owns the unpersist.

    Round 11: identical signatures are collapsed to one
    representative BEFORE banding (see :func:`signature_groups` —
    output unchanged, quadratic hot-bucket candidates structurally
    impossible for duplicate clusters). ``hot_cap``, if set, is the
    second line of defense for ADVERSARIAL residual density (many
    DISTINCT signatures colliding in one band bucket): buckets whose
    representative occupancy exceeds the cap are excluded from
    candidate generation — a loud, recall-losing cut (excluded
    bucket count recorded in ``LAST_LSH_HOT_BUCKETS``; a pair
    sharing another, non-hot band is still found). The registered
    queries run with hot_cap=None: lossless."""
    sig = minhash_signatures(spark, sf_dir)
    return _rep_pairs_from(sig, sf_dir, hot_cap)


def _rep_bands(reps: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) — the LSH banding projection,
    one home (minhash_rep_pairs + dedup_lsh_occupancy)."""
    return reps.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
            lambda b: portable_hash32(F.concat_ws(",", F.transform(
                F.slice("sig", b * _R + 1, _R),
                lambda v: v.cast("string"))))
        )).alias("band_idx", "band_hash"))


def _rep_pairs_from(sig: DataFrame,
                    sf_dir: str,
                    hot_cap: int | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    # Eager fill: the pair plan scans this cache from SEVEN operators
    # (banding, both verify sides, both expansion sides, both
    # within-group sides), and Spark's cache does not deduplicate
    # IN-FLIGHT computation — concurrent first-scans each recompute
    # the expensive upstream (explode + 32-min agg; measured 4.8× on
    # the whole query at sf0.1). One count() materializes it once;
    # every consumer then reads blocks.
    members = signature_groups(sig).cache()
    members.count()
    reps = (members.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", "sig"))
    bands = _rep_bands(reps)
    # Banding self-join width scales with the corpus, not the session
    # default: at 100× sf0.1 the 32-partition default kneed
    # superlinear (~15×/decade) and SPARK_GRAFT_SHUFFLE=128 restored
    # ~6.5×/decade — so size the exchange here by data volume
    # (_auto_width, which reproduces the empirical 100×→128-partition
    # fix). Both join sides alias the SAME repartitioned frame, so
    # the exchange is planned once and reused.
    bands = bands.repartition(_auto_width(sf_dir),
                              "band_idx", "band_hash")
    if hot_cap is not None:
        # The per-bucket count pre-aggregate: a window count over the
        # ALREADY-REPARTITIONED bucket key adds no exchange. The loud
        # part (how many buckets were cut) is one extra count action,
        # paid only in probe/guard mode, recomputed from the cached
        # members frame.
        occ = Window.partitionBy("band_idx", "band_hash")
        guarded = bands.withColumn("_occ", F.count(F.lit(1)).over(occ))
        _DIAG.lsh_hot_buckets = (
            guarded.filter(F.col("_occ") > hot_cap)
            .select("band_idx", "band_hash").distinct().count())
        bands = guarded.filter(F.col("_occ") <= hot_cap).drop("_occ")
    else:
        _DIAG.lsh_hot_buckets = 0
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("rep_a"),
                    F.col("b.doc_id").alias("rep_b"))
            .distinct())
    sa = reps.select(F.col("doc_id").alias("rep_a"),
                     F.col("sig").alias("sig_a"))
    sb = reps.select(F.col("doc_id").alias("rep_b"),
                     F.col("sig").alias("sig_b"))
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y),
                           lambda eq: eq))
           .cast("double") / F.lit(float(N_HASHES)))
    rep_pairs = (cand.join(sa, "rep_a").join(sb, "rep_b")
                 .withColumn("est_jaccard", est)
                 .filter(F.col("est_jaccard") >= 0.5)
                 .select("rep_a", "rep_b", "est_jaccard"))
    return rep_pairs, members


def member_star_edges(members: DataFrame) -> DataFrame:
    """(src=rep, dst=member) star edges for every multi-doc signature
    group — CONNECTIVITY-equivalent to the group's k²/2 within pairs
    (every member reaches every other through the rep), with k-1
    edges instead: the same linearization exact_dup_star_edges does
    for sha groups, applied to identical minhash signatures. Min-label
    CC over stars + rep-level pairs yields the same components and
    the same min labels as CC over the full expanded pair graph, so
    the cluster queries never materialize a quadratic edge set."""
    return (members.filter((F.col("gsize") >= 2)
                           & (F.col(members.columns[0]) != F.col("rep")))
            .select(F.col("rep").alias("src"),
                    F.col(members.columns[0]).alias("dst")))


def _lsh_occupancy_oracle_sql() -> str:
    """DuckDB replay of the occupancy histogram: same signature
    CTEs, reps = one doc per distinct signature, same banding, then
    the two-level count."""
    return f"""
    WITH {_minhash_pair_ctes()},
    repids AS (
      SELECT MIN(doc_id) AS doc_id FROM sigarr GROUP BY sig
    ), rb AS (
      SELECT b.band_idx, b.band_hash
      FROM bands b JOIN repids r USING (doc_id)
    ), occ AS (
      SELECT band_idx, band_hash, COUNT(*) AS occupancy
      FROM rb GROUP BY 1, 2
    )
    SELECT occupancy, COUNT(*) AS n_buckets
    FROM occ GROUP BY occupancy
    """


@register("dedup_lsh_occupancy", oracle=_lsh_occupancy_oracle_sql(),
          tags=("dedup", "diagnostics"))
def dedup_lsh_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket occupancy HISTOGRAM at the representative
    level — the per-bucket count pre-aggregate behind the round-11
    hot-bucket guard, exposed as a first-class diagnostic: a corpus
    whose histogram grows a heavy tail is densifying (many DISTINCT
    signatures colliding per bucket — the regime where `hot_cap`
    becomes the lever), while a duplicate-heavy corpus stays
    invisible here BECAUSE the collapse already folded it (identical
    signatures are one rep). What a 100 TB operator runs before
    choosing dedup knobs; candidate volume ≈ Σ occupancy·(occupancy
    −1)/2 per band. Returns (occupancy, n_buckets)."""
    sig = minhash_signatures(spark, sf_dir)
    reps = (sig.groupBy("sig").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "sig"))
    occ = (_rep_bands(reps)
           .groupBy("band_idx", "band_hash")
           .agg(F.count(F.lit(1)).alias("occupancy")))
    return (occ.groupBy("occupancy")
            .agg(F.count(F.lit(1)).alias("n_buckets")))


SIMHASH_BITS = 60      # 15 md5 hex chars — the portable width
SIMHASH_CHUNKS = 4     # 15-bit chunks; Hamming ≤3 ⇒ ≥1 chunk equal


def _simhash_oracle_sql() -> str:
    """DuckDB SQL recomputing the EXACT simhash pipeline — same
    md5-derived 60-bit token hash, same majority vote, chunking and
    Hamming gate — so pairs are value-hashed, not rows-only."""
    b, nc = SIMHASH_BITS, SIMHASH_CHUNKS
    w = b // nc
    votes = ", ".join(
        f"SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(b))
    simhash = " + ".join(
        f"(CAST(CASE WHEN v{i} > 0 THEN 1 ELSE 0 END AS BIGINT) << {i})"
        for i in range(b))
    chunks = ", ".join(f"(simhash >> {w * c}) & {(1 << w) - 1}"
                       for c in range(nc))
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(UNNEST(string_split(text, ' '))),
                   1, 15)) AS BIGINT) AS th
      FROM documents
    ), votes AS (
      SELECT doc_id, {votes} FROM tok GROUP BY doc_id
    ), sim AS (
      SELECT doc_id, {simhash} AS simhash FROM votes
    ), chunks AS (
      SELECT doc_id, simhash, c.c AS chunk_idx,
             ([{chunks}])[c.c + 1] AS chunk_val
      FROM sim, range(0, {nc}) AS c(c)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                      b.doc_id AS doc_b, b.simhash AS sim_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """


# Manku-style block keys (round 7): 60 bits → 6 blocks of 10; a
# candidate key is the concatenation of any 3 blocks (C(6,3) = 20
# tables). 3 flipped bits touch ≤3 blocks, so every pair within
# Hamming radius 3 shares at least one fully-intact 3-block combo —
# the same completeness guarantee as 4×15-bit chunks, but over a
# 2^30 key space instead of 2^15: with FIXED chunk space, bucket
# occupancy grows linearly with the corpus and within-bucket pair
# generation goes QUADRATIC (the round-7 100× probe measured the
# 4-chunk form at 34.6×/13.7× per decade — the exact trap
# dedup_embed_cosine's adaptive-bits note describes).
SIMHASH_BLOCKS = 6
SIMHASH_BLOCK_W = SIMHASH_BITS // SIMHASH_BLOCKS  # 10 bits
SIMHASH_COMBOS: list[tuple[int, int, int]] = [
    (a, b, c)
    for a in range(SIMHASH_BLOCKS)
    for b in range(a + 1, SIMHASH_BLOCKS)
    for c in range(b + 1, SIMHASH_BLOCKS)]


@register("dedup_simhash", oracle=_simhash_oracle_sql(),
          tags=("dedup", "approx"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit signature from md5-derived
    token hashes (bitwise majority vote), candidates via 3-of-6
    block-combination keys (complete for Hamming radius 3 — see
    SIMHASH_COMBOS note), verified with bit_count(xor) ≤ 3.

    Scale shape (both round-7 fixes measured on the 100× probe):
    - docs are hash-REPARTITIONED by doc_id (width sized from table
      bytes) before the token explode, so the 60-column vote
      aggregate runs exchange-free on co-partitioned input and its
      per-partition hash-map state is bounded by the partition's own
      keys — the previous round-robin fanout let every partition's
      partial-agg map grow to the FULL corpus key set (8 GB of agg
      state at 100×: spill storms, then OOM).
    - candidate keys live in a 2^30 space, so bucket occupancy stays
      ~0 at any realistic corpus and pair generation is linear in
      true near-dups, not quadratic in corpus size.
    The DuckDB oracle keeps the simpler 4×15-bit chunk generator —
    both generators are COMPLETE for radius 3, and the Hamming gate
    makes the final pair set identical, so the value check pins that
    the plan change preserved semantics."""
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(_auto_width(sf_dir), "doc_id"))
    nb, w = SIMHASH_BITS, SIMHASH_BLOCK_W
    mask = (1 << w) - 1
    tok = docs.select(
        "doc_id", F.explode(_tokens()).alias("token")
    ).withColumn("th", F.conv(
        F.substring(F.md5(F.encode("token", "utf-8")), 1, 15),
        16, 10).cast("long"))
    # Majority vote per bit: sum(+1/-1) over tokens, bit set if > 0.
    votes = tok.groupBy("doc_id").agg(*[
        F.sum(F.when(F.expr(f"(th >> {i}) & 1") == 1, 1).otherwise(-1))
        .alias(f"v{i}") for i in range(nb)])
    sim = votes.select("doc_id", F.expr(
        " + ".join(f"(CAST(CASE WHEN v{i} > 0 THEN 1 ELSE 0 END AS BIGINT)"
                   f" << {i})" for i in range(nb))).alias("simhash"))
    # Round 11 hot-bucket guard: collapse identical simhash values to
    # one representative before the block-combo join (see
    # signature_groups — candidate-ness and Hamming are pure
    # functions of the simhash, so expansion preserves the output
    # exactly; within-group pairs are Hamming 0 by identity). The
    # members frame feeds three consumers, and its upstream (token
    # explode + 60-column vote) is the expensive stage — one eager
    # localCheckpoint materializes it once (lineage truncated,
    # blocks owned by the ContextCleaner, released on GC — no
    # caller-owned cache to leak from a registered entry point).
    members = signature_groups(sim, sig_col="simhash") \
        .localCheckpoint(eager=True)
    reps = (members.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", "simhash"))
    keys = reps.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.expr(f"(((simhash >> {w * c0}) & {mask}) << {2 * w}) | "
                   f"(((simhash >> {w * c1}) & {mask}) << {w}) | "
                   f"((simhash >> {w * c2}) & {mask})")
            for c0, c1, c2 in SIMHASH_COMBOS
        ])).alias("combo_idx", "combo_key"))
    a, b = keys.alias("a"), keys.alias("b")
    cand = (a.join(b, (F.col("a.combo_idx") == F.col("b.combo_idx"))
                   & (F.col("a.combo_key") == F.col("b.combo_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("rep_a"),
                    F.col("a.simhash").alias("sim_a"),
                    F.col("b.doc_id").alias("rep_b"),
                    F.col("b.simhash").alias("sim_b"))
            .distinct())
    # cast both sides to int32 explicitly: Spark bit_count returns
    # INT but DuckDB's returns TINYINT — exact schema parity is one
    # cast away (round-7 judge note), so take it on both sides
    rep_pairs = (cand.withColumn(
        "hamming", F.expr("bit_count(sim_a ^ sim_b)").cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("rep_a", "rep_b", "hamming"))
    return expand_rep_pairs(rep_pairs, members, "hamming",
                            F.lit(0).cast("int"))


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word
      FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.word = b.word AND b.doc_id = a.doc_id + 1
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.3
    """,
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard between adjacent doc ids (the
    candidate-pair generator is pluggable; adjacent ids keep the
    oracle exact while exercising the full set-similarity plumbing:
    explode → distinct → pair join → intersection/union counts)."""
    docs = fanout(load(spark, sf_dir, "documents"))
    tok = (docs.select("doc_id", F.explode(_tokens()).alias("word"))
           .distinct())
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (a.join(b, (F.col("a.word") == F.col("b.word"))
                    & (F.col("b.doc_id") == F.col("a.doc_id") + 1))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("i")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (F.col("i").cast("double")
           / (F.col("na") + F.col("nb") - F.col("i")))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= 0.3)
            .select("doc_a", "doc_b", "jaccard"))


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation with a
    CONVERGENCE CHECK — the general CC building block for dedup
    clustering (exact-dup stars converge in 1 round; near-dup CHAINS
    need O(diameter) rounds, which a fixed round count gets wrong).

    ``edges`` is a directed (src, dst) pair list; it is symmetrized
    here. Each round is one join + one min-agg (label := min of own
    and neighbors' labels). Min-label propagation is MONOTONE — the
    non-negative label sum strictly decreases until fixpoint — so
    convergence is detected with one cheap DECIMAL(38,0) sum
    aggregate per round instead of a label-diff join. Each round's
    labels are ``localCheckpoint``-ed: iterative self-joins otherwise
    double the lineage per round, and at 100 TB the un-truncated plan
    re-reads the corpus every iteration. Under
    ``SPARK_GRAFT_PROFILE=cluster`` (profile.py, round 13) each round
    uses a reliable ``checkpoint()`` to the configured directory
    instead — on a real cluster a localCheckpoint dies with its
    executor and every later round becomes unrecoverable. The mode
    actually used is recorded in ``LAST_CC_CHECKPOINT_MODE``;
    both variants are output-pinned identical in tests/test_round13.

    Returns (doc_id, label) for every vertex that appears in edges.
    The module-level ``LAST_CC_ROUNDS`` records how many propagation
    rounds the most recent call took (diagnostics for scale probes;
    the number of rounds ≈ graph diameter is the quantity that grows
    with cluster CHAIN length, not with corpus size).
    """
    from ..profile import ensure_checkpoint_dir, is_cluster

    if is_cluster():
        ckpt_root = ensure_checkpoint_dir(edges.sparkSession)
        _DIAG.cc_checkpoint_mode = "reliable"
        # Reliable checkpoints are NOT reclaimed by the
        # ContextCleaner (unlike localCheckpoint blocks) unless
        # spark.cleaner.referenceTracking.cleanCheckpoints is set —
        # and even then only on driver GC of the RDD. Left alone,
        # every CC round leaks a labels-sized rdd-* directory, so a
        # graph-family sweep fills the checkpoint storage. Each round
        # therefore deletes the PREVIOUS round's directory as soon as
        # the new checkpoint is materialized (eager=True returns only
        # after the files exist; checkpoint data never references the
        # prior round's files — lineage is truncated INTO the new
        # directory). The final round's single directory is retained:
        # the returned DataFrame reads it lazily, so it can only be
        # reclaimed by the caller / storage lifecycle — O(1) dirs per
        # call instead of O(rounds). Local-filesystem roots only (the
        # local-mode stand-in); on shared storage (hdfs:/s3:) the
        # walk is skipped and the deployment's lifecycle policy owns
        # cleanup.
        local_root = ckpt_root.split(":", 1)[-1] \
            if ckpt_root.startswith("file:") else ckpt_root
        cleanup = "://" not in ckpt_root and os.path.isdir(local_root)
        prev_dirs: list[str] = []

        def _rdd_dirs() -> set[str]:
            return {os.path.join(base, name)
                    for base, dirs, _ in os.walk(local_root)
                    for name in dirs if name.startswith("rdd-")}

        def _ckpt(df: DataFrame) -> DataFrame:
            nonlocal prev_dirs
            if not cleanup:
                return df.checkpoint(eager=True)
            before = _rdd_dirs()
            out = df.checkpoint(eager=True)
            fresh = _rdd_dirs() - before
            for stale in prev_dirs:
                shutil.rmtree(stale, ignore_errors=True)
            prev_dirs = sorted(fresh)
            return out
    else:
        _DIAG.cc_checkpoint_mode = "local"

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    def _ckpt_observing_sum(df: DataFrame) -> tuple[DataFrame, object]:
        # Round 14 (guide §1.2, don't compute twice): the convergence
        # sum used to be a SECOND job per round — a full agg pass over
        # the labels the eager checkpoint had just materialized. An
        # Observation piggybacks the same DECIMAL(38,0) sum on the
        # checkpoint's own materialization action (CollectMetrics is
        # a pass-through node; the checkpointed plan is unchanged
        # downstream because checkpoint truncates lineage), so each CC
        # round is ONE job and labels are scanned once, not twice.
        obs = Observation()
        out = _ckpt(df.observe(
            obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("s")))
        return out, obs.get["s"]

    sym = edges.select(F.col("src").cast("long").alias("src"),
                       F.col("dst").cast("long").alias("dst"))
    sym = sym.unionByName(sym.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))).cache()
    labels, prev_sum = _ckpt_observing_sum(
        sym.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id")))
    for rounds in range(1, max_iter + 1):
        _DIAG.cc_rounds = rounds
        neigh = (sym.join(labels, sym.src == labels.doc_id)
                 .groupBy(F.col("dst").alias("doc_id"))
                 .agg(F.min("label").alias("neigh_label")))
        labels, cur_sum = _ckpt_observing_sum(
            labels.join(neigh, "doc_id", "left")
            .select("doc_id",
                    F.least("label",
                            F.coalesce("neigh_label", "label"))
                    .alias("label")))
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # Exhausting max_iter without hitting the fixpoint would
        # silently return UNDER-MERGED clusters (a >max_iter-diameter
        # chain) — the failure mode the convergence check exists to
        # prevent; fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds; raise max_iter (graph diameter exceeds it)")
    sym.unpersist()
    return labels


def _cluster_output(labels: DataFrame) -> DataFrame:
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "label")
            .filter(F.col("cluster_size") >= 2)
            .select("doc_id", F.col("label").alias("cluster_id"),
                    "cluster_size"))


@register("dedup_clusters", oracle=_clusters_oracle_sql(True),
          tags=("dedup", "iterative"))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the duplicate
    graph — the step after pair detection in a real dedup pipeline
    (keep one representative per cluster). The edge set is the UNION
    of exact-dup star edges and MinHash-LSH near-dup pairs, the shape
    a production pipeline feeds its CC step (exact dups are a strict
    subset of near-dups only when the estimator is perfect, so both
    sources are kept; union+distinct dedups overlap).

    Exact-edge generation is LINEAR, not quadratic: a sha-equality
    self-join emits k²/2 pairs for a k-copy group (a 10⁵-copy
    boilerplate group — routine in web corpora — would emit 10¹⁰
    edges), so instead each group's hub is ``min(doc_id)`` per
    content hash and every other member links to the hub: k-1
    STAR edges, same connectivity, same clusters. One hash-agg plus
    one join back; the text itself never shuffles (only the 32-byte
    digest does). CC then runs via :func:`connected_components`
    (O(diameter) rounds with a fixpoint stop — near-dup chains give
    the graph real diameter, unlike pure stars).
    Returns (doc_id, cluster_id, cluster_size) for docs in clusters
    of ≥2. Oracled since round 8: the EXECUTION stays the iterative
    O(diameter) loop (the 100 TB plan), but the ANSWER is
    SQL-expressible — a DuckDB recursive-CTE transitive closure over
    the same (fully oracled) edge set re-derives every min-label
    cluster assignment, so the convergence loop is value-checked,
    not just planted-tested. Planted-cluster behavior (edge
    linearity included) stays pinned in tests.
    """
    docs = load(spark, sf_dir, "documents")
    # Round 11: CC consumes the LINEAR rep-level graph — rep pairs +
    # signature-group stars (see member_star_edges) — instead of the
    # expanded member pairs. Same components, same min labels; a
    # 10k-identical boilerplate cluster contributes 10⁴ star edges
    # where the expanded pair graph holds 5×10⁷.
    rep_pairs, members = minhash_rep_pairs(spark, sf_dir)
    near = (rep_pairs.select(F.col("rep_a").alias("src"),
                             F.col("rep_b").alias("dst"))
            .unionByName(member_star_edges(members)))
    edges = exact_dup_star_edges(docs).unionByName(near).distinct()
    try:
        labels = connected_components(edges)
    finally:
        # CC materialized the edge graph (eager localCheckpoints), so
        # the members cache has no further reader — release it
        # rather than pinning executor storage for the session's
        # lifetime (finally: a CC convergence failure must not leak
        # the cache either, or every retry pins another copy)
        members.unpersist()
    return _cluster_output(labels)


def exact_dup_star_edges(docs: DataFrame) -> DataFrame:
    """k-1 star edges per exact-duplicate group (hub = min doc_id).
    Linear in group size where a sha self-join is quadratic; tested
    directly (100-copy group → exactly 99 edges)."""
    sha = docs.select("doc_id", F.sha2("text", 256).alias("content_sha"))
    hubs = sha.groupBy("content_sha").agg(F.min("doc_id").alias("hub"))
    return (sha.join(hubs, "content_sha")
            .filter(F.col("doc_id") != F.col("hub"))
            .select(F.col("hub").alias("src"),
                    F.col("doc_id").alias("dst")))


@register("dedup_clusters_neardup", oracle=_clusters_oracle_sql(False),
          tags=("dedup", "iterative", "approx"))
def dedup_clusters_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate clusters: connected components over the
    MinHash-LSH candidate-pair graph (``dedup_minhash_lsh``'s
    est-Jaccard ≥ 0.5 pairs as edges).

    Unlike exact-dup stars, near-dup graphs have real CHAINS (A≈B,
    B≈C, … with A and Z not directly similar), so graph diameter is
    unbounded — this is exactly the case where a fixed round count
    silently under-merges. :func:`connected_components`' convergence
    loop runs O(diameter) rounds and stops at the fixpoint (pinned by
    a planted chain-of-7 test). Returns (doc_id, cluster_id,
    cluster_size) for near-dup clusters of ≥2 docs. Oracled since
    round 8 via the same recursive-CTE closure as dedup_clusters,
    minus the exact-dup star edges.
    """
    # Rep-level graph (round 11): rep pairs + group stars — same
    # components and labels as the expanded pair graph, linear edges
    # (see dedup_clusters / member_star_edges).
    rep_pairs, members = minhash_rep_pairs(spark, sf_dir)
    edges = (rep_pairs.select(F.col("rep_a").alias("src"),
                              F.col("rep_b").alias("dst"))
             .unionByName(member_star_edges(members)))
    try:
        labels = connected_components(edges)
    finally:
        members.unpersist()  # CC materialized the graph; no further reader
    return _cluster_output(labels)


BLOCK_W = 8  # tokens per sub-document block


@register(
    "dedup_subdoc_blocks",
    oracle=f"""
    WITH blocks AS (
      SELECT doc_id,
             list_aggregate(toks[b*{BLOCK_W}+1 : b*{BLOCK_W}+{BLOCK_W}],
                            'string_agg', ' ') AS block
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents) t,
           UNNEST(range(len(toks) // {BLOCK_W})) AS u(b)
    ), shared AS (
      SELECT block FROM blocks GROUP BY block
      HAVING COUNT(DISTINCT doc_id) > 1
    ), per_doc AS (
      SELECT b.doc_id, COUNT(*) AS n_blocks,
             COUNT(s.block) AS n_shared_blocks
      FROM blocks b LEFT JOIN shared s USING (block)
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_blocks, 0) AS n_blocks,
           COALESCE(p.n_shared_blocks, 0) AS n_shared_blocks
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("dedup", "pipeline"),
)
def dedup_subdoc_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at token-block granularity: split each doc
    into consecutive non-overlapping 8-token blocks and count, per
    doc, how many of its blocks also occur in some other document —
    the C4/RefinedWeb-style repeated-boilerplate signal that
    document-level hashing misses.

    Spark side groups on the 64-bit block hash, never block text, so
    the shuffle carries (8-byte hash, doc_id) pairs only; block
    occurrence counting is one hash aggregate with map-side partial
    (two distinct doc_ids suffice → ``count_distinct`` over a
    bounded-cardinality key). The oracle groups on the block string —
    identical up to 64-bit hash collisions.
    """
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    nblk = F.size(toks).cast("long") / F.lit(BLOCK_W)
    nblk = F.floor(nblk).cast("int")
    block_arr = F.when(nblk >= 1, F.transform(
        F.sequence(F.lit(0), nblk - 1),
        lambda b: F.concat_ws(" ", F.slice(toks, b * BLOCK_W + 1, BLOCK_W)))
    ).otherwise(F.array().cast("array<string>"))
    blocks = (fanout(docs).select("doc_id", F.explode(block_arr).alias("block"))
              .select("doc_id", F.xxhash64("block").alias("bh")))
    shared = (blocks.groupBy("bh")
              .agg(F.count_distinct("doc_id").alias("nd"))
              .filter(F.col("nd") > 1)
              .select("bh"))
    per_doc = (blocks.join(shared.withColumn("is_shared", F.lit(1)),
                           "bh", "left")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_blocks"),
                    F.count("is_shared").alias("n_shared_blocks")))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
                    F.coalesce("n_shared_blocks", F.lit(0))
                    .alias("n_shared_blocks")))


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND length(a.c_name) = length(b.c_name)
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    tags=("dedup", "join"),
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record-matching: all same-length name pairs within edit
    distance 1, via WILDCARD-PROJECTION blocking — an exact,
    deterministic LSH. Each name emits one key per character
    position (that character replaced by a sentinel); two equal-
    length names are ≤1 substitution apart IFF they share a key, so
    the equi-join's candidate set IS the answer set — no quadratic
    within-block pair blowup, no misses.

    All-pairs levenshtein is O(N²·L²) and unrunnable at scale (the
    oracle brute-forces it — affordable only at oracle SF); a naive
    prefix block is data-dependent: Σ|block|² candidate pairs that
    all pay a full DP verify (an earlier prefix-16 draft spent 5.8 s
    at sf0.1 on ~740 k candidates, and its block could only see
    last-2-char variants — incomplete recall on top). Here the
    shuffle carries L short keys per name (L ≈ 18), join output ≈
    |answer|, and the levenshtein call survives only as a per-pair
    assertion. Same candidates-then-verify contract as
    dedup_minhash_lsh, with exact recall — hence oracled, where the
    sketch ops are rows-only. custkey-a < custkey-b canonicalizes
    pair order; a distance-0 pair matches on EVERY position, so the
    join emits it L times — deduped on the KEY pair (not the name
    projection: with 3+ customers sharing a name the oracle emits
    one row per key pair, and a name-level distinct would collapse
    them and break row-count parity).
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # key i = name with char i replaced by a NUL sentinel, then
    # xxhash64-ed so the self-join exchange carries 8-byte longs
    # instead of ~18-char strings (round-2 judge ask). Hashing
    # preserves every true collision (equal keys hash equal → no
    # recall loss); the exactness guard moves to the verify: the
    # levenshtein ≤ 1 + equal-length filters re-check the full
    # oracle predicate, so even a 2⁻⁶⁴ hash collision (possibly
    # across different-length names) can never emit a wrong pair.
    keyed = fanout(cust).select(
        "c_custkey", "c_name",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("c_name")),
            lambda i: F.xxhash64(F.concat(
                F.substr(F.col("c_name"), F.lit(1), i - F.lit(1)),
                F.lit("\x00"),
                F.substr(F.col("c_name"), i + F.lit(1),
                         F.length("c_name")))))).alias("wk"))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (a.join(b, (F.col("a.wk") == F.col("b.wk"))
                   & (F.col("a.c_custkey") < F.col("b.c_custkey")))
            .select(F.col("a.c_custkey").alias("key_a"),
                    F.col("b.c_custkey").alias("key_b"),
                    F.col("a.c_name").alias("name_a"),
                    F.col("b.c_name").alias("name_b"),
                    F.levenshtein("a.c_name", "b.c_name")
                    .cast("bigint").alias("edit_dist"))
            .filter((F.col("edit_dist") <= 1)
                    & (F.length("name_a") == F.length("name_b")))
            .dropDuplicates(["key_a", "key_b"])
            .select("name_a", "name_b", "edit_dist"))
