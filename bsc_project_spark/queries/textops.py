"""Training-data pipeline text operators: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard), language-ID heuristic, quality scoring, token
counting, document fingerprinting.

These go beyond the reference's own operator set (it has no corpus-level
text ops) but are first-class for a 100 TB extraction engine.  All hashing
is md5-based so the Spark side and the DuckDB oracle compute IDENTICAL
values (engine-native hash functions differ across engines and would break
the value-hash comparison).
"""

from __future__ import annotations

from . import QuerySpec, register_views, sql_query

QUERIES: dict[str, QuerySpec] = {}


def _q(name: str, spark_sql: str, duck_sql: str, description: str = "") -> None:
    QUERIES[name] = QuerySpec(spark=sql_query(spark_sql), oracle=duck_sql, description=description)


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy, min-id survivor
# ---------------------------------------------------------------------------

_DEDUP_EXACT_SQL = """
    SELECT md5(text) AS content_key, min(doc_id) AS keeper, count(*) AS n_copies
    FROM documents GROUP BY 1
"""
_q("q_dedup_exact", _DEDUP_EXACT_SQL, _DEDUP_EXACT_SQL,
   "exact dedup via content-hash groupBy; survivor = min doc_id")

_DEDUP_SURVIVORS_SQL = """
    SELECT doc_id FROM (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM documents
    ) WHERE doc_id = keeper
"""
_q("q_dedup_survivors", _DEDUP_SURVIVORS_SQL, _DEDUP_SURVIVORS_SQL,
   "documents surviving exact dedup")

# ---------------------------------------------------------------------------
# Character-shingle machinery (8-grams, stride 4) — the shared substrate for
# n-gram Jaccard / MinHash / SimHash.  Spark: sequence+transform+explode;
# DuckDB: lateral unnest(generate_series).
# ---------------------------------------------------------------------------

# the inner REPARTITION spreads the DOC rows before the explode: the
# documents parquet is one row group -> one scan task, so the shingle
# explode (and any md5 work stacked on it) otherwise runs on one core.
# DISTINCT (doc_id, s) is PER-DOC distinctness, so it is computed with
# array_distinct BEFORE the explode — a narrow array op instead of a
# full corpus-wide exchange of every shingle row (the oracle keeps the
# declarative SELECT DISTINCT; the exploded multisets are identical)
_SHINGLES_SPARK = """
      SELECT doc_id,
             explode(array_distinct(
               transform(sequence(1, greatest(length(text) - 7, 1), 4),
                         i -> substring(text, i, 8)))) AS s
      FROM (SELECT /*+ REPARTITION(__P__) */ * FROM {src} t0) t
"""

_SHINGLES_DUCK = """
      SELECT DISTINCT doc_id, substring(text, g.i, 8) AS s
      FROM {src} t,
      LATERAL (SELECT unnest(generate_series(1, greatest(length(t.text) - 7, 1), 4)) AS i) g
"""


def _p_sub(spark, sql: str) -> str:
    """Resolve the __P__ parallelism token for DIRECT spark.sql callers
    (registered SQL texts go through sql_query, which does the same)."""
    return sql.replace(
        "__P__", str(max(spark.sparkContext.defaultParallelism, 1))
    )


def _shingle_query(body: str, src: str = "documents") -> tuple[str, str]:
    spark = body.format(shingles=_SHINGLES_SPARK.format(src=src))
    duck = body.format(shingles=_SHINGLES_DUCK.format(src=src))
    return spark, duck


# n-gram Jaccard between consecutive-id documents (a real shingle join with
# guaranteed non-empty output; near-dup detection at scale uses the same
# plan with an LSH bucket join instead of the id+1 predicate)
_JACCARD_BODY = """
    WITH d AS ({shingles}),
    sizes AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, count(*) AS i
      FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND a.s = b.s
      GROUP BY a.doc_id
    )
    SELECT sa.doc_id AS a_id, sa.doc_id + 1 AS b_id,
           round(coalesce(i.i, 0) * 1e0 / (sa.n + sb.n - coalesce(i.i, 0)), 6) AS jaccard
    FROM sizes sa
    JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
    LEFT JOIN inter i ON i.a_id = sa.doc_id
"""
_q("q_ngram_jaccard", *_shingle_query(_JACCARD_BODY),
   description="character-8-gram Jaccard similarity of adjacent doc pairs")

# ---------------------------------------------------------------------------
# MinHash signatures (k=8, md5-keyed so both engines agree).
#
# All 8 seeds are computed as 8 min-aggregates in ONE group-by over the
# shingle set (one shuffle of the shingle rows with map-side partial mins)
# instead of a seeds CROSS JOIN that blew the shingle table up 8x before
# aggregating (round-1 shape, 8.6 s at sf0.1 for q_lsh_pairs).  The wide
# signature row then unpivots: Spark stack() / DuckDB UNPIVOT, both reading
# the wide CTE exactly once.
# ---------------------------------------------------------------------------

_N_SEEDS = 8

# One md5 per shingle, then 8 integer permutations h_i(v) = (a_i*v + b_i)
# mod P over the md5's leading 8 hex chars (v < 2^32; a_i < 2^20 keeps
# a_i*v + b_i < 2^53, exact in int64 in BOTH engines).  Round 1 hashed
# md5(concat(seed, ':', s)) per seed — 8 md5 passes over every shingle and
# 32-char string mins; this is 1 md5 + 8 multiply-adds, the signatures
# shrink to int64 (4x narrower shuffle rows), and min() compares integers.
# The hex parse is the same instr() digit trick both engines share for
# SimHash, so the oracle computes bit-identical values.
_MH_P = 2_147_483_647
_MH_A = [1_000_003 + 7_919 * i for i in range(_N_SEEDS)]
_MH_B = [104_729 + 1_299_709 * i for i in range(_N_SEEDS)]

_HEX8_FROM_H = " + ".join(
    # CAST per digit: instr yields INT32 and digit*16^7 overflows it under
    # Spark's default ANSI arithmetic
    f"CAST(instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)

_MINHASH_WIDE_AGGS = ", ".join(
    f"min(({_MH_A[seed]} * v + {_MH_B[seed]}) % {_MH_P}) AS m{seed}"
    for seed in range(_N_SEEDS)
) + ", count(*) AS n_shingles"  # d is DISTINCT, so this IS the set size —
# the estimator's Jaccard denominator comes free with the signature pass

_MINHASH_WIDE = """
    WITH d AS ({shingles}),
    hv AS (
      SELECT doc_id, CAST({hex8} AS BIGINT) AS v
      FROM (SELECT doc_id, md5(s) AS h FROM d)
    ),
    wide AS (SELECT doc_id, {aggs} FROM hv GROUP BY doc_id)
"""


def _minhash_wide(shingles: str) -> str:
    return _MINHASH_WIDE.format(
        shingles=shingles, hex8=_HEX8_FROM_H, aggs=_MINHASH_WIDE_AGGS
    )


_SIG_STACK_SPARK = ", ".join(f"'m{seed}', m{seed}" for seed in range(_N_SEEDS))
_SIG_UNPIVOT_DUCK = ", ".join(f"m{seed}" for seed in range(_N_SEEDS))

# Spark side reads the persisted PLANTED signature frame (mh_wide,
# shared with the LSH/estimator/cluster queries) filtered to original
# docs: per-doc signatures are independent of the rest of the corpus, so
# the planted clones' rows (doc_id >= 1000000) are the only difference —
# and a real dedup pipeline serves signature lookups from exactly this
# materialized table.  The oracle computes the same signatures from
# documents directly.
_MINHASH_SIG_SPARK = f"""
    WITH wide AS (SELECT * FROM mh_wide WHERE doc_id < 1000000)
    SELECT doc_id, CAST(substring(nm, 2) AS BIGINT) AS seed, minh
    FROM (SELECT doc_id, stack({_N_SEEDS}, {_SIG_STACK_SPARK}) AS (nm, minh) FROM wide)
"""

_MINHASH_SIG_DUCK = f"""
    {_minhash_wide(_SHINGLES_DUCK.format(src="documents"))},
    unp AS (UNPIVOT wide ON {_SIG_UNPIVOT_DUCK} INTO NAME nm VALUE minh)
    SELECT doc_id, CAST(substring(nm, 2) AS BIGINT) AS seed, minh FROM unp
"""


def _minhash_sig_spark(spark, sf_dir: str):
    _planted_minhash_views(spark, sf_dir)
    return spark.sql(_MINHASH_SIG_SPARK)


QUERIES["q_minhash_sig"] = QuerySpec(
    spark=_minhash_sig_spark,
    oracle=_MINHASH_SIG_DUCK,
    description="k=8 MinHash signatures over char shingles (one grouped "
    "pass, 8 min-aggs, served from the materialized signature table)",
)

# ---------------------------------------------------------------------------
# MinHash + LSH band join over a corpus with planted duplicates
# (doc_id + 1000000 clones every 50th doc) — end-to-end near-dup discovery.
# Band signature = the band's two minhashes in sorted order (identical to the
# round-1 min/max-over-band formulation); 4 bands of 2 seeds, OR-amplified.
# ---------------------------------------------------------------------------

_PLANTED = """(
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
    )"""

_N_BANDS = _N_SEEDS // 2


def _band_sig(b: int) -> str:
    # explicit CAST: the minhashes are BIGINT now and concat's implicit
    # numeric->string coercion differs across engines/ANSI modes
    lo, hi = 2 * b, 2 * b + 1
    return (
        f"concat(CAST(least(m{lo}, m{hi}) AS STRING), ':', "
        f"CAST(greatest(m{lo}, m{hi}) AS STRING))"
    )


_BANDS_STACK_SPARK = ", ".join(f"'s{b}', {_band_sig(b)}" for b in range(_N_BANDS))
_BANDS_WIDE_DUCK = ", ".join(f"{_band_sig(b)} AS s{b}" for b in range(_N_BANDS))
_BANDS_UNPIVOT_DUCK = ", ".join(f"s{b}" for b in range(_N_BANDS))

_LSH_JOIN = """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_bands
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    GROUP BY 1, 2
"""

def _planted_minhash_views(spark, sf_dir: str) -> None:
    """Materialize the planted-corpus shingle table and wide MinHash
    signatures ONCE as persisted temp views (``mh_shingles`` / ``mh_wide``).

    The band self-join and the estimator query reference these relations
    two and five times respectively; as inlined CTEs Spark replans the
    scan+explode+md5+groupBy subtree per reference (~30 parquet scans in
    q_minhash_est's round-2 plan).  Persisting turns every reference into
    an InMemoryRelation read — the 100 TB analogue is a materialized
    signature table, which a real dedup pipeline keeps anyway because
    signatures feed banding, estimator tuning AND incremental re-dedup."""
    register_views(spark, sf_dir)
    # the shingle view stays UNPERSISTED: materializing ~10^5 8-char rows
    # costs more than the explode recompute it saves (measured at sf0.1);
    # only the skinny per-doc signature frame is worth caching
    d = spark.sql(_p_sub(spark, _SHINGLES_SPARK.format(src=_PLANTED)))
    d.createOrReplaceTempView("mh_shingles")
    wide = spark.sql(
        f"""
        SELECT doc_id, {_MINHASH_WIDE_AGGS}
        FROM (SELECT doc_id, CAST({_HEX8_FROM_H} AS BIGINT) AS v
              FROM (SELECT doc_id, md5(s) AS h FROM mh_shingles))
        GROUP BY doc_id
        """
    ).persist()
    wide.createOrReplaceTempView("mh_wide")


_LSH_PAIRS_SPARK_BODY = f"""
    WITH wide AS (SELECT * FROM mh_wide),
    bands AS (
      SELECT doc_id, stack({_N_BANDS}, {_BANDS_STACK_SPARK}) AS (band, bsig) FROM wide
    )
    {_LSH_JOIN}
"""


def _lsh_pairs_spark(spark, sf_dir: str):
    _planted_minhash_views(spark, sf_dir)
    return spark.sql(_LSH_PAIRS_SPARK_BODY)


_LSH_PAIRS_DUCK = f"""
    {_minhash_wide(_SHINGLES_DUCK.format(src=_PLANTED))},
    wideb AS (SELECT doc_id, {_BANDS_WIDE_DUCK} FROM wide),
    bands AS (UNPIVOT wideb ON {_BANDS_UNPIVOT_DUCK} INTO NAME band VALUE bsig)
    {_LSH_JOIN}
"""

QUERIES["q_lsh_pairs"] = QuerySpec(
    spark=_lsh_pairs_spark,
    oracle=_LSH_PAIRS_DUCK,
    description="MinHash-LSH band-bucket join surfacing planted near-dup pairs",
)

# ---------------------------------------------------------------------------
# MinHash estimator quality: for every LSH candidate pair, the
# signature-estimated Jaccard (fraction of agreeing seeds) next to the
# exact shingle Jaccard.  This is the measurement a dedup pipeline runs to
# pick its band/seed configuration; at scale the exact half is computed on
# a SAMPLE of candidate pairs while the estimate is free (signatures
# already exist).  One shingle table feeds signatures, candidates and the
# exact intersection — Catalyst reuses the CTE scan.
# ---------------------------------------------------------------------------

_EST_AGREE = " + ".join(
    f"(CASE WHEN wa.m{s} = wb.m{s} THEN 1 ELSE 0 END)" for s in range(_N_SEEDS)
)

_MINHASH_EST_BODY = f"""
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.a_id, c.b_id, ({_EST_AGREE}) * 1e0 / {_N_SEEDS} AS est_j
      FROM cand c
      JOIN wide wa ON wa.doc_id = c.a_id
      JOIN wide wb ON wb.doc_id = c.b_id
    ),
    sizes AS (SELECT doc_id, n_shingles AS n FROM wide),
    inter AS (
      SELECT c.a_id, c.b_id, count(*) AS i
      FROM cand c
      JOIN d da ON da.doc_id = c.a_id
      JOIN d db ON db.doc_id = c.b_id AND db.s = da.s
      GROUP BY 1, 2
    )
    SELECT e.a_id, e.b_id,
           round(e.est_j, 6) AS est_jaccard,
           round(coalesce(i.i, 0) * 1e0 / (sa.n + sb.n - coalesce(i.i, 0)), 6)
             AS true_jaccard
    FROM est e
    JOIN sizes sa ON sa.doc_id = e.a_id
    JOIN sizes sb ON sb.doc_id = e.b_id
    LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
"""

_MINHASH_EST_SPARK_BODY = f"""
    WITH d AS (SELECT * FROM mh_shingles),
    wide AS (SELECT * FROM mh_wide),
    bands AS (
      SELECT doc_id, stack({_N_BANDS}, {_BANDS_STACK_SPARK}) AS (band, bsig) FROM wide
    ),
    {_MINHASH_EST_BODY}
"""


def _minhash_est_spark(spark, sf_dir: str):
    _planted_minhash_views(spark, sf_dir)
    return spark.sql(_MINHASH_EST_SPARK_BODY)


_MINHASH_EST_DUCK = f"""
    {_minhash_wide(_SHINGLES_DUCK.format(src=_PLANTED))},
    wideb AS (SELECT doc_id, {_BANDS_WIDE_DUCK} FROM wide),
    bands AS (UNPIVOT wideb ON {_BANDS_UNPIVOT_DUCK} INTO NAME band VALUE bsig),
    {_MINHASH_EST_BODY}
"""

QUERIES["q_minhash_est"] = QuerySpec(
    spark=_minhash_est_spark,
    oracle=_MINHASH_EST_DUCK,
    description="MinHash estimator quality: signature-estimated vs exact "
    "Jaccard per LSH candidate pair",
)

# ---------------------------------------------------------------------------
# Transitive dedup clusters: connected components over the LSH candidate
# graph.  LSH pairs are only EDGES; a dedup pipeline must group A~B, B~C
# into one cluster {A,B,C} with one survivor, which is graph connectivity —
# not expressible as a fixed-depth join.  Spark side: iterative min-label
# propagation (each round: edges ⋈ labels, groupBy(min), converge when no
# label changes — O(component diameter) rounds, and dedup components are
# near-cliques so the diameter is tiny; the general-graph scale path is
# the large-star/small-star algorithm, same per-round plan).  Oracle:
# DuckDB WITH RECURSIVE reachability — the declarative spec of the same
# fixpoint.
# ---------------------------------------------------------------------------

_CC_MAX_ROUNDS = 20

_CC_CAND_SPARK = f"""
    WITH wide AS (SELECT * FROM mh_wide),
    bands AS (
      SELECT doc_id, stack({_N_BANDS}, {_BANDS_STACK_SPARK}) AS (band, bsig) FROM wide
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
"""


_CC_DRIVER_EDGE_BUDGET = 2_000_000


from contextlib import contextmanager  # noqa: E402


@contextmanager
def _arrow_enabled(spark):
    """Temporarily enable Arrow-backed pandas conversion, restoring the
    caller's setting on exit."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _cc_driver(spark, pairs_pdf):
    """Single-pass union-find over a BOUNDED, already-collected edge list.

    Invariant: every union links the larger root under the smaller root,
    so each tree's root is the minimum node id of its component — the same
    label the distributed fixpoint converges to.  Path compression makes
    the whole pass near-linear; 10^6 edges take well under a second.
    """
    import pandas as pd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    a_ids = pairs_pdf["a_id"].astype("int64")
    b_ids = pairs_pdf["b_id"].astype("int64")
    for a, b in zip(a_ids, b_ids):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = sorted(set(a_ids) | set(b_ids))
    out = pd.DataFrame(
        {"node": nodes, "label": [find(int(n)) for n in nodes]},
        dtype="int64",
    )
    # Arrow path: driver-side conversion to a LocalRelation-backed frame,
    # no Python-worker tasks (the pickled-RDD fallback schedules
    # defaultParallelism cold Python workers for this skinny frame).
    # Scoped flip — mutating session config permanently would silently
    # change toPandas/createDataFrame semantics for the whole session.
    with _arrow_enabled(spark):
        return spark.createDataFrame(out, "node bigint, label bigint")


def connected_components(
    pairs,
    max_rounds: int = _CC_MAX_ROUNDS,
    driver_edge_budget: int = _CC_DRIVER_EDGE_BUDGET,
):
    """Connected components of an undirected (a_id, b_id) edge frame.

    Returns (node, label) where label = min node id of the component.
    Size-adaptive, the same way AQE picks physical strategies at runtime:

    - edge count <= ``driver_edge_budget``: one-pass union-find on the
      driver (``_cc_driver``).  After LSH banding the candidate graph is
      orders of magnitude smaller than the corpus; when it fits the
      budget, a bounded toPandas + O(E α(E)) scan beats any multi-round
      shuffle plan by ~10x (the collect is provably bounded — the count
      that gates it is computed first from a checkpointed frame).
    - larger graphs: distributed min-label propagation PLUS pointer
      jumping to a fixpoint.  Each round: (1) neighbor min (edges ⋈
      labels, groupBy(min)) and (2) label ← label(label) (labels
      self-join) — the jump doubles the propagation radius per round, so
      convergence is O(log diameter) rounds instead of O(diameter): the
      sf0.1 near-dup graph has diameter-16 chains that took 16 rounds
      with step (1) alone and take 5 with both.  Same round structure as
      large-star/small-star, which is the fully-general scale path.

    localCheckpoint (NOT persist) each round: the frame must TRUNCATE
    lineage, or round k's logical plan nests all k-1 predecessors and
    Catalyst re-optimizes an exponentially growing tree — measured 4 s/
    round growing to 20 s by round 3 on a 140-node graph.  With eager
    checkpoints each round plans against a leaf, so round cost tracks
    DATA size, which is what an iterative engine needs at scale.
    """
    from pyspark.sql import functions as F

    # checkpoint the candidate edges ONCE: the count below plus both
    # branches of the undirected union would otherwise re-run the
    # upstream band self-join three times
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    if n_pairs <= driver_edge_budget:
        spark = pairs.sparkSession
        with _arrow_enabled(spark):
            pdf = pairs.toPandas()
        return _cc_driver(spark, pdf)

    # Partition count sized from the edge count (~2M edge rows per task),
    # floor 8: the fixpoint frames are SKINNY (two int64s), and running
    # each round at the session's global shuffle width costs a fixed
    # per-task overhead x rounds x stages that dwarfs the data at bench
    # scale.  edges is hash-partitioned on the join key u once, so every
    # round's neighbor-min join only shuffles the (small) labels side.
    n_parts = max(8, (2 * n_pairs) // 2_000_000 + 1)
    edges = (
        pairs.selectExpr("a_id AS u", "b_id AS v")
        .union(pairs.selectExpr("b_id AS u", "a_id AS v"))
        .repartition(n_parts, "u")
        .localCheckpoint()
    )
    labels = edges.selectExpr("u AS node").distinct().selectExpr("node", "node AS label")
    for _ in range(max_rounds):
        incoming = (
            edges.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy("v")
            .agg(F.min("label").alias("in_label"))
            .withColumnRenamed("v", "node")
        )
        # checkpoint BEFORE the jump: the jump self-joins stepped, and an
        # unmaterialized stepped would execute its join+groupBy pipeline
        # twice inside one job (once per self-join side)
        stepped = (
            labels.join(incoming, "node", "left")
            .selectExpr(
                "node",
                "label AS old_label",
                "least(label, coalesce(in_label, label)) AS label",
            )
            .localCheckpoint()
        )
        # pointer jump: label <- label(label).  Labels are always node ids
        # (mins of node ids), and label(x) <= x, so the lookup never grows
        # a label; the left join covers a label whose own row changed name.
        merged = (
            stepped.join(
                stepped.selectExpr("node AS lnode", "label AS llabel"),
                F.col("label") == F.col("lnode"),
                "left",
            )
            .selectExpr(
                "node", "old_label", "least(label, coalesce(llabel, label)) AS new_label"
            )
            .localCheckpoint()
        )
        changed = merged.where("new_label <> old_label").count()
        labels = merged.selectExpr("node", "new_label AS label")
        if changed == 0:
            break
    return labels


def connected_components_star(pairs, max_rounds: int = 50):
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    fully-general distributed path the pointer-jump fixpoint's docstring
    points at.  Unlike min-label propagation, each round REWIRES the edge
    set itself toward star graphs, so high-degree skew self-heals: a hub
    node's neighborhood shrinks every round instead of funneling its whole
    component through one reducer key.

    Per round (2 shuffle ops each for large + small):
      large-star: per node u with neighborhood mins m = min(N(u) ∪ {u}),
        re-point every LARGER neighbor v > u at m;
      small-star: re-point every neighbor v <= u (and u itself) at m.
    Fixpoint = the edge set stops changing (order-insensitive checksum);
    converged edges are stars whose centers are the component minima.

    Returns (node, label) with label = component min — identical contract
    to ``connected_components`` (property-pinned in tests against a
    union-find oracle on random graphs).
    """
    from pyspark.sql import functions as F

    # node set from the RAW pairs (before the self-loop filter): a node
    # whose only edge is a self-loop is still a (singleton) component and
    # must appear in the output, matching the other strategies' contract
    nodes = (
        pairs.selectExpr("a_id AS node")
        .union(pairs.selectExpr("b_id AS node"))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.selectExpr("a_id AS u", "b_id AS v")
        .where("u <> v")
        .selectExpr("least(u, v) AS u", "greatest(u, v) AS v")
        .distinct()
        .localCheckpoint()
    )

    def _star(e, keep_larger: bool):
        sym = e.union(e.selectExpr("v AS u", "u AS v"))
        nm = sym.groupBy("u").agg(F.min("v").alias("mv"))
        joined = sym.join(nm, "u").selectExpr(
            "u", "v", "least(mv, u) AS m"
        )
        if keep_larger:  # large-star: re-point strictly larger neighbors
            out = joined.where("v > u").selectExpr("v AS a", "m AS b")
        else:  # small-star: re-point <= neighbors and u itself
            out = joined.where("v <= u").selectExpr("v AS a", "m AS b").union(
                joined.selectExpr("u AS a", "m AS b")
            )
        return (
            out.where("a <> b")
            .selectExpr("least(a, b) AS u", "greatest(a, b) AS v")
            .distinct()
            .localCheckpoint()
        )

    def _sig(e):
        # order-insensitive edge-set checksum; bit_xor cannot overflow
        # (ANSI mode makes a sum of raw hashes throw on long overflow)
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    prev = _sig(edges)
    converged = False
    for _ in range(max_rounds):
        edges = _star(_star(edges, keep_larger=True), keep_larger=False)
        sig = _sig(edges)
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        # the center extraction below assumes converged stars; silently
        # returning labels from a non-converged graph would be WRONG
        # labels with no signal.  Alternating large/small-star converges
        # in O(log^2 n) rounds (Kiveris et al. Thm 2), so hitting this
        # means max_rounds was set far too low for the graph, not a
        # semantic failure — raise and let the caller raise the budget.
        raise RuntimeError(
            f"connected_components_star: edge set still changing after "
            f"{max_rounds} rounds; raise max_rounds (O(log^2 n) suffices)"
        )
    # converged stars: every non-center node has its center as min
    # neighbor; centers (and isolated-after-dedup nodes) label themselves
    centers = edges.groupBy(F.col("v").alias("node")).agg(
        F.min("u").alias("label")
    )
    return (
        nodes.join(centers, "node", "left")
        .selectExpr("node", "coalesce(label, node) AS label")
    )


def _dup_clusters_spark(spark, sf_dir: str):
    _planted_minhash_views(spark, sf_dir)
    pairs = spark.sql(_CC_CAND_SPARK)
    return connected_components(pairs).selectExpr(
        "node AS doc_id", "label AS cluster_id"
    )


_CC_DUCK = (
    _minhash_wide(_SHINGLES_DUCK.format(src=_PLANTED)).replace(
        "WITH d AS", "WITH RECURSIVE d AS", 1
    )
    + f""",
    wideb AS (SELECT doc_id, {_BANDS_WIDE_DUCK} FROM wide),
    bands AS (UNPIVOT wideb ON {_BANDS_UNPIVOT_DUCK} INTO NAME band VALUE bsig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION
      SELECT b_id AS u, a_id AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    walk(node, label) AS (
      SELECT node, node AS label FROM nodes
      UNION
      SELECT e.v AS node, w.label FROM walk w JOIN edges e ON e.u = w.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
"""
)

QUERIES["q_dup_clusters"] = QuerySpec(
    spark=_dup_clusters_spark,
    oracle=_CC_DUCK,
    description="transitive dedup clusters: connected components over LSH "
    "pairs (min-label propagation vs recursive-CTE oracle)",
)

# ---------------------------------------------------------------------------
# SimHash (16-bit, from the first 4 hex chars of md5(shingle))
# ---------------------------------------------------------------------------

_HEXVAL = (
    "((instr('0123456789abcdef', substring(md5(s), 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substring(md5(s), 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substring(md5(s), 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substring(md5(s), 4, 1)) - 1))"
)

_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN SUM(CASE WHEN CAST(floor(v / {1 << b}) AS BIGINT) % 2 = 1 "
    f"THEN 1 ELSE -1 END) >= 0 THEN {1 << b} ELSE 0 END)"
    for b in range(16)
)

_SIMHASH_BODY = f"""
    WITH d AS ({{shingles}}),
    hv AS (SELECT doc_id, {_HEXVAL} AS v FROM d)
    SELECT doc_id, {_SIMHASH_BITS} AS simhash
    FROM hv GROUP BY doc_id
"""

_q("q_simhash", *_shingle_query(_SIMHASH_BODY),
   description="16-bit SimHash per document from shingle hash bit votes")

# ---------------------------------------------------------------------------
# Token counting (whitespace regex)
# ---------------------------------------------------------------------------

_q(
    "q_token_count",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE size(split(trim(text), '\\\\s+')) END AS n_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
    r"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
    "whitespace token count + char count",
)

# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / digit / uppercase ratios)
# ---------------------------------------------------------------------------

_QUALITY_TEMPLATE = """
    SELECT doc_id,
           round((length(text) - length({strip_punct})) * 1e0 / NULLIF(length(text), 0), 6) AS punct_ratio,
           round((length(text) - length({strip_digit})) * 1e0 / NULLIF(length(text), 0), 6) AS digit_ratio,
           round((length(text) - length({strip_space})) * 1e0 / NULLIF(length(text), 0), 6) AS space_ratio,
           CASE WHEN length(text) BETWEEN 20 AND 100000
                     AND (length(text) - length({strip_punct})) * 1e0 / NULLIF(length(text), 0) < 0.1
                THEN 1 ELSE 0 END AS quality_ok
    FROM documents
"""

_q(
    "q_quality_score",
    _QUALITY_TEMPLATE.format(
        strip_punct="regexp_replace(text, '[.,;:!?]', '')",
        strip_digit="regexp_replace(text, '[0-9]', '')",
        strip_space="regexp_replace(text, '\\\\s', '')",
    ),
    _QUALITY_TEMPLATE.format(
        strip_punct="regexp_replace(text, '[.,;:!?]', '', 'g')",
        strip_digit="regexp_replace(text, '[0-9]', '', 'g')",
        strip_space=r"regexp_replace(text, '\s', '', 'g')",
    ),
    "punct/digit/space ratios + quality flag",
)

# ---------------------------------------------------------------------------
# Language-ID heuristic (stopword hits)
# ---------------------------------------------------------------------------

_EN_WORDS = ["the", "and", "of", "to", "in"]
_DE_WORDS = ["der", "und", "die", "das", "ist"]


def _hits(words: list[str], col: str = "lt") -> str:
    """Stopword-presence sum over a PRE-LOWERED, space-padded column.

    The padded lowercase text is projected ONCE in an inner subquery and
    referenced by all ten LIKE probes — inlining ``lower(text)`` into each
    probe makes Spark lowercase every document ten times per row
    (CollapseProject refuses to merge the projection precisely because the
    alias is non-cheap and multiply-referenced, which is the behavior we
    want)."""
    return " + ".join(
        f"(CASE WHEN {col} LIKE '% {w} %' THEN 1 ELSE 0 END)" for w in words
    )


_LOWERED = "SELECT doc_id, concat(' ', lower(text), ' ') AS lt FROM documents"

_LANG_ID_SQL = f"""
    SELECT doc_id, en_hits, de_hits,
           CASE WHEN en_hits > de_hits THEN 'en'
                WHEN de_hits > en_hits THEN 'de'
                ELSE 'und' END AS lang_guess
    FROM (SELECT doc_id, {_hits(_EN_WORDS)} AS en_hits, {_hits(_DE_WORDS)} AS de_hits
          FROM ({_LOWERED}))
"""

_q("q_lang_id", _LANG_ID_SQL, _LANG_ID_SQL,
   "stopword-hit language guess (n-gram heuristic)")

# ---------------------------------------------------------------------------
# Document fingerprint
# ---------------------------------------------------------------------------

_FP_TEMPLATE = """
    SELECT doc_id, md5(concat(CAST(n_chars AS {st}), ':', substring(text, 1, 64))) AS fingerprint
    FROM documents
"""

_q(
    "q_doc_fingerprint",
    _FP_TEMPLATE.format(st="STRING"),
    _FP_TEMPLATE.format(st="VARCHAR"),
    "stable document fingerprint (length + head hash)",
)

# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the term-weighting pass a training-data
# pipeline runs for keyword features / quality signals.  Two shuffles
# (per-doc tf, per-token df) + a broadcast corpus count; the tf ⋈ df join
# shuffles on token, where stopwords are the classic skew key — at 100 TB
# the df side is vocabulary-sized, so broadcast it (or let AQE skew-split
# the token shuffle).  idf is the LINEAR ratio n_docs/df: tf*n_docs/df is
# integer-exact double math, identical across engines; log-idf is a
# one-expression swap but ln() may differ in the last ulp between libm
# implementations, which would break the cross-engine value hash.
# ---------------------------------------------------------------------------

_TFIDF_K = 3

_TFIDF_BODY = """
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, token,
             round(tf * n_docs * 1e0 / df, 6) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf FROM (
      SELECT scored.*, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
      FROM scored
    ) t WHERE rn <= {k}
"""

_TFIDF_SPARK = f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, explode(split(lower(trim(text)), '\\\\s+')) AS token
        FROM (SELECT /*+ REPARTITION(__P__) */ * FROM documents) d0
      ) WHERE token <> ''
    ),
    {_TFIDF_BODY.format(k=_TFIDF_K)}
"""

_TFIDF_DUCK = rf"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents
      ) u WHERE token <> ''
    ),
    {_TFIDF_BODY.format(k=_TFIDF_K)}
"""

_q(
    "q_tfidf_topk",
    _TFIDF_SPARK,
    _TFIDF_DUCK,
    f"top-{_TFIDF_K} TF-IDF terms per document (linear idf for cross-engine "
    "exactness)",
)

# ---------------------------------------------------------------------------
# End-to-end corpus curation: the composed training-data pipeline in ONE
# declarative plan — quality gate + language gate + exact-dedup survivorship
# + token-budget cut (cumulative window capped at a budget).  Every stage is
# native SQL so Catalyst fuses the gates into one scan + windows.
#
# Scale note: "take documents in id order until the budget is hit" is a
# global running sum.  The ORACLE spells it as the single-window SQL (the
# semantic spec, fine for DuckDB); the SPARK side computes the identical
# result with the two-phase prefix sum from .prefix (range-partition ->
# per-partition running sums -> driver prefix over P subtotals ->
# broadcast offsets) so no stage ever funnels the kept set through one
# task.  tests/test_plans.py pins the absence of a SinglePartition
# exchange in the physical plan.
# ---------------------------------------------------------------------------

_CURATION_KEPT_TEMPLATE = """
    WITH base AS (
      SELECT doc_id, text, length(text) AS n_chars,
             concat(' ', lower(text), ' ') AS lt
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             n_chars,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE {n_tokens} END AS BIGINT) AS n_tokens,
             (n_chars - length({strip_punct})) * 1e0
               / NULLIF(n_chars, 0) AS punct_ratio,
             {en_hits} AS en_hits,
             {de_hits} AS de_hits,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM base
    ),
    kept AS (
      SELECT doc_id, n_tokens FROM feat
      WHERE doc_id = keeper
        AND n_chars BETWEEN 20 AND 100000
        AND punct_ratio < 0.1
        AND en_hits >= de_hits
    )
    SELECT doc_id, n_tokens FROM kept
"""

_CURATION_BUDGET_SQL = """
    WITH kept AS ({kept}),
    budgeted AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM kept
    )
    SELECT doc_id, n_tokens, cum_tokens
    FROM budgeted WHERE cum_tokens <= 20000
"""

_CURATION_KEPT_SPARK = _CURATION_KEPT_TEMPLATE.format(
    n_tokens="size(split(trim(text), '\\\\s+'))",
    strip_punct="regexp_replace(text, '[.,;:!?]', '')",
    en_hits=_hits(_EN_WORDS),
    de_hits=_hits(_DE_WORDS),
)

_CURATION_ORACLE = _CURATION_BUDGET_SQL.format(
    kept=_CURATION_KEPT_TEMPLATE.format(
        n_tokens=r"len(string_split_regex(trim(text), '\s+'))",
        strip_punct="regexp_replace(text, '[.,;:!?]', '', 'g')",
        en_hits=_hits(_EN_WORDS),
        de_hits=_hits(_DE_WORDS),
    ).strip()
)


def _corpus_curation_spark(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from .prefix import global_cumsum

    register_views(spark, sf_dir)
    kept = spark.sql(_CURATION_KEPT_SPARK)
    budgeted = global_cumsum(kept, ["doc_id"], "n_tokens", "cum_tokens")
    return budgeted.where(F.col("cum_tokens") <= 20000).select(
        "doc_id", "n_tokens", "cum_tokens"
    )


QUERIES["q_corpus_curation"] = QuerySpec(
    spark=_corpus_curation_spark,
    oracle=_CURATION_ORACLE,
    description="composed curation pipeline: quality + language + dedup "
    "survivorship + token-budget cut via two-phase global prefix sum",
)

# ---------------------------------------------------------------------------
# Deterministic stratified sampling: top-k per language stratum under a
# content-keyed pseudo-random order (md5 — identical in both engines, no
# engine RNG).  The scale path is the standard window-per-stratum top-k:
# one shuffle on the stratum key, no driver involvement.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Benchmark decontamination: word-5-gram overlap between the training
# corpus and a "benchmark" set (the GPT-3 / Dolma decontamination pass).
# The benchmark is planted deterministically — a substring window of every
# 37th document stands in for a leaked eval item — so the operator has a
# guaranteed positive signal: docs whose id % 37 = 0 are contaminated by
# construction, everything else sits near 0 overlap.
#
# Shape at scale: DISTINCT benchmark grams form a small relation
# (benchmarks are KBs-to-MBs even when the corpus is 100 TB) -> the gram
# join broadcasts the benchmark side; the per-doc gram explode is the
# only wide shuffle and it carries (doc_id, gram) pairs straight into a
# partial-agg count.  LEFT join keeps zero-overlap docs.
# ---------------------------------------------------------------------------

_CONTAM_BODY = """
    WITH bench AS (
      SELECT substring(text, 21, 160) AS text FROM documents WHERE doc_id % 37 = 0
    ),
    bgrams AS (
      SELECT DISTINCT {gram} AS gram
      FROM (SELECT {split} AS a FROM bench t) t2 {gen5}
    ),
    dgrams AS (
      SELECT DISTINCT doc_id, {gram} AS gram
      FROM (SELECT doc_id, {split} AS a FROM documents t) t2 {gen5}
    ),
    per_doc AS (SELECT doc_id, count(*) AS n_grams FROM dgrams GROUP BY doc_id),
    hits AS (
      SELECT d.doc_id, count(*) AS n_hit
      FROM dgrams d JOIN bgrams b ON b.gram = d.gram
      GROUP BY d.doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(h.n_hit, 0) * 1e0 / p.n_grams, 6) AS overlap_frac,
           CASE WHEN coalesce(h.n_hit, 0) * 1e0 / p.n_grams > 0.2
                THEN 1 ELSE 0 END AS contaminated
    FROM per_doc p LEFT JOIN hits h ON h.doc_id = p.doc_id
"""

_q(
    "q_contamination",
    _CONTAM_BODY.format(
        split="split(lower(trim(text)), '\\\\s+')",
        gram="array_join(slice(a, i, 5), ' ')",
        gen5="LATERAL VIEW explode(sequence(1, greatest(size(a) - 4, 1))) g AS i",
    ),
    _CONTAM_BODY.format(
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        gram="array_to_string(a[i:i+4], ' ')",
        gen5=", LATERAL (SELECT unnest(generate_series(1, greatest(len(a) - 4, 1))) AS i) g",
    ),
    "benchmark decontamination: word-5-gram overlap vs a planted leaked "
    "benchmark set, contaminated flag at >20% overlap",
)

# ---------------------------------------------------------------------------
# Training-sequence packing: concat-and-chunk document packing into
# fixed-token-budget training sequences (bin id + token offset where each
# doc starts).  Bin assignment only needs each doc's global cumulative
# token start, so the SPARK side uses the shared two-phase prefix sum
# (.prefix.global_cumsum — no single-task window); the ORACLE keeps the
# single-window SQL spec.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048

_PACK_TEMPLATE = f"""
    WITH t AS (
      SELECT doc_id, CAST({{n_tokens}} AS BIGINT) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - n_tokens AS start_tok
      FROM t
    )
    SELECT doc_id, n_tokens,
           start_tok {{div}} {_PACK_BUDGET} AS bin_id,
           start_tok % {_PACK_BUDGET} AS bin_offset
    FROM c
"""

_PACK_TOKENS_SPARK = f"""
    SELECT doc_id, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens
    FROM documents WHERE length(trim(text)) > 0
"""


def _sequence_pack_spark(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from .prefix import global_cumsum

    register_views(spark, sf_dir)
    t = spark.sql(_PACK_TOKENS_SPARK)
    c = global_cumsum(t, ["doc_id"], "n_tokens", "cum_tokens")
    start = (F.col("cum_tokens") - F.col("n_tokens"))
    return c.select(
        "doc_id",
        "n_tokens",
        F.floor(start / _PACK_BUDGET).cast("long").alias("bin_id"),
        (start % _PACK_BUDGET).cast("long").alias("bin_offset"),
    )


QUERIES["q_sequence_pack"] = QuerySpec(
    spark=_sequence_pack_spark,
    oracle=_PACK_TEMPLATE.format(
        n_tokens=r"len(string_split_regex(trim(text), '\s+'))", div="//"
    ),
    description=f"concat-and-chunk sequence packing into {_PACK_BUDGET}-token "
    "training bins via two-phase global prefix sum",
)

# ---------------------------------------------------------------------------
# Corpus-statistics LM quality score (CCNet-style, two-pass): pass 1
# aggregates corpus-wide character-bigram counts (bounded vocabulary —
# broadcastable at any corpus size); pass 2 joins them back and scores
# each doc by the average corpus frequency of its bigrams, in ppm.  Docs
# full of rare character sequences (garbled text, wrong charset) score
# low — the frequency-model analogue of a perplexity filter.
#
# Exactness discipline: every aggregate is INTEGER (sum of int64 counts),
# with ONE double division + round at the end, because a per-gram
# floating avg would accumulate in engine-dependent order and flip the
# cross-engine value hash in the last ulp.  Same reason q_tfidf_topk uses
# linear idf instead of ln().
# ---------------------------------------------------------------------------

# The (doc, gram) multiplicity table is aggregated FIRST (map-side
# combinable, shrinks every later stage), then corpus counts derive from
# it and broadcast back.  Every integer aggregate is cast to BIGINT in
# BOTH dialects (DuckDB sum(bigint) -> HUGEINT is the q_row_cluster hash
# trap); the remaining double multiply/divide are single IEEE ops,
# deterministic across engines even where inexact.
_CHAR_LM_DG = """
    SELECT doc_id, g, CAST(count(*) AS BIGINT) AS dc FROM (
      SELECT doc_id, substring(lt, i, 2) AS g
      FROM (SELECT doc_id, lower(text) AS lt FROM {src} t) t2 {gen}
    ) t3 GROUP BY doc_id, g
"""

_CHAR_LM_FINAL = """
    WITH dg AS ({dg}),
    counts AS (SELECT g, CAST(sum(dc) AS BIGINT) AS c FROM dg GROUP BY g),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(dc) AS BIGINT) AS n_grams,
             CAST(sum(dc * c) AS BIGINT) AS sum_c
      FROM dg JOIN counts USING (g)
      GROUP BY doc_id
    )
    SELECT doc_id, n_grams,
           round(sum_c * 1e6 / (n_grams * t), 6) AS avg_gram_freq_ppm
    FROM per_doc CROSS JOIN tot
"""

_CHAR_LM_GEN_SPARK = (
    "LATERAL VIEW explode(sequence(1, greatest(length(lt) - 1, 1))) g2 AS i"
)
_CHAR_LM_GEN_DUCK = (
    ", LATERAL (SELECT unnest(generate_series(1, greatest(length(lt) - 1, 1)))"
    " AS i) g2"
)


def _char_lm_spark(spark, sf_dir: str):
    """Two scale fixes a plain CTE can't express:

    - the documents scan is 2 parquet splits at bench SF, so the heavy
      explode + partial-agg would run 2-wide; repartitioning the SKINNY
      doc rows first (5k rows) spreads the gram work across the cluster
      (at 100 TB the scan is already wide and this repartition is a
      no-op knob);
    - ``dg`` is referenced twice (corpus counts + the per-doc join), so
      it is checkpointed once instead of re-running the explode per
      reference.
    """
    register_views(spark, sf_dir)
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("char_lm_docs")
    dg = spark.sql(
        _CHAR_LM_DG.format(src="char_lm_docs", gen=_CHAR_LM_GEN_SPARK)
    ).localCheckpoint()
    dg.createOrReplaceTempView("char_lm_dg")
    return spark.sql(_CHAR_LM_FINAL.format(dg="SELECT * FROM char_lm_dg"))


QUERIES["q_char_lm_score"] = QuerySpec(
    spark=_char_lm_spark,
    oracle=_CHAR_LM_FINAL.format(
        dg=_CHAR_LM_DG.format(src="documents", gen=_CHAR_LM_GEN_DUCK)
    ),
    description="corpus-statistics LM quality score: avg corpus frequency "
    "(ppm) of each doc's char bigrams, integer-exact aggregation",
)

# ---------------------------------------------------------------------------
# Per-source corpus stats: the per-domain curation dashboard (CCNet-style
# shard stats) — doc count, volume, language spread, exact-dup fraction.
# One groupBy(source); count(DISTINCT md5(text)) is the only expensive
# agg and it partial-aggregates per source.
# ---------------------------------------------------------------------------

_DOMAIN_STATS_SQL = """
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars,
           count(DISTINCT lang) AS n_langs,
           round(1 - count(DISTINCT md5(text)) * 1e0 / count(*), 6) AS dup_frac
    FROM documents GROUP BY source
"""

_q("q_domain_stats", _DOMAIN_STATS_SQL, _DOMAIN_STATS_SQL,
   "per-source corpus stats: volume, language spread, exact-dup fraction")


# ---------------------------------------------------------------------------
# KMV (bottom-k / theta-family) distinct sketch, per source.  The sketch
# keeps the k smallest md5 values of the attribute; distinct-count
# estimate = (k-1) / kth-smallest-normalized-hash.  Unlike engine-native
# HLL (approx_count_distinct), the md5-keyed KMV is DETERMINISTIC and
# identical across engines, so the driver can hash-compare the sketch
# output itself — and the query carries the exact count alongside, so the
# result doubles as an accuracy measurement.  Scale shape: the bottom-k
# is one shuffle on the group key; sketches merge by union+truncate
# (the k smallest of the union), which is what makes this the standard
# distributed-distinct structure.
# ---------------------------------------------------------------------------

_KMV_K = 64

_KMV_BODY = f"""
    WITH h AS (SELECT DISTINCT source, md5(text) AS hv FROM documents),
    ranked AS (
      SELECT source, hv,
             row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
      FROM h
    ),
    agg AS (
      SELECT source,
             count(*) AS n_exact,
             max(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth_hash
      FROM ranked GROUP BY source
    )
    SELECT source,
           CAST(n_exact AS BIGINT) AS n_exact,
           CASE WHEN n_exact < {_KMV_K} THEN CAST(n_exact AS DOUBLE)
                ELSE round({_KMV_K - 1} * 4294967296.0
                           / NULLIF(CAST({{hex8_kth}} AS BIGINT), 0), 6)
           END AS kmv_estimate
    FROM agg
"""

def _hex8_of(expr: str) -> str:
    """Leading-8-hex-chars -> BIGINT expression, identical in both
    dialects (the same per-digit instr parse the MinHash/SimHash paths
    use)."""
    return " + ".join(
        f"CAST(instr('0123456789abcdef', substring({expr}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


_KMV_SQL = _KMV_BODY.format(hex8_kth=_hex8_of("kth_hash"))
_q("q_kmv_sketch", _KMV_SQL, _KMV_SQL,
   f"deterministic KMV (bottom-{_KMV_K}) distinct sketch per source, "
   "estimate next to the exact count")

# ---------------------------------------------------------------------------
# Deterministic training-mix sampling: per-source mixing weights (the
# data-mixture knob every pretraining run tunes) applied as a content-
# keyed Bernoulli gate — keep a doc iff its md5-derived uniform < the
# source's rate.  No engine RNG anywhere, so the sample is reproducible
# bit-for-bit and identical across engines; at scale this is a pure
# map-side filter (no shuffle until the audit groupBy).
# ---------------------------------------------------------------------------


_MIX_TEMPLATE = """
    WITH rated AS (
      SELECT doc_id, source,
             (50 + ({hex_src}) % 50) / 1e2 AS rate,
             ({hex_doc}) / 4294967296.0 AS u
      FROM documents
    )
    SELECT source,
           round(min(rate), 6) AS rate,
           count(*) AS n_total,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM rated GROUP BY source
"""

_MIX_SQL_SPARK = _MIX_TEMPLATE.format(
    hex_src=_hex8_of("md5(source)"),
    hex_doc=_hex8_of("md5(concat('mix:', CAST(doc_id AS STRING)))"),
)
_MIX_SQL_DUCK = _MIX_TEMPLATE.format(
    hex_src=_hex8_of("md5(source)"),
    hex_doc=_hex8_of("md5(concat('mix:', CAST(doc_id AS STRING)))"),
)

_q(
    "q_training_mix",
    _MIX_SQL_SPARK,
    _MIX_SQL_DUCK,
    "deterministic per-source training-mix sampling: md5-keyed Bernoulli "
    "gate at source-derived rates, per-source audit counts",
)


_STRATIFIED_TEMPLATE = """
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(concat('samp:', CAST(doc_id AS {st}))), doc_id) AS rn
      FROM documents
    ) t WHERE rn <= 5
"""

_q(
    "q_stratified_sample",
    _STRATIFIED_TEMPLATE.format(st="STRING"),
    _STRATIFIED_TEMPLATE.format(st="VARCHAR"),
    "deterministic stratified sample: 5 docs per language stratum under "
    "md5-keyed pseudo-random order",
)


# ---------------------------------------------------------------------------
# Exact global quantiles WITHOUT a single-task sort: the classic "global
# percentiles of a 10^12-row column" problem, solved with the same
# two-phase rank machinery as q_sort_rank (.prefix.global_row_number) —
# range-partition, parallel local ranks, driver prefix over P counts.
# The quantile spec is positional (value at 1-based rank ceil(q*N) in
# (n_chars, doc_id) order — percentile_disc semantics made explicit), so
# the oracle states the SAME spec as a plain window over the full table,
# engine-agnostic, with no reliance on either engine's percentile
# function index conventions.
# ---------------------------------------------------------------------------

# percentiles as INTEGER percents: the target rank ceil(q*N) is computed
# with exact integer arithmetic ((pct*N + 99) // 100) on BOTH sides —
# a binary-double q*N can land an ulp above an exact integer and ceil()
# one rank too far, while DuckDB would evaluate the same literal as
# DECIMAL and disagree
_QUANTILE_PCTS = (25, 50, 75, 90, 99)

_QUANTILES_ORACLE = f"""
    WITH r AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER () AS n
      FROM documents
    )
    SELECT CAST(q.pct AS DOUBLE) / 100 AS quantile, r.n_chars
    FROM (VALUES {", ".join(f"({p})" for p in _QUANTILE_PCTS)}) q(pct)
    JOIN r ON r.rn = (q.pct * r.n + 99) // 100
"""


def _length_quantiles_spark(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from .prefix import global_row_number

    register_views(spark, sf_dir)
    ranked = global_row_number(
        spark.table("documents").select("n_chars", "doc_id"),
        ["n_chars", "doc_id"],
        "rn",
    )
    n = ranked.count()  # one scalar action; the rank frame stays cached
    if n == 0:
        return spark.sql(
            "SELECT CAST(NULL AS DOUBLE) AS quantile, "
            "CAST(NULL AS BIGINT) AS n_chars WHERE FALSE"
        )
    targets = ", ".join(
        f"({p / 100}D, {max(1, (p * n + 99) // 100)}L)" for p in _QUANTILE_PCTS
    )
    tgt = spark.sql(f"SELECT * FROM VALUES {targets} AS t(quantile, rn)")
    return ranked.join(F.broadcast(tgt), "rn").select("quantile", "n_chars")


QUERIES["q_length_quantiles"] = QuerySpec(
    spark=_length_quantiles_spark,
    oracle=_QUANTILES_ORACLE,
    description="exact global percentiles of doc length via two-phase "
    "parallel rank (no single-task sort); positional percentile_disc spec",
)


# ---------------------------------------------------------------------------
# KMV mergeability, proven in the gate: the Spark side builds PER-SOURCE
# bottom-k sketches first and MERGES them (k smallest of the distinct
# union — the tiny k x n_sources merge input is bounded by construction);
# the oracle computes the direct single-pass GLOBAL bottom-k.  Bottom-k
# commutes with union, so the two must agree hash-for-hash — this is the
# merge procedure PLANS.md documents, executed as a checked query.  At
# fleet scale the per-shard sketches are what worker nodes ship to the
# coordinator; this query IS that topology at sf scale.
# ---------------------------------------------------------------------------

_KMV_MERGE_ORACLE = f"""
    WITH h AS (SELECT DISTINCT md5(text) AS hv FROM documents),
    ranked AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
    agg AS (
      SELECT count(*) AS n_exact,
             max(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth_hash
      FROM ranked
    )
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CASE WHEN n_exact < {_KMV_K} THEN CAST(n_exact AS DOUBLE)
                ELSE round({_KMV_K - 1} * 4294967296.0
                           / NULLIF(CAST({_hex8_of("kth_hash")} AS BIGINT), 0), 6)
           END AS kmv_estimate
    FROM agg
"""

_KMV_MERGE_SPARK = f"""
    WITH shard_sketch AS (
      SELECT source, hv FROM (
        SELECT source, hv,
               row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
        FROM (SELECT DISTINCT source, md5(text) AS hv FROM documents)
      ) WHERE rn <= {_KMV_K}
    ),
    merged AS (
      -- k x n_sources rows total: the merge input is bounded by
      -- construction, so the single-group re-rank is a fixed-size fold
      SELECT hv, row_number() OVER (ORDER BY hv) AS rn
      FROM (SELECT DISTINCT hv FROM shard_sketch)
    ),
    agg AS (
      SELECT count(*) AS sk_size,
             max(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth_hash
      FROM merged WHERE rn <= {_KMV_K}
    ),
    exact AS (SELECT count(DISTINCT md5(text)) AS n_exact FROM documents)
    SELECT CAST(exact.n_exact AS BIGINT) AS n_exact,
           CASE WHEN exact.n_exact < {_KMV_K} THEN CAST(exact.n_exact AS DOUBLE)
                ELSE round({_KMV_K - 1} * 4294967296.0
                           / NULLIF(CAST({_hex8_of("kth_hash")} AS BIGINT), 0), 6)
           END AS kmv_estimate
    FROM agg, exact
"""

_q(
    "q_kmv_merge",
    _KMV_MERGE_SPARK,
    _KMV_MERGE_ORACLE,
    "KMV shard merge == direct global sketch: per-source bottom-k merged "
    "(k smallest of the distinct union) must reproduce the single-pass "
    "global estimate exactly — the PLANS.md merge procedure as a gate",
)


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (heavy hitters): d=4 hash rows x w=256
# counters, estimate = min over rows of the token's counter — the
# frequency twin of q_kmv_sketch's distinct sketch.  The 4 row hashes are
# the 4 disjoint 8-hex-char slices of ONE md5(token) digest (standard
# split-digest construction), md5-keyed so the sketch is DETERMINISTIC
# and identical across engines — the driver hash-compares the
# sketch-backed estimates themselves, with the exact count alongside as
# an accuracy measurement (CMS guarantees estimate >= exact; overshoot
# is collision noise bounded by e*N/w per row).  Cost shape: ONE wide
# groupBy(token) with map-side combine does all the heavy lifting; the
# counter matrix derives from the (token, cnt) frame — one md5 per
# DISTINCT token, 1024 counter cells at any corpus size — and merges
# across shards by cell-wise addition (linear).  Probe set = the exact
# top-20 tokens, so collision error is measured where it matters.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256
_CMS_TOPK = 20


def _cms_bucket(digest_expr: str) -> str:
    """Row j's bucket: hex slice [8j, 8j+8) of the md5 digest, mod w.
    (j comes from the joined rows_ relation as column r.j.)"""
    return (
        "("
        + _hex8_of(f"substring({digest_expr}, r.j * 8 + 1, 8)")
        + f") % {_CMS_W}"
    )


_CMS_BODY = f"""
    WITH tok_counts AS (
      SELECT t.token, CAST(count(*) AS BIGINT) AS cnt
      FROM ({{tok_src}}) t WHERE length(t.token) > 0
      GROUP BY t.token
    ),
    hashed AS (SELECT token, cnt, md5(token) AS h FROM tok_counts),
    rows_ AS ({{rows_src}}),
    counters AS (
      SELECT r.j, {_cms_bucket('x.h')} AS b, CAST(sum(x.cnt) AS BIGINT) AS c
      FROM hashed x, rows_ r
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT token, h, cnt AS n_exact FROM hashed
      ORDER BY cnt DESC, token
      LIMIT {_CMS_TOPK}
    ),
    probed AS (
      SELECT e.token, e.n_exact, r.j, {_cms_bucket('e.h')} AS b
      FROM exact e, rows_ r
    )
    SELECT p.token, p.n_exact,
           CAST(min(c.c) AS BIGINT) AS cms_estimate
    FROM probed p JOIN counters c ON c.j = p.j AND c.b = p.b
    GROUP BY p.token, p.n_exact
"""

_CMS_SPARK = _CMS_BODY.format(
    tok_src="SELECT explode(split(lower(trim(text)), '\\\\s+')) AS token FROM documents",
    rows_src="SELECT explode(sequence(0, {})) AS j".format(_CMS_D - 1),
)

_CMS_DUCK = _CMS_BODY.format(
    tok_src=r"SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM documents",
    rows_src="SELECT unnest(generate_series(0, {})) AS j".format(_CMS_D - 1),
)

_q(
    "q_cms_topk",
    _CMS_SPARK,
    _CMS_DUCK,
    f"Count-Min sketch heavy hitters: {_CMS_D}x{_CMS_W} split-md5-digest "
    f"counter matrix, min-over-rows estimates for the exact top-{_CMS_TOPK} "
    "tokens (estimate >= exact by construction; cell-wise-additive shard "
    "merge)",
)


# ---------------------------------------------------------------------------
# Normalization-aware dedup (CCNet/C4-style): lowercase + digit folding +
# punctuation strip + whitespace collapse, then exact dedup on the
# NORMALIZED key — measuring the dedup LIFT over raw-hash dedup (docs
# caught ONLY after normalization).  Unicode NFC is out of scope (no
# engine-portable SQL normalizer); the fold set matches the published
# CCNet preprocessing minus NFC.  Planted positives: every 50th document
# gets a clone differing only in appended punctuation — raw hashes
# differ, normalized keys collide, so the operator has a guaranteed
# deterministic signal.  One scan, two window passes on skinny keys.
# ---------------------------------------------------------------------------

_NORM_EXPR_TEMPLATE = (
    "trim(regexp_replace(regexp_replace(translate(lower(text), "
    "'0123456789', '0000000000'), '[.,;:!?()]', ''{g}), '\\\\s+', ' '{g}))"
)

_NORM_BODY = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, concat(text, ' !!.') AS text
      FROM documents WHERE doc_id % 50 = 0
    ),
    keyed AS (
      SELECT doc_id,
             md5(text) AS raw_key,
             md5({norm}) AS norm_key
      FROM corpus
    ),
    keepers AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY raw_key) AS raw_keeper,
             min(doc_id) OVER (PARTITION BY norm_key) AS norm_keeper
      FROM keyed
    )
    SELECT doc_id, norm_keeper,
           CASE WHEN doc_id <> norm_keeper AND doc_id = raw_keeper
                THEN 1 ELSE 0 END AS caught_by_norm_only
    FROM keepers
"""

_q(
    "q_norm_dedup",
    _NORM_BODY.format(norm=_NORM_EXPR_TEMPLATE.format(g="")),
    _NORM_BODY.format(norm=_NORM_EXPR_TEMPLATE.format(g=", 'g'")),
    "normalization-aware dedup (CCNet fold: case/digits/punct/whitespace): "
    "per-doc normalized survivor + the dedup lift over raw hashing "
    "(planted punctuation-only clones caught only after normalization)",
)

# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch, per source — completes the sketch trio
# (KMV distinct above, CMS frequency below/visual, HLL here).  All hashing
# is md5-derived so the registers are DETERMINISTIC and identical across
# engines: the driver hash-checks the register fingerprint itself, not
# just the estimate.  m = 64 registers (p = 6): bucket = low 6 bits of the
# 32-bit hash, w = remaining 26 bits, rho = leading-zero count + 1 of w
# computed EXACTLY via length(bin(w)) (no float log2 anywhere — both
# engines' bin() return the minimal binary string).  Estimate = the
# standard HLL pipeline: alpha_64 * m^2 / Z with the linear-counting
# small-range correction when E <= 2.5m and empty registers remain.
#
# Shape at scale: registers are a groupBy(source, bucket).max — map-side
# combinable, 64 rows of state per group, and sketches MERGE by
# register-wise max (the property that makes HLL the standard distributed
# distinct-counter; same merge shape as q_kmv_merge proves for KMV).
# Integer-division note: bucket/w use subtract-mod arithmetic, never
# CAST(x / c AS BIGINT) — DuckDB rounds that cast while Spark truncates.
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (p = 6); w is the remaining 26 bits of the 32-bit hash

_HLL_BODY = f"""
    WITH h AS (SELECT DISTINCT source, md5(text) AS hv FROM documents),
    hb AS (SELECT source, ({{hex8_hv}}) AS h32 FROM h),
    br AS (
      SELECT source,
             h32 % {_HLL_M} AS bucket,
             CAST((h32 - h32 % {_HLL_M}) / {_HLL_M} AS BIGINT) AS w
      FROM hb
    ),
    regs AS (
      SELECT source, bucket,
             max(CASE WHEN w = 0 THEN 27 ELSE 27 - length(bin(w)) END) AS r
      FROM br GROUP BY source, bucket
    ),
    agg AS (
      SELECT source,
             count(*) AS n_present,
             sum(power(2.0, -r)) AS z_present,
             md5({{fp_agg}}) AS register_fp
      FROM regs GROUP BY source
    ),
    ex AS (SELECT source, count(DISTINCT md5(text)) AS n_exact FROM documents GROUP BY source)
    SELECT a.source,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           CAST({_HLL_M} - a.n_present AS BIGINT) AS n_zero_regs,
           a.register_fp,
           round(CASE WHEN 0.709 * {_HLL_M} * {_HLL_M}
                           / (a.z_present + ({_HLL_M} - a.n_present)) <= {2.5 * _HLL_M}
                           AND a.n_present < {_HLL_M}
                      THEN {_HLL_M} * ln({_HLL_M}.0 / ({_HLL_M} - a.n_present))
                      ELSE 0.709 * {_HLL_M} * {_HLL_M}
                           / (a.z_present + ({_HLL_M} - a.n_present)) END, 6) AS hll_estimate
    FROM agg a JOIN ex e ON e.source = a.source
"""

_HLL_REG_STR = (
    "lpad(CAST(bucket AS STRING), 2, '0') || ':' || lpad(CAST(r AS STRING), 2, '0')"
)

_q(
    "q_hll_distinct",
    _HLL_BODY.format(
        hex8_hv=_hex8_of("hv"),
        fp_agg=f"concat_ws(',', sort_array(collect_list({_HLL_REG_STR})))",
    ),
    _HLL_BODY.format(
        hex8_hv=_hex8_of("hv"),
        fp_agg=f"string_agg({_HLL_REG_STR}, ',' ORDER BY bucket)",
    ),
    "deterministic md5-keyed HyperLogLog (m=64) per source: hash-checked "
    "register fingerprint + estimate with linear-counting correction, "
    "next to the exact count",
)

# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): find the maximal word ranges of every
# document that also appear verbatim in ANOTHER document — the
# substring-granular sibling of the document-granular MinHash/SimHash
# passes above.  Suffix-array semantics re-expressed relationally:
# positional word-8-gram shingles -> grams seen in >= 2 distinct docs ->
# per-doc gaps-and-islands merge of overlapping/contiguous duplicated
# gram intervals [pos, pos+7] into maximal spans.
#
# The corpus is augmented with planted "quoting" documents (a window of
# every 41st doc's words embedded between unique marker words) so the
# operator provably exercises mid-document islands, not just whole-doc
# duplicates (same self-contained-positive pattern as q_contamination's
# planted benchmark).
#
# Shape at scale: the gram explode is the one wide stage (carrying
# (gram, doc_id, pos)); duplicated-gram detection is a map-side-
# combinable groupBy on the gram; the island merge windows are
# PARTITION BY doc_id — per-doc state only, no global window anywhere.
# At 100 TB you'd hash the gram to 8 bytes before the shuffle (the md5
# trick every pass here uses); kept verbatim at test scale so the
# result is human-readable.
# ---------------------------------------------------------------------------

_SUBSTR_BODY = """
    WITH corpus AS (
      SELECT doc_id, lower(trim(text)) AS text FROM {src}
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             'quotestart marker words here ' || {qwin} || ' quoteend marker words'
      FROM (SELECT doc_id, {split} AS a FROM {src} t0) tq
      WHERE doc_id % 41 = 0 AND {alen} >= 30
    ),
    words AS (SELECT doc_id, {split2} AS a FROM corpus t),
    grams AS (
      SELECT doc_id, i AS pos, substring(md5({gram8}), 1, 16) AS gram
      FROM words t2 {gen}
      WHERE {alen} >= 8
    ),
    dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup d ON d.gram = g.gram),
    ordered AS (
      SELECT doc_id, pos,
             max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM hits
    ),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN prev_max IS NULL OR pos > prev_max + 8 THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT doc_id,
           CAST(island AS BIGINT) AS island_id,
           CAST(min(pos) AS BIGINT) AS start_word,
           CAST(max(pos) + 7 AS BIGINT) AS end_word,
           CAST(count(*) AS BIGINT) AS n_dup_grams
    FROM islands GROUP BY doc_id, island
"""

def _substr_spark_sql(src: str) -> str:
    return _SUBSTR_BODY.format(
        src=src,
        split="split(lower(trim(text)), '\\\\s+')",
        split2="split(text, ' ')",
        qwin="array_join(slice(a, 6, 14), ' ')",
        alen="size(a)",
        gram8="array_join(slice(a, i, 8), ' ')",
        gen="LATERAL VIEW explode(sequence(1, greatest(size(a) - 7, 1))) g AS i",
    )


_SUBSTR_SPARK_SQL = _substr_spark_sql("documents")


def _substring_dedup_spark(spark, sf_dir: str):
    """Repartition the SKINNY doc rows before the wide gram explode (the
    same 2-parquet-split fix as q_char_lm_score — at 100 TB the scan is
    already wide and this is a no-op knob)."""
    register_views(spark, sf_dir)
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("substr_docs")
    return spark.sql(_substr_spark_sql("substr_docs"))


QUERIES["q_substring_dedup"] = QuerySpec(
    spark=_substring_dedup_spark,
    oracle=_SUBSTR_BODY.format(
        src="documents",
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        split2="string_split(text, ' ')",
        qwin="array_to_string(a[6:19], ' ')",
        alen="len(a)",
        gram8="array_to_string(a[i:i+7], ' ')",
        gen=", LATERAL (SELECT unnest(generate_series(1, greatest(len(a) - 7, 1))) AS i) g",
    ),
    description=(
        "exact-substring dedup (Lee et al. suffix-array semantics as "
        "positional 8-gram gaps-and-islands): maximal word spans of each doc "
        "appearing verbatim in another doc, incl. planted mid-doc quotes; "
        "grams md5-folded to 64 bits before the shuffle"
    ),
)

# ---------------------------------------------------------------------------
# Inverted-index build: token -> (document frequency, collection
# frequency, first posting, fingerprint of the full sorted posting
# list).  The posting-list fingerprint makes the INDEX itself
# hash-checkable, not just its summary stats.  Tokens shorter than 3
# chars are stopword-pruned; df >= 5 keeps the output index-worthy.
#
# Shape at scale: one explode + one groupBy(token); df/cf/min are
# map-side combinable, the posting fingerprint is the only full-list
# aggregation (at 100 TB the index would be range-bucketed by token so
# each bucket's postings build independently — same groupBy, prefixed
# key).
# ---------------------------------------------------------------------------

_INVIDX_BODY = """
    WITH toks AS (
      SELECT doc_id, t AS token
      FROM (SELECT doc_id, {split} AS a FROM documents t0) t1 {gen}
      WHERE length(t) >= 3
    ),
    postings AS (
      SELECT token,
             count(DISTINCT doc_id) AS df,
             count(*) AS cf,
             min(doc_id) AS first_doc,
             md5({fp_agg}) AS posting_fp
      FROM toks GROUP BY token
    )
    SELECT token, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
           CAST(first_doc AS BIGINT) AS first_doc, posting_fp
    FROM postings WHERE df >= 5
"""

_INVIDX_DOC8 = "lpad(CAST(doc_id AS STRING), 8, '0')"

_q(
    "q_inverted_index",
    _INVIDX_BODY.format(
        split="split(lower(trim(text)), '\\\\s+')",
        gen="LATERAL VIEW explode(a) g AS t",
        fp_agg=f"concat_ws(',', sort_array(collect_set({_INVIDX_DOC8})))",
    ),
    _INVIDX_BODY.format(
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        gen=", LATERAL (SELECT unnest(a) AS t) g",
        fp_agg=f"string_agg(DISTINCT {_INVIDX_DOC8}, ',' ORDER BY {_INVIDX_DOC8})",
    ),
    "inverted-index build: per-token df/cf/first posting plus an md5 "
    "fingerprint of the full sorted posting list (the index itself is "
    "hash-checked)",
)

# ---------------------------------------------------------------------------
# Quality-curriculum bucketing: exact global deciles over an
# INTEGER-EXACT quality score, without a single-task sort.
#
# Curriculum learning orders pretraining data from "easiest/cleanest" to
# hardest; the batch op behind it is "assign every doc its exact global
# quality decile".  Score = integer quality points (length band, punct
# band, digit band — each an integer cross-multiplied compare, no float
# ratios) with (n_chars, doc_id) tie-breaks so the order is total.  The
# Spark side ranks with the two-phase global_row_number (range partition
# -> local window -> driver prefix over P subtotals — never a global
# ORDER BY window); the oracle uses a plain row_number().  Both sides
# bucket with the same integer formula decile = (rn-1)*10/n + 1, so the
# boundaries match bit-for-bit.  Output is the per-decile rollup — the
# curriculum schedule table itself.
# ---------------------------------------------------------------------------

_CURRICULUM_SCORE = """
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(
             (CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1 ELSE 0 END)
           + (CASE WHEN (length(text) - length({strip_punct})) * 10 < length(text)
                   THEN 1 ELSE 0 END)
           + (CASE WHEN (length(text) - length({strip_digit})) * 5 < length(text)
                   THEN 1 ELSE 0 END)
           AS INT) AS points
    FROM documents
"""

_CURRICULUM_ROLLUP = """
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(points) AS min_points,
           max(points) AS max_points,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM bucketed GROUP BY decile
"""


def _quality_curriculum_spark(spark, sf_dir: str):
    from .prefix import global_row_number

    register_views(spark, sf_dir)
    scored = spark.sql(
        _CURRICULUM_SCORE.format(
            strip_punct="regexp_replace(text, '[.,;:!?]', '')",
            strip_digit="regexp_replace(text, '[0-9]', '')",
        )
    )
    n = scored.count()
    if n == 0:
        return spark.createDataFrame(
            [],
            "decile int, n_docs long, min_points int, max_points int, sum_chars long",
        )
    ranked = global_row_number(scored, ["points", "n_chars", "doc_id"], "rn")
    ranked.createOrReplaceTempView("_curriculum_ranked")
    return spark.sql(
        "WITH bucketed AS ("
        f"  SELECT *, CAST((rn - 1) * 10 DIV {n} + 1 AS INT) AS decile"
        "   FROM _curriculum_ranked"
        f") {_CURRICULUM_ROLLUP}"
    )


_CURRICULUM_DUCK = (
    "WITH scored AS ("
    + _CURRICULUM_SCORE.format(
        strip_punct="regexp_replace(text, '[.,;:!?]', '', 'g')",
        strip_digit="regexp_replace(text, '[0-9]', '', 'g')",
    )
    + """),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY points, n_chars, doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored
    ),
    bucketed AS (
      SELECT *, CAST((rn - 1) * 10 // n + 1 AS INT) AS decile FROM ranked
    )
"""
    + _CURRICULUM_ROLLUP
)

QUERIES["q_quality_curriculum"] = QuerySpec(
    spark=_quality_curriculum_spark,
    oracle=_CURRICULUM_DUCK,
    description=(
        "exact global quality-decile curriculum schedule: integer quality "
        "points, two-phase global rank (no single-task sort), per-decile "
        "rollup"
    ),
)

# ---------------------------------------------------------------------------
# Token co-occurrence mining (PMI-style lift) over a BOUNDED vocabulary.
#
# The naive pair explosion is O(doc_len^2) and unshippable at 100 TB;
# the standard fix is to mine pairs only over a bounded high-value
# vocabulary.  vocab = top-32 tokens by document frequency (global
# TopK — Spark plans take-ordered partial top-Ks per partition, no full
# sort); each doc then contributes at most C(32,2) pairs regardless of
# its length, so the explode is bounded and the pair shuffle carries
# fixed-cardinality keys.  Association strength is reported as
# lift_ppm = floor(1e6 * P(a,b) / (P(a) P(b))) — one double multiply
# chain over exact integers, identical operation order both engines, so
# the value hash holds without rounding tricks.  Support filter
# c12 * 20 >= n (>= 5% of docs) in exact integer math.
# ---------------------------------------------------------------------------

_COOC_VOCAB_K = 32

_COOC_BODY = """
    WITH toks AS ({toks}),
    dfreq AS (SELECT token, count(*) AS df FROM toks GROUP BY token),
    vocab AS (
      SELECT token, df FROM dfreq ORDER BY df DESC, token LIMIT {k}
    ),
    vtoks AS (
      SELECT t.doc_id, t.token, v.df FROM toks t JOIN vocab v USING (token)
    ),
    nn AS (SELECT count(*) AS n FROM documents),
    pairs AS (
      SELECT a.token AS token_a, b.token AS token_b,
             a.df AS df_a, b.df AS df_b, count(*) AS c12
      FROM vtoks a JOIN vtoks b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2, 3, 4
    )
    SELECT token_a, token_b,
           CAST(c12 AS BIGINT) AS c12,
           CAST(df_a AS BIGINT) AS df_a,
           CAST(df_b AS BIGINT) AS df_b,
           CAST(floor((1000000.0 * c12 * n) / (df_a * df_b)) AS BIGINT)
             AS lift_ppm
    FROM pairs CROSS JOIN nn
    WHERE c12 * 20 >= n
"""

_q(
    "q_cooccurrence",
    _COOC_BODY.format(
        # per-doc DISTINCT via array_distinct before the explode (the
        # _SHINGLES_SPARK move): no corpus-wide token exchange
        toks=(
            "SELECT doc_id, explode(array_distinct(filter("
            "split(lower(trim(text)), '\\\\s+'), t -> t <> '')) ) AS token "
            "FROM (SELECT /*+ REPARTITION(__P__) */ * FROM documents) d0"
        ),
        k=_COOC_VOCAB_K,
    ),
    _COOC_BODY.format(
        # renders the ORACLE text byte-identically to its round-5 form
        # (the driver fingerprints oracle SQL texts; note the trailing
        # space after "documents" the old {src} {gen} formatting left)
        toks=(
            "\n      SELECT DISTINCT doc_id, token FROM (\n"
            "        SELECT doc_id, "
            r"unnest(string_split_regex(lower(trim(text)), '\s+'))"
            " AS token FROM documents \n"
            "      ) u WHERE token <> ''\n    "
        ),
        k=_COOC_VOCAB_K,
    ),
    f"token co-occurrence lift over the top-{_COOC_VOCAB_K} DF vocabulary: "
    "bounded pair explosion, integer-exact support filter, "
    "deterministic lift_ppm",
)

# ---------------------------------------------------------------------------
# BPE-ish regex token counting — the pre-tokenizer pass of a GPT-2-style
# BPE pipeline (contractions | space-prefixed letter runs | digit runs |
# punct runs), restricted to RE2-compatible syntax (no lookahead) so the
# Spark (Java regex) and DuckDB (RE2) engines produce identical splits;
# both are leftmost-first here.  Reported next to the whitespace count
# with an integer-exact ppm ratio — the "how many training tokens is
# this corpus" estimator that precedes any real tokenizer run.  Pure
# native regexp on a projected column: embarrassingly parallel, no
# shuffle at all until the (absent) aggregation — this is a map-only
# query.
# ---------------------------------------------------------------------------

_BPE_PAT = r"''(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9{ws}'']+"

_BPE_BODY = """
    WITH t AS (SELECT doc_id, lower(trim(text)) AS lt FROM documents)
    SELECT doc_id,
           CAST({n_bpe} AS BIGINT) AS n_bpe_tokens,
           CAST(CASE WHEN length(lt) = 0 THEN 0
                     ELSE {n_ws} END AS BIGINT) AS n_ws_tokens,
           CAST(CASE WHEN length(lt) = 0 THEN 0
                     ELSE ({n_bpe}) * 1000000 {intdiv} nullif({n_ws}, 0)
                END AS BIGINT) AS bpe_per_ws_ppm
    FROM t
"""

_q(
    "q_bpe_tokens",
    _BPE_BODY.format(
        n_bpe="size(regexp_extract_all(lt, '" + _BPE_PAT.format(ws=r"\\s") + "', 0))",
        n_ws="size(split(lt, '\\\\s+'))",
        intdiv="DIV",
    ),
    _BPE_BODY.format(
        n_bpe="len(regexp_extract_all(lt, '" + _BPE_PAT.format(ws=r"\s") + "'))",
        n_ws=r"len(string_split_regex(lt, '\s+'))",
        intdiv="//",
    ),
    "GPT-2-style BPE pre-tokenizer token count (RE2-compatible regex, "
    "identical splits both engines) next to the whitespace count, with "
    "an integer-exact ppm ratio — map-only, no shuffle",
)

# ---------------------------------------------------------------------------
# Weighted sampling without replacement — Efraimidis–Spirakis A-ES with
# DETERMINISTIC md5-derived uniforms, the third leg of the sampling
# family (q_training_mix = Bernoulli rates, q_stratified_sample =
# per-stratum top-k, this = global importance sampling by doc length).
#
# A-ES: draw u_i ~ U(0,1), key_i = u_i^(1/w_i); the k largest keys are
# an exact weighted sample without replacement.  Maximizing u^(1/w) is
# maximizing ln(u)/w, so the key never overflows.  u is derived from
# md5(doc_id) (reproducible bit-for-bit, and independent of the weight),
# so both engines draw the SAME sample; the float key itself never
# leaves the query — output is (rank, doc_id, weight), rank from the
# bounded 64-row top-k.
#
# Scale notes: ORDER BY key LIMIT k plans as TakeOrderedAndProject —
# per-partition top-k folded on the driver, no global sort; the rank
# window runs over the k surviving rows only.  This is exactly how a
# 100 TB corpus draws a weighted eval slice in one pass.
# ---------------------------------------------------------------------------

_WSAMPLE_K = 64

_WSAMPLE_BODY = """
    WITH u AS (
      SELECT doc_id, n_chars,
             ({hex8} + 1.0) / 4294967297.0 AS u
      FROM documents WHERE n_chars > 0
    ),
    keyed AS (SELECT doc_id, n_chars, ln(u) / n_chars AS k FROM u),
    pick AS (
      SELECT doc_id, n_chars, k FROM keyed
      ORDER BY k DESC, doc_id LIMIT {k}
    )
    SELECT CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT)
             AS sample_rank,
           doc_id,
           CAST(n_chars AS BIGINT) AS weight
    FROM pick
"""

_q(
    "q_weighted_sample",
    _WSAMPLE_BODY.format(
        hex8=_hex8_of("md5(CAST(doc_id AS STRING))"), k=_WSAMPLE_K
    ),
    _WSAMPLE_BODY.format(
        hex8=_hex8_of("md5(CAST(doc_id AS VARCHAR))"), k=_WSAMPLE_K
    ),
    f"Efraimidis–Spirakis weighted sample (k={_WSAMPLE_K}, weight = "
    "n_chars, deterministic md5 uniforms): TakeOrdered top-k, no global "
    "sort; rank window bounded to the k survivors",
)

# ---------------------------------------------------------------------------
# BM25 ranked retrieval — the scoring half of the retrieval family
# (q_inverted_index builds the index; this ranks documents against a
# query).  The query-term set is DERIVED from the corpus itself (df
# ranks 5-8 among tokens of length >= 4, ties broken by token) so the
# query never couples to fixture vocabulary, and both engines pick the
# identical set via two nested bounded TakeOrdered steps (top-8, then
# bottom-4 of those) — no OFFSET, no global window.
#
# Cross-engine float discipline: every per-term score is floored to an
# integer ppm BEFORE the per-doc sum, so the only float expression is a
# single identical multiply/divide/ln chain evaluated per (doc, term)
# row — the sum itself is integer-exact and aggregation-order-
# independent (the same trick as q_cooccurrence's lift_ppm).
#
# Shape at scale: ONE tokenize+groupBy materializes the (doc_id, token,
# tf) term-frequency table — the relation a retrieval system keeps
# anyway — and dl / df / avgdl / the score join all read it.  qterms
# (4 rows) and stats (1 row) broadcast; the score join shuffles tf on
# token once; the final ORDER BY ... LIMIT plans as TakeOrdered (driver
# folds per-partition top-k, no global sort).
# ---------------------------------------------------------------------------

_BM25_TOPK = 16

_BM25_TF_BODY = """
    SELECT doc_id, t AS token, count(*) AS tf
    FROM (SELECT doc_id, {split} AS a FROM {src} t0) t1 {gen}
    WHERE length(t) >= 3
    GROUP BY doc_id, t
"""

# k1 = 1.2, b = 0.75; (k1+1) = 2.2 and (1-b) = 0.25 pre-folded so both
# engines evaluate the identical literal chain.  Every float literal is
# written in EXPONENT notation (1e0, 5e-1, ...) — Spark parses plain
# `1.0` as DECIMAL(2,1) and would run the whole chain in decimal
# arithmetic (different rounding than DuckDB's doubles, few-ppm drift);
# scientific notation is a DOUBLE literal in both engines.
_BM25_TAIL = """
    dl AS (SELECT doc_id, sum(tf) AS dl FROM {tf} GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) * 1e0 / count(*) AS avgdl
              FROM dl),
    df AS (SELECT token, count(*) AS df FROM {tf} GROUP BY token),
    qtop AS (SELECT token, df FROM df WHERE length(token) >= 4
             ORDER BY df DESC, token LIMIT 8),
    qterms AS (SELECT token, df FROM qtop ORDER BY df ASC, token DESC LIMIT 4),
    scored AS (
      SELECT t.doc_id,
             CAST(floor(
               1e6
               * ln((s.n_docs - q.df + 5e-1) / (q.df + 5e-1) + 1e0)
               * (t.tf * 2.2e0)
               / (t.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * d.dl / s.avgdl))
             ) AS BIGINT) AS s_ppm
      FROM {tf} t
      JOIN qterms q ON t.token = q.token
      JOIN dl d ON t.doc_id = d.doc_id
      CROSS JOIN stats s
    ),
    agg AS (SELECT doc_id, sum(s_ppm) AS bm25_ppm, count(*) AS n_terms
            FROM scored GROUP BY doc_id),
    pick AS (SELECT doc_id, bm25_ppm, n_terms FROM agg
             ORDER BY bm25_ppm DESC, doc_id LIMIT {topk})
    SELECT CAST(row_number() OVER (ORDER BY bm25_ppm DESC, doc_id) AS BIGINT)
             AS bm25_rank,
           doc_id,
           CAST(bm25_ppm AS BIGINT) AS bm25_ppm,
           CAST(n_terms AS BIGINT) AS n_terms_matched
    FROM pick
"""

_BM25_TF_SPARK = _BM25_TF_BODY.format(
    src="bm25_docs",
    split="split(lower(trim(text)), '\\\\s+')",
    gen="LATERAL VIEW explode(a) g AS t",
)


def _bm25_spark(spark, sf_dir: str):
    """Materialize the tf table ONCE (persisted temp view) — dl, df,
    qterms and the score join are four references that would otherwise
    each replan the scan+explode+groupBy subtree.

    The repartition is KEYED on doc_id: HashPartitioning(doc_id) is a
    subset of every downstream per-doc grouping key, so the tf groupBy
    (doc_id, token), the dl rollup, the tf-dl score join, and the final
    per-doc sum all reuse the one exchange — only the df/qterms branch
    (token key) shuffles again, and that input is the compact tf table.
    Measured 2x warm / 5x cold vs the unkeyed round-robin repartition."""
    register_views(spark, sf_dir)
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n, "doc_id").createOrReplaceTempView(
        "bm25_docs"
    )
    tf = spark.sql(_BM25_TF_SPARK).persist()
    tf.createOrReplaceTempView("bm25_tf")
    out = spark.sql("WITH " + _BM25_TAIL.format(tf="bm25_tf", topk=_BM25_TOPK))
    # The 16-row result is tiny: materialize it off the cached tf now so
    # the persisted frame can be released instead of leaking across the
    # session (bench runs 89 queries back-to-back in one JVM).
    out = out.localCheckpoint(eager=True)
    tf.unpersist()
    return out


_BM25_DUCK = (
    "WITH tf AS ("
    + _BM25_TF_BODY.format(
        src="documents",
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        gen=", LATERAL (SELECT unnest(a) AS t) g",
    )
    + "), "
    + _BM25_TAIL.format(tf="tf", topk=_BM25_TOPK)
)

QUERIES["q_bm25"] = QuerySpec(
    spark=_bm25_spark,
    oracle=_BM25_DUCK,
    description=(
        f"BM25 top-{_BM25_TOPK} retrieval (k1=1.2, b=0.75) for a corpus-"
        "derived 4-term query: materialized tf table, integer-ppm "
        "per-term scores summed exactly, bounded TakeOrdered everywhere"
    ),
)

# ---------------------------------------------------------------------------
# Per-group exact percentiles — the grouped twin of q_length_quantiles.
# Exact order statistics (lower-median convention: the element at rank
# ceil(q*n)) via windows that are ALL `PARTITION BY source` — per-group
# state only, no global window, so the shape survives any number of
# groups at 100 TB.  Integer-exact rank targets: ceil(q*n) computed as
# (q_num*n + q_den-1) DIV q_den in int64, identical both engines; no
# float interpolation anywhere (percentile_cont would drift
# cross-engine).
# ---------------------------------------------------------------------------

_GROUP_PCT_BODY = """
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(CASE WHEN rn = (n + 1) {intdiv} 2 THEN n_chars END)
                AS BIGINT) AS p50,
           CAST(max(CASE WHEN rn = (9 * n + 9) {intdiv} 10 THEN n_chars END)
                AS BIGINT) AS p90,
           CAST(max(CASE WHEN rn = n THEN n_chars END) AS BIGINT) AS p100
    FROM r GROUP BY source
"""

_q(
    "q_group_percentiles",
    _GROUP_PCT_BODY.format(intdiv="DIV"),
    _GROUP_PCT_BODY.format(intdiv="//"),
    "exact per-source length percentiles (p50/p90/max, lower-median "
    "rank convention) — all windows PARTITION BY source, integer-exact "
    "rank targets, no float interpolation",
)

# ---------------------------------------------------------------------------
# SymSpell-style fuzzy join: match a typo'd query set against the
# corpus dictionary within edit distance 1, WITHOUT an all-pairs
# comparison.  The query set is DERIVED deterministically from the
# dictionary itself (each dict token with an interior character deleted
# at an md5-chosen position — the planted-corpus pattern of the LSH
# queries, so the match set is nonempty by construction on any corpus).
# Candidate generation is the deletion neighborhood: each side emits
# itself plus its single-char deletions; two strings within distance 1
# always share a variant (identity/insertion/deletion directly,
# substitution via same-position deletions), so an equi-join on the
# variant finds every true pair and levenshtein() verifies (shared
# variants also arise at distance 2 — e.g. transpositions — and are
# filtered).  Dict is df-pruned (>= 3 docs) and length-banded (4..12)
# so the variant explosion is <= 13x a bounded vocab.  At 100 TB this
# is the canonical spell-correction join: both sides explode once,
# candidates equi-join on the variant key, verification touches
# candidates only.
# ---------------------------------------------------------------------------

_FUZZY_TYPO_POS = "(" + _hex8_of("md5(token)") + ") % (length(token) - 2) + 2"

_FUZZY_DICT_BODY = """
    WITH toks AS (
      SELECT DISTINCT doc_id, t AS token
      FROM (SELECT doc_id, {split} AS a FROM documents t0) t1 {gen}
      WHERE length(t) BETWEEN 4 AND 12
    )
    SELECT token, count(*) AS df FROM toks
    GROUP BY token HAVING count(*) >= 3
"""

_FUZZY_TAIL = """
    WITH queries AS (
      SELECT DISTINCT concat(substring(token, 1, p - 1), substring(token, p + 1))
               AS qtok
      FROM (SELECT token, {typo_pos} AS p FROM dict) tp
    ),
    qvars AS (
      SELECT qtok,
             CASE WHEN i = 0 THEN qtok
                  ELSE concat(substring(qtok, 1, i - 1),
                              substring(qtok, i + 1)) END AS v
      FROM queries {gen_q}
    ),
    dvars AS (
      SELECT token,
             CASE WHEN i = 0 THEN token
                  ELSE concat(substring(token, 1, i - 1),
                              substring(token, i + 1)) END AS v
      FROM dict {gen_d}
    ),
    cand AS (
      SELECT DISTINCT q.qtok, d.token
      FROM qvars q JOIN dvars d ON q.v = d.v
    )
    SELECT c.qtok AS query_token, c.token AS dict_token,
           CAST(levenshtein(c.qtok, c.token) AS BIGINT) AS dist,
           CAST(dd.df AS BIGINT) AS dict_df
    FROM cand c JOIN dict dd ON dd.token = c.token
    WHERE levenshtein(c.qtok, c.token) <= 1
"""

# Spark-side tail: same algebra as _FUZZY_TAIL but with the CTEs
# unrolled into derived tables.  Spark 4.1 cache-substitution gotcha
# (bisected empirically): a cached temp view whose DEFINITION itself
# contains a WITH-CTE (here: `WITH toks`) is NOT replaced by its
# InMemoryRelation when referenced from inside another WITH query —
# the outer/inner CTE merge renumbers cte ids so sameResult fails and
# the dict is re-derived from 3 parquet scans.  References through
# plain derived tables always substitute (verified: 3 InMemoryTableScans,
# 0 fresh document scans in this form's physical plan).
_FUZZY_TAIL_SPARK = f"""
    SELECT c.qtok AS query_token, c.token AS dict_token,
           CAST(levenshtein(c.qtok, c.token) AS BIGINT) AS dist,
           CAST(dd.df AS BIGINT) AS dict_df
    FROM (
      SELECT DISTINCT q.qtok, d.token
      FROM (
        SELECT qtok,
               CASE WHEN i = 0 THEN qtok
                    ELSE concat(substring(qtok, 1, i - 1),
                                substring(qtok, i + 1)) END AS v
        FROM (
          SELECT DISTINCT concat(substring(token, 1, p - 1),
                                 substring(token, p + 1)) AS qtok
          FROM (SELECT token, {_FUZZY_TYPO_POS} AS p FROM fuzzy_dict) tp
        ) queries LATERAL VIEW explode(sequence(0, length(qtok))) g2 AS i
      ) q JOIN (
        SELECT token,
               CASE WHEN i = 0 THEN token
                    ELSE concat(substring(token, 1, i - 1),
                                substring(token, i + 1)) END AS v
        FROM fuzzy_dict
        LATERAL VIEW explode(sequence(0, length(token))) g3 AS i
      ) d ON q.v = d.v
    ) c JOIN fuzzy_dict dd ON dd.token = c.token
    WHERE levenshtein(c.qtok, c.token) <= 1
"""


def _fuzzy_join_spark(spark, sf_dir: str):
    """Materialize the dictionary ONCE (persisted temp view): the
    inlined-CTE form re-derives the scan+explode+df-groupBy dict
    subtree for queries, dvars AND the df join — 6 document scans in
    the physical plan; this shape tokenizes once and every reference
    reads the cached skinny (token, df) frame."""
    register_views(spark, sf_dir)
    d = spark.sql(
        _FUZZY_DICT_BODY.format(
            split="split(lower(trim(text)), '\\\\s+')",
            gen="LATERAL VIEW explode(a) g AS t",
        )
    ).persist()
    d.createOrReplaceTempView("fuzzy_dict")
    return spark.sql(_FUZZY_TAIL_SPARK)


_FUZZY_DUCK = (
    "WITH dict AS ("
    + _FUZZY_DICT_BODY.format(
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        gen=", LATERAL (SELECT unnest(a) AS t) g",
    )
    + "), "
    + _FUZZY_TAIL.format(
        typo_pos=_FUZZY_TYPO_POS,
        gen_q=", LATERAL (SELECT unnest(generate_series(0, length(qtok))) AS i) g2",
        gen_d=", LATERAL (SELECT unnest(generate_series(0, length(token))) AS i) g3",
    ).replace("WITH queries AS", "queries AS", 1)
)

QUERIES["q_fuzzy_join"] = QuerySpec(
    spark=_fuzzy_join_spark,
    oracle=_FUZZY_DUCK,
    description=(
        "SymSpell deletion-neighborhood fuzzy join: md5-planted typo "
        "queries matched against the corpus dictionary within edit "
        "distance 1 via variant equi-join + levenshtein verify — no "
        "all-pairs comparison; dictionary materialized once"
    ),
)

# ---------------------------------------------------------------------------
# Character-entropy quality signal: per-doc Shannon entropy of the
# lowered character distribution.  Gibberish and keyboard-mash text
# score anomalously high, template/repetition spam anomalously low —
# a standard corpus-quality feature alongside q_quality_score's
# length/punct ratios and q_char_lm_score's bigram LM.
#
# Cross-engine float discipline (same as q_bm25 / q_cooccurrence):
# each per-character term  p*ln(1/p)  is floored to integer ppm-nats
# BEFORE the per-doc sum, so the only float arithmetic is one short
# identical chain per (doc, char) row and the sum itself is integer-
# exact and aggregation-order-independent.
#
# Shape at scale: the position explode emits skinny (doc_id, ch)
# pairs; both counts are map-side-combinable groupBys and the
# cnt-tot join keys on doc_id — one shuffle family, no windows.
# ---------------------------------------------------------------------------

_ENTROPY_BODY = """
    WITH src AS (
      SELECT doc_id, lower(trim(text)) AS s
      FROM documents WHERE n_chars > 0
    ),
    chars AS (
      SELECT doc_id, substring(s, i, 1) AS ch FROM src {gen}
    ),
    cnt AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id),
    terms AS (
      SELECT c.doc_id,
             CAST(floor(
               1e6 * (c.c * 1e0 / t.n) * ln(t.n * 1e0 / c.c)
             ) AS BIGINT) AS e_ppm
      FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_unique_chars,
           CAST(sum(e_ppm) AS BIGINT) AS entropy_ppm
    FROM terms GROUP BY doc_id
"""

def _char_counts_fn(it):
    """Vectorized per-doc codepoint counts — the engine side of
    q_char_entropy's ``cnt`` CTE.  The per-position SQL explode (kept as
    the oracle) materializes one row per CHARACTER with the parent
    columns duplicated per row — at the 10x sf that is ~15M generator
    rows through an exchange just to count ~30 distinct chars per doc.
    Here the codepoints come out once per doc via utf-32 decode and
    np.unique counts them — integer-only work, so no cross-engine float
    hazard; ``lower(trim(...))`` stays in Spark (Java and Python lowercase
    rules differ on edge codepoints), and substring-by-position == one
    codepoint == one utf-32 unit in both engines."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        if not len(pdf):
            continue
        out_doc, out_ch, out_c = [], [], []
        for doc_id, s in zip(pdf["doc_id"], pdf["s"]):
            if s is None or not s:
                continue
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            u, c = np.unique(codes, return_counts=True)
            out_doc.extend([doc_id] * len(u))
            out_ch.extend(chr(x) for x in u)
            out_c.extend(c.tolist())
        yield pd.DataFrame({"doc_id": out_doc, "ch": out_ch, "c": out_c})


# windowed total instead of the cnt-tot self-join: sum(c) OVER
# (PARTITION BY doc_id) is the same exact BIGINT sum, keyed on the same
# shuffle key the final groupBy reuses — and it references the Python
# counts frame ONCE (a second CTE reference would re-run the pass)
_ENTROPY_VERIFY_SPARK = """
    WITH terms AS (
      SELECT doc_id,
             CAST(floor(
               1e6 * (c * 1e0 / n) * ln(n * 1e0 / c)
             ) AS BIGINT) AS e_ppm
      FROM (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n
            FROM ce_cnt) t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_unique_chars,
           CAST(sum(e_ppm) AS BIGINT) AS entropy_ppm
    FROM terms GROUP BY doc_id
"""


def _char_entropy_spark(spark, sf_dir: str):
    register_views(spark, sf_dir)
    p = max(spark.sparkContext.defaultParallelism, 1)
    cnt = (
        spark.sql(
            "SELECT doc_id, lower(trim(text)) AS s FROM documents "
            "WHERE n_chars > 0"
        )
        # the documents parquet is one sub-split-size file -> a single
        # scan partition; spread the Python counting across the session's
        # parallelism (scale-adaptive, not a local[32] constant)
        .repartition(p)
        .mapInPandas(_char_counts_fn, "doc_id long, ch string, c long")
    )
    cnt.createOrReplaceTempView("ce_cnt")
    return spark.sql(_ENTROPY_VERIFY_SPARK)


QUERIES["q_char_entropy"] = QuerySpec(
    spark=_char_entropy_spark,
    oracle=_ENTROPY_BODY.format(
        gen=", LATERAL (SELECT unnest(generate_series(1, length(s))) AS i) g"
    ),
    description="per-doc Shannon char entropy in integer ppm-nats (per-char "
    "terms floored before the exact sum): vectorized codepoint counts, one "
    "doc_id-keyed shuffle shared by the windowed total and the final fold",
)

# ---------------------------------------------------------------------------
# Sliding-window token chunking — the context-window preparation step
# of every pretraining / RAG ingestion pipeline: split each document
# into overlapping chunks of W tokens advancing by stride S, carrying
# (doc_id, chunk_idx, token count, reassembled chunk text).
#
# Shape at scale: a pure NARROW flatMap — split, a bounded integer
# sequence explode, slice, join — with ZERO shuffles in the physical
# plan; the n_chars filter pushes to the parquet scan.  At 10^12 docs
# this runs at scan speed and partitions never exchange.
# ---------------------------------------------------------------------------

_CHUNK_W = 32
_CHUNK_S = 16

_CHUNK_BODY = """
    WITH toks AS (
      SELECT doc_id, {split} AS a
      FROM documents WHERE n_chars > 0
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx, {slice} AS c
      FROM toks {gen}
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST({csize} AS BIGINT) AS n_tokens,
           {cjoin} AS chunk_text
    FROM chunks
"""

_q(
    "q_chunk_windows",
    _CHUNK_BODY.format(
        split="split(trim(text), '\\\\s+')",
        gen=(
            "LATERAL VIEW explode(sequence(0, "
            f"CAST(floor((size(a) - 1) / {_CHUNK_S}) AS INT))) g AS i"
        ),
        slice=f"slice(a, i * {_CHUNK_S} + 1, {_CHUNK_W})",
        csize="size(c)",
        cjoin="array_join(c, ' ')",
    ),
    _CHUNK_BODY.format(
        split=r"string_split_regex(trim(text), '\s+')",
        gen=(
            ", LATERAL (SELECT unnest(generate_series(0, "
            f"CAST(floor((len(a) - 1) / {_CHUNK_S}) AS BIGINT))) AS i) g"
        ),
        slice=f"list_slice(a, i * {_CHUNK_S} + 1, i * {_CHUNK_S} + {_CHUNK_W})",
        csize="len(c)",
        cjoin="array_to_string(c, ' ')",
    ),
    f"sliding-window token chunking (W={_CHUNK_W}, stride={_CHUNK_S}) "
    "for context-window prep: narrow flatMap, zero shuffles, filter "
    "pushed to the scan",
)

# ---------------------------------------------------------------------------
# Per-domain cap — the "no domain may contribute more than K docs"
# curation rule (the share-capping step web-corpus pipelines run after
# dedup).  Selection is deterministic: each doc gets an md5 priority
# and the K smallest (priority, doc_id) per source survive.
#
# SKEW-SAFE SHAPE: a naive row_number() OVER (PARTITION BY source) puts
# a mega-domain's entire row set through one task.  The Spark side
# instead runs per-group top-k in TWO phases: phase 1 ranks within
# (source, salt) — 16 salted sub-partitions bound any single window
# partition to 1/16 of the domain — and keeps K per sub-partition;
# phase 2 re-ranks the <= 16*K survivors per source (a dim-sized
# window whatever the domain size).  Same survivors as the flat
# window because per-salt top-K is a superset of the global top-K.
# The ORACLE states the rule as the plain single window — the gate
# proves the salted plan equals the declarative spec.
# ---------------------------------------------------------------------------

_DCAP_K = 8
_DCAP_SALTS = 16

_DCAP_SPARK = f"""
    WITH p AS (
      SELECT source, doc_id,
             {{hex8}} AS pri
      FROM documents
    ),
    s1 AS (
      SELECT source, doc_id, pri,
             row_number() OVER (
               PARTITION BY source, pmod(doc_id, {_DCAP_SALTS})
               ORDER BY pri, doc_id
             ) AS r1
      FROM p
    ),
    s2 AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source ORDER BY pri, doc_id
             ) AS cap_rank
      FROM s1 WHERE r1 <= {_DCAP_K}
    )
    SELECT source, doc_id, CAST(cap_rank AS BIGINT) AS cap_rank
    FROM s2 WHERE cap_rank <= {_DCAP_K}
"""

_DCAP_DUCK = f"""
    WITH p AS (
      SELECT source, doc_id,
             {{hex8}} AS pri
      FROM documents
    ),
    s AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source ORDER BY pri, doc_id
             ) AS cap_rank
      FROM p
    )
    SELECT source, doc_id, CAST(cap_rank AS BIGINT) AS cap_rank
    FROM s WHERE cap_rank <= {_DCAP_K}
"""

_q(
    "q_domain_cap",
    _DCAP_SPARK.format(hex8=_hex8_of("md5(CAST(doc_id AS STRING))")),
    _DCAP_DUCK.format(hex8=_hex8_of("md5(CAST(doc_id AS VARCHAR))")),
    f"per-domain cap (K={_DCAP_K} docs/source by deterministic md5 "
    f"priority): salted two-phase per-group top-k — {_DCAP_SALTS} "
    "sub-partitions bound every window task regardless of domain skew; "
    "oracle is the flat declarative window",
)

# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier) over (n_chars, distinct-word count):
# the "keep only documents no other document dominates on BOTH length
# and lexical diversity" curation cut.  A doc survives iff no other doc
# has >= on both dims with > on at least one; duplicate (x, y) points
# all survive (neither dominates the other).
#
# Shape at scale: the naive skyline is an all-pairs anti-join —
# unshippable.  This plan collapses the corpus to ONE row per distinct
# x (max y per x, a map-side-combinable groupBy), then takes a running
# max over the collapsed frame ordered by x DESC.  That window IS
# global-order, but it runs over the per-x frame whose cardinality is
# bounded by the document-length domain (thousands of distinct values
# at ANY corpus scale — 100 TB of docs still have < ~10^6 distinct
# lengths), not by the row count; the full corpus only ever flows
# through the groupBy and the final broadcast-sized semi-join back.
# Survivor rule: y strictly above every ymax at larger x (a larger-x
# point with equal y dominates), and y equal to its own x's max.
# ---------------------------------------------------------------------------

_SKYLINE_BODY = """
    WITH feats AS (
      SELECT doc_id, n_chars AS x, CAST({ywords} AS BIGINT) AS y
      FROM documents WHERE n_chars > 0
    ),
    perx AS (SELECT x, max(y) AS ymax FROM feats GROUP BY x),
    runmax AS (
      SELECT x, ymax,
             max(ymax) OVER (
               ORDER BY x DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS bigger_x_ymax
      FROM perx
    ),
    skyx AS (
      SELECT x, ymax FROM runmax
      WHERE bigger_x_ymax IS NULL OR ymax > bigger_x_ymax
    )
    SELECT f.doc_id, f.x AS n_chars, f.y AS n_distinct_words
    FROM feats f JOIN skyx s ON f.x = s.x AND f.y = s.ymax
"""

_q(
    "q_skyline",
    _SKYLINE_BODY.format(
        ywords="size(array_distinct(split(lower(trim(text)), '\\\\s+')))"
    ),
    _SKYLINE_BODY.format(
        ywords=r"len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))"
    ),
    "2-D Pareto skyline over (length, distinct words): corpus collapsed "
    "to one row per distinct x before the running max, so the global "
    "window runs over a domain-bounded frame, never the row count",
)

# ---------------------------------------------------------------------------
# BPE first-merge pair statistics — the inner loop of byte-pair-encoding
# tokenizer TRAINING: count adjacent character pairs inside words across
# the corpus and rank the merge candidates.  The most frequent pair is
# exactly the first merge BPE would perform.
#
# Shape at scale: explode to skinny (pair) rows whose cardinality is
# bounded by alphabet^2, so the count is map-side combinable and the
# shuffle carries at most |alphabet|^2 rows per partition; the top-32
# plans as TakeOrdered (per-partition top-k folded on the driver), never
# a global sort.
# ---------------------------------------------------------------------------

_BPE_PAIRS_BODY = """
    WITH words AS (
      SELECT w FROM (
        SELECT {split} AS a FROM documents WHERE n_chars > 0
      ) t {gen_w}
    ),
    pairs AS (
      SELECT substring(w, i, 2) AS pair
      FROM words {gen_i}
      WHERE length(w) >= 2
    ),
    cnt AS (SELECT pair, count(*) AS c FROM pairs GROUP BY pair)
    SELECT pair, CAST(c AS BIGINT) AS n_occurrences
    FROM cnt ORDER BY n_occurrences DESC, pair LIMIT 32
"""

_q(
    "q_bpe_pairs",
    _BPE_PAIRS_BODY.format(
        split="split(lower(trim(text)), '\\\\s+')",
        gen_w="LATERAL VIEW explode(a) g AS w",
        gen_i="LATERAL VIEW explode(sequence(1, length(w) - 1)) g2 AS i",
    ),
    _BPE_PAIRS_BODY.format(
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        gen_w=", LATERAL (SELECT unnest(a) AS w) g",
        gen_i=", LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g2",
    ),
    "BPE tokenizer-training first-merge statistics: adjacent in-word "
    "char-pair counts (alphabet^2-bounded, map-side combinable), "
    "top-32 merge candidates via TakeOrdered",
)

# ---------------------------------------------------------------------------
# Robust per-source outlier detection via median/MAD — the
# length-anomaly screen that catches truncated or concatenation-corrupt
# documents without letting the outliers themselves poison the
# threshold (the reason production curation uses MAD over stddev).
# Exact integer medians by rank (lower-median convention, the
# q_group_percentiles discipline — percentile_cont would interpolate
# floats differently across engines).
#
# Shape at scale: every window PARTITIONs BY source — no global
# ordering anywhere; two window passes + two source-keyed joins, all
# shuffles on the source key.
# ---------------------------------------------------------------------------

_MAD_BODY = """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    med AS (
      SELECT source, n_chars AS med FROM r
      WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
    ),
    d AS (
      SELECT r.source, r.doc_id, abs(r.n_chars - m.med) AS dev, m.med
      FROM r JOIN med m ON r.source = m.source
    ),
    r2 AS (
      SELECT source, doc_id, dev, med,
             row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM d
    ),
    mad AS (
      SELECT source, dev AS mad FROM r2
      WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(d.med) AS BIGINT) AS median_chars,
           CAST(min(m.mad) AS BIGINT) AS mad_chars,
           CAST(sum(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM d JOIN mad m ON d.source = m.source
    GROUP BY d.source
"""

_q(
    "q_mad_outliers",
    _MAD_BODY,
    _MAD_BODY,
    "per-source robust length-outlier screen: exact integer median + "
    "MAD by rank (lower-median convention), flag |x-med| > 3*MAD — "
    "all windows PARTITION BY source, shuffles only on the source key",
)

# ---------------------------------------------------------------------------
# Set-similarity join via PREFIX FILTERING (AllPairs / PPJoin, Bayardo
# et al. 2007; Chaudhuri et al. 2006) — the third classical scale path
# to near-dup detection alongside MinHash-LSH (probabilistic) and
# SimHash banding (bitwise), and the only EXACT one: every pair with
# shingle-Jaccard >= t is guaranteed found (no-false-negative theorem:
# two sets with Jaccard >= t MUST share an element within each one's
# first |T| - ceil(t*|T|) + 1 elements under any single global order).
# It runs over the SAME char-8-gram shingle sets as MinHash/SimHash, so
# the trio answers the same question at three accuracy/cost points —
# this one exactly.
#
# The global order is (document frequency ASC, shingle) — prefixes are
# each doc's RAREST shingles, so the candidate equi-join fans out on
# low-df keys only; a boilerplate shingle shared by every document
# never becomes a join key.  That df-ordering IS the skew control:
# candidate volume is sum_s df_prefix(s)^2 over rare s, not corpus^2.
# On top of the prefix condition, the candidate join applies PPJoin's
# LENGTH filter (J >= t forces 10*min(|a|,|b|) >= 9*max(|a|,|b|)) and
# POSITIONAL filter (for the first common element at 1-based prefix
# positions ra, rb every common element sits at or after it in BOTH
# sets, so I <= min(na-ra, nb-rb)+1 must reach alpha =
# ceil(9*(na+nb)/19) = (9*(na+nb)+18) div 19).  Both are provably
# false-negative-free, and together they cut candidates ~31x at sf0.1
# (84,646 -> 2,652 for the same 255 result pairs) — the margin that
# keeps the verify join linear-ish at corpus scale.
# (Unigram WORD sets are deliberately NOT used: on a bounded vocabulary
# they saturate — nearly every doc pair clears 0.9 — which is exactly
# the quadratic blow-up prefix filtering exists to avoid.)  Exact
# integer verify on candidates only; threshold compare (10*i >= 9*u)
# and jaccard_ppm stay in int64 — no float anywhere.
# ---------------------------------------------------------------------------

_PREFIX_JOIN_BODY = """
    WITH tok AS ({shingles}),
    df AS (SELECT s, count(*) AS df FROM tok GROUP BY s),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    r AS (
      SELECT t.doc_id, t.s, z.n,
             row_number() OVER (
               PARTITION BY t.doc_id ORDER BY d.df, t.s
             ) AS rn
      FROM tok t JOIN df d ON d.s = t.s JOIN sz z ON z.doc_id = t.doc_id
    ),
    pref AS (
      SELECT doc_id, s, rn, n FROM r
      WHERE rn <= n - ((9 * n + 9) {idiv} 10) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM pref a JOIN pref b ON b.s = a.s AND b.doc_id > a.doc_id
       AND 10 * least(a.n, b.n) >= 9 * greatest(a.n, b.n)
       AND least(a.n - a.rn, b.n - b.rn) + 1
           >= (9 * (a.n + b.n) + 18) {idiv} 19
    ),
    inter AS (
      SELECT c.a, c.b, count(*) AS i
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.a
      JOIN tok tb ON tb.doc_id = c.b AND tb.s = ta.s
      GROUP BY c.a, c.b
    )
    SELECT x.a AS doc_a, x.b AS doc_b,
           CAST(x.i AS BIGINT) AS n_common,
           CAST(sa.n + sb.n - x.i AS BIGINT) AS n_union,
           CAST((x.i * 1000000) {idiv} (sa.n + sb.n - x.i) AS BIGINT)
             AS jaccard_ppm
    FROM inter x
    JOIN sz sa ON sa.doc_id = x.a
    JOIN sz sb ON sb.doc_id = x.b
    WHERE 10 * x.i >= 9 * (sa.n + sb.n - x.i)
"""

# engine-side verify: exact intersections via size(array_intersect) over
# per-doc shingle ARRAYS attached by broadcast hash joins — the oracle's
# cand JOIN tok JOIN tok form materializes |cand| x shingles-per-doc
# join rows (~23M at sf1.0, the q_containment lesson); the array form is
# |cand| rows with the set intersection in codegen.  The doc->array
# table is one skinny row per DOCUMENT (the dims-table pattern); at
# fleet scale it becomes a shuffle join on doc_id, same plan shape.
# Pairs with zero overlap cannot reach the output either way (the
# Jaccard >= 0.9 gate needs 10*i >= 9*union > 0).
_PREFIX_JOIN_VERIFY = """
    WITH sets AS (
      SELECT doc_id, collect_list(s) AS ss, CAST(count(*) AS BIGINT) AS n
      FROM pj_tok GROUP BY doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM pj_pref a JOIN pj_pref b ON b.s = a.s AND b.doc_id > a.doc_id
       AND 10 * least(a.n, b.n) >= 9 * greatest(a.n, b.n)
       AND least(a.n - a.rn, b.n - b.rn) + 1
           >= (9 * (a.n + b.n) + 18) {idiv} 19
    ),
    inter AS (
      SELECT /*+ BROADCAST(sa), BROADCAST(sb) */ c.a, c.b,
             CAST(size(array_intersect(sa.ss, sb.ss)) AS BIGINT) AS i,
             sa.n AS na, sb.n AS nb
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.a
      JOIN sets sb ON sb.doc_id = c.b
    )
    SELECT a AS doc_a, b AS doc_b,
           CAST(i AS BIGINT) AS n_common,
           CAST(na + nb - i AS BIGINT) AS n_union,
           CAST((i * 1000000) {idiv} (na + nb - i) AS BIGINT)
             AS jaccard_ppm
    FROM inter
    WHERE 10 * i >= 9 * (na + nb - i)
"""


def _prefix_join_spark(spark, sf_dir: str):
    """Materialize the shingle-set frame ONCE (the body references it six
    times: df, sz x2, rank, and twice in the verify join) and the ranked
    prefix frame once (referenced on both sides of the candidate join).
    Both are persisted AND eagerly materialized: persist() alone does not
    help when one plan hits the cache six times before any task has
    populated it — every subtree raced to recompute the explode+distinct
    (measured: 15.8 s -> ~5 s at sf0.1).  Same discipline as mh_wide."""
    register_views(spark, sf_dir)
    tok = spark.sql(_p_sub(spark, _SHINGLES_SPARK.format(src="documents"))).persist()
    tok.count()
    tok.createOrReplaceTempView("pj_tok")
    pref = spark.sql(
        """
        WITH sz AS (SELECT doc_id, count(*) AS n FROM pj_tok GROUP BY doc_id),
        r AS (
          SELECT t.doc_id, t.s,
                 row_number() OVER (
                   PARTITION BY t.doc_id ORDER BY d.df, t.s
                 ) AS rn, z.n
          FROM pj_tok t
          JOIN (SELECT s, count(*) AS df FROM pj_tok GROUP BY s) d ON d.s = t.s
          JOIN sz z ON z.doc_id = t.doc_id
        )
        SELECT doc_id, s, rn, n FROM r
        WHERE rn <= n - ((9 * n + 9) div 10) + 1
        """
    ).persist()
    pref.createOrReplaceTempView("pj_pref")
    return spark.sql(_PREFIX_JOIN_VERIFY.format(idiv="div"))


QUERIES["q_prefix_join"] = QuerySpec(
    spark=_prefix_join_spark,
    oracle=_PREFIX_JOIN_BODY.format(
        shingles=_SHINGLES_DUCK.format(src="documents"), idiv="//"
    ),
    description=(
        "exact set-similarity join (char-8-gram shingle Jaccard >= 0.9) via "
        "prefix filtering on df-ascending order: candidates join only on "
        "each doc's rarest shingles, exact integer verify on candidates only"
    ),
)

# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate — the "how much of this source does my
# tokenizer's vocab actually cover" screen run before training on a new
# source mix: build the corpus top-256 vocabulary by total occurrences
# (ties broken lexically — deterministic), then measure each source's
# out-of-vocabulary token rate in exact integer ppm.
#
# Shape at scale: the vocab is a TakeOrdered top-k (per-partition heaps
# folded on the driver, never a global sort) and is broadcast into the
# coverage join; token instances shuffle once on the token only for the
# map-side-combinable counts.  No windows.
# ---------------------------------------------------------------------------

_OOV_BODY = """
    WITH inst AS (
      SELECT source, w FROM (
        SELECT source, {split} AS a FROM documents WHERE n_chars > 0
      ) t {gen_w}
      WHERE w <> ''
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM inst GROUP BY w
        ORDER BY c DESC, w LIMIT 256
      ) v
    )
    SELECT i.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST((sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000)
                {idiv} count(*) AS BIGINT) AS oov_ppm
    FROM inst i LEFT JOIN vocab v ON v.w = i.w
    GROUP BY i.source
"""

_q(
    "q_oov_rate",
    _OOV_BODY.format(
        split="split(lower(trim(text)), '\\\\s+')",
        gen_w="LATERAL VIEW explode(a) g AS w",
        idiv="div",
    ),
    _OOV_BODY.format(
        split=r"string_split_regex(lower(trim(text)), '\s+')",
        gen_w=", LATERAL (SELECT unnest(a) AS w) g",
        idiv="//",
    ),
    "per-source out-of-vocabulary rate vs the corpus top-256 vocab: "
    "TakeOrdered vocab broadcast into the coverage join, exact integer "
    "ppm — no global sort, no windows",
)

# ---------------------------------------------------------------------------
# Corpus drift: pairwise KL divergence between per-source token
# distributions — the distribution-shift check run before mixing crawl
# snapshots / domains into one training corpus (and the alarm that a
# source's content changed under you).  Vocabulary is BOUNDED: the
# global top-32 tokens (count desc, token asc — total order), so the
# per-source distribution is a 32-vector regardless of corpus size and
# the pairwise table is |sources|^2 rows — driver-safe by construction.
#
# Add-one smoothing keeps every vocab token strictly positive in every
# source, so ln(p/q) is total.  Each KL term p*ln(p/q) is floored to
# integer ppm-nats BEFORE the per-pair sum (the q_char_entropy / q_bm25
# float discipline): the sum is an exact integer fold, order-independent
# under any partitioning.  Scale notes: one token-count shuffle + a
# top-32 TakeOrdered (no global window), then everything downstream is
# vocab-bounded; the pair join fans out 32 rows per source pair.
# ---------------------------------------------------------------------------

_SOURCE_KL_BODY = """
    WITH tok AS (
      SELECT source, t AS token FROM (
        SELECT source, {explode_t} FROM documents
      ) raw WHERE length(t) > 0
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS cnt FROM tok GROUP BY token
        ORDER BY cnt DESC, token ASC LIMIT 32
      ) top32
    ),
    srcs AS (SELECT DISTINCT source FROM documents),
    vt AS (SELECT s.source, v.token FROM srcs s CROSS JOIN vocab v),
    cnts AS (
      SELECT t.source, t.token, count(*) AS cnt
      FROM tok t JOIN vocab v ON v.token = t.token
      GROUP BY t.source, t.token
    ),
    filled AS (
      SELECT vt.source, vt.token, coalesce(c.cnt, 0) + 1 AS k
      FROM vt LEFT JOIN cnts c ON c.source = vt.source AND c.token = vt.token
    ),
    norms AS (SELECT source, sum(k) AS n FROM filled GROUP BY source),
    probs AS (
      SELECT f.source, f.token, CAST(f.k AS DOUBLE) / CAST(n.n AS DOUBLE) AS p
      FROM filled f JOIN norms n ON n.source = f.source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(sum(CAST(floor(a.p * ln(a.p / b.p) * 1.0e6) AS BIGINT)) AS BIGINT)
             AS kl_ppm
    FROM probs a JOIN probs b ON b.token = a.token AND a.source <> b.source
    GROUP BY a.source, b.source
"""

_SOURCE_KL_SPARK = _SOURCE_KL_BODY.format(
    explode_t="explode(split(lower(trim(text)), '\\\\s+')) AS t"
)
_SOURCE_KL_DUCK = _SOURCE_KL_BODY.format(
    explode_t=r"unnest(string_split_regex(lower(trim(text)), '\s+')) AS t"
)

_q(
    "q_source_kl",
    _SOURCE_KL_SPARK,
    _SOURCE_KL_DUCK,
    "pairwise per-source KL divergence over the global top-32 token "
    "vocab (add-one smoothed, integer ppm-nat terms floored before the "
    "sum) — the corpus drift / mixing diagnostic, vocab-bounded end to end",
)

# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment — the consistent
# sharding primitive a 10^12-doc corpus uses to place documents on
# storage/compute shards so that GROWING the shard count moves only
# ~1/(n+1) of the data (vs ~all of it under mod-n hashing).  Each doc
# scores every shard with hex8(md5(doc_id @ shard)) and lands on the
# argmax; the query assigns the SAME corpus under 8 and under 9 shards
# and reports the (shard8, shard9) transition matrix — the diagonal is
# the untouched mass, the single off-diagonal column (-> new shard 8)
# is the moved mass, and any other off-diagonal cell would be a bug in
# the argmax (HRW never reshuffles between surviving shards).
#
# Scale notes: the score fan-out is a bounded 9x narrow explode per doc
# (shards are O(1), broadcast literal range); the argmax is a
# PARTITION-BY-doc top-1 window; the matrix rollup is map-side
# combinable.  All integer md5 math — the gate hash-checks placement.
# ---------------------------------------------------------------------------

_HRW_BODY = """
    WITH shards AS (SELECT s FROM ({sseries}) ss),
    scored AS (
      SELECT d.doc_id, sh.s,
             ({score}) AS w
      FROM documents d CROSS JOIN shards sh
    ),
    ranked AS (
      SELECT doc_id, s, w,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY w DESC, s ASC
             ) AS rn
      FROM scored
    ),
    top8 AS (
      SELECT doc_id, s AS shard8 FROM (
        SELECT doc_id, s,
               row_number() OVER (
                 PARTITION BY doc_id ORDER BY w DESC, s ASC
               ) AS rn
        FROM scored WHERE s < 8
      ) r8 WHERE rn = 1
    ),
    top9 AS (SELECT doc_id, s AS shard9 FROM ranked WHERE rn = 1)
    SELECT CAST(t8.shard8 AS BIGINT) AS shard8,
           CAST(t9.shard9 AS BIGINT) AS shard9,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM top8 t8 JOIN top9 t9 ON t9.doc_id = t8.doc_id
    GROUP BY t8.shard8, t9.shard9
"""


def _hrw_sql(st: str, sseries: str) -> str:
    score = _hex8_of(
        f"md5(CAST(d.doc_id AS {st}) || '@' || CAST(sh.s AS {st}))"
    )
    return _HRW_BODY.format(sseries=sseries, score=score)


_HRW_SPARK = _hrw_sql("STRING", "SELECT explode(sequence(0, 8)) AS s")
_HRW_DUCK = _hrw_sql("VARCHAR", "SELECT unnest(generate_series(0, 8)) AS s")

_q(
    "q_shard_assign",
    _HRW_SPARK,
    _HRW_DUCK,
    "rendezvous (HRW) consistent sharding: argmax-of-md5 placement under "
    "8 and 9 shards, reported as the transition matrix — off-diagonal "
    "mass may only flow to the NEW shard; bounded 9x explode + per-doc "
    "top-1 window",
)

# ---------------------------------------------------------------------------
# Chi-square independence scan (lang x source contingency) — the
# statistical QA check a corpus mix runs to catch confounded sampling
# ("is language independent of source, or did one crawl bring all the
# German?").  Output is the full contingency table with each cell's
# expected count and chi-square contribution, so the hot cells are
# directly readable; the test aggregates them into the statistic.
#
# Exactness: expected_ppm = row*col*10^6 div n is pure int64;
# the contribution (o*n - row*col)^2 / (n*row*col) is evaluated in
# doubles whose INPUTS are exact integers well under 2^53 at any SF the
# gate runs (diff <= n*min(row,col)), and the op sequence is identical
# in both engines, so floor(...*1e6) is drift-free.  Scale notes: one
# (lang, source) rollup + two broadcast-sized marginal joins — the
# contingency table is |langs| x |sources|, driver-safe by construction.
# ---------------------------------------------------------------------------

_CHI2_BODY = """
    WITH cells AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
    ),
    rowm AS (SELECT lang, sum(o) AS r FROM cells GROUP BY lang),
    colm AS (SELECT source, sum(o) AS c FROM cells GROUP BY source),
    nn AS (SELECT sum(o) AS n FROM cells)
    SELECT ce.lang, ce.source,
           CAST(ce.o AS BIGINT) AS observed,
           CAST((rm.r * cm.c * 1000000) {idiv} nn.n AS BIGINT) AS expected_ppm,
           CAST(floor(
             (CAST(ce.o * nn.n - rm.r * cm.c AS DOUBLE)
              * CAST(ce.o * nn.n - rm.r * cm.c AS DOUBLE))
             / (CAST(nn.n AS DOUBLE) * CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE))
             * 1.0e6
           ) AS BIGINT) AS contrib_ppm
    FROM cells ce
    JOIN rowm rm ON rm.lang = ce.lang
    JOIN colm cm ON cm.source = ce.source
    CROSS JOIN nn
"""

_q(
    "q_chi2_independence",
    _CHI2_BODY.format(idiv="div"),
    _CHI2_BODY.format(idiv="//"),
    "chi-square independence scan over the lang x source contingency "
    "table: exact integer expected_ppm, drift-free double contributions "
    "— one rollup + broadcast marginals, result bounded by |langs|x|sources|",
)

# ---------------------------------------------------------------------------
# k-anonymity audit — the privacy-compliance twin of the PII scrub: a
# released corpus is k-anonymous over its quasi-identifiers when every
# QI combination covers >= k rows; smaller cells re-identify.  QIs here
# are (lang, source, length band of 256 chars); the output is every
# VIOLATING cell with its size plus each cell's risk share in ppm of
# the corpus, so the release gate can either suppress the cells or fail
# the drop.  Pure grouped rollup + filter — one map-side-combinable
# shuffle; the result is bounded by the violating-cell count, never the
# corpus.
# ---------------------------------------------------------------------------

_KANON_K = 5

_KANON_BODY = """
    WITH cells AS (
      SELECT lang, source, (n_chars {idiv} 256) AS len_band, count(*) AS n
      FROM documents
      GROUP BY lang, source, (n_chars {idiv} 256)
    ),
    nn AS (SELECT sum(n) AS total FROM cells)
    SELECT c.lang, c.source,
           CAST(c.len_band AS BIGINT) AS len_band,
           CAST(c.n AS BIGINT) AS n_docs,
           CAST((c.n * 1000000) {idiv} nn.total AS BIGINT) AS share_ppm
    FROM cells c CROSS JOIN nn
    WHERE c.n < {k}
"""

_q(
    "q_k_anonymity",
    _KANON_BODY.format(idiv="div", k=_KANON_K),
    _KANON_BODY.format(idiv="//", k=_KANON_K),
    "k-anonymity audit over (lang, source, 256-char length band) "
    "quasi-identifiers: every cell under k=5 with its corpus share — "
    "one combinable rollup, output bounded by violating cells",
)

# ---------------------------------------------------------------------------
# Lang-id confusion matrix — classifier evaluation as a distributed
# query: the stopword-hit heuristic (q_lang_id) scored against the
# corpus's labeled lang column, as the full (actual, predicted) matrix
# with per-cell share of its actual class in exact integer ppm (the
# row-recall the eval report reads).  This is the evaluation half every
# model-derived column needs at 10^12 docs: one map-only scoring pass,
# one (actual, predicted) rollup, one broadcast-sized marginal join.
# ---------------------------------------------------------------------------

_LANG_CONF_SQL = f"""
    WITH pred AS (
      SELECT doc_id,
             CASE WHEN en_hits > de_hits THEN 'en'
                  WHEN de_hits > en_hits THEN 'de'
                  ELSE 'und' END AS lang_guess
      FROM (SELECT doc_id, {{en}} AS en_hits, {{de}} AS de_hits
            FROM ({_LOWERED}))
    ),
    cells AS (
      SELECT d.lang AS actual, p.lang_guess AS predicted, count(*) AS n
      FROM documents d JOIN pred p ON p.doc_id = d.doc_id
      GROUP BY d.lang, p.lang_guess
    ),
    rowm AS (SELECT actual, sum(n) AS r FROM cells GROUP BY actual)
    SELECT c.actual, c.predicted,
           CAST(c.n AS BIGINT) AS n_docs,
           CAST((c.n * 1000000) {{idiv}} m.r AS BIGINT) AS row_share_ppm
    FROM cells c JOIN rowm m ON m.actual = c.actual
"""


def _lang_conf(idiv: str) -> str:
    return _LANG_CONF_SQL.format(
        en=_hits(_EN_WORDS), de=_hits(_DE_WORDS), idiv=idiv
    )


_q(
    "q_lang_confusion",
    _lang_conf("div"),
    _lang_conf("//"),
    "lang-id heuristic vs labeled lang as a confusion matrix with exact "
    "integer row-recall ppm — classifier eval as one scoring pass + one "
    "rollup",
)

# ---------------------------------------------------------------------------
# N-gram novelty — per-document fraction of word-3-grams that already
# appeared in an EARLIER document (doc_id order = ingest order): the
# template/boilerplate-spam curve a crawl QA run reads (novelty
# collapsing toward 0 means the feed is re-serving the same template),
# and the incremental-dedup attribution ("how much of this doc is new
# corpus-wise?").  First occurrence is a min(doc_id) per gram — the
# attribution rollup — joined back to each doc's grams; novelty_ppm is
# exact integer division over the doc's distinct-gram count.
#
# Scale notes: two combinable shuffles (gram -> min doc, doc rollup);
# the gram key space is the usual shingle skew surface, same discipline
# as the MinHash shingle pass.  No windows, no iteration.
# ---------------------------------------------------------------------------

_NOVELTY_BODY = """
    WITH toks AS (
      SELECT doc_id, t AS w, i
      FROM (
        SELECT doc_id, {split} AS a FROM documents
      ) s {explode}
    ),
    grams AS (
      SELECT a.doc_id, concat(a.w, ' ', b.w, ' ', c.w) AS g
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    dg AS (SELECT DISTINCT doc_id, g FROM grams),
    first_seen AS (SELECT g, min(doc_id) AS first_doc FROM dg GROUP BY g)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                 * 1000000) {idiv} count(*) AS BIGINT) AS novelty_ppm
    FROM dg d JOIN first_seen f ON f.g = d.g
    GROUP BY d.doc_id
"""

# engine side: the oracle's 3-way positional self-join (toks a/b/c on
# doc_id, i+1, i+2) shuffled the 2.5M-row token frame twice just to glue
# adjacent words; the same grams come straight off the split array with
# a bounded transform — zero joins, zero shuffles before the DISTINCT —
# and the repartition spreads the single-row-group scan first
_NOVELTY_SPARK = """
    WITH dg AS (
      -- per-doc DISTINCT via array_distinct before the explode: the
      -- corpus-wide dedup exchange of every gram row disappears
      SELECT doc_id, explode(array_distinct(CASE WHEN size(a) >= 3
        THEN transform(sequence(0, size(a) - 3),
                       i -> concat(a[i], ' ', a[i + 1], ' ', a[i + 2]))
        ELSE array() END)) AS g
      FROM (SELECT /*+ REPARTITION(__P__) */ doc_id,
                   split(lower(trim(text)), '\\\\s+') AS a FROM documents) s
    ),
    first_seen AS (SELECT g, min(doc_id) AS first_doc FROM dg GROUP BY g)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                 * 1000000) div count(*) AS BIGINT) AS novelty_ppm
    FROM dg d JOIN first_seen f ON f.g = d.g
    GROUP BY d.doc_id
"""
_NOVELTY_DUCK = _NOVELTY_BODY.format(
    split=r"string_split_regex(lower(trim(text)), '\s+')",
    explode=", LATERAL (SELECT unnest(generate_series(1, len(a))) AS i) gi, LATERAL (SELECT a[gi.i] AS t) gt",
    idiv="//",
)

_q(
    "q_ngram_novelty",
    _NOVELTY_SPARK,
    _NOVELTY_DUCK,
    "per-doc word-3-gram novelty vs all earlier docs (first-occurrence "
    "attribution via min-doc per gram): the template-spam / "
    "incremental-dedup curve, two combinable shuffles",
)

# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment — exact integer allocation
# of a fixed sample budget K=97 (prime, so perfectly balanced strata still leave remainder seats) across strata: quota = K * n_s / N, every
# stratum gets floor(quota), and the leftover seats go to the largest
# fractional remainders (ties to the smaller source name — total
# order).  This is how a fixed-size eval set / annotation budget is
# split proportionally WITHOUT float drift or a lottery: the result
# sums to exactly K by construction, which the test asserts.
#
# Remainders compare as exact integers (quota_num mod N), never as
# floats.  Scale notes: one count-by-stratum rollup; the apportionment
# itself runs on |strata| rows (driver-safe) via one TakeOrdered over
# remainders — no windows, no global sort of data rows.
# ---------------------------------------------------------------------------

_APPORTION_K = 97

_APPORTION_BODY = """
    WITH strata AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    nn AS (SELECT sum(n_docs) AS total FROM strata),
    quotas AS (
      SELECT s.source, s.n_docs,
             (s.n_docs * {k}) {idiv} nn.total AS base_seats,
             (s.n_docs * {k}) % nn.total AS rem_num
      FROM strata s CROSS JOIN nn
    ),
    leftover AS (
      SELECT ({k} - sum(base_seats)) AS extra FROM quotas
    ),
    ranked AS (
      SELECT source, n_docs, base_seats, rem_num,
             row_number() OVER (ORDER BY rem_num DESC, source ASC) AS rk
      FROM quotas
    )
    SELECT r.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(r.base_seats + CASE WHEN r.rk <= l.extra THEN 1 ELSE 0 END
                AS BIGINT) AS sample_quota
    FROM ranked r CROSS JOIN leftover l
"""

_q(
    "q_sample_apportion",
    _APPORTION_BODY.format(k=_APPORTION_K, idiv="div"),
    _APPORTION_BODY.format(k=_APPORTION_K, idiv="//"),
    "largest-remainder apportionment of a fixed K=97 sample budget "
    "across sources: exact integer quotas + remainders, sums to K by "
    "construction; apportionment runs on |strata| rows",
)

# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup blocking (Hernandez-Stolfo) — the OTHER
# classical blocking family next to LSH: sort the corpus by a cheap
# key (leading 12 normalized chars), then compare only records within
# a sliding window of w = 4 positions.  Where LSH buckets by hash
# collision, sorted-neighborhood catches near-dups whose PREFIXES
# agree — the typo / truncation / re-serialization cluster family.
# Candidates verify with levenshtein <= 3 on the key (exact integers).
#
# The SPARK side gets global positions from the two-phase rank (never a
# single-task window) and turns the +/-3-position window into an
# EQUI-join: band = pos div 4, each row probes its own and the next
# band (2x skinny fan-out), |pos_a - pos_b| <= 3 filters exactly.  The
# ORACLE uses the declarative row_number + self-join.  Scale notes: one
# rank pass + one equi-join on band — candidate count is n*w, never
# n^2; the band join is the same bounded-neighborhood move as
# q_grid_radius_join's 3x3 cells in 1-D.
# ---------------------------------------------------------------------------

_SN_WINDOW = 4


def _sorted_neighborhood_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from . import register_views
    from .prefix import global_row_number

    register_views(spark, sf_dir)
    keyed = spark.table("documents").select(
        "doc_id",
        F.expr("substring(lower(trim(text)), 1, 12)").alias("key12"),
    )
    pos = global_row_number(keyed, ["key12", "doc_id"], "pos").select(
        "doc_id", "key12", F.col("pos").cast("long").alias("pos")
    )
    w = _SN_WINDOW
    a = pos.select(
        F.col("doc_id").alias("a_id"), F.col("key12").alias("a_key"),
        F.col("pos").alias("a_pos"),
    )
    probes = a.select(
        "a_id", "a_key", "a_pos", F.explode(
            F.array(F.expr(f"a_pos div {w}"), F.expr(f"a_pos div {w} + 1"))
        ).alias("band"),
    )
    b = pos.select(
        F.col("doc_id").alias("b_id"), F.col("key12").alias("b_key"),
        F.col("pos").alias("b_pos"), F.expr(f"pos div {w}").alias("band"),
    )
    return (
        probes.join(b, "band")
        .where(
            (F.col("b_pos") > F.col("a_pos"))
            & (F.col("b_pos") - F.col("a_pos") <= w - 1)
        )
        .where(F.expr("levenshtein(a_key, b_key) <= 3"))
        .select(
            "a_id", "b_id",
            (F.col("b_pos") - F.col("a_pos")).cast("bigint").alias("pos_gap"),
            F.expr("CAST(levenshtein(a_key, b_key) AS BIGINT)").alias("key_lev"),
        )
    )


_SN_DUCK = f"""
    WITH keyed AS (
      SELECT doc_id, substring(lower(trim(text)), 1, 12) AS key12
      FROM documents
    ),
    pos AS (
      SELECT doc_id, key12,
             CAST(row_number() OVER (ORDER BY key12, doc_id) AS BIGINT) AS pos
      FROM keyed
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(b.pos - a.pos AS BIGINT) AS pos_gap,
           CAST(levenshtein(a.key12, b.key12) AS BIGINT) AS key_lev
    FROM pos a JOIN pos b
      ON b.pos > a.pos AND b.pos - a.pos <= {_SN_WINDOW - 1}
    WHERE levenshtein(a.key12, b.key12) <= 3
"""

QUERIES["q_sorted_neighborhood"] = QuerySpec(
    spark=_sorted_neighborhood_spark,
    oracle=_SN_DUCK,
    description=(
        "sorted-neighborhood dedup blocking (w=4 window over the "
        "12-char normalized prefix order): two-phase global rank + "
        "banded equi-join (candidates n*w, never n^2), levenshtein "
        "verify"
    ),
)

# ---------------------------------------------------------------------------
# Corpus diversity index — the one-row mixture diagnostic read before
# weighting a training blend: Shannon entropy of the source shares (in
# floored ppm-nats, the q_char_entropy discipline) and the Gini
# coefficient of source sizes computed EXACTLY as integers via the
# mean-absolute-difference form (sum |n_i - n_j| over ordered pairs,
# cross-multiplied — no sorting, no floats).  Both collapse the corpus
# to |sources| rows before any pairwise work, so the O(|sources|^2)
# Gini join is bounded regardless of corpus size.
# ---------------------------------------------------------------------------

_DIVERSITY_BODY = """
    WITH strata AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    nn AS (SELECT sum(n) AS total, count(*) AS k FROM strata),
    ent AS (
      SELECT sum(CAST(floor(
               (CAST(s.n AS DOUBLE) / CAST(nn.total AS DOUBLE))
               * ln(CAST(nn.total AS DOUBLE) / CAST(s.n AS DOUBLE))
               * 1.0e6
             ) AS BIGINT)) AS h_ppm
      FROM strata s CROSS JOIN nn
    ),
    gini AS (
      SELECT sum(abs(a.n - b.n)) AS mad_num
      FROM strata a CROSS JOIN strata b
    )
    SELECT CAST(nn.k AS BIGINT) AS n_sources,
           CAST(nn.total AS BIGINT) AS n_docs,
           CAST(e.h_ppm AS BIGINT) AS entropy_ppm_nats,
           CAST((g.mad_num * 1000000) {idiv} (2 * nn.k * nn.total) AS BIGINT)
             AS gini_ppm
    FROM nn CROSS JOIN ent e CROSS JOIN gini g
"""

_q(
    "q_corpus_diversity",
    _DIVERSITY_BODY.format(idiv="div"),
    _DIVERSITY_BODY.format(idiv="//"),
    "corpus diversity index: source-share Shannon entropy (floored "
    "ppm-nats) + EXACT integer Gini via the mean-absolute-difference "
    "form — pairwise work bounded by |sources|^2",
)

# ---------------------------------------------------------------------------
# Dedup ROI report — what near-exact dedup would actually SAVE: per
# duplicate cluster (head-64 fingerprint, the q_doc_fingerprint key —
# full-text md5 finds nothing on this corpus, prefix collisions are the
# realistic template-dup signal) the copy count and reclaimable bytes
# under a FIRST-SEEN retention policy (the min-doc_id copy is kept;
# wasted = cluster bytes minus the keeper's own size, so the keeper
# column and the byte math describe the same policy — ADVICE r03),
# plus the cluster's share of total corpus bytes in exact ppm.  This
# is the report that justifies (or kills) a dedup pass before anyone
# runs it at 100 TB — one hash rollup, no join back to the corpus,
# output bounded by the duplicated clusters only.  min_by is
# deterministic here because doc_id is unique within a cluster.
# ---------------------------------------------------------------------------

_DEDUP_ROI_BODY = """
    WITH clusters AS (
      SELECT md5(substring(text, 1, 64)) AS h, count(*) AS copies,
             min(doc_id) AS keep_doc, sum(n_chars) AS sz_all,
             min_by(n_chars, doc_id) AS sz_keep
      FROM documents GROUP BY md5(substring(text, 1, 64))
    ),
    nn AS (SELECT sum(n_chars) AS total_bytes FROM documents)
    SELECT c.keep_doc,
           CAST(c.copies AS BIGINT) AS copies,
           CAST(c.sz_all - c.sz_keep AS BIGINT) AS wasted_bytes,
           CAST(((c.sz_all - c.sz_keep) * 1000000) {idiv} nn.total_bytes
                AS BIGINT) AS waste_ppm
    FROM clusters c CROSS JOIN nn
    WHERE c.copies > 1
"""

_q(
    "q_dedup_savings",
    _DEDUP_ROI_BODY.format(idiv="div"),
    _DEDUP_ROI_BODY.format(idiv="//"),
    "dedup ROI report: per head-64-fingerprint duplicate cluster the "
    "copy count, reclaimable bytes under a first-seen (min doc_id) "
    "retention policy, and exact ppm share of corpus bytes — one hash "
    "rollup",
)

# ---------------------------------------------------------------------------
# Type-token ratio — per-source lexical richness (distinct tokens over
# total tokens, exact integer ppm): the corpus-linguistics quality
# signal that separates generative boilerplate (low TTR) from diverse
# prose, read next to q_char_entropy and q_quality_score when deciding
# source weights.  One tokenize pass, two combinable rollups.
# ---------------------------------------------------------------------------

_TTR_BODY = """
    WITH tok AS (
      SELECT source, t AS token FROM (
        SELECT source, {explode_t} FROM documents
      ) raw WHERE length(t) > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT token) AS BIGINT) AS n_types,
           CAST((count(DISTINCT token) * 1000000) {idiv} count(*) AS BIGINT)
             AS ttr_ppm
    FROM tok GROUP BY source
"""

_q(
    "q_type_token_ratio",
    _TTR_BODY.format(
        explode_t="explode(split(lower(trim(text)), '\\\\s+')) AS t", idiv="div"
    ),
    _TTR_BODY.format(
        explode_t=r"unnest(string_split_regex(lower(trim(text)), '\s+')) AS t",
        idiv="//",
    ),
    "per-source type-token ratio in exact integer ppm — the lexical "
    "richness signal for source weighting; one tokenize pass, "
    "combinable rollups",
)


# ---------------------------------------------------------------------------
# q_sparse_knn — top-k cosine neighbors over TF-IDF sparse vectors, the
# sparse-retrieval workhorse (near-dup mining, contamination checks,
# BM25-ish related-document lookup) expressed at scale: candidates come
# from an INVERTED-INDEX self-join restricted to RARE terms (df in
# [2, 10]) — the PPJoin-style bound that keeps candidate volume at
# sum(df_rare^2) instead of n^2 — and each candidate pair's cosine is
# then computed EXACTLY over all shared terms.  (Pairs sharing only
# high-df stopwords are not candidates: the standard recall/cost trade
# of posting-pruned sparse ANN, same contract as q_prefix_join.)
#
# Exactness discipline: weights are INTEGER w = tf * floor(100 * N / df)
# (one float divide + floor, identical single ops both engines), so
# dots and norms are exact int64 sums — order-independent — and the
# only remaining float math is the final sqrt/divide/round(6) chain.
# ---------------------------------------------------------------------------

_SPARSE_KNN_K = 3

_SPARSE_KNN_BODY = """
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (SELECT doc_id, token,
                 tf * CAST(floor(100.0 * n_docs / df) AS BIGINT) AS w
          FROM tf JOIN dfreq USING (token) CROSS JOIN n),
    nrm AS (SELECT doc_id, sum(w * w) AS nn FROM w GROUP BY 1),
    rare AS (SELECT token FROM dfreq WHERE df BETWEEN 2 AND 10),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM w a JOIN rare USING (token) JOIN w b USING (token)
      WHERE a.doc_id < b.doc_id
    ),
    dots AS (
      -- candidates FIRST: joining w to itself on token before the cand
      -- filter materializes df^2 rows per token (47 s at sf0.1 measured,
      -- n^2-shaped at fleet scale); driving from cand keeps the
      -- intermediate at |cand| x tokens-per-doc
      SELECT c.d1, c.d2, sum(x.w * y.w) AS dot
      FROM cand c
      JOIN w x ON x.doc_id = c.d1
      JOIN w y ON y.doc_id = c.d2 AND y.token = x.token
      GROUP BY c.d1, c.d2
    ),
    sims AS (
      SELECT d1, d2,
             round(CAST(dot AS DOUBLE) /
                   (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))),
                   6) AS sim
      FROM dots JOIN nrm n1 ON n1.doc_id = dots.d1
                JOIN nrm n2 ON n2.doc_id = dots.d2
    ),
    sym AS (
      SELECT d1 AS doc_id, d2 AS neighbor, sim FROM sims
      UNION ALL
      SELECT d2 AS doc_id, d1 AS neighbor, sim FROM sims
    )
    SELECT doc_id, neighbor, sim FROM (
      SELECT sym.*, row_number() OVER (
        PARTITION BY doc_id ORDER BY sim DESC, neighbor) AS rn
      FROM sym
    ) t WHERE rn <= {k}
"""

# terms are word BIGRAMS: the corpus vocabulary is tiny (every unigram
# is a stopword by df), while bigrams have the long-tailed df profile
# real sparse retrieval exploits
#
# Engine-side body: same algebra as the oracle body except (a) sym's
# two directions come from ONE explode — the UNION ALL form re-evaluates
# the sims subtree twice where the subtrees are not exchange-identical —
# and (b) the scan is repartition-hinted (the documents parquet is one
# sub-split-size file, so the explode otherwise runs on a single core).
# NOT materialized into a persisted frame: Spark's ReusedExchange
# already computes each identical aggregate/join subtree once here (an
# experiment that persisted w measured 14.2 s vs 8.5 s inline at sf1.0).
_SPARSE_KNN_SPARK_BODY = """
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (SELECT doc_id, token,
                 tf * CAST(floor(100.0 * n_docs / df) AS BIGINT) AS w
          FROM tf JOIN dfreq USING (token) CROSS JOIN n),
    nrm AS (SELECT doc_id, sum(w * w) AS nn FROM w GROUP BY 1),
    rare AS (SELECT token FROM dfreq WHERE df BETWEEN 2 AND 10),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM w a JOIN rare USING (token) JOIN w b USING (token)
      WHERE a.doc_id < b.doc_id
    ),
    dots AS (
      SELECT c.d1, c.d2, sum(x.w * y.w) AS dot
      FROM cand c
      JOIN w x ON x.doc_id = c.d1
      JOIN w y ON y.doc_id = c.d2 AND y.token = x.token
      GROUP BY c.d1, c.d2
    ),
    sims AS (
      SELECT d1, d2,
             round(CAST(dot AS DOUBLE) /
                   (sqrt(CAST(n1.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))),
                   6) AS sim
      FROM dots JOIN nrm n1 ON n1.doc_id = dots.d1
                JOIN nrm n2 ON n2.doc_id = dots.d2
    ),
    sym AS (
      SELECT pr.doc_id, pr.neighbor, pr.sim FROM (
        SELECT explode(array(
          struct(d1 AS doc_id, d2 AS neighbor, sim),
          struct(d2 AS doc_id, d1 AS neighbor, sim)
        )) AS pr FROM sims
      )
    )
    SELECT doc_id, neighbor, sim FROM (
      SELECT sym.*, row_number() OVER (
        PARTITION BY doc_id ORDER BY sim DESC, neighbor) AS rn
      FROM sym
    ) t WHERE rn <= {k}
"""

_SPARSE_KNN_SPARK = f"""
    WITH base AS (
      SELECT /*+ REPARTITION({{p}}) */ doc_id,
             split(lower(trim(text)), '\\\\s+') AS arr FROM documents
    ),
    toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, explode(CASE WHEN size(arr) >= 2
          THEN transform(sequence(0, size(arr) - 2),
                         i -> concat(arr[i], ' ', arr[i + 1]))
          ELSE array() END) AS token
        FROM base
      ) WHERE token <> ' '
    ),
    {_SPARSE_KNN_SPARK_BODY.format(k=_SPARSE_KNN_K)}
"""


def _sparse_knn_spark(spark, sf_dir: str):
    register_views(spark, sf_dir)
    p = max(spark.sparkContext.defaultParallelism, 1)
    return spark.sql(_SPARSE_KNN_SPARK.format(p=p))

_SPARSE_KNN_DUCK = rf"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS arr
      FROM documents
    ),
    toks AS (
      SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS token
      FROM base, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i) g
      WHERE arr[i] || ' ' || arr[i + 1] <> ' '
    ),
    {_SPARSE_KNN_BODY.format(k=_SPARSE_KNN_K)}
"""

QUERIES["q_sparse_knn"] = QuerySpec(
    spark=_sparse_knn_spark,
    oracle=_SPARSE_KNN_DUCK,
    description=f"top-{_SPARSE_KNN_K} cosine neighbors over integer TF-IDF "
    "sparse vectors; rare-term inverted-index candidates (df<=10), exact "
    "int64 dots/norms over all shared terms of a materialized weight frame",
)


# ---------------------------------------------------------------------------
# q_winnowing — MOSS winnowing fingerprints (Schleimer, Wilkerson,
# Aiken 2003), the selection-based document fingerprinting used for
# plagiarism / benchmark-contamination sweeps: hash every word 3-gram,
# slide a window of 4 consecutive gram hashes, keep each window's MINIMUM
# (rightmost position on ties — the guarantee that shared substrings of
# length >= k+w-1 always share a fingerprint).  Output: the shared-
# fingerprint profile (fingerprints seen in >= 2 documents, with doc and
# occurrence counts) — the contamination candidate list.
#
# Scale shape: every window is a BOUNDED frame PARTITIONed BY doc_id
# (ROWS BETWEEN CURRENT AND 3 FOLLOWING), the profile is one
# map-side-combinable groupBy(fp).  Exactness: the (min h, rightmost
# pos) choice is packed into ONE BIGINT key = h * 2^26 + (2^26-1-pos)
# (h < 2^32 -> key < 2^58, exact int64; unpacked with INTEGER division
# — float division is only exact below 2^53).  pos < 2^26 covers ~67M
# grams per document; beyond that the packed tie-break would corrupt
# silently (round-4 advice: the old 2^20 field broke at ~1M grams), so
# each dialect raises LOUDLY on pos overflow instead (Spark assert_true
# / DuckDB error()) — a 67M-word single document means upstream doc
# assembly is broken, not that fingerprints should quietly go wrong.
# ---------------------------------------------------------------------------

_WINNOW_K = 3   # words per gram
_WINNOW_W = 4   # gram hashes per window
_WINNOW_POS_W = 1 << 26  # position-field width of the packed key

_WINNOW_BODY = f"""
    grams AS (
      SELECT doc_id, {{posguard}} AS pos, {{h}} AS h FROM gtext
    ),
    sel AS (
      SELECT doc_id,
             min(h * {_WINNOW_POS_W} + ({_WINNOW_POS_W - 1} - pos)) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS key,
             count(*) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS wn
      FROM grams
    ),
    fps AS (
      SELECT DISTINCT doc_id, {{unpack}} AS fp
      FROM sel WHERE wn = {_WINNOW_W}
    )
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM fps GROUP BY fp HAVING count(*) >= 2
"""

# loud per-dialect pos-overflow guards + exact integer-division unpack
_WINNOW_GUARD_SPARK = (
    f"pos + CAST(coalesce(assert_true(pos < {_WINNOW_POS_W}, "
    f"'q_winnowing: document exceeds {_WINNOW_POS_W} grams'), 0) AS INT)"
)
_WINNOW_GUARD_DUCK = (
    f"pos + CASE WHEN pos < {_WINNOW_POS_W} THEN 0 "
    f"ELSE CAST(error('q_winnowing: document exceeds {_WINNOW_POS_W} grams') "
    f"AS INT) END"
)
_WINNOW_UNPACK_SPARK = f"CAST(key DIV {_WINNOW_POS_W} AS BIGINT)"
_WINNOW_UNPACK_DUCK = f"CAST(key // {_WINNOW_POS_W} AS BIGINT)"

# Engine side entirely in the ARRAY domain: per doc, build the gram-hash
# array, slide the 4-window min over it with slice/array_min, unpack and
# array_distinct — the per-doc fingerprint set falls out of ONE narrow
# projection, so the oracle's per-gram explode + windowed min (a full
# sort+shuffle of every gram row) and the DISTINCT exchange disappear;
# the only shuffle left is the final groupBy(fp).  Same packed-key
# arithmetic (h * 2^26 + (2^26-1-pos), integer-division unpack) and the
# same loud pos-overflow guard, so values are oracle-identical.
_WINNOW_SPARK = f"""
    WITH base AS (
      SELECT /*+ REPARTITION(__P__) */ doc_id,
             split(lower(trim(text)), '\\\\s+') AS arr FROM documents
    ),
    hs AS (
      -- gram md5s hoisted into their own array so the packed-key lambda
      -- below reads hs[i] eight times instead of re-hashing the gram
      -- per hex digit (lambda bodies get no codegen subexpression
      -- elimination)
      SELECT doc_id,
             CASE WHEN size(arr) >= {_WINNOW_K}
               THEN transform(
                 sequence(0, size(arr) - {_WINNOW_K}),
                 i -> md5(concat_ws(' ', slice(arr, i + 1, {_WINNOW_K}))))
               ELSE array() END AS hs
      FROM base
    ),
    keys AS (
      SELECT doc_id,
             CASE WHEN size(hs) >= 1 THEN transform(
               sequence(1, size(hs)),
               i -> CAST({_hex8_of("hs[i - 1]")} AS BIGINT) * {_WINNOW_POS_W}
                 + ({_WINNOW_POS_W} - i
                    + CAST(coalesce(assert_true(
                        i <= {_WINNOW_POS_W},
                        'q_winnowing: document exceeds {_WINNOW_POS_W} grams'
                      ), 0) AS INT)))
             ELSE array() END AS ks
      FROM hs
    ),
    fps AS (
      SELECT doc_id, explode(array_distinct(
               CASE WHEN size(ks) >= {_WINNOW_W}
                 THEN transform(sequence(0, size(ks) - {_WINNOW_W}),
                                i -> array_min(slice(ks, i + 1, {_WINNOW_W}))
                                     DIV {_WINNOW_POS_W})
                 ELSE array() END)) AS fp
      FROM keys
    )
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM fps GROUP BY fp HAVING count(*) >= 2
"""

_WINNOW_DUCK = rf"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS arr
      FROM documents
    ),
    gtext AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(arr[i:i + {_WINNOW_K} - 1], ' ') AS g
      FROM base,
           LATERAL (SELECT unnest(generate_series(1, len(arr) - {_WINNOW_K} + 1))
                    AS i) s
    ),
    {_WINNOW_BODY.format(h=_hex8_of("md5(g)"),
                         posguard=_WINNOW_GUARD_DUCK,
                         unpack=_WINNOW_UNPACK_DUCK)}
"""

_q(
    "q_winnowing",
    _WINNOW_SPARK,
    _WINNOW_DUCK,
    f"MOSS winnowing (k={_WINNOW_K} word-grams, w={_WINNOW_W} windows, "
    "rightmost-min selection): shared-fingerprint contamination profile; "
    "bounded per-doc frames, integer-packed tie-breaking",
)


# ---------------------------------------------------------------------------
# q_containment — Broder CONTAINMENT C(A in B) = |S(A) n S(B)| / |S(A)|
# over word 4-gram shingle sets: the ASYMMETRIC near-dup direction that
# Jaccard misses — a short document quoted wholesale inside a long one
# has low Jaccard but containment ~1, exactly the quote/subset/expansion
# cases a dedup policy must treat differently from mutual duplicates.
# Candidates come from the same rare-shingle (df <= 10) inverted-index
# join as q_sparse_knn (sum(df_rare^2) candidate bound, never n^2);
# containment is then EXACT over the full shingle sets (integer distinct
# counts, one divide + round).  Output: ordered (src, dst) pairs where
# >= 60% of src's shingles appear in dst.
# ---------------------------------------------------------------------------

_CONTAIN_K = 4
_CONTAIN_TAU = 0.6

_CONTAIN_BODY = f"""
    sh AS (SELECT DISTINCT doc_id, g FROM gtext),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
    dfreq AS (SELECT g, count(*) AS df FROM sh GROUP BY 1),
    rare AS (SELECT g FROM dfreq WHERE df BETWEEN 2 AND 10),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM sh a JOIN rare USING (g) JOIN sh b USING (g)
      WHERE a.doc_id < b.doc_id
    ),
    inter AS (
      -- candidates first (same join-order discipline as q_sparse_knn's
      -- dots: never self-join the posting lists over ALL shingles)
      SELECT c.d1, c.d2, CAST(count(*) AS BIGINT) AS inter
      FROM cand c
      JOIN sh x ON x.doc_id = c.d1
      JOIN sh y ON y.doc_id = c.d2 AND y.g = x.g
      GROUP BY c.d1, c.d2
    ),
    both_dirs AS (
      SELECT d1 AS src_doc, d2 AS dst_doc,
             round(CAST(inter AS DOUBLE) / s1.n_sh, 6) AS containment
      FROM inter JOIN sizes s1 ON s1.doc_id = inter.d1
      UNION ALL
      SELECT d2 AS src_doc, d1 AS dst_doc,
             round(CAST(inter AS DOUBLE) / s2.n_sh, 6) AS containment
      FROM inter JOIN sizes s2 ON s2.doc_id = inter.d2
    )
    SELECT src_doc, dst_doc, containment
    FROM both_dirs WHERE containment >= {_CONTAIN_TAU}
"""

# per-doc set semantics via array_distinct BEFORE the explode (see the
# _SHINGLES_SPARK note) — the corpus-wide DISTINCT exchange disappears
_CONTAIN_SH_SPARK = f"""
    WITH base AS (
      SELECT /*+ REPARTITION({{p}}) */ doc_id,
             split(lower(trim(text)), '\\\\s+') AS arr FROM documents
    )
    SELECT doc_id, explode(array_distinct(
             CASE WHEN size(arr) >= {_CONTAIN_K}
               THEN transform(sequence(0, size(arr) - {_CONTAIN_K}),
                              i -> concat_ws(' ', slice(arr, i + 1, {_CONTAIN_K})))
               ELSE array() END)) AS g
    FROM base
"""

# Engine-side verify over the MATERIALIZED shingle-set view (the body
# references sh six times and Spark inlines repeated CTEs, so the
# SQL-text form re-ran the explode + DISTINCT per reference), with two
# structural fixes over the oracle's formulation (r6 bench, sf1.0):
#   - the intersection is size(array_intersect) over per-doc shingle
#     ARRAYS attached by broadcast hash joins — the oracle's
#     cand JOIN sh JOIN sh materialized |cand| x shingles-per-doc rows
#     (3.9M pairs x ~50 = ~200M join rows, 49 s of the 57 s wall; the
#     array form is |cand| rows, set intersection in codegen).  The
#     doc->array table is one skinny row per DOCUMENT (not per pair), so
#     broadcast is the dims-table pattern; at fleet scale it becomes a
#     shuffle join on doc_id, same plan shape minus the hint.
#   - both directions come from ONE explode over inter instead of a
#     UNION ALL that re-evaluated the whole inter subtree twice.
_CONTAIN_VERIFY_SPARK = f"""
    WITH sets AS (
      SELECT doc_id, collect_list(g) AS gs, CAST(count(*) AS BIGINT) AS n_sh
      FROM ct_sh GROUP BY doc_id
    ),
    cand AS (
      -- candidate pairs straight off the RARE posting lists: a rare
      -- shingle's postings are <= 10 doc_ids by definition, so the pair
      -- set explodes from a bounded array (<= 45 pairs per shingle)
      -- instead of the oracle's sh JOIN rare JOIN sh, which shuffled
      -- the full shingle frame twice more
      SELECT DISTINCT pr.d1, pr.d2 FROM (
        SELECT explode(flatten(transform(ds,
                 x -> filter(transform(ds, y -> struct(x AS d1, y AS d2)),
                             s -> s.d1 < s.d2)))) AS pr
        FROM (
          SELECT collect_list(doc_id) AS ds
          FROM ct_sh GROUP BY g HAVING count(*) BETWEEN 2 AND 10
        )
      )
    ),
    inter AS (
      SELECT /*+ BROADCAST(s1), BROADCAST(s2) */ c.d1, c.d2,
             CAST(size(array_intersect(s1.gs, s2.gs)) AS BIGINT) AS i,
             s1.n_sh AS n1, s2.n_sh AS n2
      FROM cand c
      JOIN sets s1 ON s1.doc_id = c.d1
      JOIN sets s2 ON s2.doc_id = c.d2
    )
    SELECT pr.src_doc, pr.dst_doc, pr.containment FROM (
      SELECT explode(array(
        struct(d1 AS src_doc, d2 AS dst_doc,
               round(CAST(i AS DOUBLE) / n1, 6) AS containment),
        struct(d2 AS src_doc, d1 AS dst_doc,
               round(CAST(i AS DOUBLE) / n2, 6) AS containment)
      )) AS pr FROM inter
    ) WHERE pr.containment >= {_CONTAIN_TAU}
"""


def _containment_spark(spark, sf_dir: str):
    register_views(spark, sf_dir)
    p = max(spark.sparkContext.defaultParallelism, 1)
    sh = spark.sql(_CONTAIN_SH_SPARK.format(p=p)).persist()
    sh.count()  # materialize BEFORE the consumers race the cache
    sh.createOrReplaceTempView("ct_sh")
    return spark.sql(_CONTAIN_VERIFY_SPARK)

_CONTAIN_DUCK = rf"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS arr
      FROM documents
    ),
    gtext AS (
      SELECT doc_id, array_to_string(arr[i:i + {_CONTAIN_K} - 1], ' ') AS g
      FROM base,
           LATERAL (SELECT unnest(generate_series(1, len(arr) - {_CONTAIN_K} + 1))
                    AS i) s
    ),
    {_CONTAIN_BODY}
"""

QUERIES["q_containment"] = QuerySpec(
    spark=_containment_spark,
    oracle=_CONTAIN_DUCK,
    description=f"Broder containment (word {_CONTAIN_K}-gram shingles, tau="
    f"{_CONTAIN_TAU}): asymmetric quote/subset detection; rare-shingle "
    "candidates, exact integer intersections over a materialized "
    "shingle-set frame",
)


# ---------------------------------------------------------------------------
# q_cdc_chunks — content-defined chunking (the rolling-hash boundary
# trick behind rsync / LBFS / FastCDC), applied to text dedup: chunk
# boundaries are placed where a hash of the trailing 8 characters hits a
# divisor condition, so INSERTING text into a document shifts only the
# chunks it touches — byte-offset chunking would shift every later
# chunk and defeat chunk-level dedup.  Output: the chunk-level dedup
# profile (md5 of each chunk's text -> occurrence and document counts,
# duplicated chunks only) — the sub-document dedup signal exact-dedup
# misses and q_substring_dedup finds only pairwise.
#
# Exactness: the window hash is an 8-term integer polynomial
# (sum ascii(c_{{i-j}}) * (131^j mod p), j=0..7, mod p, p = 2^31-1) —
# the coefficients are pre-reduced mod p so every term stays below
# 2^21 * 2^31 = 2^52 and the 8-term sum below 2^55, exact in int64 for
# EVERY Unicode codepoint (raw 131^7 * U+10FFFF would overflow 2^63:
# DuckDB raises, numpy wraps silently — round-4 advice).  The reduced
# form is congruent mod p to the raw polynomial, so boundaries on
# ASCII-safe corpora are bit-identical to the pre-fix hash.  Spark's
# ascii() returns the full codepoint (verified vs DuckDB on CJK/emoji),
# so all three formulations agree; boundary iff hash % 64 = 0.
# Pure gear boundaries (no min/max chunk clamps — those need a
# sequential scan; the divisor alone gives E[chunk] = 64 chars).
# Scale shape: per-position work is a fixed 8-char expression, the
# boundary list folds per document (bounded by doc length), the profile
# is one map-side-combinable groupBy(chunk hash).
# ---------------------------------------------------------------------------

_CDC_WIN = 8
_CDC_DIV = 64


_CDC_P = 2147483647  # 2^31 - 1


def _cdc_hash(expr_text: str, pos: str) -> str:
    """Windowed polynomial hash of the 8 chars of ``expr_text`` ending at
    1-based position ``pos`` (requires pos >= 8), exact int64 both
    dialects: coefficients pre-reduced mod 2^31-1 so codepoint * coeff
    < 2^52 for any Unicode codepoint (raw 131^7 * U+10FFFF > 2^63)."""
    terms = " + ".join(
        f"CAST(ascii(substring({expr_text}, {pos} - {j}, 1)) AS BIGINT)"
        f" * {131 ** j % _CDC_P}"
        for j in range(_CDC_WIN)
    )
    return f"(({terms}) % {_CDC_P})"


_CDC_BODY = f"""
    doc AS (SELECT doc_id, text, length(text) AS L FROM documents
            WHERE length(text) >= {_CDC_WIN}),
    bounds AS (
      SELECT doc_id, i AS b
      FROM positions
      WHERE {{h}} % {_CDC_DIV} = 0
    ),
    blist AS (
      SELECT d.doc_id, d.text, d.L, {{asort}} AS bs
      FROM doc d LEFT JOIN (
        SELECT doc_id, {{collect}} AS raw_bs FROM bounds GROUP BY doc_id
      ) b ON b.doc_id = d.doc_id
    ),
    spans AS (
      SELECT doc_id, text,
             {{starts}} AS starts,
             {{ends}} AS ends
      FROM blist
    ),
    chunks AS (
      SELECT doc_id, md5(substring(text, s, e - s + 1)) AS chunk_hash,
             CAST(e - s + 1 AS BIGINT) AS chunk_len
      FROM exploded WHERE e >= s
    )
    SELECT chunk_hash,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(chunk_len) AS BIGINT) AS chunk_len
    FROM chunks GROUP BY chunk_hash HAVING count(*) >= 2
"""


def _cdc_spark_sql() -> str:
    h = _cdc_hash("win", "8")
    body = _CDC_BODY.format(
        h=h,
        collect="collect_list(b)",
        asort="array_sort(coalesce(b.raw_bs, array()))",
        starts="concat(array(1), transform(bs, x -> CAST(x + 1 AS INT)))",
        ends="concat(transform(bs, x -> CAST(x AS INT)), array(CAST(L AS INT)))",
    )
    return f"""
    WITH positions AS (
      -- carry only the 8-char window per row: exploding (doc_id, i)
      -- WITH the full text column duplicates ~doc-length bytes per
      -- position row (1.2 GB at sf0.1, measured 13.5 s -> ~3 s)
      SELECT doc_id, i, substring(text, i - {_CDC_WIN - 1}, {_CDC_WIN}) AS win
      FROM (
        SELECT doc_id, text, posexplode(sequence({_CDC_WIN}, length(text))) AS (z, i)
        FROM documents WHERE length(text) >= {_CDC_WIN}
      ) t
    ),
    {body.replace("FROM exploded", '''FROM (
      SELECT doc_id, text, se.starts AS s, se.ends AS e
      FROM spans LATERAL VIEW explode(arrays_zip(starts, ends)) t AS se
    ) t''')}
"""


def _cdc_duck_sql() -> str:
    h = _cdc_hash("win", "8")
    body = _CDC_BODY.format(
        h=h,
        collect="list(b)",
        asort="list_sort(coalesce(b.raw_bs, []))",
        starts="list_prepend(1, list_transform(bs, x -> CAST(x + 1 AS INT)))",
        ends="list_append(list_transform(bs, x -> CAST(x AS INT)), CAST(L AS INT))",
    )
    return f"""
    WITH positions AS (
      SELECT doc_id, i, substring(text, i - {_CDC_WIN - 1}, {_CDC_WIN}) AS win
      FROM (SELECT doc_id, text, length(text) AS L FROM documents
            WHERE length(text) >= {_CDC_WIN}) d,
           LATERAL (SELECT unnest(generate_series({_CDC_WIN}, L)) AS i) g
    ),
    {body.replace("FROM exploded", '''FROM (
      SELECT doc_id, text, starts[k] AS s, ends[k] AS e
      FROM spans, LATERAL (SELECT unnest(generate_series(1, len(starts))) AS k) gk
    ) t''')}
"""


def _cdc_chunks_fn(it):
    """Vectorized boundary detection + chunk hashing per Arrow batch.

    The per-position SQL formulation (kept verbatim as the DuckDB
    oracle) is quadratic on the ENGINE side: Spark's UTF8
    substring(text, i, 1) seeks from the string start, so hashing every
    position costs O(len^2) per document (measured 12+ s at sf0.1).
    Here the codepoints come out once via utf-32 decode and the window
    polynomial is ONE int64 np.convolve — linear and exact: kernel
    coefficients are 131^j mod p (p = 2^31-1), so every convolution term
    is < 2^21 * 2^31 = 2^52 and the 8-term sum < 2^55 for ANY Unicode
    codepoint (a raw 131^7 coefficient would overflow int64 above
    codepoint ~13.9k and wrap silently).  Identical to the ascii()-based
    SQL because ascii() returns the codepoint in both engines and the
    reduced polynomial is congruent mod p to the raw one."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    # np.convolve flips the kernel, so ASCENDING powers here yield
    # h(end i) = sum_j code[i-1-j] * (131^j mod p) — the oracle's polynomial
    kernel = np.array(
        [131 ** j % _CDC_P for j in range(_CDC_WIN)], dtype=np.int64
    )
    for pdf in it:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None or len(text) < _CDC_WIN:
                continue
            codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            h = np.convolve(codes.astype(np.int64), kernel, mode="valid")
            h %= _CDC_P
            bounds = (np.where(h % _CDC_DIV == 0)[0] + _CDC_WIN).tolist()
            starts = [1] + [b + 1 for b in bounds]
            ends = bounds + [len(text)]
            for s, e in zip(starts, ends):
                if e >= s:
                    chunk = text[s - 1 : e]
                    rows.append(
                        (doc_id, _hl.md5(chunk.encode()).hexdigest(), e - s + 1)
                    )
        yield pd.DataFrame(rows, columns=["doc_id", "chunk_hash", "chunk_len"])


def _cdc_chunks_spark(spark, sf_dir: str):
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    p = max(spark.sparkContext.defaultParallelism, 1)
    chunks = (
        spark.table("documents")
        .select("doc_id", "text")
        # single-row-group parquet -> one scan partition; spread the
        # Python chunking across the session parallelism
        .repartition(p)
        .mapInPandas(_cdc_chunks_fn, "doc_id long, chunk_hash string, chunk_len long")
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("chunk_len").cast("long").alias("chunk_len"),
        )
        .filter(F.col("n_occ") >= 2)
    )


QUERIES["q_cdc_chunks"] = QuerySpec(
    spark=_cdc_chunks_spark,
    oracle=_cdc_duck_sql(),
    description=(
        f"content-defined chunking (8-char polynomial gear hash, divisor "
        f"{_CDC_DIV}): chunk-level dedup profile of duplicated chunks "
        "(insert-shift-robust sub-document dedup); vectorized np.convolve "
        "boundary scan vs the per-position SQL oracle"
    ),
)


# the per-position pure-SQL Spark formulation is kept for the symmetry
# test in tests/test_round4_ops.py (it equals the vectorized path) but is
# NOT the registered engine path — its substring(text, i, 1) seek makes
# it O(len^2) per document on Spark's UTF8 strings
_CDC_SPARK_SQL_REFERENCE = _cdc_spark_sql()


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (round 5): score every raw document by
# how much its hashed-unigram distribution looks like a TARGET corpus
# (here the English subset — the stand-in for "high-quality reference
# data" in Xie et al.'s Data Selection via Importance Resampling).
#
# Shape at 100 TB: token explode -> (doc, bucket) counts (map-side
# combinable), bucket aggregates (B = 1024 rows per side) broadcast back,
# one groupBy(doc).  Scan-shaped: two shuffles, no self-joins, the
# importance table is O(B) regardless of corpus size.
#
# Exactness discipline (the q_tfidf_topk linear-instead-of-ln rule): the
# per-bucket importance ratio is LINEARIZED and floored to integer ppm in
# two scale-safe steps — pt_ppm = (ct+1)*1e6 DIV (Tt+B), pr_ppm likewise,
# w_ppm = pt_ppm*1e6 DIV max(pr_ppm, 1) — so every intermediate stays
# below 1e12 and int64 arithmetic is exact at ANY corpus size (the naive
# (ct+1)*(Tr+B)*1e6 cross-product overflows int64 once the corpus passes
# ~1e9 tokens).  Per-doc score = floor(mean over gram OCCURRENCES of
# w_ppm(bucket)), again integer.
# ---------------------------------------------------------------------------

_DSIR_B = 1024  # hashed-feature buckets (DSIR uses 10^4; 1024 keeps the
# fixture buckets multiply-occupied so collisions are exercised)

_DSIR_TOKENS_SPARK = """
      SELECT doc_id, lang, explode(split(lower(trim(text)), '\\\\s+')) AS token
      FROM (SELECT /*+ REPARTITION(__P__) */ * FROM documents
            WHERE length(trim(text)) > 0) d
"""
_DSIR_TOKENS_DUCK = r"""
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0
"""

_DSIR_DB = f"""
    WITH tok AS (
      SELECT doc_id, lang, token FROM ({{tokens}}) t WHERE token <> ''
    ),
    hv AS (
      SELECT doc_id, lang, CAST({_HEX8_FROM_H} AS BIGINT) % {_DSIR_B} AS bucket
      FROM (SELECT doc_id, lang, md5(token) AS h FROM tok)
    )
    SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS n
    FROM hv GROUP BY doc_id, lang, bucket
"""

# everything downstream of the (doc, lang, bucket) counts frame: the
# bucket aggregates are O(B) rows, the importance table broadcasts back
_DSIR_FINAL = f"""
    WITH db AS ({{db}}),
    raw_b AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS cr FROM db GROUP BY bucket),
    tgt_b AS (
      SELECT bucket, CAST(sum(n) AS BIGINT) AS ct
      FROM db WHERE lang = 'en' GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(cr) AS BIGINT) AS tr,
             (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt_b) AS tt
      FROM raw_b
    ),
    w AS (
      SELECT raw_b.bucket,
             CAST(
               ((coalesce(tgt_b.ct, 0) + 1) * 1000000 {{idiv}} (tot.tt + {_DSIR_B}))
               * 1000000 {{idiv}} greatest(
                   (raw_b.cr + 1) * 1000000 {{idiv}} (tot.tr + {_DSIR_B}), 1)
             AS BIGINT) AS w_ppm
      FROM raw_b LEFT JOIN tgt_b ON tgt_b.bucket = raw_b.bucket CROSS JOIN tot
    )
    SELECT db.doc_id,
           CAST(sum(db.n) AS BIGINT) AS n_grams,
           CAST(sum(db.n * w.w_ppm) {{idiv}} sum(db.n) AS BIGINT) AS dsir_ppm
    FROM db JOIN w ON w.bucket = db.bucket
    GROUP BY db.doc_id
"""


def _dsir_spark(spark, sf_dir: str):
    """The counts frame ``db`` feeds three consumers (raw bucket totals,
    target bucket totals, the per-doc score join); inlined as a CTE Spark
    replans the scan + token explode + md5 subtree per reference (10
    parquet scans in the naive plan).  Materializing the SKINNY db frame
    (<= n_docs x B rows) makes every reference an InMemoryRelation read —
    ONE pass over the corpus text, which is the shape that matters when
    the scan is 100 TB."""
    register_views(spark, sf_dir)
    db = spark.sql(
        _p_sub(spark, _DSIR_DB.format(tokens=_DSIR_TOKENS_SPARK))
    ).localCheckpoint()
    db.createOrReplaceTempView("dsir_db")
    return spark.sql(
        _DSIR_FINAL.format(db="SELECT * FROM dsir_db", idiv="DIV")
    )


QUERIES["q_dsir"] = QuerySpec(
    spark=_dsir_spark,
    oracle=_DSIR_FINAL.format(
        db=_DSIR_DB.format(tokens=_DSIR_TOKENS_DUCK), idiv="//"
    ),
    description=(
        "DSIR-style importance weights: per-doc mean hashed-unigram "
        f"target/raw ratio (B={_DSIR_B} buckets, add-1 smoothed, integer "
        "ppm) against the English subset as the target distribution"
    ),
)


# ---------------------------------------------------------------------------
# Incremental ingest dedup (round 5): dedup a NEW BATCH against the
# standing corpus without ever joining the corpus to itself — the shape a
# 100 TB pipeline actually runs per ingest.  Batch = doc_id % 10 = 0 (the
# synthetic "arriving shard"), corpus = the rest.
#
# Two legs, both candidates-first and batch-anchored:
#   exact    — md5(text) of the batch semi-joined against corpus hashes
#              (at scale: the corpus side is a materialized hash index;
#              the small batch side broadcasts, so the "join" is one
#              corpus scan with a bloom-prunable probe);
#   near-dup — banded MinHash: batch band signatures equi-joined against
#              corpus band signatures (the same materialized signature
#              table q_lsh_pairs reads); candidate volume is bounded by
#              band-bucket collisions, never |batch| x |corpus|.
# Verdict: drop_exact > review_near > ingest.
# ---------------------------------------------------------------------------

_INC_BATCH = "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0"
_INC_CORPUS = "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0"

_INC_WIDE = f"""
      SELECT doc_id, {_MINHASH_WIDE_AGGS}
      FROM (SELECT doc_id, CAST({_HEX8_FROM_H} AS BIGINT) AS v
            FROM (SELECT doc_id, md5(s) AS h FROM ({{shingles}}) sh))
      GROUP BY doc_id
"""

_INC_FINAL = """
    exact AS (
      SELECT b.doc_id,
             CAST(max(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS is_exact_dup
      FROM (SELECT doc_id, md5(text) AS k FROM batch) b
      LEFT JOIN (SELECT DISTINCT md5(text) AS k, 1 AS doc_id FROM corpus) c
        ON c.k = b.k
      GROUP BY b.doc_id
    ),
    near AS (
      SELECT bb.doc_id,
             CAST(count(DISTINCT cb.doc_id) AS BIGINT) AS n_candidates
      FROM batch_bands bb
      JOIN corpus_bands cb ON cb.band = bb.band AND cb.bsig = bb.bsig
      GROUP BY bb.doc_id
    )
    SELECT exact.doc_id,
           exact.is_exact_dup,
           CAST(coalesce(near.n_candidates, 0) AS BIGINT) AS n_candidates,
           CASE WHEN exact.is_exact_dup = 1 THEN 'drop_exact'
                WHEN coalesce(near.n_candidates, 0) > 0 THEN 'review_near'
                ELSE 'ingest' END AS decision
    FROM exact LEFT JOIN near ON near.doc_id = exact.doc_id
"""


def _incremental_dedup_spark(spark, sf_dir: str):
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    spark.sql(f"SELECT * FROM ({_INC_BATCH})").createOrReplaceTempView("batch")
    spark.sql(f"SELECT * FROM ({_INC_CORPUS})").createOrReplaceTempView("corpus")
    for side in ("batch", "corpus"):
        wide = spark.sql(
            _p_sub(spark, _INC_WIDE.format(shingles=_SHINGLES_SPARK.format(src=side)))
        )
        bands = wide.selectExpr(
            "doc_id", f"stack({_N_BANDS}, {_BANDS_STACK_SPARK}) AS (band, bsig)"
        )
        # the batch side is the small one per the ingest contract —
        # broadcast it into the band probe so the corpus signature scan
        # never shuffles (checked by tests/test_round5_ops.py plan pin)
        if side == "batch":
            bands = F.broadcast(bands)
        bands.createOrReplaceTempView(f"{side}_bands")
    return spark.sql(f"WITH {_INC_FINAL}")


_INC_DUCK = f"""
    WITH batch AS ({_INC_BATCH}),
    corpus AS ({_INC_CORPUS}),
    batch_wide AS ({_INC_WIDE.format(shingles=_SHINGLES_DUCK.format(src='batch'))}),
    corpus_wide AS ({_INC_WIDE.format(shingles=_SHINGLES_DUCK.format(src='corpus'))}),
    batch_bandsw AS (SELECT doc_id, {_BANDS_WIDE_DUCK} FROM batch_wide),
    corpus_bandsw AS (SELECT doc_id, {_BANDS_WIDE_DUCK} FROM corpus_wide),
    batch_bands AS (
      UNPIVOT batch_bandsw ON {_BANDS_UNPIVOT_DUCK} INTO NAME band VALUE bsig
    ),
    corpus_bands AS (
      UNPIVOT corpus_bandsw ON {_BANDS_UNPIVOT_DUCK} INTO NAME band VALUE bsig
    ),
    {_INC_FINAL}
"""

QUERIES["q_incremental_dedup"] = QuerySpec(
    spark=_incremental_dedup_spark,
    oracle=_INC_DUCK,
    description=(
        "incremental ingest dedup: new-batch docs vs the standing corpus "
        "— exact md5 semi-probe + banded-MinHash near-dup candidates, "
        "batch side broadcast, never corpus x corpus"
    ),
)
