"""Semantic tests for the round-3 additions beyond the oracle gate:
HLL mergeability + fingerprint parity vs an independent Python
implementation, substring-dedup island placement on planted passages,
inverted-index fingerprint parity, Bloom-filter no-false-negatives,
salted-join equivalence + physical shape, and PageRank vs a numpy power
iteration over the same derived graph.  (Cross-engine value parity for
all of these is covered by the oracle gate / tests/test_queries_oracle.)
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("documents", "customer", "orders", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def _hll_registers(texts):
    """Independent register computation: 32-bit hash from the first 8 md5
    hex chars, bucket = low 6 bits, rho = lzc+1 of the remaining 26."""
    regs: dict[int, int] = {}
    for t in set(texts):
        h32 = int(_md5(t)[:8], 16)
        bucket, w = h32 % 64, h32 // 64
        rho = 27 if w == 0 else 27 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_register_fingerprint_matches_independent_impl():
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    rows = con.execute(QUERIES["q_hll_distinct"].oracle).fetchall()
    docs = con.execute("SELECT source, text FROM documents").fetchall()
    by_src: dict[str, list[str]] = {}
    for src, text in docs:
        by_src.setdefault(src, []).append(text)
    assert rows
    for src, n_exact, n_zero, fp, est in rows:
        regs = _hll_registers(by_src[src])
        expect_fp = hashlib.md5(
            ",".join(f"{b:02d}:{r:02d}" for b, r in sorted(regs.items())).encode()
        ).hexdigest()
        assert fp == expect_fp, src
        assert n_zero == 64 - len(regs)
        assert n_exact == len(set(by_src[src]))
        # estimate accuracy: m=64 -> ~13% typical error; allow 3 sigma
        assert abs(est - n_exact) / max(n_exact, 1) < 0.45, (src, est, n_exact)


def test_hll_registers_merge_by_max():
    con = _duck()
    texts = [t for (t,) in con.execute("SELECT text FROM documents").fetchall()]
    half_a, half_b = texts[::2], texts[1::2]
    merged = _hll_registers(half_a)
    for b, r in _hll_registers(half_b).items():
        merged[b] = max(merged.get(b, 0), r)
    assert merged == _hll_registers(texts)


# ---------------------------------------------------------------------------
# Substring dedup
# ---------------------------------------------------------------------------


def test_substring_dedup_islands_on_planted_passages(spark):
    from bsc_project_spark.queries import _REGISTERED_DIRS
    from bsc_project_spark.queries.textops import _SUBSTR_SPARK_SQL

    shared = " ".join(f"shared{i}" for i in range(10))  # 10-word passage
    docs = [
        (1, f"alpha one two three {shared} tail1 tail2 tail3", "en", "s", 0),
        (2, f"beta uno dos tres cuatro {shared} fin1 fin2", "en", "s", 0),
        (3, "gamma " + " ".join(f"unique{i}" for i in range(20)), "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.createOrReplaceTempView("documents")
    try:
        got = {
            (r.doc_id, r.start_word, r.end_word)
            for r in spark.sql(_SUBSTR_SPARK_SQL).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
        _REGISTERED_DIRS.clear()
    # doc 1: shared passage occupies words 5..14 -> grams at pos 5..7,
    # island [5, 14]; doc 2: words 6..15 -> island [6, 15]; doc 3: none.
    assert got == {(1, 5, 14), (2, 6, 15)}


def test_substring_dedup_plants_mid_doc_quotes_at_sf():
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    rows = con.execute(QUERIES["q_substring_dedup"].oracle).fetchall()
    mid = [r for r in rows if r[2] > 1]
    assert mid, "planted quoting docs must produce mid-document islands"
    # every planted quote doc (id >= 1000000) must itself carry an island
    quote_docs = {r[0] for r in rows if r[0] >= 1_000_000}
    planted = {
        d + 1_000_000
        for (d,) in con.execute(
            r"SELECT doc_id FROM documents WHERE doc_id % 41 = 0"
            r" AND len(string_split_regex(lower(trim(text)), '\s+')) >= 30"
        ).fetchall()
    }
    assert planted and planted <= quote_docs


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_fingerprint_matches_independent_impl():
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    rows = con.execute(QUERIES["q_inverted_index"].oracle).fetchall()
    assert rows
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    postings: dict[str, list[int]] = {}
    cf: dict[str, int] = {}
    for doc_id, text in docs:
        for tok in text.strip().lower().split():
            if len(tok) >= 3:
                postings.setdefault(tok, []).append(doc_id)
                cf[tok] = cf.get(tok, 0) + 1
    for token, df, cfv, first_doc, fp in rows:
        plist = sorted(set(postings[token]))
        assert df == len(plist) >= 5
        assert cfv == cf[token]
        assert first_doc == plist[0]
        expect = hashlib.md5(
            ",".join(f"{d:08d}" for d in plist).encode()
        ).hexdigest()
        assert fp == expect, token


# ---------------------------------------------------------------------------
# Bloom pruning
# ---------------------------------------------------------------------------


def _bloom_positions(key: str):
    h = _md5(key)
    return {int(h[0:8], 16) % 8192, int(h[8:16], 16) % 8192, int(h[16:24], 16) % 8192}


def test_bloom_prune_has_no_false_negatives():
    con = _duck()
    from bsc_project_spark.queries.eventops import QUERIES

    build = {
        k
        for (k,) in con.execute(
            "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        ).fetchall()
    }
    bits = set()
    for k in build:
        bits |= _bloom_positions(str(k))
    probe = con.execute("SELECT o_orderkey, o_custkey FROM orders").fetchall()
    n_pass = n_exact = n_fp = 0
    for _, ck in probe:
        ok = _bloom_positions(str(ck)) <= bits
        hit = ck in build
        n_pass += ok
        n_exact += hit
        n_fp += ok and not hit
        assert not (hit and not ok), "false negative: a build key failed the filter"
    rows = con.execute(QUERIES["q_bloom_prune"].oracle).fetchall()
    assert sum(r[2] for r in rows) == n_pass
    assert sum(r[3] for r in rows) == n_exact
    assert sum(r[4] for r in rows) == n_fp
    for _, n_orders, n_bloom_pass, n_ex, n_false in rows:
        assert n_bloom_pass >= n_ex  # supersets only
        assert n_false == n_bloom_pass - n_ex


# ---------------------------------------------------------------------------
# Salted join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join_and_is_not_broadcast(spark):
    from pyspark.sql import functions as F

    from bsc_project_spark.queries.skew import salted_join

    # 90% of fact rows on one hot key
    fact = spark.range(0, 2000).selectExpr(
        "id AS row_id",
        "CASE WHEN id % 10 < 9 THEN CAST(7 AS BIGINT) ELSE id % 23 END AS k",
        "CAST(id % 97 AS DOUBLE) AS x",
    )
    dim = spark.range(0, 23).selectExpr("id AS k", "id * 100 AS w")
    got = (
        salted_join(fact, dim, on=["k"], salt_cols=["row_id"])
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("x") + F.col("w")).alias("s"))
    )
    want = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("x") + F.col("w")).alias("s"))
    )
    g = {(r.k, r.n, float(r.s)) for r in got.collect()}
    w = {(r.k, r.n, float(r.s)) for r in want.collect()}
    assert g == w
    plan = salted_join(fact, dim, on=["k"], salt_cols=["row_id"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "_salt" in plan


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_matches_numpy_power_iteration(spark):
    from bsc_project_spark.queries.graphops import QUERIES, _D, _FANOUT, _ITERS

    got = {
        r.doc_id: (r.in_degree, r.pagerank)
        for r in QUERIES["q_pagerank"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(ids)
    edges = set()
    for idx in range(n):
        for k in range(1, _FANOUT + 1):
            edges.add((idx, int(_md5(f"{idx}:{k}")[:8], 16) % n))
    deg = np.zeros(n)
    in_deg = np.zeros(n, dtype=int)
    for s, d in edges:
        deg[s] += 1
        in_deg[d] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(_ITERS):
        nxt = np.full(n, (1 - _D) / n)
        for s, d in edges:
            nxt[d] += _D * r[s] / deg[s]
        r = nxt
    assert abs(r.sum() - 1.0) < 1e-9  # no dangling nodes -> mass conserved
    assert set(got) == set(ids)
    for i, doc in enumerate(ids):
        gi, gr = got[doc]
        assert gi == in_deg[i]
        assert math.isclose(gr, round(r[i], 7), abs_tol=2e-7), doc


# ---------------------------------------------------------------------------
# Rollup / hopping windows / anchor text / curriculum / co-occurrence
# (cross-engine parity is the oracle gate's job; these pin the SEMANTIC
# invariants each op promises)
# ---------------------------------------------------------------------------


def test_rollup_internal_consistency():
    """Leaf rows must roll up exactly into the subtotal and grand-total
    rows, and GROUPING() markers must agree with the '(all)' fills."""
    con = _duck()
    from bsc_project_spark.queries.eventops import QUERIES

    rows = con.execute(QUERIES["q_rollup_cube"].oracle).fetchall()
    leaves = [r for r in rows if r[2] == 0 and r[3] == 0]
    subtotals = {r[0]: r for r in rows if r[2] == 0 and r[3] == 1}
    grand = [r for r in rows if r[2] == 1 and r[3] == 1]
    assert len(grand) == 1
    for r in rows:
        assert (r[0] == "(all)") == (r[2] == 1)
        assert (r[1] == "(all)") == (r[3] == 1)
    for status, sub in subtotals.items():
        mine = [r for r in leaves if r[0] == status]
        assert sub[4] == sum(r[4] for r in mine)  # n_orders
        assert sub[6] == pytest.approx(sum(r[6] for r in mine))  # sum_price
    assert grand[0][4] == sum(r[4] for r in leaves)


def test_hopping_windows_double_count_and_alignment():
    """Width/slide = 2, so every event lands in exactly 2 windows, and
    every window start is a 30-minute-aligned epoch."""
    con = _duck()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM '"
        + SF
        + "/events.parquet'"
    )
    from bsc_project_spark.queries.eventops import QUERIES, _HOP_US

    rows = con.execute(QUERIES["q_hopping_windows"].oracle).fetchall()
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert sum(r[1] for r in rows) == 2 * n_events
    assert all(r[0] % _HOP_US == 0 for r in rows)


def test_anchor_text_counts_and_prefix_provenance(spark):
    """in_links must total the (deduped) edge count; on a simple graph
    (distinct src,dst) in_links == n_sources; every top_anchor must be
    the 12-char lowered prefix of SOME document."""
    from bsc_project_spark.queries.graphops import QUERIES

    rows = QUERIES["q_anchor_text"].spark(spark, SF).collect()
    assert rows
    prefixes = {
        (r.text or "").strip().lower()[:12]
        for r in _duck().execute("SELECT text FROM documents").df().itertuples()
    }
    for r in rows:
        assert r.in_links == r.n_sources  # edges are deduped pairs
        assert r.top_anchor in prefixes


def test_quality_curriculum_exact_decile_sizes():
    """Deciles 1..10, sizes within 1 of each other, totalling the corpus."""
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    rows = con.execute(QUERIES["q_quality_curriculum"].oracle).fetchall()
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sorted(r[0] for r in rows) == list(range(1, 11))
    sizes = [r[1] for r in rows]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1


def test_cooccurrence_matches_independent_python():
    """Full-parity recompute of the bounded-vocab pair mining in plain
    Python (sets + Counter) — vocab cut, support filter, lift_ppm."""
    import math
    import re
    from collections import Counter

    con = _duck()
    from bsc_project_spark.queries.textops import _COOC_VOCAB_K, QUERIES

    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    n = len(docs)
    toks = {
        d: {t for t in re.split(r"\s+", text.strip().lower()) if t}
        for d, text in docs
    }
    df = Counter(t for s in toks.values() for t in s)
    vocab = dict(sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:_COOC_VOCAB_K])
    pairs: Counter = Counter()
    for s in toks.values():
        hits = sorted(t for t in s if t in vocab)
        for i, a in enumerate(hits):
            for b in hits[i + 1:]:
                pairs[(a, b)] += 1
    expected = {
        (a, b): (
            c12,
            vocab[a],
            vocab[b],
            math.floor((1000000.0 * c12 * n) / (vocab[a] * vocab[b])),
        )
        for (a, b), c12 in pairs.items()
        if c12 * 20 >= n
    }
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(QUERIES["q_cooccurrence"].oracle).fetchall()
    }
    assert got == expected


def test_bpe_tokens_matches_python_re():
    """Full-parity recompute of the BPE pre-tokenizer counts with
    Python's `re` (leftmost-first alternation, same as Java regex and
    RE2 on this lookahead-free pattern)."""
    import re

    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    pat = re.compile(r"'(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+")
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    expected = {}
    for d, text in docs:
        lt = text.strip().lower()
        n_bpe = len(pat.findall(lt))
        n_ws = 0 if not lt else len(re.split(r"\s+", lt))
        ppm = 0 if not lt else (n_bpe * 1000000 // n_ws if n_ws else None)
        expected[d] = (n_bpe, n_ws, ppm)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(QUERIES["q_bpe_tokens"].oracle).fetchall()
    }
    assert got == expected


def test_weighted_sample_matches_python_aes():
    """Independent Efraimidis-Spirakis recompute: same md5-derived
    uniforms, ln(u)/w keys, top-64 — sample must match rank-for-rank."""
    con = _duck()
    from bsc_project_spark.queries.textops import _WSAMPLE_K, QUERIES

    docs = con.execute(
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > 0"
    ).fetchall()
    keyed = []
    for d, w in docs:
        u = (int(_md5(str(d))[:8], 16) + 1.0) / 4294967297.0
        keyed.append((math.log(u) / w, d, w))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    expected = [
        (rank + 1, d, w) for rank, (_, d, w) in enumerate(keyed[:_WSAMPLE_K])
    ]
    got = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(QUERIES["q_weighted_sample"].oracle).fetchall()
    )
    assert got == expected


def test_bm25_matches_python_recompute():
    """Independent BM25 recompute (Counter-based tf/df/dl, float chain
    in the same operation order) — top-16 must match rank-for-rank."""
    import re
    from collections import Counter

    con = _duck()
    from bsc_project_spark.queries.textops import _BM25_TOPK, QUERIES

    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    tf: dict[int, Counter] = {}
    for d, text in docs:
        toks = [
            t for t in re.split(r"\s+", text.strip().lower()) if len(t) >= 3
        ]
        tf[d] = Counter(toks)
    dl = {d: sum(c.values()) for d, c in tf.items() if c}
    n_docs = len(dl)
    avgdl = sum(dl.values()) * 1.0 / n_docs
    df = Counter(t for c in tf.values() for t in c)
    qtop = sorted(
        ((t, f) for t, f in df.items() if len(t) >= 4),
        key=lambda kv: (-kv[1], kv[0]),
    )[:8]
    # df ASC, token DESC (two stable passes — token is a string, so no
    # single-key negation)
    qterms = sorted(qtop, key=lambda kv: kv[0], reverse=True)
    qterms = sorted(qterms, key=lambda kv: kv[1])[:4]
    scores: dict[int, list] = {}
    for d, c in tf.items():
        s = [
            math.floor(
                1e6
                * math.log((n_docs - f + 5e-1) / (f + 5e-1) + 1e0)
                * (c[t] * 2.2e0)
                / (c[t] + 1.2e0 * (2.5e-1 + 7.5e-1 * dl[d] / avgdl))
            )
            for t, f in qterms
            if c[t]
        ]
        if s:
            scores[d] = (sum(s), len(s))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    expected = [
        (i + 1, d, s, n) for i, (d, (s, n)) in enumerate(ranked[:_BM25_TOPK])
    ]
    got = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.execute(QUERIES["q_bm25"].oracle).fetchall()
    )
    assert got == expected


def _events():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    return con


def test_funnel_matches_python_recompute():
    """Strictly-ordered view -> click -> purchase recompute per user."""
    con = _events()
    from bsc_project_spark.queries.eventops import QUERIES

    rows = con.execute(
        "SELECT user_id, event_type, ts FROM events ORDER BY user_id, ts"
    ).fetchall()
    by_user: dict = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))
    c1 = c2 = c3 = 0
    for evs in by_user.values():
        t1 = min((t for t, e in evs if e == "view"), default=None)
        if t1 is None:
            continue
        c1 += 1
        t2 = min((t for t, e in evs if e == "click" and t > t1), default=None)
        if t2 is None:
            continue
        c2 += 1
        if any(e == "purchase" and t > t2 for t, e in evs):
            c3 += 1
    got = {
        r[0]: (r[2], r[3])
        for r in con.execute(QUERIES["q_funnel"].oracle).fetchall()
    }
    assert got[1] == (c1, 1000000)
    assert got[2] == (c2, c2 * 1000000 // c1)
    assert got[3] == (c3, c3 * 1000000 // c2)


def test_cohort_retention_matches_python_recompute():
    con = _events()
    from bsc_project_spark.queries.eventops import _WEEK_US, QUERIES

    rows = con.execute(
        "SELECT user_id, epoch_us(ts) FROM events"
    ).fetchall()
    weeks: dict = {}
    for u, us in rows:
        weeks.setdefault(u, set()).add(int(us) // (_WEEK_US))
    cohort = {u: min(ws) for u, ws in weeks.items()}
    size: dict = {}
    for u, c in cohort.items():
        size[c] = size.get(c, 0) + 1
    act: dict = {}
    for u, ws in weeks.items():
        for w in ws:
            key = (cohort[u], w - cohort[u])
            act[key] = act.get(key, 0) + 1
    expected = {
        k: (n, size[k[0]], n * 1000000 // size[k[0]]) for k, n in act.items()
    }
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(QUERIES["q_cohort_retention"].oracle).fetchall()
    }
    assert got == expected


def test_group_percentiles_exact_rank_semantics():
    """p50/p90/p100 equal the elements at ceil(q*n) in the per-source
    sorted order (lower-median convention)."""
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    docs = con.execute(
        "SELECT source, n_chars, doc_id FROM documents"
    ).fetchall()
    groups: dict = {}
    for s, n, d in docs:
        groups.setdefault(s, []).append((n, d))
    expected = {}
    for s, vals in groups.items():
        vals.sort()
        n = len(vals)
        expected[s] = (
            n,
            vals[(n + 1) // 2 - 1][0],
            vals[(9 * n + 9) // 10 - 1][0],
            vals[n - 1][0],
        )
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(QUERIES["q_group_percentiles"].oracle).fetchall()
    }
    assert got == expected


def test_fuzzy_join_no_false_negatives_and_verified():
    """Every planted typo finds its source dict token (the deletion
    neighborhood has no false negatives at distance 1), and every
    reported pair is levenshtein-verified <= 1."""
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    rows = con.execute(QUERIES["q_fuzzy_join"].oracle).fetchall()
    assert rows, "planted typo queries must produce matches"
    assert all(r[2] <= 1 for r in rows)
    # rebuild the planted query set and its source tokens
    import re
    from collections import Counter

    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    df = Counter()
    for _, text in docs:
        df.update(
            {
                t
                for t in re.split(r"\s+", text.strip().lower())
                if 4 <= len(t) <= 12
            }
        )
    dict_toks = {t for t, c in df.items() if c >= 3}
    matched = {(r[0], r[1]) for r in rows}
    for t in dict_toks:
        p = int(_md5(t)[:8], 16) % (len(t) - 2) + 2
        typo = t[: p - 1] + t[p:]
        assert (typo, t) in matched, (typo, t)


# ---------------------------------------------------------------------------
# q_char_entropy / q_chunk_windows / q_decay_score
# ---------------------------------------------------------------------------


def test_char_entropy_matches_python_recompute():
    """Recompute the per-doc ppm-nat entropy in pure Python with the
    same per-term floor discipline and compare every row."""
    con = _duck()
    from bsc_project_spark.queries.textops import QUERIES

    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(QUERIES["q_char_entropy"].oracle).fetchall()
    }
    docs = con.execute(
        "SELECT doc_id, lower(trim(text)) FROM documents WHERE n_chars > 0"
    ).fetchall()
    assert len(got) == len(docs) > 0
    for doc_id, s in docs:
        counts: dict[str, int] = {}
        for ch in s:
            counts[ch] = counts.get(ch, 0) + 1
        n = sum(counts.values())
        e = sum(
            math.floor(1e6 * (c * 1.0 / n) * math.log(n * 1.0 / c))
            for c in counts.values()
        )
        assert got[doc_id] == (len(counts), e), doc_id


def test_chunk_windows_cover_and_tile_tokens():
    """Every token index is covered, chunk starts advance by the stride,
    every chunk reassembles the exact token slice, and chunk counts
    match ceil(n/S) semantics."""
    import re

    con = _duck()
    from bsc_project_spark.queries.textops import (
        QUERIES,
        _CHUNK_S,
        _CHUNK_W,
    )

    rows = con.execute(QUERIES["q_chunk_windows"].oracle).fetchall()
    by_doc: dict[int, dict[int, tuple[int, str]]] = {}
    for doc_id, ci, nt, text in rows:
        by_doc.setdefault(doc_id, {})[ci] = (nt, text)
    docs = con.execute(
        "SELECT doc_id, trim(text) FROM documents WHERE n_chars > 0"
    ).fetchall()
    assert len(by_doc) == len(docs) > 0
    for doc_id, s in docs:
        toks = re.split(r"\s+", s)
        n = len(toks)
        expect_chunks = (n - 1) // _CHUNK_S + 1
        chunks = by_doc[doc_id]
        assert sorted(chunks) == list(range(expect_chunks)), doc_id
        for ci, (nt, text) in chunks.items():
            sl = toks[ci * _CHUNK_S : ci * _CHUNK_S + _CHUNK_W]
            assert nt == len(sl) and text == " ".join(sl), (doc_id, ci)


def test_decay_score_matches_python_recompute():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    from bsc_project_spark.queries.eventops import QUERIES, _DECAY_HL_US

    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(QUERIES["q_decay_score"].oracle).fetchall()
    }
    evs = con.execute(
        "SELECT user_id, epoch_us(ts), value FROM events"
    ).fetchall()
    tref = max(us for _, us, _ in evs)
    expect: dict[int, list[int]] = {}
    for uid, us, value in evs:
        w = math.floor(
            1e6 * value * math.exp(-math.log(2) * (tref - us) / _DECAY_HL_US)
        )
        expect.setdefault(uid, []).append(w)
    assert got == {u: (len(ws), sum(ws)) for u, ws in expect.items()}


def test_domain_cap_salted_plan_equals_flat_window(spark):
    """The skew-safe two-phase (salted) per-group top-k must select
    exactly the rows of the naive flat window, and never leave more
    than K docs per source."""
    from bsc_project_spark.queries.textops import _DCAP_K, QUERIES
    from bsc_project_spark.queries import register_views

    register_views(spark, SF)
    got = {
        (r.source, r.doc_id, r.cap_rank)
        for r in QUERIES["q_domain_cap"].spark(spark, SF).collect()
    }
    con = _duck()
    expect = set(
        map(tuple, con.execute(QUERIES["q_domain_cap"].oracle).fetchall())
    )
    assert got == expect and got
    per_src: dict[str, int] = {}
    for src, _, _ in got:
        per_src[src] = per_src.get(src, 0) + 1
    assert max(per_src.values()) <= _DCAP_K


# ---------------------------------------------------------------------------
# Triangle count
# ---------------------------------------------------------------------------


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered compact-forward result == brute-force enumeration
    over the same md5-derived graph, per node: degree, triangle count,
    and integer-ppm clustering coefficient."""
    from itertools import combinations

    from bsc_project_spark.queries.graphops import QUERIES, _FANOUT

    got = {
        r.doc_id: (r.degree, r.n_triangles, r.clustering_ppm)
        for r in QUERIES["q_triangle_count"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(ids)
    und = set()
    for idx in range(n):
        for k in range(1, _FANOUT + 1):
            dst = int(_md5(f"{idx}:{k}")[:8], 16) % n
            if dst != idx:
                und.add((min(idx, dst), max(idx, dst)))
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = {v: 0 for v in range(n)}
    for v in range(n):
        for x, y in combinations(sorted(adj[v]), 2):
            if y in adj[x]:
                tri[v] += 1
    want = {}
    for v in range(n):
        if tri[v]:
            d = len(adj[v])
            want[ids[v]] = (d, tri[v], tri[v] * 2_000_000 // (d * (d - 1)))
    assert got == want
    assert want, "fixture graph must contain triangles for this test to bite"


# ---------------------------------------------------------------------------
# Distributed covariance -> driver-side PCA
# ---------------------------------------------------------------------------


def test_embed_covariance_matches_numpy_and_supports_pca(spark):
    """The map-side-partial Gram assembly == numpy's covariance of the
    same micro-quantized data, exactly; the assembled d x d matrix is
    PSD (up to fp tolerance) so the driver-side eigendecomposition —
    the PCA step the op exists to feed — is well-posed."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.similarity import QUERIES

    rows = QUERIES["q_embed_covariance"].spark(spark, SF).collect()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(m * 1e6).astype(np.int64)
    n, d = q.shape
    assert len(rows) == d * (d + 1) // 2
    s = q.sum(axis=0)
    g = q.T @ q
    cov = np.zeros((d, d))
    for r in rows:
        i, j = r.i - 1, r.j - 1
        assert r.n_vecs == n
        assert r.sum_ij == g[i, j]
        want = round((n * float(g[i, j]) - float(s[i]) * float(s[j]))
                     / (n * float(n - 1)) / 1e6 / 1e6, 9)
        assert r.cov == want, (r.i, r.j)
        cov[i, j] = cov[j, i] = r.cov
    evals = np.linalg.eigvalsh(cov)
    assert evals.min() > -1e-9  # PSD -> PCA well-posed
    assert evals.max() > 0


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join
# ---------------------------------------------------------------------------


def test_prefix_join_equals_bruteforce_all_pairs(spark):
    """Prefix filtering's no-false-negative theorem: the candidate-pruned
    join returns EXACTLY the pairs a brute-force all-pairs char-8-gram
    shingle-Jaccard scan finds at t = 0.9 (same integer arithmetic,
    same stride-4 shingle substrate as MinHash/SimHash)."""
    from itertools import combinations

    from bsc_project_spark.queries.textops import QUERIES

    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_union, r.jaccard_ppm)
        for r in QUERIES["q_prefix_join"].spark(spark, SF).collect()
    }
    con = _duck()
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    sets = {
        d: {t[i : i + 8] for i in range(0, max(len(t) - 7, 1), 4)}
        for d, t in docs
    }
    want = {}
    for (a, ta), (b, tb) in combinations(sorted(sets.items()), 2):
        i = len(ta & tb)
        u = len(ta) + len(tb) - i
        if u and 10 * i >= 9 * u:
            want[(a, b)] = (i, u, i * 1_000_000 // u)
    assert got == want
    assert want, "fixture corpus must contain high-Jaccard pairs"


# ---------------------------------------------------------------------------
# ANN recall/cost curve
# ---------------------------------------------------------------------------


def test_ann_recall_matches_numpy_recompute(spark):
    """The swept recall/cost table == an independent numpy recompute:
    same sign matrix, same band slicing, same rounded-cosine ranking."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.similarity import (
        QUERIES, _N_QUERIES, _RECALL_CONFIGS, _TOPK, _sign_matrix,
    )

    got = {
        (r.cfg, r.q_id): (r.n_candidates, r.n_hits, r.recall_ppm)
        for r in QUERIES["q_ann_recall"].spark(spark, SF).collect()
    }
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = emb["vec_id"].to_numpy()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    bits = (m @ _sign_matrix(m.shape[1]) >= 0.0)
    norms = np.sqrt((m * m).sum(axis=1))
    qidx = {int(i): k for k, i in enumerate(ids) if i < _N_QUERIES}

    def topk(q, pool):
        cos = [
            (round(float(m[q] @ m[c]) / float(norms[q] * norms[c]), 5), -int(ids[c]))
            for c in pool
        ]
        order = sorted(zip(cos, pool), key=lambda t: t[0], reverse=True)
        return {int(ids[c]) for _, c in order[:_TOPK]}

    want = {}
    for qi, q in qidx.items():
        exact = topk(q, [c for c in range(len(ids)) if c != q])
        for nb, bb in _RECALL_CONFIGS:
            cfg = f"{nb}x{bb}"
            cand = set()
            for b in range(nb):
                sig = bits[:, b * bb : (b + 1) * bb]
                same = (sig == sig[q]).all(axis=1)
                cand |= {c for c in np.nonzero(same)[0] if c != q}
            hits = len(topk(q, sorted(cand)) & exact) if cand else 0
            want[(cfg, qi)] = (len(cand), hits, hits * 1_000_000 // _TOPK)
    assert got == want


# ---------------------------------------------------------------------------
# Multi-source BFS
# ---------------------------------------------------------------------------


def test_bfs_distance_matches_python_bfs(spark):
    """Frontier-expansion BFS over the md5-derived graph == a plain
    Python layered BFS from the same seed set: every reachable node
    within 4 hops, labeled with its exact first-visit layer."""
    from bsc_project_spark.queries.graphops import _BFS_HOPS, _FANOUT, _SEED_MOD, QUERIES

    got = {
        r.doc_id: r.hops
        for r in QUERIES["q_bfs_distance"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(ids)
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for idx in range(n):
        for k in range(1, _FANOUT + 1):
            adj[idx].add(int(_md5(f"{idx}:{k}")[:8], 16) % n)
    dist = {v: 0 for v in range(n) if v % _SEED_MOD == 0}
    frontier = set(dist)
    for hop in range(1, _BFS_HOPS + 1):
        nxt = {w for v in frontier for w in adj[v] if w not in dist}
        for w in nxt:
            dist[w] = hop
        frontier = nxt
    want = {ids[v]: h for v, h in dist.items()}
    assert got == want
    assert set(dist.values()) == set(range(_BFS_HOPS + 1)), (
        "fixture graph must populate every BFS layer for this test to bite"
    )


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_layout_matches_python_morton(spark):
    """Per-file pruning stats == a Python recompute of the 20-bit Morton
    code over the same (user-bucket, day-bucket) dims; bit interleaving
    is checked against int bit-twiddling rather than the SQL's
    modulo-compare formulation."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import _Z_FILE_SHIFT, _ZBITS, QUERIES

    got = {
        r.file_id: (r.n_rows, r.min_x, r.max_x, r.min_y, r.max_y, r.bbox_area)
        for r in QUERIES["q_zorder_layout"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    us = pc.cast(pc.cast(tbl["ts"], "timestamp[us]"), "int64").to_pylist()
    users = tbl["user_id"].to_pylist()
    files: dict[int, list[tuple[int, int]]] = {}
    for u, t in zip(users, us):
        x, y = u % 1024, (t // 86_400_000_000) % 1024
        z = 0
        for i in range(_ZBITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        files.setdefault(z // _Z_FILE_SHIFT, []).append((x, y))
    want = {}
    for f, pts in files.items():
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        want[f] = (
            len(pts), min(xs), max(xs), min(ys), max(ys),
            (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1),
        )
    assert got == want


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


def test_url_canon_folds_every_surface_form(spark):
    """Python recompute of the synthesis + canonicalization chain agrees
    per canonical group, and the chain genuinely folds multiple surface
    forms (some group must carry >= 3 distinct raw forms)."""
    from bsc_project_spark.queries.webtext import QUERIES

    got = {
        r.canonical_url: (r.n_dups, r.n_forms, r.keep_doc)
        for r in QUERIES["q_url_canon"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents").fetchall()]
    groups: dict[str, set] = {}
    counts: dict[str, list] = {}
    for d in ids:
        g, p, v = d % 13, d % 7, d % 5
        if v == 1:
            raw = f"HTTPS://WWW.EXAMPLE{g}.COM/page/{p}"
        else:
            raw = f"https://example{g}.com/page/{p}" + {
                2: "/", 3: "?utm_source=feed", 4: "#section-2"
            }.get(v, "")
        canon = f"https://example{g}.com/page/{p}"
        groups.setdefault(canon, set()).add(raw)
        counts.setdefault(canon, []).append(d)
    want = {
        c: (len(counts[c]), len(groups[c]), min(counts[c])) for c in groups
    }
    assert got == want
    assert max(n_forms for _, n_forms, _ in got.values()) >= 3


# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------


def test_markov_transitions_matches_python_recompute(spark):
    """Global (from, to) transition counts + integer-ppm row-conditional
    probabilities == a Python fold over each user's time-sorted stream."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import QUERIES

    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob_ppm)
        for r in QUERIES["q_markov_transitions"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).to_pylist()
    streams: dict[int, list] = {}
    for r in tbl:
        streams.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    pairs: dict[tuple, int] = {}
    for evs in streams.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    row_n: dict[str, int] = {}
    for (a, _), n in pairs.items():
        row_n[a] = row_n.get(a, 0) + n
    want = {k: (n, n * 1_000_000 // row_n[k[0]]) for k, n in pairs.items()}
    assert got == want
    assert len({a for a, _ in got}) >= 4, "matrix must span several event types"


# ---------------------------------------------------------------------------
# Random walks
# ---------------------------------------------------------------------------


def test_random_walks_match_python_walker(spark):
    """Lockstep join-advanced walks == a Python walker over the same
    md5-derived graph with the same md5-coin neighbor choice; every walk
    has exactly STEPS+1 positions and starts at its seed."""
    from bsc_project_spark.queries.graphops import (
        _FANOUT,
        _WALK_SEED_MOD,
        _WALK_STEPS,
        QUERIES,
    )

    got = {
        (r.seed_doc, r.step): r.node_doc
        for r in QUERIES["q_random_walks"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(ids)
    nbrs: dict[int, list[int]] = {}
    for idx in range(n):
        s = {int(_md5(f"{idx}:{k}")[:8], 16) % n for k in range(1, _FANOUT + 1)}
        nbrs[idx] = sorted(s)
    want = {}
    for seed in range(0, n, _WALK_SEED_MOD):
        cur = seed
        want[(ids[seed], 0)] = ids[cur]
        for t in range(1, _WALK_STEPS + 1):
            lst = nbrs[cur]
            cur = lst[int(_md5(f"{cur}#{t}")[:8], 16) % len(lst)]
            want[(ids[seed], t)] = ids[cur]
    assert got == want
    n_seeds = (n + _WALK_SEED_MOD - 1) // _WALK_SEED_MOD
    assert len(got) == n_seeds * (_WALK_STEPS + 1)


# ---------------------------------------------------------------------------
# Debounce dedup
# ---------------------------------------------------------------------------


def test_window_dedup_matches_python_debounce(spark):
    """Keep-set == a Python debounce fold per (user, type) stream, and
    the rule genuinely drops something at this SF."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import _DEBOUNCE_GAP_US, QUERIES

    got = {
        r.event_id: (r.user_id, r.event_type, r.us)
        for r in QUERIES["q_window_dedup"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    us = pc.cast(pc.cast(tbl["ts"], "timestamp[us]"), "int64").to_pylist()
    rows = sorted(
        zip(tbl["user_id"].to_pylist(), tbl["event_type"].to_pylist(),
            us, tbl["event_id"].to_pylist()),
        key=lambda r: (r[0], r[1], r[2], r[3]),
    )
    want, prev = {}, {}
    for u, ty, t, eid in rows:
        k = (u, ty)
        if k not in prev or t - prev[k] > _DEBOUNCE_GAP_US:
            want[eid] = (u, ty, t)
        prev[k] = t  # lag() semantics: compare to IMMEDIATE predecessor
    assert got == want
    assert len(got) < len(rows), "debounce must drop at least one event"


# ---------------------------------------------------------------------------
# Grid radius join
# ---------------------------------------------------------------------------


def test_grid_radius_join_equals_bruteforce_all_pairs(spark):
    """Grid-bucketed candidates == the O(n^2) numpy brute force: no
    false negatives (dist < r never crosses more than one cell) and no
    duplicates (each pair matched via b's unique home cell)."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.similarity import QUERIES

    got = {
        (r.a_id, r.b_id): r.dist2_e12
        for r in QUERIES["q_grid_radius_join"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_pylist()
    emb = tbl["embedding"].to_pylist()
    pts = {i: (float(np.float32(e[0])), float(np.float32(e[1]))) for i, e in zip(ids, emb)}
    want = {}
    for i in ids:
        for j in ids:
            if i < j:
                d2 = (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
                if d2 < 2.5e-3:
                    want[(i, j)] = math.floor(d2 * 1.0e12)
    assert got == want
    assert len(got) > 100, "radius must capture a meaningful pair set"


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def test_label_prop_matches_python_sync_rounds(spark):
    """3 synchronous argmax rounds in Spark == a Python recompute with
    the same (count desc, label asc) tie order; communities must be
    non-trivial (some size > 1) and not fully collapsed."""
    from bsc_project_spark.queries.graphops import _FANOUT, _LP_ROUNDS, QUERIES

    got = {
        r.doc_id: (r.community, r.community_size)
        for r in QUERIES["q_label_prop"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(ids)
    und = set()
    for idx in range(n):
        for k in range(1, _FANOUT + 1):
            dst = int(_md5(f"{idx}:{k}")[:8], 16) % n
            if dst != idx:
                und.add((min(idx, dst), max(idx, dst)))
    adj: dict[int, list[int]] = {v: [] for v in range(n)}
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    lbl = list(range(n))
    for _ in range(_LP_ROUNDS):
        nxt = list(lbl)
        for v in range(n):
            if adj[v]:
                cnt: dict[int, int] = {}
                for u in adj[v]:
                    cnt[lbl[u]] = cnt.get(lbl[u], 0) + 1
                nxt[v] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = nxt
    sizes: dict[int, int] = {}
    for c in lbl:
        sizes[c] = sizes.get(c, 0) + 1
    want = {ids[v]: (ids[lbl[v]], sizes[lbl[v]]) for v in range(n)}
    assert got == want
    assert max(s for _, s in got.values()) > 1
    assert len({c for c, _ in got.values()}) > 1


# ---------------------------------------------------------------------------
# Source KL drift
# ---------------------------------------------------------------------------


def test_source_kl_matches_python_recompute(spark):
    """Pairwise KL over the top-32 vocab == a Python recompute with the
    same smoothing, term flooring, and tie order; KL(p||p) pairs are
    absent and some pair must show genuine drift (> 0 ppm-nats)."""
    import re

    from bsc_project_spark.queries.textops import QUERIES

    got = {
        (r.src_a, r.src_b): r.kl_ppm
        for r in QUERIES["q_source_kl"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute("SELECT source, lower(trim(text)) FROM documents").fetchall()
    tok_counts: dict[str, dict[str, int]] = {}
    glob: dict[str, int] = {}
    for src, txt in rows:
        for t in re.split(r"\s+", txt):
            if t:
                tok_counts.setdefault(src, {})[t] = tok_counts.setdefault(src, {}).get(t, 0) + 1
                glob[t] = glob.get(t, 0) + 1
    vocab = sorted(glob, key=lambda t: (-glob[t], t))[:32]
    probs = {
        src: {
            t: (c.get(t, 0) + 1) / (sum(c.get(t, 0) + 1 for t in vocab))
            for t in vocab
        }
        for src, c in tok_counts.items()
    }
    want = {}
    for a in probs:
        for b in probs:
            if a != b:
                want[(a, b)] = sum(
                    math.floor(probs[a][t] * math.log(probs[a][t] / probs[b][t]) * 1.0e6)
                    for t in vocab
                )
    assert got == want
    assert all(a != b for a, b in got)
    assert max(got.values()) > 0


# ---------------------------------------------------------------------------
# Robots longest-prefix-match
# ---------------------------------------------------------------------------


def test_robots_filter_lpm_semantics(spark):
    """Verdicts == a Python longest-prefix-match evaluator over the same
    rule synthesis, and BOTH override directions occur: a specific allow
    beating a broad deny (h % 3 == 0 hosts) and a specific deny beating
    the root allow."""
    from bsc_project_spark.queries.webtext import QUERIES

    got = {
        r.doc_id: (r.host, r.path, r.verdict)
        for r in QUERIES["q_robots_filter"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents").fetchall()]
    rules: dict[str, list[tuple[str, str]]] = {}
    for h in range(13):
        host = f"example{h}"
        rules[host] = [("/", "allow"),
                       (f"/page/{h % 7}", "allow" if h % 3 == 0 else "deny")]
        if h % 3 == 0:
            rules[host].append(("/page/", "deny"))
    want = {}
    flavors = set()
    for d in ids:
        host, path = f"example{d % 13}", f"/page/{d % 7}"
        cands = [(p, a) for p, a in rules[host] if path.startswith(p)]
        p, a = min(cands, key=lambda r: (-len(r[0]), r[0]))
        want[d] = (host, path, a)
        if len(p) > 1:
            flavors.add((a, d % 13 % 3 == 0))
    assert got == want
    assert ("allow", True) in flavors, "specific allow must override broad deny"
    assert ("deny", False) in flavors, "specific deny must override root allow"


# ---------------------------------------------------------------------------
# Quantized ANN
# ---------------------------------------------------------------------------


def test_quantized_ann_matches_numpy_and_keeps_recall(spark):
    """Integer top-5 == a numpy recompute of the same SQ8 scheme, and
    quantization keeps recall@5 >= 3/5 per probe vs the exact float
    dot-product ranking (the property the 4x memory cut must preserve)."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.similarity import QUERIES

    got: dict[int, list] = {}
    for r in QUERIES["q_quantized_ann"].spark(spark, SF).collect():
        got.setdefault(r.qid, []).append((r.rnk, r.cid, r.dot))
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_pylist()
    X = np.array(tbl["embedding"].to_pylist(), dtype=np.float32).astype(np.float64)
    order = np.argsort(ids)
    ids = [ids[i] for i in order]
    X = X[order]
    mx = np.abs(X).max(axis=0)
    scale = np.where(mx == 0, 1.0, mx / 127.0)
    Q = np.floor(X / scale + 0.5).astype(np.int64)
    Q[:, mx == 0] = 0
    probes = ids[:4]
    want: dict[int, list] = {}
    recall_ok = True
    for qi, qid in enumerate(probes):
        dots = Q @ Q[qi]
        cands = sorted(
            ((int(dots[j]), ids[j]) for j in range(len(ids)) if ids[j] != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        want[qid] = [(r + 1, cid, d) for r, (d, cid) in enumerate(cands)]
        exact = X @ X[qi]
        etop = {
            ids[j]
            for j in sorted(
                (j for j in range(len(ids)) if ids[j] != qid),
                key=lambda j: (-exact[j], ids[j]),
            )[:5]
        }
        hits = len(etop & {cid for _, cid, _ in want[qid]})
        recall_ok = recall_ok and hits >= 3
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }
    assert recall_ok, "SQ8 must keep recall@5 >= 3/5 on every probe"


# ---------------------------------------------------------------------------
# Rendezvous sharding
# ---------------------------------------------------------------------------


def test_shard_assign_hrw_stability(spark):
    """Transition matrix == a Python HRW recompute, off-diagonal mass
    flows ONLY to the new shard 8, and the moved fraction is near the
    theoretical 1/9 (between 2% and 25%)."""
    from bsc_project_spark.queries.textops import QUERIES

    got = {
        (r.shard8, r.shard9): r.n_docs
        for r in QUERIES["q_shard_assign"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents").fetchall()]
    want: dict[tuple, int] = {}
    for d in ids:
        scores = {s: int(_md5(f"{d}@{s}")[:8], 16) for s in range(9)}
        s8 = min(range(8), key=lambda s: (-scores[s], s))
        s9 = min(range(9), key=lambda s: (-scores[s], s))
        want[(s8, s9)] = want.get((s8, s9), 0) + 1
    assert got == want
    assert all(a == b or b == 8 for a, b in got), (
        "HRW must never move a doc between surviving shards"
    )
    moved = sum(n for (a, b), n in got.items() if a != b)
    assert 0.02 < moved / len(ids) < 0.25


# ---------------------------------------------------------------------------
# Chi-square independence
# ---------------------------------------------------------------------------


def test_chi2_independence_matches_python(spark):
    """Per-cell expected/contribution == a Python recompute; the summed
    statistic is positive (the fixture mix is not perfectly uniform)."""
    from bsc_project_spark.queries.textops import QUERIES

    got = {
        (r.lang, r.source): (r.observed, r.expected_ppm, r.contrib_ppm)
        for r in QUERIES["q_chi2_independence"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute(
        "SELECT lang, source, count(*) FROM documents GROUP BY lang, source"
    ).fetchall()
    rowm: dict[str, int] = {}
    colm: dict[str, int] = {}
    n = 0
    for lg, src, o in rows:
        rowm[lg] = rowm.get(lg, 0) + o
        colm[src] = colm.get(src, 0) + o
        n += o
    want = {}
    for lg, src, o in rows:
        r, c = rowm[lg], colm[src]
        diff = float(o * n - r * c)
        want[(lg, src)] = (
            o,
            (r * c * 1_000_000) // n,
            math.floor(diff * diff / (float(n) * float(r) * float(c)) * 1.0e6),
        )
    assert got == want
    assert sum(cp for _, _, cp in got.values()) > 0


# ---------------------------------------------------------------------------
# Data-quality audit
# ---------------------------------------------------------------------------


def test_data_quality_detects_planted_violations(spark, tmp_path):
    """On the clean fixture every check reports 0 violations; on a
    corpus with PLANTED orphans / duplicate PKs / empty text / bad
    quantities / dim drift, each check reports the exact planted count
    (proves the audit bites, not just that zeros hash-match)."""
    from pyspark.sql import functions as F

    from bsc_project_spark.queries import _REGISTERED_DIRS, TABLES
    from bsc_project_spark.queries.relational import QUERIES

    clean = {
        r.check_name: (r.n_checked, r.n_violations)
        for r in QUERIES["q_data_quality"].spark(spark, SF).collect()
    }
    assert all(v == 0 for _, v in clean.values())
    assert len(clean) == 7

    out = str(tmp_path / "dirty")
    for t in TABLES:
        df = spark.read.parquet(f"{SF}/{t}.parquet").limit(20)
        # keep the base sample relationally CONSISTENT (no accidental
        # orphans) so the planted violations are the only ones
        if t == "lineitem":
            ok = spark.read.parquet(f"{out}/orders.parquet").select("o_orderkey")
            df = (
                spark.read.parquet(f"{SF}/{t}.parquet")
                .join(ok, F.col("l_orderkey") == ok.o_orderkey, "left_semi")
                .limit(20)
            )
        df.coalesce(1).write.parquet(f"{out}/{t}.parquet")
    li = spark.read.parquet(f"{out}/lineitem.parquet")
    bad_li = (
        li.limit(2)
        .withColumn("l_orderkey", li.l_orderkey + 1_000_000)
        .withColumn("l_quantity", F.lit(-1.0).cast(li.schema["l_quantity"].dataType))
    )
    bad_li.write.mode("append").parquet(f"{out}/lineitem.parquet")
    docs = spark.read.parquet(f"{out}/documents.parquet")
    bad_docs = docs.limit(3).withColumn("text", F.lit(""))
    bad_docs.write.mode("append").parquet(f"{out}/documents.parquet")
    _REGISTERED_DIRS.clear()
    dirty = {
        r.check_name: r.n_violations
        for r in QUERIES["q_data_quality"].spark(spark, out).collect()
    }
    _REGISTERED_DIRS.clear()
    assert dirty["lineitem_orphan_orderkey"] == 2
    assert dirty["lineitem_nonpositive_quantity"] == 2
    assert dirty["documents_duplicate_pk"] == 3
    assert dirty["documents_null_or_empty_text"] == 3


# ---------------------------------------------------------------------------
# Burst detection + session paths
# ---------------------------------------------------------------------------


def test_burst_detection_matches_python(spark):
    """(type, day) burst flags == a Python recompute of the trailing
    3-day rule; both burst and non-burst cells occur."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import QUERIES

    got = {
        (r.event_type, r.day): (r.n_events, r.prev3_sum, r.is_burst)
        for r in QUERIES["q_burst_detection"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"])
    us = pc.cast(pc.cast(tbl["ts"], "timestamp[us]"), "int64").to_pylist()
    daily: dict[str, dict[int, int]] = {}
    for ty, t in zip(tbl["event_type"].to_pylist(), us):
        d = t // 86_400_000_000
        daily.setdefault(ty, {})[d] = daily.setdefault(ty, {}).get(d, 0) + 1
    want = {}
    for ty, days in daily.items():
        ds = sorted(days)
        for i, d in enumerate(ds):
            if i >= 3:
                p3 = days[ds[i - 1]] + days[ds[i - 2]] + days[ds[i - 3]]
                n = days[d]
                want[(ty, d)] = (n, p3, 1 if n * 2 > p3 else 0)
    assert got == want
    flags = {b for _, _, b in got.values()}
    assert flags == {0, 1} or flags == {0}, flags


def test_session_paths_matches_python(spark):
    """Top-10 3-step paths == a Python fold over each user's
    time-sorted stream with the same (count desc, path asc) cut."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import QUERIES

    got = [
        (r.path, r.n_sessions)
        for r in QUERIES["q_session_paths"].spark(spark, SF).collect()
    ]
    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).to_pylist()
    streams: dict[int, list] = {}
    for r in tbl:
        streams.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    counts: dict[str, int] = {}
    for evs in streams.values():
        evs.sort()
        tys = [e[2] for e in evs]
        for a, b, c in zip(tys, tys[1:], tys[2:]):
            p = f"{a}>{b}>{c}"
            counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


# ---------------------------------------------------------------------------
# Market-basket pairs
# ---------------------------------------------------------------------------


def test_basket_pairs_matches_python(spark):
    """Association table == a Python fold over per-order distinct part
    sets with the same integer-ppm confidence/lift; some surviving pair
    must have lift > 1 (genuine association above independence)."""
    from itertools import combinations

    from bsc_project_spark.queries.relational import QUERIES

    got = {
        (r.part_a, r.part_b): (r.support, r.conf_ppm, r.lift_ppm)
        for r in QUERIES["q_basket_pairs"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, set[int]] = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    n = len(baskets)
    icnt: dict[int, int] = {}
    sup: dict[tuple, int] = {}
    for parts in baskets.values():
        for p in parts:
            icnt[p] = icnt.get(p, 0) + 1
        for a, b in combinations(sorted(parts), 2):
            sup[(a, b)] = sup.get((a, b), 0) + 1
    want = {
        (a, b): (
            s,
            s * 1_000_000 // icnt[a],
            s * n * 1_000_000 // (icnt[a] * icnt[b]),
        )
        for (a, b), s in sup.items()
        if s >= 3
    }
    assert got == want
    assert got, "support threshold must keep at least one pair"
    assert any(l > 1_000_000 for _, _, l in got.values())


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_matches_python(spark):
    """Violating QI cells == a Python recompute, the audit fires, and
    at least one cell PASSES (so the k threshold separates, rather than
    flagging everything)."""
    from bsc_project_spark.queries.textops import _KANON_K, QUERIES

    got = {
        (r.lang, r.source, r.len_band): (r.n_docs, r.share_ppm)
        for r in QUERIES["q_k_anonymity"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute(
        "SELECT lang, source, n_chars // 256, count(*) "
        "FROM documents GROUP BY 1, 2, 3"
    ).fetchall()
    total = sum(n for *_, n in rows)
    want = {
        (lg, src, lb): (n, n * 1_000_000 // total)
        for lg, src, lb, n in rows
        if n < _KANON_K
    }
    assert got == want
    assert got, "audit must find at least one violating cell"
    assert len(want) < len(rows), "some QI cell must pass the k threshold"


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------


def test_hits_scores_match_python_power_iteration(spark):
    """Unnormalized 2-round HITS == a Python recompute over the same
    md5-derived graph; hub and authority rankings genuinely differ
    (the property HITS exists to expose)."""
    from bsc_project_spark.queries.graphops import _FANOUT, QUERIES

    got = {
        r.doc_id: (r.hub_score, r.auth_score)
        for r in QUERIES["q_hits_scores"].spark(spark, SF).collect()
    }
    con = _duck()
    ids = [d for (d,) in con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(ids)
    out: dict[int, set[int]] = {v: set() for v in range(n)}
    for idx in range(n):
        for k in range(1, _FANOUT + 1):
            out[idx].add(int(_md5(f"{idx}:{k}")[:8], 16) % n)
    a1 = {v: 0 for v in range(n)}
    for u in range(n):
        for w in out[u]:
            a1[w] += 1
    h1 = {v: sum(a1[w] for w in out[v]) for v in range(n)}
    a2 = {v: 0 for v in range(n)}
    for u in range(n):
        for w in out[u]:
            a2[w] += h1[u]
    want = {ids[v]: (h1[v], a2[v]) for v in range(n)}
    assert got == want
    top_hubs = sorted(got, key=lambda d: (-got[d][0], d))[:10]
    top_auth = sorted(got, key=lambda d: (-got[d][1], d))[:10]
    assert top_hubs != top_auth


# ---------------------------------------------------------------------------
# Lang-id confusion
# ---------------------------------------------------------------------------


def test_lang_confusion_matches_python(spark):
    """Confusion cells == a Python recompute of the stopword heuristic
    against the labels, and each actual-lang row's shares account for
    the whole row (sum to ~10^6 ppm up to integer-floor loss).  NOTE:
    the fixture's lang column is a synthesized LABEL, not the text's
    real language, so the matrix legitimately shows heavy off-diagonal
    mass — the op's job is to report that misalignment, which is
    exactly what a real corpus-QA run uses it for."""
    from bsc_project_spark.queries.textops import _DE_WORDS, _EN_WORDS, QUERIES

    got = {
        (r.actual, r.predicted): (r.n_docs, r.row_share_ppm)
        for r in QUERIES["q_lang_confusion"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute("SELECT doc_id, lang, lower(text) FROM documents").fetchall()
    cells: dict[tuple, int] = {}
    rowm: dict[str, int] = {}
    for _, lang, txt in rows:
        lt = f" {txt} "
        en = sum(f" {w} " in lt for w in _EN_WORDS)
        de = sum(f" {w} " in lt for w in _DE_WORDS)
        pred = "en" if en > de else ("de" if de > en else "und")
        cells[(lang, pred)] = cells.get((lang, pred), 0) + 1
        rowm[lang] = rowm.get(lang, 0) + 1
    want = {
        k: (n, n * 1_000_000 // rowm[k[0]]) for k, n in cells.items()
    }
    assert got == want
    for lang, r in rowm.items():
        cells_n = sum(n for (a, _), (n, _) in got.items() if a == lang)
        share = sum(s for (a, _), (_, s) in got.items() if a == lang)
        assert cells_n == r
        n_cells = sum(1 for (a, _) in got if a == lang)
        assert 1_000_000 - n_cells < share <= 1_000_000


# ---------------------------------------------------------------------------
# Wilson ranking
# ---------------------------------------------------------------------------


def test_wilson_ranking_matches_python_and_penalizes_small_n(spark):
    """Top-20 == a Python recompute of the Wilson 95% lower bound, and
    the bound behaves: for the same observed proportion, fewer trials
    must give a strictly lower score (the property that distinguishes
    it from sort-by-average)."""
    from bsc_project_spark.queries.relational import QUERIES

    got = [
        (r.part, r.n_lineitems, r.n_returns, r.wilson_ppm)
        for r in QUERIES["q_wilson_ranking"].spark(spark, SF).collect()
    ]
    con = _duck()
    rows = con.execute(
        "SELECT l_partkey, count(*), "
        "sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
        "FROM lineitem GROUP BY l_partkey"
    ).fetchall()

    def wilson_ppm(k: int, n: int) -> int:
        z = 1.96
        p = k / n
        lb = (p + z * z / (2.0 * n) - z * math.sqrt(
            (p * (1.0 - p) + z * z / (4.0 * n)) / n
        )) / (1.0 + z * z / n)
        return math.floor(lb * 1.0e6)

    scored = sorted(
        ((pk, n, k, wilson_ppm(k, n)) for pk, n, k in rows if n >= 5),
        key=lambda t: (-t[3], t[0]),
    )[:20]
    assert got == scored
    assert wilson_ppm(2, 2) < wilson_ppm(40, 50)  # 100% of 2 < 80% of 50
    assert wilson_ppm(4, 8) < wilson_ppm(40, 80)  # same p, fewer trials


# ---------------------------------------------------------------------------
# N-gram novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_python(spark):
    """Per-doc novelty == a Python first-occurrence recompute, the
    FIRST doc is fully novel, and at least one doc repeats earlier
    grams (novelty < 1) so the attribution genuinely discriminates."""
    import re

    from bsc_project_spark.queries.textops import QUERIES

    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_ppm)
        for r in QUERIES["q_ngram_novelty"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute(
        "SELECT doc_id, lower(trim(text)) FROM documents ORDER BY doc_id"
    ).fetchall()
    first: dict[str, int] = {}
    per_doc: dict[int, set] = {}
    for d, txt in rows:
        ws = [w for w in re.split(r"\s+", txt) if w]
        gs = {f"{a} {b} {c}" for a, b, c in zip(ws, ws[1:], ws[2:])}
        per_doc[d] = gs
        for g in gs:
            if g not in first:
                first[g] = d
    want = {}
    for d, gs in per_doc.items():
        if gs:
            novel = sum(1 for g in gs if first[g] == d)
            want[d] = (len(gs), novel, novel * 1_000_000 // len(gs))
    assert got == want
    first_doc = min(want)
    assert want[first_doc][2] == 1_000_000
    assert any(ppm < 1_000_000 for _, _, ppm in got.values())


# ---------------------------------------------------------------------------
# JSON schema profile
# ---------------------------------------------------------------------------


def test_json_schema_profile_matches_python(spark):
    """Coverage == a Python recompute from the synthesis modularities
    (k always, price at %3, tags at %4, name at %5), on the REAL
    event_id population."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import QUERIES

    got = {
        r.json_key: (r.n_present, r.coverage_ppm)
        for r in QUERIES["q_json_schema_profile"].spark(spark, SF).collect()
    }
    ids = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])["event_id"].to_pylist()
    n = len(ids)
    counts = {
        "k": n,
        "price": sum(1 for e in ids if e % 3 == 0),
        "tags": sum(1 for e in ids if e % 4 == 0),
        "name": sum(1 for e in ids if e % 5 == 0),
    }
    want = {k: (c, c * 1_000_000 // n) for k, c in counts.items()}
    assert got == want
    assert got["k"][1] == 1_000_000
    assert 0 < got["price"][0] < n


# ---------------------------------------------------------------------------
# Degree histogram
# ---------------------------------------------------------------------------


def test_degree_histogram_matches_exact_bit_length(spark):
    """Histogram == a Python recompute with EXACT integer bit-length
    bins (floor(log2(d)) == d.bit_length()-1) — pins that the engines'
    log2 floors stay exact over the graph's degree range — and the
    distribution covers multiple bins including isolated nodes."""
    from bsc_project_spark.queries.graphops import _FANOUT, QUERIES

    got = {
        r.degree_bin: (r.bin_floor, r.n_nodes)
        for r in QUERIES["q_degree_histogram"].spark(spark, SF).collect()
    }
    con = _duck()
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    dedup = set()
    for idx in range(n):
        for k in range(1, _FANOUT + 1):
            dedup.add((idx, int(_md5(f"{idx}:{k}")[:8], 16) % n))
    ind = {v: 0 for v in range(n)}
    for _, dst in dedup:
        ind[dst] += 1
    bins: dict[int, int] = {}
    for d in ind.values():
        b = -1 if d == 0 else d.bit_length() - 1
        bins[b] = bins.get(b, 0) + 1
    want = {b: (0 if b < 0 else 2**b, c) for b, c in bins.items()}
    assert got == want
    assert len(got) >= 3


# ---------------------------------------------------------------------------
# Sample apportionment
# ---------------------------------------------------------------------------


def test_sample_apportion_matches_python_and_sums_to_k(spark):
    """Quotas == a Python Hamilton-method recompute, sum to exactly K,
    and at least one stratum received a remainder seat (so the
    largest-remainder half of the algorithm is exercised)."""
    from bsc_project_spark.queries.textops import _APPORTION_K, QUERIES

    got = {
        r.source: (r.n_docs, r.sample_quota)
        for r in QUERIES["q_sample_apportion"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute(
        "SELECT source, count(*) FROM documents GROUP BY source"
    ).fetchall()
    total = sum(n for _, n in rows)
    quotas = {
        src: ((n * _APPORTION_K) // total, (n * _APPORTION_K) % total, n)
        for src, n in rows
    }
    extra = _APPORTION_K - sum(b for b, _, _ in quotas.values())
    order = sorted(quotas, key=lambda s: (-quotas[s][1], s))
    want = {
        src: (quotas[src][2], quotas[src][0] + (1 if order.index(src) < extra else 0))
        for src in quotas
    }
    assert got == want
    assert sum(q for _, q in got.values()) == _APPORTION_K
    assert extra > 0, "fixture must exercise the remainder seats"


# ---------------------------------------------------------------------------
# Sorted neighborhood
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_matches_python(spark):
    """Banded equi-join candidates == a Python recompute of the flat
    sliding window over the sorted key order (proves the band trick
    covers the window exactly, no duplicates)."""
    from bsc_project_spark.queries.textops import _SN_WINDOW, QUERIES

    got = {
        (r.a_id, r.b_id): (r.pos_gap, r.key_lev)
        for r in QUERIES["q_sorted_neighborhood"].spark(spark, SF).collect()
    }

    def lev(s: str, t: str) -> int:
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    con = _duck()
    rows = con.execute(
        "SELECT doc_id, substring(lower(trim(text)), 1, 12) FROM documents"
    ).fetchall()
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for i, (a_id, a_key) in enumerate(ordered):
        for j in range(i + 1, min(i + _SN_WINDOW, len(ordered))):
            b_id, b_key = ordered[j]
            d = lev(a_key, b_key)
            if d <= 3:
                want[(a_id, b_id)] = (j - i, d)
    assert got == want
    assert got, "window must yield candidate pairs on this fixture"


# ---------------------------------------------------------------------------
# Corpus diversity
# ---------------------------------------------------------------------------


def test_corpus_diversity_matches_python(spark):
    """Entropy/Gini == a Python recompute; entropy is within floor loss
    of ln(k) for the near-balanced fixture and Gini is near 0."""
    from bsc_project_spark.queries.textops import QUERIES

    row = QUERIES["q_corpus_diversity"].spark(spark, SF).collect()[0]
    con = _duck()
    counts = [n for (_, n) in con.execute(
        "SELECT source, count(*) FROM documents GROUP BY source"
    ).fetchall()]
    total, k = sum(counts), len(counts)
    h = sum(math.floor((n / total) * math.log(total / n) * 1.0e6) for n in counts)
    mad = sum(abs(a - b) for a in counts for b in counts)
    gini = mad * 1_000_000 // (2 * k * total)
    assert (row.n_sources, row.n_docs, row.entropy_ppm_nats, row.gini_ppm) == (
        k, total, h, gini
    )
    assert h <= math.log(k) * 1.0e6 + 1
    assert gini < 300_000


# ---------------------------------------------------------------------------
# Audience overlap
# ---------------------------------------------------------------------------


def test_audience_overlap_matches_python(spark):
    """Jaccard matrix == a Python set recompute; the matrix covers
    every type pair and no Jaccard exceeds 10^6."""
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import QUERIES

    got = {
        (r.type_a, r.type_b): (r.n_shared, r.n_union, r.jaccard_ppm)
        for r in QUERIES["q_audience_overlap"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    sets: dict[str, set] = {}
    for ty, u in zip(tbl["event_type"].to_pylist(), tbl["user_id"].to_pylist()):
        sets.setdefault(ty, set()).add(u)
    types = sorted(sets)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                union = len(sets[a] | sets[b])
                want[(a, b)] = (inter, union, inter * 1_000_000 // union)
    assert got == want
    assert len(got) == len(types) * (len(types) - 1) // 2
    assert all(j <= 1_000_000 for _, _, j in got.values())


# ---------------------------------------------------------------------------
# Dedup savings
# ---------------------------------------------------------------------------


def test_dedup_savings_matches_python(spark):
    """ROI rows == a Python recompute over head-64 fingerprint clusters
    under the first-seen retention policy (min doc_id kept, waste
    measured against the keeper's own size — keeper column and byte
    math describe the SAME policy, ADVICE r03); the report bites (some
    cluster found) and waste never counts the kept copy."""
    from bsc_project_spark.queries.textops import QUERIES

    got = {
        r.keep_doc: (r.copies, r.wasted_bytes, r.waste_ppm)
        for r in QUERIES["q_dedup_savings"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute(
        "SELECT md5(substring(text, 1, 64)), doc_id, n_chars FROM documents"
    ).fetchall()
    clusters: dict[str, list] = {}
    for h, d, sz in rows:
        clusters.setdefault(h, []).append((d, sz))
    total = sum(sz for _, _, sz in rows)
    want = {}
    for members in clusters.values():
        if len(members) > 1:
            sz_all = sum(sz for _, sz in members)
            keep_doc, keep_sz = min(members)
            waste = sz_all - keep_sz
            want[keep_doc] = (
                len(members), waste, waste * 1_000_000 // total
            )
    assert got == want
    assert got, "fixture must contain head-64 duplicate clusters"
    assert all(w >= 0 for _, w, _ in got.values())


# ---------------------------------------------------------------------------
# RFM features + type-token ratio
# ---------------------------------------------------------------------------


def test_rfm_features_match_python(spark):
    """Feature vectors == a Python recompute with exact integer cents
    and whole-day recency; recency spans multiple distinct values."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from decimal import Decimal

    from bsc_project_spark.queries.eventops import QUERIES

    got = {
        r.user_id: (r.recency_days, r.frequency, r.monetary_cents)
        for r in QUERIES["q_rfm_features"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    us = pc.cast(pc.cast(tbl["ts"], "timestamp[us]"), "int64").to_pylist()
    users = tbl["user_id"].to_pylist()
    vals = tbl["value"].to_pylist()
    anchor = max(us)
    agg: dict[int, list] = {}
    for u, t, v in zip(users, us, vals):
        a = agg.setdefault(u, [0, 0, Decimal(0)])
        a[0] = max(a[0], t)
        a[1] += 1
        a[2] += Decimal(f"{v:.6f}")
    want = {
        u: ((anchor - last) // 86_400_000_000, f, int(m * 100))
        for u, (last, f, m) in agg.items()
    }
    assert got == want
    assert len({r for r, _, _ in got.values()}) > 1


def test_type_token_ratio_matches_python(spark):
    """TTR == a Python recompute; every source's ratio is in (0, 1]
    and types never exceed tokens."""
    import re

    from bsc_project_spark.queries.textops import QUERIES

    got = {
        r.source: (r.n_tokens, r.n_types, r.ttr_ppm)
        for r in QUERIES["q_type_token_ratio"].spark(spark, SF).collect()
    }
    con = _duck()
    rows = con.execute("SELECT source, lower(trim(text)) FROM documents").fetchall()
    toks: dict[str, list] = {}
    for src, txt in rows:
        toks.setdefault(src, []).extend(w for w in re.split(r"\s+", txt) if w)
    want = {
        src: (len(ws), len(set(ws)), len(set(ws)) * 1_000_000 // len(ws))
        for src, ws in toks.items()
    }
    assert got == want
    assert all(0 < t <= 1_000_000 for _, _, t in got.values())


# ---------------------------------------------------------------------------
# Pareto concentration
# ---------------------------------------------------------------------------


def test_pareto_users_matches_python(spark):
    """The 80/20 summary == a Python recompute over exact cents, the
    power set genuinely covers >= 80%, and dropping its last member
    covers < 80% (minimality)."""
    import pyarrow.parquet as pq
    from decimal import Decimal

    from bsc_project_spark.queries.eventops import QUERIES

    row = QUERIES["q_pareto_users"].spark(spark, SF).collect()[0]
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    cents: dict[int, Decimal] = {}
    for u, v in zip(tbl["user_id"].to_pylist(), tbl["value"].to_pylist()):
        cents[u] = cents.get(u, Decimal(0)) + Decimal(f"{v:.6f}")
    vals = sorted(
        ((int(c * 100), u) for u, c in cents.items()), key=lambda t: (-t[0], t[1])
    )
    total = sum(c for c, _ in vals)
    cum, p = 0, 0
    for c, _ in vals:
        cum += c
        p += 1
        if cum * 100 >= 80 * total:
            break
    assert (row.n_users, row.n_power_users) == (len(vals), p)
    assert row.users_ppm == p * 1_000_000 // len(vals)
    assert row.value_ppm == cum * 1_000_000 // total
    assert cum * 100 >= 80 * total
    assert (cum - vals[p - 1][0]) * 100 < 80 * total


# ---------------------------------------------------------------------------
# Day-of-week profile
# ---------------------------------------------------------------------------


def test_dow_profile_matches_python(spark):
    """Seasonality cells == a Python recompute of epoch-day mod 7; each
    type's shares cover the whole type up to integer-floor loss."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from bsc_project_spark.queries.eventops import QUERIES

    got = {
        (r.event_type, r.dow): (r.n_events, r.share_ppm)
        for r in QUERIES["q_dow_profile"].spark(spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"])
    us = pc.cast(pc.cast(tbl["ts"], "timestamp[us]"), "int64").to_pylist()
    cells: dict[tuple, int] = {}
    tot: dict[str, int] = {}
    for ty, t in zip(tbl["event_type"].to_pylist(), us):
        d = (t // 86_400_000_000) % 7
        cells[(ty, d)] = cells.get((ty, d), 0) + 1
        tot[ty] = tot.get(ty, 0) + 1
    want = {k: (n, n * 1_000_000 // tot[k[0]]) for k, n in cells.items()}
    assert got == want
    for ty, r in tot.items():
        assert sum(n for (a, _), (n, _) in got.items() if a == ty) == r
