"""Independent Python recomputes for the round-4 ops (q_kcore,
q_sparse_knn, q_pq_codes) — same discipline as tests/test_round3_ops.py:
each query's result is re-derived from the parquet inputs with plain
Python/numpy (no Spark, no SQL), so a bug shared by both engine SQL
dialects can't hide behind the oracle hash match."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from bsc_project_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"
FANOUT = 3
KCORE_K = 3
KCORE_ROUNDS = 8


def _hex8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def link_graph(docs):
    ids = sorted(docs["doc_id"])
    n = len(ids)
    idx = {d: i for i, d in enumerate(ids)}
    und = set()
    for i in range(n):
        for k in range(1, FANOUT + 1):
            dst = _hex8(f"{i}:{k}") % n
            if dst != i:
                und.add((i, dst))
                und.add((dst, i))
    return ids, idx, und


def test_kcore_matches_python_peel(spark, link_graph):
    ids, _idx, und = link_graph
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)

    surv = set(range(len(ids)))
    history = []
    for _ in range(KCORE_ROUNDS):
        surv = {v for v in surv if sum(1 for u in adj[v] if u in surv) >= KCORE_K}
        history.append(set(surv))
    # the query is DEFINED as the 8-round peel; additionally pin that 8
    # rounds reaches the fixpoint on this graph family (so the fixed
    # round count isn't silently under-peeling)
    assert history[-1] == history[-2], "8-round peel did not converge"
    want = {
        ids[v]: (1, sum(1 for u in adj[v] if u in surv)) for v in surv
    }

    got = all_queries()["q_kcore"].spark(spark, SF_DIR).collect()
    assert len(got) == len(ids)
    for r in got:
        w_in, w_deg = want.get(r.doc_id, (0, 0))
        assert (r.in_core, r.core_deg) == (w_in, w_deg), r.doc_id


def test_sparse_knn_matches_python(spark, docs):
    # bigram terms, integer tf-idf weights, rare-term candidates,
    # exact integer dots — recomputed with dicts and Counter
    toks = {}
    for r in docs.itertuples():
        words = [w for w in re.split(r"\s+", r.text.strip().lower()) if w != ""]
        toks[r.doc_id] = Counter(
            f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
        )
    n_docs = len(docs)
    df = Counter()
    for c in toks.values():
        df.update(c.keys())
    w = {
        d: {t: tf * math.floor(100.0 * n_docs / df[t]) for t, tf in c.items()}
        for d, c in toks.items()
    }
    norm = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    rare = {t for t, f in df.items() if 2 <= f <= 10}
    post = defaultdict(list)
    for d, ws in w.items():
        for t in ws:
            if t in rare:
                post[t].append(d)
    cand = set()
    for t, ds in post.items():
        for a in ds:
            for b in ds:
                if a < b:
                    cand.add((a, b))
    sims = {}
    for a, b in cand:
        dot = sum(wa * w[b][t] for t, wa in w[a].items() if t in w[b])
        sims[(a, b)] = round(dot / (math.sqrt(norm[a]) * math.sqrt(norm[b])), 6)
    best = defaultdict(list)
    for (a, b), s in sims.items():
        best[a].append((-s, b))
        best[b].append((-s, a))
    want = set()
    for d, lst in best.items():
        for negs, nb in sorted(lst)[:3]:
            want.add((d, nb, -negs))

    got = {
        (r.doc_id, r.neighbor, r.sim)
        for r in all_queries()["q_sparse_knn"].spark(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_pq_codes_matches_python(spark):
    import numpy as np

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vec_ids = emb["vec_id"].to_numpy()
    m, k, iters = 2, 8, 1
    sub_w = E.shape[1] // m

    def lloyd(V):
        Q = np.floor(V * 1000.0)
        vn = np.maximum(np.sqrt((Q * Q).sum(axis=1)), 1e-9)
        seeds = np.argsort(vec_ids)[: k]  # k smallest vec_ids
        cv = Q[seeds].copy()
        cn = np.maximum(np.sqrt((cv * cv).sum(axis=1)), 1e-9)
        for _ in range(iters):
            cos = np.round(Q @ cv.T / np.outer(vn, cn), 5)
            assign = cos.argmax(axis=1)  # first max = lowest cid, ties on cid
            for cid in range(k):
                mask = assign == cid
                if mask.any():
                    cv[cid] = np.floor(Q[mask].sum(axis=0) * 1000.0 / mask.sum())
            cn = np.maximum(np.sqrt((cv * cv).sum(axis=1)), 1e-9)
        cos = np.round(Q @ cv.T / np.outer(vn, cn), 5)
        return cos.argmax(axis=1), cos.max(axis=1)

    want = {}
    for s in range(m):
        codes, cosv = lloyd(E[:, s * sub_w : (s + 1) * sub_w])
        for vid, c, cs in zip(vec_ids, codes, cosv):
            want[(int(vid), s)] = (int(c), float(cs))

    got = all_queries()["q_pq_codes"].spark(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        wc, ws = want[(r.vec_id, r.sub)]
        assert r.code == wc, (r.vec_id, r.sub)
        assert abs(r.cosine - ws) < 1e-9, (r.vec_id, r.sub)


def test_winnowing_matches_python(spark, docs):
    K, W = 3, 4
    fps_by_doc = defaultdict(set)
    for r in docs.itertuples():
        words = [w for w in re.split(r"\s+", r.text.strip().lower()) if w != ""]
        hs = [
            _hex8(" ".join(words[i : i + K]))
            for i in range(len(words) - K + 1)
        ]
        for i in range(len(hs) - W + 1):
            win = hs[i : i + W]
            m = min(win)
            # rightmost minimal position (the packed-key tie rule)
            pos = max(j for j in range(W) if win[j] == m) + i
            fps_by_doc[r.doc_id].add((pos, m))
    cnt = Counter()
    for _d, fps in fps_by_doc.items():
        for h in {h for _p, h in fps}:
            cnt[h] += 1
    want = {(h, n) for h, n in cnt.items() if n >= 2}

    got = {
        (r.fp, r.n_docs)
        for r in all_queries()["q_winnowing"].spark(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_containment_matches_python(spark, docs):
    K, TAU = 4, 0.6
    sh = {}
    for r in docs.itertuples():
        words = [w for w in re.split(r"\s+", r.text.strip().lower()) if w != ""]
        sh[r.doc_id] = {
            " ".join(words[i : i + K]) for i in range(len(words) - K + 1)
        }
    df = Counter()
    for s in sh.values():
        df.update(s)
    rare = {g for g, f in df.items() if 2 <= f <= 10}
    post = defaultdict(list)
    for d, s in sh.items():
        for g in s:
            if g in rare:
                post[g].append(d)
    cand = set()
    for ds in post.values():
        for a in ds:
            for b in ds:
                if a < b:
                    cand.add((a, b))
    want = set()
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        ca = round(inter / len(sh[a]), 6)
        cb = round(inter / len(sh[b]), 6)
        if ca >= TAU:
            want.add((a, b, ca))
        if cb >= TAU:
            want.add((b, a, cb))

    got = {
        (r.src_doc, r.dst_doc, r.containment)
        for r in all_queries()["q_containment"].spark(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_cdc_chunks_matches_python(spark, docs):
    WIN, DIV = 8, 64
    chunk_occ = Counter()
    chunk_docs = defaultdict(set)
    chunk_len = {}
    for r in docs.itertuples():
        t = r.text
        if len(t) < WIN:
            continue
        bounds = []
        for i in range(WIN, len(t) + 1):  # 1-based end positions
            h = sum(ord(t[i - 1 - j]) * (131 ** j) for j in range(WIN)) % 2147483647
            if h % DIV == 0:
                bounds.append(i)
        starts = [1] + [b + 1 for b in bounds]
        ends = bounds + [len(t)]
        for s, e in zip(starts, ends):
            if e >= s:
                chunk = t[s - 1 : e]
                key = hashlib.md5(chunk.encode()).hexdigest()
                chunk_occ[key] += 1
                chunk_docs[key].add(r.doc_id)
                chunk_len[key] = min(chunk_len.get(key, 1 << 60), e - s + 1)
    want = {
        (k, n, len(chunk_docs[k]), chunk_len[k])
        for k, n in chunk_occ.items()
        if n >= 2
    }

    got = {
        (r.chunk_hash, r.n_occ, r.n_docs, r.chunk_len)
        for r in all_queries()["q_cdc_chunks"].spark(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_cdc_vectorized_equals_sql_formulation(spark):
    """The registered engine path (np.convolve over codepoints) must
    equal the per-position pure-SQL formulation kept as
    _CDC_SPARK_SQL_REFERENCE (the oracle's shape) row for row — pinning
    that the vectorization changed the PLAN, not the semantics."""
    from bsc_project_spark.queries import register_views
    from bsc_project_spark.queries.textops import _CDC_SPARK_SQL_REFERENCE

    register_views(spark, SF_DIR)
    sql_rows = sorted(map(tuple, spark.sql(_CDC_SPARK_SQL_REFERENCE).collect()))
    fast_rows = sorted(
        map(tuple, all_queries()["q_cdc_chunks"].spark(spark, SF_DIR).collect())
    )
    assert sql_rows == fast_rows
    assert len(fast_rows) > 0


def test_round4_ops_have_no_global_sort_task(spark):
    """None of the six round-4 ops may funnel data through a single-task
    global sort/window: every Exchange SinglePartition in their plans
    must be fed by a map-side-combined keyless partial aggregate (the
    scalar-count / bounded-fold exemption test_plans.py documents)."""
    qs = all_queries()
    for name in ("q_kcore", "q_sparse_knn", "q_pq_codes",
                 "q_winnowing", "q_containment", "q_cdc_chunks"):
        plan = (
            qs[name].spark(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            child = lines[i + 1] if i + 1 < len(lines) else ""
            # a keyless aggregate child = scalar count / bounded fold
            # (1-row or k-row state); a Sort/Generate/scan child would be
            # the global-order single-task shape this test forbids
            assert "Aggregate" in child and "keys=[]" in child, (
                f"{name}: SinglePartition fed by non-scalar child:\n"
                f"{line}\n{child}"
            )
