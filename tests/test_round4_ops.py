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
