"""Randomized brute-force cross-checks for the round-2 operators.

Each test draws a handful of seeded random inputs (small — every case
runs a real Ray pipeline) and compares the distributed operator against
an O(n²) / pure-pandas reference computed locally.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _random_events(rng, n, n_users, n_minutes=120):
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(
        minutes=int(m), seconds=int(s))
        for m, s in zip(rng.integers(0, n_minutes, n),
                        rng.integers(0, 60, n))]
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "value": rng.uniform(0, 10, n).round(3),
    })


def test_window_count_join_vs_bruteforce_random():
    from saber_ray.stages.relational import window_count_join

    for seed in (3, 17, 99):
        rng = np.random.default_rng(seed)
        left_df = _random_events(rng, 60, 5)
        right_df = _random_events(rng, 80, 5)
        before = pd.Timedelta(minutes=25)
        after = pd.Timedelta(minutes=10)
        left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(3)
        right = rd.from_arrow(pa.Table.from_pandas(
            right_df[["ts", "user_id"]])).repartition(2)
        got = {r["event_id"]: r["n_range"] for r in window_count_join(
            left, right, before=before, after=after).take_all()}
        for _, l in left_df.iterrows():
            m = right_df[(right_df.user_id == l.user_id)
                         & (right_df.ts >= l.ts - before)
                         & (right_df.ts < l.ts + after)]
            assert got[l.event_id] == len(m), (seed, l.event_id)


def test_running_and_rolling_vs_pandas_random():
    from saber_ray.stages.relational import rolling_avg, running_totals

    rng = np.random.default_rng(7)
    df = _random_events(rng, 200, 8)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["run"] = ref.groupby("user_id")["value"].cumsum()
    ref["roll"] = ref.groupby("user_id")["value"].rolling(
        3, min_periods=1).mean().reset_index(level=0, drop=True)

    run = {r["event_id"]: r["running_value"] for r in running_totals(ds).take_all()}
    roll = {r["event_id"]: r["rolling_avg"] for r in rolling_avg(ds).take_all()}
    for _, row in ref.iterrows():
        assert abs(run[row.event_id] - row.run) < 1e-9
        assert abs(roll[row.event_id] - row.roll) < 1e-9


def test_salted_join_vs_plain_random_skew():
    from saber_ray.stages.relational import salted_join

    for seed in (1, 42):
        rng = np.random.default_rng(seed)
        n = 500
        # zipf-ish skew: most rows on a few keys
        keys = np.minimum(rng.zipf(1.3, n), 50).astype(np.int64)
        left = rd.from_arrow(pa.table({
            "k": keys, "lval": np.arange(n, dtype=np.int64)})).repartition(4).materialize()
        rk = rng.choice(50, 12, replace=False).astype(np.int64)
        right = rd.from_arrow(pa.table({
            "k": rk, "rval": np.arange(12, dtype=np.int64)})).materialize()
        got = sorted((r["k"], r["lval"], r["rval"]) for r in salted_join(
            left, right, "k", num_salts=3, hot_threshold=30,
            num_partitions=3).take_all())
        want = sorted((r["k"], r["lval"], r["rval"]) for r in left.join(
            right, join_type="inner", num_partitions=3, on=("k",)).take_all())
        assert got == want, seed


def test_weighted_sample_matches_local_es_order():
    import hashlib

    from saber_ray.stages.sampling import weighted_sample

    rng = np.random.default_rng(11)
    n, k = 300, 25
    w = rng.uniform(0.1, 5.0, n)
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                  "w": pa.array(w)})
    got = sorted(r["doc_id"] for r in weighted_sample(
        rd.from_arrow(t).repartition(6), "w", k=k,
        id_column="doc_id").take_all())
    u = np.array([(int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5)
                  / 2**32 for i in range(n)])
    key = -np.log(u) / w
    want = sorted(np.argsort(key, kind="stable")[:k].tolist())
    assert got == want


def test_select_survivors_matches_bruteforce():
    """Random components + random texts: distributed survivor selection
    == the pandas argmax reference (max tokens, then min id)."""
    import re

    from saber_ray.stages.dedup import select_survivors

    tok = re.compile(r"[0-9a-z]+")
    rng = np.random.default_rng(11)
    for trial in range(3):
        n_docs = int(rng.integers(10, 60))
        words = ["alpha", "beta", "gamma", "x1", "y2"]
        texts = [
            " ".join(rng.choice(words, size=rng.integers(0, 12)))
            for _ in range(n_docs)
        ]
        docs = pd.DataFrame({
            "doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
        # random components over a random subset of docs
        member = rng.random(n_docs) < 0.6
        comp_of = {}
        for i in np.flatnonzero(member):
            comp_of[int(i)] = int(rng.integers(0, 6))
        labels = pd.DataFrame({
            "doc_id": np.array(sorted(comp_of), dtype=np.int64),
            "component": np.array(
                [comp_of[i] for i in sorted(comp_of)], dtype=np.int64),
        })
        if len(labels) == 0:
            continue

        got = sorted(
            (r["component"], r["doc_id"], r["n_tokens"], r["n_docs"])
            for r in select_survivors(
                rd.from_pandas(labels), rd.from_pandas(docs)).take_all()
        )

        ref = labels.merge(docs, on="doc_id")
        ref["n_tokens"] = ref["text"].map(
            lambda t: len(tok.findall(t.lower())))
        want = []
        for comp, g in ref.groupby("component"):
            g = g.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
            want.append((int(comp), int(g.iloc[0]["doc_id"]),
                         int(g.iloc[0]["n_tokens"]), int(len(g))))
        assert got == sorted(want), f"trial {trial}"


def test_exact_drop_stats_matches_bruteforce():
    """Random dup groups across random sources: distributed per-source
    drop stats == the pandas fingerprint-groupby reference."""
    import re

    from saber_ray.stages.dedup import exact_drop_stats

    tok = re.compile(r"[0-9a-z]+")
    rng = np.random.default_rng(23)
    for trial in range(3):
        n = int(rng.integers(8, 50))
        base = ["alpha beta", "gamma delta", "x y z", "solo words here"]
        texts = [base[int(rng.integers(0, len(base)))] for _ in range(n)]
        srcs = [f"s{int(rng.integers(0, 3))}" for _ in range(n)]
        docs = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": srcs, "text": texts})

        got = sorted(
            (r["source"], r["n_docs"], r["n_dropped"],
             round(r["drop_rate"], 9))
            for r in exact_drop_stats(rd.from_pandas(docs)).take_all()
        )

        ref = docs.copy()
        ref["fp"] = ref["text"].map(
            lambda t: " ".join(tok.findall(t.lower())))
        keep = ref.groupby("fp")["doc_id"].transform("min")
        ref["dropped"] = ref["doc_id"] != keep
        want = sorted(
            (src, int(len(g)), int(g["dropped"].sum()),
             round(float(g["dropped"].sum()) / len(g), 9))
            for src, g in ref.groupby("source")
        )
        assert got == want, f"trial {trial}"


def test_quality_report_matches_bruteforce():
    """Random texts: per-(source, reason) counts == a local verdict
    recount over the same batch kernel."""
    from saber_ray.stages.quality import quality_filter_batch, quality_report

    rng = np.random.default_rng(31)
    words = ["the", "and", "supercalifragilistic", "ab", "information",
             "processing", "x9", "qq"]
    for trial in range(2):
        n = int(rng.integers(10, 40))
        texts = [
            " ".join(rng.choice(words, size=int(rng.integers(0, 25))))
            for _ in range(n)
        ]
        srcs = [f"s{int(rng.integers(0, 3))}" for _ in range(n)]
        docs = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": srcs, "text": texts})
        kw = dict(min_tokens=5, min_stopword_ratio=0.05,
                  min_mean_token_len=2.0, max_mean_token_len=8.0,
                  max_dup_line_frac=0.5, max_top_bigram_frac=0.5)

        got = sorted(
            (r["source"], r["reason"], r["n_docs"])
            for r in quality_report(
                rd.from_pandas(docs), group_column="source", **kw
            ).take_all()
        )

        v = quality_filter_batch(
            pa.Table.from_pandas(docs), **kw).to_pandas()
        want = {}
        for src, keep, reasons in zip(docs["source"], v["keep"], v["reasons"]):
            for reason in (["ok"] if keep else reasons.split(",")):
                want[(src, reason)] = want.get((src, reason), 0) + 1
        assert got == sorted((s, r, c) for (s, r), c in want.items()), (
            f"trial {trial}")


def _random_typed_events(rng, n, n_users, types=("signup", "click",
                                                 "purchase", "view")):
    df = _random_events(rng, n, n_users)
    df["event_type"] = [types[i] for i in rng.integers(0, len(types), n)]
    return df


def test_funnel_vs_bruteforce_random():
    from saber_ray.stages.relational import funnel

    steps = ("signup", "click", "purchase")
    for seed in (5, 23, 71):
        rng = np.random.default_rng(seed)
        df = _random_typed_events(rng, 120, 8)
        ds = rd.from_arrow(pa.Table.from_pandas(
            df[["user_id", "ts", "event_type"]])).repartition(3)
        got = {r["step"]: r["users"] for r in funnel(ds, steps=steps).take_all()}
        want = {1: 0, 2: 0, 3: 0}
        for _, u in df.groupby("user_id"):
            t = None
            for i, s in enumerate(steps, 1):
                sub = u[u.event_type == s]
                if t is not None:
                    sub = sub[sub.ts > t]
                if sub.empty:
                    break
                t = sub.ts.min()
                want[i] += 1
        assert got == want, seed


def test_event_transitions_vs_bruteforce_random():
    from saber_ray.stages.relational import event_transitions

    for seed in (7, 41):
        rng = np.random.default_rng(seed)
        df = _random_typed_events(rng, 100, 6)
        ds = rd.from_arrow(pa.Table.from_pandas(
            df[["user_id", "ts", "event_type", "event_id"]])).repartition(4)
        got = {(r["from_type"], r["to_type"]): r["n"]
               for r in event_transitions(ds).take_all()}
        want = {}
        for _, u in df.groupby("user_id"):
            seq = u.sort_values(["ts", "event_id"]).event_type.tolist()
            for a, b in zip(seq, seq[1:]):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want, seed


def test_cohort_retention_vs_bruteforce_random():
    from saber_ray.stages.relational import cohort_retention

    week_us = 7 * 24 * 3600 * 1_000_000
    for seed in (11, 59):
        rng = np.random.default_rng(seed)
        df = _random_typed_events(rng, 150, 10)
        # spread events over ~3 weeks so offsets exist
        df["ts"] = df["ts"] + pd.to_timedelta(
            rng.integers(0, 20, len(df)), unit="D")
        df["ts"] = df["ts"].astype("datetime64[us]")
        ds = rd.from_arrow(pa.Table.from_pandas(
            df[["user_id", "ts", "event_type"]])).repartition(3)
        got = {(r["cohort_week"], r["week_offset"]): r["users"]
               for r in cohort_retention(ds).take_all()}
        want = {}
        wk = df.ts.astype("int64") // week_us
        df2 = df.assign(wk=wk)
        for uid, u in df2.groupby("user_id"):
            su = u[u.event_type == "signup"]
            if su.empty:
                continue
            cw = int(su.wk.min())
            for w in sorted(set(int(x) for x in u.wk if x >= cw)):
                key = (cw, w - cw)
                want[key] = want.get(key, 0) + 1
        assert got == want, seed


def _random_graph(rng, n_nodes, n_edges):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return pd.DataFrame({
        "src": [f"n{i}" for i in src],
        "dst": [f"n{i}" for i in dst],
    })


def test_hits_vs_bruteforce_random():
    from saber_ray.stages.graph import hits

    for seed in (13, 37):
        rng = np.random.default_rng(seed)
        df = _random_graph(rng, 8, 20)
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
        got = {r["node"]: (r["authority"], r["hub"])
               for r in hits(ds, iterations=4).take_all()}
        # brute force on the deduped edge set
        e = df.drop_duplicates()
        nodes = sorted(set(e.src) | set(e.dst))
        idx = {v: i for i, v in enumerate(nodes)}
        si = np.array([idx[s] for s in e.src])
        di = np.array([idx[d] for d in e.dst])
        hub = np.ones(len(nodes))
        for _ in range(4):
            auth = np.bincount(di, weights=hub[si], minlength=len(nodes))
            auth /= (np.linalg.norm(auth) or 1.0)
            hub = np.bincount(si, weights=auth[di], minlength=len(nodes))
            hub /= (np.linalg.norm(hub) or 1.0)
        for v in nodes:
            a, h = got[v]
            assert abs(a - auth[idx[v]]) < 1e-5, (seed, v)
            assert abs(h - hub[idx[v]]) < 1e-5, (seed, v)


def test_adamic_adar_vs_bruteforce_random():
    import math

    from saber_ray.stages.graph import adamic_adar

    for seed in (19, 83):
        rng = np.random.default_rng(seed)
        df = _random_graph(rng, 9, 16)
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
        got = {(r["a"], r["b"]): (r["common_neighbors"], r["aa_score"])
               for r in adamic_adar(ds).take_all()}
        adj = {}
        for _, r in df.iterrows():
            if r.src == r.dst:
                continue
            adj.setdefault(r.src, set()).add(r.dst)
            adj.setdefault(r.dst, set()).add(r.src)
        want = {}
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                if b in adj[a]:
                    continue
                common = adj[a] & adj[b]
                if not common:
                    continue
                aa = sum(1.0 / math.log(len(adj[c])) for c in common)
                want[(a, b)] = (len(common), round(aa, 6))
        assert got == want, seed


def test_k_core_vs_bruteforce_random():
    from saber_ray.stages.graph import k_core

    for seed in (29, 61):
        rng = np.random.default_rng(seed)
        df = _random_graph(rng, 10, 18)
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
        got = {r["node_id"]: r["core_degree"]
               for r in k_core(ds, k=2).take_all()}
        adj = {}
        for _, r in df.iterrows():
            if r.src == r.dst:
                continue
            adj.setdefault(r.src, set()).add(r.dst)
            adj.setdefault(r.dst, set()).add(r.src)
        changed = True
        while changed:
            changed = False
            for v in [v for v, ns in adj.items() if len(ns) < 2]:
                for w in adj.pop(v):
                    if w in adj:
                        adj[w].discard(v)
                changed = True
        want = {v: len(ns) for v, ns in adj.items() if ns}
        assert got == want, seed


def test_jaccard_neighbors_vs_bruteforce_random():
    from saber_ray.stages.graph import jaccard_neighbors

    for seed in (23, 71):
        rng = np.random.default_rng(seed)
        df = _random_graph(rng, 9, 16)
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
        got = {(r["a"], r["b"]): (r["common_neighbors"], r["jaccard"])
               for r in jaccard_neighbors(ds).take_all()}
        adj = {}
        for _, r in df.iterrows():
            if r.src == r.dst:
                continue
            adj.setdefault(r.src, set()).add(r.dst)
            adj.setdefault(r.dst, set()).add(r.src)
        want = {}
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                if b in adj[a]:
                    continue
                common = adj[a] & adj[b]
                if not common:
                    continue
                j = len(common) / len(adj[a] | adj[b])
                want[(a, b)] = (len(common), round(j, 6))
        assert got == want, seed


def test_random_walks_vs_bruteforce():
    """Walk next-hop = md5-argmin over neighbors, per (walk, step):
    recompute every walk locally and require exact equality — this is
    the determinism contract that makes the walk corpus reproducible
    under retries and repartitioning."""
    from saber_ray.functions.hashing import stable_u64_md5
    from saber_ray.stages.graph import random_walks

    rng = np.random.default_rng(37)
    df = _random_graph(rng, 8, 14)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    length = 3
    got = {(r["walk_id"], r["step"]): r["node_id"]
           for r in random_walks(ds, length=length).take_all()}

    adj = {}
    for _, r in df.iterrows():
        if r.src == r.dst:
            continue
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    want = {}
    for start in adj:
        cur = start
        want[(start, 0)] = cur
        for s in range(1, length + 1):
            cur = min(adj[cur], key=lambda x: (
                stable_u64_md5(f"{start}|{s}|{x}") & ((1 << 63) - 1), x))
            want[(start, s)] = cur
    assert got == want
