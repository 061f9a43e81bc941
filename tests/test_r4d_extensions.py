"""Invariant tests for the fourth round-4 continuation batch:
cross-document substring-span dedup and blocked record linkage —
each re-derived in plain python from the same fixture and required to
agree row-for-row with the engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.operators import dedup
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load


def _word_ngrams(text: str, n: int) -> list[str]:
    words = (text or "").split(" ")
    if len(words) < n:
        return [text or ""]
    return [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]


def test_substring_spans_matches_python_recompute(spark, sf_smoke):
    """Full python reimplementation at sf0.001: positional 5-grams,
    cross-document duplicate set (>= 2 distinct docs), per-doc island
    runs — the engine's per-doc rows must agree exactly, including the
    integer-ppm arithmetic and the ORDER BY."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, "documents", sf_smoke)
        .select("doc_id", "text")
        .collect()
    }
    gram_docs: dict[str, set[int]] = {}
    positions: dict[int, list[str]] = {}
    for doc_id, text in docs.items():
        grams = _word_ngrams(text, dedup.SPAN_N)
        positions[doc_id] = grams
        for g in grams:
            gram_docs.setdefault(g, set()).add(doc_id)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = {}
    for doc_id, grams in positions.items():
        hits = [i for i, g in enumerate(grams) if g in dup]
        if not hits:
            continue
        best = run = 1
        for a, b in zip(hits, hits[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        expected[doc_id] = (
            len(grams),
            len(hits),
            best,
            best + dedup.SPAN_N - 1,
            len(hits) * 1000000 // len(grams),
        )
    rows = dedup.dedup_substring_spans(spark, sf_smoke).collect()
    assert [r["doc_id"] for r in rows] == sorted(expected)
    for r in rows:
        assert (
            r["n_grams"],
            r["n_dup_grams"],
            r["max_dup_run_grams"],
            r["max_dup_span_words"],
            r["dup_gram_ppm"],
        ) == expected[r["doc_id"]]
    # The fixture's near-duplicate docs guarantee long shared spans.
    assert any(r["max_dup_run_grams"] > 1 for r in rows)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_er_blocked_matching_python_recompute(spark, sf_smoke):
    """Rebuild the dirty-record fixture and the blocked comparison in
    plain python (including a reference Levenshtein) from the raw
    custkeys and require the summary row to agree count-for-count.
    Also pins the designed signal: blocking recall < 1 (every 9th
    entity mis-blocks) and match recall < blocking recall (every 5th
    entity's double-drop exceeds the threshold)."""
    keys = [
        r["c_custkey"]
        for r in load(spark, "customer", sf_smoke).select("c_custkey").collect()
    ]
    adj = dedup.ER_ADJ.split(",")
    noun = dedup.ER_NOUN.split(",")
    n_blocks = max(dedup.ER_MIN_BLOCKS, len(keys) // dedup.ER_BLOCK_TARGET)
    recs = []
    for k in keys:
        e, v = k // 2, k % 2
        name = f"{adj[e % 8]} {noun[(e // 8) % 8]} {e}"
        if v == 1:
            p = e % 10  # 0-based count of kept prefix chars
            name = name[:p] + name[p + 1 :]
            if e % 5 == 0:
                q = e % 7
                name = name[:q] + name[q + 1 :]
        city = (e + 1) % n_blocks if v == 1 and e % 9 == 0 else (
            e % n_blocks
        )
        recs.append((k, e, name, city))
    n_cand = n_match = n_true_cob = n_true_match = 0
    for i, (ra, ea, na, ca) in enumerate(recs):
        for rb, eb, nb, cb in recs[i + 1 :]:
            if ca != cb:
                continue
            n_cand += 1
            match = _lev(na, nb) <= dedup.ER_LEV_MATCH
            n_match += match
            if ea == eb:
                n_true_cob += 1
                n_true_match += match
    ent: dict[int, int] = {}
    for _, e, _, _ in recs:
        ent[e] = ent.get(e, 0) + 1
    n_true_pairs = sum(k * (k - 1) // 2 for k in ent.values())
    [row] = dedup.er_blocked_matching(spark, sf_smoke).collect()
    assert row["n_entities"] == len(ent)
    assert row["n_records"] == len(recs)
    assert row["n_true_pairs"] == n_true_pairs
    assert row["n_candidate_pairs"] == n_cand
    assert row["n_matched"] == n_match
    assert row["n_true_matched"] == n_true_match
    assert row["blocking_recall_ppm"] == n_true_cob * 1000000 // max(
        n_true_pairs, 1
    )
    assert row["match_recall_ppm"] == n_true_match * 1000000 // max(
        n_true_pairs, 1
    )
    assert row["precision_ppm"] == n_true_match * 1000000 // max(n_match, 1)
    assert 0 < row["match_recall_ppm"] < row["blocking_recall_ppm"] < 1000000


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_er_blocking_is_equality_join(spark, sf_dir):
    """The candidate generator must be an equality (hash/sort-merge)
    join on the block key — never an all-pairs nested loop. The only
    nested-loop allowed is the final broadcast of the 1-row truth
    aggregate onto the 1-row candidate aggregate."""
    plan = _plan(dedup.er_blocked_matching(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # The block-key candidate join is an equality join.
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # Nested loops are 1-row broadcasts only (tree + detail block = 2
    # string occurrences each in formatted output): the n_blocks count
    # onto the records (planned once per self-join side and once under
    # the truth aggregate) and the truth x candidate summary glue.
    assert plan.count("BroadcastNestedLoopJoin") <= 8


def test_substring_spans_shuffles_hashes_not_text(spark, sf_dir):
    """Both gram-keyed exchanges move the md5 key, never gram text,
    and nothing in the plan is an all-pairs join."""
    plan = _plan(dedup.dedup_substring_spans(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "md5" in plan


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The windowed skyline must equal the O(n^2) domination
    definition recomputed in python over the collected part table."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import extras

    parts = [
        (r["p_partkey"], int(round(r["p_retailprice"] * 100)), r["p_size"])
        for r in load(spark, "part", sf_dir)
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    frontier = set()
    for k, pc, sz in parts:
        dominated = any(
            qc <= pc and qs >= sz and (qc < pc or qs > sz)
            for _, qc, qs in parts
        )
        if not dominated:
            frontier.add(k)
    rows = extras.skyline_pareto_parts(spark, sf_dir).collect()
    assert {r["p_partkey"] for r in rows} == frontier
    # Frontier is an antichain: prices strictly increase, sizes strictly
    # increase along the returned order (up to equal-point duplicates).
    for a, b in zip(rows, rows[1:]):
        if a["price_cents"] == b["price_cents"]:
            assert a["p_size"] == b["p_size"]
        else:
            assert a["price_cents"] < b["price_cents"]
            assert a["p_size"] < b["p_size"]


def test_robust_mad_python_recompute(spark, sf_smoke):
    """Nearest-rank medians, MAD, and the 2-MAD outlier count recomputed
    in python (percentile_disc = smallest value whose cume_dist >= q)."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import extras

    by_flag: dict[str, list[int]] = {}
    for r in (
        load(spark, "lineitem", sf_smoke)
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        cents = int(round(r["l_extendedprice"] * 100))
        by_flag.setdefault(r["l_returnflag"], []).append(cents)

    def disc_median(vals: list[int]) -> int:
        s = sorted(vals)
        import math

        return s[math.ceil(0.5 * len(s)) - 1]

    rows = extras.stats_robust_mad(spark, sf_smoke).collect()
    assert [r["l_returnflag"] for r in rows] == sorted(by_flag)
    for r in rows:
        vals = by_flag[r["l_returnflag"]]
        med = disc_median(vals)
        adev = [abs(v - med) for v in vals]
        mad = disc_median(adev)
        n_out = sum(1 for d in adev if d > 2 * mad)
        assert r["n"] == len(vals)
        assert r["med_cents"] == med
        assert r["mad_cents"] == mad
        assert r["n_outliers"] == n_out
        assert r["outlier_ppm"] == n_out * 1000000 // len(vals)


def test_view_incremental_merge_equals_full_recompute(spark, sf_dir):
    """The merge of base+delta partials must equal a one-pass Spark
    recompute over all orders (the incremental-maintenance law, proven
    inside the engine; the DuckDB oracle proves it cross-engine), and
    both sides of the cutoff must be non-empty for the test to mean
    anything."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import datamix

    orders = load(spark, "orders", sf_dir)
    n_base = orders.filter(F.col("o_orderdate") < datamix.VIEW_CUTOFF).count()
    n_all = orders.count()
    assert 0 < n_base < n_all
    full = (
        orders.select(
            "o_custkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            "o_custkey", "n_orders", "sum_cents", "min_cents", "max_cents",
            F.expr("sum_cents div n_orders").alias("avg_cents_floor"),
        )
        .orderBy("o_custkey")
    )
    merged = datamix.view_incremental_merge(spark, sf_dir)
    assert merged.collect() == full.collect()


def test_experiment_ab_lift_python_recompute(spark, sf_smoke):
    """Hash assignment, per-arm revenue accounting, and the ppm ratio
    recomputed in python with hashlib md5."""
    import hashlib
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        analytics,
    )

    rows = (
        load(spark, "events", sf_smoke)
        .select("user_id", "event_type", "value")
        .collect()
    )
    users: dict[int, tuple[str, int, int]] = {}
    from decimal import Decimal, ROUND_HALF_UP

    stats: dict[str, dict[int, list[int]]] = {"control": {}, "treatment": {}}
    for r in rows:
        uid = r["user_id"]
        h6 = hashlib.md5(
            f"{analytics.AB_TAG}#{uid}".encode()
        ).hexdigest()[:6]
        arm = "control" if int(h6, 16) % 2 == 0 else "treatment"
        cell = stats[arm].setdefault(uid, [0, 0])
        if r["event_type"] == "purchase":
            cents = int(
                Decimal(str(r["value"])).quantize(
                    Decimal("0.01"), rounding=ROUND_HALF_UP
                )
                * 100
            )
            cell[0] += 1
            cell[1] += cents
    exp = {}
    t_users = sum(len(v) for v in stats.values())
    t_rev = sum(c[1] for v in stats.values() for c in v.values())
    for arm, v in stats.items():
        n_users = len(v)
        rev = sum(c[1] for c in v.values())
        exp[arm] = (
            n_users,
            sum(c[0] for c in v.values()),
            rev,
            rev // n_users,
            rev * t_users * 1000000 // (t_rev * n_users),
        )
    out = analytics.experiment_ab_lift(spark, sf_smoke).collect()
    assert [r["arm"] for r in out] == ["control", "treatment"]
    for r in out:
        assert (
            r["n_users"],
            r["n_purchases"],
            r["revenue_cents"],
            r["arpu_cents"],
            r["arpu_ratio_ppm"],
        ) == exp[r["arm"]]
    # Both arms are populated — the hash actually splits the userbase.
    assert all(e[0] > 0 for e in exp.values())


def test_path_topk_journeys_python_recompute(spark, sf_smoke):
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        analytics,
    )

    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in load(spark, "events", sf_smoke)
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    by_user: dict[int, list[str]] = {}
    for uid, _, _, et in ev:
        lst = by_user.setdefault(uid, [])
        if len(lst) < 5:
            lst.append(et)
    census: dict[str, int] = {}
    for lst in by_user.values():
        p = ">".join(lst)
        census[p] = census.get(p, 0) + 1
    top = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    out = analytics.path_topk_journeys(spark, sf_smoke).collect()
    assert [(r["path"], r["n_users"]) for r in out] == top


def test_path_topk_prunes_window_map_side(spark, sf_dir):
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        analytics,
    )

    plan = _plan(analytics.path_topk_journeys(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_profile_table_stats_single_scan(spark, sf_dir):
    """The profiler touches the fact exactly once (Expand is the
    documented cost of one-pass multi-distinct) and recomputes exactly
    in python."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        curation,
    )

    df = curation.profile_table_stats(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Scan parquet  (") == 1
    assert "Expand" in plan
    rows = {r["col_name"]: r for r in df.collect()}
    o = load(spark, "orders", sf_dir).collect()
    assert rows["o_orderkey"]["n_rows"] == len(o)
    assert rows["o_orderkey"]["n_distinct"] == len({r["o_orderkey"] for r in o})
    assert rows["o_orderkey"]["min_value"] == str(
        min(r["o_orderkey"] for r in o)
    )
    assert rows["o_orderdate"]["max_value"] == max(
        r["o_orderdate"] for r in o
    ).strftime("%Y-%m-%d")
    assert rows["o_orderstatus"]["n_distinct"] == len(
        {r["o_orderstatus"] for r in o}
    )


def test_quantile_histogram_python_recompute(spark, sf_smoke):
    """Binning, cumulative argmin, upper-edge estimate, and the exact
    nearest-rank twin recomputed in python; plus the sketch laws:
    est >= exact (the estimate is the covering bin's upper edge) and
    est - exact < bin width."""
    import math
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        sketches,
    )

    xs = sorted(
        int(round(r["l_extendedprice"] * 100))
        for r in load(spark, "lineitem", sf_smoke)
        .select("l_extendedprice")
        .collect()
    )
    mn, mx, n = xs[0], xs[-1], len(xs)
    rng = mx - mn + 1
    B = sketches.HIST_BINS
    counts: dict[int, int] = {}
    for x in xs:
        b = (x - mn) * B // rng
        counts[b] = counts.get(b, 0) + 1
    exp = {}
    for label, num, den in sketches.HIST_PROBES:
        k = (num * n + den - 1) // den
        cum = 0
        bstar = None
        for b in sorted(counts):
            cum += counts[b]
            if cum >= k:
                bstar = b
                break
        est = mn + ((bstar + 1) * rng - 1) // B
        exact = xs[math.ceil((num / den) * n) - 1]
        exp[label] = (est, exact, abs(est - exact) * 1000000 // exact)
    rows = sketches.sketch_quantile_histogram(spark, sf_smoke).collect()
    assert [r["quantile"] for r in rows] == ["p50", "p90", "p99"]
    for r in rows:
        est, exact, err = exp[r["quantile"]]
        assert (r["est_cents"], r["exact_cents"], r["err_ppm"]) == (
            est,
            exact,
            err,
        )
        assert r["est_cents"] >= r["exact_cents"]
        assert r["est_cents"] - r["exact_cents"] < (rng + B - 1) // B


def test_label_propagation_python_replay(spark, sf_smoke):
    """Three synchronous LPA rounds replayed in python over the same
    collected edge list (mode label, smallest-label tie-break), plus
    the structural law: every community label is one of its members'
    ids and communities refine connected components."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import dedup

    edges = [
        (r["src"], r["dst"])
        for r in dedup._dup_edges(spark, sf_smoke).collect()
    ]
    neigh: dict[int, list[int]] = {}
    for s, d in edges:
        neigh.setdefault(d, []).append(s)
    labels = {v: v for v in {s for s, _ in edges}}
    for _ in range(dedup.LPA_ITERS):
        new = {}
        for v, ns in neigh.items():
            freq: dict[int, int] = {}
            for u in ns:
                lbl = labels[u]
                freq[lbl] = freq.get(lbl, 0) + 1
            new[v] = min(freq, key=lambda l: (-freq[l], l))
        labels = new
    rows = dedup.graph_label_propagation(spark, sf_smoke).collect()
    assert {r["doc_id"]: r["community"] for r in rows} == labels
    # Non-trivial: at least one multi-node community formed.
    from collections import Counter

    sizes = Counter(labels.values())
    assert max(sizes.values()) >= 2


def test_group_median_histogram_selection(spark, sf_smoke):
    """_group_median (histogram-assisted selection) equals the plain
    percentile_disc aggregate on every group — the rewrite is an
    identity, only the physical plan differs."""
    from real_time_streaming_system_with_apache_kafka_spark.operators import extras

    li = load(spark, "lineitem", sf_smoke).select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    got = {
        r["l_returnflag"]: (r["n"], r["med"])
        for r in extras._group_median(li, "l_returnflag", "cents").collect()
    }
    want = {
        r["l_returnflag"]: (r["n"], r["med"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)"
                " as bigint)"
            ).alias("med"),
        )
        .collect()
    }
    assert got == want


def test_kcore_python_replay(spark, sf_smoke):
    """Bounded k-core peeling replayed in python over the same edges:
    per-round surviving degrees, peel set, and final core must agree
    node-for-node (including the round each node fell out)."""
    edges = [
        (r["src"], r["dst"])
        for r in dedup._dup_edges(spark, sf_smoke).collect()
    ]
    alive = {s for s, _ in edges}
    peeled_round = {v: 0 for v in alive}
    for rnd in range(1, dedup.KCORE_ROUNDS + 1):
        deg: dict[int, int] = {}
        for s, d in edges:
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        survivors = {v for v, c in deg.items() if c >= dedup.KCORE_K}
        for v in alive - survivors:
            peeled_round[v] = rnd
        alive = survivors
    rows = dedup.graph_kcore(spark, sf_smoke).collect()
    assert {r["doc_id"]: r["peeled_round"] for r in rows} == peeled_round
    for r in rows:
        assert r["in_core"] == (r["peeled_round"] == 0)
    # Signal: the graph actually erodes AND keeps a core.
    assert any(r["peeled_round"] > 0 for r in rows)
    assert any(r["in_core"] for r in rows)


def test_temporal_split_python_recompute(spark, sf_smoke):
    from datetime import datetime
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        sampling,
    )

    cutoff = datetime.strptime(sampling.TEMPORAL_CUTOFF, "%Y-%m-%d")
    rows = (
        load(spark, "orders", sf_smoke)
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    from decimal import Decimal, ROUND_HALF_UP

    agg = {True: [0, set(), 0], False: [0, set(), 0]}
    per_cust: dict[int, list[int]] = {}
    for r in rows:
        tr = r["o_orderdate"] < cutoff
        cents = int(
            Decimal(str(r["o_totalprice"])).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            * 100
        )
        agg[tr][0] += 1
        agg[tr][1].add(r["o_custkey"])
        agg[tr][2] += cents
        cell = per_cust.setdefault(r["o_custkey"], [0, 0])
        cell[0 if tr else 1] += 1
    leak = sum(1 for c in per_cust.values() if c[0] > 0 and c[1] > 0)
    total = len(rows)
    out = {
        r["split"]: r
        for r in sampling.sample_temporal_split(spark, sf_smoke).collect()
    }
    assert set(out) == {"train", "test"}
    for name, tr in (("train", True), ("test", False)):
        r = out[name]
        n, custs, cents = agg[tr]
        assert r["n_orders"] == n
        assert r["n_customers"] == len(custs)
        assert r["revenue_cents"] == cents
        assert r["orders_share_ppm"] == n * 1000000 // total
        assert r["leak_customers"] == leak
        assert r["leak_ppm"] == leak * 1000000 // len(custs)
    assert 0 < out["train"]["leak_ppm"] <= 1000000


def test_bootstrap_ci_python_recompute(spark, sf_smoke):
    """Poisson-bootstrap weights, replica means, and nearest-rank CI
    recomputed in python with hashlib md5 — draw-for-draw identical —
    plus the statistical sanity laws (CI brackets the replica spread
    and roughly the full mean)."""
    import hashlib
    from decimal import Decimal, ROUND_HALF_UP
    from real_time_streaming_system_with_apache_kafka_spark.operators import extras

    rows = [
        (
            r["o_orderkey"],
            int(
                Decimal(str(r["o_totalprice"])).quantize(
                    Decimal("0.01"), rounding=ROUND_HALF_UP
                )
                * 100
            ),
        )
        for r in load(spark, "orders", sf_smoke)
        .select("o_orderkey", "o_totalprice")
        .collect()
    ]
    t = extras.BOOT_THRESHOLDS
    sums = [[0, 0] for _ in range(extras.BOOT_B)]
    for key, cents in rows:
        for g in range(extras.BOOT_GROUPS):
            hx = hashlib.md5(
                f"{extras.BOOT_TAG}#{key}#{g}".encode()
            ).hexdigest()
            for k in range(extras.BOOT_DRAWS):
                h = int(hx[6 * k : 6 * k + 6], 16)
                w = 6
                for i, th in enumerate(t):
                    if h < th:
                        w = i
                        break
                rep = g * extras.BOOT_DRAWS + k
                sums[rep][0] += w
                sums[rep][1] += w * cents
    means = sorted(sx // max(sw, 1) for sw, sx in sums)
    lo = means[(25 * extras.BOOT_B + 999) // 1000 - 1]
    hi = means[(975 * extras.BOOT_B + 999) // 1000 - 1]
    full_mean = sum(c for _, c in rows) // len(rows)
    [row] = extras.metrics_bootstrap_ci(spark, sf_smoke).collect()
    assert row["n_orders"] == len(rows)
    assert row["mean_cents"] == full_mean
    assert row["n_replicas"] == extras.BOOT_B
    assert row["ci_lo_cents"] == lo
    assert row["ci_hi_cents"] == hi
    assert row["rep_min_cents"] == means[0]
    assert row["rep_max_cents"] == means[-1]
    assert means[0] <= lo < hi <= means[-1]


def test_ks_drift_python_recompute(spark, sf_smoke):
    """Exact KS numerator over common denominator n1*n2 recomputed in
    python (including the argmax value), proving the two-phase bucketed
    prefix sums equal the naive ECDF scan."""
    from datetime import datetime
    from decimal import Decimal, ROUND_HALF_UP
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        sampling,
    )

    cutoff = datetime.strptime(sampling.TEMPORAL_CUTOFF, "%Y-%m-%d")
    tr, te = [], []
    for r in (
        load(spark, "orders", sf_smoke)
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        cents = int(
            Decimal(str(r["o_totalprice"])).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            * 100
        )
        (tr if r["o_orderdate"] < cutoff else te).append(cents)
    n1, n2 = len(tr), len(te)
    values = sorted(set(tr) | set(te))
    c1 = c2 = 0
    from collections import Counter

    f1, f2 = Counter(tr), Counter(te)
    best, arg = -1, None
    for v in values:
        c1 += f1.get(v, 0)
        c2 += f2.get(v, 0)
        d = abs(c1 * n2 - c2 * n1)
        if d > best:
            best, arg = d, v
    [row] = sampling.stats_ks_drift(spark, sf_smoke).collect()
    assert row["n_train"] == n1 and row["n_test"] == n2
    assert row["n_distinct_values"] == len(values)
    assert row["d_ppm"] == best * 1000000 // (n1 * n2)
    assert row["argmax_cents"] == arg
    assert 0 < row["d_ppm"] < 1000000


def test_winnowing_python_recompute(spark, sf_smoke):
    """Winnowing fingerprint selection, pair overlap counts, and the
    containment ppm recomputed in python with hashlib; plus the
    winnowing guarantee on the fixture: every reported pair's shared
    fingerprints really exist in both docs' selected sets."""
    import hashlib

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, "documents", sf_smoke)
        .select("doc_id", "text")
        .collect()
    }
    fps: dict[int, set[int]] = {}
    for doc_id, text in docs.items():
        grams = _word_ngrams(text, dedup.WIN_K)
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:6], 16) for g in grams
        ]
        sel = set()
        last_full = max(len(hs) - dedup.WIN_W, 0)
        for i in range(0, last_full + 1):
            sel.add(min(hs[i : i + dedup.WIN_W]))
        fps[doc_id] = sel
    from collections import Counter

    dfreq = Counter(h for s in fps.values() for h in s)
    fps = {
        d: {h for h in s if dfreq[h] <= dedup.WIN_MAXDF}
        for d, s in fps.items()
    }
    expected = {}
    ids = sorted(fps)
    for i, a_id in enumerate(ids):
        for b_id in ids[i + 1 :]:
            shared = len(fps[a_id] & fps[b_id])
            if shared >= 2:
                expected[(a_id, b_id)] = (
                    shared,
                    len(fps[a_id]),
                    len(fps[b_id]),
                    shared
                    * 1000000
                    // min(len(fps[a_id]), len(fps[b_id])),
                )
    rows = dedup.dedup_winnowing(spark, sf_smoke).collect()
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_shared"],
            r["nfp_a"],
            r["nfp_b"],
            r["containment_ppm"],
        )
        for r in rows
    }
    assert got == expected
    assert len(got) > 0


def test_phash_dedup_python_recompute_and_recall(spark, sf_smoke):
    """The Arrow phash kernel recomputed in python, and the pigeonhole
    guarantee: the banded candidate pipeline must return EXACTLY the
    brute-force set of pairs within hamming PH_HAMMING (full recall at
    radius bands-1, and the verify step removes everything else)."""
    import hashlib
    from real_time_streaming_system_with_apache_kafka_spark.operators import (
        multimodal,
    )

    docs = {
        r["doc_id"]: r["text"].encode()
        for r in load(spark, "documents", sf_smoke)
        .select("doc_id", "text")
        .collect()
    }

    def phash(payload: bytes) -> int:
        """Naive per-gram reference for the vectorized 64-bit kernel
        (signed-int64 reinterpretation, matching the LongType column)."""
        n = len(payload)
        grams = (
            [payload] if n < 3 else [payload[i : i + 3] for i in range(n - 2)]
        )
        acc = [0] * 64
        for g in grams:
            v = int(hashlib.md5(g).hexdigest()[:16], 16)
            for b in range(64):
                acc[b] += 1 if (v >> b) & 1 else -1
        u = sum(1 << b for b in range(64) if acc[b] > 0)
        return u - (1 << 64) if u >= (1 << 63) else u

    ph = {d: phash(p) for d, p in docs.items()}
    ids = sorted(ph)
    expected = {}
    for i, a_id in enumerate(ids):
        for b_id in ids[i + 1 :]:
            d = bin((ph[a_id] ^ ph[b_id]) & ((1 << 64) - 1)).count("1")
            if d <= multimodal.PH_HAMMING:
                expected[(a_id, b_id)] = d
    rows = multimodal.mm_phash_dedup(spark, sf_smoke).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got == expected
    assert len(got) > 0
