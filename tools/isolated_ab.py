"""Isolated per-operator scale A/B (VERDICT r6 item 4 protocol).

Whole-suite soak numbers (tools/scale_soak.py) measure each query
inside a session under page-cache pressure and GC from 100+ other
queries — honest for suite cost, misleading for per-operator
asymptotics (r6: dedup_embedding_cosine 24.8 s in-session vs 6.05 s
isolated at the same scale). This tool measures the asymptotics
honestly: ONE query per fresh JVM, one untimed warm-up run (JVM +
scan + Python-worker spin-up), then best-of-N timed runs, with the
host steal fingerprint recorded per (query, scale) so a stolen
window can't masquerade as a plan regression.

Usage:
    python tools/isolated_ab.py [--queries a,b,c] [--reps 3] \
        [--out SOAK_r7_isolated.json]

Scales: /root/testdata/sf0.1 plus .scale/sf{1,10} (generate the
replicas first via tools/scale_soak.py). Emits per-query decade
ratios; the scale contract is last-decade ratio <= 5x for 10x data.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    # The three SOAK_r6 in-session 15-16x ratios that lacked committed
    # isolated evidence (VERDICT r6 item 4).
    "decontaminate_semantic",
    "basket_pair_lift",
    "mm_phash_dedup",
    # The quantizer re-spec of this round (VERDICT r6 item 2's done
    # criterion: isolated sf1->sf10 ratio <= 5x).
    "sim_ivf_kmeans_topk",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, @REPO@)
from real_time_streaming_system_with_apache_kafka_spark import registry
from real_time_streaming_system_with_apache_kafka_spark.session import get_session
from bench import _proc_stat, _steal_summary

name, sf_dir, reps = @NAME@, @SF_DIR@, @REPS@
spark = get_session("rtss_iso")
spark.sparkContext.setLogLevel("ERROR")
q = registry.all_queries()[name]
q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
best, runs = float("inf"), []
c0 = _proc_stat()
for _ in range(reps):
    t0 = time.monotonic()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    runs.append(round(dt, 3))
    best = min(best, dt)
print("RESULT " + json.dumps({
    "best_sec": round(best, 3),
    "runs_sec": runs,
    "host_noise": _steal_summary(c0, _proc_stat()),
}))
"""


def measure(name: str, sf_dir: str, reps: int) -> dict:
    code = (
        _CHILD.replace("@REPO@", repr(REPO))
        .replace("@NAME@", repr(name))
        .replace("@SF_DIR@", repr(sf_dir))
        .replace("@REPS@", str(reps))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{name} @ {sf_dir}: no RESULT line\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "SOAK_r7_isolated.json"))
    ap.add_argument(
        "--scales",
        default="0.1,1,10",
        help="comma list of scale factors; '0.1'-only runs the "
        "same-host A/B against a bench artifact without replicas",
    )
    args = ap.parse_args()
    all_scales = {
        "0.1": "/root/testdata/sf0.1",
        "1": os.path.join(REPO, ".scale", "sf1"),
        "10": os.path.join(REPO, ".scale", "sf10"),
    }
    tokens = [s.strip() for s in args.scales.split(",") if s.strip()]
    unknown = [s for s in tokens if s not in all_scales]
    if unknown or not tokens:
        raise SystemExit(
            f"--scales: unknown scale(s) {unknown or ['<empty>']}; "
            f"valid: {sorted(all_scales)} (comma-separated)"
        )
    scales = {s: all_scales[s] for s in tokens}
    for sf, d in scales.items():
        # Require the actual inputs the measured operators read — an
        # existing-but-empty or partially generated scale dir must fail
        # here, not mid-measurement.
        missing = [
            t
            for t in ("lineitem", "documents", "embeddings", "events")
            if not os.path.exists(os.path.join(d, f"{t}.parquet"))
        ]
        if missing:
            raise SystemExit(
                f"scale dir {d} missing tables {missing}; "
                "run tools/scale_soak.py first"
            )
    report: dict = {
        "metric": "isolated_per_operator_scale_ab",
        "protocol": (
            "one query per fresh JVM; 1 untimed warm-up; best-of-"
            f"{args.reps}; host steal recorded per cell"
        ),
        "queries": {},
    }
    for name in args.queries.split(","):
        name = name.strip()
        row: dict = {}
        for sf, d in scales.items():
            print(f"{name} @ sf{sf} ...", flush=True)
            row[f"sf{sf}"] = measure(name, d, args.reps)
            print(f"  -> {row[f'sf{sf}']}", flush=True)
        b = {sf: row[f"sf{sf}"]["best_sec"] for sf in scales}
        # Ratio fields are always present (null when a scale pair was
        # not measured) so the artifact schema is stable across
        # partial-scale runs.
        row["ratio_sf1_over_sf0.1"] = (
            round(b["1"] / b["0.1"], 2)
            if "1" in b and b.get("0.1")
            else None
        )
        row["ratio_sf10_over_sf1"] = (
            round(b["10"] / b["1"], 2) if "10" in b and b.get("1") else None
        )
        report["queries"][name] = row
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
