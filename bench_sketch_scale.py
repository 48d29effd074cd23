"""Measured (not modeled) shuffle volume for the sketch / explode-merge
event-series family across the native 10× events scale-up (sf0.01 →
sf0.1) — the SCALE.md §2d bounded-merge claims as numbers.

Runs the driver-registered queries hll_distinct, hll_rerollup,
hll_sliding, cms_rerollup, decayed_topk and active_users at both SFs
and records per run the total shuffle write/read bytes and records from
Spark's status store (the bench_dedup_scale machinery, reused). The §2d
model says: the raw-row-keyed first stage grows ~linearly with events,
while every tier-merge / window-merge stage is bounded by
(buckets × sketch size) — so TOTAL shuffle should grow clearly
sub-linearly vs the 10× input whenever buckets don't grow 10×
(the events table spans the same 30 days at both SFs).

Run ALONE (concurrent Spark work pollutes the stage window):
    python bench_sketch_scale.py
writes BENCH_SKETCH_SCALE.json.
"""

from __future__ import annotations

import json

from bench_dedup_scale import run_op
from tsmp_spark.session import get_spark

OPS = (
    "hll_distinct",
    "hll_rerollup",
    "hll_sliding",
    "cms_rerollup",
    "decayed_topk",
    "active_users",
    # round-4 tier family: MG summaries are k-bounded per bucket, candles
    # one row per (key, bucket), state/heartbeat split rows bounded by
    # runs × spanned buckets — all merge stages bucket-bounded, so total
    # shuffle must grow sub-linearly vs the 10× raw rows (same 30-day span)
    "mg_heavy_hitters",
    "mg_rerollup",
    "ohlc",
    "ohlc_rerollup",
    "state_agg",
    "state_agg_rerollup",
    "heartbeat_uptime",
)


def main() -> int:
    spark = get_spark(cpus=16, extra_conf={"spark.ui.enabled": "true"})
    from tsmp_spark import queries as Q

    results: dict[str, list[dict]] = {}
    raw_rows: dict[str, int] = {}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        raw_rows[sf_dir] = ev.count()
        legs = []
        for name in OPS:
            legs.append(
                run_op(spark, name,
                       (lambda n: lambda: Q.QUERIES[n](spark, sf_dir).count())(name))
            )
        results[sf_dir] = legs
    summary = {}
    for name in OPS:
        lo = next(r for r in results["/root/testdata/sf0.01"] if r["op"] == name)
        hi = next(r for r in results["/root/testdata/sf0.1"] if r["op"] == name)
        ratio = (
            round(hi["shuffle_write_bytes"] / lo["shuffle_write_bytes"], 2)
            if lo["shuffle_write_bytes"]
            else None
        )
        summary[name] = {
            "write_bytes_sf001": lo["shuffle_write_bytes"],
            "write_bytes_sf01": hi["shuffle_write_bytes"],
            "growth_x_for_10x_rows": ratio,
        }
    out = {
        "protocol": "driver-registered queries at sf0.01 vs sf0.1 (native 10x "
                    "events, same 30-day span); stage-level shuffle totals from "
                    "the status store between stage watermarks",
        "events_rows": raw_rows,
        "legs": results,
        "summary": summary,
    }
    with open("BENCH_SKETCH_SCALE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
