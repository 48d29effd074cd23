"""Measured shuffle growth for the two FLAGSHIP chains across a 100×
document span — `pipeline_e2e` (dedup → quality → decontaminate →
mixture → tokenize → pack) and `mp_packed_rollup` (tokenize → pack →
matrix profile → tier-1 rollup) — the VERDICT r3 'Next round' #6
done-criterion (SCALE.md §2/§4b measured rows).

Same protocol as bench_dedup_scale.py (whose helpers this reuses): run
the exact driver-registered query at sf0.01 (500 docs), sf0.1 (5 000)
and the deterministic 10×-replicated sf1x corpus (50 000), recording
status-store shuffle WRITE/READ bytes + records per leg. Both chains
are claimed ≈linear: every stage is a broadcast join, a combinable
groupBy, or the ONE exchange-reusing pack/rollup shuffle — if any stage
were pairwise the 1x/0.01 ratio would read ~10 000×, not ~100×.

The sf1x corpus salts every word per replica (word counts preserved, no
cross-replica shingle collisions), so true dedup/decontamination hits —
and the packed-token volume — grow exactly linearly with the input.
No external data: derived from the driver testdata only.

Run ALONE:  python bench_chain_scale.py   → BENCH_CHAIN_SCALE.json
"""

from __future__ import annotations

import json

from bench_dedup_scale import make_sf1x, run_op
from tsmp_spark.session import get_spark


def main() -> None:
    spark = get_spark(cpus=16, extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("WARN")
    sf1x_dir = make_sf1x(spark, "/root/testdata/sf0.1", "/tmp/sf1x")

    from tsmp_spark import queries as Q

    def mk(name, sf_dir):
        return lambda: Q.QUERIES[name](spark, sf_dir).count()

    results = []
    for sf, sf_dir in (
        ("0.01", "/root/testdata/sf0.01"),
        ("0.1", "/root/testdata/sf0.1"),
        ("1x", sf1x_dir),
    ):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name in ("pipeline_e2e", "mp_packed_rollup"):
            row = run_op(spark, name, mk(name, sf_dir))
            row.update({"sf": sf, "n_docs": n_docs})
            results.append(row)
            print(json.dumps(row))

    # growth factors per decade (bytes and records), chain by chain
    by = {(r["op"], r["sf"]): r for r in results}
    growth = {}
    for op in ("pipeline_e2e", "mp_packed_rollup"):
        g = {}
        for lo, hi, tag in (("0.01", "0.1", "x10_lo"), ("0.1", "1x", "x10_hi")):
            a, b = by[(op, lo)], by[(op, hi)]
            if a["shuffle_write_bytes"]:
                g[f"{tag}_write_bytes"] = round(
                    b["shuffle_write_bytes"] / a["shuffle_write_bytes"], 2
                )
            if a["shuffle_write_records"]:
                g[f"{tag}_write_records"] = round(
                    b["shuffle_write_records"] / a["shuffle_write_records"], 2
                )
        growth[op] = g
    out = {
        "metric": "flagship-chain shuffle growth across 100x docs",
        "protocol": "driver-registered queries, status-store stage totals, "
        "sf0.01/sf0.1/sf1x(10x replicated+salted)",
        "runs": results,
        "growth": growth,
    }
    with open("BENCH_CHAIN_SCALE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(growth))
    print("wrote BENCH_CHAIN_SCALE.json")


if __name__ == "__main__":
    main()
