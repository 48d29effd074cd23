"""Generate the ADVERSARIAL testdata set used to harden the oracle gate.

Usage:
    python make_adversarial_testdata.py /tmp/sf_adversarial [--link-from DIR]
    python -c "import sys, verify_local; \
        verify_local.SF_DIR = '/tmp/sf_adversarial'; sys.argv = ['x']; \
        sys.exit(verify_local.main())"

Edge cases covered (each found at least one real issue when first run —
see SCALE.md round-2 lessons):
- documents: empty / whitespace-only / single-word / all-stopword /
  unicode (CJK + emoji) / huge (5000 words) / exact duplicates /
  planted PII / regex metacharacters / shouting
- events: constant-value series (zero variance everywhere), tiny series
  (below MIN_LEN), +1e2 offset series (conditioning stress within every
  oracle's fp64 headroom). Measured conditioning margins of the SQL
  formulations, for the record: the snippet coverage histogram's
  per-column argmin flips on ~1e-8 near-ties from offset ~1e3; the MP
  rolling-dot CTE loses r4 agreement from offset ~1e6. The MPX kernel
  itself is offset-robust (differentials) — pi picks stayed identical
  at 1e6 with value drift <= 5e-3; these are oracle-formulation limits,
  not engine limits.
- embeddings: all-zero vector (no direction), exact duplicate vector,
  underflow-tiny norms

Pure numpy + pyarrow (single-file parquet like the driver's testdata);
`--link-from` symlinks the TPC-H-ish tables the harness registers but
these queries never read.
"""

from __future__ import annotations

import argparse
import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--link-from", default="/root/testdata/sf0.001")
    p.add_argument("--probes", action="store_true",
                   help="kept for compatibility: the near-degenerate-band "
                        "probe series are now always included (the round-3 "
                        "engine-wide lowvar_threshold guard made all 72 "
                        "oracles green on them)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(99)

    # --- documents ---------------------------------------------------
    words = [f"w{i}" for i in range(30)]
    docs = [
        (0, "", "zh", "srcA", 0),
        (1, "   \t  ", "en", "srcA", 6),
        (2, "solo", "en", "srcA", 4),
        (3, "rep rep rep rep rep rep rep rep", "en", "srcA", 31),
        (4, "中文 文本 带有 空格 分词 测试 中文 文本", "zh", "srcB", 20),
        (5, "emoji 🙂 test 🙂 emoji mix", "en", "srcB", 22),
        (6, " ".join(rng.choice(words, 5000)), "en", "srcB", 30000),
        (7, "exact duplicate body here with several words", "en", "srcC", 44),
        (8, "exact duplicate body here with several words", "en", "srcC", 44),
        (9, "mail me a@b.co or 555-123-4567 at 1.2.3.4 ok", "en", "srcC", 44),
        (10, "the and of to is it in a an or", "en", "srcC", 30),
        (11, "UPPER CASE SHOUTY TEXT!!! ???", "en", "srcD", 29),
        (12, "tab\tand\nnewline  multiple   spaces", "en", "srcD", 34),
        (13, "dollar $ percent % brackets [x] (y) {z} backslash", "en", "srcD", 49),
    ]
    for i in range(14, 40):
        docs.append(
            (i, " ".join(rng.choice(words, int(rng.integers(5, 60)))), "en",
             f"src{i % 4}", 100)
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "lang": pa.array([d[2] for d in docs], pa.string()),
                "source": pa.array([d[3] for d in docs], pa.string()),
                "n_chars": pa.array([d[4] for d in docs], pa.int64()),
            }
        ),
        f"{args.out}/documents.parquet",
    )

    # --- events ------------------------------------------------------
    rows = {k: [] for k in ("event_id", "ts", "user_id", "event_type", "value", "props")}
    t0 = datetime.datetime(2024, 1, 1)
    eid = 0
    # The two PROBE series ("const_prefix": constant bootstrap half;
    # "nearconst": sd ~1e-9) stress the NEAR-DEGENERATE BAND where the
    # reference's own three low-variance guards disagree (mpx.cpp
    # exact-0 / stomp.R sqrt-eps / znorm 0.01). Since round 3 the engine
    # applies ONE scale-aware guard everywhere (stats.lowvar_threshold,
    # sd < 1e-7·(|mu|+1) → undefined) and the oracles filter with the
    # same rule, so the band is deterministic and these series are part
    # of the DEFAULT set (SCALE.md §8).
    # uid 8/9 form an mpdist pair (pairsel: even uid < 10 with uid+1)
    # where the k-th smallest lands on the no-pair SENTINEL: uid 9 is
    # 800 points of constant with one 14-point random-walk blip, so the
    # pair has ~34 defined profile positions but k = ceil(0.05·820) =
    # 41 — the kernel's sentinel-padded ranking must be mirrored by the
    # oracle. (The blip is a WALK, not an isolated spike: single-spike
    # windows z-normalize to the same shape regardless of spike value,
    # creating EXACT argmin ties that fp noise breaks differently per
    # engine — measured: pi(28) flipped 23↔33 with a 4-point spike.)
    # uid 10 ("const_suffix") has its TRAILING windows degenerate, so
    # any oracle that infers profile length as max(defined pos)+1
    # instead of n-w+1 diverges from the kernel.
    series = [(1, "normal"), (2, "const"), (3, "tiny"), (4, "normal"),
              (5, "offset1e2"), (6, "const_prefix"), (7, "nearconst"),
              (8, "normal20"), (9, "mostly_const"), (10, "const_suffix")]
    for uid, kind in series:
        n = {"normal": 60, "const": 40, "tiny": 5, "offset1e2": 60,
             "const_prefix": 80, "nearconst": 40, "normal20": 20,
             "mostly_const": 800, "const_suffix": 80}[kind]
        vals = rng.standard_normal(n).cumsum()
        if kind == "const":
            vals = np.full(n, 42.5)
        if kind == "offset1e2":
            vals = vals + 1e2
        if kind == "const_prefix":
            vals[: n // 2] = 42.5  # constant bootstrap half, varying tail
        if kind == "nearconst":
            vals = 42.5 + 1e-9 * rng.standard_normal(n)
        if kind == "mostly_const":
            blip = vals[30:44] - vals[30]
            vals = np.full(n, 42.5)
            vals[30:44] += blip  # 14-point walk blip in a constant sea
        if kind == "const_suffix":
            vals[n // 2 :] = 42.5  # varying half, constant TAIL
        for k, v in enumerate(vals):
            rows["event_id"].append(eid)
            rows["ts"].append(t0 + datetime.timedelta(minutes=k))
            rows["user_id"].append(uid)
            rows["event_type"].append("e")
            rows["value"].append(float(v))
            rows["props"].append(None)
            eid += 1
    # uid 11 "hot_bucket": 900 events crammed into ONE 6h bucket (triples
    # sharing the exact same second → time-tie storms for the MK total
    # order; every 3rd value repeats its predecessor → exact micro-unit
    # value ties for the tie corrections). Probes the bounded-bucket
    # contract on the exact pairwise statistics (theil_sen /
    # mann_kendall: 404k pairs here — hot but finite) and pins the grid
    # variants (theil_sen_grid / mann_kendall_grid) whose pair join must
    # stay <= C(12,2) regardless of this bucket's heat. The value series
    # is a continuous 2-decimal-step random WALK, NOT a periodic or
    # spike pattern: periodic values make every period-apart window
    # EXACTLY identical (zero-distance MP ties that argmin tie-breaks
    # resolve differently per engine — measured: 12 MP queries flipped
    # on a 5-value cycle), while a walk with isolated duplicate values
    # never produces affinely-equal windows.
    # dedicated generator: the probe must NOT consume the shared rng
    # stream — shifting it regenerates every downstream table (docs,
    # embeddings) with new draws, and sum-order-sensitive oracles (mmr's
    # greedy tie chain) are only guaranteed on the committed draws
    rng_hot = np.random.default_rng(1107)
    hv = 42.5
    for k in range(900):
        if k % 3 != 2:
            hv = hv + round(float(rng_hot.normal(0, 0.5)), 2)
        rows["event_id"].append(eid)
        rows["ts"].append(t0 + datetime.timedelta(seconds=36 * (k // 3)))
        rows["user_id"].append(11)
        rows["event_type"].append("e")
        rows["value"].append(round(hv, 2))
        rows["props"].append(None)
        eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(rows["event_id"], pa.int64()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
                "user_id": pa.array(rows["user_id"], pa.int64()),
                "event_type": pa.array(rows["event_type"], pa.string()),
                "value": pa.array(rows["value"], pa.float64()),
                "props": pa.array(rows["props"], pa.string()),
            }
        ),
        f"{args.out}/events.parquet",
    )

    # --- embeddings --------------------------------------------------
    emb = []
    for i in range(40):
        emb.append((i, [float(x) for x in rng.standard_normal(16)], int(i % 3)))
    emb.append((100, [0.0] * 16, 0))
    emb.append((101, list(emb[0][1]), 1))
    emb.append((102, [1e-20] * 16, 2))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([e[0] for e in emb], pa.int64()),
                "embedding": pa.array([e[1] for e in emb], pa.list_(pa.float32())),
                "label": pa.array([e[2] for e in emb], pa.int32()),
            }
        ),
        f"{args.out}/embeddings.parquet",
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        dst = f"{args.out}/{t}.parquet"
        if os.path.lexists(dst):  # lexists: also catches dangling symlinks
            os.unlink(dst)
        os.symlink(f"{args.link_from}/{t}.parquet", dst)
    print(f"adversarial testdata written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
