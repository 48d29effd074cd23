"""Training-set assembly operators (operators/tokens.py + pii_scrub):
semantic invariants + physical-plan shape (the scale contract).

The load-bearing invariant is the north rule's token-array equality:
packing must preserve every source's concatenated token stream exactly,
for any shard count.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsmp_spark.operators import (
    pack_sequences,
    pii_scrub,
    source_mixture,
    token_entropy,
    token_vocab_stats,
    tokenize_documents,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    for i in range(60):
        n = int(rng.integers(0, 30))
        text = " ".join(rng.choice(words, size=n)) if n else ""
        rows.append((i, text, f"src{i % 3}"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def tok(spark, docs):
    return tokenize_documents(docs)


def test_tokenize_shape_and_determinism(tok, docs):
    rows = {r.doc_id: r for r in tok.collect()}
    assert len(rows) == 60
    for r in rows.values():
        assert r.n_tok == len(r.tokens)
        assert all(0 <= t < 32768 for t in r.tokens)
    # empty text -> empty array, not ['']-token
    texts = {r.doc_id: r.text for r in docs.collect()}
    for d, t in texts.items():
        if t == "":
            assert rows[d].tokens == []
    # identical word -> identical id across docs
    again = {r.doc_id: r.tokens for r in tokenize_documents(docs).collect()}
    assert all(again[d] == rows[d].tokens for d in again)


@pytest.mark.parametrize("shards", [1, 4])
@pytest.mark.parametrize("seq_len", [16, 64])
def test_pack_preserves_token_streams(tok, seq_len, shards):
    """Concatenating packed sequences per (source, shard) in seq_idx
    order reproduces the doc_id-ordered concatenation of the stream's
    docs exactly — token-array equality, the north-rule invariant."""
    packed = pack_sequences(tok, seq_len=seq_len, shards=shards).collect()
    toks = tok.collect()

    import hashlib

    def shard_of(doc_id):
        if shards == 1:
            return 0
        # reproduce xxhash64 via Spark itself would be circular; group by
        # observing the packed output keys instead
        return None

    # expected streams: for shards>1 derive each doc's shard from Spark
    if shards > 1:
        from pyspark.sql import functions as F

        m = (
            tok.select(
                "doc_id",
                F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(shards))
                .cast("int")
                .alias("shard"),
            )
            .collect()
        )
        shard_map = {r.doc_id: r.shard for r in m}
    else:
        shard_map = {r.doc_id: 0 for r in toks}

    exp: dict[tuple, list] = {}
    for r in sorted(toks, key=lambda r: r.doc_id):
        if r.n_tok > 0:
            exp.setdefault((r.source, shard_map[r.doc_id]), []).extend(r.tokens)

    got: dict[tuple, list] = {}
    for r in sorted(packed, key=lambda r: (r.source, r.shard, r.seq_idx)):
        got.setdefault((r.source, r.shard), []).extend(r.tokens)

    assert got == exp

    # fixed-length contract: every sequence except each stream's last is full
    by_stream: dict[tuple, list] = {}
    for r in packed:
        by_stream.setdefault((r.source, r.shard), []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: r.seq_idx)
        assert [r.seq_idx for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r.n_tok == seq_len
        assert 1 <= rows[-1].n_tok <= seq_len


def test_tokenize_append_eos(docs):
    tok = tokenize_documents(docs, append_eos=32768).collect()
    for r in tok:
        assert r.tokens[-1] == 32768
        assert r.tokens.count(32768) == 1  # word ids are % 32768 < eos
        assert r.n_tok == len(r.tokens) >= 1  # empty docs carry their EOS


def test_pack_spans_cover_sequences_exactly(docs):
    """doc_spans tile each packed sequence: contiguous, non-overlapping,
    in doc order, lengths summing to n_tok; re-slicing the packed tokens
    by spans reproduces each doc's piece stream."""
    tok = tokenize_documents(docs, append_eos=32768)
    packed = pack_sequences(tok, seq_len=32, with_spans=True).collect()
    toks = {r.doc_id: r.tokens for r in tok.collect()}
    got_doc_tokens: dict[int, list] = {}
    for r in packed:
        cursor = 0
        for sp in r.doc_spans:
            assert sp.pos == cursor
            assert sp.len >= 1
            cursor += sp.len
            got_doc_tokens.setdefault(sp.doc_id, []).append(
                (r.seq_idx, r.tokens[sp.pos : sp.pos + sp.len])
            )
        assert cursor == r.n_tok
        assert len(r.doc_spans) == r.n_docs
    for d, pieces in got_doc_tokens.items():
        pieces.sort(key=lambda p: p[0])
        flat = [t for _, piece in pieces for t in piece]
        assert flat == toks[d]
    assert set(got_doc_tokens) == {d for d, t in toks.items() if t}


def test_source_mixture_rates(docs):
    out = source_mixture(docs, {"src0": 3.0, "src1": 0.0}, default_rate=1.0).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    srcs = {r.doc_id: r.source for r in docs.collect()}
    n0 = n2 = 0
    for d, src in srcs.items():
        copies = by_doc.get(d, [])
        if src == "src0":
            assert len(copies) == 3  # integer rate -> exact copy count
            assert sorted(r.epoch for r in copies) == [0, 1, 2]
            n0 += 1
        elif src == "src1":
            assert copies == []  # rate 0 drops everything
        else:
            assert len(copies) == 1
            n2 += 1
    assert n0 > 0 and n2 > 0
    # deterministic: second run identical
    again = source_mixture(docs, {"src0": 3.0, "src1": 0.0}, default_rate=1.0).collect()
    assert sorted((r.doc_id, r.epoch) for r in again) == sorted(
        (r.doc_id, r.epoch) for r in out
    )


def test_source_mixture_fractional_rate_is_bernoulli(docs):
    out = source_mixture(docs, {}, default_rate=0.5).collect()
    kept = {r.doc_id for r in out}
    assert 0 < len(kept) < 60  # some kept, some dropped
    assert all(r.epoch == 0 for r in out)


def test_token_entropy_matches_numpy(tok):
    got = {r.doc_id: r for r in token_entropy(tok).collect()}
    for r in tok.collect():
        if r.n_tok == 0:
            assert r.doc_id not in got
            continue
        vals, counts = np.unique(np.array(r.tokens), return_counts=True)
        n = counts.sum()
        ent = math.log(n) - float((counts * np.log(counts)).sum()) / n
        g = got[r.doc_id]
        assert g.n_tok == n
        assert g.n_distinct == len(vals)
        assert abs(g.entropy - ent) < 1e-9
        assert abs(g.top_token_frac - counts.max() / n) < 1e-12


def test_token_vocab_stats(tok):
    stats = {r.token: r for r in token_vocab_stats(tok).collect()}
    flat: dict[int, int] = {}
    dfreq: dict[int, set] = {}
    for r in tok.collect():
        for t in r.tokens:
            flat[t] = flat.get(t, 0) + 1
            dfreq.setdefault(t, set()).add(r.doc_id)
    assert set(stats) == set(flat)
    for t, c in flat.items():
        assert stats[t].tf == c
        assert stats[t].df == len(dfreq[t])
    top = token_vocab_stats(tok, top_k=5).collect()
    assert len(top) == 5
    assert sorted(r.rank for r in top) == [1, 2, 3, 4, 5]
    best = max(flat.items(), key=lambda kv: (kv[1], -kv[0]))
    assert [r.token for r in top if r.rank == 1] == [best[0]]


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d-e@f.co plus 555-123-4567 at 10.0.0.1"),
            (2, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[1].n_email == 2
    assert out[1].n_phone == 1
    assert out[1].n_ipv4 == 1
    assert out[2].n_email == out[2].n_phone == out[2].n_ipv4 == 0
    assert out[2].clean_len == len("clean text with no pii at all")


# --- plan-shape (scale contract) -------------------------------------------


def test_tokenize_entropy_pii_pure_jvm(docs):
    """The per-row stages are expression-only: no Python, no Exchange."""
    for df in (
        tokenize_documents(docs),
        token_entropy(tokenize_documents(docs)),
        pii_scrub(docs),
    ):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "Exchange" not in plan


def test_pack_single_exchange(tok):
    """Packing shuffles exactly ONCE: the reassembly groupBy reuses the
    window cumsum's hashpartitioning(source, shard) (a subset of the
    grouping keys satisfies ClusteredDistribution) — token bytes cross
    the wire a single time, and never as a row-per-token explode."""
    plan = _plan(pack_sequences(tok, seq_len=64))
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 1
    assert "source" in keys[0]  # shard literal 0 is constant-folded away

    # sharded variant: the skew key joins the partitioning
    plan4 = _plan(pack_sequences(tok, seq_len=64, shards=4))
    keys4 = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan4)
    assert len(keys4) == 1
    assert "source" in keys4[0] and "shard" in keys4[0]


def test_vocab_partial_aggregation(tok):
    """Vocab stats partial-aggregate before the exchange (map-side
    combine) so the shuffle is vocab-bounded."""
    plan = _plan(token_vocab_stats(tok))
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan


def test_shared_substring_spans_planted(spark):
    """Planted shared runs are found maximal (not fragmented), disjoint
    docs produce nothing, and the gram-frequency cap suppresses
    boilerplate anchors."""
    from tsmp_spark.operators.dedup import shared_substring_spans

    shared = list(range(1000, 1030))  # 30-token verbatim run
    rows = [
        (1, list(range(10)) + shared + list(range(50, 60))),
        (2, list(range(100, 105)) + shared + list(range(200, 220))),
        (3, list(range(300, 340))),
        (4, list(range(400, 430))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = shared_substring_spans(df, min_len=8).collect()
    assert len(out) == 1
    sp = out[0]
    assert (sp.doc_a, sp.doc_b) == (1, 2)
    assert (sp.pos_a, sp.pos_b, sp.length) == (10, 5, 30)

    # boilerplate: the same run planted in EVERY doc exceeds a freq cap
    # low enough, so no spans survive
    rows_bp = [(i, shared + list(range(500 + 40 * i, 520 + 40 * i))) for i in range(6)]
    df_bp = spark.createDataFrame(rows_bp, "doc_id long, tokens array<int>")
    assert shared_substring_spans(df_bp, min_len=8, max_gram_freq=3).count() == 0
    assert shared_substring_spans(df_bp, min_len=8, max_gram_freq=100).count() == 15

    plan = _plan(shared_substring_spans(df, min_len=8))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_source_divergence_detects_drift(spark):
    """A source matching the corpus blend has near-zero KL; a drifted
    source (disjoint vocabulary) has large KL; values match numpy."""
    from tsmp_spark.operators.tokens import source_token_divergence

    rows = []
    for i in range(20):  # two sources drawing the same ids -> KL ~ 0
        rows.append((i, [j % 10 for j in range(i, i + 30)], "blend_a"))
        rows.append((100 + i, [j % 10 for j in range(i, i + 30)], "blend_b"))
    for i in range(5):  # drifted source: disjoint id range
        rows.append((200 + i, [500 + (j % 7) for j in range(30)], "drift"))
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>, source string")
    out = {r.source: r for r in source_token_divergence(df).collect()}

    import collections

    src_counts: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    corpus: collections.Counter = collections.Counter()
    for _, toks, src in rows:
        src_counts[src].update(toks)
        corpus.update(toks)
    n_all = sum(corpus.values())
    for src, cnt in src_counts.items():
        n_src = sum(cnt.values())
        kl = sum(
            (c / n_src) * math.log((c / n_src) / (corpus[t] / n_all))
            for t, c in cnt.items()
        )
        assert abs(out[src].kl_vs_corpus - kl) < 1e-9
        assert out[src].n_tok == n_src
        assert out[src].n_distinct == len(cnt)
    assert out["drift"].kl_vs_corpus > 1.0
    assert out["blend_a"].kl_vs_corpus < 0.2


def test_remove_substring_spans_rewrites_victim_only(spark):
    """The duplicate run disappears from the HIGHER doc_id only; docs
    without spans pass through untouched (including empty ones)."""
    from tsmp_spark.operators.dedup import (
        remove_substring_spans,
        shared_substring_spans,
    )

    shared = list(range(1000, 1020))
    rows = [
        (1, list(range(10)) + shared),
        (2, shared + list(range(200, 215))),
        (3, list(range(300, 330))),
        (4, []),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    spans = shared_substring_spans(df, min_len=8)
    out = {r.doc_id: r for r in remove_substring_spans(df, spans).collect()}
    assert out[1].tokens == rows[0][1] and out[1].n_removed == 0  # keeper intact
    assert out[2].tokens == list(range(200, 215))  # run cut from victim
    assert out[2].n_removed == 20
    assert out[3].tokens == rows[2][1] and out[3].n_removed == 0
    assert out[4].tokens == [] and out[4].n_removed == 0


def test_pack_partition_invariant(spark, tok):
    """Identical packed output regardless of input partitioning —
    retries and speculative tasks cannot change a sequence boundary
    (determinism is semantic, not physical)."""
    outs = []
    for parts in (1, 3, 13):
        rows = (
            pack_sequences(tok.repartition(parts), seq_len=32, shards=4)
            .collect()
        )
        outs.append(
            sorted((r.source, r.shard, r.seq_idx, tuple(r.tokens)) for r in rows)
        )
    assert outs[0] == outs[1] == outs[2]


def test_token_pmi_matches_python(spark):
    """PMI of adjacent pairs matches a direct python computation; the
    planted collocation ranks first."""
    from tsmp_spark.operators.tokens import token_pmi_bigrams

    rng = np.random.default_rng(3)
    rows = []
    for i in range(30):
        toks = [int(x) for x in rng.integers(0, 50, 40)]
        for j in range(0, 40, 8):
            toks[j : j + 2] = [777, 888]  # planted collocation
        rows.append((i, toks))
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = token_pmi_bigrams(df, min_count=3).collect()

    import collections

    uni: collections.Counter = collections.Counter()
    bg: collections.Counter = collections.Counter()
    n2 = 0
    for _, toks in rows:
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
        n2 += len(toks) - 1
    n1 = sum(uni.values())
    got = {(r.a, r.b): r for r in out}
    assert set(got) == {p for p, c in bg.items() if c >= 3}
    for (a, b), r in got.items():
        exp = math.log((bg[(a, b)] / n2) / ((uni[a] / n1) * (uni[b] / n1)))
        assert abs(r.pmi - exp) < 1e-9
        assert r.c_ab == bg[(a, b)]
    # the planted collocation: maximal count and strongly positive PMI
    # (PMI itself favors RARE chance pairs — rank-1 is not guaranteed)
    planted = got[(777, 888)]
    assert planted.c_ab == max(r.c_ab for r in out)
    assert planted.pmi > 1.0
    topk = token_pmi_bigrams(df, min_count=3, top_k=5).collect()
    assert sorted(r.rank for r in topk) == [1, 2, 3, 4, 5]


def test_curate_facade(spark):
    """curate() composes the pipeline: dup dropped, junk dropped,
    benchmark-contaminated dropped, survivors packed with spans."""
    from tsmp_spark.operators.tokens import curate

    good = "the cat and the dog walk to the park in the morning light."
    rows = [
        (1, good + " one fine day indeed", "a"),
        (2, good + " one fine day indeed", "a"),  # exact dup of 1
        (3, "zzz qqq xxx", "a"),  # junk: too short / no stopwords
        (4, good + " totally unique phrasing here of it", "b"),
        (5, "the bench set phrase is exactly this one of it and more padding words", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(100, "the bench set phrase is exactly this one")],
        "bench_id long, text string",
    )
    packed = curate(
        docs, benchmark=bench, decontam_n=6, seq_len=16, with_spans=True
    ).collect()
    seen_docs = {sp.doc_id for r in packed for sp in r.doc_spans}
    assert seen_docs == {1, 4}  # 2 deduped, 3 junk, 5 contaminated
    # one EOS separator per surviving doc, somewhere in the packed stream
    assert sum(r.tokens.count(32768) for r in packed) == 2
    # fixed-length contract per stream
    by_stream: dict = {}
    for r in packed:
        by_stream.setdefault((r.source, r.shard), []).append(r)
    for rs in by_stream.values():
        rs.sort(key=lambda r: r.seq_idx)
        assert all(r.n_tok == 16 for r in rs[:-1])


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs sharing the target domain's vocabulary get higher importance
    weights than off-domain docs; weights are deterministic."""
    from tsmp_spark.operators.text import dsir_weights

    med = [
        (i, "patient dose trial clinical symptom therapy " * 5, "m")
        for i in range(10)
    ]
    web = [
        (100 + i, "click here buy now free shipping deal offer " * 5, "w")
        for i in range(10)
    ]
    mixed = [(200, "patient therapy trial and some filler words", "x"),
             (201, "buy now free deal and some filler words", "x")]
    docs = spark.createDataFrame(
        med + web + mixed, "doc_id long, text string, source string"
    )
    target = docs.filter(F.col("source") == "m")  # medical is the target
    w = {r.doc_id: r.logw for r in dsir_weights(docs, target).collect()}
    assert w[200] > w[201]  # target-like doc outranks off-domain doc
    assert min(w[i] for i in range(10)) > max(w[100 + i] for i in range(10))
    again = {r.doc_id: r.logw for r in dsir_weights(docs, target).collect()}
    assert again == w


def test_lm_perplexity_flags_junk(spark):
    """Docs of corpus-typical text score low perplexity; a doc of
    never-repeated junk ids scores high; values are deterministic."""
    from tsmp_spark.operators.tokens import lm_perplexity

    rng = np.random.default_rng(5)
    rows = []
    for i in range(30):  # fluent corpus: small vocab, common bigrams
        rows.append((i, [int(x) for x in rng.integers(0, 20, 50)]))
    rows.append((99, [int(x) for x in rng.integers(20000, 30000, 50)]))  # junk
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = {r.doc_id: r for r in lm_perplexity(df).collect()}
    fluent_max = max(out[i].ppl for i in range(30))
    assert out[99].ppl > 5 * fluent_max
    for r in out.values():
        assert r.n_scored == 50
        assert abs(math.exp(r.nll) - r.ppl) < 1e-6 * r.ppl
    again = {r.doc_id: r.ppl for r in lm_perplexity(df).collect()}
    assert again == {d: r.ppl for d, r in out.items()}


def test_kn_perplexity_hand_model(spark):
    """kn_perplexity matches a doc-by-doc pure-Python Kneser–Ney replay
    (d=3/4 integer-rational form) on a tiny corpus, and the KN property
    holds: a word seen in many distinct contexts backs off higher than
    an equally-frequent word welded to one context."""
    from tsmp_spark.operators.tokens import kn_perplexity

    docs = {
        0: [1, 2, 3, 1, 2],
        1: [2, 3, 4, 2, 3],
        2: [5, 1, 2, 5, 4],
        3: [7],  # single token: unigram-only leg
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, tokens array<int>"
    )
    out = {r.doc_id: r for r in kn_perplexity(df).collect()}

    from collections import Counter

    bi = Counter()
    for t in docs.values():
        for a, b in zip(t, t[1:]):
            bi[(a, b)] += 1
    B = len(bi)
    cctx, n1p, ncw = Counter(), Counter(), Counter()
    for (a, b), c in bi.items():
        cctx[a] += c
        n1p[a] += 1
        ncw[b] += 1
    for d, t in docs.items():
        nlls = [math.log(B + 32768) - math.log(ncw[t[0]] + 1)]
        for a, b in zip(t, t[1:]):
            num = max(4 * bi[(a, b)] - 3, 0) * B + 3 * n1p[a] * ncw[b]
            den = 4 * cctx[a] * B
            nlls.append(math.log(den) - math.log(num))
        assert out[d].n_scored == len(t)
        assert abs(out[d].nll - round(sum(nlls) / len(nlls), 4)) <= 1e-4
    # KN property: "francisco" (always after "san") vs "the" (many
    # contexts), equal unigram frequency — first-token backoff must
    # prefer the many-context word.
    san, fran, the = 100, 101, 102
    rows = [(i, [san, fran]) for i in range(8)]
    rows += [(10 + i, [i + 50, the]) for i in range(8)]
    rows += [(30, [fran]), (31, [the])]
    df2 = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    o2 = {r.doc_id: r.nll for r in kn_perplexity(df2).collect()}
    assert o2[31] < o2[30]


def test_training_order_per_epoch_shuffle(spark, tok):
    """Each epoch gives a different deterministic global order; the same
    epoch always gives the same order; keys are unique."""
    from tsmp_spark.operators.tokens import training_order

    packed = pack_sequences(tok, seq_len=32)
    e0 = [(r.source, r.seq_idx, r.order_key) for r in training_order(packed, 0).collect()]
    e0b = [(r.source, r.seq_idx, r.order_key) for r in training_order(packed, 0).collect()]
    e1 = {(r.source, r.seq_idx): r.order_key for r in training_order(packed, 1).collect()}
    assert sorted(e0) == sorted(e0b)
    keys0 = [k for _, _, k in e0]
    assert len(set(keys0)) == len(keys0)  # unique
    order0 = [sq for sq in sorted(e0, key=lambda t: t[2])]
    order1 = sorted(e1.items(), key=lambda kv: kv[1])
    assert [t[:2] for t in order0] != [k for k, _ in order1]  # epochs differ


def test_shard_blobs_rejects_non_contiguous(spark, tok):
    """The shard codec's (base, lengths) index can only represent
    contiguous seq ranges — a filtered subset must fail loudly, not
    silently relabel sequences after the gap."""
    from tsmp_spark.operators import shard_blobs, unshard_blobs

    packed = pack_sequences(tok, seq_len=16)
    # drop a mid-stream sequence of some stream that has >= 3 sequences
    counts = {}
    for r in packed.collect():
        counts[(r.source, r.shard)] = max(counts.get((r.source, r.shard), 0), r.seq_idx)
    victim = next(k for k, m in counts.items() if m >= 2)
    holed = packed.filter(
        ~((F.col("source") == victim[0]) & (F.col("seq_idx") == 1))
    )
    with pytest.raises(Exception, match="not contiguous"):
        unshard_blobs(shard_blobs(holed)).count()


def test_chunk_documents_coverage_and_overlap(spark, tok):
    """Chunks tile each doc: with stride == chunk_len they partition the
    token stream exactly; with stride < chunk_len consecutive chunks
    overlap by chunk_len - stride; docs never mix."""
    from tsmp_spark.operators.tokens import chunk_documents

    toks = {r.doc_id: r.tokens for r in tok.collect() if r.n_tok > 0}
    disjoint = chunk_documents(tok, chunk_len=8).collect()
    by_doc: dict = {}
    for r in disjoint:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        flat = [t for r in rows for t in r.tokens]
        assert flat == toks[d]
    assert set(by_doc) == set(toks)

    over = chunk_documents(tok, chunk_len=8, stride=5).collect()
    by_doc2: dict = {}
    for r in over:
        by_doc2.setdefault(r.doc_id, []).append(r)
    for d, rows in by_doc2.items():
        rows.sort(key=lambda r: r.chunk_idx)
        for r in rows:
            assert r.tokens == toks[d][r.chunk_start : r.chunk_start + 8]
        # full coverage: last chunk reaches the end of the doc
        last = rows[-1]
        assert last.chunk_start + last.n_tok == len(toks[d])


# --- C4 line filters + BM25 retrieval ---------------------------------------


def test_c4_line_filters_rules(spark):
    from tsmp_spark.operators import c4_line_filters

    pages = spark.createDataFrame(
        [
            # 3 good lines -> kept doc
            (1, "one two three four five.\nsix seven eight nine ten!\nalpha beta gamma delta eps?"),
            # line 2 lacks terminal punct, line 3 too short -> 1 kept < 3
            (2, "one two three four five.\nsix seven eight nine ten\ntoo short."),
            # javascript line dropped; lorem ipsum in a surviving line kills the doc
            (3, "good lorem ipsum line here stays.\nenable javascript to view this.\na b c d e.\nx y z w v."),
            # code page: brace in a kept line
            (4, "int main obviously code line {.\none two three four five.\nsix seven eight nine ten."),
            # blocklist word (word-boundary: 'badwordish' must NOT trip it)
            (5, "this line has badword in it.\none two three four five.\nsix seven eight nine ten."),
            (6, "badwordish is fine actually here.\none two three four five.\nsix seven eight nine ten."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_line_filters(pages).collect()}
    assert out[1].keep and out[1].n_kept == 3
    assert not out[2].keep and out[2].n_kept == 1
    assert not out[3].keep and out[3].n_kept == 3  # js line gone, lorem kills doc
    assert not out[4].keep
    assert not out[5].keep
    assert out[6].keep and out[6].n_kept == 3
    # the cleaned text drops exactly the failing lines
    assert "javascript" not in out[3].clean_text
    assert out[2].clean_text == "one two three four five."


def test_c4_line_filters_pure_jvm_zero_exchange(docs):
    from tsmp_spark.operators import c4_line_filters

    plan = _plan(c4_line_filters(docs, min_kept_lines=1))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_gopher_quality_rules(spark):
    from tsmp_spark.operators import gopher_quality_filters

    good = " ".join(["alpha beta gamma delta epsilon zeta the of"] * 8)  # 64 words
    docs = spark.createDataFrame(
        [
            (1, good),  # all rules pass
            (2, "the of short"),  # < min_words
            (3, good + " " + " ".join(["w"] * 200)),  # > max_words
            (4, good + "\n" + "\n".join(f"- b{i}" for i in range(80))),  # bullets
            (5, good + "\nhm...\nuh...\nso...\nand...\nwell..."),  # ellipsis ends
            (6, good + " " + " ".join(["##"] * 10)),  # symbol spam
            (7, good + " " + " ".join(["123"] * 40)),  # non-alpha words
            (8, " ".join(["alpha beta gamma delta epsilon zeta eta iota"] * 8)),  # no stopwords
            (9, good + " " + "x" * 900),  # mega-word: mean len > 10
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_filters(docs, min_words=40, max_words=150).collect()}
    assert out[1].keep == 1 and out[1].n_words == 64 and out[1].n_stop == 2
    assert out[2].keep == 0  # word count below floor
    assert out[3].keep == 0 and out[3].n_words == 264  # above ceiling
    assert out[4].keep == 0 and out[4].n_bullet == 80 and out[4].n_lines == 81
    assert out[5].keep == 0 and out[5].n_ellipsis == 5
    assert out[6].keep == 0 and out[6].n_sym == 20
    assert out[7].keep == 0 and out[7].n_alpha == 64  # 64/104 < 80%
    assert out[8].keep == 0 and out[8].n_stop == 0
    assert out[9].keep == 0 and out[9].n_chars > 10 * out[9].n_words


def test_gopher_quality_pure_jvm_zero_exchange(docs):
    from tsmp_spark.operators import gopher_quality_filters

    plan = _plan(gopher_quality_filters(docs))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan


def _bm25_python(corpus, queries, k1=1.2, b=0.75):
    """Independent BM25 reference (Lucene idf form)."""
    toks = {d: t.lower().strip().split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for qid, qtext in queries:
        terms = sorted(set(qtext.lower().split()))
        for d, t in toks.items():
            s = 0.0
            for term in terms:
                tf = t.count(term)
                if tf == 0:
                    continue
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if s > 0:
                scores[(qid, d)] = s
    return scores


def test_bm25_topk_matches_python_reference(spark):
    from tsmp_spark.operators import bm25_topk

    corpus = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick quick quick fox"),
        (3, "a lazy dog sleeps all day long in the sun"),
        (4, "nothing relevant whatsoever appears here"),
        (5, "fox dog fox dog fox dog"),
    ]
    queries = [(0, "quick fox"), (1, "lazy dog")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    q = spark.createDataFrame(queries, "query_id long, query_text string")
    got = bm25_topk(docs, q, k=3).collect()
    ref = _bm25_python(corpus, queries)
    for r in got:
        assert abs(r.bm25 - ref[(r.query_id, r.doc_id)]) < 1e-3
    # ranks agree with the reference ordering (rounded score desc, doc asc)
    for qid in (0, 1):
        exp = sorted(
            ((d, s) for (q_, d), s in ref.items() if q_ == qid),
            key=lambda ds: (-round(ds[1], 4), ds[0]),
        )[:3]
        assert [r.doc_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid] == [
            d for d, _ in exp
        ]


def test_bm25_broadcasts_queries_no_python(spark, docs):
    from tsmp_spark.operators import bm25_topk

    q = spark.createDataFrame([(0, "w1 w2"), (1, "w3")], "query_id long, query_text string")
    plan = _plan(bm25_topk(docs, q, k=5))
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    # the ONLY nested-loop is the 1-row corpus-stats scalar broadcast
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


# --- paragraph dedup + random projection ------------------------------------


def test_paragraph_dedup_first_occurrence_wins(spark):
    from tsmp_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one here.\nShared Boilerplate  text.\n\nkeep me too."),
            # same boilerplate modulo case/whitespace -> cut from doc 2
            (2, "shared boilerplate text.\nanother unique paragraph."),
            # doc that is ENTIRELY duplicates of earlier paragraphs
            (3, "unique one here.\nkeep me too."),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].n_paras == 3 and out[1].n_kept == 3  # blank line dropped outright
    assert out[2].n_kept == 1 and out[2].clean_text == "another unique paragraph."
    assert out[3].n_kept == 0 and out[3].clean_text == ""
    assert out[4].n_paras == 0 and out[4].clean_text == ""
    # original bytes survive for the first occurrence (not the normalized form)
    assert "Shared Boilerplate  text." in out[1].clean_text


def test_paragraph_dedup_no_python(spark, docs):
    from tsmp_spark.operators.dedup import paragraph_dedup

    plan = _plan(paragraph_dedup(docs))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_random_projection_linear_deterministic(spark):
    from tsmp_spark.operators.similarity import random_projection

    vecs = [
        (0, [1.0, 2.0, -3.0, 0.5]),
        (1, [1.0, 2.0, -3.0, 0.5]),  # identical vector -> identical projection
        (2, [2.0, 4.0, -6.0, 1.0]),  # 2x vector -> 2x projection (mod rounding)
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.projection for r in random_projection(df, out_dim=8).collect()}
    assert len(out[0]) == 8
    assert out[0] == out[1]
    for a, b in zip(out[0], out[2]):
        assert abs(b - 2 * a) < 1e-5
    assert all(x == 0.0 for x in out[3])
    # -0.0 is normalized away (cross-engine hash convention)
    import math as _m

    assert all(not (x == 0.0 and _m.copysign(1.0, x) < 0) for r in out.values() for x in r)
    # empty vector -> NULL projection (sequence(0,-1) would null-pad)
    e = spark.createDataFrame([(9, [])], "vec_id long, embedding array<double>")
    assert random_projection(e, out_dim=4).collect()[0].projection is None


def test_random_projection_pure_jvm_zero_exchange(spark):
    from tsmp_spark.operators.similarity import random_projection

    df = spark.createDataFrame([(0, [1.0] * 16)], "vec_id long, embedding array<double>")
    plan = _plan(random_projection(df, out_dim=4))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_duplication_rate_semantics(spark):
    from tsmp_spark.operators.dedup import duplication_rate
    from tsmp_spark.operators.cache import release_caches

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # shares nothing
            (2, "the same exact sentence here"),
            (3, "the same exact sentence here"), # full duplicate of 2
            (4, "prefix words then the same exact sentence here"),
            (5, ""),                              # blank: no shingles
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplication_rate(docs, n=3).collect()}
    release_caches()
    assert out[1].dup_rate == 0.0 and out[1].n_shingles == 2
    assert out[2].dup_rate == 1.0 and out[3].dup_rate == 1.0
    assert 0.0 < out[4].dup_rate < 1.0  # tail shingles shared, prefix novel
    assert out[5].n_shingles == 0 and out[5].dup_rate is None


def test_bpe_learn_matches_reference_greedy(spark):
    """bpe_learn == a pure-python Sennrich BPE on word frequencies,
    including LEFT-GREEDY self-pair overlap ('aaaa' under (a,a) ->
    aa+aa, the run-parity case)."""
    import re
    from collections import Counter

    from tsmp_spark.operators.tokens import bpe_learn

    texts = [
        "the cat sat on the mat", "the hat of the cat", "that that mat",
        "aaaa aaa baaab", "low lower lowest", "new newer newest",
    ] * 3
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r.merge_round, r.left_sym, r.right_sym, r.pair_count)
           for r in bpe_learn(df, n_merges=6, max_words=100).collect()]

    wc = Counter()
    for _, t in docs:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if re.fullmatch(r"[a-z]+", w):
                wc[w] += 1
    words = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rnd in range(1, 7):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    assert got == merges
    # guaranteed self-pair first pick: 'aaaa' -> (a,a) wins round 1 and
    # left-greedy must take positions 0 and 2 (parity), yielding aa+aa,
    # so round 2's top count for (aa,aa) is 1 per word, not 2
    solo = [(r.merge_round, r.left_sym, r.right_sym, r.pair_count)
            for r in bpe_learn(
                spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string"),
                n_merges=2, max_words=10).collect()]
    assert solo[0] == (1, "a", "a", 6)  # freq-2 word, 3 adjacent (a,a)
    assert solo[1] == (2, "aa", "</w>", 2)  # '</w>' < 'aa' breaks the tie
    # empty corpus -> empty merge table with the right schema
    empty = bpe_learn(
        spark.createDataFrame([(1, "12345 !!!")], "doc_id long, text string"),
        n_merges=3,
    )
    assert empty.count() == 0
    assert empty.columns == ["merge_round", "left_sym", "right_sym", "pair_count"]


def test_bpe_encode_matches_reference_apply(spark):
    """bpe_encode == pure-python train-on-head/apply-to-all: merges
    selected from the top-max_words subset, applied (rank order,
    left-greedy) to EVERY distinct word, then token counts."""
    import re
    from collections import Counter

    from tsmp_spark.operators.tokens import bpe_encode

    texts = [
        "the cat sat on the mat", "the hat of the cat", "that that mat",
        "aaaa aaa baaab", "low lower lowest", "rare uniqueword here",
    ] * 2
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    max_words, n_merges, top_k = 6, 5, 15
    got = [(r.rank, r.token, r.cnt)
           for r in bpe_encode(
               df, n_merges=n_merges, max_words=max_words, top_k=top_k
           ).orderBy("rank").collect()]

    wc = Counter()
    for _, t in docs:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if re.fullmatch(r"[a-z]+", w):
                wc[w] += 1
    train = set(w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words])
    words = {w: list(w) + ["</w>"] for w in wc}
    for _ in range(n_merges):
        pc = Counter()
        for w in train:
            syms = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    tc = Counter()
    for w, syms in words.items():
        for s in syms:
            tc[s] += wc[w]
    want = [(r + 1, t, c) for r, (t, c) in enumerate(
        sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k])]
    assert got == want


def test_temperature_sample_rebalances_sources(spark):
    from tsmp_spark.operators.tokens import temperature_sample

    # head source 1600 docs, tail source 100: at T=2 the tail keeps
    # (nearly) everything while the head is cut toward sqrt parity
    rows = [(i, "head") for i in range(1600)] + \
           [(10000 + i, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, sample_frac=0.5).collect()
    assert len(out) == 1700  # audit view: every doc, flagged
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # derived rates: W = 40+10, M = 850; head quota 850*40/50 = 680
    # -> r_head = 680/1600 = 0.425; tail quota 170 > 100 -> r_tail = 1
    assert by_src["tail"][0].r_int == 1_000_000
    assert by_src["head"][0].r_int == 425_000
    assert all(r.kept == 1 for r in by_src["tail"])
    kept_head = sum(r.kept for r in by_src["head"])
    assert 0.35 * 1600 < kept_head < 0.50 * 1600  # md5-uniform ≈ rate
    # deterministic: same input -> identical flags
    again = {r.doc_id: r.kept for r in
             temperature_sample(df, sample_frac=0.5).collect()}
    assert all(again[r.doc_id] == r.kept for r in out)


def test_weighted_sample_bias_and_determinism(spark):
    from tsmp_spark.operators.tokens import weighted_sample_topk

    # 500 light docs (w=1) vs 500 heavy docs (w=100): the heavy half
    # should dominate a k=100 sample overwhelmingly
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = weighted_sample_topk(df, k=100, weight_expr="n_tok").collect()
    assert len(out) == 100
    heavy = sum(1 for r in out if r.doc_id >= 1000)
    assert heavy > 85
    # deterministic: identical rerun
    again = weighted_sample_topk(df, k=100, weight_expr="n_tok").collect()
    assert {(r.doc_id, r.rank) for r in again} == {(r.doc_id, r.rank) for r in out}
    # zero/negative weights excluded
    z = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_tok long")
    zz = weighted_sample_topk(z, k=10, weight_expr="n_tok").collect()
    assert [r.doc_id for r in zz] == [2]


def test_dataset_split_stable_under_growth(spark):
    import pytest as _pt
    from tsmp_spark.operators.tokens import dataset_split

    small = spark.createDataFrame([(i, "s") for i in range(500)],
                                  "doc_id long, source string")
    big = spark.createDataFrame([(i, "s") for i in range(2000)],
                                "doc_id long, source string")
    s_small = {r.doc_id: r.split for r in dataset_split(small).collect()}
    s_big = {r.doc_id: r.split for r in dataset_split(big).collect()}
    # growth stability: every original doc keeps its split
    assert all(s_big[d] == s for d, s in s_small.items())
    # proportions roughly 80/10/10 on the bigger corpus
    from collections import Counter
    c = Counter(s_big.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["val"] / 2000 - 0.1) < 0.04
    assert abs(c["test"] / 2000 - 0.1) < 0.04
    with _pt.raises(ValueError):
        dataset_split(small, train_permille=950, val_permille=100)


def test_zipf_heaps_loglog_fits(spark):
    """Corpus-law fits: (1) the shared log-log OLS recovers an exact
    power law (slope, intercept, r2=1); (2) zipf_fit on a corpus built
    with tf = floor(1000/rank) recovers slope ~ -1 with deterministic
    ranks; (3) heaps_fit is scale-monotone sane (0 < beta <= 1 on a
    growing corpus) and degenerate-safe (constant vocab -> r2 NULL,
    slope 0)."""
    import pyspark.sql.functions as F
    from tsmp_spark.operators.tokens import _loglog_ols, heaps_fit, zipf_fit

    # (1) exact power law y = 7 * x^0.5 on integer grid points
    pts = spark.createDataFrame(
        [(int(x), int(round(7 * x ** 0.5)))
         for x in (10**6, 4 * 10**6, 9 * 10**6, 16 * 10**6, 25 * 10**6)],
        "xv long, yv long")
    r = _loglog_ols(pts, "xv", "yv").collect()[0]
    assert abs(r.slope - 0.5) < 1e-3 and r.r2 > 0.9999
    assert abs(r.intercept - __import__("math").log(7.0)) < 1e-2

    # (2) zipf: token t in 1..50 appears floor(1000/t) times
    toks = []
    for t in range(1, 51):
        toks.extend([t] * (1000 // t))
    docs = spark.createDataFrame(
        [(i, toks[i::10]) for i in range(10)], "doc_id long, tokens array<int>")
    z = zipf_fit(docs).collect()[0]
    assert z.n_points == 50
    assert abs(z.slope + 1.0) < 0.05 and z.r2 > 0.98

    # (3) heaps: fresh vocab per doc -> beta ~ 1; constant vocab -> flat
    fresh = spark.createDataFrame(
        [(i, list(range(100 * i, 100 * (i + 1)))) for i in range(64)],
        "doc_id long, tokens array<int>")
    h = heaps_fit(fresh, bucket=4).collect()[0]
    assert abs(h.slope - 1.0) < 1e-6 and h.r2 > 0.999999
    flat = spark.createDataFrame(
        [(i, [1, 2, 3]) for i in range(64)], "doc_id long, tokens array<int>")
    hf = heaps_fit(flat, bucket=4).collect()[0]
    assert hf.slope == 0.0 and hf.r2 is None


def test_winnow_fingerprints_brute_force_and_guarantee(spark):
    """Winnowing contracts: (1) the lag/lead interval selection equals
    brute-force rightmost-min winnowing of the same md5 gram hashes on
    every doc (tie-heavy docs included — tiny vocab forces equal
    hashes); (2) the MOSS guarantee: two docs sharing a run of
    >= window+n-1 words share at least one fingerprint; (3) short docs
    (< window grams) emit exactly their rightmost global min."""
    import hashlib
    import random

    from tsmp_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    N, W = 5, 4
    rng = random.Random(13)
    vocab = ["aa", "bb", "cc"]                      # tiny -> many gram ties
    shared = " ".join(rng.choice(vocab + ["dd", "ee"]) for _ in range(12))
    docs = []
    for d in range(40):
        nw = rng.randint(1, 30)
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(nw))))
    docs.append((100, "xx yy " + shared + " zz"))   # guarantee pair
    docs.append((101, shared + " qq rr ss"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def h64(gram):
        return int(hashlib.md5(("s0:" + gram).encode()).hexdigest()[:8], 16)

    def brute(text):
        words = text.split()
        k = max(len(words) - (N - 1), 1)
        grams = [" ".join(words[i : i + N]) for i in range(k)]
        grams = [(i + 1, g) for i, g in enumerate(grams) if g]
        hs = [(j, h64(g)) for j, g in grams]
        if not hs:
            return set()
        if len(hs) < W:
            m = min(h for _, h in hs)
            return {max((j, h) for j, h in hs if h == m)}
        out = set()
        for k0 in range(len(hs) - W + 1):
            win = hs[k0 : k0 + W]
            m = min(h for _, h in win)
            out.add(max((j, h) for j, h in win if h == m))
        return out

    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for d, text in docs:
        assert got.get(d, set()) == brute(text), f"doc {d}"

    pairs = {(r.doc_a, r.doc_b): r.shared_fp
             for r in winnow_overlap_pairs(df, min_shared=1,
                                           max_fp_freq=10**6).collect()}
    assert (100, 101) in pairs        # 12 shared words >= W+N-1 = 8


def test_stratified_sample_exact_k(spark):
    """Exactly min(k, |stratum|) per stratum, deterministic across
    calls, salt-independent draws differ."""
    from tsmp_spark.operators import stratified_sample

    rows = [(i, "big" if i < 50 else "small") for i in range(56)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, 10).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by["big"]) == 10
    assert len(by["small"]) == 6  # stratum smaller than k: all kept
    # deterministic
    again = {(r["doc_id"], r["source"])
             for r in stratified_sample(df, 10).collect()}
    assert again == {(r["doc_id"], r["source"]) for r in out}
    # a different salt draws a different big-stratum subset
    other = stratified_sample(df, 10, salt="strat2").collect()
    oby = {r["doc_id"] for r in other if r["source"] == "big"}
    assert oby != by["big"]


def test_span_corruption_plan_layout(spark):
    """Mask plans are deterministic across runs, spans merge when
    adjacent/overlapping, never exceed doc bounds, and docs with no
    picks emit zero-span rows."""
    from tsmp_spark.operators.tokens import span_corruption_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + (i * 13) % 60))) for i in range(40)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r for r in span_corruption_plan(docs).collect()}
    b = {r.doc_id: r for r in span_corruption_plan(docs).collect()}
    assert a.keys() == b.keys() and all(
        (a[k].n_spans, a[k].n_masked, a[k].sum_starts)
        == (b[k].n_spans, b[k].n_masked, b[k].sum_starts)
        for k in a
    )
    assert len(a) == 40
    for r in a.values():
        assert 0 <= r.n_masked <= r.n_tokens
        assert r.n_spans <= r.n_masked or r.n_masked == 0
        assert r.mask_rate_milli == r.n_masked * 1000 // r.n_tokens
    assert any(r.n_spans > 0 for r in a.values())
    assert sum(r.n_masked for r in a.values()) > 0


def test_emd_1d_pairs_known_distributions(spark):
    """EMD between two point masses one bin apart = width; identical
    distributions = 0; triangle inequality-ish sanity on three keys."""
    from tsmp_spark.operators.rollup import emd_1d_pairs

    rows = (
        [("a", 0.0)] * 10          # bin 8
        + [("b", 0.625)] * 10      # bin 9 -> one bin from a
        + [("c", 0.0)] * 7 + [("c", 0.625)] * 3
    )
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {(r.key_a, r.key_b): r for r in emd_1d_pairs(df).collect()}
    assert out[("a", "b")].emd == pytest.approx(0.625)
    assert out[("a", "c")].emd == pytest.approx(0.625 * 0.3)
    assert out[("b", "c")].emd == pytest.approx(0.625 * 0.7)
    same = spark.createDataFrame(
        [("x", 1.0)] * 5 + [("y", 1.0)] * 9, "event_type string, value double"
    )
    r = emd_1d_pairs(same).collect()[0]
    assert r.emd == 0.0 and r.sum_abs == 0


def test_ks_2samp_pairs_hand_case(spark):
    """Exact KS on a hand CDF book: A={1,2,3}, B={1.5,2.5} has
    sup gap 1/3 first attained at v=1 (centi 100); identical
    distributions give 0 with the smallest pooled point as location."""
    from tsmp_spark.operators.rollup import ks_2samp_pairs

    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 1.5), ("B", 2.5)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {(r.key_a, r.key_b): r for r in ks_2samp_pairs(df).collect()}
    r = out[("A", "B")]
    # cum_a*n_b - cum_b*n_a over pooled points:
    #   v=1: |1*2-0*3|=2, v=1.5: |1*2-1*3|=1, v=2: |2*2-1*3|=1,
    #   v=2.5: |2*2-2*3|=2, v=3: |3*2-2*3|=0  -> d_num=2, at=100
    assert r.d_num == 2 and r.n_a == 3 and r.n_b == 2
    assert r.at_centi == 100
    assert r.ks == pytest.approx(1 / 3)
    same = spark.createDataFrame(
        [("x", 1.0), ("x", 4.0), ("y", 1.0), ("y", 4.0)],
        "event_type string, value double",
    )
    s = ks_2samp_pairs(same).collect()[0]
    assert s.d_num == 0 and s.ks == 0.0 and s.at_centi == 100
    # disjoint supports -> KS = 1 somewhere between them
    dis = spark.createDataFrame(
        [("p", 0.0)] * 4 + [("q", 9.0)] * 6, "event_type string, value double"
    )
    d = ks_2samp_pairs(dis).collect()[0]
    assert d.d_num == d.n_a * d.n_b and d.ks == 1.0 and d.at_centi == 0


def test_item_cf_similarity_hand_book(spark):
    """Hand-built basket incidence: items X,Y share baskets {1,2};
    deg X=3, Y=2 -> jaccard 2/3, cosine 2/sqrt(6); min_cn prunes the
    single-basket pair; max_basket_size drops the big basket from
    pair generation but NOT from degrees; duplicates collapse."""
    import math

    from tsmp_spark.operators.rollup import item_cf_similarity

    rows = [
        (1, "X"), (1, "Y"), (2, "X"), (2, "Y"), (3, "X"), (3, "Z"),
        (3, "Z"),  # duplicate (basket, item) must collapse
        (4, "Z"),
    ]
    df = spark.createDataFrame(rows, "o int, it string")
    out = {
        (r.item_a, r.item_b): r
        for r in item_cf_similarity(df, min_cn=2).collect()
    }
    assert set(out) == {("X", "Y")}  # X-Z co-occurs once -> pruned
    r = out[("X", "Y")]
    assert r.cn == 2 and r.deg_a == 3 and r.deg_b == 2
    assert r.jaccard == pytest.approx(2 / 3)
    assert r.cosine == pytest.approx(2 / math.sqrt(6))
    lo = {
        (r.item_a, r.item_b): r
        for r in item_cf_similarity(df, min_cn=1).collect()
    }
    assert lo[("X", "Z")].cn == 1 and lo[("X", "Z")].deg_b == 2
    # cap=1 drops every multi-item basket from pair generation: no
    # pairs at all, degrees (checked above) were already full counts
    capped = item_cf_similarity(df, min_cn=1, max_basket_size=1).collect()
    assert capped == []


def test_readability_scores_hand_counts(spark):
    """Known counts: 'The cat sat. It ran!' = 5 words, 2 sentence runs,
    5 vowel groups -> flesch/fk from the closed formulas; empty and
    terminator-free docs yield NULL scores."""
    from tsmp_spark.operators.text import readability_scores

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. It ran!"),
            (2, "no terminator here"),
            (3, ""),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in readability_scores(docs).collect()}
    r = out[1]
    assert (r.n_words, r.n_sents, r.n_syll) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    assert r.flesch == pytest.approx(206.835 - 1.015 * wps - 84.6 * spw)
    assert r.fk_grade == pytest.approx(0.39 * wps + 11.8 * spw - 15.59)
    assert out[2].n_sents == 0 and out[2].flesch is None
    assert out[3].n_words == 0 and out[3].fk_grade is None


def test_rater_agreement_kappa_hand_book(spark):
    """Cohen 1960 hand case: 3 agreements of 4 with margins (3,1)x(2,2)
    gives kappa (4*3-8)/(16-8) = 0.5; constant identical raters make
    chance agreement total -> kappa NULL."""
    from tsmp_spark.operators.similarity import rater_agreement

    df = spark.createDataFrame(
        [("A", "A"), ("A", "A"), ("B", "B"), ("A", "B")],
        "rater_a string, rater_b string",
    )
    rows = {(r.label_a, r.label_b): r for r in rater_agreement(df).collect()}
    assert {k: v.n for k, v in rows.items()} == {
        ("A", "A"): 2, ("B", "B"): 1, ("A", "B"): 1
    }
    any_row = rows[("A", "A")]
    assert any_row.n_total == 4 and any_row.agree_n == 3
    assert any_row.pe_num == 8 and any_row.kappa == pytest.approx(0.5)
    const = spark.createDataFrame(
        [("X", "X")] * 5, "rater_a string, rater_b string"
    )
    c = rater_agreement(const).collect()[0]
    assert c.kappa is None and c.agree_n == 5


def test_tokenizer_fertility_hand_counts(spark):
    """'ab cd.' = 2 words, 3 bpe tokens (ab, cd, '.'), 6 bytes ->
    fertility 1500 milli, 2000 milli bytes/token; empty docs count
    but contribute nothing; zero-word source yields NULL ratios."""
    from tsmp_spark.operators.text import tokenizer_fertility

    docs = spark.createDataFrame(
        [
            (1, "ab cd.", "s1"),
            (2, "", "s1"),
            (3, "...", "s2"),  # ONE ws-word, 3 single-punct bpe tokens
            (4, "   ", "s3"),  # whitespace-only: 0 words, 0 tokens
        ],
        "doc_id int, text string, source string",
    )
    out = {r.source: r for r in tokenizer_fertility(docs).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.n_words, s1.n_tokens, s1.n_bytes) == (2, 2, 3, 6)
    assert s1.fertility_milli == 1500 and s1.bytes_per_token_milli == 2000
    s2 = out["s2"]
    assert s2.n_words == 1 and s2.n_tokens == 3
    assert s2.fertility_milli == 3000 and s2.bytes_per_token_milli == 1000
    s3 = out["s3"]
    assert s3.n_words == 0 and s3.n_tokens == 0 and s3.n_bytes == 3
    assert s3.fertility_milli is None and s3.bytes_per_token_milli is None


def test_label_propagation_two_cliques(spark):
    """Two triangles bridged by one edge: after 2 rounds every node in
    each triangle carries its clique's minimum label; the hand replay
    of round 1 (neighbor majority, min-label ties) is asserted too."""
    from tsmp_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("a", "c"),       # triangle {a,b,c}
            ("x", "y"), ("y", "z"), ("x", "z"),       # triangle {x,y,z}
            ("c", "x"),                                # bridge
        ],
        "src string, dst string",
    )
    # round 1 by hand: a sees {b,c}->min b; b sees {a,c}->a; c sees
    # {a,b,x}->a; x sees {c,y,z}->c; y sees {x,z}->x; z sees {x,y}->x
    r1 = {
        r.node: r.label
        for r in label_propagation(edges, rounds=1).collect()
    }
    assert r1 == {"a": "b", "b": "a", "c": "a", "x": "c", "y": "x", "z": "x"}
    # round 2 by hand from r1: a sees {b:a, c:a} -> a; b sees {a:b, c:a}
    # tie -> a; c sees {a:b, b:a, x:c} three-way tie -> a;
    # x sees {c:a, y:x, z:x} -> x; y and z each see {x:c, other:x}
    # tie -> c
    r2 = {
        r.node: r.label
        for r in label_propagation(edges, rounds=2).collect()
    }
    assert r2 == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "c", "z": "c"}
    out = label_propagation(edges, rounds=2)
    sizes = {r.node: r.community_size for r in out.collect()}
    assert all(v >= 1 for v in sizes.values())


def test_canonical_docs_picks_longest_member(spark):
    """Two identical-text near-dups: the one with more characters is
    canonical, group id stays the component minimum, singletons are
    excluded; char ties fall to the smaller doc id."""
    from tsmp_spark.operators.dedup import canonical_docs

    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, same, 50),
            (2, same, 80),
            (7, "completely different words nothing shared here at all", 99),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = canonical_docs(docs, num_hashes=8, bands=4, threshold=0.25).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_id, r.canonical_id) == (1, 2)
    assert (r.n_members, r.chars_kept, r.total_chars, r.n_dropped) == (
        2, 80, 130, 1,
    )
    tie = spark.createDataFrame(
        [(1, same, 60), (2, same, 60)], "doc_id long, text string, n_chars long"
    )
    t = canonical_docs(tie, num_hashes=8, bands=4, threshold=0.25).collect()[0]
    assert t.canonical_id == 1


def test_cep_pattern_match_negation_book(spark):
    """A->B within T with no C between: an error between click and
    purchase kills the match; a later clean pair matches; out-of-window
    B does not; same-second ties follow the (sec, event_id) total
    order."""
    from tsmp_spark.operators.rollup import cep_pattern_match

    rows = [
        (1, 1, "click", 100), (1, 2, "error", 200), (1, 3, "purchase", 300),
        (1, 4, "click", 400), (1, 5, "purchase", 500),
        (2, 6, "click", 0), (2, 7, "purchase", 7200),
        (3, 8, "click", 10), (3, 9, "purchase", 10), (3, 10, "error", 10),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, sec long"
    )
    out = {
        r.key: r
        for r in cep_pattern_match(
            ev, "click", "purchase", "error", window_sec=3600
        ).collect()
    }
    r1 = out[1]
    assert (r1.n_a, r1.n_matches, r1.matched) == (2, 1, 1)
    assert (r1.first_a_sec, r1.first_b_sec) == (400, 500)
    r2 = out[2]
    assert (r2.n_matches, r2.matched) == (0, 0)
    assert r2.first_a_sec is None and r2.first_b_sec is None
    r3 = out[3]  # purchase(id 9) precedes error(id 10) in the id order
    assert (r3.n_matches, r3.first_a_sec, r3.first_b_sec) == (1, 10, 10)


def test_hrw_shard_assign_elasticity_property(spark):
    """HRW's defining guarantee: growing 8 -> 9 shards moves keys ONLY
    onto the new shard 8, at roughly 1/9 of keys; assignment is
    deterministic and spread across all shards."""
    from tsmp_spark.operators.catalog import hrw_shard_assign

    keys = spark.range(900).select(F.col("id").cast("string").alias("key"))
    out = hrw_shard_assign(keys, n_shards=8, n_shards_after=9).collect()
    assert len(out) == 900
    moved = [r for r in out if r.moved]
    assert all(r.shard_after == 8 for r in moved)          # only TO the new
    assert all(
        r.shard == r.shard_after for r in out if not r.moved
    )
    assert 900 / 9 * 0.5 < len(moved) < 900 / 9 * 2        # ~1/9 rate
    assert {r.shard for r in out} == set(range(8))
    again = hrw_shard_assign(keys, n_shards=8, n_shards_after=9).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_quantile_discretize_hand_books(spark):
    """1..8 into 4 bins: edges 2/4/6 (centi 200/400/600), perfectly
    even counts; heavy ties bin LOW and uneven counts are exact."""
    from tsmp_spark.operators.rollup import quantile_discretize

    ev = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)], "value double"
    )
    out = {r.bin: r for r in quantile_discretize(ev, n_bins=4).collect()}
    assert (out[0].e1, out[0].e2, out[0].e3) == (200, 400, 600)
    assert all(out[b].n_rows == 2 for b in range(4))
    assert (out[0].lo_vc, out[0].hi_vc) == (100, 200)
    assert (out[3].lo_vc, out[3].hi_vc) == (700, 800)
    ties = spark.createDataFrame(
        [(1.0,)] * 4 + [(2.0,)], "value double"
    )
    t = {r.bin: r for r in quantile_discretize(ties, n_bins=2).collect()}
    # edge = value at rank ceil(5/2)=3 -> 1.0; ties bin LOW
    assert t[0].n_rows == 4 and t[1].n_rows == 1 and t[0].e1 == 100


def test_bag_of_patterns_hand_words(spark):
    """A pure ramp yields one numerosity-reduced word 0123 (=27); a
    constant series is low-variance and emits nothing; short series
    (< window) emit nothing."""
    from tsmp_spark.operators.series import bag_of_patterns

    rows = (
        [(1, i, float(i)) for i in range(10)]       # ramp: 3 identical words
        + [(2, i, 5.0) for i in range(12)]          # constant: lowvar
        + [(3, i, float(i)) for i in range(5)]      # too short
    )
    df = spark.createDataFrame(rows, "doc_id long, pos long, value double")
    out = bag_of_patterns(df, window=8, w=4, a=4).collect()
    assert len(out) == 1
    r = out[0]
    # z-normalized ramp: segment z's fall in the 4 symbol bands 0,1,2,3
    assert (r.key, r.word, r.cnt) == (1, 0 * 64 + 1 * 16 + 2 * 4 + 3, 1)
    # an up-down-up series yields multiple distinct words
    zig = [(9, i, float(v)) for i, v in enumerate(
        [0, 9, 1, 8, 0, 9, 1, 8, 0, 9, 1, 8]
    )]
    z = bag_of_patterns(
        spark.createDataFrame(zig, "doc_id long, pos long, value double"),
        window=8, w=4, a=4,
    ).collect()
    assert sum(r.cnt for r in z) >= 2


def test_winsorized_stats_hand_case(spark):
    """1..20 at 5% (k=1): min raised to 2, max lowered to 19 — the
    textbook one-each winsorization; mean = 10.5 exactly."""
    from tsmp_spark.operators.rollup import winsorized_stats

    ev = spark.createDataFrame(
        [("a", float(v), v) for v in range(1, 21)],
        "event_type string, value double, event_id long",
    )
    r = winsorized_stats(ev, pct=5).collect()[0]
    assert (r.n, r.lo_centi, r.hi_centi) == (20, 200, 1900)
    assert (r.n_clamped_lo, r.n_clamped_hi) == (1, 1)
    assert r.winsorized_sum_centi == 21000
    assert r.winsorized_mean == pytest.approx(10.5)
    # heavy outliers on both sides clamp symmetrically at 10%
    ev2 = spark.createDataFrame(
        [("b", -1000.0, 1), ("b", 1000.0, 10)]
        + [("b", float(v), v) for v in range(2, 10)],
        "event_type string, value double, event_id long",
    )
    r2 = winsorized_stats(ev2, pct=10).collect()[0]
    assert (r2.n_clamped_lo, r2.n_clamped_hi) == (1, 1)
    assert (r2.lo_centi, r2.hi_centi) == (200, 900)


def test_containment_pairs_quote_inclusion(spark):
    """A short doc fully quoted inside a long one: containment_a = 1
    even though Jaccard is low; unrelated docs emit nothing; the
    integer gate matches the float ratio."""
    from tsmp_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"
    long_doc = (
        quote
        + " one two three four five six seven eight nine ten"
        + " eleven twelve thirteen fourteen fifteen sixteen"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(
            docs, threshold_milli=500, max_shingle_freq=10**6
        ).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r.inter == r.na  # every shingle of the quote is inside
    assert r.containment_a == pytest.approx(1.0)
    assert r.containment_b < 0.5  # asymmetric: Jaccard-style view low


def test_spearman_pairs_midrank_books(spark):
    """Perfect monotone pairs give rho=1/-1; the tied-midrank book
    ((1,1,2) vs (5,7,9)) gives the hand value sqrt(3)/2; a constant
    series NULLs out."""
    import math
    from datetime import datetime, timedelta

    from tsmp_spark.operators.rollup import spearman_pairs

    t0 = datetime(2024, 1, 1)

    def rows(key, vals):
        return [
            (key, t0 + timedelta(hours=i), float(v))
            for i, v in enumerate(vals)
        ]

    ev = spark.createDataFrame(
        rows("up", [1, 2, 3]) + rows("mono", [10, 20, 30])
        + rows("down", [9, 6, 3]) + rows("tied", [1, 1, 2])
        + rows("const", [4, 4, 4]),
        "event_type string, ts timestamp, value double",
    )
    out = {
        (r.key_a, r.key_b): r for r in spearman_pairs(ev).collect()
    }
    assert out[("mono", "up")].rho == pytest.approx(1.0)
    assert out[("down", "up")].rho == pytest.approx(-1.0)
    assert out[("tied", "up")].rho == pytest.approx(math.sqrt(3) / 2)
    assert out[("const", "up")].rho is None


def test_cep_stream_state_machine_split_batches():
    """The streaming state function replayed across arbitrary batch
    splits equals the batch semantics on the hand book (error kills,
    later pair matches, window bound respected)."""
    import pandas as pd

    from tsmp_spark.streaming.cep import PACK, _make_func

    class FakeState:
        exists = False

        def update(self, t):
            self.exists, self.get = True, t

    rows = [  # (sec, id, role) in order: the user-1 book + window probe
        (100, 1, 0), (200, 2, 2), (300, 3, 1),   # A, C kills, B late
        (400, 4, 0), (500, 5, 1),                # clean A->B match
        (10000, 6, 0), (20000, 7, 1),            # B outside 3600s window
    ]
    for split in (1, 2, 3, 7):
        st = FakeState()
        func = _make_func(3600)
        chunk = len(rows) // split or 1
        outs = []
        for i in range(0, len(rows), chunk):
            part = rows[i : i + chunk]
            pdf = pd.DataFrame(
                {
                    "sk": [s * PACK + e for s, e, _ in part],
                    "role": [r for _, _, r in part],
                }
            )
            outs.extend(func((1,), iter([pdf]), st))
        final = outs[-1].iloc[-1]
        assert (final.n_a, final.n_matches, final.matched) == (3, 1, 1)
        assert (final.first_a_sec, final.first_b_sec) == (400, 500)


def test_curriculum_stages_equal_token_budget(spark):
    """Token counts [1,2,3,6] with 4 stages (budget 3): exclusive
    prefixes 0/1/3/6 map to stages 0/0/1/2; the two-level prefix
    equals the global order under length ties (id breaks)."""
    from tsmp_spark.operators.tokens import curriculum_stages

    rows = [
        (1, list(range(1))), (2, list(range(2))),
        (3, list(range(3))), (4, list(range(6))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = {r.doc_id: r for r in curriculum_stages(df, n_stages=4).collect()}
    assert [(out[i].cum_excl, out[i].stage) for i in (1, 2, 3, 4)] == [
        (0, 0), (1, 0), (3, 1), (6, 2),
    ]
    tie = spark.createDataFrame(
        [(10, [1, 2]), (11, [3, 4]), (12, [5, 6]), (13, [7, 8])],
        "doc_id long, tokens array<int>",
    )
    t = {r.doc_id: r for r in curriculum_stages(tie, n_stages=2).collect()}
    # equal lengths: id order gives prefixes 0,2,4,6 -> stages 0,0,1,1
    assert [t[i].stage for i in (10, 11, 12, 13)] == [0, 0, 1, 1]


def test_rake_word_scores_hand_phrases(spark):
    """Stopword 'of' and non-alpha 'networks.' delimit phrases
    [deep learning] | [deep] | [learning wins]; hand freq/degree per
    word, delimiters never emitted."""
    from tsmp_spark.operators.text import rake_word_scores

    docs = spark.createDataFrame(
        [(1, "deep learning of deep networks. learning wins")],
        "doc_id long, text string",
    )
    out = {r.word: r for r in rake_word_scores(docs).collect()}
    # phrases: [deep learning] | [deep] ('networks.' delims) |
    # [learning wins]
    assert (out["deep"].freq, out["deep"].degree) == (2, 3)
    assert out["deep"].score == pytest.approx(1.5)
    assert (out["learning"].freq, out["learning"].degree) == (2, 4)
    assert (out["wins"].freq, out["wins"].degree) == (1, 2)
    assert "of" not in out and "networks." not in out


def test_degree_assortativity_books(spark):
    """A star is perfectly disassortative (r = -1); a regular graph
    has zero degree variance (NULL); hand sums pinned on the star."""
    from tsmp_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], "src string, dst string"
    )
    r = degree_assortativity(star).collect()[0]
    assert (r.n_ends, r.sj, r.sjj, r.sjk) == (6, 12, 30, 18)
    assert r.assortativity == pytest.approx(-1.0)
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    t = degree_assortativity(tri).collect()[0]
    assert t.assortativity is None  # 2-regular: zero degree variance


def test_nelson_aalen_hand_curve(spark):
    """Hand censoring book: 3 churned users at ages 0/1/2 plus one
    censored at age 2 give at-risk 4/3/2 and exact micro-unit hazard
    increments 1e9//4, 1e9//3, 1e9//2 with an integer prefix sum."""
    from tsmp_spark.operators.rollup import nelson_aalen

    # study_end = 100000. churn_sec=21600: users whose last event is
    # >= 21600 before end are churned (events). grain 3600.
    rows = []
    # u1: first 0, last 3600  -> d=1, last far from end -> churned
    rows += [(1, 0), (1, 3600)]
    # u2: first 0, last 7200  -> d=2, churned
    rows += [(2, 0), (2, 7200)]
    # u3: first 0, last 0     -> d=0, churned
    rows += [(3, 0)]
    # u4: last event at study end -> censored, d=0
    rows += [(4, 90000), (4, 100000)]
    ev = spark.createDataFrame(rows, "user_id long, sec long")
    out = {r.t_age: r for r in nelson_aalen(ev).collect()}
    # ages: u3 d=0(event), u4 d=2? (100000-90000)//3600 = 2, censored
    # at-risk by age: age0: all 4; age1: u1,u2,u4(d=2); age2: u2,u4
    r0 = out[0]
    assert (r0.n_risk, r0.n_event) == (4, 1)
    assert r0.h_x1e9 == 10**9 // 4 and r0.cumhaz_x1e9 == 250000000
    r1 = out[1]
    assert (r1.n_risk, r1.n_event) == (3, 1)
    assert r1.cumhaz_x1e9 == 250000000 + 10**9 // 3
    r2 = out[2]
    assert (r2.n_risk, r2.n_event) == (2, 1)
    assert r2.cumhaz_x1e9 == 250000000 + 333333333 + 10**9 // 2


def test_hilbert_key_curve_properties(spark):
    """bits=2 over the full 4x4 grid: keys are a bijection onto 0..15
    AND consecutive curve positions are ALWAYS Manhattan-1 grid
    neighbors (the defining Hilbert property Morton lacks); origin
    starts the curve."""
    from tsmp_spark.operators.rollup import hilbert_key

    cells = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(cells, "x long, y long")
    out = hilbert_key(df, "x", "y", bits=2).collect()
    pos = {r.hkey: (r.x, r.y) for r in out}
    assert sorted(pos) == list(range(16))  # bijection
    for d in range(15):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    assert pos[0] == (0, 0)
    # Morton (zorder) violates neighbor-adjacency; Hilbert must not,
    # checked at bits=3 too
    cells3 = [(x, y) for x in range(8) for y in range(8)]
    out3 = hilbert_key(
        spark.createDataFrame(cells3, "x long, y long"), "x", "y", bits=3
    ).collect()
    pos3 = {r.hkey: (r.x, r.y) for r in out3}
    assert sorted(pos3) == list(range(64))
    assert all(
        abs(pos3[d][0] - pos3[d + 1][0]) + abs(pos3[d][1] - pos3[d + 1][1])
        == 1
        for d in range(63)
    )
    # and at bits=4 (16x16): the generated 16-layer chain stays a
    # neighbor-adjacent bijection
    cells4 = [(x, y) for x in range(16) for y in range(16)]
    out4 = hilbert_key(
        spark.createDataFrame(cells4, "x long, y long"), "x", "y", bits=4
    ).collect()
    pos4 = {r.hkey: (r.x, r.y) for r in out4}
    assert sorted(pos4) == list(range(256))
    assert all(
        abs(pos4[d][0] - pos4[d + 1][0]) + abs(pos4[d][1] - pos4[d + 1][1])
        == 1
        for d in range(255)
    )


def test_k_anonymity_audit_hand_classes(spark):
    """Class (1,A): 5 rows, 3 distinct balances -> clean; (2,B): 2 rows
    1 balance -> violates both; minima and violation counts pinned."""
    from tsmp_spark.operators.rollup import k_anonymity_audit

    rows = (
        [(i, 1, "A", float(100 + i % 3)) for i in range(5)]
        + [(10, 2, "B", 7.0), (11, 2, "B", 7.0)]
    )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string, "
              "c_acctbal double"
    )
    out = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in k_anonymity_audit(
            df, ["c_nationkey", "c_mktsegment"], "c_acctbal", k=5, l=3
        ).collect()
    }
    a = out[(1, "A")]
    assert (a.class_size, a.l_distinct, a.violates_k, a.violates_l) == (
        5, 3, 0, 0,
    )
    b = out[(2, "B")]
    assert (b.class_size, b.l_distinct, b.violates_k, b.violates_l) == (
        2, 1, 1, 1,
    )
    assert (a.k_min, a.l_min, a.n_k_violations, a.n_l_violations) == (
        2, 1, 1, 1,
    )


def test_pettitt_test_level_shift(spark):
    """[1,1,1,9,9,9]: w = (-3,-3,-3,3,3,3), prefix U = -3..-9..-3,
    K = 9 at the third bucket — the brute double-sgn sum confirms
    U_3 = -9; a constant series yields K = 0."""
    from datetime import datetime, timedelta

    from tsmp_spark.operators.rollup import pettitt_test

    t0 = datetime(2024, 1, 1)
    rows = [
        ("A", t0 + timedelta(hours=i), v)
        for i, v in enumerate([1.0, 1.0, 1.0, 9.0, 9.0, 9.0])
    ] + [
        ("flat", t0 + timedelta(hours=i), 5.0) for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.key: r for r in pettitt_test(ev).collect()}
    a = out["A"]
    epoch_hour = int(t0.timestamp()) // 3600
    assert (a.n, a.k_stat, a.u_at_cp) == (6, 9, -9)
    assert a.cp_bucket == epoch_hour + 2  # third bucket
    f = out["flat"]
    assert f.k_stat == 0 and f.cp_bucket == epoch_hour


def test_kruskal_wallis_hand_book(spark):
    """Textbook no-tie case {1,2,3} vs {4,5,6}: H = 27/7 exactly,
    split evenly across the two groups; all-equal values give B = 0
    and NULL contributions."""
    from tsmp_spark.operators.rollup import kruskal_wallis

    ev = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
         ("g2", 4.0), ("g2", 5.0), ("g2", 6.0)],
        "event_type string, value double",
    )
    out = {r.key: r for r in kruskal_wallis(ev).collect()}
    g1, g2 = out["g1"], out["g2"]
    # doubled ranks 2,4,6|8,10,12: R2 = 12|30, A = 81 both, B = 70
    assert (g1.n, g1.r2, g1.a, g1.b, g1.n_total) == (3, 12, 81, 70, 6)
    assert (g2.r2, g2.a) == (30, 81)
    assert g1.h_contrib == pytest.approx(405 / 210)
    assert g1.h_contrib + g2.h_contrib == pytest.approx(27 / 7)
    const = spark.createDataFrame(
        [("x", 2.0)] * 3 + [("y", 2.0)] * 4, "event_type string, value double"
    )
    c = {r.key: r for r in kruskal_wallis(const).collect()}
    assert c["x"].b == 0 and c["x"].h_contrib is None


def test_cluster_silhouette_separated_groups(spark):
    """Two antipodal vector groups: every vector sits far closer to its
    own centroid than the other -> silhouette near 1, groups land in
    different clusters; identical vectors leave one live cluster and
    zero silhouette rows."""
    from tsmp_spark.operators.similarity import cluster_silhouette

    rows = [
        (i, [1.0, 0.05 * (i % 3), 0.0, 0.0]) for i in range(4)
    ] + [
        (10 + i, [-1.0, 0.0, 0.05 * (i % 3), 0.0]) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_silhouette(df, n_clusters=2).collect()
    assert len(out) == 8
    by_group = {
        frozenset(r.cluster for r in out if r.vec_id < 10),
        frozenset(r.cluster for r in out if r.vec_id >= 10),
    }
    assert all(len(g) == 1 for g in by_group) and len(by_group) == 2
    assert all(r.sil > 0.5 for r in out)
    assert all(0.0 <= r.a_dist < r.b_dist for r in out)
    same = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    assert cluster_silhouette(same, n_clusters=2).collect() == []


def test_rate_limit_stream_state_machine_splits():
    """The streaming token bucket replayed across arbitrary batch
    splits equals the hand-replayed batch recurrence (capacity 2,
    refill 1/s, same-second ties in id order)."""
    import pandas as pd

    from tsmp_spark.streaming.rollup import _make_rate_func

    class FakeState:
        exists = False

        def update(self, t):
            self.exists, self.get = True, t

    rows = [(0, 1), (0, 2), (0, 3), (5, 4), (6, 5), (6, 6), (6, 7), (6, 8)]
    want_allowed = [1, 1, 0, 1, 1, 1, 0, 0]
    for split in (1, 2, 3, 8):
        st = FakeState()
        func = _make_rate_func(2, 1)
        chunk = len(rows) // split or 1
        got = []
        for i in range(0, len(rows), chunk):
            part = rows[i : i + chunk]
            pdf = pd.DataFrame(
                {"sec": [s for s, _ in part], "event_id": [e for _, e in part]}
            )
            for out in func((7,), iter([pdf]), st):
                got.extend(zip(out["event_id"], out["allowed"]))
        assert [a for _, a in sorted(got)] == want_allowed


def test_tukey_fences_hand_box(spark):
    """Values 1..11 plus outliers -100 and 100: Q1=3, Q3=9 (nearest
    rank over 13), fences x2 = [-12, 72] half-centi x100 -> exactly
    the two planted points flagged."""
    from tsmp_spark.operators.rollup import tukey_fences

    vals = [float(v) for v in range(1, 12)] + [-100.0, 100.0]
    ev = spark.createDataFrame(
        [("a", v, i) for i, v in enumerate(vals)],
        "event_type string, value double, event_id long",
    )
    r = tukey_fences(ev).collect()[0]
    # n=13: q1 rank ceil(13/4)=4 -> sorted vals[-100,1..11,100][4th]=3
    # q3 rank ceil(39/4)=10 -> 9
    assert (r.n, r.q1_centi, r.q3_centi) == (13, 300, 900)
    assert (r.fence_lo_x2, r.fence_hi_x2) == (5 * 300 - 3 * 900,
                                              5 * 900 - 3 * 300)
    assert (r.n_out_lo, r.n_out_hi) == (1, 1)


def test_anon_ladder_and_oov_invariants(spark):
    """Ladder: every assigned rung's class really reaches k=5 and no
    earlier rung did (checked by recomputing class sizes); OOV: the
    train split is OOV-free by construction and rates stay in [0,1]."""
    from tsmp_spark.queries import q_anon_ladder, q_oov_rate

    sf = "/root/testdata/sf0.001"
    rows = q_anon_ladder(spark, sf).collect()
    assert rows and all(r.rung in (0, 1, 2, 3) for r in rows)
    from collections import Counter

    n0 = Counter((r.nat, r.seg) for r in rows)
    n1 = Counter((r.reg, r.seg) for r in rows)
    n2 = Counter(r.reg for r in rows)
    for r in rows:
        sizes = [n0[(r.nat, r.seg)], n1[(r.reg, r.seg)], n2[r.reg]]
        if r.rung < 3:
            assert sizes[r.rung] >= 5 and r.class_size == sizes[r.rung]
            assert all(s < 5 for s in sizes[: r.rung])
        else:
            assert all(s < 5 for s in sizes) and r.class_size is None
    oov = {r.split: r for r in q_oov_rate(spark, sf).collect()}
    assert oov["train"].n_oov == 0 and oov["train"].oov_milli == 0
    for s in ("val", "test"):
        assert 0 <= oov[s].oov_milli <= 1000
        assert oov[s].n_oov_types <= oov[s].n_oov


def test_apriori_triples_hand_baskets(spark):
    """Baskets {1,2,3}x3, {1,2,4}, {5,6}: only (1,2,3) is a frequent
    triple (support 3) with face supports (4,3,3); the prune step
    keeps infrequent-face candidates out by construction."""
    from tsmp_spark.operators.rollup import apriori_triples

    baskets = [
        (10, [1, 2, 3]), (11, [1, 2, 3]), (12, [1, 2, 3]),
        (13, [1, 2, 4]), (14, [5, 6]),
    ]
    rows = [(o, it) for o, items in baskets for it in items]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = apriori_triples(df, min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.item_c, r.support) == (1, 2, 3, 3)
    assert (r.sup_ab, r.sup_ac, r.sup_bc) == (4, 3, 3)
    # support threshold above the best triple: empty
    assert apriori_triples(df, min_support=4).collect() == []


def test_cuped_perfect_covariate(spark):
    """Y = 2X exactly: theta = 2, both arms' adjusted means coincide at
    the pooled value 0.50 and the variance-reduction ratio is 1."""
    from datetime import datetime, timedelta

    from tsmp_spark.operators.rollup import cuped_adjustment

    t0 = datetime(2024, 1, 1)
    rows = []
    for uid, x in zip((1, 2, 3, 4), (0.10, 0.20, 0.30, 0.40)):
        rows.append((uid, t0, x))                       # pre period
        rows.append((uid, t0 + timedelta(seconds=100), 2 * x))  # post
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.arm: r for r in cuped_adjustment(ev).collect()}
    a0, a1 = out[0], out[1]
    assert a0.n_users == 2 and a1.n_users == 2
    assert a0.theta_num == 2 * a0.theta_den  # theta = 2 exactly
    assert a0.raw_mean == pytest.approx(0.60)
    assert a1.raw_mean == pytest.approx(0.40)
    assert a0.adj_mean == pytest.approx(0.50)
    assert a1.adj_mean == pytest.approx(0.50)
    assert a0.var_reduction == pytest.approx(1.0)


def test_bloom_index_prune_no_false_negatives(spark):
    """Granules holding the probe key are ALWAYS maybe_present (bloom
    guarantee); a never-seen probe can only skip or false-keep; counts
    exact."""
    from tsmp_spark.operators.rollup import bloom_index_prune

    rows = [(i, 7 if i < 512 else i) for i in range(1536)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    out = bloom_index_prune(
        ev, probe_keys=(7, 123456789), granule_rows=512
    ).collect()
    by = {(r.granule, r.probe_key): r for r in out}
    assert by[(0, 7)].n_match == 512 and by[(0, 7)].maybe_present == 1
    assert by[(0, 7)].false_keep == 0
    for g in (1, 2):
        r = by[(g, 7)]
        assert r.n_match in (0, 1) and (
            r.n_match == 0 or r.maybe_present == 1
        )
    absent = [r for r in out if r.probe_key == 123456789]
    assert all(r.n_match == 0 for r in absent)
    assert all(r.false_keep == r.maybe_present for r in absent)


def test_kendall_pairs_tie_books(spark):
    """Monotone pairs give tau ±1; the textbook tie case x=(1,1,2),
    y=(5,7,9) gives C=2, x-tie 1 -> tau_b = 2/sqrt(3*2); constant y
    NULLs out."""
    import math
    from datetime import datetime, timedelta

    from tsmp_spark.operators.rollup import kendall_pairs

    t0 = datetime(2024, 1, 1)

    def rows(key, vals):
        return [
            (key, t0 + timedelta(hours=i), float(v))
            for i, v in enumerate(vals)
        ]

    ev = spark.createDataFrame(
        rows("up", [5, 7, 9]) + rows("mono", [1, 2, 3])
        + rows("down", [9, 6, 3]) + rows("tied", [1, 1, 2])
        + rows("const", [4, 4, 4]),
        "event_type string, ts timestamp, value double",
    )
    out = {(r.key_a, r.key_b): r for r in kendall_pairs(ev).collect()}
    assert out[("mono", "up")].tau_b == pytest.approx(1.0)
    assert out[("down", "up")].tau_b == pytest.approx(-1.0)
    r = out[("tied", "up")]
    assert (r.n0, r.c, r.d, r.tx, r.ty) == (3, 2, 0, 1, 0)
    assert r.tau_b == pytest.approx(2 / math.sqrt(6))
    assert out[("const", "up")].tau_b is None


def test_quantile_transform_midrank_positions(spark):
    """Values (10, 20, 20, 30): doubled midranks 2, 5, 5, 8 over n=4;
    q_micro = 1e6·dr/(2·5) = 200000/500000/500000/800000 — ties share
    the exact midpoint, extremes stay strictly inside (0, 1e6)."""
    from tsmp_spark.operators.rollup import quantile_transform

    ev = spark.createDataFrame(
        [("a", 0.10, 1), ("a", 0.20, 2), ("a", 0.20, 3), ("a", 0.30, 4)],
        "event_type string, value double, event_id long",
    )
    out = {r.event_id: r for r in quantile_transform(ev).collect()}
    assert [out[i].dr for i in (1, 2, 3, 4)] == [2, 5, 5, 8]
    assert [out[i].q_micro for i in (1, 2, 3, 4)] == [
        200000, 500000, 500000, 800000,
    ]
    assert all(0 < out[i].q_micro < 1000000 for i in (1, 2, 3, 4))


def test_soundex_code_classic_values(spark):
    """Classic codes under the documented h/w-as-vowel variant:
    robert/rupert collide at R163 (the canonical example), pfister
    P236, short names zero-pad, letterless input is NULL."""
    from tsmp_spark.operators.text import soundex_code

    df = spark.createDataFrame(
        [("robert",), ("rupert",), ("pfister",), ("ashcraft",),
         ("lee",), ("123",)],
        "w string",
    )
    out = {r.w: r.c for r in df.select("w", soundex_code(F.col("w")).alias("c")).collect()}
    assert out["robert"] == "R163" and out["rupert"] == "R163"
    assert out["pfister"] == "P236"
    assert out["ashcraft"] == "A226"  # h/w-as-vowel variant, documented
    assert out["lee"] == "L000"
    assert out["123"] is None


def test_cluster_purity_labeled_groups(spark):
    """Two antipodal groups with labels 3/4 and 3/3 aligned: purity
    0.75 (gini 0.375) and 1.0 (gini 0); majority-label ties take the
    smaller label."""
    from tsmp_spark.operators.similarity import cluster_purity

    rows = (
        [(i, [1.0, 0.01 * i, 0.0, 0.0], 0) for i in range(3)]
        + [(3, [1.0, 0.03, 0.0, 0.0], 1)]
        + [(10 + i, [-1.0, 0.0, 0.01 * i, 0.0], 1) for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.n: r for r in cluster_purity(df, n_clusters=2).collect()}
    a = out[4]
    assert (a.majority_label, a.majority_cnt, a.sum_sq) == (0, 3, 10)
    assert a.purity == pytest.approx(0.75)
    assert a.gini == pytest.approx(1 - 10 / 16)
    b = out[3]
    assert (b.majority_label, b.purity, b.gini) == (1, 1.0, 0.0)
