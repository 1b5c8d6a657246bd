"""Property-based tests (hypothesis) for the custom operators whose
semantics have clean invariants: as-of join vs pandas merge_asof,
sessionization partitioning laws, MinHash/LSH containment, and the exact
money-sum's associativity-independence.

Spark session startup dominates per-example cost, so examples are
moderate (deadline disabled); each property still covers the edge space
(empty groups, ties, single rows) far better than fixed fixtures.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ram_datapipeline_spark.operators.dedup import minhash_lsh_pairs
from ram_datapipeline_spark.operators.relational import exact_money_sum
from ram_datapipeline_spark.operators.temporal import asof_join
from ram_datapipeline_spark.streaming import sessionize

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=5000),  # ts seconds
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@given(left=events_strategy, right=events_strategy)
@SETTINGS
def test_asof_matches_pandas_merge_asof(spark, left, right):
    """asof_join ≡ pandas.merge_asof(direction='backward') for unique
    (key, ts) rows on both sides."""
    # dedupe (key, ts) — both engines break exact duplicates arbitrarily
    left = list({(k, t): (k, t, v) for k, t, v in left}.values())
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())

    ldf = spark.createDataFrame(left, "k long, ts_s long, v double").withColumn(
        "ts", F.timestamp_micros(F.col("ts_s") * 1_000_000)
    ).drop("ts_s")
    rdf = spark.createDataFrame(right, "k long, ts_s long, rv double").withColumn(
        "ts", F.timestamp_micros(F.col("ts_s") * 1_000_000)
    ).drop("ts_s")
    got = asof_join(ldf, rdf, on="k", ts_col="ts", right_cols=["rv"]).toPandas()

    lp = pd.DataFrame(left, columns=["k", "ts", "v"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")

    g = {
        (r["k"], r["ts"].timestamp()): (
            None if pd.isna(r["rv"]) else round(r["rv"], 9)
        )
        for _, r in got.iterrows()
    }
    w = {
        (r["k"], float(r["ts"])): (
            None if pd.isna(r["rv"]) else round(r["rv"], 9)
        )
        for _, r in want.iterrows()
    }
    assert g == w


@given(events=events_strategy)
@SETTINGS
def test_sessionize_partitions_events(spark, events):
    """Sessions form a partition of the input rows; within a session every
    gap ≤ 30 min; across consecutive sessions the gap > 30 min."""
    rows = [
        (i, k, t) for i, (k, t, _) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s long").withColumn(
        "ts", F.timestamp_micros(F.col("ts_s") * 1_000_000)
    ).drop("ts_s")
    out = sessionize(df, gap_minutes=30).collect()
    # partition law: event counts add up per user
    per_user_out = {}
    for r in out:
        per_user_out[r["user_id"]] = per_user_out.get(r["user_id"], 0) + r["n_events"]
    per_user_in = {}
    for _, k, _t in rows:
        per_user_in[k] = per_user_in.get(k, 0) + 1
    assert per_user_out == per_user_in
    # boundary law per user: sessions ordered by start don't overlap and
    # consecutive sessions are > 30 min apart
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap > 1800, (a, b)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=12, max_size=60), min_size=2, max_size=8
    )
)
@SETTINGS
def test_minhash_identical_docs_always_pair(spark, texts):
    """Identical documents collide in every band → always candidates;
    pairs are canonical (a < b) and unique."""
    docs = [(i, t) for i, t in enumerate(texts + [texts[0]])]  # duplicate doc 0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df).collect()
    seen = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert len(seen) == len(pairs)  # no duplicate pairs
    assert all(a < b for a, b in seen)
    # the planted exact duplicate must be found iff it has ≥1 shingle
    if len(texts[0].split(" ")) >= 3 and any(
        s for s in [" ".join(texts[0].split(" ")[i : i + 3]) for i in range(len(texts[0].split(" ")) - 2)]
    ):
        assert (0, len(docs) - 1) in seen


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=200,
    ),
    parts=st.integers(min_value=1, max_value=8),
)
@SETTINGS
def test_exact_money_sum_partition_invariant(spark, vals, parts):
    """The cent-integer money sum gives the same answer under any
    partitioning (the property plain double-sum lacks) — this is what
    makes revenue aggregates hash-stable under shuffles."""
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    a = df.coalesce(1).agg(exact_money_sum(F.col("x")).alias("s")).collect()[0]["s"]
    b = df.repartition(parts).agg(exact_money_sum(F.col("x")).alias("s")).collect()[0]["s"]
    assert a == b


words_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=1, max_size=40
    ),
    min_size=1,
    max_size=10,
)


@given(docs=words_strategy, chunk=st.integers(3, 8), overlap=st.integers(0, 2))
@SETTINGS
def test_chunk_overlap_reconstructs_text(spark, docs, chunk, overlap):
    """Dropping each chunk's leading `overlap` words (except chunk 0) and
    concatenating reconstructs the original document exactly, and every
    chunk except the last has exactly `chunk` words."""
    from ram_datapipeline_spark.operators.corpus import chunk_with_overlap

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    out = chunk_with_overlap(df, chunk_words=chunk, overlap_words=overlap)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, ws in enumerate(docs):
        chunks = by_doc[i]
        assert chunks[0].n_chunks == len(chunks)
        rebuilt: list = []
        for j, r in enumerate(chunks):
            cw = r.chunk_text.split(" ")
            assert len(cw) == r.chunk_words_n
            if j < len(chunks) - 1:
                assert r.chunk_words_n == chunk
            rebuilt.extend(cw if j == 0 else cw[overlap:])
        assert rebuilt == ws


@given(docs=words_strategy, seg=st.integers(2, 5))
@SETTINGS
def test_segment_dedup_invariants(spark, docs, seg):
    """Global kept-segment count equals the number of DISTINCT segments,
    and each doc's rebuilt text is a concatenation of a subset of its own
    segments in order."""
    from ram_datapipeline_spark.operators.corpus import segment_dedup

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in segment_dedup(df, seg_words=seg).collect()}

    def segments(ws):
        return [
            " ".join(ws[i : i + seg]) for i in range(0, len(ws), seg)
        ]

    all_segs = [s for ws in docs for s in segments(ws)]
    assert sum(r.kept_segments for r in out.values()) == len(set(all_segs))
    for i, ws in enumerate(docs):
        own = segments(ws)
        # rebuilt text is some subsequence of the doc's own segments
        text = out[i].text_dedup
        if text:
            it = iter(own)
            rebuilt_segs = []
            # greedy scan: each kept segment must appear among own segments in order
            pos = 0
            for s in _split_into_segments(text, own):
                while pos < len(own) and own[pos] != s:
                    pos += 1
                assert pos < len(own), f"segment {s!r} not in doc order"
                rebuilt_segs.append(s)
                pos += 1


def _split_into_segments(text: str, own: list) -> list:
    """Recover the kept segment sequence from the rebuilt text by greedy
    prefix matching against the doc's own segment list (segments may
    contain spaces, so a plain split can't recover boundaries)."""
    out = []
    rest = text
    i = 0
    own = list(own)
    while rest:
        for j, s in enumerate(own[i:], start=i):
            if rest == s:
                out.append(s)
                rest = ""
                i = j + 1
                break
            if rest.startswith(s + " "):
                out.append(s)
                rest = rest[len(s) + 1 :]
                i = j + 1
                break
        else:
            raise AssertionError(f"cannot match {rest!r} against segments")
    return out


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=30,
)


@given(raw=edges_strategy)
@SETTINGS
def test_triangle_counts_match_bruteforce(spark, raw):
    """triangle_counts ≡ brute-force triple enumeration on random small
    graphs (duplicates, reversals, self-loops included by construction)."""
    from itertools import combinations

    from ram_datapipeline_spark.operators.graph import triangle_counts

    edges = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
    nodes = sorted({n for e in edges for n in e})
    want: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1

    df = spark.createDataFrame(raw, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == want


@given(raw=edges_strategy, iters=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_pagerank_int_matches_replay(spark, raw, iters):
    """pagerank_int ≡ a dict replay of the integer recurrence on random
    directed graphs for any round count."""
    from ram_datapipeline_spark.operators.graph import pagerank_int

    edge_list = sorted(set(raw))
    scale, dn, dd = 1_000_000, 85, 100
    outdeg: dict[int, int] = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (dd - dn)) // dd
    ranks = {n: scale for n in outdeg}
    for _ in range(iters):
        sums: dict[int, int] = {}
        for s, d in edge_list:
            if s in ranks:
                sums[d] = sums.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {n: base + (dn * v) // dd for n, v in sums.items()}

    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank_int(df, iters=iters).collect()}
    assert got == ranks


interval_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # key
        st.integers(min_value=0, max_value=20000),  # start second
        st.integers(min_value=0, max_value=7000),   # length seconds
    ),
    min_size=1,
    max_size=25,
)


@given(a_raw=interval_strategy, b_raw=interval_strategy,
       bucket=st.sampled_from([60, 600, 1800]))
@SETTINGS
def test_interval_overlap_bucketing_equals_naive(spark, a_raw, b_raw, bucket):
    """Bucketized overlap join ≡ the naive per-key cross-join filter for
    ANY bucket width (completeness and dedup never depend on it),
    including intervals much longer than a bucket and zero-length
    intervals."""
    from ram_datapipeline_spark.operators.temporal import interval_overlap_join

    import datetime as dt

    def frame(raw, id0):
        base = dt.datetime(2024, 1, 1)
        rows = [
            (id0 + i, k, base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=s + ln))
            for i, (k, s, ln) in enumerate(raw)
        ]
        return rows, spark.createDataFrame(
            rows, "id long, k long, s timestamp, e timestamp"
        )

    ar, adf = frame(a_raw, 0)
    br, bdf = frame(b_raw, 1000)
    got = {
        (r["a_id"], r["b_id"]): r["overlap_s"]
        for r in interval_overlap_join(adf, bdf, "k", bucket_seconds=bucket).collect()
    }
    want = {}
    for aid, ak, as_, ae in ar:
        for bid, bk, bs, be in br:
            if ak == bk and as_ < be and bs < ae:
                want[(aid, bid)] = int(
                    (min(ae, be) - max(as_, bs)).total_seconds()
                )
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),       # group
            st.integers(min_value=0, max_value=10**6),   # value
        ),
        min_size=1, max_size=60,
    ),
    n_shards=st.sampled_from([2, 3]),
)
@SETTINGS
def test_quantile_sketch_shard_merge_invariant(spark, rows, n_shards):
    """Sketching the union of per-shard SAMPLES equals sketching the
    whole input, for any shard split — the KMV mergeability law."""
    from pyspark.sql.window import Window

    from ram_datapipeline_spark.operators.sketches import hash_quantile_sketch

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g long, v long, key long")
    whole = {
        r["g"]: (r["n_sample"], r["p50"], r["p90"])
        for r in hash_quantile_sketch(df, "g", "v", "key", k=8).collect()
    }
    win = Window.partitionBy("g").orderBy(
        F.md5(F.col("key").cast("string")), F.col("key")
    )
    union = None
    for p in range(n_shards):
        s = (
            df.filter(F.col("key") % n_shards == p)
            .withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= 8)
            .drop("_rn")
        )
        union = s if union is None else union.unionByName(s)
    merged = {
        r["g"]: (r["n_sample"], r["p50"], r["p90"])
        for r in hash_quantile_sketch(union, "g", "v", "key", k=8).collect()
    }
    assert merged == whole


# --- round-5 operators -------------------------------------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "ab", "xy"]),
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=12,
)


@given(docs=docs_strategy)
@SETTINGS
def test_repeated_spans_matches_bruteforce(spark, docs):
    """repeated_spans == the quadratic reference: for every w-window,
    flag it iff its token text occurs (at any position) in ≥2 distinct
    docs; merge flagged starts per doc whenever gaps ≤ w."""
    from ram_datapipeline_spark.operators.dedup import repeated_spans

    w = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in repeated_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]), w=w, min_docs=2
        ).collect()
    )

    # brute force: windows keyed by joined text (the split/join round
    # trip mirrors the operator's whitespace tokenization)
    win: dict[str, set[int]] = {}
    occs: list[tuple[int, int, str]] = []
    for i, text in rows:
        toks = text.split(" ")
        for s in range(len(toks) - w + 1):
            key = " ".join(toks[s : s + w])
            win.setdefault(key, set()).add(i)
            occs.append((i, s + 1, key))
    flagged: dict[int, list[int]] = {}
    for i, s, key in occs:
        if len(win[key]) >= 2:
            flagged.setdefault(i, []).append(s)
    want = []
    for i, starts in flagged.items():
        starts.sort()
        run = [starts[0]]
        for s in starts[1:]:
            if s - run[-1] <= w:
                run.append(s)
            else:
                want.append((i, run[0], run[-1] + w - 1, len(run)))
                run = [s]
        want.append((i, run[0], run[-1] + w - 1, len(run)))
    assert got == sorted(want)


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=300
    ),
    k=st.integers(min_value=2, max_value=8),
)
@SETTINGS
def test_misra_gries_matches_exact_threshold(spark, keys, k):
    """Two-pass MG heavy hitters == plain count/HAVING on arbitrary
    multisets, any k — the candidate pass may overshoot but the exact
    recount must land exactly."""
    from ram_datapipeline_spark.operators.sketches import (
        misra_gries_heavy_hitters,
    )

    df = spark.createDataFrame([(x,) for x in keys], ["key"]).repartition(4)
    got = sorted(
        (r["key"], r["cnt"])
        for r in misra_gries_heavy_hitters(df, "key", k).collect()
    )
    from collections import Counter

    c = Counter(keys)
    n = len(keys)
    want = sorted((key, cnt) for key, cnt in c.items() if cnt * k > n)
    assert got == want


@given(
    build=st.sets(st.integers(min_value=0, max_value=200), max_size=40),
    probe=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=120
    ),
)
@SETTINGS
def test_bloom_prefilter_equals_plain_join(spark, build, probe):
    """Bloom prune must be invisible: join-after-prefilter == plain
    inner join on arbitrary key sets (false positives removed by the
    join, no false negatives by construction)."""
    from ram_datapipeline_spark.operators.skew import bloom_prefilter_join

    b = spark.createDataFrame([(x,) for x in build] or [(None,)], "k long").where(
        F.col("k").isNotNull()
    )
    p = spark.createDataFrame([(x, i) for i, x in enumerate(probe)], "k long, v long")
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_prefilter_join(p, b, on="k", m_bits=1 << 10).collect()
    )
    want = sorted((x, i) for i, x in enumerate(probe) if x in build)
    assert got == want


@given(
    words=st.lists(
        # 'aaab'/'baaa'/'aaa' force l==r merges with self-overlapping
        # runs — the round-7 junction-pre-pair regression class — on
        # top of the tie-break and same-symbol-pair cases
        st.sampled_from(
            ["ab", "aab", "abab", "ba", "bb", "a", "aaab", "baaa", "aaa", "b"]
        ),
        min_size=1,
        max_size=25,
    ),
    n_merges=st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_bpe_learn_matches_reference_on_random_corpora(spark, words, n_merges):
    """bpe_learn == the pure-Python trainer on arbitrary tiny corpora —
    exercises tie-breaks and same-symbol pairs ('a a' in 'aab') that the
    fixture corpus never hits."""
    from collections import Counter

    from ram_datapipeline_spark.operators.corpus import bpe_learn
    from tests.test_corpus import _bpe_reference

    docs = spark.createDataFrame([(" ".join(words),)], ["text"])
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_learn(docs, n_merges=n_merges).collect()
    ]
    assert got == _bpe_reference(dict(Counter(words)), n_merges)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=40, deadline=None)
def test_batched_bpe_admission_invariants(word_freqs, n_merges):
    """Pure-Python invariants of the batched-BPE admission spec (the
    oracle-replayed rule): every round's batch is pairwise
    NON-INTERACTING ({l, r, l+r} symbol sets disjoint), so applying the
    batch in reversed order yields the same vocabulary state — the
    commutation property the whole batched mode rests on."""
    from tests.test_corpus import _bpe_batched_reference

    freqs = {}
    for w, f in word_freqs:
        freqs[w] = freqs.get(w, 0) + f
    merges, _rounds = _bpe_batched_reference(freqs, n_merges)

    # group merges into rounds by replaying the reference round counts:
    # re-run and capture per-round batches via symbol-set disjointness
    # of consecutive steps is ambiguous — instead, re-validate the
    # invariant over every maximal run of steps admitted together:
    # the reference guarantees within-round non-interaction, so check
    # that ANY two merges with no interacting merge between them in
    # sequence order have disjoint symbol sets OR are separated by a
    # rewrite. The direct, unambiguous check: replay rounds ourselves.
    vocab = {tuple(w) + ("</w>",): f for w, f in freqs.items()}

    def pair_counts(v):
        counts = {}
        for syms, f in v.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        return counts

    def apply_batch(v, batch):
        nv = {}
        for syms, f in v.items():
            out = list(syms)
            for l, r, _ in batch:  # noqa: E741
                nxt, i = [], 0
                while i < len(out):
                    if i + 1 < len(out) and out[i] == l and out[i + 1] == r:
                        nxt.append(l + r)
                        i += 2
                    else:
                        nxt.append(out[i])
                        i += 1
                out = nxt
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        return nv

    done = 0
    while done < len(merges):
        counts = pair_counts(vocab)
        if not counts:
            break
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:192]
        batch, used = [], set()
        for (l, r), cnt in ranked:  # noqa: E741
            s = {l, r, l + r}
            if not (s & used):
                batch.append((l, r, cnt))
                used |= s
                if len(batch) == len(merges) - done:
                    break
        # 1. the reference's merges for this round match our replay
        ref_batch = [(m[1], m[2], m[4]) for m in merges[done:done + len(batch)]]
        assert ref_batch == batch
        # 2. pairwise non-interacting
        seen: set = set()
        for l, r, _ in batch:  # noqa: E741
            s = {l, r, l + r}
            assert not (s & seen)
            seen |= s
        # 3. commutation: reversed application gives the same vocab
        fwd = apply_batch(vocab, batch)
        rev = apply_batch(vocab, list(reversed(batch)))
        assert fwd == rev
        vocab = fwd
        done += len(batch)


@given(
    word=st.text(alphabet="ab", min_size=1, max_size=12),
    raw_merges=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb", "aab", "</w>"]),
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb", "abb", "</w>"]),
        ),
        min_size=1,
        max_size=10,
    ),
)
@settings(max_examples=300, deadline=None)
def test_replay_kernel_equals_inorder_fold(word, raw_merges):
    """_replay_merges_word (the arrow engine's lazy-heap walk) must
    equal the naive in-order greedy fold on arbitrary merge tables —
    including duplicates, self-overlaps (l==r), and product collisions
    with earlier pairs, which is exactly where a rank-order-only loop
    diverges from sequential replay."""
    from ram_datapipeline_spark.operators.corpus import _replay_merges_word

    syms = list(word) + ["</w>"]

    # reference: apply each merge in order, greedy left-to-right
    ref = list(syms)
    for l, r in raw_merges:
        out, i = [], 0
        while i < len(ref):
            if i + 1 < len(ref) and ref[i] == l and ref[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(ref[i])
                i += 1
        ref = out

    pair_at = list(raw_merges)
    merged_at = [l + r for l, r in raw_merges]
    steps: dict = {}
    for i, p in enumerate(pair_at):
        steps.setdefault(p, []).append(i)
    got = _replay_merges_word(list(syms), steps, pair_at, merged_at)
    assert got == ref, (word, raw_merges, got, ref)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # id (deduped below)
            st.integers(min_value=-50, max_value=50),    # v (heavy ties)
        ),
        min_size=1,
        max_size=60,
    ),
    nparts=st.integers(min_value=1, max_value=9),
)
@SETTINGS
def test_global_row_index_is_the_total_order(spark, rows, nparts):
    """global_row_index ≡ enumerate(sorted(...)) for ANY partition count:
    a permutation of 0..n-1, stable under ties via the id tiebreak,
    independent of how the range partitioner splits."""
    from ram_datapipeline_spark.operators.layout import global_row_index

    uniq = list({r[0]: r for r in rows}.values())
    df = spark.createDataFrame(uniq, "id long, v long")
    got = {
        r["id"]: r["global_idx"]
        for r in global_row_index(
            df, [F.col("v"), F.col("id")], n_partitions=nparts
        ).collect()
    }
    expect = {
        rid: i
        for i, (rid, _) in enumerate(sorted(uniq, key=lambda r: (r[1], r[0])))
    }
    assert got == expect


@given(
    left=events_strategy,
    right=events_strategy,
    tol_s=st.integers(min_value=0, max_value=2000),
)
@SETTINGS
def test_asof_tolerance_matches_pandas_all_directions(
    spark, left, right, tol_s
):
    """The round-9 tolerance knob ≡ pandas merge_asof(tolerance=) in
    every direction, for unique (key, ts) rows. For 'nearest' pandas
    also ties to the earlier row, so the semantics align exactly."""
    from ram_datapipeline_spark.operators.temporal import (
        asof_join_forward,
        asof_join_nearest,
    )

    left = list({(k, t): (k, t, v) for k, t, v in left}.values())
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())

    ldf = spark.createDataFrame(
        left, "k long, ts_s long, v double"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_s") * 1_000_000)).drop(
        "ts_s"
    )
    rdf = spark.createDataFrame(
        right, "k long, ts_s long, rv double"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_s") * 1_000_000)).drop(
        "ts_s"
    )
    lp = pd.DataFrame(left, columns=["k", "ts", "v"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values("ts")

    for fn, direction in (
        (asof_join, "backward"),
        (asof_join_forward, "forward"),
        (asof_join_nearest, "nearest"),
    ):
        got = fn(
            ldf, rdf, on="k", ts_col="ts", right_cols=["rv"],
            tolerance_us=tol_s * 1_000_000,
        ).toPandas()
        want = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=tol_s,
        )
        g = {
            (r["k"], r["ts"].timestamp()): (
                None if pd.isna(r["rv"]) else round(r["rv"], 9)
            )
            for _, r in got.iterrows()
        }
        w = {
            (r["k"], float(r["ts"])): (
                None if pd.isna(r["rv"]) else round(r["rv"], 9)
            )
            for _, r in want.iterrows()
        }
        assert g == w, direction
