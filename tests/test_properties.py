"""Property-based tests (hypothesis): custom operators checked against
independent Python reference implementations on adversarial small inputs —
boundary timestamps, duplicate keys, empty groups, single elements.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_BASE = datetime(2024, 1, 1)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ts = st.integers(min_value=0, max_value=500)  # offsets in seconds
_key = st.integers(min_value=0, max_value=3)


@_settings
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=25),
    right=st.lists(st.tuples(_key, _ts, st.floats(0, 100, allow_nan=False)), max_size=25),
)
def test_asof_join_matches_python_reference(spark, left, right):
    from nyc_taxi_data_pipeline_spark.operators.temporal import as_of_join

    ldf = spark.createDataFrame(
        [(i, k, _BASE + timedelta(seconds=t)) for i, (k, t) in enumerate(left)],
        "lid int, k int, t timestamp",
    )
    # dedup right on (k, ts): keep the max value — mirrors what a caller
    # must do anyway (as-of join against a keyed series with unique ts)
    rbest = {}
    for k, t, v in right:
        rbest[(k, t)] = max(v, rbest.get((k, t), v))
    rdf = spark.createDataFrame(
        [(k, _BASE + timedelta(seconds=t), v) for (k, t), v in rbest.items()],
        "k int, rt timestamp, v double",
    )
    out = {
        r["lid"]: r["v"]
        for r in as_of_join(
            ldf, rdf, key="k", left_ts="t", right_ts="rt", right_cols=["v"]
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in rbest.items() if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None
        assert out[i] == expected, (i, k, t, cands)


@_settings
@given(
    points=st.lists(_ts, min_size=1, max_size=30),
    intervals=st.lists(st.tuples(_ts, st.integers(0, 200)), min_size=1, max_size=10),
)
def test_interval_join_matches_python_reference(spark, points, intervals):
    from nyc_taxi_data_pipeline_spark.operators.temporal import interval_join

    pdf = spark.createDataFrame(
        [(i, _BASE + timedelta(seconds=t)) for i, t in enumerate(points)],
        "pid int, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j, _BASE + timedelta(seconds=s), _BASE + timedelta(seconds=s + d))
            for j, (s, d) in enumerate(intervals)
        ],
        "iid int, start timestamp, end timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pdf, idf, "ts", "start", "end", bucket_seconds=60
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, t in enumerate(points)
        for j, (s, d) in enumerate(intervals)
        if s <= t < s + d
    )
    assert got == want


@_settings
@given(
    rows=st.lists(
        st.tuples(_key, st.integers(-1000, 1000)), min_size=1, max_size=40
    )
)
def test_salted_aggregate_matches_python_reference(spark, rows):
    from nyc_taxi_data_pipeline_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r["k"]: (r["n"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs={
                "n": F.count(F.lit(1)),
                "mn": F.min("v"),
                "mx": F.max("v"),
            },
            salt=4,
        ).collect()
    }
    want = {}
    for k, v in rows:
        n, mn, mx = want.get(k, (0, v, v))
        want[k] = (n + 1, min(mn, v), max(mx, v))
    assert got == want


@_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.text(alphabet="abc", max_size=2)),
        min_size=1,
        max_size=30,
    )
)
def test_exact_dedup_keeps_min_id_per_key(spark, rows):
    from nyc_taxi_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "id int, t string"
    )
    got = sorted((r["t"], r["id"]) for r in exact_dedup(df, ["t"], "id").collect())
    want = {}
    for i, (_, t) in enumerate(rows):
        want.setdefault(t, i)
    assert got == sorted((t, i) for t, i in want.items())


@_settings
@given(
    events=st.lists(st.tuples(_key, st.integers(0, 10000)), min_size=1, max_size=40)
)
def test_sessionize_gap_count_matches_python(spark, events):
    from nyc_taxi_data_pipeline_spark.operators.temporal import sessionize

    gap_min = 5
    df = spark.createDataFrame(
        [(k, _BASE + timedelta(seconds=t)) for k, t in events],
        "k int, ts timestamp",
    )
    out = sessionize(df, key="k", ts_col="ts", gap_minutes=gap_min)
    got = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.countDistinct("session_id").alias("n")).collect()
    }
    by_key: dict[int, list[int]] = {}
    for k, t in events:
        by_key.setdefault(k, []).append(t)
    for k, ts in by_key.items():
        ts.sort()
        sessions = 1 + sum(
            1 for a, b in zip(ts, ts[1:]) if b - a > gap_min * 60
        )
        assert got[k] == sessions, (k, ts)


@_settings
@given(
    docs=st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_content_defined_chunks_reassemble(spark, docs):
    """For ANY token sequence: chunk texts, joined in chunk order, must
    reproduce the document exactly — no token lost, duplicated, or
    reordered by the boundary logic."""
    from nyc_taxi_data_pipeline_spark.operators.textstats import content_defined_chunks

    rows = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    chunks = content_defined_chunks(df, min_tokens=3).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    for i, toks in enumerate(docs):
        assert " ".join(by_doc[i]) == rows[i][1], f"doc {i} did not reassemble"


@_settings
@given(
    prefix=st.lists(st.integers(0, 999), min_size=0, max_size=30),
    shared=st.lists(st.integers(1000, 1999), min_size=8, max_size=20),
    suffix=st.lists(st.integers(2000, 2999), min_size=0, max_size=30),
)
def test_winnowing_shared_run_guarantee(spark, prefix, shared, suffix):
    """The winnowing theorem: two docs sharing a token run of length
    ≥ k + window - 1 (= 6 here) MUST share at least one fingerprint,
    whatever surrounds the run."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    words = lambda ts: " ".join(f"w{t}" for t in ts)
    doc_a = words(prefix + shared)
    doc_b = words(shared + suffix)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id int, text string"
    )
    fp = winnowing_fingerprints(df, "text", "doc_id", k=3, window=4)
    a = {r["fingerprint"] for r in fp.filter(F.col("id") == 1).collect()}
    b = {r["fingerprint"] for r in fp.filter(F.col("id") == 2).collect()}
    assert a & b, "shared run of length >= 6 produced no shared fingerprint"


@_settings
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_oph_signatures_match_python_reference(spark, docs):
    """One-permutation-hashing signatures (hex-prefix binning + rotation
    densification) checked lane-by-lane against an independent Python
    implementation — covers short docs (< k tokens), empty docs (which
    tokenize to the single '' shingle and so all share the md5('')
    signature — only NULL text emits no signature), and sparse bins
    (densification ring)."""
    import hashlib

    from nyc_taxi_data_pipeline_spark.operators.dedup import minhash_signatures_oph

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]

    def ref_signature(text: str):
        toks = text.strip().lower().split()
        if not toks:
            toks = [""]  # split of '' yields [''] in Spark/DuckDB semantics
        k = 3
        n = max(len(toks) - (k - 1), 1)
        shingles = {" ".join(toks[i : i + k]) for i in range(n)}
        bins: dict[int, str] = {}
        for s in shingles:
            h = hashlib.md5(s.encode()).hexdigest()
            b = int(h[:2], 16) % 16
            bins[b] = min(bins.get(b, h), h)
        return [
            next(bins[(i + j) % 16] for j in range(16) if (i + j) % 16 in bins)
            for i in range(16)
        ]

    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["id"]: list(r["signature"])
        for r in minhash_signatures_oph(df, "text", "doc_id").collect()
    }
    expected = {i: ref_signature(t) for i, t in rows}
    assert got == expected


def test_bpe_sentinel_replace_matches_reference_merge(spark):
    """The BPE entry's core mechanic — greedy left-to-right non-overlapping
    pair merge via sentinel-delimited string replace — pinned against an
    independent Python reference, over every word up to length 6 on a
    2-letter alphabet (guaranteeing heavy overlap cases like 'aaaa') and
    three CHAINED merges whose later patterns contain multi-char symbols
    produced by earlier rounds."""
    from itertools import product

    from pyspark.sql import functions as F

    merges = [("a", "b"), ("ab", "a"), ("b", "b")]

    def ref_merge(symbols, left, right):
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        return out

    words = [
        "".join(p)
        for n in range(1, 7)
        for p in product("ab", repeat=n)
    ]
    expected = {}
    for w in words:
        syms = list(w)
        for left, right in merges:
            syms = ref_merge(syms, left, right)
        expected[w] = syms

    df = spark.createDataFrame([(w,) for w in words], "w string")
    seq = F.regexp_replace("w", "(.)", r"|$1|")
    for left, right in merges:
        seq = F.replace(
            seq, F.lit(f"|{left}||{right}|"), F.lit(f"|{left}{right}|")
        )
    got = {
        r["w"]: r["syms"]
        for r in df.select(
            "w",
            F.split(F.btrim(seq, F.lit("|")), r"\|\|").alias("syms"),
        ).collect()
    }
    assert got == expected


@_settings
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
    ),
    tau=st.sampled_from([(1, 2), (4, 5), (1, 1)]),
)
def test_prefix_filter_jaccard_matches_reference(spark, docs, tau):
    """Prefix filtering + positional filter must lose NOTHING on
    adversarial corpora: tiny/empty docs (which tokenize to the ''
    shingle run), identical docs (J = 1), singleton-token docs, and
    tau = 1 (prefix length collapses to 1). Checked against a direct
    Python set-Jaccard over the same shingle sets."""
    from nyc_taxi_data_pipeline_spark.operators.dedup import prefix_filter_jaccard

    tau_num, tau_den = tau
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]

    def shingles(text: str) -> set[str]:
        toks = text.strip().lower().split()
        toks = toks if toks else [""]  # split('') -> [''] in Spark
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expected = {}
    for i, ta in rows:
        for j, tb in rows:
            if i >= j:
                continue
            sa, sb = shingles(ta), shingles(tb)
            inter = len(sa & sb)
            union = len(sa | sb)
            if tau_den * inter >= tau_num * union:
                expected[(i, j)] = round(inter / union, 9)

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in prefix_filter_jaccard(
            df, "text", "doc_id", tau_num=tau_num, tau_den=tau_den
        ).collect()
    }
    assert got == expected, (
        f"tau={tau_num}/{tau_den} missed={set(expected) - set(got)} "
        f"extra={set(got) - set(expected)}"
    )


@_settings
@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key
            st.integers(min_value=0, max_value=60),  # start day offset
        ),
        min_size=1,
        max_size=30,
    ),
    width=st.integers(min_value=1, max_value=10),
)
def test_interval_islands_match_python_reference(spark, spans, width):
    """Islands merging on adversarial small inputs (duplicate starts,
    nested spans, single rows) matches an independent interval-merge."""
    from pyspark.sql import Window as W

    rows = [
        (key, i, _BASE + timedelta(days=off), _BASE + timedelta(days=off + width))
        for i, (key, off) in enumerate(spans)
    ]
    # independent python merge: sort, sweep, count islands + covered days
    expected = {}
    by_key: dict[int, list] = {}
    for key, _i, s, e in rows:
        by_key.setdefault(key, []).append((s, e))
    for key, iv in by_key.items():
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expected[key] = (
            len(islands),
            sum((e - s).days for s, e in islands),
        )

    df = spark.createDataFrame(rows, ["key", "rid", "start_d", "end_d"])
    w = W.partitionBy("key").orderBy("start_d", "rid")
    m = df.withColumn(
        "prev_max_end",
        F.max("end_d").over(w.rowsBetween(W.unboundedPreceding, -1)),
    ).withColumn(
        "brk",
        F.when(
            F.col("prev_max_end").isNull()
            | (F.col("start_d") > F.col("prev_max_end")),
            1,
        ).otherwise(0),
    ).withColumn(
        "island_id", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    got = {
        r["key"]: (r["n"], r["days"])
        for r in m.groupBy("key", "island_id")
        .agg(F.min("start_d").alias("s"), F.max("end_d").alias("e"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.datediff("e", "s")).cast("bigint").alias("days"),
        )
        .collect()
    }
    assert got == expected


@_settings
@given(
    weights=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=100_000),
)
def test_largest_remainder_matches_python_reference(spark, weights, budget):
    """Hamilton apportionment: quotas sum exactly to the budget and match
    an independent implementation (ties broken by source name)."""
    from pyspark.sql import Window as W

    if sum(weights) == 0:
        weights = [w + 1 for w in weights]
    total = sum(weights)
    names = [f"s{i:02d}" for i in range(len(weights))]
    floor_q = {n: budget * w // total for n, w in zip(names, weights)}
    rem = {n: budget * w % total for n, w in zip(names, weights)}
    leftover = budget - sum(floor_q.values())
    order = sorted(names, key=lambda n: (-rem[n], n))
    expected = {
        n: floor_q[n] + (1 if i < leftover else 0) for i, n in enumerate(order)
    }
    assert sum(expected.values()) == budget

    df = spark.createDataFrame(
        list(zip(names, weights)), ["source", "n_tokens"]
    )
    b = F.lit(budget).cast("bigint")
    tot = df.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    shares = (
        df.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(b * F.col("n_tokens") / F.col("total"))
            .cast("bigint")
            .alias("floor_quota"),
            ((b * F.col("n_tokens")) % F.col("total")).cast("bigint").alias("rem"),
        )
    )
    spent = shares.agg(F.sum("floor_quota").cast("bigint").alias("spent"))
    got = {
        r["source"]: r["quota"]
        for r in shares.crossJoin(F.broadcast(spent))
        .select(
            "source",
            (
                F.col("floor_quota")
                + F.when(
                    F.row_number().over(
                        W.partitionBy(F.lit(1)).orderBy(
                            F.col("rem").desc(), "source"
                        )
                    )
                    <= b - F.col("spent"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("quota"),
        )
        .collect()
    }
    assert got == expected


@_settings
@given(
    members=st.sets(st.integers(0, 10**9), min_size=1, max_size=30),
    probes=st.sets(st.integers(0, 10**9), min_size=1, max_size=30),
)
def test_bloom_probe_never_misses_a_member(spark, members, probes):
    """bloom_build/bloom_probe contract on arbitrary key sets: every
    probed key that IS a member must pass (no false negatives, any m/k),
    and bloom_pass is defined (non-null) for every probe row."""
    from nyc_taxi_data_pipeline_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    mdf = spark.createDataFrame([(m,) for m in members], "key long")
    pdf = spark.createDataFrame([(p,) for p in probes | members], "key long")
    words = bloom_build(mdf, "key", m_bits=512, k=2)
    got = {
        r["key"]: r["bloom_pass"]
        for r in bloom_probe(pdf, words, "key", m_bits=512, k=2).collect()
    }
    assert set(got) == probes | members
    for key, ok in got.items():
        assert ok is not None
        if key in members:
            assert ok, f"member {key} failed the filter"


@_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(1, 8),
)
def test_kmv_topk_matches_python_reference(spark, rows, k):
    """kmv_topk == sorted(set(md5-48bit(key)))[:k] per group, computed
    independently in Python — including the salted two-level pruning
    path and the merge (union of per-half sketches re-minned equals the
    direct sketch)."""
    import hashlib

    from nyc_taxi_data_pipeline_spark.operators.sketch import kmv_topk

    def hv(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)

    df = spark.createDataFrame(rows, "g int, u long")
    got: dict[int, list[int]] = {}
    for r in kmv_topk(df, ["g"], "u", k=k, salt=4).collect():
        got.setdefault(r["g"], []).append(r["hv"])
    want: dict[int, list[int]] = {}
    for g in {g for g, _ in rows}:
        want[g] = sorted({hv(u) for gg, u in rows if gg == g})[:k]
    assert {g: sorted(v) for g, v in got.items()} == want
    # merge property: split rows in half, sketch each, union, re-min
    half = len(rows) // 2
    parts = [rows[:half], rows[half:]]
    union_rows = []
    for part in parts:
        if not part:
            continue
        pdf = spark.createDataFrame(part, "g int, u long")
        union_rows.extend(
            (r["g"], r["hv"]) for r in kmv_topk(pdf, ["g"], "u", k=k).collect()
        )
    mdf = spark.createDataFrame(union_rows, "g int, hv long")
    merged: dict[int, list[int]] = {}
    for r in kmv_topk(mdf, ["g"], "hv", k=k, prehashed=True).collect():
        merged.setdefault(r["g"], []).append(r["hv"])
    assert {g: sorted(v) for g, v in merged.items()} == want
