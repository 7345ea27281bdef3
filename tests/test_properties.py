"""Property-based tests (hypothesis): physical-strategy equivalences
that must hold for ANY input, not just the fixtures — the two
latest-per-key plans, salted vs plain aggregation, and session
islands vs a direct Python reference implementation."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.operators.table import latest_per_key

EPOCH = datetime.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # key
        st.integers(min_value=0, max_value=50),    # ts offset (collisions likely)
        st.integers(min_value=0, max_value=100),   # value
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=events)
@settings(**_SETTINGS)
def test_latest_per_key_strategies_agree_on_any_input(spark, rows):
    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rows)],
        "k int, ts int, seq int, v int",
    )
    a = latest_per_key(df, ["k"], "ts", tiebreak="seq", method="max_by")
    b = latest_per_key(df, ["k"], "ts", tiebreak="seq", method="window")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and both agree with the obvious python reference
    want = {}
    for i, (k, t, v) in enumerate(rows):
        if k not in want or (t, i) > (want[k][1], want[k][2]):
            want[k] = (k, t, i, v)
    assert sorted(map(tuple, a.collect())) == sorted(want.values())


@given(rows=events)
@settings(**_SETTINGS)
def test_salted_agg_equals_plain_on_any_input(spark, rows):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k int, ts int, v int")
    got = {
        r.k: (r.n, r.total)
        for r in salted_agg(
            df,
            ["k"],
            partials=[(F.count(F.lit(1)), "pc"), (F.sum("v"), "ps")],
            finals=[("n", F.sum("pc")), ("total", F.sum("ps"))],
            salt_buckets=4,
        ).collect()
    }
    want = {}
    for k, _, v in rows:
        n, tot = want.get(k, (0, 0))
        want[k] = (n + 1, tot + v)
    assert got == want


@given(rows=events)
@settings(**_SETTINGS)
def test_session_islands_match_python_reference(spark, rows):
    from kafka_cdc_elasticsearch_pipeline_spark.operators.windows import session_agg

    gap_minutes = 5
    df = spark.createDataFrame(rows, "k int, mins int, v int").select(
        "k",
        (F.lit(EPOCH) + F.make_interval(mins=F.col("mins"))).cast("timestamp_ntz").alias("ts"),
        "v",
    )
    got = sorted(
        (r.k, r.session_start.isoformat(), r.n)
        for r in session_agg(
            df, "ts", f"{gap_minutes} minutes", ["k"], [F.count(F.lit(1)).alias("n")]
        ).collect()
    )
    # python reference: closed-interval merge (diff <= gap stays)
    by_key: dict[int, list[int]] = {}
    for k, t, _ in rows:
        by_key.setdefault(k, []).append(t)
    want = []
    for k, ts in by_key.items():
        ts.sort()
        start, n, prev = ts[0], 0, None
        for t in ts:
            if prev is not None and t - prev > gap_minutes:
                want.append((k, (EPOCH + datetime.timedelta(minutes=start)).isoformat(), n))
                start, n = t, 0
            n += 1
            prev = t
        want.append((k, (EPOCH + datetime.timedelta(minutes=start)).isoformat(), n))
    assert got == sorted(want)


# --- media codecs: decode(encode(x)) == x for ANY input ----------------------

import numpy as np  # noqa: E402


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31),
    filters=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(w, h, ch, seed, filters):
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.png import (
        png_decode,
        png_encode,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got_w, got_h, _, out = png_decode(png_encode(px, filter_cycle=tuple(filters)))
    assert (got_w, got_h) == (w, h)
    np.testing.assert_array_equal(out.reshape(px.shape), px)


@given(
    n=st.integers(min_value=1, max_value=500),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.audio import (
        wav_decode,
        wav_encode,
    )

    rng = np.random.default_rng(seed)
    shape = (n,) if ch == 1 else (n, ch)
    arr = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
    got_rate, got_ch, got_n, samples = wav_decode(wav_encode(arr, rate))
    assert (got_rate, got_ch, got_n) == (rate, ch, n)
    np.testing.assert_array_equal(samples.reshape(shape), arr.astype(np.int32))


@given(
    timescale=st.integers(min_value=1, max_value=10**6),
    duration=st.integers(min_value=0, max_value=2**31 - 1),
    w=st.integers(min_value=0, max_value=8192),
    h=st.integers(min_value=0, max_value=8192),
    n_tracks=st.integers(min_value=0, max_value=4),
)
@settings(max_examples=30, deadline=None)
def test_mp4_roundtrip_property(timescale, duration, w, h, n_tracks):
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.video import (
        mp4_build_minimal,
        mp4_parse_metadata,
    )

    got = mp4_parse_metadata(
        mp4_build_minimal(timescale, duration, w, h, n_tracks=n_tracks)
    )
    expect_wh = (w, h) if n_tracks else (0, 0)
    assert got == (timescale, duration, *expect_wh, n_tracks)


# --- r06 operators -----------------------------------------------------------

docs_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # source bucket
        st.text(
            alphabet="ab cd", min_size=0, max_size=24
        ),                                          # low-entropy text
    ),
    min_size=1,
    max_size=40,
)


@given(rows=docs_corpora)
@settings(**_SETTINGS)
def test_bpe_pair_counts_match_python_reference(spark, rows):
    """The distinct-word-weighted pair count must equal the naive
    per-token recount on ANY corpus (the vocabulary factorization is
    an optimization, not an approximation)."""
    from collections import Counter

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    got = {
        r.pair: r.pair_count for r in bpe_pair_counts(df, k=10_000).collect()
    }
    want: Counter = Counter()
    for _, text in rows:
        for word in text.lower().split():
            for i in range(len(word) - 1):
                want[word[i : i + 2]] += 1
    assert got == dict(want)


@given(rows=docs_corpora)
@settings(**_SETTINGS)
def test_bpe_train_matches_python_reference_trainer(spark, rows):
    """The full merge LOOP must equal a naive per-word python BPE
    trainer on ANY corpus — argmax tie order, greedy left-to-right
    application, and overlap consumption (a,a,a under (a,a) merges
    once) all included; a divergence in any iteration cascades into
    different later merges."""
    from collections import Counter

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.text import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    n_merges = 3
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train(df, n_merges=n_merges).orderBy("step").collect()
    ]

    vocab: Counter = Counter()
    for _, text in rows:
        for word in text.lower().split():
            if len(word) >= 2:
                vocab[word] += 1
    syms = {w: [c for c in w] for w in vocab}
    want = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, wf in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += wf
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((step, a, b, a + b, c))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == want

    # tokenizer APPLICATION: per-doc counts under the learned merges
    # must equal the reference tokenization (sub-2-char words = 1)
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.text import (
        bpe_token_counts,
    )

    got_counts = {
        r.doc_id: r.n_tokens
        for r in bpe_token_counts(df, n_merges=n_merges).collect()
    }
    want_counts: dict[int, int] = {}
    for i, (_, text) in enumerate(rows):
        toks = 0
        for word in text.lower().split():
            toks += len(syms[word]) if len(word) >= 2 else 1
        if text.lower().split():
            want_counts[i] = toks
    assert got_counts == want_counts


@given(
    rows=docs_corpora,
    alpha=st.sampled_from([1.0, 0.5, 0.25]),
    budget=st.sampled_from([0.25, 0.5, 0.9]),
)
@settings(**_SETTINGS)
def test_temperature_resample_invariants(spark, rows, alpha, budget):
    """On ANY corpus/alpha/budget: the kept set is a subset of the
    input, keep decisions are per-row deterministic (a row's fate
    never depends on the others beyond its source's rate), and
    alpha=1.0 keep-rates never exceed... the budget times source share
    cap (every source's cutoff <= HASH_BUCKETS)."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions.sampling import (
        HASH_BUCKETS,
        temperature_cutoffs,
        temperature_resample,
    )

    df = spark.createDataFrame(
        [(i, f"s{srcb}") for i, (srcb, _) in enumerate(rows)],
        "doc_id long, source string",
    )
    kept = temperature_resample(df, "source", "doc_id", alpha=alpha,
                                budget_frac=budget)
    kept_ids = {r.doc_id for r in kept.collect()}
    all_ids = {r.doc_id for r in df.collect()}
    assert kept_ids <= all_ids
    cuts = {
        r["source"]: r["__tr_cutoff"]
        for r in temperature_cutoffs(df, "source", alpha, budget).collect()
    }
    assert all(0 <= c <= HASH_BUCKETS for c in cuts.values())
    # determinism: a second plan build keeps the identical set
    kept2 = {r.doc_id for r in
             temperature_resample(df, "source", "doc_id", alpha=alpha,
                                  budget_frac=budget).collect()}
    assert kept_ids == kept2


@given(rows=docs_corpora, batch=st.sampled_from([2, 4, 8]))
@settings(**_SETTINGS)
def test_length_bucket_batches_invariants(spark, rows, batch):
    """On ANY corpus: every doc appears exactly once, batches never
    exceed the batch size, every batch holds docs of one bucket, and
    pad_waste is exactly batch-max minus own length (non-negative,
    zero for the longest member)."""
    from collections import Counter

    from kafka_cdc_elasticsearch_pipeline_spark.extensions.packing import (
        length_bucket_batches,
    )

    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    out = length_bucket_batches(df, batch_size=batch, bucket_width=4).collect()
    assert sorted(r.doc_id for r in out) == list(range(len(rows)))
    groups: dict = {}
    for r in out:
        assert r.bucket == r.n_tokens // 4
        assert r.pad_waste >= 0
        groups.setdefault((r.bucket, r.batch_id), []).append(r)
    for members in groups.values():
        assert len(members) <= batch
        mx = max(m.n_tokens for m in members)
        for m in members:
            assert m.pad_waste == mx - m.n_tokens


# small word alphabet over 3 symbols -> frequent pairs, frequent
# conflicts (shared symbols), and (a,a) self-overlap runs all arise
bpe_corpora = st.lists(
    st.text(alphabet="abc", min_size=2, max_size=6),
    min_size=1,
    max_size=15,
)


@given(words=bpe_corpora)
@settings(**_SETTINGS)
def test_bpe_batched_k1_equals_sequential_on_any_corpus(spark, words):
    """merges_per_step=1 IS the sequential trainer for ANY corpus —
    the delegation in text._bpe_learn rests on this equivalence, so it
    must hold beyond the fixture corpora (conflict-free by k=1,
    window=1 argmax, single-rule map apply == single-rule fold)."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import text as tx

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id bigint, text string"
    )
    bat = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in tx.bpe_train_batched(
            docs, n_steps=3, merges_per_step=1, window=1
        ).collect()
    ]
    # python reference: count weighted adjacent pairs over the distinct
    # vocab, argmax by (count desc, a, b), greedy left-to-right apply
    from collections import Counter

    vocab = Counter(w for w in words if len(w) >= 2)
    syms = {w: list(w) for w in vocab}
    want = []
    for step in range(1, 4):
        counts = Counter()
        for w, wf in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += wf
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((step, a, b, a + b, c))
        for w in vocab:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert bat == want


@given(words=bpe_corpora)
@settings(**_SETTINGS)
def test_bpe_batched_one_pass_apply_equals_rule_replay_on_any_corpus(spark, words):
    """For ANY corpus, the batched one-pass apply of a step's
    symbol-disjoint rules equals applying them one at a time — the
    property the single-pass map fold (and its (a,a) self-overlap run
    handling) must never break."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import text as tx

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id bigint, text string"
    )
    rules, vocab = tx._bpe_learn_batched(docs, n_steps=1, merges_per_step=3)
    got = {r.word: list(r.syms) for r in vocab.collect()}
    learned = [(r.left_sym, r.right_sym) for r in rules.collect()]

    def apply_rule(s, a, b):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    for w in {w for w in words if len(w) >= 2}:
        s = list(w)
        for a, b in learned:
            s = apply_rule(s, a, b)
        assert got[w] == s, (w, got[w], s)


# --- serving-pointer retirement over ARBITRARY flip histories -----------------
#
# Pointer ops are metadata-only (lakelog commit_record / manifest
# reads — no Spark), so hypothesis can afford real filesystem runs.

flip_histories = st.lists(
    st.integers(min_value=0, max_value=3),  # which of 4 roots to flip to
    min_size=1,
    max_size=10,
)


@given(flips=flip_histories, keep=st.integers(min_value=1, max_value=4))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_retire_safety_over_random_flip_histories(flips, keep, tmp_path_factory):
    """For ANY flip history and window depth: retire raises on the
    current target, refuses every root the last ``keep`` records
    reference (as root or previous) and every root the log never saw,
    and deletes exactly the rest — the model recomputed directly from
    the record sequence."""
    import os

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
        search_index as si,
    )

    base = tmp_path_factory.mktemp("retire_prop")
    ptr = str(base / "ptr")
    roots = [str(base / f"root{i}") for i in range(4)]
    for r in roots:
        os.makedirs(r, exist_ok=True)

    # build the model from the SAME dedup rule serving_pointer_set
    # applies (a flip to the current target publishes no record)
    records = []  # (root, previous)
    cur = None
    for i in flips:
        target = os.path.abspath(roots[i])
        if target == cur:
            continue
        records.append((target, cur))
        cur = target
    if not records:
        records.append((os.path.abspath(roots[flips[0]]), None))
        cur = records[0][0]
    for i in flips:
        si.serving_pointer_set(ptr, roots[i])

    recent_model: set[str] = set()
    ever_model: set[str] = set()
    for idx, (root, prev) in enumerate(reversed(records)):
        for r in (root, prev):
            if r:
                ever_model.add(r)
                if idx < keep:
                    recent_model.add(r)

    for r in roots:
        target = os.path.abspath(r)
        if target == cur:
            try:
                si.retire_index_root(ptr, r, history_keep=keep)
                raise AssertionError("current target must raise")
            except ValueError:
                assert os.path.isdir(r)
        else:
            expect = target in ever_model and target not in recent_model
            got = si.retire_index_root(ptr, r, history_keep=keep)
            assert got is expect, (records, keep, target)
            assert os.path.isdir(r) is (not expect)


@given(
    flips=flip_histories,
    keep=st.integers(min_value=1, max_value=4),
    log_keep=st.integers(min_value=1, max_value=4),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_retire_after_pointer_log_vacuum(flips, keep, log_keep, tmp_path_factory):
    """round-11 advice #4: for ANY flip history, after the pointer log
    itself is vacuumed to its last ``log_keep`` records, the normal
    retire path only witnesses the RETAINED records (vacuumed-away
    roots are refused — the documented leak, fixed by retiring before
    vacuuming), ``force=True`` retires exactly the not-current,
    not-recent roots, and the current target raises even under force."""
    import os

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
        search_index as si,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog

    base = tmp_path_factory.mktemp("retire_vac_prop")
    ptr = str(base / "ptr")
    roots = [str(base / f"root{i}") for i in range(4)]
    for r in roots:
        os.makedirs(r, exist_ok=True)

    records = []  # (root, previous) — dedup rule of serving_pointer_set
    cur = None
    for i in flips:
        target = os.path.abspath(roots[i])
        if target == cur:
            continue
        records.append((target, cur))
        cur = target
    if not records:
        records.append((os.path.abspath(roots[flips[0]]), None))
        cur = records[0][0]
    for i in flips:
        si.serving_pointer_set(ptr, roots[i])
    lakelog.vacuum(ptr, keep_last=log_keep, min_age_s=0.0)

    retained = records[-log_keep:]
    recent_model: set[str] = set()
    ever_model: set[str] = set()
    for idx, (root, prev) in enumerate(reversed(retained)):
        for r in (root, prev):
            if r:
                ever_model.add(r)
                if idx < keep:
                    recent_model.add(r)

    for r in roots:
        target = os.path.abspath(r)
        if target == cur:
            for f in (False, True):
                try:
                    si.retire_index_root(ptr, r, history_keep=keep, force=f)
                    raise AssertionError("current target must raise")
                except ValueError:
                    assert os.path.isdir(r)
        elif target in recent_model:
            assert si.retire_index_root(
                ptr, r, history_keep=keep, force=True
            ) is False
            assert os.path.isdir(r)
        else:
            # normal path: only log-witnessed roots retire; force
            # retires the rest (the post-vacuum escape hatch)
            witnessed = target in ever_model
            got = si.retire_index_root(ptr, r, history_keep=keep)
            assert got is witnessed, (records, keep, log_keep, target)
            if not witnessed:
                assert os.path.isdir(r)
                assert si.retire_index_root(
                    ptr, r, history_keep=keep, force=True
                ) is True
            assert not os.path.isdir(r)


# --- aggs compiler vs a direct Python reference ------------------------------

agg_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),              # hour offset
        st.one_of(st.none(), st.sampled_from("abcd")),       # key (nullable)
        st.one_of(st.none(), st.integers(0, 100)),           # metric value
    ),
    min_size=0,
    max_size=40,
)


@given(rows=agg_docs, size=st.integers(min_value=1, max_value=3))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_aggs_flat_matches_python_reference(spark, rows, size):
    """The one-rollup agg compiler vs a direct Python fold, for ANY
    frame (null keys, null metric values, empty input, tied counts)
    and any terms size: per-level doc_counts, ES null discipline (a
    null-keyed doc is in no bucket at that level or below but counts
    in its parent), value_count over non-nulls, and doc_count-desc /
    key-asc truncation with exact tie-breaks."""
    from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
        search_serve as serve,
    )

    df = spark.createDataFrame(
        [(EPOCH + datetime.timedelta(hours=h), k, v) for h, k, v in rows],
        "ts timestamp, k string, v bigint",
    )
    flat = serve.aggs_flat(
        df,
        {
            "day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {
                    "keys": {
                        "terms": {"field": "k", "size": size},
                        "aggs": {"nv": {"value_count": {"field": "v"}}},
                    }
                },
            }
        },
    )
    got = {
        (r["depth"], None if r["day"] is None else r["day"].isoformat(),
         r["keys"]): (r["doc_count"], r["nv"])
        for r in flat.collect()
    }

    # reference: plain dict folds
    def day(h):
        return (EPOCH + datetime.timedelta(hours=h)).replace(
            hour=0
        ).isoformat()

    # Spark's rollup over EMPTY input yields zero rows (no grand-total
    # row, unlike a global agg) — aggs_nested's root fallback supplies
    # the doc_count-0 / metric-null ES envelope for that case
    want = {} if not rows else {(0, None, None): (len(rows), None)}
    by_day: dict = {}
    for h, k, v in rows:
        by_day.setdefault(day(h), []).append((k, v))
    for d, items in by_day.items():
        want[(1, d, None)] = (len(items), None)
        per_key: dict = {}
        for k, v in items:
            if k is None:
                continue  # ES: null key → no bucket at this level
            cnt, nv = per_key.get(k, (0, 0))
            per_key[k] = (cnt + 1, nv + (0 if v is None else 1))
        kept = sorted(per_key.items(), key=lambda kv: (-kv[1][0], kv[0]))
        for k, (cnt, nv) in kept[:size]:
            want[(2, d, k)] = (cnt, nv)
    assert got == want
