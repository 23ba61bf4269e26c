"""Edge-case unit tests for functions/corpus.py (the oracle parity test
covers the registered-query happy paths at scale)."""

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.functions import corpus


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a b", "en"),       # heavy bigram repetition
            (2, "x y z w v u", "en"),        # all distinct
            (3, "", "en"),                   # empty text
            (4, "solo", "de"),               # single token -> no bigrams
            (5, "  a b a b  ", "fr"),        # needs trim; dup tokens
        ],
        "doc_id long, text string, lang string",
    )


def test_repetition_stats_edges(docs):
    rows = {
        r["doc_id"]: r
        for r in corpus.repetition_stats(docs, "doc_id", "text", n=2).collect()
    }
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["dup_token_ratio"] == 0.0
    assert rows[3]["top_ngram_count"] == 0
    assert rows[3]["top_ngram_ratio"] == 0.0
    assert rows[4]["n_tokens"] == 1
    assert rows[4]["top_ngram_count"] == 0  # no bigram from one token
    # doc 1: 6 tokens, 2 distinct -> dup ratio 1 - 2/6
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["dup_token_ratio"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    # bigrams of doc 1: "a b" x3, "b a" x2 -> top count 3 of 5
    assert rows[1]["top_ngram_count"] == 3
    assert rows[1]["top_ngram_ratio"] == pytest.approx(3 / 5, abs=1e-6)
    assert rows[2]["dup_token_ratio"] == 0.0


def test_decontaminate_only_overlapping_docs(spark, docs):
    bench = spark.createDataFrame([(100, "a b a", "en")], "doc_id long, text string, lang string")
    res = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in corpus.decontaminate(docs, bench, n=2).collect()
    }
    # bench bigrams: {"a b", "b a"}; docs 1 and 5 share both; others none
    assert res == {1: 2, 5: 2}


def test_hot_ngrams_distinct_per_doc(docs):
    res = {
        r["gram"]: r["n_docs"]
        for r in corpus.hot_ngrams(docs, "doc_id", "text", n=2, min_docs=2).collect()
    }
    # "a b" appears 3x in doc 1 and 2x in doc 5 but counts once per doc
    assert res == {"a b": 2, "b a": 2}


def test_tfidf_rank_ties_break_by_term(docs):
    res = corpus.tfidf_top_terms(docs, "doc_id", "text", k=6).filter(
        F.col("doc_id") == 2
    ).orderBy("rank").collect()
    # all 6 terms of doc 2 are distinct corpus-unique -> equal scores,
    # ties broken by term ascending
    assert [r["term"] for r in res] == sorted(r["term"] for r in res)


def test_bm25_scores_only_matching_docs(docs):
    res = corpus.bm25_scores(docs, ["solo"], "doc_id", "text").collect()
    assert [r["doc_id"] for r in res] == [4]
    assert res[0]["score"] > 0


def test_sample_stratified_deterministic_and_drops_unlisted(docs):
    frac = {"en": 1.0, "de": 0.0}
    a = corpus.sample_stratified(docs, "lang", frac, "doc_id")
    b = corpus.sample_stratified(docs, "lang", frac, "doc_id")
    ids = sorted(r["doc_id"] for r in a.collect())
    assert ids == sorted(r["doc_id"] for r in b.collect())
    assert ids == [1, 2, 3]  # all en kept, de fraction 0, fr unlisted


def test_sample_stratified_rejects_bad_fraction(docs):
    with pytest.raises(ValueError):
        corpus.sample_stratified(docs, "lang", {"en": 1.5}, "doc_id")


def test_no_python_in_corpus_plans(docs, spark):
    bench = docs.limit(1)
    for df in [
        corpus.repetition_stats(docs),
        corpus.decontaminate(docs, bench),
        corpus.hot_ngrams(docs),
        corpus.tfidf_top_terms(docs),
        corpus.bm25_scores(docs, ["a"]),
        corpus.sample_stratified(docs, "lang", {"en": 0.5}, "doc_id"),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_corpus_ops_match_bruteforce_python(spark, seed):
    """Randomized cross-check: on corpora drawn from a tiny vocabulary
    (forcing heavy n-gram collisions), the Spark operators must equal a
    brute-force Python implementation exactly."""
    import random
    from collections import Counter

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "dd", "ee"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def toks(t):
        return [x for x in t.strip().split() if x]

    def grams(t, n):
        tk = toks(t)
        return [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]

    # repetition_stats
    got = {
        r["doc_id"]: r
        for r in corpus.repetition_stats(df, "doc_id", "text", n=2).collect()
    }
    for i, t in docs:
        tk, bg = toks(t), grams(t, 2)
        assert got[i]["n_tokens"] == len(tk)
        assert got[i]["n_distinct_tokens"] == len(set(tk))
        assert got[i]["top_ngram_count"] == (max(Counter(bg).values()) if bg else 0)

    # hot_ngrams (distinct-per-doc doc frequency)
    exp_df = Counter()
    for _, t in docs:
        for g in set(grams(t, 2)):
            exp_df[g] += 1
    got_hot = {
        r["gram"]: r["n_docs"]
        for r in corpus.hot_ngrams(df, "doc_id", "text", n=2, min_docs=2).collect()
    }
    assert got_hot == {g: c for g, c in exp_df.items() if c >= 2}

    # decontaminate against a benchmark slice
    bench_ids = {i for i, _ in docs if i % 5 == 0}
    bench_grams = set()
    for i, t in docs:
        if i in bench_ids:
            bench_grams.update(grams(t, 2))
    expected = {
        i: len(set(grams(t, 2)) & bench_grams)
        for i, t in docs
        if i not in bench_ids and set(grams(t, 2)) & bench_grams
    }
    train = df.filter(~F.col("doc_id").isin(list(bench_ids)))
    bench = df.filter(F.col("doc_id").isin(list(bench_ids)))
    got_dec = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in corpus.decontaminate(train, bench, n=2).collect()
    }
    assert got_dec == expected


def test_cap_per_group_two_phase_matches_one_shot(spark):
    # hot group: 200 rows in one source, 5 in another
    rows = [(i, "hot" if i < 200 else "cold") for i in range(205)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plain = corpus.cap_per_group(df, "source", 7, key="doc_id")
    salted = corpus.cap_per_group(df, "source", 7, key="doc_id", salt_parts=4)
    assert sorted(r["doc_id"] for r in plain.collect()) == sorted(
        r["doc_id"] for r in salted.collect()
    )
    counts = {
        r["source"]: r["n"]
        for r in salted.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"hot": 7, "cold": 5}


def test_assign_split_partitions_and_is_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = corpus.assign_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 500
    # full coverage at fractions summing to 1 (modulo the 1/2^32 top sliver)
    assert set(got.values()) <= {"train", "val", "test"}
    # membership is a pure function of the key: a disjoint later batch
    # assigns the overlap identically
    again = corpus.assign_split(
        df.filter(F.col("doc_id") < 100), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    for r in again.collect():
        assert got[r["doc_id"]] == r["split"]
    with pytest.raises(ValueError):
        corpus.assign_split(df, "doc_id", {"a": 0.9, "b": 0.2})
    # fractions summing to 1.0: the last split's branch must be
    # UNCONDITIONAL — a capped "key_hex < 'ffffffff'" comparison drops
    # keys whose md5 prefix is exactly ffffffff out of every split.
    # No NULL may appear, and the edge bound must not be in the plan.
    full = out._jdf.queryExecution().analyzed().toString()
    assert "ffffffff" not in full
    assert out.filter(F.col("split").isNull()).count() == 0
    # fractions summing to < 1.0 keep the bounded final range (the
    # remainder is intentionally held out as NULL)
    part = corpus.assign_split(df, "doc_id", {"a": 0.25})
    assert "40000000" in part._jdf.queryExecution().analyzed().toString()


def test_pack_chunks_covers_every_token_exactly_once(spark):
    df = spark.createDataFrame(
        [
            (1, "t " * 300, "en"),   # 300 tokens
            (2, "t " * 400, "en"),   # spans bins with budget 512
            (3, "t " * 1200, "en"),  # longer than 2 budgets
            (4, "", "en"),           # empty: dropped
            (5, "t " * 10, "de"),    # separate stream
        ],
        "doc_id long, text string, lang string",
    )
    out = corpus.pack_chunks(
        df, budget=512, id_col="doc_id", text_col="text", stream_col="lang"
    ).collect()
    # spans within a doc tile [0, n_tok) with no gaps or overlaps
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["bin"], r["tok_from"], r["tok_to"]))
    assert 4 not in by_doc
    expected_tokens = {1: 300, 2: 400, 3: 1200, 5: 10}
    for doc, spans in by_doc.items():
        spans.sort()
        assert spans[0][1] == 0
        assert spans[-1][2] == expected_tokens[doc]
        for (_, _, e0), (_, s1, _) in zip(spans, spans[1:]):
            assert e0 == s1
    # every bin holds exactly `budget` tokens except the last per stream
    by_bin = {}
    for r in out:
        key = (r["stream"], r["bin"])
        by_bin[key] = by_bin.get(key, 0) + (r["tok_to"] - r["tok_from"])
    for (stream, b), n in by_bin.items():
        last = max(bb for (s2, bb) in by_bin if s2 == stream)
        assert n == 512 or b == last
    # en stream: 1900 tokens -> bins 0..3; de: 10 tokens -> bin 0
    assert by_bin[("en", 3)] == 1900 - 3 * 512
    assert by_bin[("de", 0)] == 10


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique one\nFOOTER"),
            (2, "COOKIE BANNER\nunique two\nFOOTER"),
            (3, "all original\nnothing shared"),
            (4, "COOKIE BANNER\nFOOTER"),  # everything removed
            (5, ""),                        # single empty line survives
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in corpus.dedup_lines(df, min_docs=2).collect()}
    assert got[1]["text_deduped"] == "unique one"
    assert got[1]["n_removed"] == 2
    assert got[2]["text_deduped"] == "unique two"
    assert got[3]["text_deduped"] == "all original\nnothing shared"
    assert got[3]["n_removed"] == 0
    assert got[4]["text_deduped"] == ""
    assert got[4]["n_removed"] == 2
    # empty lines are never counted as boilerplate
    assert got[5]["text_deduped"] == ""
    assert got[5]["n_removed"] == 0


def test_dedup_lines_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "z last\nDUP\na first"), (2, "DUP\nother")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in corpus.dedup_lines(df, min_docs=2).collect()}
    assert got[1]["text_deduped"] == "z last\na first"  # original order, not sorted


def test_trigram_logprob_scores_typical_above_gibberish(spark):
    rows = [(i, "the cat sat on the mat") for i in range(9)] + [(9, "zqxjkvzqxj")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in corpus.trigram_logprob(df).collect()}
    mean = lambda r: r["sum_logp"] / r["n_trigrams"]
    # the repeated sentence's trigrams dominate the corpus model;
    # the gibberish doc's trigrams are rare -> lower mean log-prob
    assert mean(got[0]) > mean(got[9])
    assert got[0]["n_trigrams"] == len("the cat sat on the mat") - 2


def test_trigram_logprob_short_docs_emit_zero_trigrams(spark):
    # a bare sequence(1, len-2) DESCENDS for len<3 (sequence(1,0) ==
    # [1,0]), fabricating two bogus trigrams per short doc and skewing
    # the shared model; the guarded explode must drop such docs, and
    # their absence must not perturb the counts of real docs
    rows = [(0, ""), (1, "ab"), (2, "abc"), (3, "abcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in corpus.trigram_logprob(df).collect()}
    assert 0 not in got and 1 not in got
    assert got[2]["n_trigrams"] == 1
    assert got[3]["n_trigrams"] == 2


def test_trigram_logprob_multiscript_model_not_hint_broadcast(spark):
    # on a multilingual corpus the distinct-trigram model is unbounded
    # (CJK reaches tens of millions of keys at 100 TB) — the doc-model
    # join must carry NO broadcast hint; the only sanctioned hint is the
    # one-row corpus total. AQE may still broadcast a small model at
    # runtime from observed size, which is the correct behavior.
    rows = [
        (0, "你好世界这是中文测试语料"),
        (1, "日本語のテキストです"),
        (2, "plain ascii text"),
        (3, "mixed 中文 and ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.trigram_logprob(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["n_trigrams"] == len("你好世界这是中文测试语料") - 2
    assert got[2]["n_trigrams"] == len("plain ascii text") - 2
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("ResolvedHint") <= 1


def test_materialize_mixture_invariants(spark):
    """Integer weights give exactly w copies; fractional weights split
    the stream deterministically; copy_n is dense 1..copies; repeated
    runs are bit-identical."""
    from incubator_gobblin_spark.functions import corpus

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id BIGINT, lang STRING",
    )
    mixed = corpus.materialize_mixture(
        df, weights={"a": 2.0, "b": 0.5}, stream_col="lang"
    )
    rows = mixed.groupBy("doc_id", "lang").count().collect()
    for r in rows:
        if r.lang == "a":
            assert r["count"] == 2  # integer weight: exact copies
        else:
            assert r["count"] == 1  # fractional: kept docs appear once
    n_b = sum(1 for r in rows if r.lang == "b")
    assert 0 < n_b < 100  # ~half of stream b kept, deterministically
    again = corpus.materialize_mixture(
        df, weights={"a": 2.0, "b": 0.5}, stream_col="lang"
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, mixed.collect())
    )
    # copy_n density
    dense = mixed.filter(F.col("lang") == "a").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_n")).alias("c")
    )
    assert all(r.c == [1, 2] for r in dense.collect())


def test_quality_classifier_matches_python_reference(spark):
    """Engine scores equal a per-token Python recomputation."""
    import hashlib

    from incubator_gobblin_spark.functions import corpus

    docs = [(1, "alpha beta gamma"), (2, "  one  "), (3, "x y z w")]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: (r.n_tokens, r.score_units, r.keep)
        for r in corpus.quality_classifier_units(df).collect()
    }

    def unit(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) - 128

    for doc_id, text in docs:
        toks = text.split()
        expected = sum(unit(t) for t in toks)
        assert got[doc_id] == (len(toks), expected, expected > 0)


def test_semantic_dedup_one_keeper_per_cluster(spark):
    """Exactly one keep per non-empty cluster, and the keeper is the
    centroid-nearest member (id tie-break)."""
    import math

    from incubator_gobblin_spark.functions import similarity

    cents = [[0.0, 0.0], [10.0, 10.0]]
    vecs = [
        (1, [0.1, 0.0]), (2, [0.2, 0.0]), (3, [9.9, 10.0]),
        (4, [10.0, 10.1]), (5, [0.1, 0.0]),  # exact tie with 1 -> id wins
    ]
    df = spark.createDataFrame(vecs, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = similarity.semantic_dedup(df, cents).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert set(by_cluster) == {0, 1}
    for cid, rows in by_cluster.items():
        keepers = [r.vec_id for r in rows if r.keep]
        assert len(keepers) == 1
    assert [r.vec_id for r in out if r.cluster_id == 0 and r.keep] == [1]
    assert [r.vec_id for r in out if r.cluster_id == 1 and r.keep] == [3]


def test_dsir_weights_tilt_toward_target_vocab(spark):
    """Documents sharing the target domain's vocabulary must score a
    higher mean log-ratio than documents of off-domain vocabulary, and
    n_tokens must count exactly the whitespace tokens."""
    rows = (
        [(i, "law court judge statute ruling", "en") for i in range(5)]
        + [(10 + i, "pizza recipe cheese oven dough", "de") for i in range(5)]
        + [(100, "law court judge", "de"), (101, "pizza cheese oven", "en")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in corpus.dsir_logratio(df, F.col("lang") == "en").collect()
    }
    assert out[100].n_tokens == 3 and out[101].n_tokens == 3
    # doc 100 uses en-dominant vocab, doc 101 de-dominant vocab
    m100 = out[100].sum_logratio / out[100].n_tokens
    m101 = out[101].sum_logratio / out[101].n_tokens
    assert m100 > m101


def test_dsir_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared", "en" if i % 2 else "de")
         for i in range(40)],
        "doc_id long, text string, lang string",
    )
    a = sorted(
        (r.doc_id, r.n_tokens, r.sum_logratio)
        for r in corpus.dsir_logratio(df, F.col("lang") == "en").collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, r.sum_logratio)
        for r in corpus.dsir_logratio(
            df.repartition(7), F.col("lang") == "en"
        ).collect()
    )
    assert a == b


def test_perplexity_buckets_terciles_and_ordering(spark):
    """Per language: bucket sizes differ by at most 1, and every head
    doc's mean log-prob >= every middle doc's >= every tail doc's."""
    import random

    rng = random.Random(7)
    words = ["the", "cat", "sat", "mat", "dog", "ran", "far", "qqq", "zzz"]
    rows = [
        (i, " ".join(rng.choices(words, k=20)), "en" if i % 2 else "fr")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = corpus.perplexity_buckets(df).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = {
            b: sum(1 for r in rs if r.ppl_bucket == b)
            for b in ("head", "middle", "tail")
        }
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        means = {
            b: [r.sum_logp / r.n_trigrams for r in rs if r.ppl_bucket == b]
            for b in ("head", "middle", "tail")
        }
        if means["head"] and means["middle"]:
            assert min(means["head"]) >= max(means["middle"]) - 1e-9
        if means["middle"] and means["tail"]:
            assert min(means["middle"]) >= max(means["tail"]) - 1e-9


def test_temperature_weights_compose_into_mixture(spark, sf_dir):
    """XLM-R/mT5 temperature sampling: alpha<1 up-samples tail
    languages; the multipliers feed materialize_mixture and the
    realized per-language copy counts land within the deterministic
    floor/ceil bounds of multiplier * n_docs."""
    from incubator_gobblin_spark.functions import corpus
    from incubator_gobblin_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tw = corpus.temperature_weights(docs, group_col="lang", alpha=0.3)
    rows = {r["lang"]: r for r in tw.collect()}
    n = {k: r["n_docs"] for k, r in rows.items()}
    # sampling probabilities sum to ~1 and flatten the distribution:
    # the head language's sample_prob < its raw share, tails' > theirs
    total = sum(n.values())
    s = sum(r["sample_prob"] for r in rows.values())
    assert abs(s - 1.0) < 1e-4
    head = max(n, key=n.get)
    tail = min(n, key=n.get)
    assert rows[head]["sample_prob"] < n[head] / total
    assert rows[tail]["sample_prob"] > n[tail] / total
    assert rows[tail]["multiplier"] > 1.0 > rows[head]["multiplier"]

    # alpha=1 is proportional: every multiplier == 1
    flat = corpus.temperature_weights(docs, group_col="lang", alpha=1.0)
    assert all(abs(r["multiplier"] - 1.0) < 1e-5 for r in flat.collect())

    # composition: materialize the computed mixture; per-language copy
    # counts obey the deterministic floor/ceil envelope of w * n
    weights = {k: r["multiplier"] for k, r in rows.items()}
    mixed = corpus.materialize_mixture(docs, weights, stream_col="lang")
    got = {
        r["lang"]: r["c"]
        for r in mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    import math

    for lang, w in weights.items():
        lo = math.floor(w) * n[lang]
        hi = math.ceil(w) * n[lang]
        assert lo <= got[lang] <= hi, (lang, w, got[lang], lo, hi)


def test_duplicated_spans_marks_cross_doc_runs(spark):
    # window=3: docs 1 and 2 share the exact 5-token run "a b c d e"
    # (three duplicated 3-windows each: abc, bcd, cde -> 5 covered
    # positions); doc 3 is all-original; doc 4 repeats its OWN trigram
    # twice -> within-doc duplication counts too.
    df = spark.createDataFrame(
        [
            (1, "a b c d e unique1"),
            (2, "prefix2 a b c d e"),
            (3, "nothing shared here at all"),
            (4, "x y z x y z"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus.duplicated_spans(df, window=3, min_count=2).collect()
    }
    assert got[1]["dup_windows"] == 3 and got[1]["covered_tokens"] == 5
    assert got[1]["n_tokens"] == 6
    assert got[2]["dup_windows"] == 3 and got[2]["covered_tokens"] == 5
    assert got[3]["dup_windows"] == 0 and got[3]["covered_tokens"] == 0
    # doc 4: windows xyz@1, yzx@2, zxy@3, xyz@4 -> xyz occurs twice ->
    # starts {1,4} cover positions 1..3 and 4..6 = all 6 tokens
    assert got[4]["dup_windows"] == 2 and got[4]["covered_tokens"] == 6
    assert got[4]["covered_ratio"] == 1.0
    assert got[5]["n_tokens"] == 0 and got[5]["covered_ratio"] == 0.0


def test_trim_duplicated_spans_rebuilds_in_order(spark):
    df = spark.createDataFrame(
        [
            (1, "keep1 a b c tail1"),
            (2, "keep2 a b c tail2"),
            (3, "a b c"),  # fully duplicated -> emptied
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus.trim_duplicated_spans(df, window=3, min_count=2).collect()
    }
    assert got[1]["text_trimmed"] == "keep1 tail1"
    assert got[1]["n_removed"] == 3
    assert got[2]["text_trimmed"] == "keep2 tail2"
    assert got[3]["text_trimmed"] == "" and got[3]["n_removed"] == 3


def test_duplicated_spans_hash_mode_matches_strings(spark):
    rows = [
        (i, f"shared run of five tokens plus unique{i} trailer words here")
        for i in range(6)
    ] + [(10, "completely different body of text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        corpus.duplicated_spans(df, window=4, min_count=2).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        corpus.duplicated_spans(
            df, window=4, min_count=2, hash_spans=True
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_unimax_uniform_when_budget_fits(spark):
    # plenty of capacity: every group gets budget/len(groups)
    rows = [(i, "a" if i < 40 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: r
        for r in corpus.unimax_weights(
            df, "lang", budget=60, epoch_cap=4.0
        ).collect()
    }
    assert got["a"]["alloc"] == 30.0 and got["b"]["alloc"] == 30.0
    assert got["a"]["epochs"] == 0.75  # 30/40
    assert got["b"]["epochs"] == 0.5   # 30/60


def test_unimax_caps_small_groups_and_redistributes(spark):
    # tiny group caps at epoch_cap; its unused share flows to the rest
    rows = [(i, "small" if i < 5 else "big") for i in range(105)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: r
        for r in corpus.unimax_weights(
            df, "lang", budget=100, epoch_cap=2.0
        ).collect()
    }
    assert got["small"]["alloc"] == 10.0   # capped: 2.0 * 5
    assert got["small"]["epochs"] == 2.0
    assert got["big"]["alloc"] == 90.0     # 100 - 10, within its cap of 200
    assert got["big"]["epochs"] == 0.9


def test_unimax_budget_exceeding_capacity_saturates(spark):
    rows = [(i, "x" if i % 2 == 0 else "y") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: r
        for r in corpus.unimax_weights(
            df, "lang", budget=10_000, epoch_cap=3.0
        ).collect()
    }
    # every group saturates at epoch_cap; surplus stays unallocated
    assert got["x"]["alloc"] == 30.0 and got["y"]["alloc"] == 30.0
    assert got["x"]["epochs"] == 3.0 and got["y"]["epochs"] == 3.0


def test_fit_linear_probe_recovers_exact_coefficients(spark):
    # y = 2 + 3*x1 - 0.5*x2 exactly -> the closed form must recover it
    rows = [
        (float(x1), float(x2), 2.0 + 3.0 * x1 - 0.5 * x2)
        for x1 in range(1, 7)
        for x2 in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = corpus.fit_linear_probe(df, ["x1", "x2"], "y").first()
    assert got["n"] == 24
    assert got["b0"] == 2.0 and got["b1"] == 3.0 and got["b2"] == -0.5


def test_fit_linear_probe_rejects_collinear_features(spark):
    rows = [(float(i), 2.0 * i, float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="degenerate|collinear"):
        corpus.fit_linear_probe(df, ["x1", "x2"], "y")


def test_shuffle_shards_reproducible_and_balanced(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(400)], "doc_id long"
    )
    a = corpus.shuffle_shards(df, num_shards=4, seed=7).collect()
    b = corpus.shuffle_shards(df, num_shards=4, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    # hash-uniform: no shard holds more than half the corpus
    assert max(len(v) for v in by_shard.values()) < 200
    # pos is a dense 1..n rank inside each shard
    for rows in by_shard.values():
        assert sorted(r["pos"] for r in rows) == list(range(1, len(rows) + 1))
    # a different seed produces a different order
    c = corpus.shuffle_shards(df, num_shards=4, seed=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_training_assembly_composes_end_to_end(spark):
    """The full training-data assembly line: UniMax weights ->
    materialize_mixture -> shuffle_shards -> pack_chunks. Every stage
    is a pure function of ids, so running the chain twice yields the
    identical artifact."""
    rows = [
        (i, "en" if i < 150 else "de", "tok " * 20)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def assemble():
        wdf = corpus.unimax_weights(df, "lang", budget=150, epoch_cap=2.0)
        weights = {r["lang"]: r["epochs"] for r in wdf.collect()}
        mixed = corpus.materialize_mixture(df, weights)
        # copies of one doc need distinct shuffle identities
        keyed = mixed.withColumn(
            "mix_id",
            F.concat_ws("#", F.col("doc_id").cast("string"), F.col("copy_n")),
        )
        sharded = corpus.shuffle_shards(keyed, id_col="mix_id", num_shards=4)
        return sorted(map(tuple, sharded.collect()))

    a = assemble()
    b = assemble()
    assert a == b and len(a) > 0
    # de (50 docs, epochs 1.5) up-samples into (50, 100]; en caps below 150
    n_mix = len(a)
    assert 50 < n_mix <= 150 + 100


def test_duplicated_spans_matches_bruteforce_on_random_corpus(spark):
    """Seeded randomized cross-check: a tiny-alphabet corpus maximizes
    accidental window collisions; a brute-force dict reference must
    agree exactly with the distributed plan on every doc."""
    import random

    rng = random.Random(1234)
    vocab = ["a", "b", "c", "d", "e"]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        for i in range(30)
    }
    W = 3
    # brute force
    counts = {}
    for toks in docs.values():
        for s in range(len(toks) - W + 1):
            counts[" ".join(toks[s:s + W])] = (
                counts.get(" ".join(toks[s:s + W]), 0) + 1
            )
    expect = {}
    for i, toks in docs.items():
        dup_starts = [
            s
            for s in range(len(toks) - W + 1)
            if counts[" ".join(toks[s:s + W])] >= 2
        ]
        covered = set()
        for s in dup_starts:
            covered.update(range(s, s + W))
        expect[i] = (len(toks), len(dup_starts), len(covered))

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["covered_tokens"])
        for r in corpus.duplicated_spans(df, window=W, min_count=2).collect()
    }
    assert got == expect


def test_mixture_weights_token_budgeting(spark):
    """size_col switches both weighting rules from document counts to
    token budgets — the unit real mixtures allocate."""
    # lang a: 2 docs x 100 tokens; lang b: 8 docs x 25 tokens -> equal
    # token mass, very different doc counts
    rows = [(i, "a", 100) for i in range(2)] + [
        (10 + i, "b", 25) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")

    t = {
        r["lang"]: r
        for r in corpus.temperature_weights(
            df, "lang", alpha=0.5, size_col="n_tok"
        ).collect()
    }
    # equal token mass -> p=0.5 each -> equal sample_prob
    assert t["a"]["n_docs"] == 200 and t["b"]["n_docs"] == 200
    assert t["a"]["sample_prob"] == t["b"]["sample_prob"] == 0.5

    u = {
        r["lang"]: r
        for r in corpus.unimax_weights(
            df, "lang", budget=300, epoch_cap=1.0, size_col="n_tok"
        ).collect()
    }
    # caps are 200 tokens each; budget 300 splits 150/150 (within caps)
    assert u["a"]["alloc"] == 150.0 and u["b"]["alloc"] == 150.0
    assert u["a"]["epochs"] == 0.75


def test_trim_contaminated_spans_cuts_benchmark_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "intro words then the secret eval answer here plus tail"),
            (2, "nothing from the benchmark at all in this document"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "question: the secret eval answer here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus.trim_contaminated_spans(
            train, bench, window=4
        ).collect()
    }
    # doc 1: bench 4-grams "the secret eval answer" + "secret eval answer
    # here" cover tokens 4..8 ("the secret eval answer here") -> removed
    assert got[1]["n_removed"] == 5
    assert got[1]["text_clean"] == "intro words then plus tail"
    assert got[2]["n_removed"] == 0
    assert (
        got[2]["text_clean"]
        == "nothing from the benchmark at all in this document"
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------


def test_bpe_train_toy_corpus(spark):
    """The Sennrich toy corpus: merge order is fully determined by the
    frequency-weighted pair counts with (count desc, pair lex) ties."""
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame(
        [(0, "low low low lower lower newest newest newest widest")],
        "id long, text string",
    )
    merges = C.bpe_train(df, "text", 4)
    # counts: lo=5, ow=5, we=5, es=4, st=4 ... -> lo, then low, then es, est
    assert merges == [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]


def test_bpe_train_batched_equals_sequential_toy(spark):
    """The batched trainer must produce the EXACT merge list of the
    sequential reference loop on the Sennrich toy corpus — batching is
    a jobs optimization, never an algorithm change."""
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame(
        [(0, "low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest")],
        "id long, text string",
    )
    seq = C.bpe_train_sequential(df, "text", 10)
    # driver_local_max_words=0 forces the DISTRIBUTED round machinery
    # (the default would auto-degrade this tiny corpus to the local
    # path, which test_bpe_train_local_path_equals_distributed pins)
    bat = C.bpe_train(df, "text", 10, driver_local_max_words=0)
    one = C.bpe_train(df, "text", 10, max_batch=1, driver_local_max_words=0)
    loc = C.bpe_train(df, "text", 10)  # auto-degraded local path
    assert bat == seq
    assert one == seq
    assert loc == seq


def test_bpe_train_batched_equals_sequential_real_sample(spark, sf_dir):
    """Merge-list equality on real corpus text (the conflict/dominance/
    collision stopping rules under natural pair-count ties), plus the
    checkpoint path (checkpoint_every smaller than the merge count)."""
    from incubator_gobblin_spark.functions import corpus as C
    from incubator_gobblin_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200).cache()
    try:
        seq = C.bpe_train_sequential(docs, "text", 12)
        bat = C.bpe_train(
            docs, "text", 12, checkpoint_every=4, driver_local_max_words=0
        )
        loc = C.bpe_train(docs, "text", 12)  # auto-degraded local path
        assert bat == seq
        assert loc == seq
        assert len(bat) == 12
    finally:
        docs.unpersist()


def test_bpe_select_exact_batch_stops_at_dominance_and_conflict():
    """Driver-side selection unit: a candidate whose count does not
    strictly dominate the pairs an earlier merge can create must END
    the batch (the sequential algorithm might pick the created pair),
    and a candidate whose count an earlier merge can CHANGE must end
    it too."""
    from incubator_gobblin_spark.functions.corpus import _select_exact_batch

    # ('e','s') accepted; by_left['s'] carries ('s','t')=9, so the bound
    # is 9 and ('l','o')=7 cannot be proven next: sequential would pick
    # the created ('es','t') first. Batch must be exactly [('e','s')].
    rows = [("e", "s", 9), ("s", "t", 9), ("l", "o", 7), ("o", "w", 7)]
    assert _select_exact_batch(rows, truncated=False, quota=10) == [("e", "s")]

    # disjoint, dominant candidates chain: ('a','b')=90 creates pairs
    # bounded by 5, so ('c','d')=80 is provably the next pick
    rows = [("a", "b", 90), ("c", "d", 80), ("b", "x", 5), ("y", "a", 5),
            ("d", "z", 4), ("w", "c", 4)]
    assert _select_exact_batch(rows, truncated=False, quota=10) == [
        ("a", "b"), ("c", "d")
    ]

    # conflict: ('b','c') has l == prior merge's right symbol -> its
    # count is unverifiable after ('a','b') applies; batch stops
    rows = [("a", "b", 90), ("b", "c", 80)]
    assert _select_exact_batch(rows, truncated=False, quota=10) == [("a", "b")]

    # self-merge blocks both sides of its symbol
    rows = [("a", "a", 90), ("x", "a", 3), ("a", "y", 2)]
    assert _select_exact_batch(rows, truncated=False, quota=10) == [("a", "a")]

    # fused-string collision ('a'+'b' == existing symbol 'ab') closes
    # the batch AFTER the colliding merge
    rows = [("a", "b", 90), ("ab", "q", 6), ("c", "d", 50), ("x", "y", 40)]
    assert _select_exact_batch(rows, truncated=False, quota=10) == [("a", "b")]


def test_bpe_segment_applies_merges_in_order(spark):
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame([(0, "low lower newest")], "id long, text string")
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"), ("e", "w"), ("ew", "est")]
    out = C.bpe_segment(df, "text", merges).select("bpe_tokens").collect()[0][0]
    assert list(out) == ["low", "low", "e", "r", "n", "ewest"]


def test_bpe_merge_overlap_resolves_left_first(spark):
    """Greedy left-to-right: merging (a,a) in 'aaa' yields [aa, a]."""
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame([(0, "aaa")], "id long, text string")
    out = C.bpe_segment(df, "text", [("a", "a")]).select("bpe_tokens").collect()[0][0]
    assert list(out) == ["aa", "a"]


def test_bpe_train_stops_when_no_pairs_left(spark):
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame([(0, "ab ab")], "id long, text string")
    merges = C.bpe_train(df, "text", 10)
    assert merges == [("a", "b")]  # after 'ab' fuses, no adjacent pairs remain


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame(
        [(0, "ab ab ab"), (1, "bc")], "id long, text string"
    )
    pdf = C.bpe_pair_counts(df, "text", k=10).toPandas()
    got = dict(zip(pdf["pair"], pdf["n"]))
    assert got == {"ab": 3, "bc": 1}


def test_bpe_segment_plan_size_guard(spark):
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame([(0, "ab")], "id long, text string")
    merges = [(f"x{i}", f"y{i}") for i in range(600)]
    with pytest.raises(ValueError, match="literal-plan bound"):
        C.bpe_segment(df, "text", merges)


def test_curate_to_tokenizer_pipeline_composes(spark, sf_dir):
    """This round's additions compose into the tokenizer-training leg
    of the assembly line: curate survivors -> entropy gate -> bpe_train
    on the gated corpus -> bpe_segment -> per-doc token counts feed
    pack_chunks. Deterministic end to end: two runs, identical packs."""
    from incubator_gobblin_spark.functions import text as T
    from incubator_gobblin_spark.jobs import curate as curate_job
    from incubator_gobblin_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)

    def run():
        survivors = curate_job.curate(train, bench)
        gated = survivors.join(
            T.char_entropy(survivors).filter(
                (F.col("entropy_bits") >= 2.0) & (F.col("entropy_bits") <= 5.5)
            ).select("doc_id"),
            "doc_id",
        )
        merges = corpus.bpe_train(gated.limit(50), "text", 4)
        seg = corpus.bpe_segment(gated, "text", merges).select(
            "doc_id", F.concat_ws(" ", "bpe_tokens").alias("bpe_text")
        )
        packed = corpus.pack_chunks(
            seg, budget=512, id_col="doc_id", text_col="bpe_text"
        )
        return merges, sorted(map(tuple, packed.collect()))

    m1, p1 = run()
    m2, p2 = run()
    assert m1 == m2 and len(m1) == 4
    assert p1 == p2 and len(p1) > 0


def test_mixture_weights_zero_mass_groups(spark):
    """A group whose size_col sums to zero gets weight/epochs 0 — not a
    ZeroDivisionError that kills the mixture job."""
    df = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 50), (3, "xx", 0), (4, "xx", 0)],
        "doc_id long, lang string, n_tok long",
    )
    tw = corpus.temperature_weights(df, "lang", alpha=0.5, size_col="n_tok")
    got = {r["lang"]: (r["sample_prob"], r["multiplier"]) for r in tw.collect()}
    assert got["xx"] == (0.0, 0.0)
    assert got["en"][0] == 1.0  # the only positive-mass group takes all

    uw = corpus.unimax_weights(df, "lang", budget=100, epoch_cap=2.0,
                               size_col="n_tok")
    gu = {r["lang"]: (r["alloc"], r["epochs"]) for r in uw.collect()}
    assert gu["xx"] == (0.0, 0.0)
    assert gu["en"][1] > 0


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_bpe_train_matches_bruteforce_python(spark, seed):
    """Randomized cross-check: on tiny-alphabet corpora (forcing heavy
    pair collisions and ties) the distributed trainer must produce the
    EXACT merge sequence of a reference pure-Python BPE with the same
    tie rule (count desc, then left/right lexicographic)."""
    import random
    from collections import Counter

    rng = random.Random(seed)
    vocab = ["ab", "aab", "bba", "abab", "ba"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # reference implementation: word-freq dict, greedy left-first merges
    freqs = Counter(w for _, t in docs for w in t.split() if w)
    words = {w: list(w) for w in freqs}

    def ref_merges(k):
        out = []
        for _ in range(k):
            pc = Counter()
            for w, syms in words.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += freqs[w]
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            out.append(best)
            fused = best[0] + best[1]
            for w, syms in words.items():
                merged, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == best[0]
                        and syms[i + 1] == best[1]
                    ):
                        merged.append(fused)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                words[w] = merged
        return out

    want = ref_merges(6)
    got = corpus.bpe_train(df, "text", 6)
    assert got == want


def test_unimax_null_group_matches_temperature_tolerance(spark):
    """A NULL group value is legal input to BOTH mixture operators:
    unimax_weights must not raise sorting (cap, group, n) tuples with a
    None group (temperature_weights already handles NULLs — the two
    must not diverge on the same frame)."""
    rows = [(i, None if i < 10 else "en") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: r
        for r in corpus.unimax_weights(
            df, "lang", budget=40, epoch_cap=4.0
        ).collect()
    }
    assert set(got) == {None, "en"}
    assert got[None]["n_docs"] == 10 and got["en"]["n_docs"] == 40
    assert got[None]["alloc"] + got["en"]["alloc"] == 40.0
    # temperature side accepts the same frame (non-divergence contract)
    tw = corpus.temperature_weights(df, "lang", alpha=0.5).collect()
    assert {r["lang"] for r in tw} == {None, "en"}


def test_bpe_segment_arrow_equals_literal_fold(spark, sf_dir):
    """The Arrow-batched tokenizer must produce token-for-token the
    same segmentation as the literal-plan Column fold on the same
    merge list — real corpus text plus the overlap edge cases."""
    from incubator_gobblin_spark.functions import corpus as C
    from incubator_gobblin_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    merges = C.bpe_train(docs, "text", 24)
    fold = C.bpe_segment(docs, "text", merges).select("doc_id", "bpe_tokens")
    arrow = C.bpe_segment_arrow(docs, "text", merges).select(
        "doc_id", "bpe_tokens"
    )
    f = {r["doc_id"]: list(r["bpe_tokens"]) for r in fold.collect()}
    a = {r["doc_id"]: list(r["bpe_tokens"]) for r in arrow.collect()}
    assert f == a

    edge = spark.createDataFrame(
        [(0, "aaa aaaa low lower newest"), (1, ""), (2, "aa")],
        "doc_id long, text string",
    )
    em = [("a", "a"), ("aa", "a"), ("l", "o"), ("lo", "w"), ("e", "s")]
    f2 = {r["doc_id"]: list(r["bpe_tokens"])
          for r in C.bpe_segment(edge, "text", em).collect()}
    a2 = {r["doc_id"]: list(r["bpe_tokens"])
          for r in C.bpe_segment_arrow(edge, "text", em).collect()}
    assert f2 == a2
    # "aaa": (a,a) greedy-left -> [aa,a], then (aa,a) -> [aaa];
    # "aaaa": (a,a) -> [aa,aa], (aa,a) finds no adjacent (aa,a) pair
    assert a2[0][:3] == ["aaa", "aa", "aa"]
    assert a2[1] == []


def test_bpe_segment_arrow_handles_large_vocab(spark):
    """Past the literal-plan bound the fold refuses and the Arrow
    tokenizer is the documented path — and it actually runs with a
    600-merge vocabulary."""
    from incubator_gobblin_spark.functions import corpus as C

    df = spark.createDataFrame([(0, "ab ab xy")], "doc_id long, text string")
    merges = [("a", "b")] + [(f"x{i}", f"y{i}") for i in range(599)]
    with pytest.raises(ValueError, match="bpe_segment_arrow"):
        C.bpe_segment(df, "text", merges)
    out = C.bpe_segment_arrow(df, "text", merges).collect()[0]["bpe_tokens"]
    assert list(out) == ["ab", "ab", "x", "y"]


def test_bpe_select_exact_batch_truncated_floor_guard():
    """With a TRUNCATED pair table, a fused symbol can collide with a
    below-cutoff symbol invisibly, and unseen old pairs hold up to the
    floor — the dominance bound must absorb the floor, so a candidate
    at floor+epsilon is NOT provable and ends the batch."""
    from incubator_gobblin_spark.functions.corpus import _select_exact_batch

    rows = [("a", "b", 100), ("c", "d", 52), ("e", "f", 50)]
    # truncated: floor = 50; after ('a','b') the reachable max of a
    # boosted/created pair is <= 0-neighbors(50 floor) + 50 = 100, so
    # ('c','d')=52 cannot be proven to be the sequential next pick
    assert _select_exact_batch(rows, truncated=True, quota=10) == [("a", "b")]
    # the SAME table untruncated proves ('c','d') fine
    assert _select_exact_batch(rows, truncated=False, quota=10) == [
        ("a", "b"), ("c", "d"), ("e", "f")
    ]
