"""Golden-pair style unit tests for converters and fuzzy-dedup/similarity
operators over constructed inputs (mirroring the reference's
input+expected converter test fixtures)."""

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.functions import dedup_fuzzy, multimodal, similarity, text
from incubator_gobblin_spark.operators import converters as C
from incubator_gobblin_spark.operators import dedup


@pytest.fixture(scope="module")
def nested_df(spark):
    data = [
        (1, {"id": "a", "url": "http://x", "meta2": {"depth": 2}}, ["t1", "t2"], "keep"),
        (2, {"id": "b", "url": "http://y", "meta2": {"depth": 3}}, ["t3"], "drop"),
    ]
    return spark.createDataFrame(
        data,
        "k int, meta struct<id:string,url:string,meta2:struct<depth:int>>, "
        "tags array<string>, flag string",
    )


def test_pick_fields_nested(nested_df):
    out = nested_df.transform(C.pick_fields(["meta.id", "meta.meta2.depth"]))
    assert out.columns == ["meta_id", "meta_meta2_depth"]
    rows = {r["meta_id"]: r["meta_meta2_depth"] for r in out.collect()}
    assert rows == {"a": 2, "b": 3}


def test_flatten_all(nested_df):
    out = C.flatten_all(nested_df)
    assert set(out.columns) == {"k", "meta_id", "meta_url", "meta_meta2_depth", "tags", "flag"}


def test_filter_and_project_chain(nested_df):
    chain = C.chain(C.filter_equals("flag", "keep"), C.project(["k", "tags"]))
    out = nested_df.transform(chain)
    assert out.columns == ["k", "tags"]
    assert out.count() == 1


def test_split_explode_roundtrip(spark):
    df = spark.createDataFrame([("a|b|c",)], "s string")
    rows = df.transform(C.split_to_rows("s", "|", out="tok")).select("tok").collect()
    assert [r["tok"] for r in rows] == ["a", "b", "c"]
    lst = df.transform(C.split_to_list("s", "|")).first()["s"]
    assert lst == ["a", "b", "c"]


def test_regex_extract_struct(spark):
    df = spark.createDataFrame(
        [("2024-01-15 ERROR conn timeout",)], "line string"
    )
    out = df.transform(
        C.regex_extract_struct(
            "line",
            {
                "date": (r"^(\S+)", 1),
                "level": (r"^\S+ (\w+)", 1),
                "msg": (r"^\S+ \w+ (.*)$", 1),
            },
        )
    ).first()
    assert out["date"] == "2024-01-15"
    assert out["level"] == "ERROR"
    assert out["msg"] == "conn timeout"


def test_dedup_argmax_tie_keeps_greatest_tiebreaker(spark):
    df = spark.createDataFrame(
        [("k1", 5, "a"), ("k1", 5, "b"), ("k1", 3, "z"), ("k2", 1, "q")],
        "key string, scn int, payload string",
    )
    out = dedup.dedup_argmax(df, ["key"], ["scn"], tie_breakers=["payload"])
    rows = {r["key"]: (r["scn"], r["payload"]) for r in out.collect()}
    assert rows == {"k1": (5, "b"), "k2": (1, "q")}
    # window formulation agrees
    out_w = dedup.dedup_argmax_window(df, ["key"], ["scn"], tie_breakers=["payload"])
    rows_w = {r["key"]: (r["scn"], r["payload"]) for r in out_w.collect()}
    assert rows_w == rows


def test_minhash_finds_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    far = "completely different words about spark engines and parquet files"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = dedup_fuzzy.minhash_candidate_pairs(
        df, "doc_id", "text", num_hashes=64, bands=16, shingle_n=2
    ).collect()
    got = {(r["id_l"], r["id_r"]) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = dedup_fuzzy.jaccard_pairs(df, "doc_id", "text", threshold=0.5, shingle_n=1)
    rows = {(r["id_l"], r["id_r"]): r["jaccard"] for r in out.collect()}
    assert rows == {(1, 2): 0.6}  # |{a,b,c}| / |{a,b,c,d,e}|


def test_simhash_identical_and_near(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally unrelated content knob dial switch lever"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup_fuzzy.simhash_near_dups(df, "doc_id", "text", max_hamming=0, prefix_bits=4)
    got = {(r["id_l"], r["id_r"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got


def test_cosine_topk_exact(spark):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=2)
    rows = [(r["neighbor_id"], r["sim"]) for r in out.collect()]
    assert rows[0][0] == 1  # most similar
    assert rows[1][0] == 2
    assert abs(rows[0][1] - 0.993884) < 1e-5


def test_lsh_topk_recall_on_clustered_vectors(spark):
    import random

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(4)]
    vecs = []
    vid = 0
    for b in base:
        for _ in range(10):
            vecs.append((vid, [x + rng.gauss(0, 0.05) for x in b]))
            vid += 1
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id").isin(0, 10, 20, 30))
    exact = similarity.cosine_topk(df, queries, k=3)
    approx = similarity.lsh_topk(df, queries, dim=16, k=3, num_bits=12, bands=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # tight clusters + 6 bands: recall far above chance


def test_ivf_assign(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.5, -0.5])],
        "vec_id long, embedding array<double>",
    )
    out = similarity.ivf_assign(df, centroids=[[0.0, 0.0], [10.0, 10.0]])
    rows = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert rows == {0: 0, 1: 1, 2: 0}


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("The quick brown fox and the dog",)], "text string"
    )
    row = df.select(
        text.token_count("text").alias("n"),
        text.stopword_count("text").alias("sw"),
        text.fingerprint("text").alias("fp"),
        text.ngrams("text", 2).alias("bi"),
    ).first()
    assert row["n"] == 7
    assert row["sw"] == 3  # The, and, the
    assert len(row["fp"]) == 32
    assert row["bi"][0] == "The quick" and len(row["bi"]) == 6


def test_multimodal_plumbing_fake_decode(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"payload-a")
    (d / "b.bin").write_bytes(b"payload-bb")
    df = multimodal.read_binary_dir(spark, str(d))
    assert df.count() == 2
    meta = multimodal.extract_image_meta(df, fake=True)
    rows = meta.collect()
    assert {r["mime"] for r in rows} == {"image/unknown"}
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in rows)
    feats = multimodal.image_features(meta, dim=8, fake=True)
    frows = feats.collect()
    assert all(len(r["feature"]) == 8 for r in frows)


def test_frame_sampling_plan(spark):
    df = spark.createDataFrame([("v1", 25)], "clip string, frame_count int")
    out = multimodal.sample_frames(df, every_n=10)
    assert [r["frame_index"] for r in out.collect()] == [0, 10, 20]


def test_asof_join_semantics(spark):
    from incubator_gobblin_spark.operators.joins import asof_join

    events = spark.createDataFrame(
        [(1, 10, "2024-01-05"), (2, 10, "2024-01-01"), (3, 20, "2024-01-10"),
         (4, 30, "2024-01-10")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    orders = spark.createDataFrame(
        [(10, "2024-01-03", 100.0), (10, "2024-01-05", 200.0),
         (20, "2024-01-01", 50.0), (40, "2024-01-01", 9.0)],
        "user_id long, odate string, amount double",
    ).withColumn("odate", F.col("odate").cast("timestamp"))

    out = asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="odate",
        value_cols=["odate", "amount"],
    )
    got = {r["event_id"]: (str(r["odate"])[:10], r["amount"]) for r in out.collect()}
    # event 1: exactly-simultaneous order matches (>= semantics)
    assert got[1] == ("2024-01-05", 200.0)
    # event 2: before any order for user 10 -> dropped (inner)
    assert 2 not in got
    # event 3: latest order at/before
    assert got[3] == ("2024-01-01", 50.0)
    # event 4: user 30 has no orders -> dropped
    assert 4 not in got

    left = asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="odate",
        value_cols=["odate", "amount"], how="left",
    )
    got_left = {r["event_id"]: r["amount"] for r in left.collect()}
    assert got_left[2] is None and got_left[4] is None and len(got_left) == 4


def test_cosine_pairs_exact_and_lsh_subset(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
        (4, [0.0, 0.99, 0.1, 0.0]),   # near-dup of 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_l"], r["id_r"])
        for r in similarity.cosine_pairs(df, threshold=0.9).collect()
    }
    assert exact == {(1, 2), (3, 4)}
    lsh = {
        (r["id_l"], r["id_r"])
        for r in similarity.cosine_near_dup_pairs(
            df, dim=4, threshold=0.9, num_bits=8, bands=8
        ).collect()
    }
    assert lsh <= exact  # candidates never invent pairs; recall may drop


def test_token_bucket_enforces_rate():
    import time
    from incubator_gobblin_spark.operators.throttle import TokenBucket, throttled

    bucket = TokenBucket(rate_per_sec=1000, burst=10)
    assert bucket.try_acquire(10)
    assert not bucket.try_acquire(5)  # bucket drained
    t0 = time.monotonic()
    bucket.acquire(5)  # ~5ms refill at 1000/s
    assert time.monotonic() - t0 >= 0.004

    # 30 rows above a 10-token burst at 1000 rows/s -> >= ~20ms total
    t0 = time.monotonic()
    out = list(throttled(range(30), rate_per_sec=1000, burst=10))
    assert out == list(range(30))
    assert time.monotonic() - t0 >= 0.015


def test_throttled_bytes_cost():
    import time
    from incubator_gobblin_spark.operators.throttle import throttled

    rows = [b"x" * 100] * 5  # 500 bytes at 10_000 B/s with 100 B burst
    t0 = time.monotonic()
    assert len(list(throttled(rows, rate_per_sec=10_000, burst=100, cost=len))) == 5
    assert time.monotonic() - t0 >= 0.03


def test_range_join_buckets_match_exactly(spark):
    from incubator_gobblin_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:05:00"), (2, 7, "2024-01-01 00:59:00"),
         (3, 7, "2024-01-01 02:00:00"), (4, 8, "2024-01-01 00:05:00")],
        "id long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        # interval spans two 1h buckets; boundary-inclusive both ends
        [(100, 7, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         (200, 9, "2024-01-01 00:00:00", "2024-01-01 23:00:00")],
        "wid long, k long, lo string, hi string",
    ).withColumn("lo", F.col("lo").cast("timestamp")).withColumn(
        "hi", F.col("hi").cast("timestamp"))

    out = range_join(left, right, left_ts="ts", lo="lo", hi="hi",
                     on=["k"], bucket="1 hour")
    got = {(r["id"], r["wid"]) for r in out.collect()}
    # ids 1,2 in window 100 (same key); id 3 outside; id 4 wrong key;
    # window 200 matches nothing (no key-9 rows). Each pair appears ONCE
    # even though window 100 spans two buckets.
    assert got == {(1, 100), (2, 100)}
    assert out.count() == 2


def test_asof_join_inner_keeps_null_value_columns(spark):
    """Regression: a matched right row carrying NULL in its value columns
    must survive how='inner' — the match indicator is the carried struct,
    not any particular value column."""
    from incubator_gobblin_spark.operators.joins import asof_join

    events = spark.createDataFrame(
        [(1, 10, "2024-01-05"), (2, 20, "2024-01-05")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    orders = spark.createDataFrame(
        [(10, "2024-01-03", None)],  # matched row with genuinely-NULL value
        "user_id long, odate string, amount double",
    ).withColumn("odate", F.col("odate").cast("timestamp"))

    out = asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="odate",
        value_cols=["amount"],
    )
    got = {r["event_id"]: r["amount"] for r in out.collect()}
    assert got == {1: None}  # event 1 matched (NULL amount kept); event 2 unmatched


def test_range_join_pre1970_and_clamped_span(spark):
    from incubator_gobblin_spark.operators.joins import range_join

    # pre-1970 timestamps are negative unix seconds: floor bucketing must
    # keep both sides consistent
    left = spark.createDataFrame(
        [(1, "1950-01-01 05:45:00"), (2, "1950-01-01 07:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(100, "1950-01-01 05:30:00", "1950-01-01 06:30:00")],
        "wid long, lo string, hi string",
    ).withColumn("lo", F.col("lo").cast("timestamp")).withColumn(
        "hi", F.col("hi").cast("timestamp"))
    out = range_join(left, right, left_ts="ts", lo="lo", hi="hi", bucket="1 hour")
    assert {(r["id"], r["wid"]) for r in out.collect()} == {(1, 100)}

    # one corrupt interval (hi centuries out) must not explode the stage:
    # the span clamps to max_span_buckets, keeping early matches only
    left2 = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-06-01 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right2 = spark.createDataFrame(
        [(9, "2024-01-01 00:00:00", "2286-01-01 00:00:00")],
        "wid long, lo string, hi string",
    ).withColumn("lo", F.col("lo").cast("timestamp")).withColumn(
        "hi", F.col("hi").cast("timestamp"))
    out2 = range_join(
        left2, right2, left_ts="ts", lo="lo", hi="hi",
        bucket="1 hour", max_span_buckets=48,
    )
    # id 1 inside the clamp window matches; id 2 is beyond the clamped
    # span of the corrupt interval and is (deliberately) dropped
    assert {(r["id"], r["wid"]) for r in out2.collect()} == {(1, 9)}


def test_fuzzy_dedup_degenerate_bucket_guards(spark):
    """Scale guard: a degenerate cluster (thousands of identical docs →
    one bucket per band) must not expand O(m²) pairs in a single row —
    over-cap buckets are dropped; empty docs never enter banding."""
    n = 5000
    rows = [(i, "the same boilerplate text repeated on every page of the crawl")
            for i in range(n)]
    rows += [(n + i, "") for i in range(50)]          # empty docs
    rows += [(n + 100, None)]                          # null text
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)

    pairs = dedup_fuzzy.minhash_candidate_pairs(
        df, "doc_id", "text", num_hashes=16, bands=4, max_bucket_size=100
    )
    assert pairs.count() == 0  # giant bucket dropped, empties excluded

    sim_pairs = dedup_fuzzy.simhash_near_dups(
        df, "doc_id", "text", max_hamming=3, prefix_bits=8, max_bucket_size=100
    )
    assert sim_pairs.count() == 0

    # under-cap clusters still expand: same corpus, cap above cluster size
    small = spark.createDataFrame(rows[:40] + rows[n:], "doc_id long, text string")
    ok = dedup_fuzzy.minhash_candidate_pairs(
        small, "doc_id", "text", num_hashes=16, bands=4, max_bucket_size=100
    )
    assert ok.count() == 40 * 39 // 2  # all identical-doc pairs, no empties


def test_cosine_lsh_zero_norm_and_bucket_cap(spark):
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)]   # one hot cluster
    rows += [(1000 + i, [0.0, 0.0, 0.0, 0.0]) for i in range(20)]  # zero vectors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = similarity.cosine_near_dup_pairs(
        df, dim=4, threshold=0.9, num_bits=8, bands=2, max_bucket_size=100
    )
    assert capped.count() == 0  # hot cluster over cap -> dropped; zeros excluded
    uncapped = similarity.cosine_near_dup_pairs(
        df, dim=4, threshold=0.9, num_bits=8, bands=2, max_bucket_size=400
    )
    assert uncapped.count() == 300 * 299 // 2  # zero vectors still excluded


def test_chunk_spans_geometry_and_edges(spark):
    """Chunk windows tile with the configured overlap; short and empty
    docs behave (one short chunk / zero chunks, never bogus spans)."""
    from incubator_gobblin_spark.functions.text import chunk_spans
    import pytest as _pytest

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(25))),  # 25 toks
            (2, "a b c"),                                # shorter than one chunk
            (3, ""),                                     # token-less
            (4, "   "),                                  # whitespace only
        ],
        "id int, text string",
    )
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", chunk_spans("text", chunk_tokens=10, overlap=4).alias("c")
        ).collect()
    }
    # 25 tokens, stride 6: chunks at 0,6,12,18 -> 1+ceil(15/6)=4 chunks
    assert [(c["chunk_id"], c["start_tok"], c["n_tokens"]) for c in out[1]] == [
        (0, 0, 10), (1, 6, 10), (2, 12, 10), (3, 18, 7)
    ]
    # consecutive chunks overlap by exactly `overlap` tokens
    c0, c1 = out[1][0]["chunk"].split(), out[1][1]["chunk"].split()
    assert c0[-4:] == c1[:4]
    assert [(c["chunk_id"], c["n_tokens"]) for c in out[2]] == [(0, 3)]
    assert out[3] == [] and out[4] == []
    with _pytest.raises(ValueError, match="overlap"):
        chunk_spans("text", chunk_tokens=8, overlap=8)


def test_redact_pii_patterns_and_order(spark):
    from incubator_gobblin_spark.functions.text import redact_pii
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [
            ("mail a.b+c@ex-am.ple.org end", "mail <EMAIL> end"),
            ("ssn 123-45-6789 end", "ssn <SSN> end"),
            ("ph 555-123-4567 or 555.123.4567", "ph <PHONE> or <PHONE>"),
            ("ip 192.168.0.1 end", "ip <IP> end"),
            ("plain text stays", "plain text stays"),
            # SSN must win over the phone shape (applied first)
            ("id 078-05-1120", "id <SSN>"),
        ],
        "t string, want string",
    ).select(redact_pii("t").alias("got"), "want").collect()
    for r in rows:
        assert r["got"] == r["want"]


def test_kmeans_fit_recovers_blob_centers(spark):
    """Lloyd's over DataFrame ops recovers well-separated blob centers
    and composes with ivf_assign to separate the blobs exactly."""
    import random

    from incubator_gobblin_spark.functions import similarity

    rng = random.Random(7)
    centers = [[0.0, 0.0, 10.0], [10.0, 0.0, 0.0], [0.0, 10.0, 0.0]]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_fit(df, k=3, iters=6)
    # every true center has a fitted centroid within 1.0 (noise is 0.5)
    for c in centers:
        best = min(sum((a - b) ** 2 for a, b in zip(c, f)) ** 0.5 for f in cents)
        assert best < 1.0, (c, cents)
    # assignment separates blobs: each cluster holds exactly one blob
    assigned = similarity.ivf_assign(df, cents).collect()
    blob_of_cluster = {}
    for r in assigned:
        blob = r["vec_id"] % 3
        cid = r["cluster_id"]
        assert blob_of_cluster.setdefault(cid, blob) == blob
    assert len(blob_of_cluster) == 3


def test_scd2_history_intervals_and_current_flag(spark):
    from incubator_gobblin_spark.operators.dedup import scd2_history

    df = spark.createDataFrame(
        [
            ("k1", 10, "a"),
            ("k1", 20, "b"),
            ("k1", 30, "c"),
            ("k2", 15, "x"),
        ],
        "k string, ts long, v string",
    )
    rows = {
        (r["k"], r["ts"]): r
        for r in scd2_history(df, keys=["k"], ts_col="ts").collect()
    }
    assert rows[("k1", 10)]["valid_to"] == 20
    assert rows[("k1", 20)]["valid_to"] == 30
    assert rows[("k1", 30)]["valid_to"] is None
    assert rows[("k1", 30)]["is_current"]
    assert rows[("k2", 15)]["is_current"]
    assert not rows[("k1", 10)]["is_current"]
    # every key has exactly one current version
    cur = [r for r in rows.values() if r["is_current"]]
    assert len(cur) == 2


def test_scd2_history_map_payload_and_explicit_tiebreakers(spark):
    # an unorderable payload column (map) must not break the window
    # sort: the default tiebreaker list skips it, and an explicit
    # narrow tiebreaker takes precedence over wide payload ordering
    from incubator_gobblin_spark.operators.dedup import scd2_history

    df = spark.createDataFrame(
        [
            ("k1", 10, 2, {"a": "1"}),
            ("k1", 10, 1, {"b": "2"}),
            ("k1", 20, 3, {"c": "3"}),
        ],
        "k string, ts long, seq int, attrs map<string,string>",
    )
    rows = scd2_history(df, keys=["k"], ts_col="ts").collect()
    assert len(rows) == 3  # default order skips the map column, no raise
    got = {
        (r["seq"]): r
        for r in scd2_history(
            df, keys=["k"], ts_col="ts", tiebreakers=["seq"]
        ).collect()
    }
    # ts tie broken by seq: seq=1 closes at the tied ts (10), seq=2 at 20
    assert got[1]["valid_to"] == 10
    assert got[2]["valid_to"] == 20
    assert got[3]["valid_to"] is None


def test_profile_columns_exact_and_approx_paths(spark):
    from incubator_gobblin_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "x long, s string",
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["x"]["n_rows"] == 4
    assert prof["x"]["n_nulls"] == 1
    assert prof["x"]["n_distinct"] == 2
    assert prof["x"]["min_value"] == "1" and prof["x"]["max_value"] == "2"
    assert prof["s"]["n_nulls"] == 1
    assert prof["s"]["n_distinct"] == 2
    # approx path keeps the same shape (values within HLL tolerance)
    approx = {
        r["column"]: r
        for r in profile_columns(df, exact_distinct=False).collect()
    }
    assert set(approx) == {"x", "s"}
    assert approx["x"]["n_rows"] == 4


def _make_bmp(width, height, pixel_value):
    """Minimal uncompressed 24-bit BMP with constant pixel bytes."""
    import struct

    row = width * 3
    pad = (-row) % 4
    img = (bytes([pixel_value]) * row + b"\x00" * pad) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(img), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return header + dib + img


def _make_wav(sample_rate, samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_multimodal_real_bmp_decode(spark, tmp_path):
    """The decode stage runs FOR REAL on the library-free image format:
    synthesized uncompressed BMPs flow through read_binary_dir ->
    mapInPandas decode and come back with exact dimensions and
    luminance."""
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.bmp").write_bytes(_make_bmp(5, 3, 100))
    (d / "b.bmp").write_bytes(_make_bmp(2, 2, 200))
    df = multimodal.read_binary_dir(spark, str(d), glob="*.bmp")
    got = {
        r.path.split("/")[-1]: r
        for r in multimodal.decode_bmp(df).collect()
    }
    a, b = got["a.bmp"], got["b.bmp"]
    assert (a.width, a.height, a.bpp) == (5, 3, 24)
    assert abs(a.mean_lum - 100.0) < 1e-9  # constant-pixel image
    assert (b.width, b.height, b.bpp) == (2, 2, 24)
    assert abs(b.mean_lum - 200.0) < 1e-9


def test_multimodal_real_wav_decode(spark, tmp_path):
    """PCM WAV decodes through the stdlib reader inside the Arrow
    stage: exact rate/channel/frame metadata and RMS."""
    import math

    d = tmp_path / "audio"
    d.mkdir()
    (d / "tone.wav").write_bytes(_make_wav(8000, [1000, -1000] * 50))
    (d / "quiet.wav").write_bytes(_make_wav(16000, [0] * 10))
    df = multimodal.read_binary_dir(spark, str(d), glob="*.wav")
    got = {
        r.path.split("/")[-1]: r
        for r in multimodal.decode_wav(df).collect()
    }
    t = got["tone.wav"]
    assert (t.sample_rate, t.n_channels, t.n_samples) == (8000, 1, 100)
    assert abs(t.rms - 1000.0) < 1e-9  # square wave: RMS == amplitude
    q = got["quiet.wav"]
    assert (q.sample_rate, q.n_samples, q.rms) == (16000, 10, 0.0)


def test_pq_encode_and_topk_invariants(spark):
    """PQ: codes land in [0, k); an exact duplicate of the query vector
    gets approx_dist equal to the query's own quantization residual —
    the minimum possible — and ranks first; top-k is deterministic
    under repartitioning."""
    import random

    rng = random.Random(11)
    dim, m, sub = 16, 4, 4
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)
    ]
    # vec 50 = exact copy of vec 0 (the query)
    vecs[50] = (50, list(vecs[0][1]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = [v for _, v in vecs[:8]]
    books = [[c[j * sub : (j + 1) * sub] for c in cents] for j in range(m)]

    codes = {r.vec_id: r.codes for r in similarity.pq_encode(df, books).collect()}
    assert all(0 <= c < 8 for cs in codes.values() for c in cs)
    assert codes[50] == codes[0]  # identical vectors encode identically

    top = similarity.pq_topk(
        df, list(vecs[0][1]), books, k=5, exclude_id=0
    ).collect()
    assert top[0].neighbor_id == 50
    # vec 0 is centroid 0 of every book: its copy's residual is 0
    assert top[0].approx_dist == 0.0
    again = similarity.pq_topk(
        df.repartition(5), list(vecs[0][1]), books, k=5, exclude_id=0
    ).collect()
    assert [(r.neighbor_id, r.approx_dist) for r in top] == [
        (r.neighbor_id, r.approx_dist) for r in again
    ]
    # the codegen'd unrolled formulation is bit-identical to the
    # compact transform default (same IEEE accumulation order)
    unrolled = similarity.pq_topk(
        df, list(vecs[0][1]), books, k=5, exclude_id=0, unroll=True
    ).collect()
    assert [(r.neighbor_id, r.approx_dist) for r in top] == [
        (r.neighbor_id, r.approx_dist) for r in unrolled
    ]
    codes_unrolled = {
        r.vec_id: r.codes
        for r in similarity.pq_encode(df, books, unroll=True).collect()
    }
    assert codes == codes_unrolled


def test_ivfpq_matches_pq_on_probed_cells(spark):
    """IVFPQ == PQ restricted to the probed cells (the composition
    invariant), and with n_probe = all cells it equals full PQ."""
    import random

    rng = random.Random(21)
    dim, m, sub = 16, 4, 4
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(80)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = [v for _, v in vecs[:4]]
    books = [[c[j * sub : (j + 1) * sub] for c in [v for _, v in vecs[:8]]]
             for j in range(m)]
    q = list(vecs[0][1])

    full_pq = similarity.pq_topk(df, q, books, k=10, exclude_id=0).collect()
    all_probe = similarity.ivfpq_topk(
        df, q, cents, books, k=10, n_probe=len(cents), exclude_id=0
    ).collect()
    assert [(r.neighbor_id, r.approx_dist) for r in full_pq] == [
        (r.neighbor_id, r.approx_dist) for r in all_probe
    ]

    narrow = similarity.ivfpq_topk(
        df, q, cents, books, k=10, n_probe=1, exclude_id=0
    ).collect()
    # the query's own cell is probed, so its exact duplicate-free
    # neighbors from that cell appear; every returned id must be a
    # member of the probed cell
    full_ids = {r.neighbor_id for r in full_pq}
    assert narrow  # cell 0 contains at least the query's neighbors
    # approx_dist values agree with full PQ for shared ids
    full_d = {r.neighbor_id: r.approx_dist for r in full_pq}
    for r in narrow:
        if r.neighbor_id in full_d:
            assert r.approx_dist == full_d[r.neighbor_id]


def test_char_entropy_separates_junk_from_text(spark):
    """Entropy ordering: repeated-char spam << natural text << uniform
    random-ish alphabet soup; empty docs are excluded (nothing scored)."""
    import string

    from incubator_gobblin_spark.functions import text as T

    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        (2, "the quick brown fox jumps over the lazy dog and runs away"),
        (3, string.ascii_lowercase + string.digits + ".,;:!?-+*/"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.char_entropy(df).toPandas().set_index("doc_id")
    assert 4 not in out.index
    assert out.loc[1, "entropy_bits"] == 0.0
    assert out.loc[1, "entropy_bits"] < out.loc[2, "entropy_bits"] < out.loc[3, "entropy_bits"]
    assert 3.0 < out.loc[2, "entropy_bits"] < 4.6
