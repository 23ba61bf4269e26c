"""Corpus-level text analytics for LLM training-data pipelines.

These operate across documents (vs. `functions/text.py` whose operators
are per-row projections): benchmark decontamination, repetition quality
signals, corpus-wide hot n-grams, TF-IDF term weighting, and BM25
retrieval scoring. They extend the reference's ingestion surface the
same way the dedup/similarity families do — Gobblin ships converters
and quality policies (gobblin-core/.../qualitychecker), not content
analytics; a 100 TB training-data pipeline needs both.

Scale shapes, by design:

- Tokenization/shingling is a pure-Column projection (no UDF, no
  shuffle) that pipelines into the aggregation that follows.
- Per-document aggregates group on the document id — one shuffle with
  map-side partial aggregation (counts collapse before the exchange).
- Decontamination broadcasts the benchmark side: an eval set is small
  by definition, so the 100 TB training side never shuffles at all.
- Corpus-wide n-gram aggregates shuffle the gram strings themselves;
  at full scale substitute ``xxhash64(gram)`` for the string to cut
  shuffle bytes ~10x (kept as strings here so external engines can
  reproduce results bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _toks(col: Column | str) -> Column:
    """Trimmed whitespace tokens with empties removed — the exact
    tokenization external engines replicate as
    ``list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def _word_ngrams(col: Column | str, n: int) -> Column:
    """Word n-grams over :func:`_toks` as array<string> (space-joined).
    The token array is bound once per row (text.bind_once): slice()
    inside the transform lambda would otherwise re-run the regex
    tokenize once per gram position — quadratic in document length."""
    from incubator_gobblin_spark.functions.text import bind_once

    def _grams_of(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )

    return bind_once(_toks(col), _grams_of)


def ngram_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    distinct_per_doc: bool = True,
) -> DataFrame:
    """(doc, gram) postings: one row per (document, word-n-gram).

    The shared projection under decontamination / hot-grams / TF-IDF.
    Pure projection + explode — no shuffle of its own; whatever
    aggregation follows supplies the exchange."""
    grams = _word_ngrams(text_col, n)
    if distinct_per_doc:
        grams = F.array_distinct(grams)
    return df.select(
        F.col(id_col).alias("doc"), F.explode(grams).alias("gram")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for each training document, the number
    of distinct word-``n``-grams it shares with the benchmark corpus.
    Rows with zero overlap are omitted (filter on the result to drop
    contaminated docs; anti-join the ids to keep the clean set).

    Output: (``id_col``, ``n_shared_ngrams``).

    100 TB shape: the benchmark's distinct grams are broadcast (an eval
    set is small by definition), so the training side is scanned once
    with NO shuffle before the per-doc count — which groups on the doc
    id with map-side combine. This is the n-gram-overlap
    decontamination used by LLM data pipelines (GPT-3 appendix C /
    PaLM-style 8-gram overlap; ``n`` is a dial)."""
    tg = ngram_postings(train, id_col, text_col, n)
    bg = ngram_postings(bench, id_col, text_col, n).select("gram").distinct()
    return (
        tg.join(F.broadcast(bg), "gram")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        .select(F.col("doc").alias(id_col), "n_shared_ngrams")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    - ``n_tokens`` / ``n_distinct_tokens`` and ``dup_token_ratio``
      (1 - distinct/total: the duplicate-token fraction),
    - ``top_ngram_count`` and ``top_ngram_ratio`` (occurrences of the
      single most frequent word-``n``-gram over total n-gram count —
      the "fraction of characters in the most common n-gram" family
      from the Gopher/MassiveText filters, at token granularity).

    Docs with fewer than ``n`` tokens report 0 counts and 0.0 ratios.

    Shape: ONE pass over the text. The per-doc token scalars ride the
    n-gram explode as grouping keys (they are functionally dependent on
    the doc id, so the key widens by two ints and nothing else) — a
    separate token-stats lineage would re-scan the corpus, since Spark
    shares no subplans across branches. explode_outer keeps gram-less
    docs alive through the aggregation. Two groupBys — (doc, gram) then
    doc — both with map-side partial aggregation, both partitioned by
    the doc id so AQE coalesces the exchange chain. No UDFs."""
    toks = _toks(text_col)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.explode_outer(_word_ngrams(text_col, n)).alias("gram"),
    )
    joined = (
        base.groupBy("doc", "n_tokens", "n_distinct_tokens", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc", "n_tokens", "n_distinct_tokens")
        .agg(
            F.max(F.when(F.col("gram").isNotNull(), F.col("_c"))).alias(
                "top_ngram_count"
            ),
            F.sum(F.when(F.col("gram").isNotNull(), F.col("_c"))).alias(
                "_n_grams"
            ),
        )
    )
    return joined.select(
        F.col("doc").alias(id_col),
        "n_tokens",
        "n_distinct_tokens",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.lit(1.0) - F.col("n_distinct_tokens") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_ratio"),
        F.coalesce(F.col("top_ngram_count"), F.lit(0)).alias("top_ngram_count"),
        F.round(
            F.coalesce(F.col("top_ngram_count") / F.col("_n_grams"), F.lit(0.0)), 6
        ).alias("top_ngram_ratio"),
    )


def hot_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide hot n-grams: word-``n``-grams appearing in at least
    ``min_docs`` DISTINCT documents, with their document frequency.
    Output: (``gram``, ``n_docs``).

    This is the n-gram-granularity form of cross-document exact
    substring detection (the suffix-array dedup family, Lee et al.
    "Deduplicating Training Data Makes Language Models Better",
    approximated at fixed span length): a gram shared by many docs
    marks boilerplate to strip before training.

    Shape: per-doc-distinct postings (array_distinct collapses repeats
    BEFORE the explode, so a doc repeating one gram 10^6 times emits it
    once), then one count-per-gram shuffle with map-side combine. At
    full scale group on ``xxhash64(gram)`` and keep an example string
    via ``min(gram)`` to cut shuffle width."""
    postings = ngram_postings(df, id_col, text_col, n, distinct_per_doc=True)
    return (
        postings.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the smoothed scikit-style variant;
    scores rounded to 6 decimals; ties broken by term ascending).
    Output: (``id_col``, ``term``, ``tfidf``, ``rank``).

    Shape: ONE pass over the text — (doc, term) counts aggregate once,
    then document frequency is a COUNT window over the term partition
    of those same rows (Spark shares no subplans across branches, so a
    second groupBy lineage would re-scan and re-explode the whole
    corpus; the window trades that second 100 TB scan for one exchange
    of the much smaller (doc, term) set). N arrives as a broadcast
    one-row cross join reading only the id column (never a driver
    collect); final per-doc top-k is a window over the doc partition.
    All JVM-side."""
    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(_toks(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), "term", "tfidf", "rank")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top: int | None = None,
) -> DataFrame:
    """BM25 retrieval scores for a bag-of-words query over the corpus —
    the classic search primitive (Robertson/Sparck Jones; the Okapi
    formulation with idf = ln(1 + (N - df + 0.5)/(df + 0.5))). Output:
    (``id_col``, ``score``) for documents matching at least one query
    term, scores rounded to 6 decimals; ``top`` keeps the best ``top``
    (score desc, id asc).

    Shape: the query terms are literals folded into the scan filter, so
    only matching (doc, term) rows survive the exchange; per-term df is
    a COUNT window over the term partition of the tf rows (a separate
    groupBy lineage would re-scan and re-explode the corpus — Spark
    shares no subplans across branches); N / avgdl ride one broadcast
    one-row aggregate (the only other text scan, agg-only with no
    explode). One shuffle on the doc id."""
    terms = F.array(*[F.lit(t) for t in query_terms])
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.size(_toks(text_col)).alias("dl"),
        F.explode(_toks(text_col)).alias("term"),
    )
    stats = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_toks(text_col))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.array_contains(terms, F.col("term")))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    # Per-term contributions are cast to decimal BEFORE the sum: decimal
    # addition is exact and order-independent, so the score is stable
    # under Spark's nondeterministic partial-aggregation order (and
    # reproducible by external engines summing in any order).
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_s",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).cast("decimal(18,8)"),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("_s").cast("double"), 6).alias("score"))
        .select(F.col("doc").alias(id_col), "score")
    )
    if top is not None:
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        scored = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top)
            .drop("_rn")
        )
    return scored


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: str,
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff the first 8 hex
    chars of ``md5(cast(key as string))`` fall below the stratum's
    fraction of the 32-bit hex space. Strata absent from ``fractions``
    are dropped.

    Unlike ``df.sampleBy`` (seeded but partitioning-dependent), the
    kept set is a pure function of the key — identical on every
    engine, every run, every partitioning, which is what a
    reproducible training-data pipeline needs (and what the oracle
    check requires). Pure-Column filter: pipelines into the scan,
    no shuffle. The hex-string comparison avoids any base-conversion
    or float-rounding divergence across engines."""
    key_hex = F.substring(F.md5(F.col(key).cast("string")), 1, 8)
    cond = F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0,1]")
        threshold = format(min(int(frac * 16**8), 16**8 - 1), "08x")
        cond = cond | (
            (F.col(strata_col) == stratum) & (key_hex <= F.lit(threshold))
            if frac >= 1.0
            else (F.col(strata_col) == stratum) & (key_hex < F.lit(threshold))
        )
    return df.filter(cond)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key: str,
    salt_parts: int | None = None,
) -> DataFrame:
    """Keep at most ``k`` rows per group, selected in deterministic
    md5-hex order of ``key`` (a uniform, engine-independent shuffle of
    each group — the C4/RefinedWeb "cap documents per domain" curation
    step; the reference's nearest analogue is NewestKSelectionPolicy,
    gobblin-data-management/.../policy/NewestKSelectionPolicy.java:42,
    with hash order standing in for version order).

    Scale: the plain path is one shuffle on ``group_col`` + a ranking
    window. A boilerplate-heavy crawl makes single domains hold
    millions of rows, so ``salt_parts=s`` switches to two-phase top-k:
    phase 1 ranks within (group, xxhash64(key) mod s) — the hot group's
    rows split across s cells, each capped at k — and phase 2 ranks the
    surviving <= k*s rows per group. Because the order key is a pure
    function of ``key``, both phases agree with the one-shot window
    bit-for-bit; the hot group never lands in one task with its full
    row set."""
    order = [F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()]
    if salt_parts:
        cell = F.pmod(F.xxhash64(F.col(key)), F.lit(salt_parts))
        w1 = Window.partitionBy(F.col(group_col), cell).orderBy(*order)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= k)
            .drop("_rn1")
        )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def assign_split(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 8 hex chars of
    ``md5(cast(key as string))`` land in consecutive ranges of the
    32-bit hex space sized by each split's fraction (fractions must sum
    to <= 1; any remainder maps to NULL, i.e. "held out"). A pure
    projection — no shuffle, no state, and membership is a function of
    the key alone, so re-runs, engine swaps, and incremental arrivals
    never move a row between splits (the property that keeps eval sets
    uncontaminated as the corpus grows)."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    key_hex = F.substring(F.md5(F.col(key).cast("string")), 1, 8)
    expr = F.lit(None).cast("string")
    cum = 0.0
    bounds: list[tuple[str, str | None]] = []
    names = list(splits.items())
    for i, (name, frac) in enumerate(names):  # insertion order = range order
        cum += frac
        # when fractions sum to 1.0 the final range must be UNBOUNDED:
        # a capped 'ffffffff' with strict '<' silently maps keys whose
        # md5 prefix is exactly ffffffff (~2^-32 of rows) to NULL,
        # dropping them from every split
        if i == len(names) - 1 and cum >= 1.0 - 1e-9:
            bounds.append((name, None))
        else:
            bounds.append((name, format(min(int(cum * 16**8), 16**8 - 1), "08x")))
    for name, hi in reversed(bounds):
        branch = F.lit(name) if hi is None else F.when(key_hex < F.lit(hi), F.lit(name)).otherwise(expr)
        expr = branch
    return df.withColumn(out, expr)


def pack_chunks(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid end-to-end
    in deterministic (stream, id) order and cut into fixed
    ``budget``-token training sequences; emits one row per
    (bin, document) with the document-relative token span
    [tok_from, tok_to) that bin consumes. Every bin is exactly
    ``budget`` tokens except the final one per stream — the classic
    GPT-style packing layout.

    Scale: the running token offset is a window cumsum partitioned by
    ``stream_col`` — each stream is an independent shard packed in
    parallel, which is how large pipelines shard packing (a single
    global stream would serialize the cumsum; don't do that at 100 TB
    — shard first, pack shards). Everything is integer Column
    arithmetic: no UDF, one shuffle on the stream key, and bins spanned
    by a document expand via ``sequence()`` bounded by
    ceil(doc_tokens/budget) — a document can only span as many bins as
    it has budget-fuls of tokens."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    ntok = F.size(_toks(text_col))
    stream = F.col(stream_col) if stream_col else F.lit("")
    w = (
        Window.partitionBy(stream)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = (
        df.withColumn("_n", ntok.cast("long"))
        .filter(F.col("_n") > 0)
        .withColumn("_end", F.sum("_n").over(w))
        .withColumn("_start", F.col("_end") - F.col("_n"))
    )
    b = F.lit(int(budget)).cast("long")
    bins = F.sequence(
        F.expr(f"_start div {int(budget)}"), F.expr(f"(_end - 1) div {int(budget)}")
    )
    out = (
        laid.withColumn("bin", F.explode(bins))
        .withColumn("_bs", F.greatest(F.col("bin") * b, F.col("_start")))
        .withColumn("_be", F.least((F.col("bin") + F.lit(1).cast("long")) * b, F.col("_end")))
        .select(
            *(
                [F.col(stream_col).cast("string").alias("stream")]
                if stream_col
                else []
            ),
            F.col("bin").cast("long").alias("bin"),
            F.col(id_col),
            (F.col("_bs") - F.col("_start")).cast("long").alias("tok_from"),
            (F.col("_be") - F.col("_start")).cast("long").alias("tok_to"),
        )
    )
    return out


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """C4-style cross-document line deduplication: any non-empty line
    that appears (trimmed-exact) in >= ``min_docs`` DISTINCT documents
    is boilerplate (navbars, cookie banners, license headers) and is
    removed from EVERY document; line order is otherwise preserved.
    Returns (id, n_lines, n_removed, text_deduped).

    Scale: two shuffles — one counting distinct docs per line (map-side
    partial agg collapses per-doc repeats first), one rebuilding
    documents. The hot-line set joins back by line equality: it is the
    duplicated subset only, never the full line corpus; at 100 TB
    substitute xxhash64(line) for the join key to cut shuffle bytes
    (kept as strings here for engine-portable oracle checks)."""
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    hot = (
        lines.filter(F.trim("_line") != "")
        .groupBy("_line")
        .agg(F.count_distinct("_id").alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_line")
    )
    kept = lines.join(hot, on="_line", how="left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text_deduped"),
    )
    totals = df.select(
        F.col(id_col).alias("_id"),
        (F.size(F.split(F.col(text_col), "\n"))).alias("n_lines"),
    )
    # left join: a document whose every line was hot vanishes from
    # `rebuilt` but must stay in the output as an emptied document
    return (
        totals.join(rebuilt, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("text_deduped"), F.lit("")).alias("text_deduped"),
        )
    )


def _dup_span_cover(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    min_count: int,
    hash_spans: bool,
) -> DataFrame:
    """(_id, _s, _pos): duplicated-window starts and the 1-based token
    positions they cover. A window (run of ``window`` consecutive
    tokens) is duplicated when its exact text occurs >= ``min_count``
    times corpus-wide (including repeats inside one document — a doc
    that repeats its own boilerplate dedups against itself, as in the
    suffix-array formulation). One shuffle: the corpus-wide occurrence
    count is a window function over the span key, so spans shuffle
    once and are annotated in place instead of groupBy + join-back.
    """
    spans = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_word_ngrams(F.col(text_col), window)).alias("_p0", "_span"),
    ).select(
        "_id",
        (F.col("_p0") + 1).alias("_s"),
        # hash_spans=True is the 100 TB path: the exchange carries an
        # 8-byte key instead of ~window full tokens per row. Collision
        # risk 2^-64-ish per pair; kept off by default so external
        # engines can replicate the count key verbatim.
        (F.xxhash64("_span") if hash_spans else F.col("_span")).alias("_k"),
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("_k"))
    dup = spans.withColumn("_c", cnt).filter(F.col("_c") >= min_count)
    return dup.select(
        "_id",
        "_s",
        F.explode(
            F.sequence(F.col("_s"), F.col("_s") + F.lit(window - 1))
        ).alias("_pos"),
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_count: int = 2,
    hash_spans: bool = False,
) -> DataFrame:
    """Exact-substring duplication statistics, the ExactSubstr shape of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022) at whitespace-token granularity: every run of ``window``
    consecutive tokens whose exact text occurs >= ``min_count`` times
    corpus-wide marks its tokens as duplicated. Returns per document
    (id, n_tokens, dup_windows, covered_tokens, covered_ratio) —
    covered_tokens is the count of DISTINCT positions under any
    duplicated window (overlapping windows don't double-count).

    Scale: three linear shuffles — span-count annotation (on the span
    key; pass ``hash_spans=True`` to shuffle 8-byte hashes instead of
    span text), per-doc coverage aggregation, and the totals join.
    Nothing is quadratic: a span duplicated m times contributes m rows,
    not m^2 pairs.
    """
    cov = _dup_span_cover(df, id_col, text_col, window, min_count, hash_spans)
    agg = cov.groupBy("_id").agg(
        F.count_distinct("_s").alias("_dw"),
        F.count_distinct("_pos").alias("_ct"),
    )
    totals = df.select(
        F.col(id_col).alias("_id"),
        F.size(_toks(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return totals.join(agg, on="_id", how="left").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.coalesce(F.col("_dw"), F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce(F.col("_ct"), F.lit(0)).cast("long").alias("covered_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce(F.col("_ct"), F.lit(0))
                / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("covered_ratio"),
    )


def trim_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_count: int = 2,
    hash_spans: bool = False,
) -> DataFrame:
    """The removal step of exact-substring dedup (Lee et al. 2022):
    every token covered by a duplicated ``window``-token run (see
    :func:`duplicated_spans`) is dropped and the document is rebuilt
    from the surviving tokens in order. Returns
    (id, n_tokens, n_removed, text_trimmed); a document consisting
    entirely of duplicated spans survives as an emptied row.

    Whitespace is normalized to single spaces by the rebuild (the
    token stream is the unit of dedup, not the raw bytes) — the same
    contract as :func:`dedup_lines` at line granularity.
    """
    cov = (
        _dup_span_cover(df, id_col, text_col, window, min_count, hash_spans)
        .select("_id", "_pos")
        .distinct()
    )
    tokpos = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_toks(F.col(text_col))).alias("_p0", "_tok"),
    ).select("_id", (F.col("_p0") + 1).alias("_pos"), "_tok")
    kept = tokpos.join(cov, on=["_id", "_pos"], how="left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("text_trimmed"),
    )
    totals = df.select(
        F.col(id_col).alias("_id"),
        F.size(_toks(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return totals.join(rebuilt, on="_id", how="left").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("text_trimmed"), F.lit("")).alias("text_trimmed"),
    )


def trim_contaminated_spans(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Span-level benchmark decontamination: instead of DROPPING every
    training document that overlaps the eval set (:func:`decontaminate`
    + filter — which throws away a whole book over one quoted test
    question), remove only the contaminated spans. A training token is
    contaminated when some ``window``-token run containing it appears
    verbatim anywhere in the benchmark; contaminated tokens are cut and
    the document is rebuilt from the survivors in order (whitespace
    normalized — same contract as :func:`trim_duplicated_spans`).
    Returns (id, n_tokens, n_removed, text_clean).

    Scale shape: the benchmark's DISTINCT window set is broadcast (an
    eval corpus is small by definition — the :func:`decontaminate`
    posture), so the 100 TB training side never shuffles to discover
    contamination; the only exchanges are the per-doc rebuild and the
    totals join, both on the doc id.
    """
    spans = train.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_word_ngrams(F.col(text_col), window)).alias("_p0", "_span"),
    ).select("_id", (F.col("_p0") + 1).alias("_s"), "_span")
    bspans = (
        bench.select(
            F.explode(_word_ngrams(F.col(text_col), window)).alias("_span")
        )
        .distinct()
    )
    cov = (
        spans.join(F.broadcast(bspans), on="_span")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("_s"), F.col("_s") + F.lit(window - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    tokpos = train.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_toks(F.col(text_col))).alias("_p0", "_tok"),
    ).select("_id", (F.col("_p0") + 1).alias("_pos"), "_tok")
    kept = tokpos.join(cov, on=["_id", "_pos"], how="left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    totals = train.select(
        F.col(id_col).alias("_id"),
        F.size(_toks(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return totals.join(rebuilt, on="_id", how="left").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def trigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 1000,
) -> DataFrame:
    """Character-trigram language-model score (the CCNet/fastText-era
    quality-filter shape): the corpus itself is the model — P(tri) =
    corpus_count(tri) / corpus_total — and each document scores the
    mean log-probability of its trigrams (higher = more typical of the
    corpus; gibberish and boilerplate-of-another-language score low).
    Returns (id, n_trigrams, sum_logp) — mean = sum_logp / n_trigrams;
    the sum is emitted rather than the mean because the decimal sum is
    exact across engines while a final double division is not.

    Scale: trigram explosion is a pure-Column projection off the scan
    (bounded by ``max_chars`` per doc); the model is ONE count shuffle
    on the trigram. Scoring re-joins docs to the model on the trigram
    key WITHOUT a broadcast hint: distinct-trigram cardinality is only
    alphabet-bounded for ASCII — a multilingual (CJK) corpus reaches
    tens of millions of distinct trigrams, far past broadcast size, so
    the join must stay a shuffle join (Catalyst/AQE may still choose to
    broadcast a genuinely small model at runtime). Docs shorter than 3
    chars produce ZERO trigrams (guarded explode — a bare
    ``sequence(1, len-2)`` DESCENDS for len<3, fabricating entries) and
    are absent from the output, matching the SQL oracle's empty
    ``range``. Per-term log values round to 6 dp before an
    order-independent decimal sum so engines agree exactly."""
    from incubator_gobblin_spark.functions.text import bind_once as _bind_once

    clipped = F.lower(F.substring(F.col(text_col), 1, max_chars))
    tris = df.select(
        F.col(id_col).alias("_id"),
        # the clipped lowercased prefix is bound once per row
        # (text.bind_once): substr() inside the per-trigram lambda would
        # otherwise re-lowercase and re-clip the text once per trigram
        # position — quadratic in the scored prefix length
        F.explode(
            _bind_once(
                clipped,
                lambda clip: F.when(
                    F.length(clip) >= 3,
                    F.transform(
                        F.sequence(F.lit(1), F.length(clip) - F.lit(2)),
                        lambda i: clip.substr(i, F.lit(3)),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("_tri"),
    )
    model = tris.groupBy("_tri").agg(F.count(F.lit(1)).alias("_c"))
    # corpus total rides a broadcast one-row aggregate of the model —
    # no separate driver-side action, no second pass over the trigrams
    total = model.agg(F.sum("_c").cast("double").alias("_total"))
    scored = (
        tris.join(model, on="_tri")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_lp",
            F.round(F.log(F.col("_c") / F.col("_total")), 6).cast(
                "decimal(18,6)"
            ),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            # the exact decimal SUM, not the average: a final double
            # division can land on a .5e-6 rounding boundary and flip
            # the last digit between engines; the sum is exact by
            # construction (6-dp decimals, magnitude far below 2^53)
            F.sum("_lp").cast("double").alias("sum_logp"),
        )
    )
    return scored.select(F.col("_id").alias(id_col), "n_trigrams", "sum_logp")


def quality_classifier_units(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed-linear-model document quality scoring — the fasttext-style
    classifier gate of modern training-data pipelines (a logistic
    model over hashed bag-of-words features), as a pure Column
    projection.

    Each token's feature weight is derived from its hash: the first
    byte of ``md5(token)`` minus 128, an integer in [-128, 127] — a
    deterministic random-projection weight vector both engines compute
    identically (a production deployment substitutes TRAINED weights by
    broadcast-joining a (bucket, weight) table on the same hash; the
    plan shape is unchanged). The document score is the integer SUM of
    token weights — integer end to end, so no float accumulation-order
    hazard exists for the oracle gate — and ``keep`` is the
    positive-score decision.

    Scale: no shuffle and no UDF — tokenize, transform, aggregate are
    all Column expressions pipelined into whatever follows; at 100 TB
    this runs at scan speed and the classifier gate composes with
    quality.check_rows like any other row policy."""
    toks = _toks(text_col)
    unit = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 2), 16, 10).cast("long") - 128
    )
    score = F.aggregate(
        F.transform(toks, unit), F.lit(0).cast("long"), lambda a, x: a + x
    )
    out = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_units"),
    ).filter(F.col("n_tokens") > 0)
    return out.withColumn("keep", F.col("score_units") > 0)


def materialize_mixture(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    stream_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-mixture materialization: each document is
    repeated according to its stream's sampling weight — floor(w) whole
    copies plus one more when the document's hash fraction falls below
    frac(w) (so a weight of 1.5 doubles a deterministic half of the
    stream; 0.5 keeps a deterministic half once). The epoch-mixing step
    of LLM data pipelines (domain up/down-sampling), with membership a
    pure function of the id — rebuilds, engine swaps, and incremental
    arrivals reproduce the exact same mixture.

    Emits one row per copy with ``copy_n`` (1-based) so downstream
    packing can interleave copies deterministically.

    Scale: a pure projection + explode — no shuffle, no UDF; the hash
    fraction is md5-based like assign_split, so mixture and split
    assignment stay consistent across engines. Weights are a plan
    literal (O(streams) CASE arms — streams are languages/domains, not
    ids)."""
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be non-negative")
    w = F.lit(float(default_weight))
    for name, wt in sorted(weights.items()):
        w = F.when(F.col(stream_col) == name, F.lit(float(wt))).otherwise(w)
    base = F.floor(w).cast("long")
    # hash fraction in [0, 1): first 8 md5 hex chars / 2^32 — both exact
    # in doubles, so the comparison is engine-stable
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0)
    )
    copies = base + (u < (w - F.floor(w))).cast("long")
    out = df.withColumn("_copies", copies).filter(F.col("_copies") > 0)
    return out.withColumn(
        "copy_n", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies")))
    ).drop("_copies")


def dsir_logratio(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every raw document by how much
    more likely its hashed bag-of-words is under the TARGET distribution
    (the in-domain subset selected by the ``target`` boolean Column)
    than under the RAW corpus distribution. Selection then keeps the
    top-weight documents — the importance-resampling step that tilts a
    web-scale crawl toward a curated domain without training a model.

    Features are hashed unigrams: bucket = first 16 bits of md5(token)
    mod ``n_buckets`` — deterministic across engines, so the oracle
    recomputes the identical model. Both distributions use add-one
    smoothing over the bucket space; the per-token log-ratio rounds to
    6 dp and sums through an exact decimal, giving an
    accumulation-order-free ``sum_logratio`` (mean = sum / n_tokens).

    Scale: the model is ONE count shuffle that collapses to at most
    ``n_buckets`` rows (map-side combine reduces each task's output to
    n_buckets partials regardless of corpus size); totals ride a
    broadcast one-row aggregate; scoring re-joins tokens to the
    n_buckets-row model by broadcast — so the only per-document shuffle
    is the final groupBy(id). Raw and target counts come out of the
    SAME aggregation pass (target is a count-if), not two corpus scans."""
    if n_buckets < 2 or n_buckets > 65536:
        raise ValueError("n_buckets must be in [2, 65536]")
    toks = df.select(
        F.col(id_col).alias("_id"),
        target.cast("boolean").alias("_tgt"),
        F.explode(_toks(text_col)).alias("_t"),
    ).withColumn(
        "_b",
        F.conv(F.substring(F.md5(F.col("_t")), 1, 4), 16, 10).cast("long")
        % F.lit(n_buckets),
    )
    model = toks.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_raw_c"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_tgt_c"),
    )
    totals = model.agg(
        F.sum("_raw_c").cast("double").alias("_raw_t"),
        F.sum("_tgt_c").cast("double").alias("_tgt_t"),
    )
    nb = F.lit(float(n_buckets))
    lr = F.round(
        F.log((F.col("_tgt_c") + 1) / (F.col("_tgt_t") + nb))
        - F.log((F.col("_raw_c") + 1) / (F.col("_raw_t") + nb)),
        6,
    ).cast("decimal(18,6)")
    scored = (
        toks.join(F.broadcast(model), on="_b")
        .crossJoin(F.broadcast(totals))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(lr).cast("double").alias("sum_logratio"),
        )
    )
    return scored.select(F.col("_id").alias(id_col), "n_tokens", "sum_logratio")


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    max_chars: int = 1000,
) -> DataFrame:
    """CCNet-style perplexity bucketing: score documents with the
    corpus trigram LM (:func:`trigram_logprob`) and split each language
    into head / middle / tail terciles by mean log-probability — the
    published CCNet pipeline keeps head+middle and drops (or
    down-weights) the tail. Deterministic: terciles come from an
    explicit rank ordered by (mean desc, id) — never ntile over an
    unspecified tie order — so engines agree on every boundary row.

    Scale: trigram_logprob's shuffles plus one id-join to recover the
    group column and one per-group window. The window partitions by
    language — bounded cardinality, and each partition sorts only its
    own documents."""
    scored = trigram_logprob(df, id_col=id_col, text_col=text_col, max_chars=max_chars)
    with_grp = scored.join(
        df.select(F.col(id_col), F.col(group_col)), on=id_col
    ).withColumn(
        "_mean", F.col("sum_logp") / F.col("n_trigrams")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy(group_col).orderBy(F.desc("_mean"), F.col(id_col))
    ranked = with_grp.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy(group_col))
    )
    bucket = (
        F.when(F.col("_rn") * 3 <= F.col("_n"), F.lit("head"))
        .when(F.col("_rn") * 3 <= F.col("_n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        F.col(id_col),
        F.col(group_col),
        "n_trigrams",
        "sum_logp",
        bucket.alias("ppl_bucket"),
    )


def c4_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning", §2.2) as one pure-Column pass:
    sentence count, the fraction of lines that are keepable (>= 5
    words AND terminal punctuation — C4 drops the rest), and the
    page-level contamination flags (lorem ipsum, curly brace).
    ``keep`` is the page decision: >= 3 sentences and neither flag.

    Scale: projection only — no shuffle, no UDF; composes with
    quality.check_rows as a row policy at scan speed."""
    t = F.col(text_col)
    low = F.lower(t)
    lines = F.split(t, r"\n")
    line_ok = lambda ln: (  # noqa: E731
        F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")) >= 5
    ) & ln.rlike(r'[.!?"]\s*$')
    kept = F.size(F.filter(lines, line_ok))
    n_sent = F.regexp_count(t, F.lit(r"[.!?]"))
    out = df.select(
        F.col(id_col),
        n_sent.cast("long").alias("n_sentences"),
        F.round(kept.cast("double") / F.size(lines), 6).alias("frac_lines_kept"),
        low.contains("lorem ipsum").alias("has_lorem"),
        t.contains("{").alias("has_brace"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_sentences") >= 3)
        & ~F.col("has_lorem")
        & ~F.col("has_brace"),
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
) -> DataFrame:
    """The Gopher/MassiveText document-quality rules (Rae et al. 2021,
    appendix A1.1) as one pure-Column pass: word count bounds, mean
    word length bounds, symbol-to-word ratio (# and ellipsis), and the
    fraction of words containing at least one alphabetic character.
    ``keep`` ANDs the thresholds (defaults are the paper's).

    Determinism: the ratios divide exact integer counts in doubles —
    no accumulation order exists — then round to 6 dp so both engines
    hash identically.

    Scale: projection only; at 100 TB this is scan-speed row policy
    material, like c4_rules."""
    n_words, mean_word_len, symbol_ratio, alpha_frac = _gopher_stats(text_col)
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
    ).filter(F.col("n_words") > 0)
    return out.withColumn(
        "keep",
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_frac") >= min_alpha_frac),
    )


def _gopher_stats(text_col: str) -> tuple[Column, Column, Column, Column]:
    """(n_words, mean_word_len, symbol_ratio, alpha_frac) Columns for
    the Gopher rules. Ratios are guarded with ``when(n_words > 0, ..)``
    — conditional branches evaluate lazily per row, so an empty
    document yields NULL instead of an ANSI divide-by-zero error
    (identical values for every non-empty doc)."""
    toks = _toks(text_col)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\.")).cast("long")
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("long")

    def ratio(num: Column) -> Column:
        return F.round(
            F.when(n_words > 0, num.cast("double") / n_words), 6
        )

    return n_words, ratio(sum_len), ratio(n_symbols), ratio(n_alpha)


def gopher_keep(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
) -> Column:
    """The :func:`gopher_rules` keep decision as a bare filter Column —
    for pipelines that drop rejects inline (scan-speed projection
    filter, no self-join back to the full rows). NULL-safe: an empty
    document's ratios are NULL, the conjunction is non-true, and the
    row is filtered."""
    n_words, mean_word_len, symbol_ratio, alpha_frac = _gopher_stats(text_col)
    return (
        n_words.between(min_words, max_words)
        & mean_word_len.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_frac >= min_alpha_frac)
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + sharding — the training-order
    step of LLM data pipelines: examples must arrive in a
    pseudo-random order that is REPRODUCIBLE (rebuilds, engine swaps,
    and resumed jobs replay byte-identical order). The shuffle key is
    ``md5(seed:id)`` — a pure function of the id, the same
    determinism idiom as :func:`assign_split` / `materialize_mixture`
    — so no RNG state exists anywhere. Returns
    (id, shard, pos): ``shard = key mod num_shards`` (uniform by the
    hash), ``pos`` = rank of the key within its shard.

    Scale: ONE shuffle. Each shard's rank is a window partitioned by
    shard, so parallelism equals ``num_shards`` in the rank stage —
    size num_shards to the writer parallelism you want (each shard is
    one sequentially-consumed training file, so per-shard ordering IS
    the contract; a global rank would serialize on one partition for
    no downstream benefit)."""
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    shard = F.pmod(key, F.lit(int(num_shards))).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        df.select(F.col(id_col), key.alias("_key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def fit_linear_probe(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Closed-form linear-probe training — the classifier-TRAINING step
    of quality-filter pipelines (the fastText/logreg-probe pattern:
    fit a tiny linear model on cheap features, score the corpus with
    it; :func:`quality_classifier_units` is the scoring half). Fits
    ``y ~ b0 + b1*x1 + b2*x2`` by the normal equations, solved with
    Cramer's rule on the driver.

    Scale shape: the distributed work is ONE aggregation producing the
    nine moment sums — map-side partial aggregation collapses the
    corpus to one row per partition before a single-row exchange, so
    training cost is a corpus scan regardless of size, and the solve
    is O(1) driver math (model state, the kmeans_fit precedent).

    Cross-engine determinism: each per-row product re-rounds to 6
    decimals and sums as DECIMAL(38,6) (exact, order-independent);
    the Cramer determinants are chained IEEE ops over identical
    doubles with identical association on both engines, and the final
    coefficients re-round to 6 decimals. Exactly two features: the
    3x3 system is closed-form; wider probes belong to an iterative
    fitter, not this operator.
    """
    if len(feature_cols) != 2:
        raise ValueError("fit_linear_probe solves the 2-feature closed form")
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    x1, x2, y = F.col(feature_cols[0]), F.col(feature_cols[1]), F.col(label_col)

    def dsum(c: Column) -> Column:
        return F.sum(F.round(c, 6).cast("decimal(38,6)")).cast("double")

    m = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(x1 * x1).alias("s11"),
        dsum(x1 * x2).alias("s12"),
        dsum(x2 * x2).alias("s22"),
        dsum(y).alias("sy"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
    ).first()
    n, s1, s2 = float(m["n"]), float(m["s1"]), float(m["s2"])
    s11, s12, s22 = float(m["s11"]), float(m["s12"]), float(m["s22"])
    sy, s1y, s2y = float(m["sy"]), float(m["s1y"]), float(m["s2y"])
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    if det == 0.0:
        raise ValueError("degenerate design matrix (collinear features)")
    return df.sparkSession.createDataFrame(
        [(int(n), _r6(det0 / det), _r6(det1 / det), _r6(det2 / det))],
        "n long, b0 double, b1 double, b2 double",
    )


def score_linear_probe(
    df: DataFrame,
    fit_row,
    feature_cols: list[str],
    score_col: str = "score",
) -> DataFrame:
    """Score every row with a probe fitted by :func:`fit_linear_probe`
    (``fit_row`` = its single output Row): ``b0 + b1*x1 + b2*x2``
    rounded to 6 decimals. The coefficients enter the plan as
    LITERALS — scoring is a pure shuffle-free projection at scan
    speed, the same shape as :func:`quality_classifier_units` (q92)."""
    x1, x2 = F.col(feature_cols[0]), F.col(feature_cols[1])
    expr = (
        F.lit(float(fit_row["b0"]))
        + F.lit(float(fit_row["b1"])) * x1
        + F.lit(float(fit_row["b2"])) * x2
    )
    return df.withColumn(score_col, F.round(expr, 6))


def unimax_weights(
    df: DataFrame,
    group_col: str,
    budget: float,
    epoch_cap: float = 4.0,
    size_col: str | None = None,
) -> DataFrame:
    """UniMax sampling (Chung et al. 2023, "UniMax: Fairer and More
    Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): allocate a total training budget of ``budget`` units
    across groups as UNIFORMLY as possible subject to a per-group
    repetition cap of ``epoch_cap`` epochs — the successor to
    temperature sampling (:func:`temperature_weights`) that never
    over-repeats a low-resource group no matter how hard it
    up-samples.

    Closed form: process groups ASCENDING by capacity
    ``cap_g = epoch_cap * n_g``; each receives
    ``alloc_g = min(cap_g, remaining / groups_left)`` — a group too
    small to take its uniform share is capped and its leftover is
    re-split among the rest. If the budget exceeds total capacity,
    every group saturates at its cap and the surplus stays
    unallocated (the paper's behavior: shrink the budget, don't
    over-epoch).

    Output: (group, n_docs, alloc, epochs); ``epochs = alloc / n_g``
    is the per-document multiplier :func:`materialize_mixture`
    consumes, so the two compose exactly like temperature_weights.

    ``size_col`` switches the unit from documents to a per-row SUM
    (token budgeting: budget and caps are then token counts — the
    paper's actual formulation).

    Scale shape: ONE count shuffle, then |groups| rows of model state
    to the driver for the sequential allocation (the kmeans_fit /
    temperature_weights precedent — the recurrence is inherently
    sequential in the group dimension, which is tiny). Cross-engine
    determinism: every chained value re-rounds to 6 decimals HALF_UP;
    a recursive CTE replays the identical recurrence in SQL."""
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    mass = (
        F.sum(F.col(size_col)).alias("n_docs")
        if size_col
        else F.count(F.lit(1)).alias("n_docs")
    )
    rows = df.groupBy(group_col).agg(mass).collect()
    # None-safe sort key: a NULL group is a legal grouping value
    # (temperature_weights handles it; the two mixture operators must
    # not diverge on the same input), and sorted() would otherwise
    # raise comparing None with str. NULL orders first, matching the
    # NULLS FIRST default of the oracle's ORDER BY.
    groups = sorted(
        ((_r6(float(epoch_cap) * (r["n_docs"] or 0)), r[group_col],
          int(r["n_docs"] or 0))
         for r in rows),
        key=lambda t: (t[0], t[1] is not None, t[1] if t[1] is not None else "", t[2]),
    )
    remaining = float(budget)
    out_rows = []
    for i, (cap, g, n) in enumerate(groups):
        # a zero-mass group (NULL/zero size sum) can absorb no budget:
        # alloc and epochs are 0, not a division error
        if n == 0:
            out_rows.append((g, 0, 0.0, 0.0))
            continue
        share = _r6(remaining / (len(groups) - i))
        alloc = min(cap, share)
        remaining = _r6(remaining - alloc)
        out_rows.append((g, n, alloc, _r6(alloc / n)))
    gtype = df.schema[group_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        out_rows,
        f"{group_col} {gtype}, n_docs long, alloc double, epochs double",
    )


def temperature_weights(
    df: DataFrame, group_col: str, alpha: float = 0.3,
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-based sampling weights over a grouping column — the
    multilingual-mixture rule of XLM-R / mT5 (sample group ``g`` with
    probability ``q_g ∝ p_g^alpha`` where ``p_g = n_g / N``): ``alpha``
    < 1 up-samples the tail groups and flattens the head, ``alpha = 1``
    is proportional, ``alpha = 0`` is uniform.

    ``size_col`` switches the group mass from document COUNT to a SUM
    (pass a token-count column to budget tokens, the unit real
    mixtures budget — p_g is then the group's token share).

    Output: (group, n_docs, sample_prob, multiplier) where
    ``multiplier = sample_prob / p_g`` is the per-document
    up/down-sampling factor — exactly the ``weights`` dict
    :func:`materialize_mixture` consumes, so the two compose into
    "compute the temperature mixture, then materialize it".

    Scale shape: ONE count shuffle over the corpus, then |groups| rows
    collect to the driver for the pow/normalize math — the mixture IS
    model state (the kmeans_fit precedent: k·dim floats to the driver
    is legitimate; a pure-DataFrame formulation re-scanned the corpus
    once per derived aggregate because Spark shares no subplans across
    branches). Cross-engine determinism: ``p`` is one exact division,
    ``pow`` is libm on identical doubles, every chained value
    re-rounds to 6 decimals HALF_UP (Decimal quantize == Spark/DuckDB
    round) and the normalizing sum is exact decimal arithmetic — the
    same float discipline as the BM25/DSIR queries."""
    from decimal import ROUND_HALF_UP, Decimal

    import math

    def _r6(x: float) -> float:
        # Spark's round(double, 6): BigDecimal.valueOf(x) (shortest
        # repr) setScale(6, HALF_UP) — Decimal(repr(x)) replicates it
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    mass = (
        F.sum(F.col(size_col)).alias("n_docs")
        if size_col
        else F.count(F.lit(1)).alias("n_docs")
    )
    rows = df.groupBy(group_col).agg(mass).collect()
    total = sum((r["n_docs"] or 0) for r in rows)
    stats = []
    for r in rows:
        n_g = r["n_docs"] or 0
        p = n_g / total if total else 0.0
        # pow(0, 0) == 1 would hand a zero-mass group full weight at
        # alpha=0; zero mass means zero weight regardless of alpha
        q = _r6(math.pow(p, alpha)) if p > 0 else 0.0
        stats.append((r[group_col], int(n_g), p, q))
    qsum = float(sum(Decimal(repr(q)) for *_, q in stats))
    out_rows = []
    for g, n, p, q_raw in stats:
        # a zero-mass group (all docs size 0 under size_col) carries no
        # sampling weight and no defined multiplier — emit zeros rather
        # than dividing the whole mixture job into a ZeroDivisionError
        if p == 0 or qsum == 0:
            out_rows.append((g, n, 0.0, 0.0))
            continue
        sample_prob = _r6(q_raw / qsum)
        out_rows.append((g, n, sample_prob, _r6(sample_prob / p)))
    gtype = df.schema[group_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        out_rows,
        f"{group_col} {gtype}, n_docs long, sample_prob double, multiplier double",
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
# Translation of Rare Words with Subword Units"): the corpus-side half
# of tokenizer construction — adjacent-symbol-pair counting over the
# word-frequency table, and the greedy merge loop that turns the top
# pair into a new symbol. The model (the ordered merge list) is
# driver-side state like the k-means centroids; every counting pass is
# a bounded-key shuffle over the DISTINCT-word table, never the corpus.
# ---------------------------------------------------------------------------


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the compressed training
    input every BPE iteration runs on. |distinct words| << |tokens|, so
    all downstream passes touch the small frame."""
    toks = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def bpe_pair_counts(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Top-``k`` adjacent character pairs by frequency-weighted count —
    BPE's first merge-selection pass as one declarative plan:
    (pair, n), ordered (n desc, pair asc).

    Adjacent char pairs are 2-char substrings, so the pass never
    materializes per-char arrays: one projection expands each DISTINCT
    word into its length-1 pair list, one bounded-key shuffle sums
    freq per pair (symbol-pair space is tiny vs corpus), and the top-k
    is TakeOrdered."""
    wf = word_freqs(df, text_col)
    # substring(word, i, 2) via expr: the SQL lambda variable indexes
    # the word directly, so no per-char array ever materializes
    pairs = wf.filter(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(k)
        .select("pair", F.col("n").cast("long").alias("n"))
    )


def _merge_symbols(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge rule to a symbol
    array: every adjacent (left, right) becomes the fused symbol, via a
    single JVM-side aggregate fold (overlaps resolve left-first, the
    standard BPE behavior: merging 'a a' in [a,a,a] yields [aa, a])."""
    fused = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _char_syms_col() -> Column:
    return F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )


def _pair_counts_of(wf: DataFrame, syms: Column) -> DataFrame:
    """(l, r, n): adjacent symbol pairs of ``syms`` weighted by word
    frequency — one projection + one bounded-key shuffle."""
    return (
        wf.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("n"))
    )


def _select_exact_batch(
    rows: list, truncated: bool, quota: int
) -> list[tuple[str, str]]:
    """Pick a PREFIX of the ranked pair table that provably equals the
    next picks of the sequential BPE loop (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") —
    batching never changes the learned merge list, it only amortizes
    cluster rounds.

    ``rows`` is the pair table sorted (n desc, l asc, r asc) — the
    sequential tie-break order. A candidate is accepted while ALL hold:

    - no earlier accepted merge (l_j, r_j) can have changed its count:
      applying that merge only destroys pairs (x, l_j) / (r_j, y)
      (sites x·l_j·r_j and l_j·r_j·y) and, when l_j == r_j, pairs
      touching that symbol at all (greedy chains) — so block l_j as a
      RIGHT symbol, r_j as a LEFT symbol, both sides on self-merges;
    - its count strictly dominates every pair an earlier accepted merge
      can CREATE: new pairs involve the fused symbol and inherit sites
      one-for-one from (x, l_j) / (r_j, y), so their counts are bounded
      by max(by_right[l_j], by_left[r_j]) (capped at n_j); unseen
      neighbors of a truncated table are bounded by the table floor;
    - no fused symbol collides with an existing symbol (a collision
      would let an old pair's count GROW — accept that merge, then
      close the batch).

    Stopping (never skipping) at the first violation is what preserves
    equality: a skipped higher-ranked pair could retain its count and
    would then be the sequential algorithm's true next pick."""
    if not rows:
        return []
    by_left: dict[str, int] = {}
    by_right: dict[str, int] = {}
    syms_seen: set[str] = set()
    for l, r, n in rows:
        by_left[l] = max(by_left.get(l, 0), n)
        by_right[r] = max(by_right.get(r, 0), n)
        syms_seen.add(l)
        syms_seen.add(r)
    # unseen pairs rank below the last collected row in the total order,
    # so the last row's n is a valid upper bound for their counts
    floor = rows[-1][2] if truncated else 0
    sel: list[tuple[str, str]] = []
    blocked_left: set[str] = set()
    blocked_right: set[str] = set()
    fused_strs: set[str] = set()
    cur_bound = -1
    scan = rows[:-1] if truncated else rows  # last row only proves the floor
    for l, r, n in scan:
        if len(sel) >= quota:
            break
        if (
            l in blocked_left
            or r in blocked_right
            or l in fused_strs
            or r in fused_strs
        ):
            break
        if sel and n <= cur_bound:
            break
        sel.append((l, r))
        fused = l + r
        if fused in syms_seen:
            break  # collision: this merge is sound, successors are not
        fused_strs.add(fused)
        blocked_right.add(l)
        blocked_left.add(r)
        if l == r:
            blocked_left.add(l)
            blocked_right.add(r)
        # Truncated tables weaken two guarantees, both absorbed by the
        # floor: unseen neighbor pairs have count <= floor, AND the
        # fused string may collide with a symbol whose pairs all rank
        # below the cutoff (invisible to syms_seen) — such a boosted
        # pair's old count is also <= floor, so the reachable maximum
        # is new-sites bound + floor, never just the new-sites bound.
        bound = min(n, max(by_right.get(l, floor), by_left.get(r, floor)))
        if truncated:
            bound += floor
        cur_bound = max(cur_bound, bound)
    return sel


def _bpe_train_local(
    words: list[tuple[list[str], int]], num_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich reference loop in plain Python over a collected
    word-frequency table — the small-corpus degrade path of
    :func:`bpe_train`. Same total order as the distributed trainer
    (count desc, then (l, r) lexicographic asc) and the same greedy
    left-to-right merge application as ``_merge_symbols``, so the
    merge list is byte-identical by construction; the equality is
    pinned by tests/test_corpus."""
    merges: list[tuple[str, str]] = []
    words = [(list(syms), int(f)) for syms, f in words]
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append(best)
        left, right = best
        fused = left + right
        for i, (syms, f) in enumerate(words):
            if left not in syms:
                continue
            out: list[str] = []
            j = 0
            n = len(syms)
            while j < n:
                if j < n - 1 and syms[j] == left and syms[j + 1] == right:
                    out.append(fused)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, f)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    max_batch: int = 16,
    top_m: int = 4096,
    checkpoint_every: int = 64,
    driver_local_max_words: int = 65536,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list — the tokenizer model, byte-identical to the
    sequential reference loop (pinned by ``tests/test_corpus``).

    Scale shape — the fix for the one-job-per-merge scale-killer:

    - ONE Spark job per ROUND, not per merge: each round collects the
      top-``top_m`` rows of the pair-count table (count desc, pair
      lexicographic — bounded driver traffic, the k-means model-state
      pattern) and :func:`_select_exact_batch` takes as many
      consecutive merges as are provably identical to the sequential
      picks (conflict/dominance/collision rules in its docstring).
    - NO per-merge materialization: accepted merges fold into the
      symbol column as plan literals (the :func:`bpe_segment` pattern)
      over the ONE cached word-frequency table; every
      ``checkpoint_every`` pending merges the folded frame is cached
      and the fold restarts, bounding Catalyst expression depth.

    At 64 merges on the test corpus this is ~38 rounds (~39 jobs) vs
    the reference loop's 64 collect + 64 materialize jobs; batches
    lengthen as symbols grow, so the gap widens with vocabulary size.

    ``max_batch=1`` degrades to sequential selection (still one job per
    merge instead of two). Reference behavior:
    gobblin has no tokenizer trainer — this operator exists for the
    LLM-pipeline surface; the algorithm is the public Sennrich BPE.

    Small-corpus auto-degrade: batching amortizes CLUSTER rounds, but a
    tiny corpus pays the per-round fixed costs (top-m collect, folded
    expression compilation) without needing the amortization — the
    round machinery can cost more wall-time than it saves. When the
    distinct-word table fits the driver (``driver_local_max_words``,
    probed with a short-circuiting ``limit(n+1).count()``), the table
    is collected ONCE and the reference loop runs in plain Python
    (:func:`_bpe_train_local`) — 2 Spark jobs total, byte-identical
    merges. Pass ``driver_local_max_words=0`` to force the distributed
    path (the tests pinning round economics do)."""
    base = word_freqs(df, text_col).withColumn("syms", _char_syms_col())
    if driver_local_max_words and num_merges > 0:
        probe = base.limit(driver_local_max_words + 1).count()
        if probe <= driver_local_max_words:
            rows = base.select("word", "freq").collect()
            return _bpe_train_local(
                [(list(r["word"]), r["freq"]) for r in rows], num_merges
            )
    cur = base.cache()
    pending: list[tuple[str, str]] = []
    merges: list[tuple[str, str]] = []

    def folded_syms() -> Column:
        col = F.col("syms")
        for l, r in pending:
            col = _merge_symbols(col, l, r)
        return col

    try:
        while len(merges) < num_merges:
            rows = [
                (x["l"], x["r"], x["n"])
                for x in _pair_counts_of(cur, folded_syms())
                .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(top_m)
                .collect()
            ]
            if not rows:
                break
            sel = _select_exact_batch(
                rows,
                truncated=len(rows) >= top_m,
                quota=min(max_batch, num_merges - len(merges)),
            )
            if not sel:
                sel = [(rows[0][0], rows[0][1])]
            merges.extend(sel)
            pending.extend(sel)
            if len(pending) >= checkpoint_every:
                new = cur.withColumn("syms", folded_syms()).cache()
                new.count()  # materialize before dropping the parent
                cur.unpersist()
                cur = new
                pending = []
    finally:
        cur.unpersist()
    return merges


def bpe_train_sequential(
    df: DataFrame, text_col: str, num_merges: int
) -> list[tuple[str, str]]:
    """The reference loop :func:`bpe_train` must match: one argmax
    collect + one cache materialization PER MERGE. Kept for the
    equality pin and the jobs-per-merge bench comparison; use
    :func:`bpe_train` everywhere else."""
    wf = word_freqs(df, text_col).withColumn("syms", _char_syms_col())
    wf = wf.cache()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            top = (
                _pair_counts_of(wf, F.col("syms"))
                .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] is None:
                break
            left, right = top[0]["l"], top[0]["r"]
            merges.append((left, right))
            new = wf.withColumn("syms", _merge_symbols(F.col("syms"), left, right))
            new = new.cache()
            new.count()  # materialize before dropping the parent cache
            wf.unpersist()
            wf = new
    finally:
        wf.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    max_plan_merges: int = 512,
) -> DataFrame:
    """Apply an ordered merge list to segment text into BPE tokens
    (array<string> of subwords per document, whitespace words segmented
    independently). Pure-Column: per word, chars -> fold each merge in
    order — no UDF, no shuffle; the merge list ships as plan literals
    like the PQ codebooks.

    The plan grows one nested fold PER MERGE, so this formulation is
    for small exploratory vocabularies (the merge lists bpe_train
    produces at its driver-loop cost ceiling). A production tokenizer
    vocabulary (30k+ merges) belongs in an Arrow-batched mapInPandas
    with a real trie tokenizer, not a 30k-deep Catalyst expression —
    guarded loudly rather than compiling a plan that stalls the
    optimizer."""
    if len(merges) > max_plan_merges:
        raise ValueError(
            f"bpe_segment: {len(merges)} merges exceeds the literal-plan "
            f"bound ({max_plan_merges}); apply large vocabularies with "
            "bpe_segment_arrow (the Arrow-batched merge-rank tokenizer) "
            "instead of a per-merge Column fold"
        )
    word_syms = F.expr(
        "transform(filter(split(" + text_col + ", '\\\\s+'), w -> w != ''), "
        "w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))"
    )
    col = word_syms
    for left, right in merges:
        col = F.transform(col, lambda syms: _merge_symbols(syms, left, right))
    return df.withColumn(out_col, F.flatten(col))


def bpe_segment_arrow(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """:func:`bpe_segment` for production vocabularies (30k+ merges),
    where a per-merge Column fold would compile a Catalyst expression
    thousands of nodes deep.

    Same contract, different engine: an Arrow-batched pandas UDF
    carrying the merge list by value, applying merges with the standard
    rank-priority algorithm — repeatedly fuse the LOWEST-RANK adjacent
    pair present in the word (ties broken leftmost), exactly the
    sequence the ordered fold produces, in O(word_len * merges_applied)
    per word with an O(1) rank lookup instead of O(len(merges)) passes.
    Words are memoized per batch (Zipf makes the hit rate high), the
    stage is a pure projection (ZERO shuffle, embarrassingly parallel),
    and ``tests/test_corpus.py`` pins token-level equality with the
    literal-plan fold on the same merge lists.

    Rank-priority == ordered-fold proof sketch: the fold applies merge
    r0 everywhere, then r1 everywhere it still matches, etc.; picking
    the lowest-rank pair present first never creates an opportunity for
    a LOWER rank to match where it could not before (a fused symbol
    only participates in higher-rank merges — ranks are learned in
    creation order), so both walks fuse the same sites. This is the
    published BPE inference algorithm (Sennrich et al. 2016; the
    pair-priority-queue variant in huggingface/tokenizers)."""
    rank = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def segment(texts):  # pd.Series[str] -> pd.Series[list[str]]
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            while len(syms) > 1:
                best = None
                best_rank = None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = i, r
                if best is None:
                    break
                l, r_ = merges[best_rank]
                # fuse EVERY (l, r_) site left-to-right — one merge rule
                # applies greedily across the word, like the fold
                out: list[str] = []
                j = 0
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and syms[j] == l
                        and syms[j + 1] == r_
                    ):
                        out.append(l + r_)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            cache[w] = syms
            return syms

        def doc_tokens(t: str) -> list[str]:
            toks: list[str] = []
            for w in (t or "").split():
                toks.extend(word_tokens(w))
            return toks

        return pd.Series([doc_tokens(t) for t in texts])

    return df.withColumn(out_col, segment(F.col(text_col)))
