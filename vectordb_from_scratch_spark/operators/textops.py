"""Document-level text analysis operators: language ID, quality scoring,
token stats, fingerprinting. LLM-pipeline operators beyond the reference's
surface (BASELINE.json north star). All pure built-in expressions —
deterministic, codegen'd, and replicable in ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.tables import spread
from . import cache
from . import rank as rank_ops

__all__ = [
    "token_stats",
    "pack_sequences",
    "quality_scores",
    "quality_model_scores",
    "quality_p_keep",
    "QUALITY_MODEL_WEIGHTS",
    "lang_id",
    "fingerprints",
    "winnowing_fingerprints",
    "tfidf_top_terms",
    "bm25_top_terms",
    "chunk_documents",
    "vocabulary",
    "repetition_metrics",
    "bigram_logprob",
    "char_entropy",
    "collocations_pmi",
    "ppl_buckets",
    "bpe_merges",
    "bpe_encode",
    "url_domains",
    "URL_PATTERN",
    "pii_scrub",
    "PII_PATTERNS",
    "LANG_MARKERS",
]

# Tiny per-language marker wordlists for the n-gram/stopword heuristic
# language-ID. Deterministic and SQL-twinnable; not a real LID model.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
}


def token_stats(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counting: whitespace tokens + a BPE-ish proxy
    (word-char runs and single non-space symbols count separately)."""
    t = F.col(text_col)
    bpe_ish = F.size(
        F.filter(
            F.split(F.regexp_replace(F.lower(t), r"([^\w\s])", r" $1 "), r"\s+"),
            lambda x: x != F.lit(""),
        )
    )
    return documents.select(
        F.col(id_col),
        X.token_count(t).alias("n_tokens"),
        bpe_ish.alias("n_subtokens"),
        F.length(t).alias("n_chars_measured"),
    )


def pack_sequences(
    documents: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sequence packing — the concat-and-slice step every
    pretraining pipeline runs before batching: documents are laid out in
    deterministic id order on one global token axis and cut into
    `budget`-token context windows; a document whose tokens straddle a
    cut contributes a slice to both windows.

    Output: one row per (seq_id, doc) overlap —
      (seq_id, doc_id, tok_start, tok_end, n_tokens_in_seq)
    with tok_start/tok_end the half-open token span of the doc INSIDE
    that sequence (so sum(n_tokens_in_seq) over a seq_id = budget except
    the final partial window).

    Plan shape: token counts are a narrow projection; the global cumsum
    is TWO-LEVEL — range-repartition by id, per-partition running totals
    (window partitioned by spark_partition_id, so no single-partition
    window anywhere near the data), then partition offsets computed on
    the ≤numPartitions-row summary and broadcast back. A naive
    Window.orderBy(id) cumsum would collapse the whole table onto one
    task — the classic global-window scale-killer this avoids. The
    explode is bounded by ceil(doc_tokens/budget)+1 windows per doc.
    Oracle-twinnable: plain cumsum + generate_series in any SQL engine
    (the two-level tree computes identical integer sums in any grouping).
    Empty docs (0 tokens) are dropped — they occupy no span."""
    from pyspark.sql import Window

    toks = documents.select(
        F.col(id_col), X.token_count(F.col(text_col)).alias("__n")
    ).filter(F.col("__n") > 0)
    parts = toks.repartitionByRange(F.col(id_col).asc()).withColumn(
        "__pid", F.spark_partition_id()
    )
    w1 = Window.partitionBy("__pid").orderBy(F.col(id_col).asc())
    # Eager checkpoint: offs and the final join below both consume this
    # frame, and its partitioning is nondeterministic (sampled range
    # boundaries + spark_partition_id). Without a hard materialization
    # the two consumers rely on exchange/cache reuse to see the SAME
    # partitioning — a best-effort optimization, and the sibling
    # construction in operators/rank.py was measured producing ~98%
    # wrong offsets at 1M+ rows when reuse broke down. Freeze the
    # sampling once; blocks are reclaimed by the scoped sweep.
    local = cache.checkpoint(parts.withColumn("__le", F.sum("__n").over(w1)))
    # per-partition totals: tiny (one row per partition) — the only
    # unpartitioned window runs over THIS summary, never the data
    w0 = Window.orderBy(F.col("__pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        local.groupBy("__pid")
        .agg(F.max("__le").alias("__ptot"))
        .withColumn("__off", F.coalesce(F.sum("__ptot").over(w0), F.lit(0)))
        .select("__pid", "__off")
    )
    spans = local.join(F.broadcast(offs), "__pid").select(
        id_col,
        "__n",
        (F.col("__le") + F.col("__off") - F.col("__n")).alias("__start"),
        (F.col("__le") + F.col("__off")).alias("__end"),
    )
    first_bin = F.floor(F.col("__start") / budget)
    last_bin = F.floor((F.col("__end") - 1) / budget)
    exploded = spans.select(
        id_col,
        "__start",
        "__end",
        F.explode(F.sequence(first_bin, last_bin)).alias("seq_id"),
    )
    in_start = F.greatest(F.col("__start"), F.col("seq_id") * budget)
    in_end = F.least(F.col("__end"), (F.col("seq_id") + 1) * budget)
    return exploded.select(
        F.col("seq_id").cast("long"),
        F.col(id_col),
        in_start.cast("long").alias("tok_start"),
        in_end.cast("long").alias("tok_end"),
        (in_end - in_start).cast("long").alias("n_tokens_in_seq"),
    )


def quality_scores(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: rewards mid-length docs with low
    punctuation/digit density and some stopword coverage — the standard
    pretraining-filter shape (Gopher/C4-style rules, public recipes).

    spread(): the scoring is a compute-heavy NARROW map (interpreted
    higher-order token/feature lambdas) — a 1-split scan would serialize
    it on one core; no-op at real scale (r11)."""
    documents = spread(documents).withColumn("__toks", X.tokens(text_col))
    feats = X.quality_features(text_col, toks=F.col("__toks"))
    len_score = F.least(feats["n_tokens"] / F.lit(50.0), F.lit(1.0))
    punct_pen = F.least(F.coalesce(feats["punct_ratio"], F.lit(0.0)) * F.lit(4.0), F.lit(1.0))
    digit_pen = F.least(F.coalesce(feats["digit_ratio"], F.lit(0.0)) * F.lit(4.0), F.lit(1.0))
    stop_score = F.least(feats["distinct_stopwords"] / F.lit(8.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * stop_score
        + F.lit(0.15) * (F.lit(1.0) - punct_pen)
        + F.lit(0.15) * (F.lit(1.0) - digit_pen)
    )
    return documents.select(
        F.col(id_col),
        F.col("lang"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(F.coalesce(feats["avg_token_len"], F.lit(0.0)), 6).alias("avg_token_len"),
        F.round(F.coalesce(feats["punct_ratio"], F.lit(0.0)), 6).alias("punct_ratio"),
        F.round(F.coalesce(feats["digit_ratio"], F.lit(0.0)), 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


# Offline-trained logistic-regression weights for the model-based quality
# filter — FIXED literals so inference is a pure columnar expression and
# the DuckDB oracle reproduces it. Features are the same deterministic
# ratios quality_scores uses, each pre-scaled to [0, 1].
QUALITY_MODEL_WEIGHTS = {
    "bias": -1.2,
    "len_norm": 2.1,        # min(n_tokens/100, 1): longer docs look trained-on
    "stop_norm": 2.6,       # min(distinct_stopwords/8, 1): English fluency proxy
    "wordlen_norm": 1.4,    # clamp((avg_token_len-3)/4, 0, 1): natural prose
    "punct_ratio": -3.0,    # dense punctuation → markup/boilerplate
    "digit_ratio": -2.5,    # dense digits → tables/serial dumps
}


def quality_model_scores(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """MODEL-based quality filtering: a logistic regression over the
    engineered text features, applied as pure whole-stage-codegen
    expressions — the fasttext-style classifier stage of a pretraining
    pipeline (CCNet/Gopher-style model filters, public recipes), next to
    quality_scores' hand-tuned heuristic.

    The weights are offline-trained literals (QUALITY_MODEL_WEIGHTS)
    embedded in the plan — LINEAR model inference is a dot product the
    JVM codegens, so scoring 100 TB costs one scan with zero Python and
    zero shuffle. (A non-linear model would broadcast its weights into
    an Arrow-batched Pandas UDF — same schema, same single-scan shape.)

    Returns (doc_id, lang, p_keep, keep): p = sigmoid(w·x + b),
    keep = p >= threshold. Every feature and the sigmoid are
    deterministic closed-form doubles — value-exact oracle-twinnable.

    spread(): same narrow-map parallelism note as quality_scores (r11).
    """
    documents = spread(documents).withColumn("__toks", X.tokens(text_col))
    p = quality_p_keep(text_col, toks=F.col("__toks"))
    return documents.select(
        F.col(id_col),
        F.col("lang"),
        F.round(p, 6).alias("p_keep"),
        (p >= F.lit(threshold)).alias("keep"),
    )


def quality_p_keep(text_col: str = "text", toks=None):
    """The model probability as a bare Column — reusable as a streaming
    filter predicate (streaming/corpus_stream.py) and inside any plan
    without materializing the scored frame. Pass staged ``toks`` when
    the caller already tokenized (avoids re-tokenizing per feature)."""
    w = QUALITY_MODEL_WEIGHTS
    feats = X.quality_features(text_col, toks=toks)
    len_norm = F.least(feats["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_norm = F.least(feats["distinct_stopwords"] / F.lit(8.0), F.lit(1.0))
    wordlen_norm = F.least(
        F.greatest(
            (F.coalesce(feats["avg_token_len"], F.lit(0.0)) - F.lit(3.0)) / F.lit(4.0),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    z = (
        F.lit(w["bias"])
        + F.lit(w["len_norm"]) * len_norm
        + F.lit(w["stop_norm"]) * stop_norm
        + F.lit(w["wordlen_norm"]) * wordlen_norm
        + F.lit(w["punct_ratio"]) * F.coalesce(feats["punct_ratio"], F.lit(0.0))
        + F.lit(w["digit_ratio"]) * F.coalesce(feats["digit_ratio"], F.lit(0.0))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lang_id(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: count distinct marker hits per language,
    predict the argmax (ties broken by fixed language order), 'und' when
    nothing hits. Returns (id, lang, pred_lang, hits per lang)."""
    langs = list(LANG_MARKERS)
    # Stage tokens, then hits, so the tokenizer runs once per row and each
    # array_intersect once — pred references the staged hits columns.
    # spread: heavy narrow map, see quality_scores (r11).
    staged = spread(documents).withColumn("__toks", X.tokens(text_col)).select(
        F.col(id_col),
        F.col("lang"),
        *[
            F.size(
                F.array_intersect(F.col("__toks"), F.array(*[F.lit(w) for w in words]))
            ).alias(f"hits_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    hit_cols = {lang: F.col(f"hits_{lang}") for lang in langs}
    best = F.greatest(*[hit_cols[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return staged.select(
        F.col(id_col),
        F.col("lang"),
        pred.alias("pred_lang"),
        *[F.col(f"hits_{lang}") for lang in langs],
    )


def tfidf_top_terms(
    documents: DataFrame, top: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-`top` TF-IDF terms per document: tf = in-doc term count,
    idf = ln((N+1)/(df+1)) smoothed. Pure explode → two aggregations →
    broadcast joins → per-doc window; deterministic tie-break
    (score desc, term asc) so the oracle hash-matches.

    Scale: the explode shuffles (doc_id, term) pairs once for tf; df is a
    map-side-combined count-distinct over terms; the doc-frequency table is
    tiny (vocab-sized) and broadcast back — the fact table never shuffles
    twice. MLlib HashingTF/IDF is the alternative when vocab must stay
    unmaterialized; this form keeps exact terms (and oracle parity).
    """
    from pyspark.sql import Window

    from ..sources.tables import spread

    toks = spread(documents).select(F.col(id_col), F.explode(X.tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size computed IN the plan (1-row broadcast) — a driver-side
    # documents.count() here would launch an extra full-table job per call
    # (the same hazard r1's strategy="auto" had)
    nd = documents.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(nd))
        .select(F.col(id_col), "term", (F.col("tf") * idf).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(id_col, "term", F.round("score", 6).alias("tfidf"), "rank")
    )


def bm25_top_terms(
    documents: DataFrame,
    top: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-`top` BM25-scored terms per document — the ranking function a
    retrieval/corpus-prep pipeline actually uses where TF-IDF is the
    textbook baseline. Okapi form:

        idf = ln((N - df + 0.5)/(df + 0.5) + 1)
        score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Same plan skeleton as tfidf_top_terms: one explode shuffles the
    (doc, term) pairs; df and the corpus stats (N, avgdl) are tiny
    1-row/vocab-sized broadcasts; the fact table never shuffles twice.
    Every float op is an explicit double expression replicated verbatim
    in the oracle SQL, so scores are bit-identical across engines
    (integer inputs, one shared IEEE expression tree)."""
    from pyspark.sql import Window

    from ..sources.tables import spread

    toks = spread(documents).select(F.col(id_col), F.explode(X.tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("dl").cast("double").alias("__sum_dl"),
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.log((F.col("__n") - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    avgdl = F.col("__sum_dl") / F.col("__n")
    score = idf * (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / avgdl)
    )
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), "term", score.alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(id_col, "term", F.round("score", 6).alias("bm25"), "rank")
    )


def chunk_documents(
    documents: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping character windows — the standard
    pre-embedding chunking stage of a retrieval/training pipeline.

    1:N explode of chunk indices, then one substring per OUTPUT ROW (the
    per-element-lambda hazard doesn't apply: after explode, expressions
    evaluate once per exploded row). Stride = chunk_chars - overlap;
    every char belongs to ≥1 chunk; last chunk may be short.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    t = F.col(text_col)
    n_chunks = F.greatest(
        F.ceil((F.length(t) - F.lit(overlap)).cast("double") / F.lit(stride)), F.lit(1)
    ).cast("int")
    return (
        documents.select(
            F.col(id_col), t.alias("__t"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            (F.col("chunk_idx") * stride + 1).alias("chunk_start"),
            F.col("__t").substr(F.col("chunk_idx") * F.lit(stride) + F.lit(1), F.lit(chunk_chars)).alias("chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            "chunk_start",
            F.length("chunk").alias("chunk_len"),
            F.md5("chunk").alias("chunk_md5"),
        )
    )


def vocabulary(
    documents: DataFrame, top: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary: top-`top` tokens by total frequency with corpus
    counts and document frequency — explode → one partial-aggregated
    groupBy → global top-k (the shuffle carries (term, count) pairs,
    vocab-sized, never row-sized)."""
    from pyspark.sql import Window

    from ..sources.tables import spread

    toks = spread(documents).select(F.col(id_col), F.explode(X.tokens(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )
    # global top-k via orderBy().limit() = TakeOrderedAndProject (partial
    # top-`top` per partition, driver merge) — a bare row_number window
    # here would sort the whole vocab through one partition; the rank
    # window below touches only the `top` surviving rows
    order = (F.col("tf").desc(), F.col("term").asc())
    w = Window.orderBy(*order)
    return (
        counts.orderBy(*order)
        .limit(top)
        .withColumn("rank", F.row_number().over(w))
        .select("term", "tf", "df", "rank")
    )


def tfidf_cosine_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | float | None = None,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity between documents via an INVERTED
    INDEX join — the text-side twin of the dense embedding near-dup:

        (term, doc, weight) self-join on term → per-pair weight products
        → exact decimal dot sums → normalize → threshold.

    Scale: the join fans out per term by its document frequency, so the
    plan's cost is Σ_t df(t)² — dominated by stopword-like high-df terms.
    `max_df` is the mitigation: drop terms with df > max_df from the
    index entirely (weights, norms, AND pairs — the pruned space is a
    consistent vector space, not a post-filter), capping the per-term
    fan-out at max_df². An int is an absolute document-frequency cap; a
    float in (0,1) is a fraction of corpus size (sklearn's convention),
    which scales with SF. Standard practice at corpus scale; None keeps
    the exact full-vocab semantics for oracle parity.

    Corpus size is computed IN the plan (1-row broadcast) — no
    driver-side count() job per call (same fix as tfidf_top_terms).

    Determinism: weight products are cast to DECIMAL(18,12) before the
    per-pair sum (term iteration order is partitioning-dependent; decimal
    addition is order-independent), norms likewise — the same rule as the
    relational measure sums.
    """
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    toks = spread(documents).select(F.col(id_col), F.explode(X.tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = documents.agg(F.count(F.lit(1)).alias("__n"))
    if max_df is not None:
        if isinstance(max_df, float):
            df_tbl = (
                df_tbl.crossJoin(F.broadcast(nd))
                .filter(F.col("df").cast("double") <= F.col("__n") * F.lit(max_df))
                .drop("__n")
            )
        else:
            df_tbl = df_tbl.filter(F.col("df") <= F.lit(int(max_df)))
    idf = F.log((F.col("__n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double"))
    inv = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(nd))
        .select("term", F.col(id_col), (F.col("tf") * idf).alias("w"))
    )
    norms = inv.groupBy(id_col).agg(
        F.sqrt(F.sum((F.col("w") * F.col("w")).cast("decimal(18,12)")).cast("double")).alias("nrm")
    )
    a, b = inv.alias("a"), inv.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.sum((F.col("a.w") * F.col("b.w")).cast("decimal(18,12)")).cast("double").alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nrm_b"))
    sims = dots.join(F.broadcast(na), "id_a").join(F.broadcast(nb), "id_b").select(
        "id_a", "id_b",
        F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cos_sim"),
    )
    return sims.filter(F.col("cos_sim") >= F.lit(threshold))


def _winnowing_kernel(gram: int, window: int, text_col: str, id_col: str):
    """Arrow-batched hashlib winnowing — bit-identical to the expression
    path (same normalization, gram hashing, window minima, digest)."""
    import hashlib
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)  # JVM \s is ASCII-only; match the expression path on U+00A0 etc.

    def fp(text: str):
        t = ws.sub(" ", text.lower()).strip()
        grams = [t[i:i + gram] for i in range(len(t) - gram + 1)] if len(t) >= gram else []
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:4], 16) for g in grams]
        mins = [min(hs[i:i + window]) for i in range(len(hs) - window + 1)]
        # array_distinct preserves first-occurrence order; digest sorts, so
        # a plain set is equivalent after sorting
        sel = sorted(set(mins))
        digest = hashlib.md5(",".join(str(x) for x in sel).encode()).hexdigest()
        return len(sel), digest

    def run(batches):
        for pdf in batches:
            pairs = pdf[text_col].map(fp)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_fingerprints": pairs.map(lambda p: p[0]).astype("int32"),
                    "fp_digest": pairs.map(lambda p: p[1]),
                }
            )

    return run


def winnowing_fingerprints(
    documents: DataFrame,
    gram: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "kernel",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme, Schleimer et al.
    SIGMOD'03): hash every character k-gram (the rolling-hash stream),
    keep the MINIMUM hash of each sliding window of `window` hashes, then
    the distinct selected set is the fingerprint. Guarantees any shared
    substring of length ≥ gram+window-1 contributes a shared fingerprint
    — positional robustness that whole-document md5 lacks.

    Windowed minima are built the shingle way: `window` shifted slices of
    the staged hash array combined with elementwise least — per-row array
    ops, no per-element lambda re-evaluation, no shuffle.

    strategy="kernel" (default): hashlib batch kernel, bit-identical,
    ~20× faster (72s → ~3s at 100k docs); "expr" keeps the Column form.
    """
    if strategy == "kernel":
        return spread(documents).select(F.col(id_col), F.col(text_col)).mapInPandas(
            _winnowing_kernel(gram, window, text_col, id_col),
            schema=f"{id_col} long, n_fingerprints int, fp_digest string",
        )
    grams = X.char_ngrams(text_col, n=gram)
    staged = spread(documents).select(
        F.col(id_col),
        F.transform(grams, lambda g: X.token_hash16(g)).alias("__gh"),
    )
    cnt = F.greatest(F.size(F.col("__gh")) - F.lit(window - 1), F.lit(0))
    acc = F.slice(F.col("__gh"), 1, cnt)
    for j in range(2, window + 1):
        acc = F.zip_with(acc, F.slice(F.col("__gh"), j, cnt), lambda a, b: F.least(a, b))
    sel = F.array_distinct(acc)
    fp_digest = F.md5(
        F.array_join(F.transform(F.array_sort(sel), lambda x: x.cast("string")), ",")
    )
    return staged.select(
        F.col(id_col),
        F.size(sel).alias("n_fingerprints"),
        fp_digest.alias("fp_digest"),
    )


def fingerprints(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: exact md5 of normalized text plus a coarse
    64-bit-style prefix bucket (rolling-hash stand-in for shard routing)."""
    fp = X.fingerprint(text_col)
    return documents.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 4).alias("shard_key"),
    )


def repetition_metrics(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style per-document repetition signals (public pretraining
    filter recipe: Rae et al. 2021 §A1.1): the fraction of token / 2-gram /
    3-gram instances that are repeats of an earlier instance in the same
    document, plus the share of the most frequent token.

    Scale: the dup fractions are PER-ROW narrow expressions (size -
    size(array_distinct)) — codegen'd, shuffle-free, O(len) per doc. Only
    the top-token share needs an aggregation, and its shuffle carries
    (doc_id, term, count) partials with map-side combine, then joins back
    to the per-row metrics on doc_id. Nothing here is quadratic; at 100 TB
    this is one explode-agg plus a same-key join of doc-count-sized rows.
    """
    staged = spread(documents).select(F.col(id_col), F.col(text_col)).withColumn(
        "__toks", X.tokens(text_col)
    )

    def dup_frac(arr: F.Column) -> F.Column:
        n = F.size(arr).cast("double")
        uniq = F.size(F.array_distinct(arr)).cast("double")
        return F.round(F.when(n > 0, (n - uniq) / n).otherwise(F.lit(0.0)), 6)

    per_row = staged.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        dup_frac(F.col("__toks")).alias("dup_token_frac"),
        dup_frac(X.shingles_from_tokens(F.col("__toks"), 2)).alias("dup_2gram_frac"),
        dup_frac(X.shingles_from_tokens(F.col("__toks"), 3)).alias("dup_3gram_frac"),
    )
    tops = (
        staged.select(F.col(id_col), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_cnt"))
    )
    share = F.when(
        F.col("n_tokens") > 0, F.col("top_cnt").cast("double") / F.col("n_tokens").cast("double")
    ).otherwise(F.lit(0.0))
    return per_row.join(tops, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        "dup_token_frac",
        "dup_2gram_frac",
        "dup_3gram_frac",
        F.round(F.coalesce(share, F.lit(0.0)), 6).alias("top_token_share"),
    )


# Order matters: emails are scrubbed before phones so the digits inside a
# local part can't be re-matched; every pattern is RE2-compatible (no
# backreferences, no lookaround) so the DuckDB oracle replays it exactly.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d -]{7,}\d",
}


def bigram_logprob(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-corpus bigram LM score — the KenLM-style quality signal
    (public pretraining recipes score documents by n-gram LM perplexity;
    here the LM is the corpus itself, so the operator is closed-form and
    deterministic): per doc, the mean log MLE probability
    ln(c(w1,w2)/c_prefix(w1)) over its token bigrams. Low scores mark
    documents whose word transitions are rare in the corpus — gibberish,
    boilerplate soup, wrong-language fragments.

    Determinism: every count ratio is an exact small-integer division;
    the per-doc mean folds ln values in token order (array_sort by
    position → left fold), so the double result is partition-invariant
    and engine-portable. Plan: one explode, two bounded aggregations
    (bigram + prefix counts, vocabulary-sized), two equi-joins back —
    no driver-side anything; per-doc collect_list bounded by doc length.
    Docs with <2 tokens are dropped (no bigrams, no score)."""
    toks = documents.select(F.col(id_col), X.tokens(text_col).alias("__w")).filter(
        F.size("__w") >= 2
    )
    n = F.size("__w")
    b = toks.select(
        F.col(id_col),
        F.posexplode(
            F.zip_with(
                F.slice("__w", 1, n - 1),
                F.slice("__w", F.lit(2), n - 1),
                lambda a, c: F.struct(a.alias("g1"), c.alias("g2")),
            )
        ).alias("pos", "bg"),
    ).select(
        F.col(id_col),
        (F.col("pos") + 1).alias("pos"),
        F.col("bg.g1").alias("g1"),
        F.col("bg.g2").alias("g2"),
    )
    bc = b.groupBy("g1", "g2").agg(F.count(F.lit(1)).alias("c"))
    pc = b.groupBy("g1").agg(F.count(F.lit(1)).alias("cp"))
    lp = (
        b.join(bc, ["g1", "g2"])
        .join(pc, ["g1"])
        .select(
            F.col(id_col),
            "pos",
            F.log(F.col("c").cast("double") / F.col("cp").cast("double")).alias("l"),
        )
    )
    fold = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "l"))), lambda s: s["l"]
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return lp.groupBy(id_col).agg(
        F.round(fold / F.count(F.lit(1)), 6).alias("bigram_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def char_entropy(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level Shannon entropy per document — the compressibility
    quality signal (RefinedWeb/MassiveText-family pipelines drop docs
    whose character distribution is degenerate: binary junk, repeated
    padding, gibberish key-dumps). Returns (id, n_chars, n_distinct,
    entropy, top_char_share): H = -Σ pᵢ·ln(pᵢ) over the doc's character
    distribution, plus the max single-character share (the Gopher-style
    "one symbol dominates" screen).

    Determinism (cross-engine): the entropy terms fold in CHARACTER-
    SORTED order — Python's left-fold sum over sorted(counter) is the
    same IEEE sequence as the oracle's list_reduce over list_sort — and
    the final `+ 0.0` normalizes -0.0 (single-repeated-char docs) to
    +0.0 identically in both engines. Exact-count divisions, libm ln.

    Scale: Arrow-batched mapInPandas kernel — per-row O(len) counting,
    narrow, SHUFFLE-FREE (the explode+groupBy alternative would shuffle
    n_docs × doc_len single-character rows). Same kernel-vs-expression
    contract as the minhash/winnowing kernels: the oracle SQL is the
    executable spec, the kernel must match it value-exactly."""
    import math
    from collections import Counter

    def run(batches):
        import pandas as pd

        def one(text):
            if not text:
                return (0, 0, 0.0, 0.0)
            cnt = Counter(text)
            n = len(text)
            ent = -sum(
                (k / n) * math.log(k / n) for _, k in sorted(cnt.items())
            ) + 0.0
            return (n, len(cnt), round(ent, 6), round(max(cnt.values()) / n, 6))

        for pdf in batches:
            stats = pdf[text_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_chars": [s[0] for s in stats],
                    "n_distinct": [s[1] for s in stats],
                    "entropy": [s[2] for s in stats],
                    "top_char_share": [s[3] for s in stats],
                }
            )

    return documents.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_chars long, n_distinct long, "
            "entropy double, top_char_share double"
        ),
    )


def collocations_pmi(
    documents: DataFrame,
    min_count: int = 5,
    top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collocation / multiword-expression extraction by pointwise mutual
    information over adjacent token bigrams — the phrase-mining pass of a
    corpus-prep pipeline (Church & Hanks 1990; word2vec's phrase step
    uses the same score): PMI(w1,w2) = ln( p(w1 w2) / (p(w1)·p(w2)) )
    with p from corpus MLE counts. High-PMI bigrams ("san francisco",
    "machine learning") are candidate vocabulary merges and quality
    signals; not in the reference (no text surface, SURVEY §2.6).

    Returns the `top` bigrams with pair_count ≥ min_count ranked by
    (pmi desc, w1, w2): (w1, w2, pair_count, pmi, rank).

    Scale: two vocabulary-sized aggregations (bigram counts, unigram
    counts) from one corpus scan each; totals are 1-row aggregates
    broadcast via crossJoin; the two count joins are vocabulary-keyed.
    Top-k is orderBy+limit — Catalyst's TakeOrderedAndProject computes
    per-partition heaps, never a global sort; the rank window runs on
    the ≤`top`-row result. Determinism: both engines evaluate the same
    IEEE expression tree on exact integer counts, and the (pmi, w1, w2)
    tie-break pins the boundary.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = documents.select(X.tokens(text_col).alias("__w"))
    uni = toks.select(F.explode("__w").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    big = (
        toks.filter(F.size("__w") >= 2)
        .select(F.explode(X.shingles_from_tokens(F.col("__w"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    n_bi = big.agg(F.sum("pair_count").cast("double").alias("__nb"))
    n_uni = uni.agg(F.sum("c").cast("double").alias("__nu"))
    # tokens are whitespace-split, so the shingle join char can't occur
    # inside one — the split below is unambiguous
    parts = F.split("bg", " ")
    scored = (
        big.filter(F.col("pair_count") >= min_count)
        .select(
            parts[0].alias("w1"), parts[1].alias("w2"), "pair_count"
        )
        .join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("__ca")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("__cb")), "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.log(
                (F.col("pair_count").cast("double") / F.col("__nb"))
                / (
                    (F.col("__ca").cast("double") / F.col("__nu"))
                    * (F.col("__cb").cast("double") / F.col("__nu"))
                )
            ).alias("__pmi"),
        )
    )
    topk = scored.orderBy(F.col("__pmi").desc(), "w1", "w2").limit(top)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("__pmi").desc(), "w1", "w2")
    return topk.select(
        "w1",
        "w2",
        "pair_count",
        F.round("__pmi", 6).alias("pmi"),
        F.row_number().over(w).cast("integer").alias("rank"),
    )


def pii_scrub(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, intl-prefixed phones) —
    the scrub step every public training-data pipeline runs before
    tokenization (C4/RefinedWeb-style regex redaction; the reference has
    no text surface at all).

    Output: (id, scrubbed text, one n_<name> match count per pattern).

    Scale: chained JVM regexp_replace/regexp_extract_all — per-row,
    codegen'd, shuffle-free; counts are computed on the PRE-scrub text so
    pattern order affects only the redacted string, not the counts.
    Patterns stay in RE2's common subset (greedy classes, no
    backtracking-only constructs) so Spark (Java regex) and the DuckDB
    oracle (RE2) match span-for-span.
    """
    pats = patterns or PII_PATTERNS
    out = documents.select(F.col(id_col), F.col(text_col))
    counts = [
        F.size(F.regexp_extract_all(text_col, F.lit(p), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, p in pats.items()
    ]
    scrubbed = F.col(text_col)
    for p in pats.values():
        scrubbed = F.regexp_replace(scrubbed, p, token)
    return out.select(
        F.col(id_col), scrubbed.alias("scrubbed"), *counts
    )


def bpe_merges(
    documents: DataFrame, n_merges: int = 6, *, text_col: str = "text"
) -> DataFrame:
    """Byte-pair-encoding vocabulary induction (Sennrich, Haddow, Birch,
    "Neural Machine Translation of Rare Words with Subword Units", ACL
    2016 — public): the tokenizer-training step of an LLM data pipeline.
    Start from per-word character sequences weighted by corpus word
    frequency; repeat n_merges times: count adjacent symbol pairs, merge
    the most frequent pair everywhere. Returns the learned merge table
    (step, lhs, rhs, merged, pair_count) — the artifact a BPE tokenizer
    ships.

    Distributed shape: word frequencies are one exploded groupBy (the
    heavy pass over the corpus happens ONCE — every merge step then works
    on the vocabulary table, which is heavy-hitters-bounded, not
    corpus-bounded); each step is a pair-count aggregation + a global
    top-1 (TakeOrdered, 1 row, localCheckpoint'd so the per-step lineage
    stays linear) + one literal string rewrite of the symbol column.

    Merge application is a separator-padded string replace: symbols live
    in ' a b c '-form and replacing ' lhs rhs ' with ' lhsrhs ' performs
    the leftmost-nonoverlapping rewrite IN ONE JVM string op — both
    engines' replace() share that exact semantics, which is what makes
    every step value-exact in the DuckDB twin. (For runs of the same
    repeated pair the shared-space scan differs from the textbook
    per-symbol fold in WHICH occurrences merge first — e.g. 'aaaaa' →
    aa,a,aa instead of aa,aa,a — identically on both engines; documented
    divergence, affects only same-symbol runs.) Ties on pair count break
    lexicographically (lhs, rhs asc).

    Determinism: counts are exact integers, selection is total-ordered,
    the rewrite is literal — no RNG, no floats, no partition dependence
    anywhere."""
    out, _ = _bpe_fit(documents, n_merges, text_col)
    return out


def _bpe_fit(documents: DataFrame, n_merges: int, text_col: str):
    """Shared BPE training loop: returns (merge table, encoded vocab) —
    the vocab's `seq` column after step N is each word's final symbol
    sequence, i.e. the tokenizer's encoding of that word."""
    words = (
        documents.select(F.explode(X.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        "w", "freq",
        F.concat(F.regexp_replace("w", "(.)", " $1"), F.lit(" ")).alias("seq"),
    )
    out = None
    for step in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("seq")), " ")
        n = F.greatest(F.size(syms) - 1, F.lit(0))
        pairs_arr = F.zip_with(
            F.slice(syms, 1, n),
            F.slice(syms, F.lit(2), n),
            lambda x, y: F.struct(x.alias("l"), y.alias("r")),
        )
        pc = (
            cur.select("freq", F.explode(pairs_arr).alias("p"))
            .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = (
            pc.orderBy(
                F.col("pair_count").desc(), F.col("lhs").asc(), F.col("rhs").asc()
            )
            .limit(1)
            .transform(cache.checkpoint)
        )
        pick = best.select(
            F.lit(step).alias("step"), "lhs", "rhs",
            F.concat("lhs", "rhs").alias("merged"), "pair_count",
        )
        out = pick if out is None else out.unionByName(pick)
        cur = cur.crossJoin(F.broadcast(best.select("lhs", "rhs"))).select(
            "w", "freq",
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("lhs"), F.lit(" "), F.col("rhs"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" ")),
            ).alias("seq"),
        )
    return out, cur


def bpe_encode(
    documents: DataFrame,
    n_merges: int = 6,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the learned BPE merges to the corpus: per-document subword
    token counts — the number an LLM data pipeline actually budgets by
    (sequence packing, token quotas, tokens-per-byte quality signals all
    consume THIS, not whitespace word counts).

    Distributed shape: encoding is a vocab-table join, not a per-token
    rewrite — the merge loop runs on the word-frequency table (heavy-
    hitters-bounded), each word's final symbol sequence comes out of the
    SAME loop that trained the merges, and documents join that tiny
    (w → piece-count) table after one explode. The corpus is scanned
    once for training (word freq) and once for encoding; no Python UDF,
    no per-document merge loop anywhere.

    Output: (id, n_words, n_bpe_tokens, chars_per_token) — n_bpe_tokens
    is the exact sum of per-word piece counts; chars_per_token is the
    compression the tokenizer achieves on that document.
    """
    _, vocab = _bpe_fit(documents, n_merges, text_col)
    pieces = vocab.select(
        "w", F.size(F.split(F.trim("seq"), " ")).cast("long").alias("n_pieces")
    )
    toks = documents.select(
        id_col,
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        F.explode(X.tokens(text_col)).alias("w"),
    )
    return (
        toks.join(pieces, "w")
        .groupBy(id_col, "__chars")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("__chars").cast("double") / F.col("n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


def ppl_buckets(
    documents: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting high quality monolingual datasets from web crawl data",
    LREC 2020 — public): score every document with the corpus bigram LM
    (bigram_logprob) and split the corpus into `n_buckets` equal-count
    quality tiers — head / middle / tail for the classic 3 — so
    downstream sampling can weight tiers instead of hard-filtering.

    Bucketing is ntile semantics over (score desc, id asc) —
    deterministic and value-exact — but NOT executed as an
    unpartitioned `ntile()` window (a single-partition sort of the
    whole score table, the textbook scale-killer). Instead the global
    rank comes from the distributed construction in `operators.rank`
    (range-partition → per-partition row_number → broadcast offsets —
    only a partition-count-sized table ever passes through one task)
    and the bucket number from the exact integer ntile formula on
    (rank, corpus count). Identical values to SQL ntile at every scale;
    the DuckDB oracle twin keeps the literal `ntile()` spelling."""
    lp = bigram_logprob(documents, text_col=text_col, id_col=id_col)
    ranked = rank_ops.with_global_rank(
        lp,
        [F.col("bigram_logprob").desc(), F.col(id_col).asc()],
        rank_col="__rank",
    )
    total = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    b = ranked.crossJoin(F.broadcast(total)).withColumn(
        "bucket",
        rank_ops.exact_ntile_bucket(F.col("__rank"), F.col("__n"), n_buckets),
    )
    if n_buckets == 3:
        tier = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        tier = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    return b.select(
        id_col, "bigram_logprob", "n_bigrams", "bucket", tier.alias("tier")
    )


# (?i): real corpora carry uppercase schemes (HTTP://...); both Java
# regex and RE2 support the inline flag, keeping the oracle span-exact
URL_PATTERN = r"(?i)https?://[^\s]+"
# host only: skip userinfo (user@), stop at port/path/query/fragment —
# 'https://trusted.com@evil.com/' must attribute to evil.com, and
# 'ex.org:8080' must not split one host's stats across rows
_DOMAIN_PATTERN = r"(?i)^https?://(?:[^/@\s]*@)?([^/:\s?#]+)"


def url_domains(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus statistics from in-text URLs — the provenance
    audit every web-scale pipeline runs (C4/RefinedWeb publish exactly
    this table): extract every http(s) URL, reduce it to its host, and
    aggregate (n_urls, n_docs) per domain. Downstream joins a blocklist
    (broadcast — domain tables are dimension-sized) or feeds per-domain
    sampling caps.

    Scale: regexp_extract_all + explode is a narrow pass over the text;
    the only shuffle is the per-domain hash aggregate with map-side
    partials — cardinality = distinct hosts, millions at web scale, one
    row each. Patterns stay in the Java-regex ∩ RE2 common subset
    (same rule as pii_scrub) so the DuckDB oracle matches span-for-span.
    """
    urls = documents.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(text_col, F.lit(URL_PATTERN), F.lit(0))
        ).alias("url"),
    )
    host = F.lower(F.regexp_extract("url", _DOMAIN_PATTERN, 1))
    return (
        urls.select(
            F.col(id_col),
            # regexp_extract returns '' when the host can't be isolated
            # ('https://#frag', 'https://:8080/x'); bucket those under an
            # explicit label instead of a silent ''-domain row (ADVICE r7)
            F.when(host == "", F.lit("(unparsed)")).otherwise(host).alias(
                "domain"
            ),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )
