"""Training-data pipeline operators beyond the §2 inventory: quality
filtering (Gopher-style repetition rules), deterministic corpus
sampling/mixing, PII redaction, sequence packing, and BM25 retrieval.

These are the corpus-preparation steps an LLM data pipeline runs at
100 TB between raw scans and the dedup/similarity stages already in
``plans/llm.py`` — each is a pure DataFrame expression/shuffle plan
(no Python row UDFs), each with a DuckDB oracle. Cross-engine
determinism tricks used throughout: ``md5`` hex strings as the shared
randomness spec (identical in Spark and DuckDB, unlike xxhash64 which
DuckDB lacks), exact integer-ratio doubles, and ``round(x, 6)`` on the
one score that crosses ``ln()`` implementations (BM25).

Repetition-rule reference: Rae et al., "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher" (2021), §A1.1 —
duplicate-word and top-n-gram fractions as quality gates. BM25:
Robertson & Zaragoza (2009), the k1/b parameterization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS
from ..sources.io import load_table
from ._scalar import attach_scalar_frame
from .registry import register

# --- Gopher-style repetition filter ------------------------------------------

_DUP_WORD_MAX = 0.55  # fixture median is 0.538 → flags roughly half
_TOP_BIGRAM_MAX = 0.08  # fixture p95-ish; Gopher uses 0.08 for top-2-grams


def _top_bigram_count(w, n):  # noqa: ANN001 - Column expressions
    """Exact count of the most frequent bigram, as a pure narrow
    expression: hash each adjacent word pair (64-bit xxhash64 — the
    collision odds within one document are ~len²·2⁻⁶⁴, absorbed the
    same way dedup_ngram_jaccard's hashed shingles are), sort the
    hashes, and take the longest equal-adjacent run with a struct-
    accumulator fold. O(len·log len) per document, ZERO shuffles —
    every bigram of a doc is already in the doc's own row, so the
    explode → groupBy(doc_id, bigram) formulation only adds two
    all-to-all exchanges (string bigrams, ~len rows/doc) for data that
    never needed to move: measured 41 s → 11 s at 100k docs, and the
    gap widens with corpus size since the exchanges carry the whole
    bigram stream while this expression ships one row per doc."""
    hashes = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.xxhash64(F.element_at(w, i), F.element_at(w, i + F.lit(1))),
        )
    )
    zero = F.struct(
        F.lit(0).cast("bigint").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):  # noqa: ANN001
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.when(
        n >= 2, F.aggregate(hashes, zero, step)["best"]
    ).otherwise(F.lit(0).cast("bigint"))



@register(
    "text_repetition_filter",
    oracle=f"""
    WITH w AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM w
    ),
    cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM cnt GROUP BY 1
    )
    SELECT w.doc_id,
           CAST(len(w.w) AS BIGINT) AS n_words,
           1.0 - CAST(len(list_distinct(w.w)) AS DOUBLE) / len(w.w)
               AS dup_word_frac,
           coalesce(CAST(top.top_cnt AS DOUBLE) / top.n_bigrams, 0.0)
               AS top_bigram_frac,
           (1.0 - CAST(len(list_distinct(w.w)) AS DOUBLE) / len(w.w))
               <= {_DUP_WORD_MAX}
             AND coalesce(CAST(top.top_cnt AS DOUBLE) / top.n_bigrams, 0.0)
               <= {_TOP_BIGRAM_MAX} AS keep
    FROM w LEFT JOIN top ON w.doc_id = top.doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition gate: duplicate-word fraction and
    top-bigram fraction per document, plus the keep/drop verdict.

    Scale shape: one narrow projection — no shuffle, no join. The
    words array is materialized first (expressions referenced inside
    higher-order-function lambdas get no CSE, so an inline split()
    would re-split per element); the top-bigram count is the
    sorted-hash run-length fold of `_top_bigram_count`. Linear scan →
    embarrassingly parallel at any corpus size; per-doc cost is
    len·log len, fine up to the length cap any real corpus enforces.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    w = F.col("w")
    n = F.size(w)
    top_frac = F.when(
        n >= 2,
        _top_bigram_count(w, n).cast("double") / (n - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    dup_frac = (
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n.cast("double")
    )
    return words.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_bigram_frac"),
        ((dup_frac <= _DUP_WORD_MAX) & (top_frac <= _TOP_BIGRAM_MAX)).alias(
            "keep"
        ),
    )


# --- deterministic stratified sampling (corpus mixing) -----------------------

# Per-source keep rates for the mixing recipe. The sampling decision is
# a pure function of doc_id: keep iff the first 8 hex chars of
# md5('smp' || doc_id) fall below rate·16⁸ — the md5 hex string is the
# cross-engine (and cross-run) randomness spec, so resampling is
# reproducible and rows never flap between runs or engines.
_MIX_RATES: dict[str, float] = {"src0": 0.9, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1


def _rate_hex(rate: float) -> str:
    return format(int(rate * 16**8), "08x")


def _mix_case_sql() -> str:
    arms = "\n".join(
        f"             WHEN '{s}' THEN '{_rate_hex(r)}'"
        for s, r in _MIX_RATES.items()
    )
    return (
        "CASE source\n" + arms + f"\n             ELSE '{_rate_hex(_MIX_DEFAULT)}'"
        " END"
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 8) <
          {_mix_case_sql()}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source downsampling — the domain-mixing
    primitive of a training-data pipeline (e.g. keep 90% of src0, 10%
    of the long tail). A stateless filter on a hash of the row key:
    fully pushed past the scan's column pruning, no shuffle, no RNG
    state, trivially restartable — the only correct shape at 100 TB
    (``df.sample()`` is partition-seeded and changes membership on
    repartition)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))), 1, 8)
    cut = F.lit(_rate_hex(_MIX_DEFAULT))
    for src, rate in _MIX_RATES.items():
        cut = F.when(F.col("source") == src, F.lit(_rate_hex(rate))).otherwise(cut)
    return docs.filter(key < cut).select("doc_id", "source", "lang")


# --- grouped deterministic reservoir sample ----------------------------------

_RSV_K = 10


@register(
    "sample_reservoir_grouped",
    oracle=f"""
    SELECT doc_id, source, rn
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('rsv' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {_RSV_K}
    """,
)
def sample_reservoir_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group sample without replacement, deterministic:
    rank rows inside each group by a keyed md5 and keep the first k —
    equivalent in distribution to a reservoir sample but reproducible
    and engine-portable. Executes as one hash partial-rank: Spark's
    WindowGroupLimit pushes the rn <= k limit below the sort at each
    map side, so only k rows per group per partition reach the
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("rsv"), F.col("doc_id").cast("string"))), "doc_id"
        )
    )
    return (
        docs.select("doc_id", "source", rn.alias("rn"))
        .filter(F.col("rn") <= _RSV_K)
        .select("doc_id", "source", F.col("rn").cast("long").alias("rn"))
    )


# --- PII redaction -----------------------------------------------------------

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones
    FROM aug
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: replace email/phone shapes with typed
    placeholders and count the redactions per document. The fixture
    corpus is synthetic, so deterministic PII is first appended from
    doc_id — exercising the redaction path on every row rather than
    zero. Patterns stay in the Java∩RE2 regex subset so the oracle is
    bit-identical. Pure per-row expression work: whole-stage codegen,
    no shuffle, linear at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
    )


# --- sequence packing --------------------------------------------------------

_CTX_WINDOW = 512


@register(
    "pack_sequences",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(len(str_split(text, ' '))) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS "offset",
           CAST(coalesce(sum(len(str_split(text, ' '))) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) // {_CTX_WINDOW} AS seq_id
    FROM documents
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing: documents are laid out
    in (source, doc_id) order and assigned the {_CTX_WINDOW}-token
    context window their first token lands in — the standard greedy
    packing used to build pretraining batches without padding waste.

    One running-sum window per source. The per-source sort is inherent
    to packing (token offsets are a prefix sum); at 100 TB you shard
    the same plan by (source, date_bucket) so each window partition
    stays executor-sized — the query shape is unchanged, only the
    partition key widens.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(n_tok).over(win), F.lit(0)).cast("long")
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        offset.alias("offset"),
        F.floor(offset / F.lit(_CTX_WINDOW)).cast("long").alias("seq_id"),
    )


# --- BM25 retrieval ----------------------------------------------------------

_BM25_TERMS = ["join", "window", "scan"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@register(
    "text_bm25_search",
    oracle=f"""
    WITH docs_len AS (
      SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
      FROM docs_len
    ),
    tf AS (
      SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
      WHERE w IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B}
                     + {_BM25_B} * docs_len.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN df USING (term)
      JOIN docs_len USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, round(score, 6) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_TOPK}
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed query over the corpus
    (Robertson-Zaragoza k1/b form, the Lucene idf variant
    ln(1 + (N-df+.5)/(df+.5))).

    Plan shape at scale: term postings are a filtered explode →
    (doc, term) hash aggregate; document frequency and corpus stats
    are tiny aggregate frames joined back via broadcast — no shuffle
    touches anything larger than the postings for the query terms.
    Scores are rounded to 6 decimals *before* the top-k rank so the
    ln() ulp gap between JVM and DuckDB can neither flip the hash nor
    the cut line.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs_len = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    stats = docs_len.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    # 1-row stats frame attached via a constant-key broadcast-hash join.
    # The key must not be a literal on both sides — Catalyst would fold
    # the equality to `true` and degrade the join to BNLJ; doc_id*0 is
    # unfoldable (nullable column), so the planner keeps a hash join.
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(docs_len, "doc_id")
        .withColumn("__k", (F.col("doc_id") * 0).cast("int"))
        .join(
            # key derived from avgdl, not n_docs: count(*) is
            # non-nullable so Catalyst folds n_docs*0 to a literal and
            # the equi-key degenerates to a pushed filter (→ BNLJ);
            # avg() is nullable, so avgdl*0 survives as a join key
            F.broadcast(stats.withColumn("__k", (F.col("avgdl") * 0).cast("int"))),
            "__k",
        )
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom).alias("score"))
    )
    # top-k via distributed TakeOrdered (orderBy+limit), NOT a global
    # row_number window — the latter would single-partition every
    # scored doc. The rank window then runs on k rows only.
    top = (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )
    rank = F.row_number().over(Window.orderBy(F.col("score").desc(), "doc_id"))
    return top.select("doc_id", "score", rank.cast("long").alias("rank"))


# --- unigram-LM quality score (perplexity proxy) -----------------------------


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM freq)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(-sum(ln(CAST(freq.c AS DOUBLE) / total.n)) / count(*), 6)
               AS avg_nll
    FROM tok JOIN freq USING (w) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: average negative log-probability
    of each document under the corpus's own unigram LM — the cheap
    stand-in for a KenLM filter (documents full of globally-rare tokens
    score high / unnatural, boilerplate scores low).

    Two shuffles total: one hash aggregate for the term frequencies,
    one (doc_id) aggregate for the score; the frequency table joins
    back onto the token stream by word (broadcast when the vocabulary
    is small, plain equi-join when it isn't — Catalyst/AQE decide from
    stats, both shapes are linear). The corpus total rides a 1-row
    broadcast cross join. ln() crosses engines → rounded to 6
    decimals, same as BM25."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    total = freq.agg(F.sum("c").cast("long").alias("n"))
    return (
        tok.join(freq, "w")
        .withColumn("__k", (F.col("doc_id") * 0).cast("int"))
        .join(F.broadcast(total.withColumn("__k", (F.col("n") * 0).cast("int"))), "__k")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("c").cast("double") / F.col("n")))
                / F.count("*"),
                6,
            ).alias("avg_nll"),
        )
    )


# --- composed end-to-end pipeline --------------------------------------------


@register(
    "pipeline_training_mix",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, str_split(text, ' ') AS w FROM documents
      WHERE substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 8) <
            {_mix_case_sql()}
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM w
    ),
    cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM cnt GROUP BY 1
    ),
    kept AS (
      SELECT w.doc_id, w.source, CAST(len(w.w) AS BIGINT) AS n_tokens
      FROM w LEFT JOIN top ON w.doc_id = top.doc_id
      WHERE (1.0 - CAST(len(list_distinct(w.w)) AS DOUBLE) / len(w.w))
              <= {_DUP_WORD_MAX}
        AND coalesce(CAST(top.top_cnt AS DOUBLE) / top.n_bigrams, 0.0)
              <= {_TOP_BIGRAM_MAX}
    )
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS "offset",
           CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) // {_CTX_WINDOW} AS seq_id
    FROM kept
    """,
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-preparation pipeline in ONE Catalyst plan:
    deterministic stratified mixing → Gopher repetition gate →
    sequence packing of the surviving documents, one optimized DAG.
    Stage order is chosen for cost, not semantics (the stages commute:
    sampling is a pure row-key predicate, the quality gate is
    doc-local): the cheap md5 mixing filter runs at the scan, so the
    expensive bigram explode and its aggregate only ever see the
    sampled subset, and only quality survivors reach the packing
    shuffle. At 100 TB the same composition runs unchanged, with each
    stage's scale notes (SCALE.md) applying verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))), 1, 8
    )
    cut = F.lit(_rate_hex(_MIX_DEFAULT))
    for src, rate in _MIX_RATES.items():
        cut = F.when(F.col("source") == src, F.lit(_rate_hex(rate))).otherwise(cut)
    words = docs.filter(key < cut).select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    w = F.col("w")
    n = F.size(w)
    top_frac = F.when(
        n >= 2,
        _top_bigram_count(w, n).cast("double") / (n - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    dup_frac = (
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n.cast("double")
    )
    kept = words.filter(
        (dup_frac <= _DUP_WORD_MAX) & (top_frac <= _TOP_BIGRAM_MAX)
    ).select("doc_id", "source", n.cast("long").alias("n_tokens"))
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(win), F.lit(0)).cast("long")
    return kept.select(
        "doc_id",
        "source",
        "n_tokens",
        offset.alias("offset"),
        F.floor(offset / F.lit(_CTX_WINDOW)).cast("long").alias("seq_id"),
    )


# --- RAG document chunking ---------------------------------------------------

_CHUNK_LEN = 200  # chars per chunk
_CHUNK_STRIDE = 150  # start-to-start distance => 50-char overlap


@register(
    "chunk_documents",
    oracle=f"""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text), 1),
                                    {_CHUNK_STRIDE})) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) // {_CHUNK_STRIDE} AS BIGINT)   AS chunk_no,
           substr(text, CAST(s AS BIGINT), {_CHUNK_LEN}) AS chunk_text,
           length(substr(text, CAST(s AS BIGINT), {_CHUNK_LEN})) AS chunk_len
    FROM starts
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style sliding-window chunking: fixed 200-char chunks with
    50-char overlap (stride 150), the retrieval-corpus prep step that
    sits between raw documents and the embedding/similarity stages.
    Expressed as sequence()+explode — a NARROW per-row transform with
    zero shuffles, so at 100 TB it streams: each input split yields
    its own chunk rows in place, output partitioning inherits the
    scan, and the ~1.33x char amplification is the only cost. Chunk
    boundaries are character-based (substring semantics are identical
    char-wise in Spark and DuckDB, multi-byte safe in both)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / _CHUNK_STRIDE).cast("long").alias("chunk_no"),
            F.expr(f"substring(text, s, {_CHUNK_LEN})").alias("chunk_text"),
            F.length(F.expr(f"substring(text, s, {_CHUNK_LEN})"))
            .cast("long")
            .alias("chunk_len"),
        )
    )


# --- CCNet-style quality bucketing -------------------------------------------

# Fixed thresholds = trained model state (CCNet buckets documents by a
# language-model perplexity cut learned OFFLINE on a held-out corpus;
# the per-document score here is the deterministic function-word ratio
# so the bucket edges are exact single-division floats, immune to
# cross-engine float-sum drift).
_QB_HEAD = 0.06
_QB_TAIL = 0.03
_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register(
    "text_ccnet_bucket",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(str_split(text, ' '),
                                  w -> list_contains({_STOP_SQL}, w))) AS DOUBLE)
               / len(str_split(text, ' ')) AS score
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN score >= {_QB_HEAD} THEN 'head'
                WHEN score >= {_QB_TAIL} THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored
    """,
)
def text_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al.
    2020): score every document with a cheap quality statistic and cut
    at FIXED thresholds carried as model state — the exact shape of
    CCNet's perplexity buckets, with the function-word ratio standing
    in for the KenLM score (single integer division per doc => the
    bucket comparison is bit-exact in both engines; a float-summed
    logprob would risk ulp flips at the cut). Pure narrow projection:
    zero shuffles, streams at any scale, and the bucket column is the
    partition key a downstream mixing job samples by."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    score = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast(
        "double"
    ) / F.size(w).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        F.when(score >= _QB_HEAD, F.lit("head"))
        .when(score >= _QB_TAIL, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# --- train/val/test split ----------------------------------------------------

_SPLIT_TRAIN = 0.9  # [0, .9) train, [.9, .95) val, [.95, 1) test


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5('spl' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '{format(int(0.9 * 16**8), "08x")}' THEN 'train'
                WHEN substr(md5('spl' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '{format(int(0.95 * 16**8), "08x")}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment — the split that
    must NEVER depend on row order, partitioning, or reruns (a doc
    that changes split between pipeline runs contaminates eval). Same
    keyed-md5 range trick as sample_stratified: the assignment is a
    pure function of doc_id, so it survives repartitioning, restarts,
    and incremental ingest (new docs land in fixed proportions), and
    it pushes down as a narrow projection — zero shuffles at any
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    key8 = F.substring(
        F.md5(F.concat(F.lit("spl"), F.col("doc_id").cast("string"))), 1, 8
    )
    return docs.select(
        "doc_id",
        F.when(key8 < F.lit(format(int(0.9 * 16**8), "08x")), F.lit("train"))
        .when(key8 < F.lit(format(int(0.95 * 16**8), "08x")), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# --- keep-best exact dedup ---------------------------------------------------


@register(
    "dedup_keep_best",
    oracle="""
    SELECT doc_id, digest, n_dups FROM (
      SELECT doc_id, md5(text) AS digest,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY md5(text)) AS n_dups
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup that keeps the BEST representative per duplicate
    cluster (longest n_chars, doc_id tiebreak) instead of an arbitrary
    one — the canonical-copy selection a crawl pipeline runs (many
    mirrors of a page; keep the most complete). One window pass over
    the md5(text) digest partitioning: rank + cluster size in the same
    Exchange, so the whole operator is one digest shuffle — payloads
    shuffle once, and at 100 TB the digest could be precomputed at
    ingest to shuffle 16 bytes instead of the text (the dedup_exact
    plan's trick, operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5("text")
    w = Window.partitionBy(digest).orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select(
            "doc_id",
            digest.alias("digest"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy(digest)).alias("n_dups"),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "digest", "n_dups")
    )


# --- temperature-scaled multilingual sampling --------------------------------


@register(
    "sample_temperature",
    oracle="""
    WITH lc AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS n_min FROM lc),
    cut AS (
      SELECT lang,
             CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))
                        * 4294967296) AS BIGINT) AS cutoff
      FROM lc, m
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN cut USING (lang)
    WHERE CAST(concat('0x', substr(md5('tmp' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) < cutoff
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language rebalancing (the mBERT/XLM α=0.5
    exponentiated-smoothing recipe): per-language keep rate
    sqrt(n_min/n_lang), so the largest languages are down-sampled
    toward the α=0.5 mixture and the smallest keeps every doc.
    Membership is the keyed-md5 integer compared to a per-language
    cutoff — every arithmetic step (int→double division, sqrt,
    ×2³², floor) is IEEE correctly-rounded, so the cut is bit-exact
    across engines with NO rounding hedge. Execution: one tiny lang
    aggregate broadcast back over the scan — the corpus itself never
    shuffles, which is the only acceptable shape for a 100 TB
    rebalance pass."""
    docs = load_table(spark, sf_dir, "documents")
    lc = docs.groupBy("lang").agg(F.count("*").alias("n"))
    n_min = lc.agg(F.min("n").alias("n_min"))
    cut = (
        attach_scalar_frame(lc, "lang", n_min, "n_min")
        .select(
            "lang",
            F.floor(
                F.sqrt(F.col("n_min").cast("double") / F.col("n").cast("double"))
                * F.lit(4294967296)
            )
            .cast("long")
            .alias("cutoff"),
        )
    )
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("tmp"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(cut), "lang")
        .filter(key < F.col("cutoff"))
        .select("doc_id", "lang")
    )


# --- tokenizer vocabulary build ----------------------------------------------

_VOCAB_K = 50


@register(
    "tokenizer_vocab_build",
    oracle=f"""
    WITH wc AS (
      SELECT word, count(*) AS n
      FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ), tot AS (SELECT sum(n) AS total FROM wc),
    ranked AS (
      SELECT word, n,
             row_number() OVER (ORDER BY n DESC, word) AS rank,
             sum(n) OVER (ORDER BY n DESC, word
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM wc
    )
    SELECT word, n, CAST(rank AS BIGINT) AS rank,
           round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_frac
    FROM ranked, tot WHERE rank <= {_VOCAB_K}
    """,
)
def tokenizer_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction: top-K corpus words with
    cumulative coverage (what fraction of all tokens the first k
    vocab entries explain) — the frequency table a BPE/unigram
    trainer seeds from, and the coverage curve that picks vocab size.
    The heavy stage (explode + count) is a normal distributed
    aggregate; the top-K cut happens via the distributed TakeOrdered
    idiom (orderBy+limit — per-partition top-K, merged on the driver
    side of the exchange), so the rank/cumsum window only ever sees K
    rows, never the full vocabulary (round 8: previously the window
    walked every distinct type — correct, but a needless
    single-partition pass over millions of rows at 100 TB; the prefix
    sums of the kept rows depend only on rows ranked above them, all
    of which the limit retains, so the rewrite is bit-exact).
    cum_frac is a single bigint/bigint division rounded to 6dp."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    total = wc.agg(F.sum("n").alias("total"))
    top = wc.orderBy(F.desc("n"), F.asc("word")).limit(_VOCAB_K)
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    ranked = top.select(
        "word",
        "n",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    return attach_scalar_frame(ranked, "word", total, "total").select(
        "word",
        "n",
        "rank",
        F.round(F.col("cum").cast("double") / F.col("total").cast("double"), 6).alias(
            "cum_frac"
        ),
    )


# --- TF-IDF keyword extraction (round 6) -------------------------------------


@register(
    "text_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
      GROUP BY 1, 2
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((nn.n + 1.0) / (dft.df + 1.0)) + 1.0), 6)
               AS score
      FROM tf JOIN dft USING (term), nn
    )
    SELECT doc_id, term AS top_term, score
    FROM (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top TF-IDF term of every
    document (smoothed sklearn-style idf = ln((N+1)/(df+1)) + 1).

    Plan shape at scale: postings are one explode → (doc, term) hash
    aggregate; document frequency is an aggregate OVER THE POSTINGS
    (never re-scans text); idf is precomputed on the vocab-sized df
    table (bounded model state — the 1-row corpus count crosses onto
    the VOCAB frame only, never the postings), then broadcast back.
    The only window runs per-doc (partitioned by doc_id), so nothing
    is single-partition. Scores round to 6dp BEFORE the per-doc
    argmax so the JVM/DuckDB ln() ulp gap cannot flip a winner; ties
    break on the term string."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    nn = docs.agg(F.count("*").cast("double").alias("n"))
    vocab_idf = attach_scalar_frame(dft, "term", nn, "n").select(
        "term",
        (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    scored = tf.join(F.broadcast(vocab_idf), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "score")
    )


# --- incremental batch ETL (round 6) -----------------------------------------


@register(
    "pipeline_incremental_etl",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY 1
    """,
)
def pipeline_incremental_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch ETL: the high-watermark pattern every
    warehouse job uses between streaming and full recompute — process
    only rows newer than the bookmark, MERGE the partial aggregate
    into the stored state, repeat. Simulated here as two increments
    split at the corpus median timestamp; the final merged state must
    equal the full-batch aggregate EXACTLY, which holds because
    count/sum are commutative monoids and the increments partition
    the input (the same algebra that makes map-side partial
    aggregation correct). The merge is a full-outer join on the key +
    monoid combine — identical plan shape to sink_merge_upsert, and
    value sums run in int64 cents so increment order can't move a
    cent. At scale the bookmark comes from the sink's max processed
    ts and each increment touches only new partitions."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # bookmark: an O(1) driver statistic (same class as the [OR11]
    # stats step); a real job reads it from the sink's metadata
    cut = ev.agg(
        F.percentile_approx("ts", F.lit(0.5), F.lit(100)).alias("c")
    ).collect()[0]["c"]

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents")
        )

    state = agg_of(ev.filter(F.col("ts") <= F.lit(cut)))  # increment 1
    delta = agg_of(ev.filter(F.col("ts") > F.lit(cut)))  # increment 2
    merged = state.join(
        delta.select(
            F.col("user_id").alias("d_user"),
            F.col("n_events").alias("d_n"),
            F.col("sum_cents").alias("d_cents"),
        ),
        state.user_id == F.col("d_user"),
        "full_outer",
    )
    return merged.select(
        F.coalesce(F.col("user_id"), F.col("d_user")).alias("user_id"),
        (
            F.coalesce(F.col("n_events"), F.lit(0))
            + F.coalesce(F.col("d_n"), F.lit(0))
        ).alias("n_events"),
        (
            (
                F.coalesce(F.col("sum_cents"), F.lit(0))
                + F.coalesce(F.col("d_cents"), F.lit(0))
            )
            / 100.0
        ).alias("total_value"),
    )


# --- line-level (segment) exact dedup ---------------------------------------

#: words per dedup segment. The fixture corpus is single-line text, so
#: the "line" unit of CCNet/Gopher line-dedup is re-expressed as a
#: deterministic 10-word segmentation — the algorithm (global exact
#: dedup of sub-document units, keep-first) is identical; on real
#: multi-line corpora the segmenter is split('\n').
_SEG_WORDS = 10

_LINE_DEDUP_ORACLE = f"""
WITH w AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seg_no,
         array_to_string(w[(i*{_SEG_WORDS}+1):(i*{_SEG_WORDS}+{_SEG_WORDS})],
                         ' ') AS seg
  FROM w, unnest(generate_series(
           0, CAST(ceil(len(w) / {_SEG_WORDS}.0) AS INT) - 1)) AS t(i)
),
kept AS (
  SELECT doc_id, seg_no, seg FROM (
    SELECT doc_id, seg_no, seg,
           row_number() OVER (PARTITION BY seg
                              ORDER BY doc_id, seg_no) AS rn
    FROM segs) WHERE rn = 1
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_no) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT w.doc_id,
       CAST(ceil(len(w.w) / {_SEG_WORDS}.0) AS BIGINT) AS n_segments,
       coalesce(agg.n_kept, 0) AS n_kept,
       coalesce(agg.clean_text, '') AS clean_text
FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
"""


@register("text_line_dedup", oracle=_LINE_DEDUP_ORACLE)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level exact dedup across the corpus (CCNet/Gopher line
    dedup): split every document into deterministic 10-word
    segments, keep each distinct segment's FIRST occurrence corpus-wide
    (ordered by doc_id, seg_no), drop every later copy, and reassemble
    the surviving segments in document order. Catches boilerplate the
    whole-document dedups cannot (headers/footers shared across
    otherwise-distinct pages).

    Scale shape: segmentation is a narrow explode (~1× char
    amplification); the keep-first decision is ONE hash shuffle on the
    segment text (window row_number over seg) — the same cost class as
    dedup_exact, never pairwise; reassembly is one groupBy(doc_id) with
    an order-stable array_sort(collect_list(struct)) so the result is
    deterministic under any partitioning. At 100 TB the segment shuffle
    dominates and salts naturally (segments hash uniformly); the
    reassembly shuffle is input-sized."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n_segs = F.ceil(F.size(words) / F.lit(float(_SEG_WORDS))).cast("long")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * _SEG_WORDS + 1, _SEG_WORDS)
        ),
    )
    seg_rows = docs.select(
        "doc_id",
        n_segs.alias("n_segments"),
        F.posexplode(segs).alias("seg_no", "seg"),
    ).select("doc_id", "n_segments", F.col("seg_no").cast("long").alias("seg_no"), "seg")
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_no")
    kept = (
        seg_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_no", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )
    base = docs.select("doc_id", n_segs.alias("n_segments"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# --- heavy hitters (two-pass exact) -----------------------------------------

#: Misra-Gries counter budget per partition. Guarantee: any token with
#: global frequency > N/(K+1) has per-partition frequency > n_p/(K+1)
#: in at least one partition (pigeonhole over the partition sizes), and
#: a K-counter Misra-Gries summary retains every item with local
#: frequency > n_p/(K+1) — so the candidate union is COMPLETE for the
#: N/(K+1) threshold and pass 2's exact recount makes the result exact
#: (no false positives either).
_HH_COUNTERS = 63

def misra_gries_update(counters: dict, values, k: int) -> dict:
    """Stream ``values`` through a K-counter Misra-Gries summary in
    place. Invariant: after processing n items, any item with true
    frequency > n/(k+1) is PRESENT in ``counters`` (each decrement-all
    step consumes k+1 occurrences — one new, k counted — so an item's
    counter can be decremented at most n/(k+1) times). Property-tested
    under hypothesis in tests/test_kernels.py."""
    for word in values:
        if word in counters:
            counters[word] += 1
        elif len(counters) < k:
            counters[word] = 1
        else:  # decrement-all step (dict kept small: k entries)
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


_HH_ORACLE = f"""
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS word FROM documents
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
SELECT word, CAST(count(*) AS BIGINT) AS freq
FROM tok, tot
GROUP BY word, tot.n
HAVING count(*) > tot.n / ({_HH_COUNTERS} + 1)
"""


@register("agg_heavy_hitters", oracle=_HH_ORACLE)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (tokens with frequency > N/(K+1), K=63)
    via the classic two-pass distributed Misra-Gries:

    pass 1 — each partition streams its tokens through a K-counter
    Misra-Gries summary inside mapInPandas and emits only its ≤K
    candidate tokens (a few KB per partition, no token shuffle at
    all); pass 2 — the tiny candidate union broadcasts back and only
    candidate tokens are exactly recounted (one shuffle of the
    filtered, candidate-only token stream). Completeness is the
    pigeonhole argument on the docstring of _HH_COUNTERS; the recount
    removes false positives, so the output is exactly the true
    > N/(K+1) set — same answer as a full wordcount, at a fraction of
    the shuffle: at 100 TB, pass 1 moves K rows per partition instead
    of the corpus, and pass 2 shuffles only the heavy tail.
    """
    from collections.abc import Iterator

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("text")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("word"))

    def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            misra_gries_update(counters, pdf["word"], _HH_COUNTERS)
        yield pd.DataFrame({"word": list(counters.keys())})

    candidates = tokens.mapInPandas(mg_candidates, schema="word string").distinct()

    # O(1)-result driver statistic (same class as [OR11] stats step)
    n_total = tokens.count()
    threshold = n_total / (_HH_COUNTERS + 1)

    return (
        tokens.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > F.lit(threshold))
        .select("word", "freq")
    )


@register(
    "sample_balanced_downsample",
    oracle="""
    WITH sized AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ), target AS (SELECT min(n) AS m FROM sized),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    )
    SELECT doc_id, lang FROM ranked, target WHERE rk <= target.m
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps exactly
    min-class-count documents, selected by a DETERMINISTIC md5 rank
    (restart-safe, seedless — same rows every run on every cluster,
    the property rand()-based sampling lacks). The per-class quota is
    a grouped count broadcast back (bounded model state); selection is
    one window over the lang partitioning. The md5-of-id order is a
    uniform random permutation in disguise, so the kept subset is an
    unbiased SRS per class — the balanced-training-mix prep step. At
    100 TB: one shuffle on the class key; skewed classes are exactly
    the ones the quota truncates, so the window's per-partition work
    is bounded by the class size it keeps plus a scan of the rest."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    quota = docs.groupBy("lang").count().agg(F.min("count").alias("m"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.withColumn("rk", F.row_number().over(w))
    return (
        attach_scalar_frame(ranked, "doc_id", quota, "m")
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "lang")
    )


@register(
    "sample_weighted_systematic",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ), c AS (
      SELECT doc_id, lang, weight,
             sum(weight) OVER (ORDER BY k, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cw
      FROM w
    ), t AS (SELECT CAST(sum(weight) AS BIGINT) // 50 AS stride FROM w)
    SELECT doc_id, lang, weight
    FROM c, t
    WHERE cw // stride > (cw - weight) // stride
    """,
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sampling (probability ∝ size): ~50 documents
    drawn with inclusion probability proportional to n_chars — the
    standard survey-sampling design for token-weighted corpus picks
    (a doc is chosen iff its [cw−w, cw) cumulative-weight interval
    contains a multiple of the stride W/50). Every step is EXACT
    integer arithmetic over an md5-permuted order, so the draw is
    deterministic, restart-safe, and engine-independent — no RNG, no
    float boundary to disagree on. The global cumulative sum — the
    part a naive plan does with one single-partition window — runs as
    the classic two-level distributed prefix sum: 256 hex-prefix
    chunks of the md5 key are each cumsum'd under their own
    partitioned window (chunk is a PREFIX of the sort key, so
    chunk-then-key order IS the global order), and each chunk's
    offset is the exclusive prefix of the 256-row chunk-total ladder,
    computed as a bounded broadcast triangle join (<=256*255/2 pairs)
    and broadcast back. At 100 TB: one shuffle on the chunk key plus
    alphabet-bounded ladder work — no single-partition pass of ANY
    size, window or otherwise."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("weight"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    ).withColumn("chunk", F.substring("k", 1, 2))
    win = Window.partitionBy("chunk").orderBy("k", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = docs.withColumn("cw_in", F.sum("weight").over(win))
    totals = docs.groupBy("chunk").agg(F.sum("weight").alias("csum"))
    # exclusive prefix over the 256-row chunk ladder as a bounded
    # triangle join (<=256*255/2 pairs, broadcast, distributed) — no
    # partition-less WindowExec anywhere in the plan (r11: retired
    # this plan's former 256-row ladder window from the GLOBALWIN
    # whitelist; the fixed chunk alphabet bounds the join, not a
    # single-task sort)
    prior = totals.select(
        F.col("chunk").alias("_pc"), F.col("csum").alias("_ps")
    )
    offsets = (
        totals.join(F.broadcast(prior), F.col("_pc") < F.col("chunk"), "left")
        .groupBy("chunk")
        .agg(F.coalesce(F.sum("_ps"), F.lit(0)).alias("offset"))
    )
    cum = (
        local.join(F.broadcast(offsets), "chunk")
        .withColumn("cw", F.col("cw_in") + F.col("offset"))
    )
    stride = docs.agg(
        F.expr("CAST(sum(weight) AS BIGINT) DIV 50").alias("stride")
    )
    return (
        attach_scalar_frame(cum, "doc_id", stride, "stride")
        .filter(
            F.expr("cw DIV stride") > F.expr("(cw - weight) DIV stride")
        )
        .select("doc_id", "lang", "weight")
    )


@register(
    "text_collocations_pmi",
    oracle="""
    WITH words AS (
      SELECT unnest(str_split(text, ' ')) AS w FROM documents
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY w
    ), nw AS (SELECT CAST(count(*) AS BIGINT) AS total_w FROM words),
    bi AS (
      SELECT l[CAST(i AS INT)] AS w1, l[CAST(i AS INT) + 1] AS w2
      FROM (SELECT str_split(text, ' ') AS l FROM documents)
      CROSS JOIN unnest(range(1, len(l))) AS t(i)
    ), bic AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab FROM bi GROUP BY w1, w2
    ), nb AS (SELECT CAST(count(*) AS BIGINT) AS total_b FROM bi)
    SELECT w1, w2, n_ab,
           round(((((CAST(n_ab AS DOUBLE) * total_w) * total_w)
                   / total_b) / a.n) / b.n, 6) AS lift
    FROM bic
    JOIN uni a ON bic.w1 = a.w
    JOIN uni b ON bic.w2 = b.w
    CROSS JOIN nw CROSS JOIN nb
    WHERE n_ab >= 5
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: adjacent word pairs whose observed
    frequency beats the independence baseline — the PMI lift
    p(ab)/(p(a)p(b)) that phrase-table and tokenizer-merge pipelines
    rank by (PMI itself is ln(lift); the ln is left to the consumer
    because lift carries the same order and ln() is the one
    1-ulp-divergent op across engines). Bigram formation is a pure
    array expression (transform over the split — no shuffle until the
    count), unigram totals ride a broadcast, and the lift expression
    is a FIXED parenthesization of IEEE double ops — multiplication
    and division are correctly rounded, so identical operand order ⇒
    bit-identical lift in both engines; only the final display
    rounding is cosmetic. Shuffles: two grouped counts (bigrams,
    unigrams) + two broadcast joins of the bounded unigram table. At
    100 TB the n_ab ≥ 5 support filter is applied before the joins —
    the long tail of singleton bigrams never leaves the combiner."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("l")
    )
    words = docs.select(F.explode("l").alias("w"))
    uni = words.groupBy("w").agg(F.count("*").alias("n"))
    nw = words.agg(F.count("*").cast("long").alias("total_w"))
    bi = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(l) - 1),"
                " i -> struct(element_at(l, i) AS w1,"
                "             element_at(l, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    nb = bi.agg(F.count("*").cast("long").alias("total_b"))
    bic = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    a = uni.select(F.col("w").alias("aw"), F.col("n").alias("n_a"))
    b = uni.select(F.col("w").alias("bw"), F.col("n").alias("n_b"))
    joined = (
        bic.join(F.broadcast(a), bic.w1 == a.aw)
        .join(F.broadcast(b), bic.w2 == b.bw)
    )
    joined = attach_scalar_frame(joined, "w1", nw, "total_w")
    joined = attach_scalar_frame(joined, "w1", nb, "total_b")
    lift = F.round(
        F.col("n_ab").cast("double")
        * F.col("total_w")
        * F.col("total_w")
        / F.col("total_b")
        / F.col("n_a")
        / F.col("n_b"),
        6,
    )
    return joined.select("w1", "w2", "n_ab", lift.alias("lift"))


@register(
    "pipeline_quality_gate_report",
    oracle="""
    SELECT 'documents_empty_text' AS check_name,
           count(*) FILTER (WHERE length(text) = 0 OR text IS NULL)
             AS n_violations,
           count(*) AS n_checked
    FROM documents
    UNION ALL
    SELECT 'events_value_negative', count(*) FILTER (WHERE value < 0), count(*)
    FROM events
    UNION ALL
    SELECT 'lineitem_orphan_fk', count(*), (SELECT count(*) FROM lineitem)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_qty_range',
           count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50), count(*)
    FROM lineitem
    UNION ALL
    SELECT 'orders_dup_pk',
           CAST(coalesce(sum(cnt - 1), 0) AS BIGINT),
           CAST(coalesce(sum(cnt), 0) AS BIGINT)
    FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'orders_null_custkey', count(*) FILTER (WHERE o_custkey IS NULL),
           count(*)
    FROM orders
    """,
)
def pipeline_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate — the pre-training-ingest assertion report
    (the Great-Expectations/dbt-test shape): one row per invariant
    with violation and population counts, so a pipeline can refuse to
    promote a snapshot whose violations exceed budget. Checks span
    null keys, duplicate primary keys, referential orphans
    (anti-join, the only shuffle that moves data — and it moves only
    the FK column), domain ranges and empty payloads. Each check is
    an independent scan+aggregate over ONLY the columns it tests
    (column pruning verified), so at 100 TB the report costs one
    projected pass per table and the unioned result is 6 rows."""
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def check(name: str, df: DataFrame, viol) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.coalesce(
                F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_violations"),
            F.count("*").alias("n_checked"),
        )

    empty_text = check(
        "documents_empty_text",
        docs.select("text"),
        (F.length("text") == 0) | F.col("text").isNull(),
    )
    neg_value = check(
        "events_value_negative", ev.select("value"), F.col("value") < 0
    )
    li_keys = li.select("l_orderkey")
    # one pass: left join against the (unique) PK, count misses and
    # population in the same aggregate — no 1-row crossJoin (BNLJ)
    orphans = (
        li_keys.join(
            orders.select("o_orderkey"),
            li_keys.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.lit("lineitem_orphan_fk").alias("check_name"),
            F.coalesce(
                F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("n_violations"),
            F.count("*").alias("n_checked"),
        )
    )
    qty_range = check(
        "lineitem_qty_range",
        li.select("l_quantity"),
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
    )
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.lit("orders_dup_pk").alias("check_name"),
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_violations"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_checked"),
        )
    )
    null_ck = check(
        "orders_null_custkey", orders.select("o_custkey"), F.col("o_custkey").isNull()
    )
    return (
        empty_text.unionByName(neg_value)
        .unionByName(orphans)
        .unionByName(qty_range)
        .unionByName(dup_pk)
        .unionByName(null_ck)
    )


@register(
    "dedup_url_canonical",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 < 6 THEN 'https://' ELSE 'http://' END
             || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
             || '.example.com/docs/' || CAST(doc_id % 400 AS VARCHAR)
             || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed&utm_medium=rss'
                     ELSE '' END AS raw_url
      FROM documents
    ), c AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(raw_url), '^http://', 'https://'),
                   '^https://www\\.', 'https://'),
                 '\\?utm_[^#]*$', ''),
               '/$', '') AS canonical_url
      FROM u
    )
    SELECT canonical_url,
           count(*) AS n_docs,
           min(doc_id) AS keeper_doc_id
    FROM c GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the CommonCrawl-style first pass
    that collapses scheme/case/www/tracking-param/trailing-slash
    variants of the same page before any content hashing. The fixture
    carries no URL column, so a deterministically MESSY url derives
    from (source, doc_id) on both engines (the derivation is fixture
    plumbing; the canonicalization chain is the operator): lowercase →
    force https → strip www. → drop utm tracking query → drop trailing
    slash, then group by canonical form keeping the smallest doc_id —
    one projection and ONE shuffle on the canonical key, the same
    scale shape as dedup_exact. Path collisions (mod 400) plant real
    cross-doc duplicates so the keeper choice is exercised."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    raw = F.concat(
        F.when(F.col("doc_id") % 11 < 6, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 400).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("?utm_source=feed&utm_medium=rss")
        ).otherwise(F.lit("")),
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(raw), "^http://", "https://"),
                "^https://www\\.",
                "https://",
            ),
            "\\?utm_[^#]*$",
            "",
        ),
        "/$",
        "",
    )
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@register(
    "text_sentence_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_transform(regexp_split_to_array(text, '[.!?]+'),
                              x -> trim(x)),
               x -> length(x) > 0) AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(list_aggregate(list_transform(sents, x -> length(x)), 'sum')
                AS BIGINT) AS total_chars,
           round(CAST(list_aggregate(list_transform(sents, x -> length(x)),
                                     'sum') AS DOUBLE)
                 / len(sents), 6) AS mean_sentence_chars
    FROM s WHERE len(sents) > 0
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats — the pre-chunking pass an LLM
    corpus pipeline runs to pick chunk boundaries: per document,
    sentence count and mean sentence length from a delimiter-class
    split ([.!?]+, trimmed, empties dropped). Pure JVM array
    expressions end-to-end (split → transform → filter → aggregate
    fold): zero shuffles, zero Python, and the per-row state is the
    sentence list of ONE document, so the pass is embarrassingly
    parallel at any corpus size. Integer char totals; the single
    float division is the final 6dp-rounded display value
    (SURVEY §5.4)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sents = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    lens = F.transform(F.col("sents"), lambda x: F.length(x).cast("long"))
    return (
        docs.select("doc_id", sents.alias("sents"))
        .filter(F.size("sents") > 0)
        .select(
            "doc_id",
            F.size("sents").cast("long").alias("n_sentences"),
            F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x).alias(
                "total_chars"
            ),
        )
        .withColumn(
            "mean_sentence_chars",
            F.round(F.col("total_chars") / F.col("n_sentences"), 6),
        )
    )


#: Poisson(1) CDF cut points on the 2^32 integer scale — FIXED
#: literals shared verbatim with the oracle so draw counts are
#: engine-exact (SURVEY §5.4: never recompute float constants twice).
_POIS_CUTS = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)


def _pois_case_sql(u: str) -> str:
    w = [f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUTS)]
    return "CASE " + " ".join(w) + " ELSE 6 END"


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(3)) AS replicate),
    h AS (
      SELECT md5('boot' || CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)) AS hex,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ), drawn AS (
      SELECT r.replicate,
             {_pois_case_sql("CAST(concat('0x', substr(h.hex, 1 + 8 * CAST(r.replicate AS INTEGER), 8)) AS BIGINT)")} AS k,
             h.cents
      FROM h, reps r
    )
    SELECT replicate,
           CAST(sum(k) AS BIGINT) AS n_drawn,
           round(CAST(sum(k * cents) AS DOUBLE) / (100.0 * sum(k)), 6)
             AS mean_price
    FROM drawn GROUP BY 1
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google 2012) — THE
    scalable bootstrap: instead of resampling n rows with replacement
    (which needs global coordination), each row independently draws
    its multiplicity k ~ Poisson(1) per replicate, so B replicate
    estimates stream out of ONE scan with map-side combine and no
    shuffle beyond B tiny groups. Multiplicities come from a keyed
    md5 uniform pushed through fixed integer CDF cut points — shared
    literals with the oracle, so every draw is engine-exact,
    restart-safe and independent of partitioning (df.sample() is
    neither). Mean runs in int cents·k until one final rounded
    division."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        # ONE digest per row; each replicate reads a DISJOINT 8-hex
        # window of it (3 independent 32-bit uniforms from one md5 —
        # measured 2.9 s -> ~1 s at sf0.1 vs hashing per replicate;
        # caps B at 4 replicates per digest, re-seed for more)
        F.md5(
            F.concat(
                F.lit("boot"),
                F.col("l_orderkey").cast("string"),
                F.lit("-"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("hex"),
    )
    # r14-opt (guide §2.3, the eval_bootstrap_ci_mean treatment): the
    # three replicate draws become three k COLUMNS — substring windows
    # compared LEXICOGRAPHICALLY against 8-hex literal cuts (fixed-
    # width lowercase hex orders as its numeric value; drops conv()'s
    # per-row parse) — summed in ONE pass of six int64 aggregates and
    # unpivoted with stack() after. The old ×3 explode shipped every
    # row (with its 32-char hex) three times into the aggregate.
    # Int64 sums are order-independent: replicate totals, and the
    # mean derived from them, are bit-identical.
    def case_sql(w: int) -> str:
        return (
            "CASE "
            + " ".join(
                f"WHEN h{w} < '{format(c, '08x')}' THEN {i}"
                for i, c in enumerate(_POIS_CUTS)
            )
            + f" ELSE 6 END AS k{w}"
        )

    ks = li.selectExpr(
        "cents",
        *[f"substring(hex, {1 + 8 * w}, 8) AS h{w}" for w in range(3)],
    ).selectExpr("cents", *[case_sql(w) for w in range(3)])
    agg3 = ks.agg(
        *[
            a
            for w in range(3)
            for a in (
                F.sum(f"k{w}").cast("long").alias(f"n{w}"),
                F.sum(F.col(f"k{w}") * F.col("cents"))
                .cast("long")
                .alias(f"kc{w}"),
            )
        ]
    )
    return agg3.selectExpr(
        "stack(3, "
        + ", ".join(f"CAST({w} AS BIGINT), n{w}, kc{w}" for w in range(3))
        + ") AS (replicate, n_drawn, kc)"
    ).filter(
        # degenerate-input guard (ADVICE r14 item 1): the global agg
        # yields one all-null row on EMPTY input, which would stack to
        # 3 null replicates where the oracle returns 0 rows. n_drawn
        # is never null on non-empty input (int64 sum), so this is a
        # no-op on every fixture.
        F.col("n_drawn").isNotNull()
    ).select(
        "replicate",
        "n_drawn",
        F.round(F.col("kc") / (F.lit(100.0) * F.col("n_drawn")), 6).alias(
            "mean_price"
        ),
    )


@register(
    "pipeline_token_budget_waterfill",
    oracle="""
    WITH src AS (
      SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS toks
      FROM documents GROUP BY 1, 2
    ), ordered AS (
      SELECT source, lang, toks,
             row_number() OVER (ORDER BY toks, source, lang) AS rn,
             CAST(sum(toks) OVER (ORDER BY toks, source, lang
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(count(*) OVER () AS BIGINT) AS n_grp,
             CAST(sum(toks) OVER () AS BIGINT) AS total
      FROM src
    ), feas AS (
      SELECT *,
             CAST(floor(0.6 * total) AS BIGINT) AS budget,
             cum - toks + (n_grp - rn + 1) * toks
               <= CAST(floor(0.6 * total) AS BIGINT) AS whole
      FROM ordered
    ), tau AS (
      SELECT max(CASE WHEN whole THEN rn ELSE 0 END) AS k,
             coalesce(max(CASE WHEN whole THEN cum END), 0) AS kept,
             max(budget) AS b, max(n_grp) AS n
      FROM feas
    )
    SELECT f.source, f.lang, f.toks,
           CAST(CASE WHEN f.rn <= t.k THEN f.toks
                ELSE (t.b - t.kept)
                     // (CASE WHEN t.n - t.k = 0 THEN 1 ELSE t.n - t.k END)
                END AS BIGINT) AS alloc
    FROM feas f, tau t
    """,
)
def pipeline_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATERFILLING — the data-mixing allocator a
    training pipeline runs when the compute budget caps total tokens:
    every (source, lang) domain keeps all its tokens up to a common
    cap τ, chosen so Σ min(tokens, τ) fills the budget — small
    domains survive whole, large ones are clipped evenly (the
    max-min-fair allocation; same math as link-bandwidth
    waterfilling). Closed form, no iteration: sort domains by size,
    prefix-cumsum once, the cap boundary k is the largest rank whose
    remaining-domains-at-this-size projection still fits (the
    feasibility predicate is monotone along the sorted order), and τ
    falls out of one integer division. ALL in int64 — allocation is
    exactly reproducible and never overshoots (undershoot < #domains
    from the floor). The windows run over the |domains| frame
    (bounded at any corpus size); the one-row boundary stats attach
    via the unfoldable-key broadcast frame, never a BNLJ crossJoin."""
    src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.sum("n_chars").cast("long").alias("toks"))
    )
    w_ord = Window.orderBy("toks", "source", "lang")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ordered = src.select(
        "source",
        "lang",
        "toks",
        F.row_number().over(w_ord).cast("long").alias("rn"),
        F.sum("toks").over(w_cum).alias("cum"),
        F.count("*").over(w_all).alias("n_grp"),
        F.sum("toks").over(w_all).alias("total"),
    )
    feas = ordered.withColumn(
        "budget", F.floor(0.6 * F.col("total")).cast("long")
    ).withColumn(
        "whole",
        F.col("cum") - F.col("toks")
        + (F.col("n_grp") - F.col("rn") + 1) * F.col("toks")
        <= F.col("budget"),
    )
    tau = feas.agg(
        F.max(F.when(F.col("whole"), F.col("rn")).otherwise(0)).alias("k"),
        F.coalesce(
            F.max(F.when(F.col("whole"), F.col("cum"))), F.lit(0)
        ).alias("kept"),
        F.max("budget").alias("b"),
        F.max("n_grp").alias("n"),
    )
    joined = attach_scalar_frame(feas, "source", tau, "k")
    # integer division (not float-then-floor): double division drifts
    # from BIGINT // once operands pass 2^53 — exact at any scale
    cap = F.expr("(b - kept) div greatest(n - k, 1L)")
    return joined.select(
        "source",
        "lang",
        "toks",
        F.when(F.col("rn") <= F.col("k"), F.col("toks"))
        .otherwise(cap)
        .cast("long")
        .alias("alloc"),
    )


@register(
    "pipeline_preference_pairs",
    oracle="""
    SELECT source,
           arg_max(doc_id, printf('%08d-%08d', n_chars, doc_id))
             AS chosen_doc_id,
           arg_min(doc_id, printf('%08d-%08d', n_chars, doc_id))
             AS rejected_doc_id,
           max(n_chars) AS chosen_score,
           min(n_chars) AS rejected_score,
           max(n_chars) - min(n_chars) AS score_margin
    FROM documents
    GROUP BY 1
    """,
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the DPO/RLHF data-prep step:
    per prompt group (source stands in), pick the best- and
    worst-scoring candidate as (chosen, rejected) with the score
    margin for loss weighting. ONE hash aggregate via max_by/min_by
    whose partials carry a single candidate per group (the
    agg_max_by_min_by lesson), with the zero-padded
    '(score, doc_id)' SORTABLE-STRING comparand making ties
    engine-deterministic. At 100 TB: O(groups) shuffle bytes, no
    window, no sort — the shape that survives a billion prompts."""
    docs = load_table(spark, sf_dir, "documents")
    comparand = F.format_string("%08d-%08d", F.col("n_chars"), F.col("doc_id"))
    return docs.groupBy("source").agg(
        F.expr(
            "max_by(doc_id, format_string('%08d-%08d', n_chars, doc_id))"
        ).alias("chosen_doc_id"),
        F.expr(
            "min_by(doc_id, format_string('%08d-%08d', n_chars, doc_id))"
        ).alias("rejected_doc_id"),
        F.max("n_chars").alias("chosen_score"),
        F.min("n_chars").alias("rejected_score"),
        (F.max("n_chars") - F.min("n_chars")).alias("score_margin"),
    )


@register(
    "text_bigram_kneser_ney",
    oracle="""
    WITH ws AS (
      SELECT str_split(text, ' ') AS w FROM documents
    ), bi AS (
      SELECT unnest([struct_pack(a := w[i], b := w[i+1])
                     FOR i IN range(1, len(w))]) AS p
      FROM ws WHERE len(w) >= 2
    ), cab AS (
      SELECT p.a AS a, p.b AS b, count(*) AS c_ab FROM bi GROUP BY 1, 2
    ), ctx AS (
      SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a, count(*) AS n1p_a
      FROM cab GROUP BY 1
    ), cont AS (
      SELECT b, count(*) AS n1p_b FROM cab GROUP BY 1
    ), tot AS (
      SELECT count(*) AS n_types FROM cab
    )
    SELECT cab.a, cab.b, CAST(cab.c_ab AS BIGINT) AS c_ab,
           round(greatest(cab.c_ab - 0.75, 0) / c.c_a
                 + (0.75 * c.n1p_a / c.c_a)
                   * (CAST(k.n1p_b AS DOUBLE) / t.n_types), 6) AS p_kn
    FROM cab JOIN ctx c USING (a) JOIN cont k USING (b), tot t
    WHERE cab.c_ab >= 8
    """,
)
def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney,
    ICASSP 1995; Chen & Goodman's benchmark smoothing) — the n-gram
    LM estimate classical LM filtering/perplexity scoring is built
    on, and the reason 'San' predicts 'Francisco': the backoff term
    uses CONTINUATION counts (how many contexts a word follows),
    not raw frequency. Every statistic is an integer hash aggregate
    over bigram types (counts c(ab), context totals c(a·), fan-outs
    N1+(a·), continuation counts N1+(·b), the global type count via
    the unfoldable-key broadcast scalar frame); the probability is
    ONE fixed parenthesization of float ops applied identically in
    both engines (SURVEY §5.4) and rounded once. At 100 TB bigram
    types plateau (Heaps' law) while volume grows — the joins run on
    the type table, never the corpus."""
    ws = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w")
    )
    bi = (
        ws.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS a,"
                    "             element_at(w, i + 1) AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    cab = bi.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ctx = cab.groupBy("a").agg(
        F.sum("c_ab").alias("c_a"), F.count("*").alias("n1p_a")
    )
    cont = cab.groupBy("b").agg(F.count("*").alias("n1p_b"))
    tot = cab.agg(F.count("*").alias("n_types"))
    joined = (
        cab.filter(F.col("c_ab") >= 8)
        .join(ctx, "a")
        .join(cont, "b")
    )
    joined = attach_scalar_frame(joined, "a", tot, "n_types")
    p_kn = F.greatest(F.col("c_ab") - 0.75, F.lit(0)) / F.col("c_a") + (
        0.75 * F.col("n1p_a") / F.col("c_a")
    ) * (F.col("n1p_b").cast("double") / F.col("n_types"))
    return joined.select(
        "a", "b", F.col("c_ab").cast("long").alias("c_ab"),
        F.round(p_kn, 6).alias("p_kn"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH d AS (
      SELECT source, lang, n_chars,
             len(str_split(text, ' ')) AS toks,
             md5(text) AS digest
      FROM documents
    ), per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT digest) AS BIGINT) AS n_unique_texts
      FROM d GROUP BY 1
    ), pl AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2
    ), lang_mix AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(c) AS BIGINT) AS n, sum(c * ln(CAST(c AS DOUBLE))) AS sclnc
      FROM pl GROUP BY 1
    )
    SELECT s.source, s.n_docs, s.total_chars, s.total_tokens,
           s.n_docs - s.n_unique_texts AS n_dup_docs,
           round(CAST(s.n_docs - s.n_unique_texts AS DOUBLE) / s.n_docs, 6)
             AS dup_frac,
           round(CAST(s.total_tokens AS DOUBLE) / s.n_docs, 6)
             AS mean_tokens,
           l.n_langs,
           round(ln(CAST(l.n AS DOUBLE)) - l.sclnc / l.n, 6) AS lang_entropy
    FROM per_src s JOIN lang_mix l USING (source)
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics per source (Datasheets for Datasets,
    Gebru '18; the model-card sibling every corpus release ships): doc
    and token volumes, exact-duplicate fraction, language mix with its
    Shannon entropy — the one-page provenance table a data consumer
    reads before training on the mix.

    Scale shape: ONE pass computes per-doc token counts and md5
    digests (the digest, never the text, is what shuffles); volumes
    fold in a source-key hash agg with int64 partials; the exact
    distinct-text count per source shuffles 16-byte digests once; the
    language mix is a second (source,lang)-key agg whose result frame
    (≤ sources·langs rows) broadcast-joins back. Entropy reuses the
    agg_entropy_gini discipline — ln only ever sees integer counts,
    every emitted float is one rounded expression (SURVEY §5.4)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        F.md5("text").alias("digest"),
    )
    per_src = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.countDistinct("digest").cast("long").alias("n_unique_texts"),
    )
    pl = d.groupBy("source", "lang").agg(F.count("*").cast("long").alias("c"))
    lang_mix = pl.groupBy("source").agg(
        F.count("*").cast("long").alias("n_langs"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("sclnc"),
    )
    dup = F.col("n_docs") - F.col("n_unique_texts")
    return per_src.join(F.broadcast(lang_mix), "source").select(
        "source",
        "n_docs",
        "total_chars",
        "total_tokens",
        dup.alias("n_dup_docs"),
        F.round(dup.cast("double") / F.col("n_docs"), 6).alias("dup_frac"),
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), 6
        ).alias("mean_tokens"),
        "n_langs",
        F.round(
            F.log(F.col("n").cast("double")) - F.col("sclnc") / F.col("n"), 6
        ).alias("lang_entropy"),
    )


@register(
    "sample_group_holdout",
    oracle=f"""
    WITH assign AS (
      SELECT source,
             CASE WHEN substr(md5('grp' || source), 1, 8)
                       < '{format(int(0.8 * 16**8), "08x")}' THEN 'train'
                  ELSE 'holdout' END AS split
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT d.source, a.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars
    FROM documents d JOIN assign a USING (source)
    GROUP BY 1, 2
    """,
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level holdout split: every document of a source lands in
    the same split (80/20 by md5 of the GROUP key) — the leakage-safe
    alternative to row-level splitting, which puts near-identical
    same-source docs on both sides of the train/eval fence and
    silently inflates eval scores (the sibling hazard
    dedup_decontaminate removes after the fact; this op prevents it
    at split time). Same deterministic md5-bucket discipline as
    split_train_val_test: restart-safe, partitioning-independent,
    engine-exact, no RNG.

    Scale shape: the assignment frame is |groups| rows (distinct +
    one hash projection) and broadcast-joins back onto the corpus —
    ONE data-sized shuffle for the per-(source,split) audit rollup,
    and in a real pipeline zero (the split column rides the write
    path). Output is the audit summary (doc/char volumes per side)."""
    docs = load_table(spark, sf_dir, "documents")
    assign = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            F.when(
                F.substring(F.md5(F.concat(F.lit("grp"), F.col("source"))), 1, 8)
                < format(int(0.8 * 16**8), "08x"),
                F.lit("train"),
            )
            .otherwise(F.lit("holdout"))
            .alias("split"),
        )
    )
    return (
        docs.join(F.broadcast(assign), "source")
        .groupBy("source", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


_SPAN_CUT = format(int(0.15 * 16**8), "08x")


@register(
    "pipeline_span_corruption",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS w,
             CAST(generate_subscripts(str_split(text, ' '), 1) AS BIGINT) AS i
      FROM documents WHERE doc_id % 6 = 2
    ), m AS (
      SELECT doc_id, w, i,
             substr(md5('span' || CAST(doc_id AS VARCHAR) || ':'
                        || CAST(i AS VARCHAR)), 1, 8) < '{_SPAN_CUT}' AS masked
      FROM tok
    ), flagged AS (
      SELECT *,
             CASE WHEN masked AND NOT coalesce(
                    lag(masked) OVER (PARTITION BY doc_id ORDER BY i), FALSE)
                  THEN 1 ELSE 0 END AS is_start
      FROM m
    ), spans AS (
      SELECT doc_id, w, i,
             CAST(sum(is_start) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
      FROM flagged WHERE masked
    )
    SELECT doc_id, span_id,
           CAST(min(i) AS BIGINT) AS start_pos,
           CAST(count(*) AS BIGINT) AS span_len,
           string_agg(w, ' ' ORDER BY i) AS span_text
    FROM spans GROUP BY doc_id, span_id
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel '20 §3.1.4): ~15 % of token
    positions are masked by a DETERMINISTIC keyed coin and runs of
    adjacent masked tokens merge into numbered spans — the masking
    schedule of every span-denoising pretraining objective, where the
    span table is exactly what becomes the `<extra_id_k>` targets.

    The coin is the repo's restart-safe md5 discipline (hex-prefix
    compare, no RNG — re-running on a different partitioning yields
    the same mask). Span assembly: posexplode → lag per doc marks run
    starts → running count numbers the spans → span text reassembles
    from sort_array(struct(pos, tok)), never raw collect_list order.
    ONE doc-key Exchange; every window walks a single document's
    token list (bounded by doc length at any corpus size)."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 6 == 2)
        .select("doc_id", F.posexplode(F.split("text", " ")))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("i"),
            F.col("col").alias("w"),
        )
    )
    masked = F.substring(
        F.md5(
            F.concat(
                F.lit("span"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("i").cast("string"),
            )
        ),
        1,
        8,
    ) < _SPAN_CUT
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    flagged = tok.withColumn("masked", masked).withColumn(
        "is_start",
        (
            F.col("masked")
            & ~F.coalesce(F.lag("masked").over(w_doc), F.lit(False))
        ).cast("int"),
    )
    spans = (
        flagged.withColumn(
            "span_id",
            F.sum("is_start")
            .over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .filter(F.col("masked"))
    )
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("i").cast("long").alias("start_pos"),
        F.count("*").cast("long").alias("span_len"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "w"))),
                lambda s: s.w,
            ),
        ).alias("span_text"),
    )


_NEYMAN_TOTAL = 100  # total sample budget across strata


@register(
    "sample_stratified_neyman",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sx2
      FROM documents GROUP BY 1
    ), sig AS (
      SELECT source, n_h,
             sqrt(CAST(n_h * sx2 - sx * sx AS DOUBLE) / (n_h * n_h)) AS sigma
      FROM s
    ), tot AS (
      SELECT CAST(sum(n_h * sigma) AS DOUBLE) AS denom FROM sig
    )
    SELECT g.source, g.n_h,
           round(g.sigma, 6) AS sigma,
           CAST(floor({_NEYMAN_TOTAL} * (g.n_h * g.sigma) / t.denom)
                AS BIGINT) AS n_alloc
    FROM sig g, tot t
    """,
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified allocation (Neyman '34): the sample
    budget splits across strata ∝ N_h·σ_h — big AND variable strata
    get more draws, which minimizes the estimator's variance at fixed
    cost. This is the principled upgrade to proportional stratified
    sampling for corpus QC ("audit 100 docs: how many per source?").

    Per-stratum moments (N, Σx, Σx²) are one int64 hash agg (n_chars
    is already integral — no quantization step); σ_h is the exact
    all-integer variance with ONE cast and a correctly-rounded sqrt
    (the feature_standardize discipline; magnitudes stay ≪2⁵³); the
    denominator Σ N_h·σ_h rides the unfoldable-key broadcast scalar
    frame; allocations use floor, not round, so no half-way tie can
    disagree. The draw itself would be the md5-rank idiom
    (sample_stratified) — emitted here is the allocation table, the
    part with statistical content."""
    s = load_table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sx2"),
    )
    sigma = F.sqrt(
        (F.col("n_h") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
        / (F.col("n_h") * F.col("n_h"))
    )
    sig = s.select("source", "n_h", sigma.alias("sigma"))
    tot = sig.agg(F.sum(F.col("n_h") * F.col("sigma")).alias("denom"))
    out = attach_scalar_frame(sig, "source", tot, "denom")
    return out.select(
        "source",
        "n_h",
        F.round("sigma", 6).alias("sigma"),
        F.floor(
            _NEYMAN_TOTAL * (F.col("n_h") * F.col("sigma")) / F.col("denom")
        ).cast("long").alias("n_alloc"),
    )


_HRW_SHARDS = 8


@register(
    "pipeline_rendezvous_sharding",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, shard,
             md5(CAST(doc_id AS VARCHAR) || '#' || CAST(shard AS VARCHAR))
               AS score
      FROM documents, (SELECT unnest(range(0, {_HRW_SHARDS})) AS shard)
    ), assign AS (
      SELECT doc_id, shard FROM (
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, shard) AS rn
        FROM scores) WHERE rn = 1
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM assign GROUP BY shard
    """,
)
def pipeline_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    '98 — the stateless cousin of consistent hashing): each doc joins
    the shard whose md5(doc#shard) scores highest. THE property mod-N
    hashing lacks: when a shard is added or removed, only ~1/N of keys
    move (every survivor keeps its argmax) — which is why incremental
    corpus pipelines shard workers this way instead of `hash % N`.

    Pure expression plan: the per-doc argmax folds over the CONSTANT
    shard list with array+aggregate JVM-side — no explode, no join,
    no window; ONE shuffle for the per-shard audit rollup (zero in a
    write-path deployment where the shard column just rides along).
    Deterministic md5 scoring = the repo's restart-safe discipline;
    the oracle takes the explode+row_number road to the same argmax,
    ties broken by shard id in both."""
    shard_struct = [
        F.struct(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.lit(str(i)),
                )
            ).alias("score"),
            # ties (never for md5, but defined anyway): LOWEST shard
            # wins ⇒ maximize the struct with negated shard id
            F.lit(-i).alias("neg_shard"),
        )
        for i in range(_HRW_SHARDS)
    ]
    winner = F.array_max(F.array(*shard_struct))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (-winner.getField("neg_shard")).cast("long").alias("shard")
    )
    return docs.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


@register(
    "pipeline_point_in_time_features",
    oracle="""
    WITH tl AS (
      SELECT user_id, event_id, event_type, ts, value,
             CAST(count(*) FILTER (event_type = 'click') OVER w AS BIGINT)
               AS clicks_before,
             last_value(CASE WHEN event_type = 'view'
                             THEN CAST(round(value * 100) AS BIGINT) END
                        IGNORE NULLS) OVER w AS last_view_cents,
             CAST(count(*) OVER w AS BIGINT) AS events_before
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           clicks_before, last_view_cents, events_before,
           CAST(round(value * 100) AS BIGINT) AS label_cents
    FROM tl WHERE event_type = 'purchase'
    """,
)
def pipeline_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature assembly — the feature store's
    defining op: every training example (a purchase) carries features
    computed from STRICTLY before its own timestamp (clicks so far,
    last seen view value, activity count), so no future information
    leaks into the label row — the temporal twin of
    sample_group_holdout's split-leakage guard, and the bug class
    (feature computed over the full history) that silently inflates
    every offline metric.

    The naive build is one as-of join PER FEATURE against the feature
    table — k joins, k shuffles. This plan computes ALL features in
    ONE pass over the unified per-user timeline: strictly-preceding
    frames (UNBOUNDED..1 PRECEDING) with conditional count / last
    IGNORE NULLS, sharing a single user Exchange — O(1) window state
    per feature, label rows filtered after. Ties pinned by
    (ts, event_id); money in int cents (SURVEY §5.4)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    tl = ev.select(
        "user_id",
        "event_id",
        "event_type",
        cents.alias("label_cents"),
        F.count_if(F.col("event_type") == "click").over(w).cast("long").alias(
            "clicks_before"
        ),
        F.last(
            F.when(F.col("event_type") == "view", cents), ignorenulls=True
        ).over(w).alias("last_view_cents"),
        F.count("*").over(w).cast("long").alias("events_before"),
    )
    return tl.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "clicks_before",
        "last_view_cents",
        "events_before",
        "label_cents",
    )


@register(
    "text_perplexity_filter",
    oracle="""
    WITH ws AS (
      SELECT doc_id, str_split(text, ' ') AS w FROM documents
    ), bi AS (
      SELECT doc_id,
             unnest([struct_pack(a := w[i], b := w[i+1])
                     FOR i IN range(1, len(w))]) AS p
      FROM ws WHERE len(w) >= 2
    ), dbi AS (
      SELECT doc_id, p.a AS a, p.b AS b FROM bi
    ), cab AS (
      SELECT a, b, count(*) AS c_ab FROM dbi GROUP BY 1, 2
    ), ctx AS (
      SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a, count(*) AS n1p_a
      FROM cab GROUP BY 1
    ), cont AS (
      SELECT b, count(*) AS n1p_b FROM cab GROUP BY 1
    ), tot AS (
      SELECT count(*) AS n_types FROM cab
    ), pr AS (
      SELECT cab.a, cab.b,
             greatest(cab.c_ab - 0.75, 0) / c.c_a
               + (0.75 * c.n1p_a / c.c_a)
                 * (CAST(k.n1p_b AS DOUBLE) / t.n_types) AS p_kn
      FROM cab JOIN ctx c USING (a) JOIN cont k USING (b), tot t
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-sum(ln(p.p_kn)) / count(*), 6) AS avg_nll,
           round(-sum(ln(p.p_kn)) / count(*), 6) <= 6.0 AS keep
    FROM dbi d JOIN pr p USING (a, b)
    GROUP BY 1
    """,
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality gate (Wenzek et al. 2020): score every
    document by its average negative log-probability under the
    corpus's OWN interpolated Kneser-Ney bigram model (the
    text_bigram_kneser_ney estimate, minus the report-table count
    cut), and emit the keep/drop verdict for a fixed perplexity
    budget — the single most load-bearing filter in public
    web-corpus pipelines (CCNet buckets head/middle/tail on exactly
    this number).

    Plan: bigram types + context totals + continuation counts are
    hash aggregates over the TYPE table (Heaps-plateauing, ≪ corpus);
    doc bigrams join the prob table by (a,b) — broadcast when the
    type table is small, shuffle equi-join otherwise, both linear —
    and one doc-keyed aggregate sums the NLL. Determinism: the
    probability is the SAME single parenthesization the KN op proved
    hash-exact, left unrounded; ln() then sum-then-round-once, the
    text_unigram_logprob pattern (strict-gate-proven); the keep flag
    compares the ROUNDED score so the boundary cannot straddle a
    ulp."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split("text", " ").alias("w"))
    dbi = (
        ws.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS a,"
                    "             element_at(w, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.a", "p.b")
    )
    cab = dbi.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ctx = cab.groupBy("a").agg(
        F.sum("c_ab").alias("c_a"), F.count("*").alias("n1p_a")
    )
    cont = cab.groupBy("b").agg(F.count("*").alias("n1p_b"))
    tot = cab.agg(F.count("*").alias("n_types"))
    pr = cab.join(ctx, "a").join(cont, "b")
    pr = attach_scalar_frame(pr, "a", tot, "n_types")
    p_kn = F.greatest(F.col("c_ab") - 0.75, F.lit(0)) / F.col("c_a") + (
        0.75 * F.col("n1p_a") / F.col("c_a")
    ) * (F.col("n1p_b").cast("double") / F.col("n_types"))
    pr = pr.select("a", "b", p_kn.alias("p_kn"))
    avg_nll = F.round(-F.sum(F.log(F.col("p_kn"))) / F.count("*"), 6)
    return (
        dbi.join(pr, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            avg_nll.alias("avg_nll"),
            (avg_nll <= 6.0).alias("keep"),
        )
    )


@register(
    "split_temporal_embargo",
    oracle="""
    WITH b AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS mn,
             CAST(max(epoch_us(ts)) AS BIGINT) AS mx
      FROM events
    ), c AS (
      SELECT mn + (mx - mn) * 75 // 100 AS cut_train,
             mn + (mx - mn) * 80 // 100 AS cut_eval
      FROM b
    )
    SELECT event_id,
           CASE WHEN epoch_us(ts) < c.cut_train THEN 'train'
                WHEN epoch_us(ts) < c.cut_eval THEN 'embargo'
                ELSE 'eval' END AS split
    FROM events, c
    """,
)
def split_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split WITH AN EMBARGO GAP — the
    leakage-safe split for anything autocorrelated in time (the
    purged/embargoed split of financial ML, equally load-bearing for
    user-event models): train is the first 75 % of the time range,
    eval the last 20 %, and the 5 % between is DISCARDED so that
    features computed with lookback windows at the train boundary
    cannot touch eval-period rows (a plain temporal cut leaks through
    every trailing window shorter than the gap). A hash split —
    split_train_val_test — would be strictly wrong here: it puts
    tomorrow in train and today in eval.

    Cuts are integer epoch-µs arithmetic ((mx−mn)·p DIV 100 — DuckDB
    // and Spark DIV agree on the non-negative operands, SURVEY
    §5.4); the 1-row min/max bound frame attaches via the
    unfoldable-key broadcast scalar frame (BroadcastHashJoin, never
    BNLJ). ONE scan + one O(1) stats pass; the assignment itself is
    a stateless map — at 100 TB this is the cheapest split there is,
    and fully restart-safe (no RNG anywhere)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    b = ev.agg(
        F.min("us").cast("long").alias("mn"),
        F.max("us").cast("long").alias("mx"),
    )
    out = attach_scalar_frame(ev, "event_id", b, "mn").select(
        "event_id",
        F.expr("mn + (mx - mn) * 75 DIV 100").alias("cut_train"),
        F.expr("mn + (mx - mn) * 80 DIV 100").alias("cut_eval"),
        "us",
    )
    return out.select(
        "event_id",
        F.when(F.col("us") < F.col("cut_train"), "train")
        .when(F.col("us") < F.col("cut_eval"), "embargo")
        .otherwise("eval")
        .alias("split"),
    )


# --- BPE merge learning ------------------------------------------------------

_BPE_STEPS = 4


def _bpe_oracle() -> str:
    """Generate the unrolled DuckDB CTE chain for _BPE_STEPS merges —
    the same left-to-right non-overlapping regex merge the Spark plan
    applies (two replacement passes reach the pass-fixpoint)."""
    ctes = ["""
    wf0 AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
             ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sym
      FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
      WHERE regexp_matches(w, '^[a-z]+$')
      GROUP BY 1
    )"""]
    for s in range(1, _BPE_STEPS + 1):
        p, m, b, w0, w1 = f"p{s}", f"m{s}", f"b{s}", f"wf{s-1}", f"wf{s}"
        ctes.append(f"""
    {p} AS (
      SELECT arr[i] AS x, arr[i+1] AS y, CAST(sum(freq) AS BIGINT) AS c
      FROM (SELECT freq, str_split(trim(sym), ' ') AS arr FROM {w0})
           , LATERAL (SELECT unnest(range(1, len(arr))) AS i)
      WHERE len(arr) >= 2
      GROUP BY 1, 2
    ), {m} AS (SELECT max(c) AS mc FROM {p}),
    {b} AS (
      SELECT min(x || ' ' || y) AS pk, min(m.mc) AS mc
      FROM {p}, {m} m WHERE c = m.mc
    ), {w1} AS (
      SELECT word, freq,
             regexp_replace(
               regexp_replace(sym, ' ' || b.pk || ' ',
                              ' ' || replace(b.pk, ' ', '') || ' ', 'g'),
               ' ' || b.pk || ' ',
               ' ' || replace(b.pk, ' ', '') || ' ', 'g') AS sym
      FROM {w0}, {b} b
    )""")
        if s == _BPE_STEPS:
            sel = "\n    UNION ALL ".join(
                f"""SELECT CAST({i} AS BIGINT) AS step,
           split_part(pk, ' ', 1) AS left_sym,
           split_part(pk, ' ', 2) AS right_sym,
           replace(pk, ' ', '') AS merged_sym,
           mc AS pair_count FROM b{i}"""
                for i in range(1, _BPE_STEPS + 1)
            )
    return "WITH " + ",".join(ctes) + "\n    " + sel


@register("tokenizer_bpe_merges", oracle=_bpe_oracle())
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first _BPE_STEPS byte-pair-encoding merges learned from the
    corpus (Sennrich et al. 2016 — the tokenizer-training primitive):
    repeatedly take the highest-frequency adjacent symbol pair over
    the word-frequency table (ties to the lexicographically smallest
    pair — deterministic) and fuse it everywhere. Merge application
    is the left-to-right non-overlapping regex pass, applied twice
    per step (the second pass reaches the pass-fixpoint for runs the
    first one's consumed boundary space hides) — a documented,
    engine-identical variant of the greedy pairing: ASCII-literal
    patterns behave the same under Java regex and RE2, and space
    sorts below [a-z] so the 'x y' string tiebreak equals the
    (x, y) tuple order.

    Scale story — the reason BPE training is feasible at 100 TB: all
    four stages run over the DISTINCT-WORD table (Heaps-plateauing,
    ≪ corpus) with corpus frequencies as weights; the corpus itself
    is touched exactly once (the word count). Each step is one pair
    aggregate over the vocab + two 1-row argmax frames attached via
    the unfoldable-key broadcast (never BNLJ); four steps unroll into
    ONE lazy plan. pair_count is an exact int64 corpus frequency —
    zero floats in the whole query."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy(F.col("w").alias("word"))
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn(
            "sym",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")),
        )
    )
    # A fully lazy unroll re-embeds the wf subtree ~2^steps times in
    # the final plan (measured 5.5 s at sf0.1; cache() made it WORSE —
    # 10.9 s — because InMemoryRelation breaks codegen pipelining).
    # Eager localCheckpoints materialize the vocab-sized frame once
    # per step instead: 2.4 s warm, and the corpus is still scanned
    # exactly once (the initial word count).
    wf = wf.localCheckpoint(eager=True)
    merge_rows = []
    for s in range(1, _BPE_STEPS + 1):
        arr = "split(trim(sym), ' ')"
        pairs = (
            wf.filter(F.expr(f"size({arr}) >= 2"))
            .select(
                "freq",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size({arr}) - 1),"
                        f" i -> struct(element_at({arr}, i) AS x,"
                        f"             element_at({arr}, i + 1) AS y))"
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("freq").cast("long").alias("c"))
        )
        mc = pairs.agg(F.max("c").cast("long").alias("mc"))
        best = (
            attach_scalar_frame(pairs, "x", mc, "mc")
            .filter(F.col("c") == F.col("mc"))
            .agg(
                F.min(F.concat_ws(" ", "x", "y")).alias("pk"),
                F.min("mc").cast("long").alias("mc"),
            )
        )
        merge_rows.append(
            best.select(
                F.lit(s).cast("long").alias("step"),
                F.element_at(F.split("pk", " "), 1).alias("left_sym"),
                F.element_at(F.split("pk", " "), 2).alias("right_sym"),
                F.regexp_replace("pk", " ", "").alias("merged_sym"),
                F.col("mc").alias("pair_count"),
            )
        )
        pat = F.concat(F.lit(" "), F.col("pk"), F.lit(" "))
        rep = F.concat(
            F.lit(" "), F.regexp_replace("pk", " ", ""), F.lit(" ")
        )
        wf = (
            attach_scalar_frame(wf, "word", best, "pk")
            .withColumn(
                "sym",
                F.regexp_replace(F.regexp_replace("sym", pat, rep), pat, rep),
            )
            .select("word", "freq", "sym")
        )
        if s < _BPE_STEPS:
            # each checkpoint is a ~|vocab|-row materialization that
            # stops the next step's pair aggregate from re-deriving
            # the whole re-segmentation chain (2^k plan copies)
            wf = wf.localCheckpoint(eager=True)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


@register(
    "text_ngram_novelty",
    oracle="""
    WITH tri AS (
      SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS g
      FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
           LATERAL (SELECT unnest(generate_series(
                      1, greatest(len(words) - 2, 0))) AS i)
    ), train AS (
      SELECT DISTINCT g FROM tri WHERE doc_id % 10 <> 0
    ), test AS (
      SELECT doc_id, g FROM tri WHERE doc_id % 10 = 0
    ), novel AS (
      SELECT t.doc_id,
             count(*) AS n_trigrams,
             CAST(count(*) FILTER (WHERE tr.g IS NULL) AS BIGINT) AS n_novel
      FROM test t LEFT JOIN train tr ON t.g = tr.g
      GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(n_trigrams AS BIGINT) AS n_trigrams, n_novel,
           round(CAST(n_novel AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6)
             AS novelty
    FROM novel WHERE n_trigrams > 0
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set n-gram novelty of held-out documents — the
    memorization / contamination diagnostic of LM data work (the
    complement of the n-gram-overlap contamination checks in GPT-3's
    appendix): per test doc (doc_id % 10 == 0), the fraction of its
    word trigrams that appear NOWHERE in the train split. Low novelty
    = the doc is stitched from training text (leakage / memorization
    risk); high novelty = genuinely unseen content.

    Scale: the train side collapses to the DISTINCT trigram TYPE
    table (Heaps-bounded, sub-linear in corpus size — the same
    plateau tokenizer_bpe_merges and the KN models ride); the test
    side left-joins it on the gram key, O(test tokens) shuffle. No
    pair joins, no driver state. The CASE guard matters: Spark's
    sequence(0, -1) DESCENDS, so short docs must produce an empty
    array, not phantom grams.

    explode_outer + isNotNull instead of plain explode is a MEASURED
    10× (7.0 → 0.7 s at sf0.1): explode makes Catalyst infer a
    size(g) > 0 pruning predicate and push it into the parquet scan
    filter with the ENTIRE trigram transform(...) inlined — the whole
    gram array built 2-3× per row before the Project builds it again.
    explode_outer infers nothing; the null filter above the Generate
    is one comparison per gram row."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tri = (
        docs.withColumn("w", F.split("text", " "))
        .withColumn(
            "g",
            F.expr(
                "CASE WHEN size(w) >= 3 THEN transform("
                "sequence(0, size(w) - 3),"
                " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                " ELSE array() END"
            ),
        )
        .select("doc_id", F.explode_outer("g").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    train = tri.filter(F.col("doc_id") % 10 != 0).select("g").distinct()
    test = tri.filter(F.col("doc_id") % 10 == 0)
    marked = test.join(
        train.withColumn("seen", F.lit(1)), "g", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.count_if(F.col("seen").isNull()).cast("long").alias("n_novel"),
        )
        .filter(F.col("n_trigrams") > 0)
        .select(
            "doc_id",
            "n_trigrams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_trigrams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@register(
    "sample_ess_importance",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice) AS BIGINT) // 10 AS wt
      FROM lineitem
    ), agg AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wt) AS BIGINT) AS sum_w,
             CAST(sum(wt * wt) AS BIGINT) AS sum_w2
      FROM w GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sum_w,
           round(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                 / CAST(sum_w2 AS DOUBLE), 6) AS ess,
           round(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                 / CAST(sum_w2 AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS ess_ratio
    FROM agg
    """,
)
def sample_ess_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of importance weights per stratum
    (Kish '65; the n_eff = (Σw)²/Σw² every importance-sampled /
    reweighted training mix is judged by): ESS near n means the
    weights are benign; ESS ≪ n means a few heavy rows dominate and
    the reweighted estimator's variance explodes — the go/no-go
    readout before shipping a temperature- or quality-reweighted
    corpus.

    Determinism: weights quantized to int64 deka-dollar units
    (round(price) DIV 10 — `//` and DIV agree on non-negatives), so
    Σw and Σw² are EXACT integer aggregates that stay below 2⁵³ even
    at sf1.0 (w ≤ ~1.1e4 ⇒ Σw² ≤ ~7e14) — both engines cast the same
    exact integers and the two IEEE double ops (multiply, divide)
    round identically; each output is ONE fixed parenthesization
    rounded once. ONE map-side-combined agg over one scan; O(strata)
    rows out."""
    w = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice) AS BIGINT) DIV 10").alias("wt"),
    )
    agg = w.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("wt").cast("long").alias("sum_w"),
        F.sum(F.col("wt") * F.col("wt")).cast("long").alias("sum_w2"),
    )
    ess = (
        F.col("sum_w").cast("double")
        * F.col("sum_w").cast("double")
        / F.col("sum_w2").cast("double")
    )
    return agg.select(
        "l_returnflag",
        "n",
        "sum_w",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n").cast("double"), 6).alias("ess_ratio"),
    )


@register(
    "pipeline_mix_kl",
    oracle="""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM per
    )
    SELECT source, n_docs,
           round(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE), 6) AS p,
           round(CAST(1 AS DOUBLE) / CAST(n_sources AS DOUBLE), 6) AS q,
           round((CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))
                 * ln((CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))
                      / (CAST(1 AS DOUBLE) / CAST(n_sources AS DOUBLE))),
                 6) AS kl_term
    FROM per, tot
    """,
)
def pipeline_mix_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL(actual ‖ uniform-target) terms of the training
    mixture — the drift monitor every curated data mix runs after
    each ingest (cf. the domain-mixing weights of The Pile /
    DoReMi-style re-balancing): p·ln(p/q) per source against the
    uniform target q = 1/|sources|. Positive terms = over-represented
    sources, negative = starved ones; the emitted rows sum to the
    full KL divergence.

    Determinism: per-term output (no cross-term float summation to
    re-associate); each term is ONE fixed parenthesization — the
    p and q doubles are ratios of exact int64 counts, ln() is the
    engines' 1-ulp-identical libm call absorbed by the single 6dp
    round (the text_unigram_logprob strict-proven pattern). The
    1-row (total, n_sources) frame attaches via the unfoldable-key
    broadcast (no BNLJ). ONE source-keyed map-side-combined agg;
    O(sources) rows ever leave it."""
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_sources"),
    )
    j = attach_scalar_frame(per, "source", tot, "total")
    p = F.col("n_docs").cast("double") / F.col("total").cast("double")
    q = F.lit(1).cast("double") / F.col("n_sources").cast("double")
    return j.select(
        "source",
        "n_docs",
        F.round(p, 6).alias("p"),
        F.round(q, 6).alias("q"),
        F.round(p * F.log(p / q), 6).alias("kl_term"),
    )


@register(
    "eval_distinct_ngrams",
    oracle="""
    WITH uni AS (
      SELECT source, unnest(str_split(text, ' ')) AS g FROM documents
    ), bi AS (
      SELECT source, words[i] || ' ' || words[i+1] AS g
      FROM (SELECT source, str_split(text, ' ') AS words FROM documents),
           LATERAL (SELECT unnest(generate_series(
                      1, greatest(len(words) - 1, 0))) AS i)
    ), u AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n1,
             CAST(count(DISTINCT g) AS BIGINT) AS d1
      FROM uni GROUP BY source
    ), b AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n2,
             CAST(count(DISTINCT g) AS BIGINT) AS d2
      FROM bi GROUP BY source
    )
    SELECT u.source, n1, d1, n2, d2,
           round(CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS distinct1,
           round(CAST(d2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS distinct2
    FROM u JOIN b ON u.source = b.source
    """,
)
def eval_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / Distinct-2 diversity (Li et al. NAACL'16) per
    corpus source — the generation-diversity readout that catches
    mode collapse and template spam (a synthetic-data source whose
    distinct-2 craters is emitting the same completions over and
    over). Ratio of unique to total uni/bigrams, all INTEGER counts
    feeding one rounded division each.

    Scale: two source-keyed count-distinct aggs (Spark plans
    count_distinct as a two-stage partial/Expand agg — map-side
    combined, no row wider than a gram); the bigram side reuses the
    guarded transform(sequence(...)) pattern (Spark's sequence(0,-1)
    DESCENDS on short docs). O(tokens) in, O(sources) out."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    uni = docs.select(
        "source", F.explode(F.split("text", " ")).alias("g")
    )
    # explode_outer + null filter: plain explode's inferred non-empty
    # predicate pushes the whole bigram transform into the scan filter
    # (built 2-3x per row — the measured 10x novelty regression class)
    bi = (
        docs.withColumn("w", F.split("text", " "))
        .select(
            "source",
            F.explode_outer(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN transform("
                    "sequence(0, size(w) - 2),"
                    " i -> concat_ws(' ', w[i], w[i+1]))"
                    " ELSE array() END"
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    u = uni.groupBy("source").agg(
        F.count("*").cast("long").alias("n1"),
        F.count_distinct("g").cast("long").alias("d1"),
    )
    b = bi.groupBy("source").agg(
        F.count("*").cast("long").alias("n2"),
        F.count_distinct("g").cast("long").alias("d2"),
    )
    return u.join(b, "source").select(
        "source",
        "n1",
        "d1",
        "n2",
        "d2",
        F.round(F.col("d1").cast("double") / F.col("n1").cast("double"), 6)
        .alias("distinct1"),
        F.round(F.col("d2").cast("double") / F.col("n2").cast("double"), 6)
        .alias("distinct2"),
    )


# --- tokenizer coverage / OOV rate -------------------------------------------


@register(
    "tokenizer_coverage_oov",
    oracle=f"""
    WITH wc AS (
      SELECT word, count(*) AS n
      FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ), vocab AS (
      SELECT word FROM wc ORDER BY n DESC, word LIMIT {_VOCAB_K}
    ), sw AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(str_split(text, ' ')) AS word
            FROM documents)
      GROUP BY source, word
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.word IS NULL THEN c ELSE 0 END)
                AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN v.word IS NULL THEN c ELSE 0 END)
                      AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS oov_rate
    FROM sw LEFT JOIN vocab v USING (word)
    GROUP BY source
    """,
)
def tokenizer_coverage_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer coverage audit: per-source out-of-vocabulary token
    rate against the tokenizer_vocab_build top-K vocabulary — the
    go/no-go a tokenizer rollout reads before training (a source whose
    OOV rate spikes is about to become <unk> soup, and per-SOURCE
    resolution is what localizes the offender).

    The vocab is the same deterministic TakeOrdered top-K cut
    (freq DESC, word — ties bit-stable); membership is a LEFT join of
    the (source, word, count) table against the K-row vocab —
    broadcast-sized by construction at any corpus scale since K is
    fixed. Counts are exact int64; one rounded division per source.

    Scale: wordcount-shaped explode+agg (map-side combined), one
    broadcast join, O(sources) output."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    vocab = (
        wc.orderBy(F.desc("n"), F.asc("word"))
        .limit(_VOCAB_K)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    sw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    j = sw.join(F.broadcast(vocab), "word", "left")
    oov_c = F.when(F.col("in_vocab").isNull(), F.col("c")).otherwise(F.lit(0))
    per = j.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(oov_c).cast("long").alias("n_oov"),
    )
    return per.select(
        "source",
        "n_tokens",
        "n_oov",
        F.round(
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("oov_rate"),
    )


# --- deterministic k-fold cross-validation assignment ------------------------

_KFOLD_K = 5
_KFOLD_BOUNDS = [format(int((i + 1) / _KFOLD_K * 16**8), "08x") for i in range(_KFOLD_K)]


@register(
    "sample_kfold_assign",
    oracle=f"""
    SELECT doc_id,
           CASE
             WHEN substr(md5('kf' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{_KFOLD_BOUNDS[0]}' THEN 0
             WHEN substr(md5('kf' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{_KFOLD_BOUNDS[1]}' THEN 1
             WHEN substr(md5('kf' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{_KFOLD_BOUNDS[2]}' THEN 2
             WHEN substr(md5('kf' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{_KFOLD_BOUNDS[3]}' THEN 3
             ELSE 4 END AS fold
    FROM documents
    """,
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-fold cross-validation assignment (K = 5): every
    document lands in exactly one fold as a pure function of doc_id —
    the property CV requires absolutely (a doc that changes folds
    between the fold-0 and fold-3 training runs leaks itself into its
    own eval). Same keyed-md5 equal-range trick as
    split_train_val_test, with K range boundaries instead of three:
    restart-safe, partitioning-independent, incremental-ingest-stable
    (new docs spread ~uniformly), zero shuffles at any scale — the
    assignment is a narrow projection the scan absorbs."""
    docs = load_table(spark, sf_dir, "documents")
    key8 = F.substring(
        F.md5(F.concat(F.lit("kf"), F.col("doc_id").cast("string"))), 1, 8
    )
    fold = F.when(key8 < F.lit(_KFOLD_BOUNDS[0]), F.lit(0))
    for i in range(1, _KFOLD_K - 1):
        fold = fold.when(key8 < F.lit(_KFOLD_BOUNDS[i]), F.lit(i))
    return docs.select("doc_id", fold.otherwise(F.lit(_KFOLD_K - 1)).alias("fold"))


# --- hashing-trick token vectorization -----------------------------------------


@register(
    "text_feature_hashing",
    oracle="""
    SELECT source, substr(md5(word), 1, 2) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT source, unnest(str_split(text, ' ')) AS word
          FROM documents)
    GROUP BY 1, 2
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick token vectorization (Weinberger et al., ICML'09
    — HashingVectorizer): tokens map to a FIXED 256-bucket space by
    hash, so the feature matrix needs no vocabulary pass, no
    vocabulary state, and no re-fit when new tokens appear — the
    property that makes it the streaming/incremental counterpart of
    tokenizer_vocab_build. Bucket = first two hex chars of md5(word):
    both engines compute the identical standard digest, and the
    bucket LABEL is a substring — no hex-int parsing to disagree on.

    Scale: one scan → explode → ONE map-side-combined agg keyed
    (source, bucket); output is O(sources × 256) regardless of corpus
    size — the whole point of the trick. Collisions are the accepted
    trade (documented since the paper); sign-hashing to cancel them
    needs a second independent hash bit, same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("word")
        )
        .select("source", F.substring(F.md5("word"), 1, 2).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


# --- corpus-inequality (Gini coefficient) ---------------------------------------


@register(
    "agg_gini_inequality",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS i
      FROM documents
    ), s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             CAST(sum(i * n_chars) AS BIGINT) AS six
      FROM ranked GROUP BY source
    )
    SELECT source, n,
           CAST((2 * six - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT)
             AS gini_micro
    FROM s
    """,
)
def agg_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the corpus-
    BALANCE diagnostic for a training mix (G→0: uniform doc sizes;
    G→1: a few mega-docs hold all the tokens, so token-budget and
    packing decisions are driven by a tail the source-level stats
    hide). Distinct from agg_entropy_gini's Gini IMPURITY (categorical
    split quality) — this is the Lorenz-curve inequality measure.

    The sorted-rank identity G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) over
    ranks i ∈ 1..n ordered by (x, doc_id) — a TOTAL order, so tied
    lengths rank identically in both engines; the numerator is ≥ 0 by
    the Chebyshev sum inequality (ascending order ⟹ 2Σi·x ≥ (n+1)Σx),
    so the single integer DIV is floor==trunc safe. Exact-int64
    bound: Σi·x < 2⁶³ needs n²·x̄ < 9·10¹⁸ (~3·10⁷ docs/source at
    10 kB docs) — past that run the identical identity on the
    value-domain CDF (length histogram) instead of per-doc ranks.

    Scale: one partitioned rank window (bounded per source) + one
    map-side-combined agg; O(sources) output."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).cast("long").alias("i")
    )
    s = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("n_chars")).cast("long").alias("six"),
    )
    return s.select(
        "source",
        "n",
        F.expr(
            "CAST((2 * six - (n + 1) * sx) * 1000000 DIV (n * sx) AS BIGINT)"
        ).alias("gini_micro"),
    )


# --- windowed lexical diversity (MATTR) -----------------------------------------

_MATTR_W = 50  # tokens per moving window


@register(
    "text_lexical_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, str_split(text, ' ') AS tk
      FROM documents
    ), wins AS (
      SELECT doc_id, source, len(tk) AS n_tokens,
             CASE WHEN len(tk) >= {_MATTR_W} THEN
               list_transform(
                 range(0, len(tk) - {_MATTR_W} + 1),
                 i -> len(list_distinct(tk[i + 1 : i + {_MATTR_W}])))
             ELSE [len(list_distinct(tk))] END AS types_per_win
      FROM toks
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(list_sum(types_per_win) AS BIGINT) * 1000000
                    // (len(types_per_win) * least(n_tokens, {_MATTR_W})))
                // count(*) AS BIGINT) AS mattr_micro
    FROM wins GROUP BY source
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-Average Type-Token Ratio (MATTR, Covington & McFall
    2010) per source — the length-independent lexical-diversity
    metric (plain TTR collapses as docs grow; MATTR's fixed W-token
    window removes the length confound), the repetitive-spam signal
    that survives document-length mixing.

    Per doc: mean over all W-token windows of |distinct|/W (short
    docs: one whole-doc window over its own length) — computed
    entirely with HIGHER-ORDER ARRAY FUNCTIONS (transform over a
    window-start sequence + array_distinct + slice), no explode and
    ZERO shuffle until the final per-source agg. All integer: the
    per-doc mean is (Σtypes·10⁶) DIV (wins·W), the source mean one
    more DIV (all non-negative ⇒ floor == trunc; the quantization is
    the metric definition).

    Scale: O(tokens·W) compute per doc inside the scan projection —
    CPU-bound and embarrassingly parallel, one skinny (source) agg;
    documented swap past ~10⁵-token docs: per-partition rolling
    hash-set via mapInPandas, same output contract."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    n_tok = F.size(tk)
    whole = F.array(F.size(F.array_distinct(tk)))
    windows = F.transform(
        F.sequence(F.lit(0), n_tok - _MATTR_W),
        lambda i: F.size(F.array_distinct(F.slice(tk, i + 1, _MATTR_W))),
    )
    per_doc = docs.select(
        "source",
        F.when(n_tok >= _MATTR_W, windows).otherwise(whole).alias("tpw"),
        F.least(n_tok, F.lit(_MATTR_W)).cast("long").alias("w_eff"),
    ).select(
        "source",
        F.expr(
            "CAST(aggregate(tpw, 0L, (a, x) -> a + x) * 1000000"
            " DIV (size(tpw) * w_eff) AS BIGINT)"
        ).alias("doc_mattr"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("CAST(sum(doc_mattr) DIV count(*) AS BIGINT)").alias(
            "mattr_micro"
        ),
    )


# --- consistent universe sampling ------------------------------------------------


@register(
    "sample_universe_consistent",
    oracle="""
    WITH su AS (
      SELECT DISTINCT user_id FROM events
      WHERE substr(md5('uv' || CAST(user_id AS VARCHAR)), 1, 8)
            < '1999999a'
    ), se AS (
      SELECT e.user_id, CAST(count(*) AS BIGINT) AS c
      FROM events e JOIN su USING (user_id) GROUP BY e.user_id
    ), fu AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(se.c) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN se.c <> fu.c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_partial_users,
           CAST(sum(se.c) AS BIGINT) * 1000 // (SELECT n FROM tot)
             AS share_milli
    FROM se JOIN fu USING (user_id)
    """,
)
def sample_universe_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-UNIVERSE sampling (a.k.a. consistent / coordinated
    sampling — Broder 1997's min-hash coordination applied to entity
    sampling): pick 10% of USERS by a salted hash of the user id, then
    keep EVERY event of a picked user. Unlike row-Bernoulli sampling,
    every derived per-user statistic (funnels, sessions, LTV) stays
    exactly computable on the sample, and ANY table keyed by the same
    id — today's events, tomorrow's events, another fact table —
    selects the SAME universe with no coordination state. The salted
    md5-prefix predicate is the repo's standard deterministic draw
    (substr(md5('uv'||id),1,8) < 0.1·16⁸).

    The output row IS the consistency gate: n_partial_users counts
    sampled users whose in-sample event count differs from their
    full-table count — structurally ZERO for universe sampling (a
    row-Bernoulli sampler at the same rate would red this column
    immediately), so a driver hash-check pins the completeness
    property, not just the sample size. share_milli (integer DIV,
    non-negative) shows the realized event-mass share ≈ 100‰ only if
    per-user event mass is independent of the hash — the skew
    diagnostic. All counts exact int64.

    Scale: the universe predicate is a map-side filter (no sampled-id
    table to join — the hash IS the membership test at any number of
    tables); two user-keyed aggs + one 1-row rollup; 1-row output."""
    ev = load_table(spark, sf_dir, "events")
    picked = F.substring(
        F.md5(F.concat(F.lit("uv"), F.col("user_id").cast("string"))), 1, 8
    ) < "1999999a"
    fu = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("fc"))
    se = (
        ev.filter(picked)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("sc"))
    )
    tot = ev.agg(F.count("*").cast("long").alias("n"))
    j = se.join(fu, "user_id")
    agg = j.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("sc").cast("long").alias("n_events"),
        F.sum((F.col("sc") != F.col("fc")).cast("long"))
        .cast("long")
        .alias("n_partial_users"),
    )
    return attach_scalar_frame(agg, "n_users", tot, "n").select(
        "n_users",
        "n_events",
        "n_partial_users",
        F.expr("n_events * 1000 div n").alias("share_milli"),
    )


# --- Zipf law fit over the token frequency spectrum -------------------------------

# ln(rank) for ranks 1..256 in TRUNCATED milli-nats, precomputed in
# Python and embedded as literals in BOTH engines (the NDCG
# log2-table trick from cross-engine rule #8): neither engine ever
# evaluates ln(rank), so the regressor column is exact int64 by
# construction.
_ZIPF_K = 256
_LN_RANK_MILLI = [int(math.log(i) * 1000) for i in range(1, _ZIPF_K + 1)]


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH f AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
      GROUP BY w ORDER BY c DESC, w LIMIT {_ZIPF_K}
    ), r AS (
      SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rnk,
             c
      FROM f
    ), pts AS (
      SELECT ([{", ".join(str(v) for v in _LN_RANK_MILLI)}])[rnk] AS x,
             CAST(trunc(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM r
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_ranks,
           CAST(trunc(CAST(n * sxy - sx * sy AS DOUBLE)
                      * CAST(1000 AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
             AS slope_micro
    FROM s WHERE n * sxx - sx * sx > 0
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent fit over the corpus token-frequency spectrum
    (Zipf 1949): OLS slope of ln(freq) on ln(rank) across the top-256
    ranks — the one-number naturalness diagnostic of a text corpus
    (natural language sits near −1; templated/synthetic corpora
    flatten, boilerplate floods steepen) that corpus-QA dashboards
    track release-over-release next to Heaps-law type counts.

    Determinism: ln(rank) never evaluates — ranks 1..256 map through
    a PYTHON-precomputed trunc-milli literal table embedded in both
    engines (the NDCG log2-table rule), so the regressor is exact
    int64. ln(freq) is per-row trunc-micro-quantized BEFORE any
    aggregation — the four OLS sums (Σx, Σy, Σxy, Σx²) are then EXACT
    int64 (no double summation order to diverge). The slope is the
    ONE float step: trunc((n·Σxy − Σx·Σy)·10³ / (n·Σxx − Σx²)) via
    the double-trunc idiom (numerator can be NEGATIVE — slope ≈ −1 —
    so integer DIV is forbidden; int64→double is a single exact
    conversion while |num| < 2⁵³, which the milli×micro split
    guarantees through ~10⁸-token vocab mass). ×10³ converts
    micro/milli to micro-slope. Tie-broken total order (c DESC, w)
    everywhere a rank is assigned.

    Scale: one wordcount-shape hash agg (map-side combined), ONE
    TakeOrdered(256) — the rank window runs over the top-K frame only
    (top-k-limit whitelist class, same as tokenizer_vocab_build);
    1-row output."""
    docs = load_table(spark, sf_dir, "documents")
    f = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(_ZIPF_K)
    )
    rnk = F.row_number().over(
        Window.orderBy(F.col("c").desc(), F.col("w").asc())
    )
    pts = f.select(
        F.element_at(
            F.array(*[F.lit(v).cast("long") for v in _LN_RANK_MILLI]),
            rnk,
        ).alias("x"),
        (F.log(F.col("c").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.filter(den > 0)
        .select(
            F.col("n").alias("n_ranks"),
            (
                num.cast("double")
                * F.lit(1000).cast("double")
                / den.cast("double")
            )
            .cast("long")
            .alias("slope_micro"),
        )
    )


# --- Jensen–Shannon divergence between source vocabularies -------------------------


@register(
    "eval_jensen_shannon",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(str_split(text, ' ')) AS w
      FROM documents WHERE source IN ('src0', 'src1')
    ), g AS (
      SELECT w,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM tok GROUP BY w
    ), tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM g
    )
    SELECT w, c1, c2,
           CAST(trunc((CASE WHEN c1 > 0 THEN
                   (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                   * ln(CAST(2 AS DOUBLE) * (CAST(c1 AS DOUBLE)
                       / CAST(n1 AS DOUBLE))
                     / (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                 ELSE CAST(0 AS DOUBLE) END
                 + CASE WHEN c2 > 0 THEN
                   (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   * ln(CAST(2 AS DOUBLE) * (CAST(c2 AS DOUBLE)
                       / CAST(n2 AS DOUBLE))
                     / (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                 ELSE CAST(0 AS DOUBLE) END)
               * CAST(500000 AS DOUBLE)) AS BIGINT) AS js_term_micro
    FROM g, tot
    """,
)
def eval_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token Jensen–Shannon divergence terms between two source
    vocabularies (src0 vs src1) — the SYMMETRIC, always-finite
    distribution-shift measure (Lin 1991) used to compare corpus
    slices where KL explodes on unshared tokens (q=0 is finite under
    JS: the term degrades to p·ln2). Rows sum to JSD(P‖Q) ∈ [0, ln2];
    the companion to pipeline_mix_kl (KL vs a uniform target) and
    eval_psi (binned, pre-chosen cut points) for the vocabulary-level
    question.

    Determinism (the pipeline_mix_kl pattern, hardened): PER-TERM
    output — no cross-term float summation to re-associate; each term
    is ½·[p·ln(2p/(p+q)) + q·ln(2q/(p+q))] in ONE fixed
    parenthesization over ratios of exact int64 counts, and by the
    log-sum inequality every per-token term is ≥ 0, emitted as
    TRUNC-micro int64 (double-trunc idiom — trunc of identical
    doubles can never disagree; round can, measured live at 33k rows
    on win_rolling_corr). The ×500000 folds the ½ into the scale so
    the float path stays one multiply shorter.

    Scale: one (token) hash agg with map-side combine over the two
    slices; the 1-row totals attach via the unfoldable-key broadcast;
    output is vocabulary-sized (Heaps-bounded), never corpus-sized."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", F.explode(F.split("text", " ")).alias("w"))
    )
    g = tok.groupBy("w").agg(
        F.sum((F.col("source") == "src0").cast("long"))
        .cast("long")
        .alias("c1"),
        F.sum((F.col("source") == "src1").cast("long"))
        .cast("long")
        .alias("c2"),
    )
    tot = g.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    j = attach_scalar_frame(g, "w", tot, "n1")
    p = F.col("c1").cast("double") / F.col("n1").cast("double")
    q = F.col("c2").cast("double") / F.col("n2").cast("double")
    two = F.lit(2).cast("double")
    term = F.when(F.col("c1") > 0, p * F.log(two * p / (p + q))).otherwise(
        F.lit(0).cast("double")
    ) + F.when(F.col("c2") > 0, q * F.log(two * q / (p + q))).otherwise(
        F.lit(0).cast("double")
    )
    return j.select(
        "w",
        "c1",
        "c2",
        (term * F.lit(500_000).cast("double"))
        .cast("long")
        .alias("js_term_micro"),
    )


# --- recency-decay sampling ---------------------------------------------------------

# exp(-ln2/7 · d) for ages d = 0..63 days in TRUNCATED milli, Python-
# precomputed and embedded in both engines (the same literal-table
# rule as text_zipf_fit / NDCG): a 7-day half-life keep-probability
# ladder that neither engine derives from exp() at query time.
_DECAY_HALFLIFE_DAYS = 7
_DECAY_MILLI = [
    int(math.exp(-math.log(2) / _DECAY_HALFLIFE_DAYS * d) * 1000)
    for d in range(64)
]


@register(
    "sample_time_decay",
    oracle=f"""
    WITH mx AS (
      SELECT CAST(max(ts) AS DATE) AS mxd FROM events
    ), e AS (
      SELECT event_type,
             date_diff('day', CAST(ts AS DATE), mxd) AS age_d,
             CAST(concat('0x', substr(md5('td'
                 || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u
      FROM events, mx
    ), k AS (
      SELECT event_type, age_d // 7 AS week,
             CASE WHEN u * 1000 < coalesce(
               ([{", ".join(str(v) for v in _DECAY_MILLI)}])[age_d + 1], 0)
               * 4294967296 THEN 1 ELSE 0 END AS kept
      FROM e
    )
    SELECT event_type, week,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(kept) AS BIGINT) * 1000 // count(*) AS kept_milli
    FROM k GROUP BY event_type, week
    """,
)
def sample_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decay sampling — keep an event with probability
    exp(−ln2·age/7d) (7-day half-life): the standard freshness bias
    for training-data windows and replay buffers (recent behavior is
    worth more than stale behavior, but hard cutoffs lose all tail
    signal). Deterministic: the draw is the salted md5-prefix uniform
    (repo-standard), the decay ladder is a PYTHON-precomputed
    trunc-milli literal table (ages 0–63 d; older → p=0) so neither
    engine evaluates exp(), and the keep test is the pure-int compare
    u·1000 < decay_milli·2³² — no float anywhere. Emitted per
    (event_type, age-week): kept share in exact milli, so the output
    IS the decay curve and a hash-check pins ~2⁻ʷ·1000 per week.

    Scale: one map-side predicate per row (age lookup + hash compare
    — membership needs no sampled-id state, same property as
    sample_universe_consistent), one (type, week) hash agg;
    O(types×weeks) output."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("mxd"))
    e = attach_scalar_frame(ev, "event_id", mx, "mxd").select(
        "event_type",
        F.datediff(F.col("mxd"), F.to_date("ts")).cast("long").alias("age_d"),
        F.expr(
            "CAST(conv(substr(md5('td' || CAST(event_id AS STRING)),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("u"),
    )
    table = F.array(*[F.lit(v).cast("long") for v in _DECAY_MILLI])
    kept = (
        F.col("u") * 1000
        < F.coalesce(
            F.try_element_at(table, (F.col("age_d") + 1).cast("int")),
            F.lit(0).cast("long"),
        )
        * F.lit(4294967296)
    ).cast("long")
    k = e.select(
        "event_type",
        F.expr("age_d div 7").alias("week"),
        kept.alias("kept"),
    )
    return k.groupBy("event_type", "week").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.expr("sum(kept) * 1000 div count(*)").cast("long").alias("kept_milli"),
    )


# --- RAKE keyword extraction --------------------------------------------------------

_RAKE_PAT = r"\b(" + "|".join(STOPWORDS) + r")\b"
# Heaps-bound guard (VERDICT r10 item 7): each document nominates at
# most this many candidate phrases (by doc-local RAKE score) into the
# corpus-level aggregation, so the global phrase table is ≤ docs·k
# even on adversarial fixtures where every word is unique and the
# un-guarded phrase table goes corpus-sized (42.5 s at sf1.0).
_RAKE_DOC_TOPK = 10


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH ph0 AS (
      SELECT doc_id, trim(seg) AS phrase
      FROM (SELECT doc_id, unnest(str_split(regexp_replace(text,
                     '{_RAKE_PAT}', '|', 'g'), '|')) AS seg
            FROM documents)
      WHERE trim(seg) <> ''
    ), pd AS (
      SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS n_d
      FROM ph0 GROUP BY doc_id, phrase
    ), wd AS (
      SELECT doc_id, phrase, n_d, unnest(str_split(phrase, ' ')) AS w,
             CAST(len(str_split(phrase, ' ')) AS BIGINT) AS plen
      FROM pd
    ), wfd AS (
      SELECT doc_id, w, CAST(sum(n_d) AS BIGINT) AS freq_d,
             CAST(sum(plen * n_d) AS BIGINT) AS deg_d
      FROM wd GROUP BY doc_id, w
    ), sd AS (
      SELECT wd.doc_id, wd.phrase, wd.n_d,
             CAST(sum(wfd.deg_d * 1000 // wfd.freq_d) AS BIGINT) AS score_d
      FROM wd JOIN wfd ON wd.doc_id = wfd.doc_id AND wd.w = wfd.w
      GROUP BY wd.doc_id, wd.phrase, wd.n_d
    ), kept AS (
      SELECT phrase, n_d
      FROM (SELECT phrase, n_d,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score_d DESC, phrase) AS rn
            FROM sd)
      WHERE rn <= {_RAKE_DOC_TOPK}
    ), words AS (
      SELECT phrase, n_d, unnest(str_split(phrase, ' ')) AS w,
             CAST(len(str_split(phrase, ' ')) AS BIGINT) AS plen
      FROM kept
    ), wf AS (
      SELECT w, CAST(sum(n_d) AS BIGINT) AS freq,
             CAST(sum(plen * n_d) AS BIGINT) AS deg
      FROM words GROUP BY w
    ), pc AS (
      SELECT phrase, CAST(sum(n_d) AS BIGINT) AS n_occur
      FROM kept GROUP BY phrase
    ), pw AS (
      SELECT pc.phrase, pc.n_occur, wf.deg * 1000 // wf.freq AS ws
      FROM pc, LATERAL (SELECT unnest(str_split(pc.phrase, ' ')) AS w) u
      JOIN wf ON u.w = wf.w
    )
    SELECT phrase, n_occur,
           CAST(sum(ws) AS BIGINT) AS score_milli
    FROM pw GROUP BY phrase, n_occur
    ORDER BY score_milli DESC, phrase LIMIT 25
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction —
    Rose, Engel, Cramer & Cowley 2010): candidate phrases are maximal
    stopword-free word runs; each word scores degree/frequency
    (degree = Σ lengths of phrases containing it — rewards words that
    ride in long collocations), a phrase scores the sum of its words.
    The corpus-level keyword list content teams read next to
    collocations_pmi (PMI finds PAIRS; RAKE finds variable-length
    phrases with one corpus-statistics pass, no window parameter).

    Heaps-bound guard (VERDICT r10 item 7): each document first
    nominates its top-k (k = _RAKE_DOC_TOPK = 10) candidate phrases
    by DOC-LOCAL RAKE score
    (the standard per-document RAKE pass from the 2010 paper), and
    only nominated (phrase, per-doc count) pairs enter the corpus
    aggregation. On natural text with per-doc candidate counts ≤ k
    the nomination is the identity and the corpus scores match the
    un-guarded plan; on adversarial all-unique-word corpora it bounds
    the global phrase table at docs·k instead of corpus-sized.

    ALL INTEGER: word score = deg·1000 DIV freq (non-negative DIV,
    engine-identical) at both the doc-local and corpus level; phrase
    score an exact int64 sum of word milli-scores. Phrase segmentation
    is the identical regex in both engines (word-boundary stopword →
    '|' then split — DuckDB needs the explicit 'g' flag Spark
    implies). Per-doc nomination orders by (score_d DESC, phrase) and
    the final top-25 by (score DESC, phrase) — total orders, so the
    kept set and result are engine-identical.

    Scale: the per-doc nomination is DOC-LOCAL, so it runs with ZERO
    shuffle — phrases are segmented in-row (JVM regex, the same
    expression the un-guarded plan used) and each doc's top-k is
    picked inside one Arrow-batched ``mapInPandas`` pass (exact
    integer arithmetic, O(len·log len) per doc; the relational
    formulation of the same pass costs 5 corpus-sized keyed exchanges
    — measured 12.2 s vs <10 s at the sf1.0 adversarial fixture). The
    corpus pass then runs over ≤ docs·k nominated phrases: two
    bounded hash aggs + one explode-join (word-stat side AQE-sized —
    no forced broadcast, so an adversarial vocabulary degrades to a
    shuffle join instead of a driver OOM); TakeOrdered(25)."""
    docs = load_table(spark, sf_dir, "documents")
    seg = docs.select(
        F.filter(
            # single-arg lambda REQUIRED: F.trim has an optional 2nd
            # param, so passing it bare makes transform() feed the
            # element INDEX as the trim-character set
            F.transform(
                F.split(F.regexp_replace("text", _RAKE_PAT, "|"), r"\|"),
                lambda p: F.trim(p),
            ),
            lambda p: p != "",
        ).alias("segs")
    )

    def _nominate(batches):  # noqa: ANN001, ANN202 - Arrow batch iterator
        from collections import Counter

        import pandas as _pd

        for pdf in batches:
            out_p: list[str] = []
            out_n: list[int] = []
            for segs in pdf["segs"]:
                if segs is None or len(segs) == 0:
                    continue
                cnt = Counter(segs)
                freq: Counter = Counter()
                deg: Counter = Counter()
                for phr, n in cnt.items():
                    ws = phr.split(" ")
                    plen = len(ws)
                    for w in ws:
                        freq[w] += n
                        deg[w] += plen * n
                scored = sorted(
                    (
                        -sum(deg[w] * 1000 // freq[w] for w in phr.split(" ")),
                        phr,
                        n,
                    )
                    for phr, n in cnt.items()
                )
                for _, phr, n in scored[:_RAKE_DOC_TOPK]:
                    out_p.append(phr)
                    out_n.append(n)
            yield _pd.DataFrame({"phrase": out_p, "n_d": out_n})

    kept = seg.mapInPandas(_nominate, schema="phrase string, n_d long")
    words = kept.select(
        "phrase",
        "n_d",
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).cast("long").alias("plen"),
    )
    wf = words.groupBy("w").agg(
        F.sum("n_d").cast("long").alias("freq"),
        F.sum(F.col("plen") * F.col("n_d")).cast("long").alias("deg"),
    )
    pc = kept.groupBy("phrase").agg(
        F.sum("n_d").cast("long").alias("n_occur")
    )
    pw = (
        pc.select(
            "phrase", "n_occur", F.explode(F.split("phrase", " ")).alias("w")
        )
        .join(wf, "w")
        .select(
            "phrase",
            "n_occur",
            F.expr("deg * 1000 div freq").alias("ws"),
        )
    )
    return (
        pw.groupBy("phrase", "n_occur")
        .agg(F.sum("ws").cast("long").alias("score_milli"))
        .orderBy(F.col("score_milli").desc(), "phrase")
        .limit(25)
    )


# --- composed curation pipeline (VERDICT r10 item 8: multi-op fusion) ---------


@register(
    "pipeline_corpus_curate",
    oracle=f"""
    WITH rep AS (
      SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
             text, CAST(count(*) AS BIGINT) AS n_copies
      FROM documents GROUP BY text
    ), q AS (
      SELECT doc_id, source, n_copies,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(list_filter(str_split(text, ' '),
                                  w -> list_contains({_STOP_SQL}, w)))
                  AS BIGINT) AS n_stop
      FROM rep
    ), gated AS (
      SELECT * FROM q WHERE n_words >= 5 AND n_stop * 50 >= n_words
    ), mixed AS (
      SELECT * FROM gated
      WHERE substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 8) <
            {_mix_case_sql()}
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n_words) AS BIGINT) AS words_kept,
           CAST(sum(n_copies - 1) AS BIGINT) AS dup_copies_removed
    FROM mixed GROUP BY source
    """,
)
def pipeline_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED curation pipeline — exact dedup -> quality gate ->
    training-mix sample -> per-source accounting, fused into ONE
    Catalyst plan (VERDICT r10 item 8: the riskiest untested surface
    was multi-op composition, so this row exercises operator CHAINS
    sharing a scan and exchanges, with an end-to-end oracle).

    Stages and the existing operators they fuse:
      1. `dedup_exact` semantics: one representative (min doc_id, its
         source via min_by) per distinct text, copies counted;
      2. `text_quality` gate, doc-local on the survivor: n_words >= 5
         and stopword ratio >= 2% — expressed as the PURE-INT
         cross-multiplication n_stop*50 >= n_words (no float boundary
         for engines to straddle);
      3. `sample_stratified` mixing: the md5('smp'||doc_id) per-source
         keep-rate predicate (same _MIX_RATES recipe — a pure row-key
         function, so membership here equals membership in the
         standalone row);
      4. per-source accounting: docs/words kept, duplicate copies
         removed.

    FUSION ECONOMICS (asserted in tests/test_datapipe.py): the fused
    plan reads the corpus ONCE (the standalone chain scans it for
    dedup, again for quality, again for the mix) and runs TWO
    exchanges total — the dedup groupBy(text) and the final tiny
    groupBy(source); the quality and mix stages are map-side
    projections riding the dedup exchange's output, exactly where
    Catalyst fuses them. At 100 TB the win is one full-corpus scan and
    one wide shuffle instead of three scans plus a wide shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rep = docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
        F.count("*").cast("long").alias("n_copies"),
    )
    wsplit = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    q = rep.select(
        "doc_id",
        "source",
        "n_copies",
        F.size(wsplit).cast("long").alias("n_words"),
        F.size(F.filter(wsplit, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    gated = q.filter(
        (F.col("n_words") >= 5) & (F.col("n_stop") * 50 >= F.col("n_words"))
    )
    key = F.substring(
        F.md5(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))), 1, 8
    )
    cut = F.lit(_rate_hex(_MIX_DEFAULT))
    for src, rate in _MIX_RATES.items():
        cut = F.when(F.col("source") == src, F.lit(_rate_hex(rate))).otherwise(cut)
    mixed = gated.filter(key < cut)
    return mixed.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_kept"),
        F.sum("n_words").cast("long").alias("words_kept"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("dup_copies_removed"),
    )


# --- deterministic A/B experiment assignment (round 12) -----------------------


@register(
    "sample_ab_assignment",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    arms AS (
      SELECT user_id,
             CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8'
                  THEN 'A' ELSE 'B' END AS arm
      FROM u
    ), counts AS (
      SELECT CAST(count(*) FILTER (arm = 'A') AS BIGINT) AS n_a,
             CAST(count(*) FILTER (arm = 'B') AS BIGINT) AS n_b
      FROM arms
    )
    SELECT n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
                AS BIGINT) AS chi2_micro,
           (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
             < 3841459 AS srm_pass
    FROM counts
    """,
)
def sample_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based A/B experiment assignment + sample-
    ratio-mismatch (SRM) check — the bucketing primitive every
    experimentation platform runs at ingest: arm(user) is a pure
    function of md5(salt:user), so assignment is stable across
    sessions, engines, and replays (no state to store), and the SRM
    chi-square guards against the classic silent randomization bug
    (Fabijan et al., KDD'19: a failed SRM check invalidates the
    experiment).

    Engine-neutral hashing: md5 hex is identical in Spark and DuckDB,
    and the 50/50 split compares the FIRST HEX CHAR lexicographically
    against '8' (the eval_bootstrap_ci_mean hex-cut idiom — no integer
    parsing of hex anywhere). The 1-df chi-square statistic
    (n_a−n_b)²/n is exact integer micro-units (toward-zero div matches
    floor on non-negatives), compared against the 0.05 critical value
    3.841459 as integer micro. One distinct-users shuffle, O(1)
    output."""
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
    arm_a = F.substring(
        F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 1
    ) < "8"
    counts = ev.agg(
        F.count_if(arm_a).cast("long").alias("n_a"),
        F.count_if(~arm_a).cast("long").alias("n_b"),
    )
    chi2 = F.expr("(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b)")
    return counts.select(
        "n_a",
        "n_b",
        chi2.cast("long").alias("chi2_micro"),
        (chi2 < 3_841_459).alias("srm_pass"),
    )


# --- composed RAG context assembly (round 12) ----------------------------------

_RAG_TERMS = ["join", "window", "scan"]  # the fixed BM25/RRF query
_RAG_TOPK = 32
_RAG_CTX_CHARS = 600


@register(
    "pipeline_rag_context",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id,
             CAST((s - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_no,
             substr(text, CAST(s AS INT), {_CHUNK_LEN}) AS chunk_text,
             CAST(length(substr(text, CAST(s AS INT), {_CHUNK_LEN}))
                  AS BIGINT) AS chunk_len
      FROM documents,
           LATERAL (SELECT unnest(generate_series(
             1, greatest(length(text), 1), {_CHUNK_STRIDE})) AS s)
    ), scored AS (
      SELECT doc_id, chunk_no, chunk_len,
             CAST(len(list_filter(str_split(chunk_text, ' '),
                                  w -> list_contains({_RAG_TERMS!r}, w)))
                  AS BIGINT) AS score
      FROM chunks
    ), topk AS (
      SELECT * FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id, chunk_no LIMIT {_RAG_TOPK}
    ), packed AS (
      SELECT doc_id, chunk_no, chunk_len, score,
             CAST(coalesce(sum(chunk_len) OVER (
               ORDER BY score DESC, doc_id, chunk_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_RAG_CTX_CHARS} AS BIGINT) AS ctx_id
      FROM topk
    )
    SELECT ctx_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(chunk_len) AS BIGINT) AS total_chars,
           CAST(sum(score) AS BIGINT) AS score_sum
    FROM packed GROUP BY ctx_id
    """,
)
def pipeline_rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED RAG context-assembly pipeline (r12 — the sixth composed
    row, and the retrieval-side twin of pipeline_retrieval_eval's
    eval side): sliding-window chunking -> lexical relevance scoring
    -> top-k chunk retrieval -> greedy context packing, in ONE plan —
    the exact prep every retrieval-augmented generation service runs
    between a query and its LLM call.

    Stage reuse: chunking is chunk_documents' substring ladder
    (narrow, zero shuffle), scoring is an integer term count per
    chunk (JVM-side HOF filter — no ln, so no quantization needed),
    retrieval is TakeOrdered (orderBy+limit, never a global
    row_number over the corpus), and packing is pack_sequences'
    prefix-sum DIV rule applied to the <= 32 retrieved chunks
    (window whitelisted top-k-limit: the frame is the retrieval k,
    not data volume). Ties rank by (score DESC, doc_id, chunk_no) in
    both engines. Output: one row per assembled context window with
    integer chunk/doc/char/score accounting — hash-exact.

    100 TB: chunking+scoring stream map-side over the corpus; only
    the per-partition top-k survivors (TakeOrdered partials) shuffle;
    everything after the cut is <= k rows."""
    chunks = chunk_documents(spark, sf_dir)
    score = F.size(
        F.filter(
            F.split("chunk_text", " "),
            lambda w: w.isin(_RAG_TERMS),
        )
    ).cast("long")
    topk = (
        chunks.select("doc_id", "chunk_no", "chunk_len", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id", "chunk_no")
        .limit(_RAG_TOPK)
    )
    packed = topk.withColumn(
        "ctx_id",
        F.expr(
            f"coalesce(sum(chunk_len) OVER (ORDER BY score DESC, doc_id, "
            f"chunk_no ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            f"div {_RAG_CTX_CHARS}"
        ).cast("long"),
    )
    return packed.groupBy("ctx_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("chunk_len").cast("long").alias("total_chars"),
        F.sum("score").cast("long").alias("score_sum"),
    )


# --- composed row #9: tokenize -> pack -> shard (round 13) ---------------------


@register(
    "pipeline_tokenize_pack_shard",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id, source,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(len(str_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) // {_CTX_WINDOW} AS seq_id
      FROM documents
    ), seqs AS (
      SELECT source, seq_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tok_sum
      FROM packed GROUP BY source, seq_id
    ), scores AS (
      SELECT source, seq_id, n_docs, tok_sum, shard,
             md5(source || '/' || CAST(seq_id AS VARCHAR)
                 || '#' || CAST(shard AS VARCHAR)) AS score
      FROM seqs, (SELECT unnest(range(0, {_HRW_SHARDS})) AS shard)
    ), assign AS (
      SELECT source, seq_id, n_docs, tok_sum, shard FROM (
        SELECT *, row_number() OVER (PARTITION BY source, seq_id
                                     ORDER BY score DESC, shard) AS rn
        FROM scores) WHERE rn = 1
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_sequences,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(tok_sum) AS BIGINT) AS tok_sum
    FROM assign GROUP BY shard
    """,
)
def pipeline_tokenize_pack_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed row #9, the LLM-pretraining data-prep tail end to end:
    tokenize (per-doc token counts) → greedy sequence PACKING into
    {_CTX_WINDOW}-token context windows (pack_sequences' per-source
    prefix sum, reused verbatim) → rendezvous/HRW SHARD assignment of
    each packed sequence to one of {_HRW_SHARDS} writer shards
    (pipeline_rendezvous_sharding's md5-argmax, on the (source,
    seq_id) key) → the per-shard audit a dataset build reports
    (sequence / document / token accounting). This is the job that
    turns a curated corpus into training shards; the standalone rows
    localize failures, this row proves the composition.

    Scale: ONE per-source prefix-sum window (inherent to packing —
    shard the same plan by (source, date_bucket) at 100 TB), one
    sequence-count-sized aggregate, then the HRW argmax folds over a
    CONSTANT 8-shard array JVM-side (no explode, no join) and the
    final rollup is {_HRW_SHARDS} rows. Nothing after the window
    shuffles more than the packed-sequence directory."""
    packed = pack_sequences(spark, sf_dir)
    seqs = packed.groupBy("source", "seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tok_sum"),
    )
    shard_struct = [
        F.struct(
            F.md5(
                F.concat(
                    F.col("source"),
                    F.lit("/"),
                    F.col("seq_id").cast("string"),
                    F.lit("#"),
                    F.lit(str(i)),
                )
            ).alias("score"),
            F.lit(-i).alias("neg_shard"),
        )
        for i in range(_HRW_SHARDS)
    ]
    winner = F.array_max(F.array(*shard_struct))
    assigned = seqs.select(
        (-winner.getField("neg_shard")).cast("long").alias("shard"),
        "n_docs",
        "tok_sum",
    )
    return assigned.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_sequences"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("tok_sum").cast("long").alias("tok_sum"),
    )
