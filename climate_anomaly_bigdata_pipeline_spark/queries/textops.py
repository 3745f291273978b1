"""Text-analysis queries over the documents table (SURVEY §2.10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.catalog import Catalog
from climate_anomaly_bigdata_pipeline_spark.operators import relational as R
from climate_anomaly_bigdata_pipeline_spark.operators import text as TX
from climate_anomaly_bigdata_pipeline_spark.queries import query

_TF_ORACLE = r"""
WITH toks AS (
    SELECT unnest(str_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents
), counts AS (
    SELECT term, count(*) AS n FROM toks GROUP BY term
)
SELECT term, n FROM counts
ORDER BY n DESC, term
LIMIT 50
"""


@query("term_frequency_top50", oracle=_TF_ORACLE)
def term_frequency_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top 50 with deterministic tiebreak
    (tokenize → explode → count → ordered limit)."""
    docs = Catalog(spark, sf_dir).documents
    tf = TX.term_frequency(docs)
    return R.topk(tf, [F.col("n").desc(), F.col("term")], 50)


_STOPWORD_LIST_SQL = "('" + "', '".join(TX.EN_STOPWORDS) + "')"

_QUALITY_ORACLE = rf"""
WITH stats AS (
    SELECT
        doc_id, lang, n_chars,
        str_split_regex(lower(trim(text)), '\s+') AS toks
    FROM documents
), scored AS (
    SELECT
        doc_id, lang, n_chars,
        len(toks) AS n_tokens,
        CAST(list_sum(list_transform(toks, t -> CAST(ceil(length(t) / 4) AS INT)))
             AS BIGINT) AS bpe_token_est,
        round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE), 4) AS avg_token_len,
        round(CAST(len(list_filter(toks, t -> t IN {_STOPWORD_LIST_SQL})) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio
    FROM stats
)
SELECT *,
    CASE WHEN n_tokens < 10 OR stopword_ratio <= 0 THEN 'LOW'
         WHEN n_tokens >= 40 AND stopword_ratio >= 0.05 AND avg_token_len <= 8
              THEN 'HIGH'
         ELSE 'MEDIUM'
    END AS quality
FROM scored
"""


@query("doc_quality_scores", oracle=_QUALITY_ORACLE)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token stats + three-way quality classification —
    pure expressions, no UDFs, portable integer/double arithmetic."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "lang", "n_chars", "text")
    out = TX.quality_score(TX.token_stats(docs))
    return out.drop("text")


_LANG_ORACLE = rf"""
WITH stats AS (
    SELECT
        doc_id, lang,
        str_split_regex(lower(trim(text)), '\s+') AS toks
    FROM documents
), scored AS (
    SELECT doc_id, lang,
        round(CAST(len(list_filter(toks, t -> t IN {_STOPWORD_LIST_SQL})) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE), 4) AS en_score
    FROM stats
)
SELECT doc_id, lang, en_score,
       CASE WHEN en_score >= 0.03 THEN 'en' ELSE 'unknown' END AS lang_pred
FROM scored
"""


@query("lang_id_heuristic", oracle=_LANG_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language identification (n-gram-heuristic class);
    compare ``lang_pred`` against the table's labeled ``lang``."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "lang", "text")
    return TX.lang_id(docs).drop("text")


_FINGERPRINT_ORACLE = r"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
), fp AS (
    SELECT doc_id,
           md5(array_to_string(str_split_regex(lower(trim(text)), '\s+'), ' '))
               AS fingerprint
    FROM corpus
)
SELECT fingerprint, count(*) AS n_copies, min(doc_id) AS canonical_doc_id
FROM fp
GROUP BY fingerprint
HAVING count(*) > 1
"""


@query("fingerprint_duplicates", oracle=_FINGERPRINT_ORACLE)
def fingerprint_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection via md5 fingerprints on a corpus with
    injected duplicates (every 5th doc re-appears under a new id); the
    canonical representative is the min doc_id — deterministic."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(dupes)
    fp = TX.fingerprint(corpus)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---- TF-IDF top terms per document ------------------------------------------

_TFIDF_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (
    SELECT term, count(*) AS df_t FROM tf GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
           round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df_t + 1.0)), 4) AS score
    FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, tf, df_t, score,
       CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term
       ) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 3
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: smooth idf = ln((N+1)/(df+1)),
    corpus size as a broadcast one-row aggregate, rank on the rounded
    score so the top-k boundary is engine-portable."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    return TX.tfidf_top_terms(docs, top=3)


# ---- repetition quality (Gopher-style) --------------------------------------

_REPETITION_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
       round(len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 4) AS ttr,
       round(list_aggregate(
                 list_transform(list_distinct(t),
                                d -> len(list_filter(t, x -> x = d))),
                 'max') / CAST(len(t) AS DOUBLE), 4) AS top_token_frac
FROM toks
"""


@query("repetition_quality_docs", oracle=_REPETITION_ORACLE)
def repetition_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (type-token ratio, modal-token
    fraction) — the pretraining boilerplate/degeneration filter, via
    one codegen'd (doc, token) aggregation (the interpreted in-row
    fold was 15x slower at sf1 — see repetition_stats)."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    return TX.repetition_stats(docs)


# ---- PII scrub --------------------------------------------------------------

_PII_ORACLE = r"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com ref ' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
               AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_numbers,
       CAST(length(text) AS BIGINT) AS len_before,
       CAST(length(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '[0-9]{7,}', '<NUM>', 'g')) AS BIGINT) AS len_after
FROM aug
"""


@query("pii_scrub_docs", oracle=_PII_ORACLE)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: the corpus is deterministically augmented
    with one synthetic email + one 8-digit account number per doc (the
    synthetic corpus has none), then scrubbed with the engine-portable
    patterns; output counts matches and before/after lengths. Note
    DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all default."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com ref "),
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
        ),
    )
    out = TX.pii_scrub(aug)
    return out.select(
        "doc_id",
        "n_emails",
        "n_numbers",
        F.length("text").cast("long").alias("len_before"),
        F.length("scrubbed").cast("long").alias("len_after"),
    )


# ---- fixed-size token chunking ----------------------------------------------

_CHUNK_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents
),
st AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, 48)) AS s
    FROM toks
)
SELECT doc_id,
       CAST((s - 1) // 48 + 1 AS BIGINT) AS chunk_idx,
       CAST(len(t[s:s+63]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(t[s:s+63], ' ')) AS chunk_md5
FROM st
"""


@query("chunk_documents_64_16", oracle=_CHUNK_ORACLE)
def chunk_documents_64_16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: 64-token windows, 16-token overlap
    (step 48) — variable-length docs become fixed-size training
    sequences. Row-local sequence/slice expressions + one explode,
    zero shuffle; chunk content is carried as md5 so the certificate
    covers bytes, not just counts."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    return TX.chunk_documents(docs, chunk_size=64, overlap=16)


# ---- sequence packing -------------------------------------------------------

_PACK_ORACLE = r"""
WITH t AS (
    SELECT doc_id,
           len(str_split_regex(lower(trim(text)), '\s+')) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS cum_before
    FROM t
)
SELECT CAST(cum_before // 512 AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM c
GROUP BY 1
"""


@query("pack_sequences_512", oracle=_PACK_ORACLE)
def pack_sequences_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents fill 512-token training packs by
    running offset in doc_id order (streaming-fill approximation —
    deterministic and parallelizable, overflow bounded at one doc per
    pack). Output is the per-pack doc/token profile."""
    from climate_anomaly_bigdata_pipeline_spark.operators import relational as R

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    with_counts = docs.select(
        "doc_id", F.size(TX.tokens_expr("text")).alias("n_tokens")
    )
    packed = R.pack_sequences(with_counts, "doc_id", "n_tokens", budget=512)
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


# --- Self-trained unigram-LM scoring (model-based quality filter) ------------

_UNIGRAM_LM_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
), lm AS (
    SELECT tok, count(*) AS tok_n FROM toks GROUP BY tok
), tot AS (
    SELECT CAST(sum(tok_n) AS DOUBLE) AS t FROM lm
)
SELECT
    doc_id,
    count(*) AS n_tokens,
    round(avg(-ln(tok_n / t)), 4) AS avg_neg_logp
FROM toks JOIN lm USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


@query("unigram_lm_scores", oracle=_UNIGRAM_LM_ORACLE)
def unigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality score from a unigram LM trained on the
    corpus itself: avg(-ln p(token)) per doc. The vocabulary-sized LM
    broadcasts back onto the exploded tokens (KenLM-shaped filtering
    reduced to its portable core)."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    return TX.unigram_lm_scores(docs)


# ---- term-distribution drift between sources (Jensen-Shannon) ---------------

_JSD_ORACLE = r"""
WITH toks AS (
    SELECT source, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
),
tf AS (
    SELECT source, tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY 1, 2
),
tot AS (
    SELECT source, CAST(sum(c) AS DOUBLE) AS n FROM tf GROUP BY 1
),
p AS (
    SELECT tf.source, tok, tf.c / tot.n AS p
    FROM tf JOIN tot ON tf.source = tot.source
),
src_pairs AS (
    SELECT a.source AS source_a, b.source AS source_b
    FROM (SELECT DISTINCT source FROM tf) a
    JOIN (SELECT DISTINCT source FROM tf) b ON a.source < b.source
),
terms AS (
    SELECT sp.source_a, sp.source_b, t.tok,
           coalesce(pa.p, 0.0) AS pa, coalesce(pb.p, 0.0) AS pb
    FROM src_pairs sp
    JOIN (SELECT DISTINCT tok FROM tf) t ON TRUE
    LEFT JOIN p pa ON pa.source = sp.source_a AND pa.tok = t.tok
    LEFT JOIN p pb ON pb.source = sp.source_b AND pb.tok = t.tok
),
contrib AS (
    SELECT source_a, source_b,
           CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0.0 END
           + CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0.0 END
               AS term_js
    FROM terms
    WHERE pa > 0 OR pb > 0
)
SELECT source_a, source_b,
       CAST(round(CAST(CAST(
           CAST(sum(CAST(term_js AS DECIMAL(25,15))) AS DOUBLE) * 0.5
       AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS js_divergence
FROM contrib
GROUP BY source_a, source_b
"""


@query("term_drift_js_divergence", oracle=_JSD_ORACLE)
def term_drift_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every source pair's term
    distribution — the drift monitor a training-mix pipeline runs when
    a new crawl lands (JS is symmetric and finite even on disjoint
    vocabularies, unlike KL). Term probabilities come from one grouped
    count per source; pairs×vocabulary fan-out is (sources² × vocab) —
    both bounded — and the per-term contributions sum in DECIMAL so
    the result is order-independent and bit-identical across engines."""
    toks = (
        Catalog(spark, sf_dir)
        .documents.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tf.groupBy("source").agg(F.sum("c").cast("double").alias("n"))
    p = tf.join(tot, "source").select(
        "source", "tok", (F.col("c") / F.col("n")).alias("p")
    )
    sources = tf.select("source").distinct()
    src_pairs = (
        sources.select(F.col("source").alias("source_a"))
        .join(
            sources.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    vocab = tf.select("tok").distinct()
    terms = (
        src_pairs.crossJoin(vocab)
        .join(
            p.select(F.col("source").alias("source_a"), "tok", F.col("p").alias("pa")),
            ["source_a", "tok"],
            "left",
        )
        .join(
            p.select(F.col("source").alias("source_b"), "tok", F.col("p").alias("pb")),
            ["source_b", "tok"],
            "left",
        )
        .select(
            "source_a",
            "source_b",
            F.coalesce("pa", F.lit(0.0)).alias("pa"),
            F.coalesce("pb", F.lit(0.0)).alias("pb"),
        )
        .filter((F.col("pa") > 0) | (F.col("pb") > 0))
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term_js = F.when(F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / m)).otherwise(
        0.0
    ) + F.when(F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / m)).otherwise(0.0)
    return (
        terms.withColumn("term_js", term_js.cast("decimal(25,15)"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(F.sum("term_js").cast("double") * 0.5, 6).alias("js_divergence")
        )
    )


# ---- BPE-ish token counting ------------------------------------------------

# GPT-2-style pre-tokenizer, restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): contractions,
# space-prefixed letter runs, digit runs, punctuation runs. No
# lookarounds (RE2 has none). Counting these matches approximates the
# BPE token count a real tokenizer would refine by merges.
_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"

_BPE_ORACLE = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
            AS BIGINT) AS n_bpe_tokens,
       CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(round(CAST(len(text) AS DOUBLE)
            / nullif(len(regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')), 0),
            4) AS DOUBLE) AS chars_per_token
FROM documents
"""


@query("bpe_token_profile", oracle=_BPE_ORACLE)
def bpe_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens
    plus a BPE-ish regex pre-tokenizer count (GPT-2's pattern minus
    RE2-unsupported lookarounds, so Spark and the oracle run the SAME
    automaton), and the chars-per-token compression ratio quality
    signal. Pure codegen'd JVM expressions — no UDF; at 100 TB this is
    an embarrassingly parallel map over the corpus scan."""
    docs = Catalog(spark, sf_dir).documents
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0)))
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_ws.cast("long").alias("n_ws_tokens"),
        F.round(
            F.length("text").cast("double") / F.nullif(n_bpe, F.lit(0)).cast("double"),
            4,
        )
        .cast("double")
        .alias("chars_per_token"),
    )


# ---- BM25 retrieval --------------------------------------------------------

_BM25_TERMS = ("join", "window", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 20

_BM25_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
    FROM dl
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM toks WHERE tok IN {str(tuple(_BM25_TERMS))}
    GROUP BY doc_id, tok
),
dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
    SELECT tf.doc_id, tf.tok,
           ln((CAST(st.n_docs AS DOUBLE) - CAST(dfx.df AS DOUBLE) + 0.5)
              / (CAST(dfx.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf.tf AS DOUBLE)
              / (CAST(tf.tf AS DOUBLE)
                 + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                       / (CAST(st.tot AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
               AS s
    FROM tf
    JOIN dl ON tf.doc_id = dl.doc_id
    JOIN dfx ON dfx.tok = tf.tok
    CROSS JOIN st
),
agg AS (
    SELECT doc_id,
           list_reduce(list(s ORDER BY tok), (a, x) -> a + x) AS raw
    FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(round(raw, 6) AS DOUBLE) AS bm25
FROM agg
ORDER BY raw DESC, doc_id
LIMIT {_BM25_K}
"""


@query("bm25_topk_docs", oracle=_BM25_ORACLE)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BM25 (Robertson/Sparck Jones; Lucene idf form):
    top-20 documents for a fixed 3-term query.

    Scale shape: doc lengths and term stats are bounded aggregates
    (|terms| and one global row) broadcast onto the per-(doc, term)
    tf table; the corpus shuffles once keyed by doc. Per-doc score is
    a fold over <= |terms| structs in sorted term order (bit-exact);
    final top-k is a TakeOrdered on the raw (unrounded, bit-identical)
    score with a doc_id tiebreak."""
    docs = Catalog(spark, sf_dir).documents
    # Pre-explode hash exchange on the unique doc id (rows-vs-bytes
    # rule): the compressed doc table scans as 1-2 byte-sized splits;
    # without the exchange the token explode runs on 1-2 tasks
    # (measured at sf10: 21.6 s starved).
    par = spark.sparkContext.defaultParallelism
    toks = docs.repartition(par, "doc_id").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfx = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("tot").cast("double") / F.col("n_docs").cast("double")
    idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    s = idf * (
        tfd
        / (
            tfd
            + F.lit(_BM25_K1)
            * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * (dld / avgdl))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfx), "tok")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "tok", s.alias("s"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("tok"), F.col("s").alias("v")))),
            F.lit(0.0),
            lambda acc, c: acc + c["v"],
        ).alias("raw")
    )
    return (
        agg.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(_BM25_K)
        .select("doc_id", F.round("raw", 6).cast("double").alias("bm25"))
    )


# ---- BPE training primitive: first-merge pair statistics --------------------

_BPE_MERGE_TOPN = 20

_BPE_MERGE_ORACLE = f"""
WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
pairs AS (
    SELECT unnest(list_transform(
               generate_series(1, length(w) - 1),
               i -> substr(w, CAST(i AS INTEGER), 2)
           )) AS pair
    FROM words WHERE length(w) >= 2
)
SELECT pair, count(*) AS n_occurrences
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {_BPE_MERGE_TOPN}
"""


@query("bpe_first_merge_pairs", oracle=_BPE_MERGE_ORACLE)
def bpe_first_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first round of BPE tokenizer training: corpus-wide adjacent
    character-pair frequencies inside words — the argmax pair IS the
    first merge rule (Sennrich et al. 2016). Top-20 with a
    deterministic lexicographic tiebreak.

    Scale posture: pair generation is a pure in-row transform+explode
    (codegen, zero Python), the count shuffles on a small pair domain
    (map-side partial combine absorbs the corpus multiplicity), and
    the top-20 is a TakeOrdered. Subsequent BPE rounds repeat this
    plan on the re-segmented corpus — each round one aggregation pass,
    the standard distributed-BPE shape."""
    docs = Catalog(spark, sf_dir).documents
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i.cast("int"), 2),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(_BPE_MERGE_TOPN)
    )


# ---- retrieval evaluation: nDCG@10 / MRR / P@10 ------------------------------
#
# IR-eval harness over the BM25 lexical run (Järvelin & Kekäläinen 2002
# nDCG, linear gain). Each of the three fixed query terms is one
# "query"; graded relevance for (term, doc) is the term frequency and
# binary relevance is tf >= 2 — deterministic qrels derived from the
# corpus itself, so the whole evaluation is oracle-expressible.
#
# Bit-exactness: the rank discounts 1/log2(r+1) are Python-float
# literals embedded identically in the Spark plan and the oracle SQL
# (both engines parse the repr round-trip to the same double), so DCG
# is a fold of identical products in rank order on both sides — no
# engine libm log2 in the data path.

import math as _math

_NDCG_K = 10
_REL_MIN = 2  # binary-relevance threshold for MRR / P@10
_DCG_W = tuple(1.0 / _math.log2(r + 1) for r in range(1, _NDCG_K + 1))

# QUOTED literals: DuckDB parses an unquoted 17-digit numeric through
# DECIMAL and then double-rounds the DECIMAL→DOUBLE cast (measured:
# 1/log2(6) lands 1 ulp low), while a quoted string parses
# correctly-rounded — the PCA-oracle CAST('{v}' AS DOUBLE) recipe.
_NDCG_DISC_VALUES = ", ".join(
    f"({r}, CAST('{w!r}' AS DOUBLE))" for r, w in enumerate(_DCG_W, start=1)
)

_NDCG_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
    FROM dl
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM toks WHERE tok IN {str(tuple(_BM25_TERMS))}
    GROUP BY doc_id, tok
),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf,
           CAST(tf.tf AS DOUBLE)
              / (CAST(tf.tf AS DOUBLE)
                 + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                       / (CAST(st.tot AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))
               AS m
    FROM tf
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN st
),
disc AS (SELECT * FROM (VALUES {_NDCG_DISC_VALUES}) AS v(rnk, wt)),
run AS (
    SELECT tok, tf,
           CAST(row_number() OVER (
               PARTITION BY tok ORDER BY m DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= {_NDCG_K}
),
dcg AS (
    SELECT r.tok,
           list_reduce(
               list(CAST(r.tf AS DOUBLE) * d.wt ORDER BY r.rnk),
               (a, x) -> a + x
           ) AS dcg,
           COALESCE(
               CAST(1.0 AS DOUBLE)
                   / min(r.rnk) FILTER (WHERE r.tf >= {_REL_MIN}),
               CAST(0.0 AS DOUBLE)
           ) AS mrr,
           CAST(count(*) FILTER (WHERE r.tf >= {_REL_MIN}) AS DOUBLE)
               / CAST({_NDCG_K}.0 AS DOUBLE) AS p_at_10
    FROM run r JOIN disc d ON d.rnk = r.rnk
    GROUP BY r.tok
),
ideal AS (
    SELECT tok, tf,
           CAST(row_number() OVER (
               PARTITION BY tok ORDER BY tf DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM tf
    QUALIFY rnk <= {_NDCG_K}
),
idcg AS (
    SELECT i.tok,
           list_reduce(
               list(CAST(i.tf AS DOUBLE) * d.wt ORDER BY i.rnk),
               (a, x) -> a + x
           ) AS idcg
    FROM ideal i JOIN disc d ON d.rnk = i.rnk
    GROUP BY i.tok
)
SELECT d.tok, d.dcg / i.idcg AS ndcg10, d.mrr, d.p_at_10
FROM dcg d JOIN idcg i ON i.tok = d.tok
ORDER BY d.tok
"""


@query("retrieval_eval_ndcg", oracle=_NDCG_ORACLE)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the per-term BM25 run: nDCG@10
    (linear gain, Järvelin & Kekäläinen), MRR and precision@10 against
    corpus-derived qrels (graded relevance = term frequency, binary
    relevance = tf >= 2), one row per query term.

    Scale shape: the run is a per-term top-k (shuffle keyed by term —
    at 100 TB each term's posting list is served from the inverted
    index and ranked with a per-term TakeOrdered, so the eval never
    sees more than terms x k rows). The ideal ranking windows each
    term's qrels; its skew bound is the hottest term's df, which the
    tf >= threshold pushdown caps before the window. The discount
    table is a 10-row literal broadcast; DCG folds products in rank
    order on both engines (see module comment) so the check is
    bit-exact, not tolerance-assisted."""
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    # Pre-explode hash exchange on the unique doc id (rows-vs-bytes
    # rule): the compressed doc table scans as 1-2 byte-sized splits;
    # without the exchange the token explode runs on 1-2 tasks
    # (measured at sf10: 21.6 s starved).
    par = spark.sparkContext.defaultParallelism
    toks = docs.repartition(par, "doc_id").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("tot").cast("double") / F.col("n_docs").cast("double")
    # Per-term ranking: BM25's idf is a positive per-term CONSTANT, so
    # ordering by the tf-saturation factor alone is rank-equivalent —
    # and unlike idf's ln(), every op here (IEEE div/mul/add) is
    # correctly rounded, so both engines order identical doubles.
    m = tfd / (
        tfd
        + F.lit(_BM25_K1)
        * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * (dld / avgdl))
    )
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "tok", "tf", m.alias("m"))
    )
    disc = F.array(*[F.lit(w) for w in _DCG_W])

    w_run = Window.partitionBy("tok").orderBy(F.desc("m"), F.asc("doc_id"))
    run = (
        scored.withColumn("rnk", F.row_number().over(w_run).cast("long"))
        .filter(F.col("rnk") <= _NDCG_K)
        .select(
            "tok",
            "rnk",
            "tf",
            (F.col("tf").cast("double") * F.element_at(disc, F.col("rnk").cast("int"))).alias("g"),
        )
    )
    dcg = run.groupBy("tok").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rnk", F.col("g").alias("v")))),
            F.lit(0.0),
            lambda a, c: a + c["v"],
        ).alias("dcg"),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("tf") >= _REL_MIN, F.col("rnk"))),
            F.lit(0.0),
        ).alias("mrr"),
        (
            F.count(F.when(F.col("tf") >= _REL_MIN, F.lit(1))).cast("double")
            / F.lit(float(_NDCG_K))
        ).alias("p_at_10"),
    )

    w_ideal = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    idcg = (
        tf.withColumn("rnk", F.row_number().over(w_ideal).cast("long"))
        .filter(F.col("rnk") <= _NDCG_K)
        .select(
            "tok",
            "rnk",
            (F.col("tf").cast("double") * F.element_at(disc, F.col("rnk").cast("int"))).alias("g"),
        )
        .groupBy("tok")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("rnk", F.col("g").alias("v")))),
                F.lit(0.0),
                lambda a, c: a + c["v"],
            ).alias("idcg")
        )
    )
    return (
        dcg.join(idcg, "tok")
        .select("tok", (F.col("dcg") / F.col("idcg")).alias("ndcg10"), "mrr", "p_at_10")
        .orderBy("tok")
    )


# ---- Zipf's-law fit over the term-frequency distribution ---------------------

# ln(freq) ~ ln(rank) OLS over the full vocabulary: the standard
# corpus-health check (natural text fits slope ≈ -1; template/spam
# corpora flatten or step). Rank comes from the distributed global
# index, never a single-partition row_number; the fit is one regr_*
# aggregate. round(·, 6) is the cross-engine float-parity recipe used
# by every regression query in this repo.
_ZIPF_ORACLE = r"""
WITH toks AS (
    SELECT unnest(str_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents
),
counts AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
ranked AS (
    SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk
    FROM counts
)
SELECT round(regr_slope(ln(n), ln(rnk)), 6) AS slope,
       round(regr_intercept(ln(n), ln(rnk)), 6) AS intercept,
       round(regr_r2(ln(n), ln(rnk)), 6) AS r2,
       CAST(regr_count(ln(n), ln(rnk)) AS BIGINT) AS n_terms
FROM ranked
"""


@query("zipf_fit_terms", oracle=_ZIPF_ORACLE)
def zipf_fit_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of ln(term frequency) against ln(frequency rank) over
    the whole vocabulary — the Zipf's-law slope/R² corpus fingerprint.

    Shape: term counts (one shuffle), frequency ranks via
    :func:`stable_global_index` (range partition + bounded offsets
    collect — a vocabulary-sized global row_number would otherwise plan
    a single-partition sort), then one single-pass regr_* aggregate.
    """
    docs = Catalog(spark, sf_dir).documents
    tf = TX.term_frequency(docs)
    ranked = R.stable_global_index(
        tf.withColumn("neg_n", -F.col("n")), ["neg_n", "term"], out_col="rnk0"
    ).select(
        F.log(F.col("n").cast("double")).alias("y"),
        F.log((F.col("rnk0") + 1).cast("double")).alias("x"),
    )
    fit = R.grouped_linreg(ranked, [], "x", "y", scale=6)
    return fit.select(
        "slope", "intercept", "r2", F.col("n_pairs").cast("long").alias("n_terms")
    )


# ---- Self-trained bigram-LM scoring (context-aware quality filter) ----------

# The bigram upgrade of `unigram_lm_scores`: p(v|u) = (c(uv)+1) /
# (c(u·)+V) with add-one smoothing over the corpus's own bigram
# counts (V = unigram vocabulary size). Catches locally-incoherent
# text that unigram perplexity misses (every token common, no token
# PAIR common). Bigram construction is identical in both engines:
# the non-empty whitespace tokens in position order, adjacent pairs
# only — docs with < 2 tokens contribute no bigrams and drop out.
# All counts are exact longs; the per-doc avg(-ln p) rounds to 4
# decimals, the unigram query's documented ln-ulp guard.
_BIGRAM_LM_ORACLE = r"""
WITH dl AS (
    SELECT doc_id,
           list_filter(str_split_regex(lower(trim(text)), '\s+'),
                       x -> x <> '') AS l
    FROM documents
),
bg AS (
    SELECT doc_id, b['u'] AS u, b['v'] AS v
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(l) - 1, 0)),
                   i -> struct_pack(u := l[i], v := l[i + 1])
               )) AS b
        FROM dl
    )
),
cbg AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cuv FROM bg GROUP BY u, v),
cu AS (SELECT u, CAST(sum(cuv) AS BIGINT) AS cu_n FROM cbg GROUP BY u),
vocab AS (
    SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vv
    FROM (SELECT unnest(l) AS tok FROM dl)
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((CAST(cuv AS DOUBLE) + 1.0)
                     / (CAST(cu_n AS DOUBLE) + CAST(vv AS DOUBLE)))), 4)
           AS avg_neg_logp
FROM bg
JOIN cbg ON cbg.u = bg.u AND cbg.v = bg.v
JOIN cu ON cu.u = bg.u
CROSS JOIN vocab
GROUP BY bg.doc_id
"""


@query("bigram_lm_scores", oracle=_BIGRAM_LM_ORACLE)
def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity score: avg(-ln p(v|u)) with
    add-one smoothing, trained on the corpus itself. The LM tables
    (bigram counts, prefix totals, vocabulary size) are grouped
    aggregates joined back onto the exploded bigram stream on their
    natural keys — the same broadcast-the-model-not-the-corpus shape
    as the unigram scorer, one level of context up."""
    # Pre-explode hash exchange on the unique doc id (rows-vs-bytes
    # rule): the compressed doc table scans as 1-2 byte-sized splits;
    # the bigram explode multiplies rows ~|tokens|x.
    par = spark.sparkContext.defaultParallelism
    docs = (
        Catalog(spark, sf_dir)
        .documents.repartition(par, "doc_id")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            ).alias("l"),
        )
    )
    # Adjacent pairs in position order; sequence(1, n) would count DOWN
    # for n < 1 (Spark semantics), so short docs get an explicit empty.
    bg = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("l") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - 1),
                    lambda i: F.struct(
                        F.element_at("l", i).alias("u"),
                        F.element_at("l", i + 1).alias("v"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
        ).alias("b"),
    ).select("doc_id", F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    cbg = bg.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("cuv"))
    cu = cbg.groupBy("u").agg(F.sum("cuv").cast("long").alias("cu_n"))
    vocab = (
        docs.select(F.explode("l").alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("vv"))
    )
    p = (F.col("cuv").cast("double") + F.lit(1.0)) / (
        F.col("cu_n").cast("double") + F.col("vv").cast("double")
    )
    return (
        bg.join(cbg, ["u", "v"])
        .join(cu, "u")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("avg_neg_logp"),
        )
    )


# ---- Rank-biased overlap between two retrieval rankings ----------------------

# RBO (Webber, Moffat & Zobel 2010) truncated at depth K: how much do
# the BM25 ranking and the raw term-frequency ranking of the same
# 3-term query agree? RBO@K = Σ_d w_d · |S_1:d ∩ T_1:d| with
# w_d = (1−p)·p^(d−1)/d — the top-weighted agreement measure the
# retrieval family (`bm25_topk_docs`, `hybrid_rrf_retrieval`,
# `retrieval_eval_ndcg`) was missing. Both lists are bounded (top-20
# via TakeOrdered), so prefix overlaps are in-row array ops on one
# collected row; the depth weights are embedded as full-precision
# python-repr literals in BOTH engines, so no pow() is evaluated at
# query time (cross-engine pow ulp risk avoided by construction) and
# the weighted sum folds over d in pinned order — bit-exact, no
# rounding needed.
_RBO_P = 0.9
_RBO_K = 20
_RBO_WEIGHTS = [
    (1.0 - _RBO_P) * _RBO_P ** (d - 1) / d for d in range(1, _RBO_K + 1)
]

_RBO_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
    FROM dl
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM toks WHERE tok IN {str(tuple(_BM25_TERMS))}
    GROUP BY doc_id, tok
),
dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
    SELECT tf.doc_id, tf.tok,
           ln((CAST(st.n_docs AS DOUBLE) - CAST(dfx.df AS DOUBLE) + 0.5)
              / (CAST(dfx.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf.tf AS DOUBLE)
              / (CAST(tf.tf AS DOUBLE)
                 + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                       / (CAST(st.tot AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
               AS s
    FROM tf
    JOIN dl ON tf.doc_id = dl.doc_id
    JOIN dfx ON dfx.tok = tf.tok
    CROSS JOIN st
),
bm AS (
    SELECT doc_id,
           list_reduce(list(s ORDER BY tok), (a, x) -> a + x) AS raw
    FROM scored GROUP BY doc_id
),
tfsum AS (
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tfs FROM tf GROUP BY doc_id
),
s_list AS (
    SELECT list(doc_id ORDER BY raw DESC, doc_id) AS s
    FROM (SELECT * FROM bm ORDER BY raw DESC, doc_id LIMIT {_RBO_K})
),
t_list AS (
    SELECT list(doc_id ORDER BY tfs DESC, doc_id) AS t
    FROM (SELECT * FROM tfsum ORDER BY tfs DESC, doc_id LIMIT {_RBO_K})
),
w AS (SELECT {[repr(x) for x in _RBO_WEIGHTS]}::DOUBLE[] AS wts)
SELECT CAST({_RBO_K} AS INTEGER) AS depth,
       CAST('{_RBO_P!r}' AS DOUBLE) AS persistence,
       CAST(len(list_intersect(s, t)) AS BIGINT) AS n_common_topk,
       list_reduce(
           list_transform(
               generate_series(1, {_RBO_K}),
               d -> wts[d] * CAST(len(list_intersect(s[1:d], t[1:d]))
                                  AS DOUBLE)
           ),
           (a, x) -> a + x
       ) AS rbo
FROM s_list, t_list, w
"""


@query("rbo_bm25_vs_tf", oracle=_RBO_ORACLE)
def rbo_bm25_vs_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p=0.9, depth 20) between the BM25 and raw
    term-frequency rankings of the fixed 3-term query — the
    ranking-agreement diagnostic that tells a retrieval pipeline
    whether its cheap ranker is a usable approximation of its good
    one. Both rankings are distributed TakeOrdered top-20s; the RBO
    itself is in-row array algebra on one collected pair of bounded
    lists."""
    docs = Catalog(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    toks = docs.repartition(par, "doc_id").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfx = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("tot").cast("double") / F.col("n_docs").cast("double")
    idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    s_expr = idf * (
        tfd
        / (
            tfd
            + F.lit(_BM25_K1)
            * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * (dld / avgdl))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfx), "tok")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "tok", s_expr.alias("s"))
    )
    bm = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("tok"), F.col("s").alias("v")))
            ),
            F.lit(0.0),
            lambda acc, c: acc + c["v"],
        ).alias("raw")
    )
    tfsum = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("tfs"))
    s_top = (
        bm.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(_RBO_K)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(-F.col("raw"), F.col("doc_id")))
            ).alias("sl")
        )
        .select(F.transform("sl", lambda c: c["doc_id"]).alias("s"))
    )
    t_top = (
        tfsum.orderBy(F.desc("tfs"), F.asc("doc_id"))
        .limit(_RBO_K)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(-F.col("tfs"), F.col("doc_id")))
            ).alias("tl")
        )
        .select(F.transform("tl", lambda c: c["doc_id"]).alias("t"))
    )
    wts = F.array(*[F.lit(x) for x in _RBO_WEIGHTS])
    s_col, t_col = F.col("s"), F.col("t")
    rbo = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(_RBO_K)),
            lambda d: F.element_at(wts, d)
            * F.size(
                F.array_intersect(
                    F.slice(s_col, 1, d), F.slice(t_col, 1, d)
                )
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return s_top.crossJoin(t_top).select(
        F.lit(_RBO_K).cast("int").alias("depth"),
        F.lit(_RBO_P).cast("double").alias("persistence"),
        F.size(F.array_intersect(s_col, t_col)).cast("long").alias(
            "n_common_topk"
        ),
        rbo.alias("rbo"),
    )


# ---- token-count histogram (log2 buckets) ------------------------------------

# The sequence-length profile every pretraining pipeline reads before
# picking pack/chunk sizes: documents bucketed by floor(log2(tokens)),
# with per-bucket doc count, token mass, and the share of total
# tokens. Buckets are integer powers of two (1-1, 2-3, 4-7, ...), so
# bucket assignment is exact integer math on both engines; shares are
# exact-integer ratios divided once at the output boundary.
_TOKHIST_ORACLE = """
WITH t AS (
    SELECT CAST(len(str_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_tokens
    FROM documents
),
b AS (
    SELECT CAST(floor(log2(n_tokens)) AS BIGINT) AS bucket_log2,
           n_tokens
    FROM t WHERE n_tokens > 0
),
g AS (
    SELECT bucket_log2,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM b GROUP BY bucket_log2
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS grand FROM b)
SELECT bucket_log2,
       CAST(pow(2, bucket_log2) AS BIGINT) AS bucket_min_tokens,
       n_docs, total_tokens,
       CAST(total_tokens AS DOUBLE) / CAST(grand AS DOUBLE) AS token_share
FROM g, tot ORDER BY bucket_log2
"""


@query("tokens_per_doc_histogram", oracle=_TOKHIST_ORACLE)
def tokens_per_doc_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed token-count histogram over the corpus — the
    sequence-length profile read before choosing chunk/pack sizes
    (complements `pack_sequences_512` / `chunk_documents_64_16`).

    Shape: one linear pass (token count is ``size(split(...))``, no
    explode — the count never materializes the token array beyond the
    row), a ≤64-bucket grouped aggregate with map-side combine, and
    one broadcast of the 1-row grand total. floor(log2(n)) on a
    positive long is exact in double (n < 2^53), so bucketing is
    engine-identical."""
    from climate_anomaly_bigdata_pipeline_spark.operators.text import (
        tokens_expr,
    )

    docs = Catalog(spark, sf_dir).documents
    t = docs.select(F.size(tokens_expr("text")).cast("long").alias("n_tokens"))
    b = t.filter(F.col("n_tokens") > 0).select(
        F.floor(F.log2("n_tokens")).cast("long").alias("bucket_log2"),
        "n_tokens",
    )
    g = b.groupBy("bucket_log2").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    tot = b.agg(F.sum("n_tokens").cast("long").alias("grand"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "bucket_log2",
            F.pow(F.lit(2.0), F.col("bucket_log2"))
            .cast("long")
            .alias("bucket_min_tokens"),
            "n_docs",
            "total_tokens",
            (
                F.col("total_tokens").cast("double")
                / F.col("grand").cast("double")
            ).alias("token_share"),
        )
        .orderBy("bucket_log2")
    )


# ---- Dirichlet-smoothed query-likelihood retrieval -----------------------------

# The other classic lexical scorer beside BM25 (Zhai & Lafferty 2001,
# public): score(q,d) = Σ_t ln((tf(t,d) + μ·p(t|C)) / (dl_d + μ)),
# with p(t|C) the COLLECTION frequency ratio (not document frequency —
# the LM/BM25 modeling difference this query exists to exercise) and
# μ ≈ the corpus's average document length (2000 is the web-track
# default; this corpus's ~50-token docs want μ of the same order as
# dl). Unlike BM25, absent terms still contribute (the smoothed
# background mass), so the score table is docs × |q| built by a
# 3-row-literal cross join with a LEFT join onto the tf table — at
# 100 TB that is |q| broadcast copies of the doc-length table, not a
# corpus blowup. Per-doc fold in sorted term order (bit-exact), ln
# under the standing round(6), top-k by the raw unrounded score with
# a doc_id tiebreak — the bm25_topk_docs posture throughout.
_DIR_MU = 50.0

_DIRICHLET_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM toks),
cf AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS cf
    FROM toks WHERE tok IN {str(tuple(_BM25_TERMS))}
    GROUP BY tok
),
tf AS (
    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
    FROM toks WHERE tok IN {str(tuple(_BM25_TERMS))}
    GROUP BY doc_id, tok
),
q AS (SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}) AS v(tok)),
scored AS (
    SELECT dl.doc_id, q.tok,
           ln((CAST(coalesce(tf.tf, 0) AS DOUBLE)
               + {_DIR_MU!r} * (CAST(cf.cf AS DOUBLE) / CAST(st.tot AS DOUBLE)))
              / (CAST(dl.dl AS DOUBLE) + {_DIR_MU!r})) AS s
    FROM dl
    CROSS JOIN q
    JOIN cf ON cf.tok = q.tok
    CROSS JOIN st
    LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.tok = q.tok
),
agg AS (
    SELECT doc_id,
           list_reduce(list(s ORDER BY tok), (a, x) -> a + x) AS raw
    FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(round(raw, 6) AS DOUBLE) AS ql_score
FROM agg
ORDER BY raw DESC, doc_id
LIMIT {_BM25_K}
"""


@query("dirichlet_lm_topk_docs", oracle=_DIRICHLET_ORACLE)
def dirichlet_lm_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-20 for the shared 3-term
    query (see the comment block) — the language-model scorer beside
    BM25, with the absent-term background mass BM25 has no analogue
    for."""
    docs = Catalog(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    # Four consumers read the exploded token stream (dl, the corpus
    # total, and the cf/tf hit branches) — checkpoint it once so the
    # documents scan + regex split + explode run once instead of four
    # times (ADVICE r11; the lineage-truncation posture the graph
    # operators use for multiply-consumed intermediates).
    toks = (
        docs.repartition(par, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok"),
        )
        .localCheckpoint()
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    st = toks.agg(F.count(F.lit(1)).cast("long").alias("tot"))
    hits = toks.filter(F.col("tok").isin(*_BM25_TERMS))
    cf = hits.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    tf = hits.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    q = spark.createDataFrame([(t,) for t in _BM25_TERMS], "tok string")
    s = F.log(
        (
            F.coalesce(F.col("tf"), F.lit(0)).cast("double")
            + F.lit(_DIR_MU)
            * (F.col("cf").cast("double") / F.col("tot").cast("double"))
        )
        / (F.col("dl").cast("double") + F.lit(_DIR_MU))
    )
    scored = (
        dl.crossJoin(F.broadcast(q))
        .join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(st))
        .join(tf, ["doc_id", "tok"], "left")
        .select("doc_id", "tok", s.alias("s"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("tok"), F.col("s").alias("v")))
            ),
            F.lit(0.0),
            lambda acc, c: acc + c["v"],
        ).alias("raw")
    )
    return (
        agg.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(_BM25_K)
        .select("doc_id", F.round("raw", 6).cast("double").alias("ql_score"))
    )


# ---- retrieval scorer shootout: BM25 vs Dirichlet QL vs hybrid RRF ------------

# The eval contract ACROSS scorers (VERDICT r11 #6 — the tuning-curve
# pattern of ivf_recall_vs_nprobe applied to retrieval): the same
# fixed query set and corpus-derived qrels as retrieval_eval_ndcg,
# scored by (a) the BM25 tf-saturation ranker, (b) the Dirichlet
# query-likelihood ranker, and (c) their reciprocal-rank fusion
# (RRF, Cormack et al. 2009, constant 60) — one row per scorer with
# the MEAN nDCG@10 / MRR / P@10 over the query terms, so "which
# scorer wins on this corpus" is a driver-checked number. Candidate
# sets are the term posting lists on both engines (the serving
# reality — Dirichlet's background-only docs are out of candidate
# range by construction here). Float parity: ranking keys are
# pure-IEEE ratios (BM25's idf-free saturation, Dirichlet's pre-log
# ratio — log is monotone so ranks are unchanged), RRF sums two
# exact-double reciprocals of small integers, and every DCG/mean fold
# runs in pinned order; only the three means are rounded(6).
_RRF_C = 60.0


def _scorer_shootout_oracle() -> str:
    nt = len(_BM25_TERMS)
    return rf"""
WITH toks AS (
    SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
    FROM dl
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM toks WHERE tok IN {str(tuple(_BM25_TERMS))}
    GROUP BY doc_id, tok
),
cf AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY tok),
cand AS (
    SELECT tf.doc_id, tf.tok, tf.tf,
           CAST(tf.tf AS DOUBLE)
              / (CAST(tf.tf AS DOUBLE)
                 + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                       / (CAST(st.tot AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))
               AS m_bm,
           (CAST(tf.tf AS DOUBLE)
              + {_DIR_MU!r} * (CAST(cf.cf AS DOUBLE) / CAST(st.tot AS DOUBLE)))
              / (CAST(dl.dl AS DOUBLE) + {_DIR_MU!r}) AS m_dir
    FROM tf
    JOIN dl ON tf.doc_id = dl.doc_id
    JOIN cf ON cf.tok = tf.tok
    CROSS JOIN st
),
rnks AS (
    SELECT doc_id, tok, tf,
           CAST(row_number() OVER (
               PARTITION BY tok ORDER BY m_bm DESC, doc_id
           ) AS BIGINT) AS r_bm,
           CAST(row_number() OVER (
               PARTITION BY tok ORDER BY m_dir DESC, doc_id
           ) AS BIGINT) AS r_dir
    FROM cand
),
runs AS (
    SELECT 'bm25' AS scorer, tok, tf, r_bm AS rnk FROM rnks
    UNION ALL
    SELECT 'dirichlet_ql', tok, tf, r_dir FROM rnks
    UNION ALL
    SELECT 'hybrid_rrf', tok, tf,
           CAST(row_number() OVER (
               PARTITION BY tok
               ORDER BY 1.0 / ({_RRF_C!r} + CAST(r_bm AS DOUBLE))
                        + 1.0 / ({_RRF_C!r} + CAST(r_dir AS DOUBLE)) DESC,
                        doc_id
           ) AS BIGINT) AS rnk
    FROM rnks
),
disc AS (SELECT * FROM (VALUES {_NDCG_DISC_VALUES}) AS v(rnk, wt)),
dcg AS (
    SELECT r.scorer, r.tok,
           list_reduce(
               list(CAST(r.tf AS DOUBLE) * d.wt ORDER BY r.rnk),
               (a, x) -> a + x
           ) AS dcg,
           COALESCE(
               CAST(1.0 AS DOUBLE)
                   / min(r.rnk) FILTER (WHERE r.tf >= {_REL_MIN}),
               CAST(0.0 AS DOUBLE)
           ) AS mrr,
           CAST(count(*) FILTER (WHERE r.tf >= {_REL_MIN}) AS DOUBLE)
               / CAST({_NDCG_K}.0 AS DOUBLE) AS p_at_10
    FROM runs r JOIN disc d ON d.rnk = r.rnk
    WHERE r.rnk <= {_NDCG_K}
    GROUP BY r.scorer, r.tok
),
ideal AS (
    SELECT tok, tf,
           CAST(row_number() OVER (
               PARTITION BY tok ORDER BY tf DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM tf
    QUALIFY rnk <= {_NDCG_K}
),
idcg AS (
    SELECT i.tok,
           list_reduce(
               list(CAST(i.tf AS DOUBLE) * d.wt ORDER BY i.rnk),
               (a, x) -> a + x
           ) AS idcg
    FROM ideal i JOIN disc d ON d.rnk = i.rnk
    GROUP BY i.tok
),
per AS (
    SELECT d.scorer, d.tok, d.dcg / i.idcg AS ndcg, d.mrr, d.p_at_10
    FROM dcg d JOIN idcg i ON i.tok = d.tok
)
SELECT scorer,
       round(list_reduce(list(ndcg ORDER BY tok), (a, x) -> a + x)
             / {float(nt)!r}, 6) AS mean_ndcg10,
       round(list_reduce(list(mrr ORDER BY tok), (a, x) -> a + x)
             / {float(nt)!r}, 6) AS mean_mrr,
       round(list_reduce(list(p_at_10 ORDER BY tok), (a, x) -> a + x)
             / {float(nt)!r}, 6) AS mean_p_at_10
FROM per
GROUP BY scorer
ORDER BY scorer
"""


@query("retrieval_scorer_shootout", oracle=_scorer_shootout_oracle())
def retrieval_scorer_shootout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean nDCG@10 / MRR / P@10 of BM25, Dirichlet QL, and their RRF
    fusion over the shared query set (see the comment block) — the
    which-scorer-wins row of the retrieval family."""
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    # one exploded token pass feeds dl / totals / cf / tf (the
    # dirichlet_lm_topk_docs checkpoint posture)
    toks = (
        docs.repartition(par, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok"),
        )
        .localCheckpoint()
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cf = tf.groupBy("tok").agg(F.sum("tf").cast("long").alias("cf"))
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("tot").cast("double") / F.col("n_docs").cast("double")
    m_bm = tfd / (
        tfd
        + F.lit(_BM25_K1)
        * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * (dld / avgdl))
    )
    m_dir = (
        tfd + F.lit(_DIR_MU) * (F.col("cf").cast("double") / F.col("tot").cast("double"))
    ) / (dld + F.lit(_DIR_MU))
    cand = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "tok", "tf", m_bm.alias("m_bm"), m_dir.alias("m_dir"))
    )
    w_bm = Window.partitionBy("tok").orderBy(F.desc("m_bm"), F.asc("doc_id"))
    w_dir = Window.partitionBy("tok").orderBy(F.desc("m_dir"), F.asc("doc_id"))
    rnks = cand.select(
        "doc_id",
        "tok",
        "tf",
        F.row_number().over(w_bm).cast("long").alias("r_bm"),
        F.row_number().over(w_dir).cast("long").alias("r_dir"),
    ).localCheckpoint()
    rrf_key = F.lit(1.0) / (F.lit(_RRF_C) + F.col("r_bm").cast("double")) + F.lit(
        1.0
    ) / (F.lit(_RRF_C) + F.col("r_dir").cast("double"))
    w_rrf = Window.partitionBy("tok").orderBy(rrf_key.desc(), F.asc("doc_id"))
    runs = (
        rnks.select(
            F.lit("bm25").alias("scorer"), "tok", "tf", F.col("r_bm").alias("rnk")
        )
        .unionAll(
            rnks.select(
                F.lit("dirichlet_ql").alias("scorer"),
                "tok",
                "tf",
                F.col("r_dir").alias("rnk"),
            )
        )
        .unionAll(
            rnks.select(
                F.lit("hybrid_rrf").alias("scorer"),
                "tok",
                "tf",
                F.row_number().over(w_rrf).cast("long").alias("rnk"),
            )
        )
    )
    disc = F.array(*[F.lit(w) for w in _DCG_W])
    top = runs.filter(F.col("rnk") <= _NDCG_K).select(
        "scorer",
        "tok",
        "rnk",
        "tf",
        (
            F.col("tf").cast("double")
            * F.element_at(disc, F.col("rnk").cast("int"))
        ).alias("g"),
    )
    dcg = top.groupBy("scorer", "tok").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rnk", F.col("g").alias("v")))),
            F.lit(0.0),
            lambda a, c: a + c["v"],
        ).alias("dcg"),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("tf") >= _REL_MIN, F.col("rnk"))),
            F.lit(0.0),
        ).alias("mrr"),
        (
            F.count(F.when(F.col("tf") >= _REL_MIN, F.lit(1))).cast("double")
            / F.lit(float(_NDCG_K))
        ).alias("p_at_10"),
    )
    w_ideal = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc("doc_id"))
    idcg = (
        tf.withColumn("rnk", F.row_number().over(w_ideal).cast("long"))
        .filter(F.col("rnk") <= _NDCG_K)
        .select(
            "tok",
            "rnk",
            (
                F.col("tf").cast("double")
                * F.element_at(disc, F.col("rnk").cast("int"))
            ).alias("g"),
        )
        .groupBy("tok")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("rnk", F.col("g").alias("v")))
                ),
                F.lit(0.0),
                lambda a, c: a + c["v"],
            ).alias("idcg")
        )
    )
    nt = F.lit(float(len(_BM25_TERMS)))
    per = dcg.join(F.broadcast(idcg), "tok").select(
        "scorer", "tok", (F.col("dcg") / F.col("idcg")).alias("ndcg"), "mrr", "p_at_10"
    )

    def mean_fold(col: str):
        return F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("tok", F.col(col).alias("v")))
                ),
                F.lit(0.0),
                lambda a, c: a + c["v"],
            )
            / nt,
            6,
        )

    return (
        per.groupBy("scorer")
        .agg(
            mean_fold("ndcg").alias("mean_ndcg10"),
            mean_fold("mrr").alias("mean_mrr"),
            mean_fold("p_at_10").alias("mean_p_at_10"),
        )
        .orderBy("scorer")
    )


# ---- TextRank keyword extraction -----------------------------------------------

# Graph-based keyword extraction (Mihalcea & Tarau 2004, public):
# content words (lowercase alpha, length >= 4, corpus frequency >= 5)
# are nodes; adjacent-token co-occurrences are undirected weighted
# edges; the WEIGHTED PageRank s_i = (1-d) + d * SUM_j (w_ji / wdeg_j)
# * s_j (classic TextRank form: constant teleport, init 1.0) ranks
# the corpus keywords. The iteration is the pagerank recipe verbatim:
# DECIMAL(30,18) contribution sums (order-independent), double
# damping arithmetic, unrolled bit-identical in the oracle, round(10)
# output guard, top-20 by (score desc, term). Scale shape: bigrams
# are built IN-ROW (transform over the token array, no self-join on
# position), the vocab filter broadcasts, and each iteration is one
# equi-join + keyed sum on the word graph — vocabulary-sized, tiny
# relative to the corpus at any scale.
_TR_DAMPING = 0.85
_TR_ITERS = 6
_TR_TOPK = 20
_TR_MIN_FREQ = 5


def _textrank_oracle() -> str:
    d = _TR_DAMPING
    ctes = [
        rf"""toks AS (
    SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS ts
    FROM documents
),
uni AS (
    SELECT unnest(ts) AS term, doc_id FROM toks
),
vocab AS (
    SELECT term FROM uni
    WHERE regexp_full_match(term, '[a-z]{{4,}}')
    GROUP BY term HAVING count(*) >= {_TR_MIN_FREQ}
),
big AS (
    SELECT t.a, t.b FROM (
        SELECT unnest(list_transform(
            generate_series(1, len(ts) - 1),
            i -> struct_pack(a := ts[i], b := ts[i + 1])
        )) AS t
        FROM toks WHERE len(ts) >= 2
    )
    WHERE t.a <> t.b
),
we AS (
    SELECT least(a, b) AS u, greatest(a, b) AS v,
           CAST(count(*) AS BIGINT) AS w
    FROM big
    WHERE a IN (SELECT term FROM vocab) AND b IN (SELECT term FROM vocab)
    GROUP BY 1, 2
),
ed AS (
    SELECT u AS src, v AS dst, w FROM we
    UNION ALL SELECT v, u, w FROM we
),
wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wd FROM ed GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM ed),
s0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)"""
    ]
    for i in range(1, _TR_ITERS + 1):
        ctes.append(
            f"""s{i} AS (
    SELECT nodes.node,
           (1 - {d}) + {d} * COALESCE(CAST(s.s AS DOUBLE), 0.0) AS rank
    FROM nodes LEFT JOIN (
        SELECT e.dst AS node,
               sum(CAST(r.rank * e.w / wd.wd AS DECIMAL(30,18))) AS s
        FROM ed e
        JOIN s{i - 1} r ON r.node = e.src
        JOIN wdeg wd ON wd.src = e.src
        GROUP BY e.dst
    ) s ON s.node = nodes.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node AS term,
       CAST(round(CAST(CAST(rank AS VARCHAR) AS DECIMAL(38,18)), 10)
            AS DOUBLE) AS score
FROM s{_TR_ITERS}
ORDER BY score DESC, term
LIMIT {_TR_TOPK}"""
    )


@query("textrank_keywords", oracle=_textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by weighted TextRank over the
    adjacent-token co-occurrence graph (see the comment block)."""
    docs = Catalog(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    toks = docs.repartition(par, "doc_id").select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ts"),
    )
    vocab = (
        toks.select(F.explode("ts").alias("term"))
        .filter(F.col("term").rlike(r"^[a-z]{4,}$"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TR_MIN_FREQ)
        .select("term")
        .localCheckpoint()
    )
    big = (
        toks.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at("ts", i.cast("int")).alias("a"),
                        F.element_at("ts", (i + 1).cast("int")).alias("b"),
                    ),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    we = (
        big.join(F.broadcast(vocab.withColumnRenamed("term", "a")), "a")
        .join(F.broadcast(vocab.withColumnRenamed("term", "b")), "b")
        .select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ed = (
        we.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(
            we.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
        )
    )
    wdeg = ed.groupBy("src").agg(F.sum("w").cast("long").alias("wd"))
    ed = ed.join(wdeg, "src").localCheckpoint()
    nodes = ed.select(F.col("src").alias("node")).distinct().localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    base = 1.0 - _TR_DAMPING
    for _ in range(_TR_ITERS):
        r = F.broadcast(ranks.withColumnRenamed("node", "src"))
        contrib = (
            ed.join(r, "src")
            .select(
                "dst",
                (F.col("rank") * F.col("w") / F.col("wd"))
                .cast("decimal(30,18)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(_TR_DAMPING)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select(
            F.col("node").alias("term"),
            F.round(F.col("rank"), 10).alias("score"),
        )
        .orderBy(F.col("score").desc(), "term")
        .limit(_TR_TOPK)
    )
