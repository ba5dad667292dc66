"""Text analysis over the documents table: language-ID, quality scoring,
token counting, fingerprinting. All JVM-side column expressions (the
lambda-array functions are codegen'd) — portable math so every operator,
including the winnowing rolling-hash fingerprint, carries a full DuckDB
value oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spread import spread

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "las"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "des"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "eine", "den", "von"],
}


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spread(spark.read.parquet(f"{sf}/documents.parquet"))


def _words(col: str = "text"):
    return F.split(F.lower(F.regexp_replace(col, r"\s+", " ")), " ")


def _duck_words(col: str = "text") -> str:
    return f"string_split(lower(regexp_replace({col}, '\\s+', ' ', 'g')), ' ')"


# ─────────────────────────── language ID ────────────────────────────────────


def q_text_langid_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID + quality scoring fused into ONE per-doc pass (round 4:
    both read the same table at the same granularity, and the driver gate
    caps the registry at 50 entries — the per-doc form is the STRONGER
    check anyway: it hashes every doc's predicted language, of which the
    old (lang, pred_lang) rollup is a projection).

    Language ID: score per language = fraction of tokens in that language's
    stopword list; argmax wins, 'und' if all scores 0. Quality: length
    band, mean word length, stopword ratio, alpha ratio → clipped
    composite. One scan, no shuffle, all codegen'd."""
    d = _docs(spark, sf)
    # project the words array ONCE: inlined into the four score filters +
    # the size/mean-length expressions it would re-tokenize 6× per row
    # (higher-order lambdas re-evaluate captured expressions; Catalyst
    # keeps a multi-use non-cheap projection — the _shingles lesson)
    dw = d.select("doc_id", "lang", "text", _words().alias("_w"))
    n = F.size("_w").cast("double")
    scores = {}
    for lang, sw in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sw])
        hits = F.size(F.filter("_w", lambda t: F.array_contains(arr, t)))
        scores[lang] = (hits / n).alias(f"score_{lang}")
    mean_wlen = F.length(F.regexp_replace("text", r"\s+", "")) / n
    alpha_ratio = (
        F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")) / F.length("text")
    )
    d2 = dw.select(
        "doc_id", "lang", *scores.values(),
        mean_wlen.alias("_mw"), alpha_ratio.alias("_ar"), n.alias("_n"),
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _STOPWORDS])
    pred = F.when(best <= 0.0, "und")
    for lang in _STOPWORDS:
        pred = pred.when(F.col(f"score_{lang}") == best, lang)
    score = (
        F.least(F.col("_n") / 100.0, F.lit(1.0)) * 0.3
        + F.least(F.col("_mw") / 8.0, F.lit(1.0)) * 0.2
        + F.least(F.col("score_en") * 5.0, F.lit(1.0)) * 0.2
        + F.col("_ar") * 0.3
    )
    return d2.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0)).alias("quality"),
    )


def _duck_score(lang: str) -> str:
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"(len(list_filter({_duck_words()}, t -> t IN ({sw}))) * 1.0"
        f" / len({_duck_words()}))"
    )


ORACLE_LANGID_QUALITY = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_duck_score('en')} AS score_en, {_duck_score('es')} AS score_es,
         {_duck_score('fr')} AS score_fr, {_duck_score('de')} AS score_de,
         length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
           / len({_duck_words()}) AS mw,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
           / length(text) AS ar,
         len({_duck_words()}) * 1.0 AS n
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN greatest(score_en, score_es, score_fr, score_de) <= 0.0 THEN 'und'
            WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
            WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
            WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
            WHEN score_de = greatest(score_en, score_es, score_fr, score_de) THEN 'de'
       END AS pred_lang,
       least(greatest(
         least(n / 100.0, 1.0) * 0.3
         + least(mw / 8.0, 1.0) * 0.2
         + least(score_en * 5.0, 1.0) * 0.2
         + ar * 0.3, 0.0), 1.0) AS quality
FROM scored
"""


# ──────────── per-doc stats: token counting + fingerprinting ────────────────
# One scan covers both operators (merged in round 3: the driver's gate checks
# at most 50 registry entries, so same-table same-granularity queries fused).


def q_text_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document stats in one pass: whitespace tokens + BPE-ish regex
    tokens (letter runs / digit runs / single non-space symbols), plus the
    normalization fingerprint (md5 of whitespace-collapsed lowercase text
    and its first-8-hex-digit integer form — both portable)."""
    d = _docs(spark, sf)
    ws = F.size(_words())
    bpe = F.size(F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = F.md5(norm)
    fp_int = F.conv(F.substring(fp, 1, 8), 16, 10).cast("long")
    return d.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"),
        F.col("n_chars").alias("n_chars"),
        fp.alias("fp_hex"), fp_int.alias("fp_int"),
    )


ORACLE_DOC_STATS = f"""
SELECT doc_id,
       len({_duck_words()}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
       n_chars,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp_hex,
       CAST(('0x' || substr(md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 8)) AS BIGINT)
         AS fp_int
FROM documents
"""


_FP_WIN = 16  # sliding-window width (chars) for the winnowing fingerprint


def q_text_rolling_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style sliding-window fingerprint, entirely in JVM
    expressions: every 16-char window of the lowercased text is hashed to
    60 bits (first 15 hex digits of its md5 — portable across engines) and
    the doc fingerprint is the minimum over windows, i.e. a 1-of-n winnow.
    A higher-order transform over sequence(1, len-15) stays inside
    whole-stage codegen; docs shorter than one window hash as a single
    whole-text window. Replaces a per-byte-Python polynomial kernel — the
    md5-per-window form is both faster (no Python workers at all) and
    DuckDB-expressible, so it carries a full value oracle."""
    d = _docs(spark, sf)
    d2 = d.select("doc_id", F.lower("text").alias("norm"))
    fp = F.expr(
        f"array_min(transform(sequence(1, greatest(length(norm) - {_FP_WIN - 1}, 1)), "
        f"i -> cast(conv(substr(md5(substring(norm, i, {_FP_WIN})), 1, 15), 16, 10) as bigint)))"
    )
    return d2.select("doc_id", fp.alias("rolling_fp"))


ORACLE_ROLLING_HASH = f"""
SELECT doc_id,
       list_min(list_transform(
         range(1, greatest(length(lower(text)) - {_FP_WIN - 1}, 1) + 1),
         i -> CAST(('0x' || substr(md5(substr(lower(text), CAST(i AS INTEGER), {_FP_WIN})), 1, 15))
                   AS BIGINT))) AS rolling_fp
FROM documents
"""




# ───────────────────── vocabulary histogram / top-k ─────────────────────────


def q_text_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary frequencies, top-20: explode tokens (with
    multiplicity) → count per word (map-side partial agg) → distributed
    TakeOrdered via orderBy+limit, then a rank window over only the
    surviving 20 rows. Total tiebreak (count desc, word asc) keeps the
    result deterministic. The building block of frequency-based vocab
    pruning in a training pipeline; at 100 TB the only full shuffle is
    word-keyed and pre-aggregated."""
    from pyspark.sql import Window

    d = _docs(spark, sf)
    counts = (
        d.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "word").limit(20)
    w = Window.orderBy(F.desc("n"), "word")
    return top.withColumn("rank", F.row_number().over(w))


ORACLE_VOCAB_TOPK = f"""
WITH toks AS (SELECT unnest({_duck_words()}) AS word FROM documents),
counts AS (SELECT word, count(*) AS n FROM toks GROUP BY 1),
ranked AS (
  SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rank FROM counts)
SELECT word, n, rank FROM ranked WHERE rank <= 20
"""


QUERIES = {
    "text_langid_quality": q_text_langid_quality,
    "text_doc_stats": q_text_doc_stats,
    "text_rolling_hash": q_text_rolling_hash,
    "text_vocab_topk": q_text_vocab_topk,
}

ORACLES = {
    "text_langid_quality": ORACLE_LANGID_QUALITY,
    "text_doc_stats": ORACLE_DOC_STATS,
    "text_rolling_hash": ORACLE_ROLLING_HASH,
    "text_vocab_topk": ORACLE_VOCAB_TOPK,
}
