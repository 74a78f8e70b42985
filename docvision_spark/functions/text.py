"""Text-analysis operators over a documents table — 100% built-in
pyspark.sql.functions (JVM-side, whole-stage codegen; no Python in the hot
path). Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql().

Capability ancestors in the reference: metadata projection
(core/parser.py:184-190) and the empty-content filter (core/parser.py:358-359);
the quality/language features extend them to training-data curation needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed per-language stopword lists (must stay in sync with the SQL
# oracles in __spark_entry__.py — the lists are the spec).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "was", "for", "with", "on"),
    "id": ("dan", "yang", "di", "ke", "dari", "untuk", "dengan", "pada", "adalah", "ini"),
    "es": ("el", "la", "los", "las", "de", "en", "es", "por", "con", "para"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "im"),
    "fr": ("le", "les", "des", "du", "et", "est", "une", "dans", "qui", "pour"),
}


# CJK unified ideographs (U+4E00..U+9FFF, same range as cjk_chars). An
# unsegmented zh document is ONE whitespace token, which degenerates every
# token-based feature (round-2 verdict); spacing each ideograph out first
# makes one CJK char = one token — the standard char-level fallback for
# unsegmented scripts, twin-able in DuckDB with the same regex.
_CJK = "一-鿿"


def cjk_spaced(col: Column) -> Column:
    """Insert spaces around each CJK ideograph (identity on non-CJK text)."""
    return F.regexp_replace(col, f"([{_CJK}])", " $1 ")


def cjk_spaced_sql(col: str) -> str:
    """DuckDB twin of cjk_spaced (RE2 backref syntax, explicit 'g')."""
    return f"regexp_replace({col}, '([{_CJK}])', ' \\1 ', 'g')"


def tokens(col: Column) -> Column:
    """Whitespace tokens, one token per CJK ideograph; empty string ->
    empty array (not [''])."""
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(cjk_spaced(col)), r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style subword segmentation, restricted to constructs whose matching
# semantics are IDENTICAL in Java regex (Spark) and RE2 (DuckDB): ordered
# alternation, no lookarounds. Contractions split off, letter runs, digit
# runs capped at 3 (BPE numeric chunking), CJK one-char-per-token, then a
# punctuation-run catch-all.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]{1,3}|[一-鿿]|[^a-zA-Z0-9\s]+"


def bpe_token_estimate(col: Column) -> Column:
    """Approximate LLM token count: number of BPE_PATTERN matches.
    Expression-only (regexp_count is JVM-side, codegen'd) — the cheap
    pre-tokenizer pass a training-data pipeline runs on every document."""
    return F.regexp_count(col, F.lit(BPE_PATTERN))


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of tokens (lowercased) that are in lang's stopword list."""
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(*words)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    toks = token_count(c)
    return (
        df.withColumn("n_tokens", toks)
          .withColumn("n_chars_txt", F.length(c))
          .withColumn(
              "avg_token_len",
              F.round(
                  F.when(toks > 0,
                         F.length(F.regexp_replace(c, r"\s+", "")) / toks)
                  .otherwise(F.lit(0.0)), 4))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features + a composite score.

    Score is a fixed integer rubric (0-100) so cross-engine float drift can't
    change it: +40 length in [200, 20000]; +20 avg token len in [3, 12];
    +20 punct ratio in (0, 8] per 100 chars; +20 stopword ratio >= 10%.
    """
    c = F.col(text_col)
    toks = token_count(c)
    n_chars = F.length(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    all_stop = None
    for lang in sorted(LANG_STOPWORDS):
        h = stopword_hits(c, lang)
        all_stop = h if all_stop is None else all_stop + h
    df = (
        df.withColumn("n_tokens", toks)
          .withColumn("n_chars_txt", n_chars)
          .withColumn("n_punct", punct)
          .withColumn("n_stopwords", all_stop)
    )
    score = (
        F.when((F.col("n_chars_txt") >= 200) & (F.col("n_chars_txt") <= 20000), 40).otherwise(0)
        + F.when(
            (F.col("n_tokens") > 0)
            & (F.col("n_chars_txt") - F.col("n_tokens") + 1 >= 3 * F.col("n_tokens"))
            & (F.col("n_chars_txt") <= 13 * F.col("n_tokens")), 20).otherwise(0)
        + F.when((F.col("n_punct") > 0) & (F.col("n_punct") * 100 <= F.col("n_chars_txt") * 8), 20).otherwise(0)
        + F.when(F.col("n_stopwords") * 10 >= F.col("n_tokens"), 20).otherwise(0)
    )
    return df.withColumn("quality_score", score)


def repetition_ratio(col: Column, k: int = 3) -> Column:
    """Repeated-k-gram fraction: 1 - distinct/total word k-grams, as an
    integer pair (n_grams, n_distinct) folded to a 4dp ratio. High values
    flag boilerplate/spam/template pages — a standard LLM-corpus quality
    signal (e.g. Gopher rules' repetition filters). Expression-only."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(F.sequence(F.lit(0), n - F.lit(k)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.round(F.when(total > 0, (total - distinct) / total)
                    .otherwise(F.lit(0.0)), 4)


def hash_sample(col: Column, hex_chars: tuple[str, ...]) -> Column:
    """Deterministic, engine-portable sampling predicate: keep a row when
    the first hex digit of md5(col) is in hex_chars (rate = len/16). Unlike
    rand()/sampleBy this is reproducible across engines, runs, and
    partitionings — the property a training-mix pipeline needs so a sample
    is re-derivable from the corpus alone."""
    return F.substring(F.md5(col.cast("string")), 1, 1).isin(*hex_chars)


def chunk_tokens(col: Column, chunk_size: int = 128) -> Column:
    """Split a document into fixed-size whitespace-token windows (the
    pre-tokenization chunking step of a training pipeline): array of
    chunk strings, each <= chunk_size tokens, in document order, no
    overlap. Empty/whitespace docs -> empty array. Expression-only."""
    def over(toks: Column) -> Column:
        n = F.size(toks)
        n_chunks = F.ceil(n / F.lit(chunk_size)).cast("int")
        return F.when(n == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * chunk_size + 1, chunk_size)),
            ))
    from docvision_spark.functions.dedup import let_  # local import: no cycle at module load
    return let_(tokens(col), over)


def explode_chunks(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", chunk_size: int = 128) -> DataFrame:
    """One row per (doc, chunk_no) — posexplode keeps document order."""
    return df.select(
        F.col(id_col),
        F.posexplode(chunk_tokens(F.col(text_col), chunk_size))
         .alias("chunk_no", "chunk"))


# PII patterns — constructs with identical Java-regex/RE2 semantics (no
# lookarounds, no backrefs). Deliberately conservative: a training scrub
# prefers false positives (over-redaction) to leaks.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (expression-only)."""
    return {kind: F.regexp_count(col, F.lit(pat))
            for kind, pat in PII_PATTERNS.items()}


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder token (Dolma-style
    scrub). Order fixed (email -> phone -> ipv4) so outputs are stable."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<<{kind.upper()}>>")
    return out


def cjk_chars(col: Column) -> Column:
    """Count of CJK-unified-ideograph codepoints (U+4E00..U+9FFF)."""
    return F.length(F.regexp_replace(col, "[^一-鿿]", ""))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free language ID: argmax of per-language stopword hits, ties
    broken by language code ascending (deterministic). Chinese has no
    useful stopword tokenization (no spaces), so zh is detected first by
    CJK codepoint ratio: >=20% of non-space chars in U+4E00..U+9FFF
    (integer cross-multiply, no float)."""
    c = F.col(text_col)
    langs = sorted(LANG_STOPWORDS)
    for lang in langs:
        df = df.withColumn(f"hits_{lang}", stopword_hits(c, lang))
    best = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    cjk = cjk_chars(c)
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    is_zh = (cjk > 0) & (cjk * 5 >= nonspace)
    return (
        df.withColumn(
            "lang_pred",
            F.when(is_zh, F.lit("zh"))
             .when(best_hits > 0, best).otherwise(F.lit("und")))
          .withColumn("lang_conf_hits", F.when(is_zh, cjk).otherwise(best_hits))
    )


def normalized(col: Column) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, each CJK
    ideograph spaced into its own token, collapsed whitespace, trimmed.
    Byte-identical to the pre-CJK form on non-CJK text (the whole test
    corpus), so non-zh fingerprints are unchanged; zh docs now shingle and
    simhash at char granularity instead of as one giant token."""
    return F.trim(F.regexp_replace(cjk_spaced(F.lower(col)), r"\s+", " "))


def fingerprint_md5(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text (md5 exists in both
    Spark and DuckDB with identical output — crc32 does not)."""
    return F.md5(normalized(col))


def doc_pack_bins(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", budget: int = 2048,
                  partitions: int | None = None) -> DataFrame:
    """GPT-style sequence packing at the document level: documents are
    concatenated into one global token stream in id order and split every
    `budget` tokens; each document is assigned the bin where it STARTS.
    Returns (id, n_tokens, bin).

    Scale shape — a DISTRIBUTED prefix sum, because the naive
    `sum().over(Window.orderBy(id))` collapses 10^12 rows onto ONE
    partition: (1) range-partition by id + sort within partitions,
    localCheckpointed so both passes see the identical layout;
    (2) per-partition token totals to the driver (one long per
    partition); (3) exclusive prefix offsets broadcast back;
    (4) per-partition cumulative sum + offset (order carried across
    Arrow batches) -> absolute stream offset -> bin = offset div budget.
    The result is a pure function of the global id order — partition
    boundaries cannot change it."""
    from typing import Iterator as _It

    import pandas as pd

    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    d = (df.select(F.col(id_col).alias("_id"),
                   token_count(F.col(text_col)).alias("_n"))
           .repartitionByRange(n_parts, "_id")
           .sortWithinPartitions("_id")
           .localCheckpoint())

    def totals(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        t = 0
        for pdf in it:
            t += int(pdf["_n"].sum())
        yield pd.DataFrame([{"pid": pid, "total": t}])

    part_totals = {r["pid"]: r["total"]
                   for r in d.mapInPandas(totals,
                                          "pid int, total long").collect()}
    acc = 0
    offsets = {}
    for pid in range(max(part_totals, default=-1) + 1):
        offsets[pid] = acc
        acc += part_totals.get(pid, 0)
    b_off = spark.sparkContext.broadcast(offsets)

    def assign(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        start = b_off.value.get(pid, 0)
        for pdf in it:
            before = start + pdf["_n"].cumsum() - pdf["_n"]
            yield pd.DataFrame({
                "_id": pdf["_id"], "n_tokens": pdf["_n"],
                "bin": (before // budget).astype("int64")})
            start += int(pdf["_n"].sum())

    out = d.mapInPandas(assign, f"_id {df.schema[id_col].dataType.simpleString()}, "
                                "n_tokens long, bin long")
    return out.withColumnRenamed("_id", id_col)


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    top_k: int = 50000) -> dict:
    """Corpus-trained bigram language model (the CCNet quality filter's
    shape: a small fixed-size LM scores every document; CommonCrawl-scale
    pipelines rank/bucket docs by LM perplexity before training).

    Training is two partial-aggregated counts — bigrams (with a <s> BOS
    token) and unigram context totals — pruned to the top_k most frequent
    entries with a DETERMINISTIC tiebreak (count desc, key asc), then
    collected: the model is configuration-sized by construction, exactly
    what gets broadcast at 100 TB. Returns {"bigrams": {(w1, w2): c},
    "context": {w1: c}, "vocab": V}."""
    toks = tokens(F.col(text_col))
    grams = (df.select(F.explode(
                F.zip_with(
                    F.concat(F.array(F.lit("<s>")), toks),
                    F.concat(toks, F.array(F.lit("</s>"))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
             .alias("g"))
             .select("g.w1", "g.w2"))
    big = (grams.groupBy("w1", "w2").count()
                .orderBy(F.desc("count"), "w1", "w2").limit(top_k).collect())
    ctx = (grams.groupBy("w1").count()
                .orderBy(F.desc("count"), "w1").limit(top_k).collect())
    vocab = grams.select("w2").distinct().count()
    return {"bigrams": {(r["w1"], r["w2"]): r["count"] for r in big},
            "context": {r["w1"]: r["count"] for r in ctx},
            "vocab": int(vocab) + 1}


def lm_score(df: DataFrame, lm: dict,
             text_col: str = "text") -> DataFrame:
    """Per-document LM negative-log-likelihood in INTEGER MILLIBITS:
    each token contributes round(-1000 * log2((c(w1,w2)+1)/(c(w1)+V)))
    (add-one smoothing; unseen contexts fall back to c=0), summed as
    int64 — so the total is exact and independent of partitioning /
    summation order, unlike a float sum. Output: (id, n_tokens,
    total_millibits, mb_per_token = total div (n+1) — the n+1 is the
    number of TRANSITIONS <s>->w1..wn-></s>, so the per-token number is a
    true per-transition mean and a 1-token doc is not half-counted).

    Scale shape: the model is a broadcast dict; tokenization stays in
    the JVM (the SAME tokens() expression training used); only the dict
    lookups + log2 run in the Arrow-batched python stage; and every
    OTHER input column passes THROUGH that stage, so callers filter on
    the score without a join-back shuffle of the big table."""
    import math
    from typing import Iterator as _It

    import pandas as pd

    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        {"b": lm["bigrams"], "c": lm["context"], "v": lm["vocab"]})
    passthrough = [c for c in df.columns]
    src = df.withColumn("_toks", tokens(F.col(text_col)))

    def fn(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        bg, cx, v = b.value["b"], b.value["c"], b.value["v"]
        log2 = math.log2
        for pdf in it:
            ns, totals, per = [], [], []
            for toks in pdf["_toks"]:
                seq = ["<s>", *toks, "</s>"]
                total = 0
                for w1, w2 in zip(seq, seq[1:]):
                    cb = bg.get((w1, w2), 0)
                    # the bigram and context tables are top-k pruned
                    # INDEPENDENTLY, so a surviving bigram can have a
                    # pruned (zero) context — clamp the denominator so
                    # p <= (cb+1)/(cb+V) < 1 and no transition can emit
                    # NEGATIVE millibits
                    cc = max(cx.get(w1, 0), cb)
                    total += round(-1000.0 * log2((cb + 1) / (cc + v)))
                n = len(toks)
                ns.append(n)
                totals.append(total)
                per.append(total // max(n + 1, 1))
            out = pdf[passthrough].copy()
            out["n_tokens"] = pd.Series(ns, index=pdf.index, dtype=object)
            out["total_millibits"] = pd.Series(totals, index=pdf.index,
                                               dtype=object)
            out["mb_per_token"] = pd.Series(per, index=pdf.index,
                                            dtype=object)
            yield out

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in df.schema.fields]
        + ["n_tokens int", "total_millibits long", "mb_per_token long"])
    return src.mapInPandas(fn, out_schema)
