"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the 100 TB design):
 - exact: one hash-shuffle on a 32-char fingerprint — the cheapest possible
   dedup; fingerprint is computed JVM-side (md5 of normalized text).
 - MinHash+LSH: shingling and min-hashing are whole-stage-codegen expressions
   (higher-order functions over arrays + xxhash64) — NO Python. The only
   shuffles are the band-bucket groupBy and the candidate self-join, both on
   64-bit keys. Buckets with one member produce no candidates; a hot bucket
   (degenerate content, e.g. empty strings) is capped to bound the join.
 - SimHash: 64-bit signature via bit-bucket sums — expressions only; near-dup
   pairs found by banding the signature into 4x16-bit keys (Hamming<=3 within
   a band collision is probabilistic, like all SimHash deployments).
 - n-gram Jaccard: exact verification on candidate pairs only (never all
   pairs — that's O(n^2) and unrunnable at 10^12 docs).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from docvision_spark.functions.text import fingerprint_md5, normalized


def parallelize_input(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition an UNDERPARTITIONED input before a CPU-heavy projection.

    A small parquet table scans as a handful of splits (often one), which
    serializes signature/shingle computation on one core — a test-scale
    artifact. At 100 TB the input has orders of magnitude more splits than
    cores and this returns the input unchanged (no shuffle is ever added on
    a properly-partitioned table).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _threshold_ratio(threshold: float) -> tuple[int, int]:
    """Small exact rational for a jaccard threshold (0.8 -> 4/5).

    float.as_integer_ratio() would give the exact BINARY rational
    (0.8 -> 3602879701896397/4503599627370496), whose products overflow
    int64 for n_inter >= 2048 — a hard crash under Spark 4's default ANSI
    mode — and which also rejects pairs at exactly the intended threshold
    (4/5 < the binary value). limit_denominator keeps the comparison in
    small exact integers and matches the user's decimal intent."""
    f = Fraction(threshold).limit_denominator(1000)
    return f.numerator, f.denominator

# ----------------------------------------------------------------- exact --

def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per exact (normalized) content fingerprint.

    The fingerprint (3 regex passes + md5 over the full text) is computed
    in the map-side partial-agg stage — parallelize an under-split scan
    first or that entire pass runs on as few cores as the file has row
    groups (no-op on a properly-partitioned table)."""
    return (
        parallelize_input(df.select(id_col, text_col))
          .withColumn("fp", fingerprint_md5(F.col(text_col)))
          .groupBy("fp")
          .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fingerprints with more than one document (the duplicate report)."""
    return exact_dedup(df, id_col, text_col).filter(F.col("n_copies") > 1)


# --------------------------------------------------------------- shingles --

def let_(value: Column, body) -> Column:
    """Let-binding for higher-order-function expressions.

    A lambda that CAPTURES an expression tree (e.g. `norm.substr(i, k)` with
    norm = regexp_replace(...)) re-evaluates the captured tree on EVERY
    element — HOFs run interpreted, with no common-subexpression elimination
    (measured: char-5 shingling re-ran the normalize regexp ~2000x/row).
    Wrapping the value in a 1-element array and transforming over it binds
    the computed VALUE to the lambda variable, which is evaluated once.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct k-char shingles of the normalized text (expression-only:
    sequence + transform + substring + array_distinct)."""
    def over(norm: Column) -> Column:
        n = F.length(norm)
        return F.when(n < k, F.array(norm)).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - F.lit(k - 1)),
                    lambda i: norm.substr(i, F.lit(k)),
                )
            )
        )
    return let_(normalized(col), over)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (n-grams joined by a space)."""
    def over(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), n - F.lit(k)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
                )
            )
        )
    return let_(F.split(F.trim(normalized(col)), " "), over)


def word_shingle_hashes(col: Column, k: int = 3) -> Column:
    """Distinct 64-bit hashes of k-word shingles — no n-gram string is ever
    materialized (xxhash64 takes the k token columns directly). Jaccard over
    hash sets equals Jaccard over shingle sets up to 2^-64 collisions; at
    100 TB the saved string allocation/shuffle bytes dominate everything."""
    def over(toks: Column) -> Column:
        n = F.size(toks)
        def gram_hash(i: Column) -> Column:
            return F.xxhash64(*[F.element_at(toks, i + j) for j in range(1, k + 1)])
        return F.when(n < k, F.array(F.xxhash64(F.concat_ws(" ", toks)))).otherwise(
            F.array_distinct(
                F.transform(F.sequence(F.lit(0), n - F.lit(k)), gram_hash)
            )
        )
    return let_(F.split(F.trim(normalized(col)), " "), over)


# ---------------------------------------------------------------- minhash --

def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per hash-function j, min over shingles of
    xxhash64(j || shingle). Pure expressions -> whole-stage codegen."""
    def _minhash(j: int) -> Column:
        # NB: the lambda must take exactly ONE arg — a second parameter
        # (even defaulted) makes Spark bind the array index to it.
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(j), s)))

    return F.array(*[_minhash(j) for j in range(num_hashes)])


def minhash_signatures_agg(
    df: DataFrame, id_col: str, shingles_col: str, num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures via explode + single-pass multi-min aggregation.

    minhash_signature() is fine for one-off signatures, but inside a
    collapsed projection the shingling subtree gets inlined into all
    num_hashes expressions (regexp-normalize + substring fan-out recomputed
    num_hashes times). Here shingling is computed ONCE per document; the
    num_hashes mins ride one hash-aggregate with map-side partials — the
    shuffle carries num_hashes longs per doc, not the shingle sets.
    Returns (id, mh array<long>).
    """
    exploded = df.select(F.col(id_col).alias("id"),
                         F.explode(shingles_col).alias("s"))
    aggs = [F.min(F.xxhash64(F.lit(j), F.col("s"))).alias(f"m{j}")
            for j in range(num_hashes)]
    per_doc = exploded.groupBy("id").agg(*aggs)
    return per_doc.select(
        "id", F.array(*[F.col(f"m{j}") for j in range(num_hashes)]).alias("mh"))


def minhash_signatures_expr(
    df: DataFrame, id_col: str, shingles_col: str, num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures with ZERO shuffle: one aggregate() pass over the
    shingle array keeps a running-min accumulator of num_hashes longs —
    each shingle hashed num_hashes times inside the row projection, no
    explode, no groupBy. The shingle column is referenced exactly once, so
    projection collapse cannot re-inline the shingling subtree (the failure
    mode that motivated the explode+agg variant). Bit-exact with
    minhash_signatures_agg (parity-tested). Returns (id, mh array<long>)."""
    staged = df.select(F.col(id_col).alias("id"),
                       F.col(shingles_col).alias("_sh"))
    mh = F.expr(
        f"aggregate(_sh, array_repeat(9223372036854775807L, {num_hashes}), "
        f"(acc, s) -> zip_with(acc, transform(sequence(0, {num_hashes - 1}), "
        f"j -> xxhash64(j, s)), (a, b) -> least(a, b)))")
    return staged.select("id", mh.alias("mh"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    max_bucket: int = 64,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    rows/band = num_hashes/bands; collision prob ≈ 1-(1-j^r)^b. Defaults
    16/8 (r=2): j=0.8 -> >99.9% recall; false candidates are cheap because
    every candidate is exactly verified. Word 3-gram shingles by default
    (~7x fewer shingles than char-5 at equal dedup quality on prose; pass
    shingle_mode='char' for short/CJK-ish text). Returns (id_a, id_b,
    jaccard) with id_a < id_b and jaccard >= threshold (threshold compared
    as cross-multiplied integers — no float wobble).
    """
    r = num_hashes // bands
    mk = char_shingles if shingle_mode == "char" else word_shingle_hashes
    # shingled feeds THREE consumers (signatures + both verify join-backs);
    # materialize it once so the shingling HOF is never re-evaluated, and
    # never evaluated on both sides of a self-join. localCheckpoint spills
    # to executor-local storage — at 100 TB this is one shuffle-spill-sized
    # write, strictly cheaper than 3x recompute of the shingling pass.
    shingled = parallelize_input(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        mk(F.col(text_col), shingle_k).alias("sh"),
    ).localCheckpoint()
    sig = minhash_signatures_expr(shingled, "id", "sh", num_hashes)

    # bands carry only (id, band, bkey) — never the shingle sets (an 8-way
    # band explode of 2000-element arrays would 8x the shuffle for nothing)
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("mh")[b * r + i] for i in range(r)]).alias("bkey"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bkey")

    # Bucket members gathered per (band, bkey) in ONE partial-agg exchange;
    # the hot-bucket cap is slice(array_sort(...), 1, max_bucket) — the
    # same smallest-max_bucket-ids set the old row_number window kept —
    # and candidate pairs expand IN-ROW from the sorted array (id_a < id_b
    # by construction). vs the previous window-cap + self-join: one
    # exchange instead of a window sort feeding a join, and no reliance on
    # the planner broadcasting the banded side (which it cannot at corpus
    # scale). Pair set verified identical (round-6). dropDuplicates here
    # shuffles only candidate PAIRS, which 64-bit band keys keep small
    # (real near-dups plus 2^-64 collisions — unlike 8-bit image bands).
    grouped = (
        banded.groupBy("band", "bkey")
              .agg(F.slice(F.array_sort(F.collect_list("id")), 1, max_bucket)
                    .alias("ids"))
              .filter(F.size("ids") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x as id_a, y as id_b))))")
    cand = (
        grouped.select(F.explode(pair_expr).alias("p"))
               .select("p.id_a", "p.id_b")
               .dropDuplicates(["id_a", "id_b"])
    )
    # exact-Jaccard verification only on candidates: shingle sets joined in
    # here, never shuffled with the bands
    cand = (
        cand.join(shingled.select(F.col("id").alias("id_a"),
                                  F.col("sh").alias("sh_a")), "id_a")
            .join(shingled.select(F.col("id").alias("id_b"),
                                  F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    num, den = _threshold_ratio(jaccard_threshold)
    return (
        cand.withColumn("n_inter", inter).withColumn("n_union", union)
            .filter(F.col("n_inter") * den >= F.col("n_union") * num)
            .select(
                "id_a", "id_b",
                F.round(F.col("n_inter") / F.col("n_union"), 4).alias("jaccard"))
    )


# ---------------------------------------------------------------- simhash --

def simhash64(col: Column) -> Column:
    """64-bit SimHash of whitespace tokens — expressions only.

    For each bit position, sum +1/-1 over token hashes and take the sign.
    Implemented as: for bit k, count tokens with bit k set, compare to n/2
    (strictly greater -> bit set; integer compare, no float).
    """
    toks = F.split(F.trim(normalized(col)), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)
    def _ones(mask: Column) -> Column:
        return F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask) != 0))

    bit_terms = []
    for k in range(64):
        # shiftleft stays in JVM long space (1<<63 wraps to Long.MIN_VALUE,
        # which a Python int literal would overflow)
        mask = F.shiftleft(F.lit(1).cast("long"), k)
        ones = _ones(mask)
        bit_terms.append(F.when(ones * 2 > n, mask).otherwise(F.lit(0).cast("long")))
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig.bitwiseOR(t)
    return sig


def simhash_signatures_agg(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """SimHash signatures via explode + single-pass 64-sum aggregation.

    simhash64() fans the token array into 64 collapsed-projection scans;
    here each token is hashed once and the 64 bit-counters ride one
    hash-aggregate (map-side partials carry 64 longs per doc).
    Returns (id, sh long).
    """
    toks = F.split(F.trim(normalized(F.col(text_col))), " ")
    exploded = df.select(F.col(id_col).alias("id"),
                         F.explode(toks).alias("t"))
    hashed = exploded.select("id", F.xxhash64("t").alias("h"))
    aggs = [
        F.sum(F.shiftright("h", k).bitwiseAND(F.lit(1).cast("long"))).alias(f"b{k}")
        for k in range(64)
    ] + [F.count("*").alias("n")]
    per_doc = hashed.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for k in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{k}") * 2 > F.col("n"),
                   F.shiftleft(F.lit(1).cast("long"), k))
            .otherwise(F.lit(0).cast("long")))
    return per_doc.select("id", sig.alias("sh"))


def simhash_signatures_expr(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """SimHash signatures with ZERO shuffle: each token hashed once, all 64
    bit-counters accumulated in ONE aggregate() pass over the token-hash
    array, entirely within the row's projection.

    vs simhash_signatures_agg: the explode+groupBy variant shuffles 64 longs
    per doc (cheap but nonzero, and the explode multiplies the row count by
    tokens-per-doc through the map side); this variant keeps the whole
    signature computation inside whole-stage codegen so the only shuffle in
    simhash_pairs is the band self-join. Bit-exact with the other two
    variants (parity-tested).
    """
    toks = F.split(F.trim(normalized(F.col(text_col))), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    staged = df.select(F.col(id_col).alias("id"),
                       hashes.alias("_h"), F.size(toks).alias("_n"))
    # the inner shift-by-lambda-var needs SQL form (the python F.shiftright
    # wrapper only takes an int); `_h` is the Column-API-built hash array
    counts = F.expr(
        "aggregate(_h, array_repeat(0L, 64), "
        "(acc, h) -> zip_with(acc, transform(sequence(0, 63), "
        "i -> shiftright(h, i) & 1), (a, b) -> a + b))")
    n = F.col("_n")

    def _fold(c: Column) -> Column:
        # c is let_-bound: the counts aggregate evaluates ONCE per row.
        # Referencing the raw `counts` expression 64x would be fine in an
        # unconditional projection (codegen CSE collapses it) but the
        # NULL-guarding when() below makes this branch CONDITIONAL, where
        # Spark skips subexpression elimination — measured 25x slower.
        s = F.lit(0).cast("long")
        for k in range(64):
            s = s.bitwiseOR(
                F.when(F.element_at(c, k + 1) * 2 > n,
                       F.shiftleft(F.lit(1).cast("long"), k))
                .otherwise(F.lit(0).cast("long")))
        return s

    # NULL text must yield a NULL signature, not 0 — otherwise every
    # NULL-text doc pairs with every other at hamming 0 (the agg variant
    # drops such docs via explode; pairs-wise the two agree: no pair)
    sig = F.when(n.isNotNull(), let_(counts, _fold))
    return staged.select("id", sig.alias("sh"))


def simhash_signatures_np(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """SimHash signatures, bit-exact with the expr/agg variants, with the
    64 bit-counters computed VECTORIZED in numpy (guide §4.2: hand whole
    Arrow batches to native code instead of deep interpreted HOF chains).

    Tokenization and hashing stay JVM-side (the SAME split + xxhash64
    expressions — whole-stage codegen, and the only place string
    semantics live); what crosses into python is (id, array<long>), and
    the majority vote runs as three numpy ops over the whole batch
    (unpackbits -> add.reduceat over document offsets -> packbits).
    Measured ~3x over the aggregate() fold at 50k docs: the fold builds
    two 64-element arrays per TOKEN in the interpreted evaluator.
    NULL text -> NULL hashes -> NULL signature, like the expr variant.
    """
    from typing import Iterator as _It

    import pandas as pd

    from docvision_spark.pipeline.shipping import ensure_py_files

    ensure_py_files(df.sparkSession)
    toks = F.split(F.trim(normalized(F.col(text_col))), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    src = df.select(F.col(id_col).alias("id"), hashes.alias("_h"))
    id_type = df.schema[id_col].dataType.simpleString()

    def fn(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            hs = pdf["_h"]
            lens = np.fromiter((len(h) if h is not None else 0
                                for h in hs), dtype=np.int64, count=len(hs))
            out = np.empty(len(hs), dtype=object)
            total = int(lens.sum())
            if total:
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in hs
                     if h is not None and len(h)]).view(np.uint64)
                # (total_tokens, 64) bit matrix; bitorder little over the
                # little-endian byte view makes column k == (h >> k) & 1
                bits = np.unpackbits(
                    flat.view(np.uint8).reshape(-1, 8), axis=1,
                    bitorder="little")
                nz = lens > 0
                offsets = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(lens[nz][:-1], out=offsets[1:])
                counts = np.add.reduceat(bits, offsets, axis=0)
                # rows with a single token: reduceat handles equal
                # consecutive offsets by returning the single row — the
                # standard reduceat caveat applies only to EMPTY segments,
                # which nz excludes
                maj = counts * 2 > lens[nz, None]
                sigs = np.packbits(maj, axis=1, bitorder="little") \
                         .view(np.uint64).reshape(-1).view(np.int64)
                out[np.flatnonzero(nz)] = list(sigs)
            # rows with hashes == None stay None; empty arrays cannot
            # occur (split of any non-null string yields >= 1 element)
            yield pd.DataFrame({"id": pdf["id"], "sh": out})

    return src.mapInPandas(fn, f"id {id_type}, sh long")


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding (4 x 16-bit bands; any band equal
    -> candidate; verify Hamming distance <= max_hamming). Recall is
    pigeonhole-complete only while max_hamming < 4; larger radii are
    probabilistic, like all SimHash deployments."""
    sig = simhash_signatures_np(
        parallelize_input(df.select(id_col, text_col)), id_col, text_col)
    return banded_hamming_pairs(sig, "id", "sh", n_bands=4,
                                max_hamming=max_hamming)


def banded_hamming_pairs(
    sig: DataFrame, id_col: str, sig_col: str,
    n_bands: int = 4, max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over any 64-bit signature column by banded hamming
    join: split the signature into n_bands equal bands; candidates share a
    (band_idx, band_value) key; the exact bit_count verify runs on
    candidates only — never an all-pairs join. By pigeonhole, recall is
    COMPLETE whenever max_hamming < n_bands; band width is the scale knob
    (fewer/wider bands -> colder buckets at petabyte scale at the cost of
    guaranteed-recall radius). Shared by simhash_pairs (text) and
    image_dup_pairs (dHash). Returns (id_a, id_b, hamming:int), id_a < id_b.
    """
    if 64 % n_bands != 0:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    # materialize (id, sig) before banding: the self-join would otherwise
    # re-evaluate the signature expression tree (deep HOF aggregates /
    # python decode stages) on BOTH join sides and inside the explode —
    # measured 25x on d02 at sf0.1. Two longs per row; truncating lineage
    # here is strictly cheaper than any recompute. The NULL filter runs
    # AFTER the checkpoint: a filter UNDER the projection re-inlines the
    # signature tree into an interpreted predicate and evaluates it twice
    # per row (measured 8s vs 2.5s on d02 at sf0.1).
    base = sig.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig")) \
              .localCheckpoint() \
              .filter(F.col("sig").isNotNull())
    bands = base.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("sig", width * i).bitwiseAND(F.lit(mask)).alias("bkey"),
            ) for i in range(n_bands)
        ])).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bkey")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bkey"]).filter(F.col("a.id") < F.col("b.id"))
         .select("band", F.col("a.id").alias("id_a"),
                 F.col("b.id").alias("id_b"),
                 F.col("a.sig").alias("s_a"), F.col("b.sig").alias("s_b"))
    )
    # dedup candidates WITHOUT a shuffle: a pair colliding in k bands is
    # emitted k times by the join; keep only the copy from the FIRST
    # matching band (= index of the lowest zero xor-band, computable from
    # the two signatures already on the row). The previous
    # dropDuplicates([id_a, id_b]) shuffled every candidate row — at 8x8
    # banding over clustered signatures that was 70M+ rows through an
    # exchange (measured: m02 at sf1.0) for a result this filter gets for
    # free inside the join stage (guide §2.4: remove shuffles outright).
    x = F.col("s_a").bitwiseXOR(F.col("s_b"))
    first_band = F.coalesce(*[
        F.when(F.shiftright(x, width * j).bitwiseAND(F.lit(mask)) == 0,
               F.lit(j))
        for j in range(n_bands)
    ])
    cand = cand.filter(F.col("band") == first_band).drop("band")
    ham = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))).cast("int")
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


def banded_hamming_pairs_multiprobe(
    sig: DataFrame, id_col: str, sig_col: str,
    n_bands: int = 4, max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by multi-index Hamming probing (the public
    multi-index hashing scheme: index each signature under its exact band
    keys; the PROBE side additionally enumerates every 1-bit flip of each
    band key, so a pair collides whenever some band differs by <= 1 bit).

    If every band differed by >= 2 bits the total distance would be
    >= 2 * n_bands, so recall is COMPLETE whenever
    max_hamming < 2 * n_bands: 4x16-bit bands cover hamming <= 7 where
    the exact-match scheme needs 8x8-bit bands — whose 256-value key
    space collapses into hot buckets at corpus scale (measured on m02 at
    sf1.0: 72M candidate rows from 37k images; wide bands + radius-1
    probes cut that ~20x for the same guaranteed recall). Exact
    bit_count verify on candidates only; candidate dedup is the
    first-qualifying-band filter (popcount of the xor band <= 1), which
    keeps exactly one copy per pair with NO shuffle — the probe explode
    emits one matching copy per qualifying band, and the a.id < b.id
    filter removes the mirrored direction.
    Returns (id_a, id_b, hamming:int), id_a < id_b.
    """
    if 64 % n_bands != 0:
        raise ValueError("n_bands must divide 64")
    if max_hamming >= 2 * n_bands:
        raise ValueError("multiprobe recall requires max_hamming < 2*n_bands")
    width = 64 // n_bands
    mask = (1 << width) - 1
    base = sig.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig")) \
              .localCheckpoint() \
              .filter(F.col("sig").isNotNull())

    def bkey(i: int) -> Column:
        return F.shiftright("sig", width * i).bitwiseAND(F.lit(mask))

    index = base.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"), bkey(i).alias("bkey"))
            for i in range(n_bands)
        ])).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bkey")
    flips = [0] + [1 << j for j in range(width)]
    probes = base.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     bkey(i).bitwiseXOR(F.lit(f)).alias("bkey"))
            for i in range(n_bands) for f in flips
        ])).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bkey")
    cand = (
        probes.alias("a").join(index.alias("b"), ["band", "bkey"])
              .filter(F.col("a.id") < F.col("b.id"))
              .select("band", F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.col("a.sig").alias("s_a"),
                      F.col("b.sig").alias("s_b"))
    )
    x = F.col("s_a").bitwiseXOR(F.col("s_b"))
    first_qual = F.coalesce(*[
        F.when(F.bit_count(F.shiftright(x, width * j)
                            .bitwiseAND(F.lit(mask))) <= 1, F.lit(j))
        for j in range(n_bands)
    ])
    cand = cand.filter(F.col("band") == first_qual).drop("band")
    ham = F.bit_count(x).cast("int")
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


# ------------------------------------------------------- inverted index ----

def inverted_candidates(postings: DataFrame,
                        max_postings: int | None) -> DataFrame:
    """Distinct candidate pairs from an inverted index: postings is
    (id, key); documents sharing >= 1 key pair up — never an all-pairs
    cross join. Keys present in > max_postings docs (stop-shingles /
    boilerplate fingerprints) are dropped from the INDEX only — the
    standard recall/cost knob; callers re-verify candidates exactly on the
    full sets. Shared by ngram_jaccard_pairs and winnow_overlap_pairs.
    Returns (id_a, id_b) with id_a < id_b."""
    if max_postings is not None:
        hot = (postings.groupBy("key").count()
                       .filter(F.col("count") > max_postings).select("key"))
        postings = postings.join(hot, "key", "left_anti")
    a, b = postings.alias("a"), postings.alias("b")
    return (
        a.join(b, "key").filter(F.col("a.id") < F.col("b.id"))
         .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
         .dropDuplicates(["id_a", "id_b"])
    )


def join_back_sets(cand: DataFrame, sets_df: DataFrame,
                   set_col: str = "sh") -> DataFrame:
    """Attach each candidate side's full set column for exact verification
    (sets ride this narrow join only — never the inverted index)."""
    return (
        cand.join(sets_df.select(F.col("id").alias("id_a"),
                                 F.col(set_col).alias(f"{set_col}_a")), "id_a")
            .join(sets_df.select(F.col("id").alias("id_b"),
                                 F.col(set_col).alias(f"{set_col}_b")), "id_b")
    )


# ------------------------------------------------------------ ngram jaccard --

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 3, threshold: float = 0.5, max_postings: int | None = 128,
) -> DataFrame:
    """Word-k-gram Jaccard near-dup pairs via an inverted shingle index
    (explode -> self-join on shingle -> candidates -> exact verify).

    The inverted-index join only pairs documents that SHARE at least one
    shingle; a df-style cross join never happens. Hot shingles (present in
    > max_postings docs) are dropped from the index — the standard
    stop-shingle trick. The final jaccard is EXACT (array_intersect over the
    candidates' full shingle sets, like minhash_lsh_pairs), so the cap
    affects RECALL only: a pair sharing nothing but hot shingles is never
    generated as a candidate. Pass max_postings=None for exact recall
    (oracle scale); the default 128 is the 100 TB knob.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("sh"),
    )
    postings = sh.select("id", F.explode("sh").alias("key"))
    cand = inverted_candidates(postings, max_postings)
    # exact verification on candidates only: full shingle sets joined in
    # here, never shuffled through the inverted index
    cand = join_back_sets(cand, sh, "sh")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    num, den = _threshold_ratio(threshold)
    return (
        cand.withColumn("n_inter", inter).withColumn("n_union", union)
            .filter(F.col("n_inter") * den >= F.col("n_union") * num)
            .select("id_a", "id_b",
                    F.round(F.col("n_inter") / F.col("n_union"), 4).alias("jaccard"))
    )


# --------------------------------------------------- connected components --

def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph -> (id, cluster_id),
    cluster_id = min id reachable. Proper dedup KEEPS one doc per component
    (a~b, b~c collapse to one survivor even though a,c never paired).

    Min-label propagation WITH pointer doubling: each iteration (a) pulls
    the min label across one edge hop and (b) follows the label map one
    step onto itself (lbl <- lbl[lbl], valid because labels are monotone
    non-increasing), so label reach DOUBLES per round and convergence is
    O(log diameter) — a 10^4-node path graph converges in ~15 rounds where
    plain one-hop propagation would need 10^4 (the round-2 crash risk on
    pathological chains). Per iteration: one edge join + min-agg and one
    self-join, all carrying only (id, label) longs. Lineage is truncated
    with localCheckpoint every iteration so the plan does not grow
    O(iterations) deep (the 100 TB failure mode of iterative DataFrame
    algorithms).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .unionAll(pairs.select(F.col(id_b).alias("src"),
                                    F.col(id_a).alias("dst")))
    ).localCheckpoint()  # else every iteration re-runs pair generation
    labels = (edges.select(F.col("src").alias("id")).distinct()
                   .withColumn("lbl", F.col("id")).localCheckpoint())
    converged = False
    for _ in range(max_iter):
        # (a) one-hop neighbor min
        nbr = (edges.join(labels, edges.src == labels.id)
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("lbl").alias("nbr_lbl")))
        hop = (labels.join(nbr, "id", "left")
                     .select("id", F.least("lbl", F.coalesce("nbr_lbl", "lbl"))
                                    .alias("lbl")))
        # (b) pointer doubling: lbl <- lbl[lbl]; lbl[x] <= x, so the
        # resolved label only improves and stays within the component
        lmap = hop.select(F.col("id").alias("lbl"), F.col("lbl").alias("lbl2"))
        new_labels = (
            hop.join(lmap, "lbl", "left")
               .select("id", F.coalesce("lbl2", "lbl").alias("lbl"))
               .localCheckpoint()
        )
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.lbl") != F.col("o.lbl")).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # loud beats wrong: partial labels would under-merge clusters and a
        # keep-one-per-cluster dedup would silently retain duplicates
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations (component diameter exceeds 2^max_iter)")
    return labels.select("id", F.col("lbl").alias("cluster_id"))


# ------------------------------------------------------------ incremental --
# Re-crawl workflow: a published corpus never rescans — each new crawl
# increment dedups against the corpus's PERSISTED artifacts (fingerprint
# table for exact, band + shingle tables for near-dup), then appends its
# own survivors' artifacts as the next snapshot. At 10^12 docs the
# published side is orders of magnitude larger than an increment, so the
# only viable shapes are (a) anti-join on a 128-bit fingerprint and
# (b) band-key join against the published band table — both shuffle keys
# and ids only, never text. Reference behavior analogue: docvision
# re-processes every input file per run (src/docvision/core/parser.py has
# no corpus memory); incremental dedup is the capability a 100 TB pipeline
# needs instead.

def fingerprint_table(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(fp, id) projection of a corpus — the persisted exact-dedup artifact.

    NULL-text rows carry no fingerprint and are excluded (NULL is a
    joinable dedup key: letting it through would collapse every NULL-text
    row into one survivor). Persist this bucketed BY fp so increment
    anti-joins are co-partitioned sort-merge with zero history shuffle."""
    return (parallelize_input(df.filter(F.col(text_col).isNotNull())
                                .select(id_col, text_col))
              .select(fingerprint_md5(F.col(text_col)).alias("fp"),
                      F.col(id_col).alias("id")))


def incremental_exact_dedup(new_df: DataFrame, history_fps: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            fp_col: str | None = None) -> DataFrame:
    """Rows of a new crawl increment that survive exact dedup against a
    published fingerprint table (and within the increment itself).

    Within-batch policy matches exact_dedup (min id per fingerprint);
    cross-history is a left-anti join on fp. Only (fp, id) pairs ever
    shuffle — the increment's text rides a final left-semi join on the id
    column and the history table is touched fp-column-only (column-pruned
    scan of the persisted artifact). NULL-text rows pass through
    unconditionally: they are never dedup keys (see fingerprint_table).

    fp_col: use an EXISTING fingerprint column instead of computing
    md5(normalized(text)) — the extract pipeline already carries a
    sha3-256 content id, so dedup against a published extract table is an
    anti-join between two persisted id columns with no text read on
    either side (rows with NULL fp_col pass through like NULL text).
    """
    key = F.col(fp_col) if fp_col else F.col(text_col)
    nulls = new_df.filter(key.isNull())
    # fp computation parallelized like fingerprint_table; when fp_col is
    # given the select is projection-only and the repartition is skipped
    # (nothing heavy runs map-side there)
    fp_src = new_df.filter(key.isNotNull())
    if not fp_col:
        fp_src = parallelize_input(fp_src.select(id_col, text_col))
    fps = fp_src.select(F.col(id_col).alias("_id"),
                        (F.col(fp_col) if fp_col
                         else fingerprint_md5(F.col(text_col))).alias("fp"))
    batch_winner = fps.groupBy("fp").agg(F.min("_id").alias("_id"))
    survivor_ids = (batch_winner
                    .join(history_fps.select("fp"), "fp", "left_anti")
                    .select(F.col("_id").alias(id_col)))
    return (new_df.join(survivor_ids, id_col, "left_semi")
                  .unionByName(nulls))


def minhash_artifacts(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 16,
                      bands: int = 8, shingle_k: int = 3,
                      shingle_mode: str = "word",
                      ) -> tuple[DataFrame, DataFrame]:
    """(shingled, banded) projections — the persisted near-dup artifacts.

    shingled = (id, sh array<long>): exact-verification sets.
    banded   = (id, band, bkey):     LSH candidate keys.
    A published corpus persists both (banded bucketed by (band, bkey),
    shingled by id); increments join against them without touching the
    published text. Same banding math as minhash_lsh_pairs — r =
    num_hashes/bands rows per band, band key = xxhash64 of the band's
    signature slice."""
    r = num_hashes // bands
    mk = char_shingles if shingle_mode == "char" else word_shingle_hashes
    shingled = parallelize_input(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        mk(F.col(text_col), shingle_k).alias("sh"),
    ).localCheckpoint()
    sig = minhash_signatures_expr(shingled, "id", "sh", num_hashes)
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("mh")[b * r + i] for i in range(r)])
                 .alias("bkey"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bkey")
    return shingled, banded


def incremental_minhash_pairs(
    new_df: DataFrame,
    history_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    max_bucket: int = 64,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """(new_id, hist_id, jaccard) pairs: increment docs near-duplicate with
    the published corpus, MinHash-banded + exactly verified.

    The candidate join is new-bands x history-bands on (band, bkey) — an
    increment-sized probe into the published band table, NOT a self-join
    over the union (which would rediscover every already-known
    history-internal pair on every run). Verification joins each side's
    candidates back to its OWN shingle table, so history text is never
    read. Hot-bucket cap applies per side. Pass precomputed artifacts via
    history_df being the raw docs here; jobs persist minhash_artifacts()
    output and feed it to incremental_minhash_pairs_from_artifacts."""
    h_sh, h_bands = minhash_artifacts(
        history_df, id_col, text_col, num_hashes, bands, shingle_k,
        shingle_mode)
    return incremental_minhash_pairs_from_artifacts(
        new_df, h_sh, h_bands, id_col, text_col, num_hashes, bands,
        shingle_k, shingle_mode, max_bucket, jaccard_threshold)


def incremental_minhash_pairs_from_artifacts(
    new_df: DataFrame,
    history_shingled: DataFrame,
    history_banded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    max_bucket: int = 64,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """incremental_minhash_pairs against PERSISTED history artifacts —
    the production entry point: the published corpus contributes only its
    (id, band, bkey) and (id, sh) tables, read column-pruned from storage.
    Banding parameters must match the ones the artifacts were built with
    (same num_hashes/bands/shingle settings — band keys are not
    comparable across parameterizations)."""
    n_sh, n_bands = minhash_artifacts(
        new_df, id_col, text_col, num_hashes, bands, shingle_k,
        shingle_mode)

    def cap(banded: DataFrame) -> DataFrame:
        return (banded.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("band", "bkey").orderBy("id")))
                .filter(F.col("rn") <= max_bucket)
                .drop("rn"))

    cand = (
        cap(n_bands).alias("n")
        .join(cap(history_banded).alias("h"), ["band", "bkey"])
        .select(F.col("n.id").alias("new_id"),
                F.col("h.id").alias("hist_id"))
        .dropDuplicates(["new_id", "hist_id"])
    )
    cand = (
        cand.join(n_sh.select(F.col("id").alias("new_id"),
                              F.col("sh").alias("sh_n")), "new_id")
            .join(history_shingled.select(F.col("id").alias("hist_id"),
                                          F.col("sh").alias("sh_h")),
                  "hist_id")
    )
    inter = F.size(F.array_intersect("sh_n", "sh_h"))
    union = F.size("sh_n") + F.size("sh_h") - inter
    num, den = _threshold_ratio(jaccard_threshold)
    return (
        cand.withColumn("n_inter", inter).withColumn("n_union", union)
            .filter(F.col("n_inter") * den >= F.col("n_union") * num)
            .select(
                "new_id", "hist_id",
                F.round(F.col("n_inter") / F.col("n_union"), 4)
                 .alias("jaccard"))
    )


def incremental_minhash_dedup(
    new_df: DataFrame,
    history_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Increment rows that are NOT near-duplicates of the published corpus
    (the keep-set a re-crawl appends). Convenience over
    incremental_minhash_pairs; NULL-text rows pass through (no shingles,
    never candidates)."""
    pairs = incremental_minhash_pairs(
        new_df, history_df, id_col, text_col, **kwargs)
    dup_ids = pairs.select(F.col("new_id").alias(id_col)).distinct()
    return new_df.join(dup_ids, id_col, "left_anti")
