"""Text-analysis operators for large-scale training-data pipelines.

All implemented with built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python UDFs in the hot path. Each operator has an
exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so correctness is
oracle-checked. The per-document stats and the sampler are narrow maps
over the scan (no shuffle, linear scaling); the corpus-level operators
shuffle only on uniform hash keys (boilerplate document-frequency via a
window over md5 grams; contamination additionally broadcasts the small
eval-gram set for its join).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import md5_stratum

# small multilingual stopword seed for language-ID voting (public knowledge)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "que", "de", "y"],
}


def _word_re(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def bpeish_tokens_expr(text: str = "text"):
    """BPE-ish subword estimate (runs of word chars / digits / single
    punctuation — a cheap proxy for BPE pre-tokenization). ONE
    definition shared by token_count and text_profile."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def lang_best_expr(lowered):
    """Deterministic stopword-vote argmax as a (n, lang) struct —
    compare (count, reverse-alphabetic lang) pairs; shared by lang_id
    and text_profile so the tie-break can never drift between them."""
    votes = {lang: F.regexp_count(lowered, F.lit(_word_re(words)))
             for lang, words in LANG_MARKERS.items()}
    best = None
    for lang in sorted(LANG_MARKERS):
        pair = F.struct(votes[lang].alias("n"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(
            (pair["n"] > best["n"]), pair).otherwise(best)
    return best


def fingerprint_expr(text: str = "text"):
    """md5 over whitespace-normalized lowercase text (engine-portable,
    unlike xxhash64); shared by fingerprint and text_profile."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate."""
    return docs.select(
        "doc_id",
        token_count_expr().alias("ws_tokens"),
        bpeish_tokens_expr().alias("bpeish_tokens"),
    )


def token_count_expr(text: str = "text"):
    """Whitespace token count — ONE definition shared by quality_score and
    the cleaning chain (drift here would silently skew every gate)."""
    return F.regexp_count(text, F.lit(r"\S+"))


def punct_ratio_expr(text: str = "text"):
    """Punctuation ratio, rounded for cross-engine float determinism."""
    return F.round(F.regexp_count(text, F.lit(r"[^\w\s]"))
                   / F.greatest(F.length(text), F.lit(1)), 6)


def pii_any_expr(text: str = "text"):
    """Boolean: any PII pattern matches. NULL text coalesces to '' so the
    flag is never indeterminate (three-valued logic would slip both
    branches of a scrub gate). Shared by pii_scan and the cleaning chain."""
    t = F.coalesce(F.col(text), F.lit(""))
    flag = None
    for pat in PII_PATTERNS.values():
        c = F.regexp_count(t, F.lit(pat)) > 0
        flag = c if flag is None else (flag | c)
    return flag


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, uppercase ratio, mean word length. Rounded so the DuckDB oracle
    hashes identically (float determinism)."""
    n_chars = F.length("text")
    n_tokens = token_count_expr()
    n_upper = F.regexp_count("text", F.lit(r"[A-Z]"))
    n_stop = F.regexp_count(F.lower("text"),
                            F.lit(_word_re(LANG_MARKERS["en"])))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        punct_ratio_expr().alias("punct_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6)
        .alias("upper_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
        .alias("stopword_ratio"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)
        .alias("mean_token_len"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID (n-gram-free heuristic that is exactly
    expressible in ANSI SQL for the oracle). Ties break by language code
    order via the greatest-tuple trick (lang_best_expr)."""
    best = lang_best_expr(F.lower(F.col("text")))
    return docs.select(
        "doc_id", "lang",
        best["lang"].alias("pred_lang"),
        best["n"].alias("votes"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint (fingerprint_expr)."""
    return docs.select(
        "doc_id",
        fingerprint_expr().alias("fingerprint"),
    )


def text_profile(docs: DataFrame) -> DataFrame:
    """Token counts + language-ID vote + fingerprint in ONE projection
    (r7 merge of the token_count / lang_id / fingerprint lanes): all
    three are narrow per-document maps, so composing them into a single
    select keeps one corpus scan and zero shuffles — strictly better at
    scale than three lanes each re-scanning the corpus. Every expression
    is the SHARED builder the narrow operators use, so the merged lane
    and its parts cannot drift."""
    best = lang_best_expr(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        token_count_expr().alias("ws_tokens"),
        bpeish_tokens_expr().alias("bpeish_tokens"),
        "lang",
        best["lang"].alias("pred_lang"),
        best["n"].alias("votes"),
        fingerprint_expr().alias("fingerprint"),
    )


# Named boilerplate defaults shared with the DuckDB oracle (r7 drift
# sweep): the oracle's gram width / stride / document-frequency bound
# interpolate THESE names.
BOILERPLATE_K = 30
BOILERPLATE_STRIDE = 15
BOILERPLATE_MIN_DOCS = 3


def boilerplate_spans(docs: DataFrame, k: int = BOILERPLATE_K,
                      stride: int = BOILERPLATE_STRIDE,
                      min_docs: int = BOILERPLATE_MIN_DOCS) -> DataFrame:
    """Repeated-span (boilerplate) detection via character k-gram document
    frequency — the exact-substring dedup signal from the training-data
    literature (cf. PAPERS.md, "Deduplicating Training Data Makes Language
    Models Better": memorized/boilerplate spans recur verbatim across
    documents).

    Pipeline (all JVM built-ins, one shuffle on a uniform hash key):
      1. strided char k-grams per doc (stride=k/2 bounds volume at ~2x
         chars; md5 gram key so the DuckDB oracle reproduces it exactly)
      2. document frequency per gram (groupBy md5 — uniform, skew-free)
      3. grams with df >= min_docs are boilerplate; join back (the
         boilerplate gram set is small -> broadcast at corpus scale)
      4. per-doc boilerplate gram count + ratio

    100 TB design: step 2's shuffle is on md5 keys (perfectly uniform);
    step 3's join side shrinks with min_docs (hot boilerplate is by
    definition low-cardinality); stride/k tune volume independently of
    correctness. Returns (doc_id, n_grams, n_boilerplate, ratio).
    """
    from .parse import ensure_map_parallelism
    grams = (ensure_map_parallelism(docs.select("doc_id", "text"))
             .select("doc_id",
                     F.explode(F.expr(
                         f"transform(sequence(1, greatest(cast(floor((length(text)"
                         f" - {k}) / {stride}) as int) + 1, 1)),"
                         f" i -> substr(text, (i - 1) * {stride} + 1, {k}))"
                     )).alias("gram"))
             .where(F.length("gram") == k)
             .select("doc_id", F.md5("gram").alias("g")))
    # SINGLE-LINEAGE document-frequency: (doc, gram) occurrence counts,
    # then df as a window count over g (per_dg is distinct per (doc, g),
    # so rows-per-g == docs-per-g) — the gram scan+explode+md5 runs ONCE;
    # a groupBy + self-join form evaluated it twice (review finding)
    from pyspark.sql import Window
    per_dg = grams.groupBy("doc_id", "g").agg(F.count("*").alias("cnt"))
    flagged = per_dg.withColumn(
        "df", F.count("*").over(Window.partitionBy("g")))
    per_doc = (flagged.groupBy("doc_id")
               .agg(F.sum("cnt").alias("n_grams"),
                    F.sum((F.col("df") >= min_docs).cast("long")
                          * F.col("cnt")).alias("n_boilerplate")))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_boilerplate", F.lit(0))
                    .alias("n_boilerplate"),
                    F.round(F.coalesce("n_boilerplate", F.lit(0))
                            / F.greatest(F.coalesce("n_grams", F.lit(0)),
                                         F.lit(1)), 6).alias("ratio")))


# shared between the Spark op and the DuckDB oracle: identical regexes
# (RE2-compatible subset: no backrefs/lookaround, so both engines agree)
PII_PATTERNS = {
    "n_emails": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "n_phones": "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "n_ipv4": "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
    "n_ssn_like": "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
}


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0,
                      key: str = "lang") -> DataFrame:
    """Deterministic per-stratum sampling — the source-mixing op every
    training-data pipeline runs (e.g. keep 30% of lang A, 100% of B).

    Keep rule: ``md5(doc_id) mod 1e6 < rate * 1e6`` per stratum — no RNG
    state, so the sample is identical across engines, reruns, retries
    and partitionings (reproducible data recipes; the DuckDB oracle
    replays it bit-for-bit). Narrow filter: no shuffle, prunes at the
    scan."""
    h = md5_stratum(F.col("doc_id"), 1_000_000)
    # round, not int(): 0.35 * 1e6 is 349999.99999999994 in binary64 —
    # truncation would put the threshold one off the documented rate*1e6
    thr = F.lit(round(default_rate * 1_000_000))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(key) == stratum,
                     F.lit(round(rate * 1_000_000))).otherwise(thr)
    return docs.where(h < thr)


def _token_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, g): md5 of each space-joined word n-gram (the shared
    tokenizer regex, lowercased — identical in DuckDB)."""
    # tokenize ONCE into a column: interpolating the regexp inside the
    # transform lambda re-runs the tokenizer per sequence element
    # (Catalyst does not hoist loop invariants out of higher-order
    # lambdas) — measured 11x slower and O(tokens^2) per doc.
    # greatest(..., 1) + the size filter: Spark's sequence(1, 0) DESCENDS
    # ([1, 0]), so a <n-token doc would otherwise emit bogus short grams
    from .parse import ensure_map_parallelism
    toked = ensure_map_parallelism(docs.select("doc_id", "text")).select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        .alias("toks"))
    return (toked.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(filter(transform("
            f"sequence(1, greatest(size(toks) - {n - 1}, 1)),"
            f" i -> slice(toks, i, {n})), a -> size(a) = {n}),"
            f" a -> md5(array_join(a, ' ')))"
        )).alias("g")))


# broadcast bound for the eval gram set: ~2M md5 keys is ~64 MB hashed
# relation per executor — comfortably inside a default 1 GB broadcast
# budget, far above any real benchmark suite's gram count
BROADCAST_EVAL_MAX_GRAMS = 2_000_000


@contextmanager
def hint_only_broadcasts(spark: SparkSession):
    """Disable BOTH auto-broadcast paths (static + adaptive) so the only
    possible BroadcastHashJoin source is an explicit hint — turns a
    physical-plan string into a direct read of a guarded-hint decision
    (the witness shape the broadcast-guard pytest and the scale probe's
    decon leg share). The adaptive key has no explicit value by default
    (it defers to the static one), so it saves as None and restores via
    unset."""
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def contamination_flags(docs: DataFrame, eval_docs: DataFrame,
                        n: int = 13,
                        broadcast_eval: bool | None = None) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ANY word
    ``n``-gram with an evaluation set (the standard 13-gram rule, cf.
    PAPERS.md training-data hygiene literature). Returns
    (doc_id, n_hits, contaminated) for every input doc.

    Scale design: the eval side is tiny relative to the corpus (a
    benchmark suite vs a crawl), so its distinct gram set broadcasts —
    no shuffle JOIN against the eval side; the corpus grams shuffle
    only for the per-doc algebraic hit count (uniform doc_id keys).
    The "tiny" assumption is MEASURED, not assumed (ADVICE r6): with
    ``broadcast_eval=None`` the eval gram set is counted first (one
    cheap job over the small side, reused via localCheckpoint) and the
    broadcast hint applies only under BROADCAST_EVAL_MAX_GRAMS — an
    eval set that grew with the corpus degrades to a shuffle join
    instead of an executor/driver OOM. Pass True/False to force."""
    d_g = _token_ngrams(docs, n)
    e_g = _token_ngrams(eval_docs, n).select("g").distinct()
    if broadcast_eval is None:
        # localCheckpoint: the guard count and the join read ONE
        # materialization of the eval grams (and the join side stops
        # re-deriving the eval tokenization per task)
        e_g = e_g.localCheckpoint()
        broadcast_eval = e_g.count() <= BROADCAST_EVAL_MAX_GRAMS
    if broadcast_eval:
        e_g = F.broadcast(e_g)
    hits = (d_g.join(e_g, "g")
            .groupBy("doc_id")
            .agg(F.countDistinct("g").alias("n_hits")))
    return (docs.select("doc_id").join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition quality signals (cf.
    PAPERS.md training-data quality literature: fraction of characters
    in the most frequent word 2-gram, fraction of characters in
    duplicated word 5-grams — the published repetition-removal rules
    for web-crawl corpora). Returns one row per document:

    - ``n_toks``: token count (shared ``[a-z0-9]+`` tokenizer).
    - ``top_2gram`` / ``top_2gram_frac``: the most frequent word
      2-gram and ``count * length(gram) / length(text)``. Ties on
      count pick the lexicographically GREATEST gram (struct-max
      semantics, identical field-lexicographic compare in DuckDB).
    - ``dup_5gram_ratio``: ``sum(count * length(gram)) / length(text)``
      over 5-grams occurring more than once — the standard
      occurrence-weighted approximation (overlapping spans counted per
      occurrence, same rule both engines; a pathologically repetitive
      document can exceed 1, which is exactly what the downstream
      quality gate filters on).

    Scale design: ONE scan feeds everything — a sentinel ``n = 0``
    struct guarantees a row per document through the explode, so the
    per-doc stats ride the aggregation instead of a second scan + join.
    Two shuffles total, both on uniform keys ((doc_id, n, gram) then
    doc_id); all expressions JVM-side. ``first(n_toks)`` under groupBy
    is deterministic here — the carried columns are functionally
    dependent on doc_id. The tokenizer runs once per doc (hoisted into
    a column; Catalyst does not hoist invariants out of higher-order
    lambdas — see _token_ngrams)."""
    from .parse import ensure_map_parallelism
    toked = ensure_map_parallelism(docs.select("doc_id", "text")).select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        .alias("toks"))
    base = toked.select("doc_id", "text_len",
                        F.size("toks").alias("n_toks"), "toks")
    # sequence(1, greatest(.., 1)) + size filter: sequence DESCENDS for
    # an upper bound below the lower one, so short docs would otherwise
    # emit bogus grams (same guard as _token_ngrams)
    grams = base.select(
        "doc_id", "n_toks", "text_len",
        F.explode(F.expr(
            "concat("
            " array(named_struct('n', 0, 'gram', '')),"
            " transform(filter(transform(sequence(1, greatest(size(toks) - 1, 1)),"
            "   i -> slice(toks, i, 2)), a -> size(a) = 2),"
            "   a -> named_struct('n', 2, 'gram', array_join(a, ' '))),"
            " transform(filter(transform(sequence(1, greatest(size(toks) - 4, 1)),"
            "   i -> slice(toks, i, 5)), a -> size(a) = 5),"
            "   a -> named_struct('n', 5, 'gram', array_join(a, ' ')))"
            ")")).alias("s"))
    counts = (grams.groupBy("doc_id", F.col("s.n").alias("n"),
                            F.col("s.gram").alias("gram"))
              .agg(F.count("*").alias("cnt"),
                   F.first("n_toks").alias("n_toks"),
                   F.first("text_len").alias("text_len")))
    per = (counts.groupBy("doc_id")
           .agg(F.first("n_toks").alias("n_toks"),
                F.first("text_len").alias("text_len"),
                F.max(F.when(F.col("n") == 2, F.struct("cnt", "gram")))
                .alias("top2"),
                F.sum(F.when((F.col("n") == 5) & (F.col("cnt") > 1),
                             F.col("cnt") * F.length("gram")))
                .alias("dup5_chars")))
    denom = F.greatest("text_len", F.lit(1))
    return per.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.coalesce(F.col("top2.gram"), F.lit("")).alias("top_2gram"),
        F.round(F.coalesce(F.col("top2.cnt") * F.length("top2.gram"),
                           F.lit(0)) / denom, 6).alias("top_2gram_frac"),
        F.round(F.coalesce(F.col("dup5_chars"), F.lit(0)) / denom, 6)
        .alias("dup_5gram_ratio"))


def pii_scan(docs: DataFrame) -> DataFrame:
    """PII / contamination pre-filter signals: per-document counts of
    email, phone-shaped, IPv4-shaped, and SSN-shaped substrings, plus a
    flag. Standard training-data hygiene stage (scrub-or-drop decisions
    happen downstream on these columns).

    Pure JVM ``regexp_count`` — a narrow map over the scan, no shuffle,
    no Python; linear at any corpus size. The patterns are intentionally
    recall-leaning (cheap first pass); a precision pass (validation,
    context windows) would run only on the flagged subset.
    """
    # F.lit(pattern) instead of SQL-literal embedding: Spark SQL string
    # literals process backslash escapes, DuckDB's do not — passing the
    # pattern as a value keeps ONE canonical regex for both engines.
    # NULL text coalesces to '' FIRST: NULL counts would make has_pii
    # NULL, which slips BOTH `where(has_pii)` and `where(~has_pii)`
    # (three-valued logic) — a scrub gate must never be indeterminate.
    text = F.coalesce(F.col("text"), F.lit(""))
    cols = [F.regexp_count(text, F.lit(pat)).cast("long").alias(name)
            for name, pat in PII_PATTERNS.items()]
    out = docs.select("doc_id", *cols)
    flag = None
    for name in PII_PATTERNS:
        c = F.col(name) > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)
