"""Text-analysis operators for training-data pipelines.

All native Spark SQL expressions (no Python): token counting, quality
scoring, language-id heuristic, document fingerprinting. Each is
portable SQL so DuckDB oracles can replicate it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count, char count, avg token length."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        (F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
         / F.greatest(F.size(toks), F.lit(1))).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length/punct/stopword heuristics → [0,1] quality score."""
    text = F.col(text_col)
    n = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    toks = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    alpha_ratio = n_alpha / F.greatest(n, F.lit(1))
    punct_ratio = n_punct / F.greatest(n, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    length_ok = F.when((n >= 64) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * length_ok
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-overlap language heuristic (en vs unknown) — a cheap
    n-gram/stopword scorer; SQL-portable for oracle checks."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    ratio = n_stop / F.greatest(F.size(toks), F.lit(1))
    return df.select(
        F.col(id_col),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


# Common function-word profiles (public knowledge: the usual top
# stopwords of each language). Distinctive words only — shared forms
# (e.g. "a" en/es/pt, "in" en/de/nl/it) are kept since the ARGMAX over
# per-language hit ratios resolves them; profile sizes are equal so
# ratios are comparable.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu",
           "den", "von", "sie", "auf", "für"],
    "en": ["the", "and", "of", "to", "in", "is", "it", "for", "on", "that",
           "with", "as", "was", "are", "this"],
    "es": ["el", "la", "los", "las", "y", "es", "en", "un", "una", "que",
           "de", "no", "por", "con", "para"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "des", "dans",
           "pour", "pas", "sur", "avec", "ce"],
    "it": ["il", "la", "che", "di", "e", "un", "una", "per", "non", "sono",
           "con", "del", "gli", "si", "le"],
    "nl": ["de", "het", "een", "en", "van", "is", "dat", "niet", "met", "op",
           "voor", "zijn", "aan", "ook", "maar"],
    "pt": ["o", "a", "os", "as", "e", "de", "que", "um", "uma", "não",
           "em", "do", "da", "para", "com"],
}
LANGS = sorted(LANG_PROFILES)  # fixed order: ties resolve alphabetically


def lang_id_profiles(
    df: DataFrame, text_col: str, id_col: str, min_ratio: float = 0.08
) -> DataFrame:
    """Multi-language stopword-profile language id (the round-3 verdict
    asked the langid op to grow past the en/unknown toy): per language,
    ratio = |tokens ∩ profile| / |tokens|; lang = argmax ratio (ties to
    the alphabetically first language), or 'unknown' below ``min_ratio``.

    Pure native SQL (split/filter/array_sort — map-only, scan speed at
    100 TB); the DuckDB oracle replays the same ratios and argmax
    relationally. Returns (id, lang, best_ratio)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    nt = F.greatest(F.size(toks), F.lit(1))
    scored = F.array(
        *[
            F.struct(
                (
                    -F.size(F.filter(toks, lambda t: t.isin(LANG_PROFILES[lang])))
                    / nt
                ).alias("neg"),
                F.lit(i).alias("idx"),
            )
            for i, lang in enumerate(LANGS)
        ]
    )
    best = F.array_sort(scored)[0]
    lang_arr = F.array(*[F.lit(lang) for lang in LANGS])
    ratio = -best["neg"]
    return df.select(
        F.col(id_col),
        F.when(ratio >= min_ratio, lang_arr[best["idx"]])
        .otherwise(F.lit("unknown"))
        .alias("lang"),
        F.round(ratio, 9).alias("best_ratio"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalized-document fingerprint: md5 of lowercased,
    whitespace-collapsed text (portable rolling-hash stand-in)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def _chars_expr(word_col: str):
    """array of single characters of ``word_col`` (portable: same shape
    as DuckDB list_transform(range(...), i -> word[i:i]))."""
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
    )


def _merge_fold(syms, a: str, b: str):
    """Greedy left-to-right application of ONE merge (a, b) -> a||b to a
    symbol array, as a native SQL fold: walk the symbols; when the
    accumulated tail is ``a`` and the current symbol is ``b``, replace
    the tail with the merged token. Equivalent to the classical BPE
    merge walk (the merged token a||b is strictly longer than ``a``, so
    a fresh merge can never cascade within the same pass)."""
    return F.aggregate(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.array(F.element_at(syms, 1)),
        lambda acc, s: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 8
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train a byte-pair-encoding merge table ON THE CORPUS as a
    DataFrame job (the classical word-frequency BPE of Sennrich et al.,
    public knowledge) — upgrades the regex-"BPE-ish" token counting to
    real merge-table BPE.

    Scale shape: training runs over the DISTINCT-word frequency table
    (vocabulary << corpus — the standard trick), so each round is one
    explode+groupBy over the vocab plus a native-SQL fold applying the
    chosen merge; one LIMIT-1 row reaches the driver per round. The
    word table is localCheckpoint'ed per round (same discipline as
    connected_components / IVF training). Ties break (count DESC,
    a ASC, b ASC) — fully deterministic, so the DuckDB oracle replays
    every round relationally and lands on the identical table.

    Returns (merges, words) where merges = [(a, b), ...] in training
    order and words = (word, freq, syms) AFTER all merges — i.e. the
    exact BPE encoding of every vocabulary word, ready for a broadcast
    join in ``bpe_token_count``.
    """
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select("word", "freq", _chars_expr("word").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = words.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("s"))
            .orderBy(F.desc("s"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.withColumn("syms", _merge_fold(F.col("syms"), a, b)).localCheckpoint(
            eager=True
        )
    return merges, words


def bpe_token_count(
    df: DataFrame, text_col: str, id_col: str, words: DataFrame
) -> DataFrame:
    """Per-document BPE token count under a trained vocabulary: join
    each word occurrence against the (small, broadcast) encoded vocab;
    unseen words fall back to character-level (their length). Docs with
    zero letter-run words produce no row (same as the SQL twin).
    Returns (id, n_words, n_bpe_tokens)."""
    vocab = F.broadcast(words.select("word", F.size("syms").alias("__wlen")))
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)
            )
        ).alias("word"),
    )
    return (
        toks.join(vocab, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("__wlen"), F.length("word"))).alias(
                "n_bpe_tokens"
            ),
        )
    )


PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — applied in order; simple \d/\b
    # classes only, which Java regex (Spark) and RE2 (DuckDB) treat
    # identically, so oracles can replay the redaction byte-for-byte
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
]


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Training-data PII scrubbing: count and redact emails, SSN-shaped
    and US-phone-shaped numbers (the standard pre-training hygiene
    pass). Counts are taken on the ORIGINAL text (order-independent);
    redaction applies the patterns in a fixed order (SSN before phone —
    3-2-4 never matches the 3-3-4 phone shape, but the fixed order
    makes the composition deterministic regardless). All native
    regexp_* — map-only scan-speed; returns
    (id, n_email, n_ssn, n_phone, redacted)."""
    out = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    red = F.col("__t")
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all("__t", F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        red = F.regexp_replace(red, pat, rep)
    return out.select(F.col(id_col), *counts, red.alias("redacted"))


def surprisal_score(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 50_000
) -> DataFrame:
    """Corpus-TRAINED statistical quality scoring: per-token surprisal
    from the corpus's own unigram counts, in INTEGER-EXACT form so any
    engine reproduces every score bit-for-bit (no log/libm — one
    transcendental ulp would poison a hash comparison):

        surprisal(tok) = len(bin(total)) - len(bin(count(tok) + 1))

    i.e. floor(log2 total) - floor(log2 (count+1)) — a staircase
    -log2 p estimate, clamped at 0 (a token holding nearly ALL the mass
    can make the raw difference -1, e.g. total=1, count=1). Rare/unseen
    tokens (outside the ``top_k`` vocab, count := 0) score the maximum;
    boilerplate scores ~0. A document's
    sum is an exact bigint, ORDER-FREE (integer addition commutes), so
    no sequential-fold discipline is needed.

    Scale shape: one groupBy to train the vocabulary (top_k by count
    desc, token asc — deterministic), one scalar total, a broadcast
    join to score occurrences, one groupBy per doc. Docs with zero
    tokens produce no row (SQL-twin semantics).
    Returns (id, n_tokens, sum_surprisal)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    # materialize the count table ONCE: `total` needs an eager action
    # anyway, and without the checkpoint the tokenize+groupBy pipeline
    # would re-run for the broadcast vocab (the minhash
    # materialize_sigs discipline)
    counts = toks.groupBy("tok").agg(F.count("*").alias("__c")).localCheckpoint(
        eager=True
    )
    total = counts.agg(F.sum("__c")).collect()[0][0] or 0
    vocab = F.broadcast(
        counts.orderBy(F.desc("__c"), F.asc("tok")).limit(top_k)
    )
    total_bits = len(bin(int(total))) - 2 if total > 0 else 1  # len(bin(total))
    surprisal = F.greatest(
        F.lit(total_bits) - F.length(F.expr("bin(coalesce(__c, 0) + 1)")),
        F.lit(0),
    )
    return (
        toks.join(vocab, "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(surprisal).cast("long").alias("sum_surprisal"),
        )
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, w: int = 8
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    local algorithm, public knowledge) — replaces the md5-of-whole-text
    stand-in with the real thing: hash every k-gram, slide a w-window
    over the hash sequence, keep the minimum of each window (ties to the
    RIGHTMOST position — the standard rule), emit the distinct selected
    (position, hash) pairs.

    Guarantee: any substring match of length >= w + k - 1 between two
    documents shares at least one fingerprint, and the fingerprint
    density is ~2/(w+1) — the plagiarism/near-dup detector shape.

    The hash is the 16-hex-char md5 prefix COMPARED AS A STRING:
    winnowing only needs a consistent total order, and lexicographic
    hex compares identically in any engine (no 64-bit signed-conversion
    pitfalls). Entirely native SQL — one map pass, no shuffle before
    the final projection. Returns (id, pos, gram_hash).

    Round-10 rework, row-for-row identical output: per-window minima
    come from a SPARSE-TABLE doubling (log2(w) zip_with passes build
    M_d[i] = rightmost-min over [i, i+d-1]; a window of w is the
    combine of two overlapping power-of-two spans — the combine is
    idempotent so the overlap is harmless), replacing the O(len·w)
    per-window slice+reverse+array_min form; and the distinct pass is
    an O(len) ADJACENT dedup — the same (h, p) is selected by a
    contiguous run of windows (if windows j < j' both select p, every
    element of an in-between window lies in window j or j', where p
    beat it), so array_distinct's quadratic struct scan was pure
    overhead. Measured ~4× end-to-end on the sf0.1 corpus."""
    # same hazard as shingles(): the per-doc O(len·log w) HOF chain is
    # interpreted (lambdas never reach codegen) and the corpus often
    # arrives as ONE parquet file = one partition — spread the docs
    # first or the whole map pass runs on a single core (measured: the
    # entire 7-8 s of this operator at sf0.1 was one-core execution)
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par, id_col)
    hash_expr = (
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring(md5(substring({text_col}, i, {k})), 1, 16))"
    )
    # (h, p) pairs; rightmost-min combine = smaller h, ties to larger p
    pairs_expr = "transform(__h, (x, i) -> named_struct('h', x, 'p', i + 1))"
    cmp = (
        "CASE WHEN {a}.h < {b}.h THEN {a} WHEN {b}.h < {a}.h THEN {b} "
        "WHEN {a}.p >= {b}.p THEN {a} ELSE {b} END"
    )
    p2 = 1 << (max(1, w).bit_length() - 1)  # largest power of two <= w
    m = pairs_expr
    d = 1
    while d < p2:
        m = (
            f"zip_with(slice({m}, 1, size(__h) - {2 * d - 1}),"
            f" slice({m}, {1 + d}, size(__h) - {2 * d - 1}),"
            f" (a, b) -> {cmp.format(a='a', b='b')})"
        )
        d *= 2
    if p2 == w:
        win_expr = m
    else:
        nw = f"size(__h) - {w - 1}"
        win_expr = (
            f"zip_with(slice({m}, 1, {nw}), slice({m}, {1 + w - p2}, {nw}),"
            f" (a, b) -> {cmp.format(a='a', b='b')})"
        )
    # docs shorter than one full window: single window over the whole
    # hash sequence = rightmost-min fold of all pairs
    fold_expr = (
        f"array(aggregate({pairs_expr},"
        f" cast(null as struct<h: string, p: integer>),"
        f" (acc, x) -> CASE WHEN acc IS NULL THEN x "
        f"WHEN x.h < acc.h THEN x WHEN acc.h < x.h THEN acc "
        f"WHEN x.p >= acc.p THEN x ELSE acc END))"
    )
    sel_expr = f"CASE WHEN size(__h) >= {w} THEN {win_expr} ELSE {fold_expr} END"
    dedup_expr = (
        f"filter(zip_with(__w,"
        f" concat(array(cast(null as struct<h: string, p: integer>)),"
        f" slice(__w, 1, greatest(size(__w) - 1, 0))),"
        f" (c, pr) -> if(pr IS NULL OR c.h != pr.h OR c.p != pr.p, c,"
        f" cast(null as struct<h: string, p: integer>))),"
        f" x -> x IS NOT NULL)"
    )
    return (
        df.select(F.col(id_col), F.expr(hash_expr).alias("__h"))
        .select(id_col, F.expr(sel_expr).alias("__w"))
        .select(id_col, F.explode(F.expr(dedup_expr)).alias("fp"))
        .select(
            F.col(id_col),
            F.col("fp.p").cast("long").alias("pos"),
            F.col("fp.h").alias("gram_hash"),
        )
    )


def bpe_token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """BPE-ish regex token counting (native SQL, oracle-portable):
    tokens are letter runs, digit runs, or single non-space symbols —
    the pre-tokenization shape BPE vocabularies split on. Emits the
    token count, distinct-token count, and subword-budget estimate
    (letters/4 heuristic for letter runs, 1 per symbol/digit-run)."""
    # pattern passed as a lit (not an expr string) — Spark SQL string
    # literals escape-process backslashes, silently dropping the \s
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    toks = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
    letter_runs = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    subword_est = F.aggregate(
        F.transform(
            letter_runs, lambda t: (F.length(t) + F.lit(3)).cast("long") / F.lit(4)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) + (F.size(toks) - F.size(letter_runs)).cast("double")
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(subword_est, 6).alias("subword_estimate"),
    )


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark DECONTAMINATION — the standard pre-training hygiene
    pass: flag every training document sharing at least one word
    ``n``-gram with an evaluation set (the classic 13-gram rule, n
    configurable). Returns (id, n_hits) for CONTAMINATED docs only,
    where n_hits counts DISTINCT benchmark grams found in the doc.

    Scale shape: the benchmark gram set is tiny next to the corpus (an
    eval suite vs 100 TB), so the join broadcasts; both sides reduce to
    md5 gram hashes first (16 bytes/gram, never the text), and the
    whole pipeline is one explode + one distinct + one equi-join + one
    groupBy — no Python anywhere. With a large benchmark the same plan
    degrades gracefully to a shuffled hash join on the gram hash.

    Tokens are lowercase whitespace words; a doc with fewer than ``n``
    tokens has no grams (the sequence() guard matters: Spark's
    sequence(0, size-n) DESCENDS when size < n).
    """

    def grams(df: DataFrame, t_col: str, i_col: str, out_id: str) -> DataFrame:
        toks = F.filter(
            F.split(F.lower(F.trim(F.col(t_col))), r"\s+"),
            lambda x: F.length(x) > 0,
        )
        g = F.transform(
            F.sequence(F.lit(0), F.size(F.col("__toks")) - F.lit(n)),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))
            ),
        )
        return (
            df.select(F.col(i_col).alias(out_id), toks.alias("__toks"))
            .where(F.size("__toks") >= n)
            .select(out_id, F.explode(g).alias("gram"))
            .dropDuplicates([out_id, "gram"])
        )

    bench = F.broadcast(
        grams(benchmark, bench_text_col, bench_id_col, "__bid").select("gram").distinct()
    )
    hits = grams(docs, text_col, id_col, id_col).join(bench, "gram")
    return hits.groupBy(id_col).agg(F.count("*").cast("long").alias("n_hits"))


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, exact-integer-derived:
    per document the duplicate word-2-gram and 3-gram fractions
    ((total - distinct)/total; 0.0 when the doc has no such grams) and
    the share of the most frequent token. High values mark the
    boilerplate/spam/looping documents a pre-training filter drops.

    dup fractions are a pure native map pass (array_distinct is O(len));
    the top-token share pays ONE (doc, token) groupBy + a per-doc join.
    The two legs are deliberately SEPARATE frames joined on the id: a
    single select that computes the fractions next to an explode gets
    projection-collapsed by Catalyst so the O(len) array expressions
    re-evaluate per TOKEN row — O(len²) per document (measured 37 s vs
    ~3 s on 5k long docs).
    Returns (id, n_tokens, dup2_frac, dup3_frac, top_token_share),
    fractions rounded to 9 for hash-stable comparison."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = docs.select(F.col(id_col), toks.alias("__toks")).where(
        F.size("__toks") > 0
    )

    def dup_frac(nn: int):
        g = F.transform(
            F.sequence(F.lit(0), F.size(F.col("__toks")) - F.lit(nn)),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, nn)),
        )
        total = F.size(F.col("__toks")) - F.lit(nn - 1)
        return F.when(
            F.size(F.col("__toks")) >= nn,
            F.round(
                (total - F.size(F.array_distinct(g))).cast("double")
                / total.cast("double"),
                9,
            ),
        ).otherwise(F.lit(0.0))

    per_doc = base.select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        dup_frac(2).alias("dup2_frac"),
        dup_frac(3).alias("dup3_frac"),
    )
    top = (
        base.select(id_col, F.explode("__toks").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__mc"))
    )
    return per_doc.join(top, id_col).select(
        id_col,
        "n_tokens",
        "dup2_frac",
        "dup3_frac",
        F.round(
            F.col("__mc").cast("double") / F.col("n_tokens").cast("double"), 9
        ).alias("top_token_share"),
    )
