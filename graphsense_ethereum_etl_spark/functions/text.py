"""Text-analysis column operators for the LLM-data-pipeline surface
(north star, BASELINE.json): tokenization, shingling, quality scoring,
language-ID heuristics, fingerprinting.

All pure Catalyst expressions (whole-stage codegen; no Python UDFs) so they
hold up on a 100 TB documents table: every op is per-row, embarrassingly
parallel, no shuffle.

Cross-engine notes (DuckDB oracle parity): tokenization is
``split(trim(text), '\\s+')`` whose regex semantics agree between Java regex
and RE2 for whitespace; ratio metrics use a single IEEE double division
(deterministic bit-for-bit in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic: the point is the operator
# shape (set-membership scoring + argmax), not linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization: ``split(trim(text), '\\s+')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    c = tokens(text)
    return F.size(c).cast("bigint")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("bigint")


# GPT-2-style pre-tokenizer approximation (the "BPE-ish regex" counter): a
# piece is an English contraction suffix, an optionally-space-prefixed letter
# run, digit run, or punctuation run. Whitespace itself is not a piece. Plain
# alternation only — no backreferences/lookarounds — so Java regex (Spark)
# and RE2 (DuckDB regexp_extract_all) agree token-for-token, which is what
# makes the count oracle-checkable. This approximates tiktoken-style piece
# counts for budgeting/stats; it is NOT a byte-pair merge (no vocab).
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """Array of BPE-ish pieces of ``text`` (see ``BPE_ISH_PATTERN``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    """Piece count under the BPE-ish pre-tokenizer — the training-data
    token-budget estimator (whitespace token counts undercount code/punct
    heavy text; piece counts track subword tokenizers much closer)."""
    return F.size(bpe_ish_tokens(text)).cast("bigint")


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word ``k``-grams (the MinHash/Jaccard input set).

    Implemented as ``zip_with`` over k shifted ``slice``s of the token array
    rather than indexed ``element_at`` lambdas — the indexed form drops out
    of codegen and runs ~7× slower (27µs/gram measured). Documents shorter
    than ``k`` tokens yield an empty array.
    """
    w = tokens(text)
    count = F.size(w) - (k - 1)
    acc = F.slice(w, 1, count)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(w, j + 1, count), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.when(F.size(w) >= k, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (hex string, so the
    oracle comparison stays on strings)."""
    return F.md5(normalized_text(text))


def gopher_keep(
    text: Column | str,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    min_alpha_word_ratio: float = 0.7,
    min_stopword_hits: int = 1,
    stopwords: tuple = ("the", "a", "of", "and", "to"),
) -> Column:
    """The Gopher quality-rule verdict (Rae et al. 2021 §A1.1) as one
    Column: token-count bounds, mean-token-length band, fraction-of-
    words-with-an-alphabetic-char floor, minimum stopword-hit count —
    the t12 bundle as a reusable predicate (cur1's pipeline gate and
    the CLI `corpus curate` stage-1 filter). Pure Catalyst over one
    tokenization; defaults scaled to the synthetic corpus (published
    thresholds: 50..100k tokens, 3..10 chars, 0.8, 2 stopwords)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), r"\s+")
    n_tok = F.size(toks).cast("bigint")
    return (
        n_tok.between(min_tokens, max_tokens)
        & (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
            / n_tok.cast("double")
        ).between(min_mean_token_len, max_mean_token_len)
        & (
            F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
            / n_tok.cast("double")
            >= min_alpha_word_ratio
        )
        & (
            F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(s) for s in stopwords]),
                )
            )
            >= min_stopword_hits
        )
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround, alternation-free (the two
# engines differ on leftmost-first vs leftmost-longest alternation).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(text: Column | str) -> Column:
    """Training-data scrubbing: replace email addresses then IPv4 literals
    with typed placeholders. Emails first — an address can embed digits and
    dots that would otherwise half-match the IP pattern. Pure Catalyst
    ``regexp_replace`` (replaces ALL occurrences; the DuckDB oracle needs
    the explicit 'g' flag for the same semantics)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, IPV4_RE, "<IP>")


def dup_shingle_ratio(text: Column | str, k: int = 3) -> Column:
    """Gopher-style repetition signal: the fraction of word ``k``-grams that
    are duplicates of an earlier one — 1 − |distinct k-grams| / |k-grams|.
    High values flag boilerplate/spam/looping text. 0.0 for documents
    shorter than ``k`` tokens (nothing repeats in an empty set)."""
    w = tokens(text)
    total = F.greatest(F.size(w) - (k - 1), F.lit(0))
    distinct = F.size(shingles(text, k))
    return F.when(
        total > 0,
        F.round(
            (total - distinct).cast("double") / total.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def alpha_ratio(text: Column | str) -> Column:
    """Share of [a-z] characters after lowercasing — quality signal.
    NULL for empty (or NULL) text: there is no signal in zero characters,
    and the unguarded division is a DIVIDE_BY_ZERO crash under ANSI mode
    (found via score_documents on an empty-string document, r6)."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    return F.when(
        F.length(c) > 0,
        F.length(F.regexp_replace(c, "[^a-z]", "")).cast("double")
        / F.length(c).cast("double"),
    )


def mean_token_length(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    w = tokens(c)
    total = F.aggregate(
        F.transform(w, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(w).cast("double")


def stopword_score(text: Column | str, lang: str) -> Column:
    """Number of distinct stopwords of ``lang`` present in the document."""
    sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens(text), sw)).cast("bigint")


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword scores with a
    deterministic tie-break (declaration order in LANG_STOPWORDS); 'und' when
    no stopword hits at all."""
    scores = {lang: stopword_score(text, lang) for lang in LANG_STOPWORDS}
    langs = list(LANG_STOPWORDS)
    best = None
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other == lang:
                continue
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            else:
                cond = cond & (scores[lang] >= scores[other])
        branch = F.when(cond, F.lit(lang))
        best = branch if best is None else best.when(cond, F.lit(lang))
    return F.coalesce(best, F.lit("und"))


def hashed_embedding(text: Column | str, dim: int = 16) -> Column:
    """Feature-hashing text embedding (the "hashing trick" — Weinberger,
    Dasgupta, Langford, Smola, Attenberg, ICML 2009): each token hashes to
    one of ``dim`` buckets with a ±1 sign, the vector is the signed bucket
    counts — the classic fixed-width, vocabulary-free featurization, and
    the document→embedding bridge for everything downstream that consumes
    an embedding column (dedup sim2/dd8, ANN sim1-sim7, k-means km1).

    Returns ``array<bigint>`` of length ``dim`` — exact INTEGERS, so the
    column is hash-checkable across engines (no normalization; callers
    that want unit vectors divide by the norm downstream where float
    tolerance is theirs to own). Bucket and sign derive from md5 (smp1's
    engine-independent convention: first 8 hex chars → bucket, 9th hex
    char parity → sign), NOT xxhash64 — in a pure Spark deployment you'd
    swap md5 for xxhash64, same contract, cheaper.

    NULL and empty text produce the zero vector (tokens of '' filter
    away) — documents never vanish from a featurization pass. Pure
    Catalyst: two md5 per token, then one fold over the tagged tokens
    with an array accumulator (a per-bucket outer loop would re-evaluate
    the md5 tagging once PER BUCKET — dim× the hash work; the fold pays
    it once); no explode, no shuffle, embarrassingly parallel."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.trim(F.coalesce(c, F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    return hashed_embedding_tokens(toks, dim)


def hashed_embedding_tokens(tokens: Column, dim: int = 16) -> Column:
    """``hashed_embedding`` over an already-tokenized ``array<string>``
    column — the variant chunk-level featurization needs (a chunk is a
    token slice; re-joining it to text just to re-split would do the
    whitespace work twice). Same md5 bucket/sign convention, same fold,
    same zero-vector-for-empty contract; ``hashed_embedding`` is now a
    tokenize-then-call wrapper so the two can never drift."""
    tagged = F.transform(
        tokens,
        lambda t: F.struct(
            F.pmod(
                F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
                F.lit(dim),
            ).alias("b"),
            F.when(
                F.conv(F.substring(F.md5(t), 9, 1), 16, 10).cast("bigint") % 2
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("s"),
        ),
    )
    return F.aggregate(
        tagged,
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, e: F.transform(
            acc,
            lambda v, i: v
            + F.when(i.cast("bigint") == e["b"], e["s"]).otherwise(
                F.lit(0).cast("long")
            ),
        ),
    )


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an http(s) URL for web-corpus dedup — the
    standard crawl-pipeline normalization (cf. RFC 3986 §6 syntax-based
    normalization plus the tracking-parameter strip every production
    pipeline adds):

      - scheme and host lowercased (case-insensitive by spec);
      - default ports dropped (``:80`` for http, ``:443`` for https —
        NON-default ports are kept: a different port is a different
        origin);
      - fragment dropped (never sent to the server);
      - query parameters SORTED (order is almost always insignificant)
        with ``utm_*`` tracking parameters and empty fragments removed;
      - empty path normalized to ``/``; path case and trailing slashes
        preserved (paths are case-significant by spec).

    Pure Catalyst (regexp_extract / filter / array_sort / concat) — the
    identical pipeline is expressible in ANSI-ish SQL, so the t13 oracle
    hash-checks it. NULL url → NULL."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/:?#]+)", 1))
    port = F.regexp_extract(u, r"^[A-Za-z]+://[^/:?#]+:([0-9]+)", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    nofrag = F.regexp_replace(u, r"#.*$", "")
    path = F.regexp_extract(nofrag, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(nofrag, r"\?(.*)$", 1), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    q = F.array_join(F.array_sort(params), "&")
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part)
