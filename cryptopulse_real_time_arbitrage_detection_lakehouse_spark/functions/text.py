"""Text-analysis building blocks for LLM-data-pipeline workloads.

All hot-path logic is built-in Column expressions (JVM codegen, no Python
UDFs): tokenization via regexp split, n-gram shingling via higher-order
array functions, hashing via md5. Every helper has an exact DuckDB twin so
the queries in ``plans/text.py`` are oracle-checkable.

Scale notes: everything here is row-local (narrow, no shuffle); shingling
multiplies row width ~tokens x shingle-size but stays inside the scan
stage. The dedup/similarity pipelines built on top shuffle only digests
and doc ids, never full documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expr import bind  # noqa: F401  (re-export; text kernels use it heavily)

#: tiny per-language stopword profiles for the n-gram/wordlist language-id
#: heuristic (deterministic, SQL-expressible in both engines).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "y", "los"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2"),
}


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens. DuckDB twin:
    ``string_split_regex(lower(trim(text)), '\\s+')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


SQL_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct). DuckDB twin: ``list_distinct(
    list_transform(range(1, len(t) - {n-2}), i -> concat_ws(' ', ...)))``."""
    # One slice() per position, not n element_at()s: expressions outside a
    # higher-order-function lambda are RE-EVALUATED on every reference
    # inside it, so when `toks` is an unmaterialized split(text) each
    # element_at re-tokenized the whole document — n references per
    # position made shingling O(positions * n * doc_len). slice references
    # `toks` once per position (measured 4x faster at sf0.1, 12x when
    # combined with a materialized token column).
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # Documents with fewer than n tokens produce NO shingles. Unguarded,
    # sequence(0, size-n) would run DESCENDING for size<n and element_at
    # would throw; the DuckDB twin's range() returns [] in that case, so
    # the guard keeps both engines at "empty list".
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def sql_shingles(toks_expr: str, n: int = 3) -> str:
    """DuckDB twin of `shingles`; pass a simple column name (it is indexed
    repeatedly), e.g. via a CTE that materializes the token list first."""
    cat = ", ".join(f"({toks_expr})[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len({toks_expr}) - {n - 2}), "
        f"i -> concat_ws(' ', {cat})))"
    )


def shingles_all(toks: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicities (no distinct) — for repetition
    metrics, where how often a gram repeats is the signal `shingles`'s
    dedup would erase. Same slice construction and same <n-token guard."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def sql_shingles_all(toks_expr: str, n: int = 2) -> str:
    """DuckDB twin of `shingles_all`."""
    cat = ", ".join(f"({toks_expr})[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, len({toks_expr}) - {n - 2}), "
        f"i -> concat_ws(' ', {cat}))"
    )


#: MinHash universal-hash family h_i(x) = (a_i*x + b_i) mod P over a base
#: hash x = first 32 bits of md5(shingle). One md5 per shingle total (the
#: salted-md5 alternative costs num_hashes md5s per shingle — at 16 hashes
#: that is the whole pipeline's CPU bill). P = 2^31-1 keeps every
#: intermediate below 2^62: exact in signed-64 arithmetic in both engines.
MINHASH_P = 2147483647
_minhash_rng = __import__("random").Random(0xC0FFEE)
MINHASH_AB: tuple[tuple[int, int], ...] = tuple(
    (_minhash_rng.randrange(1, MINHASH_P), _minhash_rng.randrange(0, MINHASH_P))
    for _ in range(64)
)


def minhash_base(shingle_col: Column) -> Column:
    """Per-shingle 32-bit base hash reduced mod P (``array<bigint>``).

    Keep this in its OWN select stage, then feed the materialized column to
    :func:`minhash_signature`: Catalyst's CollapseProject leaves a
    multiply-referenced non-cheap alias alone, so the md5 runs once per
    shingle instead of once per (shingle, hash-id)."""
    return F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % MINHASH_P,
    )


def minhash_signature(base_col: Column, num_hashes: int) -> Column:
    """MinHash signature from :func:`minhash_base` output: per hash id i,
    ``min((a_i*x + b_i) mod P)`` over the base hashes. Pure integer
    multiply-add, identical in Spark and DuckDB."""
    def _h(a: int, b: int):
        # closure (not default args: PySpark derives lambda arity from the
        # Python signature, so extra params would break the 1-arg transform)
        return lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P

    return F.array(
        *[
            F.array_min(F.transform(base_col, _h(a, b)))
            for a, b in MINHASH_AB[:num_hashes]
        ]
    )


def sql_minhash_base(shingle_expr: str) -> str:
    """DuckDB twin of :func:`minhash_base`."""
    return (
        f"list_transform({shingle_expr}, s -> "
        f"CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) % {MINHASH_P})"
    )


def sql_minhash_signature(base_expr: str, num_hashes: int) -> str:
    mins = ", ".join(
        f"list_aggregate(list_transform({base_expr}, "
        f"x -> ({a} * x + {b}) % {MINHASH_P}), 'min')"
        for a, b in MINHASH_AB[:num_hashes]
    )
    return f"[{mins}]"


def count_in_set(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in a word set (stopword/profile counting).
    DuckDB twin: ``len(list_filter(t, x -> x IN (...)))``."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def sql_count_in_set(toks_expr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, x -> x IN ({lst})))"


def token_hashes16(toks: Column) -> Column:
    """Per-token 16-bit hash (first 4 hex chars of md5) as ``array<int>``.

    Materialize this in its OWN projection stage before calling
    :func:`simhash16` on the result: the md5 then runs once per token,
    and the 16 per-bit vote folds below operate on cheap ints. (The
    wide single-fold kernel of :func:`simhash_bits` hashes once too,
    but its per-token 16-wide array allocations measured ~2x SLOWER
    than 16 integer folds over a materialized hash array at 16 bits —
    the fold wins only at 32+ bits where re-hashing would dominate.)
    """
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
    )


def simhash16(th: Column) -> Column:
    """16-bit SimHash fingerprint over pre-hashed tokens
    (:func:`token_hashes16`).

    Per bit, vote +1/-1 across token hashes; fingerprint bit = sign of
    the vote. All integer arithmetic — exact in both engines. 16 bits
    keeps the expression tree small; use :func:`simhash_bits` for wider
    production fingerprints.
    """

    def _vote(bit: int):
        # closure (not a default arg: PySpark derives lambda arity from the
        # Python signature, so extra params would break the 2-arg merge fn)
        mask = 2**bit
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    bits = []
    for b in range(16):
        vote = F.aggregate(th, F.lit(0), _vote(b))
        bits.append(F.when(vote > 0, F.lit(2**b)).otherwise(F.lit(0)))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out


def simhash_bits(toks: Column, nbits: int = 32, hex_offset: int = 0) -> Column:
    """``nbits``-bit SimHash fingerprint as a single BIGINT.

    Generalizes :func:`simhash16`: the per-token hash takes ``nbits/4``
    hex chars of md5 starting at ``hex_offset``, each bit's vote is the
    sign of ``2*count(tokens with bit set) - n_tokens``. Single pass: one
    ``aggregate`` folds every token into an ``nbits``-wide count vector
    (so md5 runs ONCE per token, not once per bit — the per-bit
    ``size(filter(...))`` formulation re-hashed every token 32 times and
    dominated the query's runtime), then one pass over the count vector
    assembles the fingerprint. ``pow(2, b)`` is exact for b <= 62 in
    doubles, so the cast back to long is lossless. Row-local,
    integer-exact in both engines.

    ``nbits`` must stay <= 32 per call: the per-token hash and the bit
    weights live in the double-exact / positive-BIGINT range on both
    engines. WIDER fingerprints compose words via ``hex_offset`` —
    e.g. a 64-bit fingerprint is the pair ``(simhash_bits(t, 32, 0),
    simhash_bits(t, 32, 8))``, disjoint md5 hex ranges making the words
    independent — which avoids every int64 sign/overflow hazard a single
    64-bit BIGINT fingerprint would hit (bit-63 weight, unsigned hex
    parse, arithmetic-vs-logical shift divergence between engines).
    """
    if nbits > 32:
        raise ValueError("nbits > 32: compose words via hex_offset instead")
    nhex = nbits // 4
    th = F.transform(
        toks,
        lambda t: F.conv(
            F.substring(F.md5(t), hex_offset + 1, nhex), 16, 10
        ).cast("long"),
    )
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.lit(nbits - 1))
    counts = F.aggregate(
        th,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, h: F.zip_with(
            acc,
            # shiftright needs a literal shift amount, so extract bit b as
            # floor(h / 2^b) % 2 — division by a power of two is exact in
            # doubles for h < 2^53, and the 32-bit token hash is far below.
            F.transform(
                idx,
                lambda b: F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long")
                % F.lit(2).cast("long"),
            ),
            lambda a, x: a + x,
        ),
    )
    weighted = F.zip_with(
        counts,
        idx,
        lambda c, b: F.when(
            c * 2 > n, F.pow(F.lit(2.0), b.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)


def sql_simhash_bits(toks_expr: str, nbits: int = 32, hex_offset: int = 0) -> str:
    """DuckDB twin of :func:`simhash_bits` (scalar subquery so the token
    hash list materializes once)."""
    if nbits > 32:
        raise ValueError("nbits > 32: compose words via hex_offset instead")
    nhex = nbits // 4
    th = (
        f"list_transform({toks_expr}, "
        f"t -> CAST(('0x' || substring(md5(t), {hex_offset + 1}, {nhex})) AS BIGINT))"
    )
    terms = []
    for b in range(nbits):
        setc = f"len(list_filter(__th, h -> (h >> {b}) & 1 = 1))"
        terms.append(
            f"(CASE WHEN {setc} * 2 > len(__th) THEN CAST({2**b} AS BIGINT) "
            f"ELSE 0 END)"
        )
    return f"(SELECT {' + '.join(terms)} FROM (SELECT {th} AS __th))"


def sql_simhash16(toks_expr: str) -> str:
    th = (
        f"list_transform({toks_expr}, "
        f"t -> CAST(('0x' || substring(md5(t), 1, 4)) AS INTEGER))"
    )
    terms = []
    for b in range(16):
        vote = (
            f"list_sum(list_transform(__th, h -> CASE WHEN (h // {2**b}) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2**b} ELSE 0 END)")
    return f"(SELECT {' + '.join(terms)} FROM (SELECT {th} AS __th))"


#: PII patterns kept inside the Java-regex ∩ RE2 common subset (no
#: lookaround, no backreferences) so Spark and the DuckDB oracle match the
#: same spans. Order matters for redaction: URLs first (they may embed
#: '@' and dotted hosts that the email/IP patterns would also hit).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("url", r"https?://[^\s]+"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
)


def pii_count(text_col: Column, pattern: str) -> Column:
    """Number of matches of one PII pattern (row-local, JVM regex)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(pattern), F.lit(0)))


def sql_pii_count(text_expr: str, pattern: str) -> str:
    """DuckDB twin of `pii_count`."""
    return f"len(regexp_extract_all({text_expr}, '{pattern}'))"


def redact_pii(text_col: Column) -> Column:
    """Replace every PII span with a ``<KIND>`` placeholder, applying the
    patterns in `PII_PATTERNS` order (URL before email/IP so a URL's
    userinfo/host is consumed as one URL, not re-matched piecemeal)."""
    out = text_col
    for kind, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{kind.upper()}>")
    return out


def sql_redact_pii(text_expr: str) -> str:
    """DuckDB twin of `redact_pii` (the ``'g'`` flag makes DuckDB replace
    every match, which is Spark's default)."""
    out = text_expr
    for kind, pattern in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '<{kind.upper()}>', 'g')"
    return out
