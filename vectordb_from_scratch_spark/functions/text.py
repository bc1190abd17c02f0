"""Text-analysis kernel — Column builders for the LLM-data-pipeline
operators (BASELINE.json north star): tokenization, shingling, MinHash,
quality scoring, language ID, fingerprinting.

The reference has no text surface at all (SURVEY.md §2.6) — these are the
"beyond the reference" operators, built Spark-first:

- everything is built-in `pyspark.sql.functions` (codegen'd, no Python in
  the hot path);
- every function has an exact DuckDB-SQL twin (md5 / regexp_split /
  list_transform produce identical values), so the driver's oracle can
  hash-match them;
- MinHash uses lexicographic-min over md5(seed:shingle) — a valid
  uniform min-hash family that both engines compute identically, instead
  of engine-specific numeric hashes (Spark xxhash64 ≠ DuckDB hash).

Scale: all per-row O(len) expressions — narrow, pipelined, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "token_count",
    "word_shingles",
    "char_ngrams",
    "minhash_sig",
    "fingerprint",
    "quality_features",
    "STOPWORDS_EN",
]

# Tiny embedded English stopword list (public-domain, most frequent words);
# used for stopword-ratio quality features and the lang-id heuristic.
STOPWORDS_EN = (
    "the of and to in a is that it was for on are as with his they at be this "
    "have from or one had by word but not what all were we when your can said"
).split()


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(text: Column | str) -> Column:
    """lower + collapse runs of whitespace + trim — canonical form for
    exact-dup hashing."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the lowercased text, empties removed.
    Oracle twin: list_filter(regexp_split_to_array(lower(t),'\\s+'), x->x!='')."""
    return F.filter(
        F.split(F.lower(_col(text)), r"\s+"),
        lambda x: x != F.lit(""),
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """n-word shingles as space-joined strings; [] when fewer than n words.

    PERF: built from slice+zip_with, NOT element_at inside a transform
    lambda — array arguments of higher-order functions evaluate once per
    row, whereas expressions referenced inside the lambda body re-evaluate
    PER ELEMENT (the tokenizer would re-run O(len²) times per doc).
    Oracle twin (same values): list_transform(range(...), i ->
    concat_ws(' ', w[i], w[i+1], ...)).
    """
    w = tokens(text)
    return shingles_from_tokens(w, n)


def shingles_from_tokens(w: Column, n: int) -> Column:
    cnt = F.greatest(F.size(w) - F.lit(n - 1), F.lit(0))
    acc = F.slice(w, 1, cnt)
    for j in range(2, n + 1):
        nxt = F.slice(w, j, cnt)
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return acc


def hash_embed(text: Column | str, dims: int = 8) -> Column:
    """Deterministic md5-derived pseudo-embedding: dim j = byte j of
    md5(text) scaled to [-0.5, 0.5). The engine-portable STUB for a real
    encoder (no model ships in this container — the production path is
    an Arrow-batched Pandas-UDF encoder, same schema); deterministic so
    the DuckDB oracle reproduces retrieval results value-exactly.
    Requires dims <= 16 (md5 has 16 bytes)."""
    if dims > 16:
        raise ValueError("hash_embed derives at most 16 dims from md5")
    m = F.md5(_col(text).cast("string"))
    alphabet = F.lit("0123456789abcdef")
    vals = []
    for j in range(dims):
        hi = F.instr(alphabet, F.substring(m, 2 * j + 1, 1)) - 1
        lo = F.instr(alphabet, F.substring(m, 2 * j + 2, 1)) - 1
        vals.append(
            ((hi * 16 + lo).cast("double") / F.lit(255.0)) - F.lit(0.5)
        )
    return F.array(*vals)


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Character n-grams of normalized text; [] when shorter than n.

    Same per-element-re-evaluation hazard as word_shingles: split into a
    char array once, then slice+zip_with — never substr(t, i) inside a
    lambda (it would re-run the normalizing regexp per character).
    Oracle twin: list_transform(range(1, len(t)-n+2), i -> t[i:i+n-1]).
    """
    t = normalize_text(text)
    chars = F.filter(F.split(t, ""), lambda c: c != F.lit(""))
    cnt = F.greatest(F.size(chars) - F.lit(n - 1), F.lit(0))
    acc = F.slice(chars, 1, cnt)
    for j in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(chars, j, cnt), lambda a, b: F.concat(a, b))
    return acc


def minhash_sig(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: array of ``num_hashes`` lexicographic minima of
    md5(f"{h}:{shingle}"). Duplicate shingles can't affect a min, so no
    distinct needed. NULL-safe: empty shingle set → array of NULLs.

    This is the batch-build analog of the reference's per-insert index add
    (SURVEY.md H4→"MLlib for batch index build"); hash family is engine-
    portable (md5) so the DuckDB oracle reproduces it bit-for-bit.
    """
    def hash_fn(h: int):
        # NB: must be a 1-arg lambda — a 2-arg lambda in F.transform is
        # interpreted as (element, index) by PySpark.
        prefix = f"{h}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return F.array(
        *[F.array_min(F.transform(shingles, hash_fn(h))).alias(f"mh{h}") for h in range(num_hashes)]
    )


_HEXDIGITS = "0123456789abcdef"


def hex_value_from_md5(md5_col: Column, start: int = 0, digits: int = 4) -> Column:
    """Integer value of hex chars [start, start+digits) of a pre-staged
    md5 hex column — THE shared engine-portable nibble recipe (substr +
    instr only; neither engine's native hash matches the other's).
    Accumulates in LONG, exact up to 15 hex digits; every md5-derived
    integer in this package (token hashes, SimHash words, uniform draws)
    builds on this one helper so the parity contract lives in one place."""
    val = F.lit(0).cast("long")
    for i in range(digits):
        digit = F.instr(F.lit(_HEXDIGITS), F.substring(md5_col, start + i + 1, 1)) - F.lit(1)
        val = val * F.lit(16) + digit.cast("long")
    return val


def token_hash16(tok: Column, word: int = 0) -> Column:
    """Portable 16-bit token hash: integer value of hex chars
    [4·word, 4·word+4) of md5(token) — md5's 32 hex chars yield 8
    independent 16-bit words from ONE digest."""
    return hex_value_from_md5(F.md5(tok), start=4 * word).cast("int")


def hash16_from_md5(md5_col: Column, word: int = 0) -> Column:
    """Same 16-bit word extraction over a PRE-STAGED md5 hex column —
    stage `transform(toks, md5)` once, then derive all words cheaply."""
    return hex_value_from_md5(md5_col, start=4 * word).cast("int")


def simhash16(hashes: Column) -> Column:
    """16-bit SimHash over a PRE-STAGED array of token_hash16 values: bit b
    of the result is set iff Σ_tokens (±1 by bit b of the hash) > 0.
    Duplicate tokens weigh by multiplicity (standard SimHash).

    Callers must stage the hash array as a named column first — the 16
    folds below each re-evaluate their array argument, so passing the
    raw transform(tokens, token_hash16) expression would re-hash 16×.
    Per-row narrow compute, codegen'd, shuffle-free; oracle twin uses
    list_reduce over the same staged list.
    """

    def bit_sum(b: int) -> Column:
        # closure over b — the merge lambda must stay exactly 2-arg
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    out = F.lit(0)
    for b in range(16):
        out = out + F.when(bit_sum(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_text(text))


def quality_features(text: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Deterministic quality-scoring features (length / punctuation /
    stopword / digit ratios) — the heuristic features a pretraining pipeline
    filters on. All replicable in ANSI SQL for the oracle.

    Pass a pre-staged ``toks`` column when calling from an operator so the
    tokenizer isn't re-evaluated per feature.
    """
    t = _col(text)
    n_chars = F.length(t).cast("double")
    if toks is None:
        toks = tokens(t)
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS_EN])))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars),
        "digit_ratio": F.when(n_chars > 0, n_digit / n_chars),
        "distinct_stopwords": stop_hits.cast("double"),
    }
