"""DuckDB oracle-SQL builders that share parameters (shingle size, hash
count, band layout, hyperplanes) with the Spark operators so both sides
compute the same function — including accumulation order for float math."""

from __future__ import annotations


def words_sql(text: str) -> str:
    return f"string_split_regex(trim({text}), '\\s+')"


def shingles_sql(text: str, n: int) -> str:
    """Word n-gram distinct shingles; whole-doc fallback when shorter than n.
    Mirrors dedup.word_shingles."""
    w = words_sql(text)
    joined = " || ' ' || ".join(f"__W__[i+{k + 1}]" for k in range(n))
    return (
        f"(CASE WHEN len(__W__) >= {n} THEN "
        f"list_distinct(list_transform(range(0, len(__W__)-{n}+1), i -> {joined})) "
        f"ELSE [array_to_string(__W__, ' ')] END)"
    ).replace("__W__", f"({w})")


def minhash_sig_sql(shingles: str, num_hashes: int) -> str:
    """Array of per-hash md5-hex minima; mirrors dedup.minhash_signature."""
    mins = ", ".join(
        f"list_min(list_transform({shingles}, s -> md5('{i}:' || s)))"
        for i in range(num_hashes)
    )
    return f"[{mins}]"


def band_selects_sql(num_hashes: int, bands: int) -> list[tuple[int, str]]:
    """Per-band (band_no, bucket_expr-over-`sig`) for LSH banding; mirrors
    dedup.minhash_lsh_pairs (concat_ws '|')."""
    r = num_hashes // bands
    out = []
    for b in range(bands):
        expr = " || '|' || ".join(f"sig[{b * r + j + 1}]" for j in range(r))
        out.append((b, expr))
    return out


def simhash_bits_sql(text: str, num_bits: int) -> str:
    """Mirrors dedup.simhash_bits: md5 per word, nibble bit → ±1, sum sign."""
    w = words_sql(text)
    bits = []
    for b in range(num_bits):
        pos = b // 4 + 1
        mask = 1 << (3 - b % 4)
        bit = (
            f"CASE WHEN ((instr('0123456789abcdef', substring(h, {pos}, 1)) - 1)"
            f" & {mask}) > 0 THEN 1 ELSE -1 END"
        )
        bits.append(
            f"CASE WHEN list_sum(list_transform(__H__, h -> {bit})) > 0 "
            f"THEN 1 ELSE 0 END"
        )
    arr = ", ".join(bits)
    return f"[{arr}]".replace("__H__", f"list_transform({w}, t -> md5(t))")


def dot_sql(a: str, b: str) -> str:
    """Sequential-order dot product of two DOUBLE[] lists (mirrors the Spark
    left fold: (0+p1)+p2+… — list_dot_product accumulates in list order)."""
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)} / "
        f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
    )


def double_list_literal(values: list[float]) -> str:
    return "[" + ", ".join(f"{v!r}::DOUBLE" for v in values) + "]"


STOPWORD_LIST_SQL = (
    "['the','a','an','of','to','in','and','or','is','are',"
    "'for','on','with','as','by','at','from','this','that','it']"
)


def stopword_ratio_sql(text: str) -> str:
    w = f"string_split_regex(trim(lower({text})), '\\s+')"
    hits = f"len(list_filter({w}, t -> list_contains({STOPWORD_LIST_SQL}, t)))"
    return f"({hits} / greatest(len({w}), 1))"


def punct_ratio_sql(text: str) -> str:
    n = f"len(regexp_extract_all({text}, '[^A-Za-z0-9 ]'))"
    return f"({n} / greatest(length({text}), 1))"


def mean_word_length_sql(text: str) -> str:
    w = words_sql(text)
    return (
        f"(list_sum(list_transform({w}, t -> length(t))) / "
        f"greatest(len({w}), 1))"
    )


def quality_score_sql(text: str) -> str:
    """Mirrors text.quality_score term by term (same operand order)."""
    length_ok = (
        f"(CASE WHEN length({text}) >= 50 THEN 1.0::DOUBLE "
        f"ELSE length({text}) / 50.0::DOUBLE END)"
    )
    sw_ok = f"least({stopword_ratio_sql(text)} * 4.0::DOUBLE, 1.0::DOUBLE)"
    punct_ok = (
        f"(1.0::DOUBLE - least({punct_ratio_sql(text)} * 4.0::DOUBLE, "
        f"1.0::DOUBLE))"
    )
    wl = mean_word_length_sql(text)
    wl_ok = (
        f"(CASE WHEN {wl} >= 3.0 AND {wl} <= 10.0 THEN 1.0::DOUBLE "
        f"ELSE 0.5::DOUBLE END)"
    )
    return (
        f"round(0.25::DOUBLE * {length_ok} + 0.25::DOUBLE * {sw_ok} + "
        f"0.25::DOUBLE * {punct_ok} + 0.25::DOUBLE * {wl_ok}, 6)"
    )


def fingerprint_sql(text: str, ngram: int = 5) -> str:
    """Mirrors text.fingerprint: min md5 over word n-grams."""
    w = words_sql(text)
    joined = " || ' ' || ".join(f"__W__[i+{k + 1}]" for k in range(ngram))
    grams = f"list_transform(range(0, len(__W__)-{ngram}+1), i -> md5({joined}))"
    return (
        f"(CASE WHEN len(__W__) >= {ngram} THEN list_min({grams}) "
        f"ELSE md5(array_to_string(__W__, ' ')) END)"
    ).replace("__W__", f"({w})")


def bloom_positions_sql(expr: str, k: int, m: int, seed: str = "bloom") -> str:
    """Mirrors sketches.bloom_hash_positions: list of the k Bloom bit
    positions of ``expr`` (md5_mod with seeds ``{seed}0..{seed}{k-1}``)."""
    return "[" + ", ".join(md5_mod_sql(expr, f"{seed}{i}", m) for i in range(k)) + "]"


def md5_mod_sql(expr: str, seed, mod: int = 10_000) -> str:
    """Mirrors sampling.md5_mod: first 8 md5 hex chars of 'seed:value'
    folded to an integer by nibble arithmetic (exact in doubles)."""
    h = f"md5('{seed}:' || CAST({expr} AS VARCHAR))"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {float(16 ** (7 - i))}"
        for i in range(8)
    )
    return f"(CAST(({terms}) AS BIGINT) % {mod})"
