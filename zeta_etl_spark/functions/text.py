"""Cross-engine-deterministic text hashing/tokenization expression builders.

Both the Spark queries and their DuckDB oracles hash through ``md5`` (the only
hash both engines implement identically) and parse a 60-bit/32-bit prefix into
BIGINT.  All expressions are JVM-side built-ins (whole-stage codegen, no
Python UDFs).
"""

from __future__ import annotations

MAX_LONG = 9223372036854775807

# --- Spark SQL expression fragments ----------------------------------------


def spark_hex2long(expr: str, digits: int = 15) -> str:
    """60-bit (default) unsigned hash of an md5 hex prefix as BIGINT."""
    return f"cast(conv(substr(md5({expr}), 1, {digits}), 16, 10) as bigint)"


def spark_tokens(col: str = "text") -> str:
    return f"split({col}, ' ')"


def spark_shingles(col: str = "text", k: int = 5) -> str:
    """Distinct k-word shingles of a whitespace-tokenized document."""
    toks = spark_tokens(col)
    # sequence(0, n) with negative n would count DOWN in Spark — guard short docs
    return (
        f"array_distinct(case when size({toks}) >= {k} then "
        f"transform(sequence(0, size({toks}) - {k}), "
        f"j -> concat_ws(' ', slice({toks}, j + 1, {k}))) "
        f"else cast(array() as array<string>) end)"
    )


# --- DuckDB oracle fragments (must compute bit-identical values) ------------


def duck_hex2long(expr: str, digits: int = 15) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {digits})) AS BIGINT)"


def duck_tokens(col: str = "text") -> str:
    return f"string_split({col}, ' ')"


def duck_shingles(col: str = "text", k: int = 5) -> str:
    toks = duck_tokens(col)
    return (
        f"list_distinct(list_transform(range(0, greatest(len({toks}) - {k}, -1) + 1), "
        f"j -> array_to_string({toks}[j + 1:j + {k}], ' ')))"
    )
