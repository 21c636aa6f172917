"""Portable hashing primitives for dedup operators.

All hashing here is built on ``md5`` hex strings because they are
bit-identical across engines (Spark, DuckDB, Postgres), unlike
``xxhash64``/``hash()`` which are engine-internal. A fixed-width
lowercase hex string orders exactly like the 128-bit integer it
encodes, so ``min(md5(...))`` is a valid minwise hash and salted
``md5(i || '|' || x)`` gives k independent hash families.

At 100 TB scale these all stay inside whole-stage codegen (md5 is a
JVM intrinsic); no Python is involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def words(text_col: Column) -> Column:
    """Lowercased whitespace tokens (empty tokens removed)."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )


def shingles(text_col: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string> (space-joined).

    Documents shorter than k words contribute their full token string
    as a single shingle so no document is silently dropped.
    """
    toks = words(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(grams)


def salted_md5(col: Column, salt: int) -> Column:
    return F.md5(F.concat(F.lit(f"{salt}|"), col).cast("binary"))


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: array of ``num_hashes`` lexicographic-min
    salted md5 hex strings over the shingle set.

    Empty shingle sets yield the sentinel 'z' (sorts after all hex)."""
    sig = F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(shingle_col, lambda s, i=i: salted_md5(s, i))),
                F.lit("z"),
            )
            for i in range(num_hashes)
        ]
    )
    return sig


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of ``bands`` md5(band_id | joined rows)."""
    return F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"band{b}|"),
                    F.concat_ws(
                        ",", F.slice(signature, b * rows_per_band + 1, rows_per_band)
                    ),
                ).cast("binary")
            )
            for b in range(bands)
        ]
    )


def hex_digit_value(digit: Column) -> Column:
    """hex char → 0..15 via position in '0123456789abcdef' (portable)."""
    return F.instr(F.lit(HEX_DIGITS), digit) - F.lit(1)


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over a token array.

    Bit b of the fingerprint is set iff the sum over tokens of
    (bit b of md5(token)'s first 16 bits ? +1 : -1) is positive.
    16 bits (first 4 hex digits of md5) keeps the portable-SQL oracle
    tractable; semantics are identical to the usual 64-bit form.
    """
    total = F.size(tokens)
    fp = F.lit(0)
    for nibble in range(4):  # hex digits 1..4
        digit_vals = F.transform(
            tokens, lambda t, j=nibble: hex_digit_value(F.substring(F.md5(t.cast("binary")), j + 1, 1))
        )
        for bit_in_nibble in range(4):
            shift = 3 - bit_in_nibble  # MSB first within the nibble
            ones = F.aggregate(
                digit_vals,
                F.lit(0),
                lambda acc, v, s=shift: acc + F.floor(v / F.lit(2 ** s)).cast("int") % 2,
            )
            # sum of (+1/-1) > 0  <=>  2*ones > total
            bit_pos = nibble * 4 + bit_in_nibble  # 0 = MSB
            bit_set = (F.lit(2) * ones) > total
            fp = fp + F.when(bit_set, F.lit(2 ** (15 - bit_pos))).otherwise(F.lit(0))
    return fp


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array<string> treated as sets."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
