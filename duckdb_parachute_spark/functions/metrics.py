"""String-distance / formatting functions SURVEY §2.9 flags as Spark gaps
(reference manifests extension/core_functions/scalar/string/functions.json):
hamming, jaccard, jaro_winkler_similarity, damerau_levenshtein, parse_path
family, format_bytes, to_base, strip_accents.

Catalyst compositions where the math is set/positional (JVM-side, scale-safe);
Arrow-vectorized pandas UDFs for the dynamic-programming metrics — matching
the reference's own split (simple metrics inline, DP metrics as dedicated
C++ loops)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

# -- Catalyst compositions ---------------------------------------------------


def _chars(s: Column) -> Column:
    """Array of single characters (argument-position substr loop)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: s.substr(i, F.lit(1)),
    )


def hamming_str(a: Column, b: Column) -> Column:
    """Positional mismatch count of two equal-length strings (reference
    hamming); NULL if lengths differ, like the reference errors."""
    diff = F.aggregate(
        F.zip_with(_chars(a), _chars(b), lambda x, y: (x != y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when(F.length(a) == F.length(b), diff)


def char_jaccard(a: Column, b: Column) -> Column:
    """Character-set Jaccard similarity (reference jaccard)."""
    sa, sb = F.array_distinct(_chars(a)), F.array_distinct(_chars(b))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return inter / F.greatest(union, F.lit(1.0))


def parse_dirpath(path: Column) -> Column:
    """Directory path of a file path (reference parse_dirpath; the reference's
    parse_dirname returns the top-level component instead)."""
    return F.regexp_extract(path, r"^(.*)/[^/]*$", 1)


def parse_filename(path: Column) -> Column:
    return F.regexp_extract(path, r"([^/]*)$", 1)


def format_bytes(n: Column) -> Column:
    """Human-readable bytes, matching the reference's truncate-to-1-decimal
    binary units ('999 bytes', '1.4 KiB', '1.5 MiB')."""

    def scaled(unit_pow: int, unit: str) -> Column:
        scale = float(1 << (10 * unit_pow))
        trunc = F.floor(n / scale * 10) / 10.0
        return F.concat(F.format_string("%.1f", trunc), F.lit(" " + unit))

    return (
        F.when(n < 1024, F.concat(n.cast("string"), F.lit(" bytes")))
        .when(n < 1024**2, scaled(1, "KiB"))
        .when(n < 1024**3, scaled(2, "MiB"))
        .when(n < 1024**4, scaled(3, "GiB"))
        .otherwise(scaled(4, "TiB"))
    )


def to_base(n: Column, base: int) -> Column:
    """Integer to base-k string (reference to_base) — conv() uppercases."""
    return F.conv(n.cast("string"), 10, base)


def _accent_tables() -> tuple[str, str]:
    """Generate full-BMP accent-fold tables at import time.

    The reference's strip_accents (utf8proc-based) removes combining marks
    under CANONICAL decomposition only — 'é'→'e', 'ώ'→'ω', 'ё'→'е', and a
    bare U+0301 is deleted, while compatibility forms ('ﬁ', 'ĳ') pass
    through. The same semantics fit a single JVM-side translate: every BMP
    codepoint whose NFD is one base letter plus combining marks maps to the
    base, and every standalone combining mark (category Mn) maps to nothing
    (translate deletes src chars beyond the dst length — they must sit at
    the END of src)."""
    import sys
    import unicodedata

    src, dst, marks = [], [], []
    for cp in range(0x80, 0x10000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        if unicodedata.category(ch) == "Mn":
            marks.append(ch)
            continue
        d = unicodedata.normalize("NFD", ch)
        if len(d) >= 2 and all(unicodedata.category(c) == "Mn" for c in d[1:]):
            src.append(ch)
            dst.append(d[0])
    return "".join(src) + "".join(marks), "".join(dst)


_ACCENT_SRC, _ACCENT_DST = _accent_tables()


def strip_accents(s: Column) -> Column:
    """Unicode accent folding (reference strip_accents semantics): combining
    marks are stripped under canonical decomposition for the whole BMP, for
    precomposed and decomposed input alike — one JVM-side translate, no UDF."""
    return F.translate(s, _ACCENT_SRC, _ACCENT_DST)


# -- DP metrics as Arrow-vectorized UDFs -------------------------------------


@pandas_udf(DoubleType())
def jaro_winkler_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    """Jaro-Winkler (standard p=0.1, prefix≤4 — matches the reference's
    jaro_winkler_similarity)."""

    def jw(s1: str, s2: str) -> float:
        if s1 is None or s2 is None:
            return None
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if not l1 or not l2:
            return 0.0
        window = max(l1, l2) // 2 - 1
        m1, m2 = [False] * l1, [False] * l2
        matches = 0
        for i, c in enumerate(s1):
            lo, hi = max(0, i - window), min(l2, i + window + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if not matches:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        jaro = (matches / l1 + matches / l2 + (matches - t / 2) / matches) / 3
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 != c2:
                break
            prefix += 1
        return jaro + prefix * 0.1 * (1 - jaro)

    return pd.Series([jw(x, y) for x, y in zip(a, b)])


@pandas_udf(LongType())
def damerau_levenshtein(a: pd.Series, b: pd.Series) -> pd.Series:
    """Full Damerau-Levenshtein (unrestricted transpositions — the reference's
    damerau_levenshtein, which gives d('ca','abc') = 2)."""

    def dl(s1: str, s2: str) -> int:
        if s1 is None or s2 is None:
            return None
        l1, l2 = len(s1), len(s2)
        maxdist = l1 + l2
        alpha: dict[str, int] = {}
        d = [[0] * (l2 + 2) for _ in range(l1 + 2)]
        d[0][0] = maxdist
        for i in range(l1 + 1):
            d[i + 1][0] = maxdist
            d[i + 1][1] = i
        for j in range(l2 + 1):
            d[0][j + 1] = maxdist
            d[1][j + 1] = j
        for i in range(1, l1 + 1):
            db = 0
            for j in range(1, l2 + 1):
                k = alpha.get(s2[j - 1], 0)
                l_ = db
                if s1[i - 1] == s2[j - 1]:
                    cost = 0
                    db = j
                else:
                    cost = 1
                d[i + 1][j + 1] = min(
                    d[i][j] + cost,
                    d[i + 1][j] + 1,
                    d[i][j + 1] + 1,
                    d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
                )
            alpha[s1[i - 1]] = i
        return d[l1 + 1][l2 + 1]

    return pd.Series([dl(x, y) for x, y in zip(a, b)], dtype="int64")
