"""Exhaustive collation grid audit (round 16, VERDICT r15 next #2).

The r15 Arabic red proved random sweeps sample where they should
enumerate: every tailored locale's spec pins finite ladders, and DuckDB's
bundled ICU (reference extension/icu/icu_extension.cpp:119) will answer
the full (letter x combining-mark x position) grid in seconds. This audit
derives each locale's CLAIMED repertoire from its own spec source strings
(tokenize / primary / secondary / tertiary replace sources and translate
sources — exactly the chars the spec says it handles), builds the grid:

  * every base char: alone, prefixed, suffixed (two contexts: a Latin
    letter and a letter of the locale's own script);
  * every spec source string (contractions, ligatures, case forms):
    alone, in both contexts, and doubled (leftmost-greedy overlap);
  * every base x mark pair (NFC), alone and wrapped;
  * mark x mark runs on a deterministic base subset (canonical
    reordering + discontiguous-contraction shapes);
  * the uppercase of every cased base (case-crossing rules);

then checks, against DuckDB's real ICU:

  1. ORDER — our locale_collation_key sorts the grid exactly as
     ``ORDER BY s COLLATE <locale>`` (binary tie-break both sides);
  2. STRENGTH — adjacent strings in ICU order tie on icu_sort_key iff
     they tie on our full key (catches wrong-level bugs that the binary
     tie-break would mask).

Exits nonzero on any cell mismatch. Run: python scripts/collation_grid_audit.py
[locale ...]; ~3-6 min for all locales on local[8].
"""
from __future__ import annotations

import os
import sys
import unicodedata

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: spec locale -> DuckDB collation name where they differ.
_DUCK_NAME = {
    "zh_cn": None,  # alias of zh — same spec object, skip
    "zh_hant": None,  # alias of zh_tw — generator-verified byte-identical
    "yue": None,  # alias of zh_tw — generator-verified byte-identical
    # nb/no: the spec DELIBERATELY follows CLDR (Norwegian shares the
    # Danish tailoring) where DuckDB's bundle resolves both to ROOT —
    # the documented policy at collate.py's nb/no aliases. The audit
    # therefore verifies the implementation against 'da', the tailoring
    # it reproduces.
    "nb": "da",
    "no": "da",
}

#: marks the spec CLAIMS but encodes via ranges inside translate sources
#: (already in scope) — nothing extra needed today; kept for future specs.
_EXTRA_MARKS: dict[str, str] = {}

_TOKEN_MAX = 0x20  # \x02..\x1f contraction tokens — never real input
#: weight-internal ranges: BMP PUA, planes 15/16, and the ko
#: pretranslate code blocks in the unassigned planes 4-8
_PUA = ((0xE000, 0xF8FF), (0xF0000, 0x10FFFF), (0x40000, 0x8FFFF))


def _is_weight_char(ch: str) -> bool:
    cp = ord(ch)
    if cp < _TOKEN_MAX:
        return True
    return any(lo <= cp <= hi for lo, hi in _PUA)


def _scope(spec) -> tuple[list[str], list[str], list[str]]:
    """(bases, marks, multi-char sources) claimed by a _LocaleSpec."""
    singles: set[str] = set()
    multis: set[str] = set()
    for pairs in (spec.tokenize, spec.primary, spec.secondary):
        for src, _dst in pairs:
            if any(_is_weight_char(c) for c in src):
                continue
            (multis if len(src) > 1 else singles).add(src)
    for src, _dst in (
        spec.primary_translate,
        spec.secondary_translate,
        spec.tertiary,
        spec.pretranslate,
    ):
        for c in src:
            if not _is_weight_char(c):
                singles.add(c)
    # chars inside multi-char sources are claimed too
    for m in multis:
        for c in m:
            if not _is_weight_char(c):
                singles.add(c)
    marks = sorted(c for c in singles if unicodedata.combining(c))
    bases = sorted(c for c in singles if not unicodedata.combining(c))
    return bases, marks, sorted(multis)


def _grid(locale: str, spec) -> list[str]:
    bases, marks, multis = _scope(spec)
    marks = sorted(set(marks + list(_EXTRA_MARKS.get(locale, ""))))
    script_ctx = next(
        (b for b in bases if ord(b) > 0x250 and b.isalpha()), "b"
    )
    ctxs = ["x", script_ctx]
    # supplementary-plane contexts (round 16): raw 4-byte chars in a
    # LEVEL key text can outrank BMP weight slots a preceding element
    # left behind — the zh 'ḗ𠀀' / ja 'ガ𠀀' bug class. When the spec
    # claims plane-2+ chars, audit every base against one tailored-zone
    # and one implicit-zone supplementary neighbour too.
    supp = [b for b in bases if ord(b) >= 0x10000]
    if supp:
        ctxs.append(supp[0])
        if supp[-1] != supp[0]:
            ctxs.append(supp[-1])

    sample = bases
    if len(bases) > 1500:
        # zh: every base still audited as a singleton; context/mark forms
        # on a deterministic 1-in-7 sample + the full non-Han remainder
        sample = [b for i, b in enumerate(bases) if i % 7 == 0 or ord(b) < 0x3400]

    out: set[str] = set()
    for b in bases:
        out.add(b)
        up = b.upper()
        if up != b and len(up) == 1:
            out.add(up)
    for b in sample:
        for c in ctxs:
            out.add(c + b)
            out.add(b + c)
    for m in multis:
        up = m.upper()
        for w in {m, up} if up != m else {m}:
            out.add(w)
            out.add(w + w)
            for c in ctxs:
                out.add(c + w)
                out.add(w + c)
    for b in sample:
        for m in marks:
            w = unicodedata.normalize("NFC", b + m)
            out.add(w)
            out.add(ctxs[1] + w + ctxs[1])
    # mark runs: base subset = letters appearing in contraction sources
    # (hamza seats, digraph members) + the first 8 of the alphabet
    mark_bases = sorted(
        {c for m in multis for c in m if not unicodedata.combining(c)}
        | set(bases[:8])
    )[:14]
    for b in mark_bases:
        for m1 in marks:
            for m2 in marks:
                w = unicodedata.normalize("NFC", b + m1 + m2)
                out.add(w)
    return sorted(w for w in out if w and not _is_weight_char(w[0]))


def audit(spark, locales: list[str] | None = None) -> int:
    from pyspark.sql import functions as F

    from duckdb_parachute_spark.functions.collate import (
        _LOCALES,
        locale_collation_key,
    )

    con = duckdb.connect()
    failures = 0
    names = locales or sorted(_LOCALES)
    for loc in names:
        duck = _DUCK_NAME.get(loc, loc)
        if duck is None:
            continue
        spec = _LOCALES[loc]
        words = _grid(loc, spec)
        icu = con.execute(
            f'SELECT s, icu_sort_key(s, \'{duck}\') FROM (SELECT unnest(?) AS s) '
            f'ORDER BY s COLLATE "{duck}", s',
            [words],
        ).fetchall()
        df = spark.createDataFrame([(w,) for w in words], "s string")
        ours = {
            r["s"]: r["k"]
            for r in df.select(
                "s", locale_collation_key(F.col("s"), loc).alias("k")
            ).collect()
        }
        our_sorted = sorted(words, key=lambda w: (ours[w], w))
        icu_sorted = [r[0] for r in icu]
        bad = []
        if our_sorted != icu_sorted:
            for a, b in zip(icu_sorted, our_sorted):
                if a != b:
                    bad.append(("order", a, b))
                    break
        for (s1, k1), (s2, k2) in zip(icu, icu[1:]):
            if (k1 == k2) != (ours[s1] == ours[s2]):
                bad.append(("strength", s1, s2))
                if len(bad) > 4:
                    break
        status = "OK " if not bad else "FAIL"
        print(f"{status} {loc:>6}  cells={len(words)}")
        for kind, a, b in bad[:5]:
            print(
                f"      {kind}: {[hex(ord(c)) for c in a]} vs "
                f"{[hex(ord(c)) for c in b]}"
            )
        failures += bool(bad)
    return failures


def main() -> None:
    from duckdb_parachute_spark import get_session

    spark = get_session(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    failures = audit(spark, sys.argv[1:] or None)
    print(f"\n{'CLEAN' if not failures else f'{failures} locale(s) FAILED'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
