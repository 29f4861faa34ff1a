"""Generate duckdb_parachute_spark/functions/zh_pinyin_data.py.

Probes DuckDB's bundled ICU 'zh' collation (reference extension/icu/
icu_extension.cpp:119) for the full pinyin primary order of the
supported Han repertoire — CJK Unified Ideographs + Extension A +
the ideographic zero U+3007 (which the tailoring interleaves by
reading), and — round 16 — U+9FFD-U+9FFF, the twelve NFC-stable
compatibility ideographs, and the supplementary-plane Extensions
B/C/D/E/F/G/H/I (probed: the bundle gives every one a distinct
primary, tailored zone 0xA4-A6 interleaved with an implicit 0xFE tail
ordered by codepoint — either way the measured order is exact).
Characters NFC rewrites (the canonically-decomposing compatibility
ideographs) are OUT OF SCOPE by the spec's NFC contract and are
filtered here. Verifies every primary is distinct (a 1:1 translate
mapping is only sound then; exits nonzero otherwise) and writes the
measured order as one string constant. Re-runnable: regenerating
after a DuckDB/ICU upgrade refreshes the table or fails loudly.
"""

from __future__ import annotations

import os
import sys
import unicodedata

import duckdb

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_parachute_spark", "functions", "zh_pinyin_data.py",
)

#: the full Han repertoire both CJK generators map (round 16): core
#: Unified + Ext-A + supplementary Extensions B..I. Block gaps and
#: unassigned planes stay raw (never real corpus text).
HAN_BLOCKS = [
    (0x4E00, 0xA000),     # CJK Unified (incl. 9FFD-9FFF, implicit in bundle)
    (0x3400, 0x4DC0),     # Extension A
    (0x20000, 0x2A6E0),   # Extension B
    (0x2A700, 0x2B740),   # Extension C
    (0x2B740, 0x2B820),   # Extension D
    (0x2B820, 0x2CEB0),   # Extension E
    (0x2CEB0, 0x2EBF0),   # Extension F
    (0x2EBF0, 0x2EE60),   # Extension I
    (0x30000, 0x31350),   # Extension G
    (0x31350, 0x323B0),   # Extension H
]
#: the 12 compatibility ideographs with NO canonical decomposition —
#: the only F900-FAFF chars NFC keeps, so the only ones in scope.
COMPAT_SINGLES = "﨎﨏﨑﨓﨔﨟﨡﨣﨤﨧﨨﨩"


def han_repertoire() -> list[str]:
    chars = [chr(c) for a, b in HAN_BLOCKS for c in range(a, b)]
    chars += list(COMPAT_SINGLES)
    return [c for c in chars if unicodedata.normalize("NFC", c) == c]


def main() -> int:
    chars = han_repertoire() + [chr(0x3007)]
    con = duckdb.connect()
    rows = con.execute(
        "SELECT s, icu_sort_key(s, 'zh') FROM (SELECT unnest(?) s)", [chars]
    ).fetchall()
    keys = {s: bytes.fromhex(k) for s, k in rows}
    prims = {s: k.split(b"\x01")[0] for s, k in keys.items()}
    if len(set(prims.values())) != len(chars):
        from collections import Counter

        dups = [p for p, n in Counter(prims.values()).items() if n > 1]
        print(f"FAIL: {len(dups)} primary ties — 1:1 translate unsound", file=sys.stderr)
        return 1
    # round 16 zone split (probed): the zh tailoring keys core pinyin
    # Han at 0x69-0x9B and the Ext-A/plane-2 reading-interleaved zone at
    # 0xA4-A6, BOTH BELOW Latin (a=0xA8..z=0xDA); chars the bundle
    # leaves implicit (9FFD-9FFF, Ext-H/I, unassigned block tails) key
    # at 0xFE, ABOVE Latin. The spec maps the two zones to separate
    # slot runs below/above its Latin slots, so the split is emitted
    # here, measured against 'z''s own primary.
    z_prim = bytes.fromhex(
        con.execute("SELECT icu_sort_key('z', 'zh')").fetchone()[0]
    ).split(b"\x01")[0]
    low = [c for c in chars if prims[c] < z_prim]
    high = [c for c in chars if prims[c] > z_prim]
    assert len(low) + len(high) == len(chars)
    order = "".join(sorted(low, key=lambda s: keys[s]))
    order_high = "".join(sorted(high, key=lambda s: keys[s]))
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""Measured pinyin primary order for the zh collation '
            "(GENERATED — do not edit;\nregenerate with "
            'scripts/gen_zh_pinyin.py). Derived by probing DuckDB\'s '
            "bundled ICU\n'zh' collation sort keys (public CLDR data); "
            "every char below has a distinct\nprimary weight, verified "
            "at generation time. ORDER sorts below Latin\n(core pinyin "
            "+ the Ext-A/plane-2 reading zone); HIGH is the implicit\n"
            'zone above Latin."""\n\n'
        )
        f.write(f"HAN_PINYIN_ORDER = {order!r}\n\n")
        f.write(f"HAN_PINYIN_HIGH = {order_high!r}\n")
    print(f"wrote {OUT}: {len(order)} low + {len(order_high)} high chars")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
