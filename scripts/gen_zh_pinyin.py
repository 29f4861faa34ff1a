"""Generate duckdb_parachute_spark/functions/zh_pinyin_data.py.

Probes DuckDB's bundled ICU 'zh' collation (reference extension/icu/
icu_extension.cpp:119) for the full pinyin primary order of the
supported Han repertoire — CJK Unified Ideographs U+4E00-U+9FFC plus
Extension A U+3400-U+4DBF plus the ideographic zero U+3007, which the
tailoring interleaves by reading — verifies every primary is distinct
(a 1:1 translate mapping is only sound then; exits nonzero otherwise),
and writes the measured order as one string constant. U+9FFD-U+9FFF
carry implicit (untailored) weights in the bundle and are excluded
(documented residual). Re-runnable: regenerating after a DuckDB/ICU
upgrade refreshes the table or fails loudly on a tie.
"""

from __future__ import annotations

import os
import sys

import duckdb

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_parachute_spark", "functions", "zh_pinyin_data.py",
)


def main() -> int:
    chars = (
        [chr(c) for c in range(0x4E00, 0x9FFD)]
        + [chr(c) for c in range(0x3400, 0x4DC0)]
        + [chr(0x3007)]
    )
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
    order = "".join(sorted(chars, key=lambda s: keys[s]))
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""Measured pinyin primary order for the zh collation '
            "(GENERATED — do not edit;\nregenerate with "
            'scripts/gen_zh_pinyin.py). Derived by probing DuckDB\'s '
            "bundled ICU\n'zh' collation sort keys (public CLDR data); "
            "every char below has a distinct\nprimary weight, verified "
            'at generation time."""\n\n'
        )
        f.write(f"HAN_PINYIN_ORDER = {order!r}\n")
    print(f"wrote {OUT}: {len(order)} chars")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
