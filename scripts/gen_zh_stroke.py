"""Generate duckdb_parachute_spark/functions/zh_stroke_data.py.

Probes DuckDB's bundled ICU 'zh_tw' collation (traditional-Chinese
STROKE order; reference extension/icu/icu_extension.cpp:119) the same
way gen_zh_pinyin.py probes 'zh'. The repertoire is the shared Han
blocks plus the ideographic zero 〇 (IN the stroke zone at its stroke
count, unlike zh where it interleaves by reading) and the BOPOMOFO
blocks, which zh_tw tailors as a letter zone between stroke Han and
Latin (probed ㄅ=0xA706.. < a=0xA9). The low/high split against 'z' is
the same probed zone structure as zh: tailored material below Latin,
the bundle's implicit zone above.

Also verifies (exiting nonzero otherwise) that zh_Hant and yue resolve
to byte-identical keys in the bundle, so collate.py may alias them.
"""

from __future__ import annotations

import os
import sys

import duckdb

from gen_zh_pinyin import han_repertoire

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_parachute_spark", "functions", "zh_stroke_data.py",
)

BOPOMOFO = [(0x3105, 0x3130), (0x31A0, 0x31C0)]


def main() -> int:
    chars = (
        han_repertoire()
        + [chr(0x3007)]
        + [chr(c) for a, b in BOPOMOFO for c in range(a, b)]
    )
    con = duckdb.connect()
    rows = con.execute(
        "SELECT s, icu_sort_key(s, 'zh_tw') FROM (SELECT unnest(?) s)", [chars]
    ).fetchall()
    keys = {s: bytes.fromhex(k) for s, k in rows}
    prims = {s: k.split(b"\x01")[0] for s, k in keys.items()}
    # Primary ties are EXPECTED only in bopomofo: the extended block
    # (and ㄮ) carries secondary-70/78 letter variants and tertiary-E0
    # forms of base letters. Emit them as alias tables (primary -> the
    # representative's slot; measured secondary/tertiary bands); any tie
    # outside these two probed patterns fails loudly.
    from collections import defaultdict

    by_prim = defaultdict(list)
    for c in chars:
        by_prim[prims[c]].append(c)
    bpmf_sec: dict[str, str] = {}
    sec_delete: list[str] = []
    bpmf_tert: dict[str, str] = {}
    prim_alias: dict[str, str] = {}
    sec_band = {b"\x70": "", b"\x78": ""}
    for p, grp in by_prim.items():
        if len(grp) == 1:
            continue
        grp.sort(key=lambda c: keys[c])
        rep = grp[0]
        levels = {c: keys[c].split(b"\x01") for c in grp}
        rep_sec, rep_tert = levels[rep][1], levels[rep][2]
        if rep_sec != b"\x05" or rep_tert != b"\x05" or not (
            0x3105 <= ord(rep) < 0x31C0
        ):
            print(f"FAIL: unexpected tie group {grp!r}", file=sys.stderr)
            return 1
        for c in grp[1:]:
            sec, tert = levels[c][1], levels[c][2]
            prim_alias[c] = rep
            if sec == rep_sec:
                # tertiary-only variants: common secondary like the rep.
                # The rep (inside the stroke order) is DELETED from the
                # secondary text, so the variant must be deleted too —
                # mapping it to the rep CHAR would leave an asymmetric
                # secondary stream (found by the zh_tw grid audit:
                # base+variant vs variant+base inverted).
                sec_delete.append(c)
            elif sec in sec_band:
                bpmf_sec[c] = sec_band[sec]
            else:
                print(f"FAIL: unprobed secondary {sec.hex()} in {grp!r}",
                      file=sys.stderr)
                return 1
            if tert == b"\xe0":
                bpmf_tert[c] = ""
            elif tert != rep_tert:
                print(f"FAIL: unprobed tertiary {tert.hex()} in {grp!r}",
                      file=sys.stderr)
                return 1
    chars = [c for c in chars if c not in prim_alias]
    if len({prims[c] for c in chars}) != len(chars):
        print("FAIL: residual primary ties", file=sys.stderr)
        return 1
    # alias check: zh_Hant / yue must be byte-identical to zh_tw
    sample = chars[:: max(1, len(chars) // 2000)] + [chr(c) for c in range(0x20, 0x7F)]
    for alias in ("zh_Hant", "yue"):
        arows = con.execute(
            f"SELECT s, icu_sort_key(s, '{alias}') FROM (SELECT unnest(?) s)",
            [sample],
        ).fetchall()
        bad = [s for s, k in arows if bytes.fromhex(k) != keys.get(s, bytes.fromhex(k))]
        if bad:
            print(f"FAIL: {alias} diverges from zh_tw on {bad[:5]!r}", file=sys.stderr)
            return 1
    z_prim = bytes.fromhex(
        con.execute("SELECT icu_sort_key('z', 'zh_tw')").fetchone()[0]
    ).split(b"\x01")[0]
    low = [c for c in chars if prims[c] < z_prim]
    high = [c for c in chars if prims[c] > z_prim]
    assert len(low) + len(high) == len(chars)
    order = "".join(sorted(low, key=lambda s: keys[s]))
    order_high = "".join(sorted(high, key=lambda s: keys[s]))
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""Measured stroke primary order for the zh_tw collation '
            "(GENERATED — do not\nedit; regenerate with "
            'scripts/gen_zh_stroke.py). Derived by probing DuckDB\'s '
            "\nbundled ICU 'zh_tw' sort keys (public CLDR data); every "
            "char below has a\ndistinct primary weight, verified at "
            "generation time (zh_Hant/yue verified\nbyte-identical). "
            "ORDER sorts below Latin (the stroke zone, incl. 〇 and\n"
            'bopomofo); HIGH is the implicit zone above Latin."""\n\n'
        )
        f.write(f"HAN_STROKE_ORDER = {order!r}\n\n")
        f.write(f"HAN_STROKE_HIGH = {order_high!r}\n\n")
        f.write("#: bopomofo variant letters: char -> base letter whose "
                "primary slot it shares\n")
        f.write(f"BPMF_PRIM_ALIAS = {prim_alias!r}\n\n")
        f.write("#: their measured secondary: base char (tertiary-only "
                "variants) or the\n#: 70/78 band slots \\uea01/\\uea02\n")
        f.write(f"BPMF_SEC = {bpmf_sec!r}\n\n")
        f.write("#: tertiary-only variants DELETED from the secondary text "
                "(common 05,\n#: like their rep inside the stroke order)\n")
        f.write(f"BPMF_SEC_DELETE = {''.join(sec_delete)!r}\n\n")
        f.write("#: tertiary-E0 variants -> the \\ue0f0 band\n")
        f.write(f"BPMF_TERT = {bpmf_tert!r}\n")
    print(f"wrote {OUT}: {len(order)} low + {len(order_high)} high chars; "
          f"{len(prim_alias)} bopomofo variants")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
