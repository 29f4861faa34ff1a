"""Generate duckdb_parachute_spark/functions/ko_collation_data.py.

Probes DuckDB's bundled ICU 'ko' collation (reference extension/icu/
icu_extension.cpp:119). Structure (all verified here, exiting nonzero
on any violation):

* Modern precomposed syllables are LV+T at the element level: the
  primary of an LVT syllable is the primary of its LV syllable (the
  T-index-0 char) plus a single byte determined ONLY by the trailing
  jamo — so the spec expands each syllable to [LV-class slot][T slot]
  with 27 regex passes whose classes are algorithmic
  ((cp-AC00) % 28). Verified for all 11,172 syllables.
* Tailored Han key INSIDE the Hangul zone as their primary reading's
  syllable primary (LV or LVT) — a full primary tie with that
  syllable — plus a measured 44xx secondary that ranks same-reading
  Han after the syllable. Emitted as reading classes:
  {lv_char + t_jamo_or_empty: han string in measured secondary order}.
* The remaining Han carry implicit weights above Latin (same zone
  structure as zh/zh_tw) — emitted as one ordered string.
* The non-Hangul surface is ROOT-model and byte-matches 'pt' (probed
  in round 16): root accent windows, the zh punctuation/fullwidth
  ladder, digits below the Hangul zone, Latin above it.
* Standalone jamo (conjoining U+1100.., compat U+313x, halfwidth) are
  OUT OF SCOPE: a lone jamo's primary is a byte-prefix of every
  syllable built on it, so its order against a syllable depends on
  what follows — not expressible per-char (documented residual; they
  stay raw).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import duckdb

from gen_zh_pinyin import han_repertoire

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_parachute_spark", "functions", "ko_collation_data.py",
)

S_BASE, L_N, V_N, T_N = 0xAC00, 19, 21, 28


def main() -> int:
    con = duckdb.connect()

    def keys_of(chars):
        rows = con.execute(
            "SELECT s, icu_sort_key(s, 'ko') FROM (SELECT unnest(?) s)", [chars]
        ).fetchall()
        return {s: bytes.fromhex(k) for s, k in rows}

    def prim(k):
        return k.split(b"\x01")[0]

    # ---- syllable structure -------------------------------------------
    syl = [chr(S_BASE + i) for i in range(L_N * V_N * T_N)]
    sk = keys_of(syl)
    t_jamo = [chr(0x11A7 + t) for t in range(1, T_N)]  # U+11A8..U+11C2
    t_byte: dict[int, bytes] = {}
    for s in syl:
        cp = ord(s) - S_BASE
        t = cp % T_N
        lv = chr(S_BASE + cp - t)
        p, plv = prim(sk[s]), prim(sk[lv])
        if t == 0:
            continue
        if not p.startswith(plv):
            print(f"FAIL: {s!r} prim {p.hex()} not LV-prefixed {plv.hex()}",
                  file=sys.stderr)
            return 1
        tb = p[len(plv):]
        if t_byte.setdefault(t, tb) != tb:
            print(f"FAIL: T #{t} byte varies: {tb.hex()} vs "
                  f"{t_byte[t].hex()}", file=sys.stderr)
            return 1
    # T slots must sort in t-byte order and ABOVE every LV continuation:
    # any following in-zone element keeps bytes below the T range
    # (probed: '가나' continuation 0x0A.. < T 0xB3..)
    t_sorted = sorted(range(1, T_N), key=lambda t: t_byte[t])
    lv_all = [chr(S_BASE + i * T_N) for i in range(L_N * V_N)]
    lv_order = sorted(lv_all, key=lambda s: sk[s])
    max_cont = max(prim(sk[s])[1:2] for s in lv_all)  # lead-compressed byte
    if min(t_byte.values()) <= max_cont:
        print("FAIL: T bytes not above LV continuation bytes", file=sys.stderr)
        return 1

    # ---- Han ----------------------------------------------------------
    han = han_repertoire()
    hk = keys_of(han)
    za = prim(keys_of(["z"])["z"])
    low = [c for c in han if prim(hk[c]) < za]
    high = [c for c in han if prim(hk[c]) > za]
    if len(low) + len(high) != len(han):
        print("FAIL: Han char ties 'z' at primary", file=sys.stderr)
        return 1
    syl_by_prim = {prim(sk[s]): s for s in syl}
    classes: dict[str, list[str]] = defaultdict(list)
    extra: list[str] = []
    max_syl_prim = max(prim(k) for k in sk.values())
    for c in low:
        s = syl_by_prim.get(prim(hk[c]))
        if s is None:
            # reading-less but tailored Han: an own-primary zone between
            # the Hangul zone and Latin (probed 0xA5.., e.g. U+4E02)
            if prim(hk[c]) <= max_syl_prim:
                print(f"FAIL: U+{ord(c):05X} readingless Han inside the "
                      f"Hangul zone: {prim(hk[c]).hex()}", file=sys.stderr)
                return 1
            extra.append(c)
            continue
        cp = ord(s) - S_BASE
        t = cp % T_N
        lv = chr(S_BASE + cp - t)
        key = lv + (chr(0x11A7 + t) if t else "")
        classes[key].append(c)
    # Han secondaries are ABSOLUTE weights, not per-class ranks: a
    # trailing jamo composes with a preceding syllable (FCD), so 價+ᆨ
    # ties 恪 at primary ACROSS reading classes and their secondaries
    # compare directly (round-16 grid-audit find — per-class ranks
    # mis-ordered exactly those shapes). Emit GLOBAL secondary groups:
    # Han sharing one measured secondary share one slot.
    han_classes: dict[str, str] = {}
    sec_of: dict[str, bytes] = {}
    for key, cs in classes.items():
        cs.sort(key=lambda c: hk[c])
        # the bare reading syllable (common secondary) must sort FIRST in
        # its class — the spec encodes syllable=\x02 < Han sec slots
        s_key = sk[key[0] if len(key) == 1 else
                   chr(S_BASE + (ord(key[0]) - S_BASE)
                       + ord(key[1]) - 0x11A7)]
        for c in cs:
            if hk[c] <= s_key:
                print(f"FAIL: U+{ord(c):05X} does not sort after its "
                      f"reading syllable", file=sys.stderr)
                return 1
            sec_of[c] = hk[c].split(b"\x01")[1]
        han_classes[key] = "".join(cs)
    groups: dict[bytes, list[str]] = defaultdict(list)
    for c, sec in sec_of.items():
        groups[sec].append(c)
    sec_groups = ["".join(sorted(groups[sec]))
                  for sec in sorted(groups)]
    if len(sec_groups) > 0xFDD0 - 0xE001:
        print("FAIL: too many distinct Han secondaries for the slot band",
              file=sys.stderr)
        return 1
    if len({prim(hk[c]) for c in extra}) != len(extra):
        print("FAIL: primary ties among readingless low Han", file=sys.stderr)
        return 1
    order_extra = "".join(sorted(extra, key=lambda c: hk[c]))
    order_high = "".join(sorted(high, key=lambda c: hk[c]))

    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""Measured ko collation data (GENERATED — do not edit; '
            "regenerate with\nscripts/gen_ko_collation.py). Probed from "
            "DuckDB's bundled ICU 'ko'\ncollation (public CLDR data); "
            'every invariant verified at generation."""\n\n'
        )
        f.write("#: the 399 LV (T-less) syllables in measured primary order\n")
        f.write(f"KO_LV_ORDER = {''.join(lv_order)!r}\n\n")
        f.write("#: the 27 trailing jamo in measured T-byte order (slot "
                "order; every\n#: T byte sits above every in-zone "
                "continuation byte, verified)\n")
        f.write("KO_T_ORDER = "
                f"{''.join(chr(0x11A7 + t) for t in t_sorted)!r}\n\n")
        f.write("#: reading classes: LV syllable (+ trailing jamo for LVT "
                "readings) ->\n#: the Han that tie that reading at "
                "primary, in measured secondary order\n")
        f.write(f"KO_HAN_CLASSES = {dict(han_classes)!r}\n\n")
        f.write("#: GLOBAL Han secondary groups in ascending measured "
                "order — group i's\n#: chars share the slot \\ue001+i "
                "(absolute weights: trailing-jamo\n#: composition makes "
                "cross-class secondary comparisons reachable)\n")
        f.write(f"KO_HAN_SEC_GROUPS = {sec_groups!r}\n\n")
        f.write("#: readingless tailored Han: own primaries between the "
                "Hangul zone and\n#: Latin (probed 0xA5..), measured "
                "order\n")
        f.write(f"KO_HAN_LOW_EXTRA = {order_extra!r}\n\n")
        f.write("#: the implicit zone above Latin, measured order\n")
        f.write(f"KO_HAN_HIGH = {order_high!r}\n")
    n_low = sum(len(v) for v in han_classes.values())
    print(f"wrote {OUT}: {len(lv_order)} LV, {len(han_classes)} reading "
          f"classes covering {n_low} Han ({len(sec_groups)} global "
          f"secondary groups), {len(order_extra)} readingless low, "
          f"{len(order_high)} high")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
