"""Generate duckdb_parachute_spark/functions/ja_collation_data.py.

Probes DuckDB's bundled ICU 'ja' collation (reference extension/icu/
icu_extension.cpp:119) and emits everything the _ja_spec needs, all
MEASURED rather than assumed (the round-15/16 lesson: enumerate, don't
sample):

* KANA: every hiragana / katakana / halfwidth-katakana / iteration-mark
  codepoint is keyed and classified into primary classes; within a
  class, secondary groups (plain / dakuten / handakuten) and tertiary
  ranks (length-clone 02 < small 03 < plain 05 < halfwidth-mark E0).
  The bundle folds hiragana == katakana == halfwidth at ALL key levels
  (あ ≡ ア ≡ ｱ exact — verified per char here), so classes fold to one
  token per (primary, tertiary) pair with voicing carried by the raw
  combining marks.
* LENGTH MARK ー: for every kana, probes whether ー after it clones the
  kana's vowel at primary+secondary (tertiary 02) or keeps its own
  symbol-zone primary (after ん, punctuation, Han, start-of-string);
  halfwidth ｰ never clones (probed).
* HAN: the full CJK Unified + Extension A + 〇 repertoire sorted by the
  ja tailoring (JIS kanji carry tailored weights, the rest implicit);
  distinct primaries verified — a 1:1 translate is only sound then.
* PUNCT/SYMBOL ladder: the ja tailoring is NON-shifted (、=0722,
  ，≡, at 06 — real primaries); the measured ladder of ASCII + CJK
  punctuation/symbols below digits is emitted as tie-groups.

Exits nonzero if any probed invariant fails. Re-runnable after a
DuckDB/ICU upgrade.
"""
from __future__ import annotations

import os
import sys
from collections import defaultdict

import duckdb

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_parachute_spark", "functions", "ja_collation_data.py",
)

HIRA = [chr(c) for c in range(0x3041, 0x3097)]
KATA = [chr(c) for c in range(0x30A1, 0x30FB)]
HALF = [chr(c) for c in range(0xFF66, 0xFF9E)]
ITER = ["ゝ", "ゞ", "ヽ", "ヾ", "ー", "ｰ"]
VOICE = ["゙", "゚", "ﾞ", "ﾟ"]
VOWELS = "アイウエオ"

PUNCT = list(" !\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") + list(
    "、。・「」『』【】！？：；（）～〜，．　｛｝［］＠＃＄％＆＊＋＜＝＞＾＿｀｜"
) + ["゛", "゜"]


def main() -> int:
    con = duckdb.connect()

    def keys_of(chars: list[str]) -> dict[str, bytes]:
        rows = con.execute(
            "SELECT s, icu_sort_key(s, 'ja') FROM (SELECT unnest(?) s)", [chars]
        ).fetchall()
        return {s: bytes.fromhex(k) for s, k in rows}

    def lvl(k: bytes) -> tuple[bytes, bytes, bytes]:
        parts = k.split(b"\x01")
        parts += [b""] * (3 - len(parts))
        return parts[0], parts[1], parts[2]

    # ---- kana classification -------------------------------------------
    kana = list(dict.fromkeys(HIRA + KATA + HALF + ITER))
    kk = keys_of(kana)
    by_prim: dict[bytes, list[str]] = defaultdict(list)
    for c in kana:
        by_prim[lvl(kk[c])[0]].append(c)

    # secondary groups inside each primary class
    classes = []
    for prim in sorted(by_prim):
        members = by_prim[prim]
        plain, voiced = [], {}
        for c in members:
            sec = lvl(kk[c])[1]
            if sec == b"\x05":
                plain.append(c)
            else:
                voiced.setdefault(sec, []).append(c)
        classes.append((prim, plain, voiced))

    # tertiary rank inside the plain group: small (03) vs normal (05)
    # and exact-tie folding
    kana_classes = []  # (normal_chars, small_chars, voiced_map)
    for prim, plain, voiced in classes:
        normal = [c for c in plain if lvl(kk[c])[2] in (b"\x05", b"")]
        small = [c for c in plain if lvl(kk[c])[2] == b"\x03"]
        # halfwidth ｰ carries tertiary E0 ABOVE the plain length mark
        half = [c for c in plain if lvl(kk[c])[2] == b"\xe0"]
        other = [c for c in plain if c not in normal + small + half]
        if other:
            print(f"UNEXPECTED tertiary in class {prim.hex()}: "
                  f"{[(c, lvl(kk[c])[2].hex()) for c in other]}")
        kana_classes.append((prim, normal, small, voiced, half))

    # voiced chars must decompose as (some plain member) + voicing mark:
    # find which plain char + which mark reproduces the key
    vk = keys_of(VOICE)
    voiced_decomp = {}  # voiced char -> (plain char, mark)
    seq_keys = {}
    def script_of(c: str) -> str:
        o = ord(c)
        if 0x3041 <= o <= 0x309F:
            return "hira"
        if 0x30A1 <= o <= 0x30FF:
            return "kata"
        return "half"

    for prim, normal, small, voiced, _half in kana_classes:
        for sec, chars in voiced.items():
            for c in chars:
                # the base must be SCRIPT-MATCHED (round-16 sweep find):
                # the bundle keys ゔ ≡ ヴ identically, but the iteration
                # context rules distinguish script — decomposing ヴ to
                # う would make a following ゞ repeat when ICU keeps it
                # raw (cross-script)
                pool = normal or small
                base = None
                if pool:
                    base = next(
                        (b for b in pool if script_of(b) == script_of(c)),
                        pool[0],
                    )
                found = None
                for mark in ("゙", "゚"):
                    if base is not None:
                        s = base + mark
                        if s not in seq_keys:
                            seq_keys.update(keys_of([s]))
                        if seq_keys[s] == kk[c]:
                            found = (base, mark)
                            break
                if found is None:
                    print(f"NO DECOMP for voiced {c!r} (U+{ord(c):04X}) "
                          f"key={kk[c].hex()}")
                else:
                    voiced_decomp[c] = found

    # ---- length-mark clone map -----------------------------------------
    vow_keys = keys_of(list(VOWELS))
    clone = {}  # kana char -> vowel index, only when ー clones
    probes = [c + "ー" for c in kana if c not in ("ー", "ｰ")]
    pk = keys_of(probes + [c + v for c in kana for v in VOWELS
                           if c not in ("ー", "ｰ")])
    for c in kana:
        if c in ("ー", "ｰ"):
            continue
        k_len = pk[c + "ー"]
        for i, v in enumerate(VOWELS):
            kv = pk[c + v]
            # clone: primary AND secondary equal to kana+vowel, tertiary
            # differs (02 for the mark vs 05 for the vowel)
            if lvl(k_len)[0] == lvl(kv)[0] and lvl(k_len)[1] == lvl(kv)[1]:
                clone[c] = i
                break

    # halfwidth ｰ must never clone
    hk = keys_of(["カｰ", "カ", "ー", "ｰ", "アｰ"])
    assert lvl(hk["カｰ"])[0] != lvl(keys_of(["カア"])["カア"])[0], "ｰ cloned?!"

    # ---- iteration-mark behavior, enumerated per (kana, mark) ----------
    # For every kana and each of ゝゞヽヾ, classify the expansion by
    # L1+L2 equality against candidate spellings: none (mark keeps its
    # own symbol primary), self (repeat the char as-is), plain (repeat
    # with voicing removed), self_dak / plain_dak (+ dakuten). The
    # voiced-context behaviors genuinely VARY per kana (probed: がゝ
    # repeats が voiced, ゔゝ repeats う plain, ぱゞ repeats ば, ガヾ is
    # が + a second dakuten) — so this table is measured, not assumed.
    marks4 = ["ゝ", "ゞ", "ヽ", "ヾ"]
    plain_of = {}
    for v, (p, _m) in voiced_decomp.items():
        plain_of[v] = p
    iter_behavior = {}
    kana_noiter = [c for c in kana if c not in ITER]
    pairs = [k + m for k in kana_noiter for m in marks4]
    cands_strs = set()
    for k in kana_noiter:
        p = plain_of.get(k, k)
        for cand in (k + k, k + p, k + k + "゙", k + p + "゙", k + "ゝ"):
            cands_strs.add(cand)
    allk = keys_of(pairs + sorted(cands_strs) + ["ゝ"])
    own12 = (lvl(allk["ゝ"])[0], None)
    for k in kana_noiter:
        p = plain_of.get(k, k)
        for m in marks4:
            km = allk[k + m]
            got = (lvl(km)[0], lvl(km)[1])
            verdict = None
            for name, cand in (("self", k + k), ("plain", k + p),
                               ("self_dak", k + k + "゙"),
                               ("plain_dak", k + p + "゙")):
                ck = allk[cand]
                if got == (lvl(ck)[0], lvl(ck)[1]):
                    verdict = name
                    break
            if verdict is None:
                # own-primary: the mark kept its symbol-zone weight
                if lvl(km)[0].endswith(lvl(allk["ゝ"])[0][-2:]):
                    verdict = "none"
                else:
                    print(f"UNCLASSIFIED iteration {k!r}+{m!r}: {km.hex()}")
                    verdict = "none"
            if verdict != "none":
                iter_behavior[(k, m)] = verdict
    # plain==self for unvoiced kana makes "plain" and "self" identical
    # labels there; canonicalize to "self" when p == k
    iter_behavior = {
        (k, m): ("self" if v == "plain" and plain_of.get(k, k) == k else v)
        for (k, m), v in iter_behavior.items()
    }

    # ---- punctuation / symbol ladder -----------------------------------
    pu = keys_of(PUNCT + [c for c in "09azAZ"] + ["０", "９", "ａ", "ｚ", "Ａ", "Ｚ"])
    groups: dict[bytes, list[str]] = defaultdict(list)
    for c in PUNCT:
        groups[pu[c]].append(c)  # FULL-key tie groups (fold candidates)
    # the iteration and length marks interleave WITH the punct ladder
    # (probed: ~ < ゝ < ー < $) — merge them in by measured key so the
    # spec can assign one contiguous weight run below digits
    groups[kk["ゝ"]].append("\x00ITER")
    groups[kk["ー"]].append("\x00LENGTH")
    ladder = sorted(groups.items(), key=lambda kv: kv[0])
    digit0 = pu["0"]
    below = [(k, cs) for k, cs in ladder if k < digit0]
    above = [(k, cs) for k, cs in ladder if k >= digit0]
    if above:
        print("punct at/above '0':", [(cs, k.hex()) for k, cs in above])

    # fullwidth alnum folds
    for a, b in [("０", "0"), ("９", "9"), ("ａ", "a"), ("ｚ", "z"),
                 ("Ａ", "A"), ("Ｚ", "Z")]:
        if pu[a] != pu[b]:
            print(f"fullwidth {a!r} != {b!r}: {pu[a].hex()} vs {pu[b].hex()}")

    # ---- Han order ------------------------------------------------------
    # 〇 keys IDENTICAL to '0' in ja (probed) — it is a digit alias,
    # not part of the Han translate repertoire
    # round 16: the shared full repertoire — core + Ext-A + the
    # supplementary Extensions B..I + NFC-stable compat singles
    # (gen_zh_pinyin.HAN_BLOCKS; probed distinct in ja like zh)
    from gen_zh_pinyin import han_repertoire

    han = han_repertoire()
    assert keys_of(["〇"])["〇"] == pu["0"]
    hkk = keys_of(han)
    prims = {s: lvl(k)[0] for s, k in hkk.items()}
    if len(set(prims.values())) != len(han):
        cnt = defaultdict(list)
        for s, p in prims.items():
            cnt[p].append(s)
        dups = {p: cs for p, cs in cnt.items() if len(cs) > 1}
        print(f"HAN PRIMARY TIES: {len(dups)} groups, e.g. "
              f"{list(dups.values())[:3]} — excluding tied chars")
        tied = {c for cs in dups.values() for c in cs}
        han = [c for c in han if c not in tied]
    han_order = "".join(sorted(han, key=lambda s: hkk[s]))

    # Han sit above kana, below nothing else in scope
    kana_max = max(lvl(kk[c])[0] for c in kana)
    han_min = min(prims[c] for c in han)
    assert han_min > kana_max, (han_min.hex(), kana_max.hex())

    # ---- report ---------------------------------------------------------
    n_cl = sum(1 for c in clone)
    print(f"kana primary classes: {len(kana_classes)}; "
          f"voiced decomposed: {len(voiced_decomp)}; clone map: {n_cl}")
    print(f"punct groups below digits: {len(below)}; han: {len(han_order)}")

    # ---- emit -----------------------------------------------------------
    out_classes = []
    for prim, normal, small, voiced, half in kana_classes:
        out_classes.append((sorted(normal), sorted(small), sorted(half)))
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""Measured ja collation data (GENERATED — do not edit; '
            "regenerate with\nscripts/gen_ja_collation.py). Probed from "
            "DuckDB's bundled ICU 'ja'\ncollation (public CLDR/JIS "
            'data); every invariant verified at generation."""\n\n'
        )
        f.write(f"HAN_JA_ORDER = {han_order!r}\n\n")
        f.write("#: kana primary classes in measured order: "
                "(normal_chars, small_chars, halfwidth-E0 chars)\n")
        f.write(f"KANA_CLASSES = {out_classes!r}\n\n")
        f.write("#: precomposed voiced kana -> (plain kana, combining mark)\n")
        f.write(f"VOICED_DECOMP = {voiced_decomp!r}\n\n")
        f.write("#: kana char -> vowel index (アイウエオ) its ー clones\n")
        f.write(f"LENGTH_CLONE = {clone!r}\n\n")
        f.write("#: punctuation/symbol primary tie-groups below digits, "
                "in measured order\n")
        f.write(f"PUNCT_GROUPS = {[cs for _, cs in below]!r}\n\n")
        f.write("#: (kana, iteration mark) -> measured expansion class\n")
        f.write(f"ITER_BEHAVIOR = {iter_behavior!r}\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
