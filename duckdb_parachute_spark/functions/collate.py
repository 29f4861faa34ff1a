"""Collations (SURVEY §1.2): NOCASE / NOACCENT / locale collation keys.

Reference: DuckDB ships NOCASE and NOACCENT as built-in collations
(src/function/scalar/string/ — registered in CollationBinding) plus the ICU
locale collations (extension/icu/icu_extension.cpp:119 ``icu_collate_*``).
A collation in DuckDB rewrites comparisons to run on a *collation key*
derived from the string.

Spark has no COLLATE clause (pre-4.0 collation support is not in this
build), so the same semantics are expressed explicitly: ``collation_key``
derives the comparison key and the caller groups / filters / sorts on it —
which is literally what the reference does under the hood.

Locale collations are implemented as **three-level UCA-style sort keys**
built from pure Catalyst expressions (lower / replace / translate / concat —
no UDF, whole-stage codegen end to end):

    key = primary  <0x01>  secondary  <0x01>  tertiary

* primary   — lowercased string with the locale's CLDR tailoring applied
  (tailored letters remapped so bytewise UTF-8 order equals the tailored
  alphabet order: a letter sorting as a new letter after base ``B`` becomes
  ``B`` + an ASCII marker ``{``/``|``/``}`` > ``'z'``), then accent-folded.
* secondary — lowercased string with accents intact (unaccented before
  accented on equal primaries); locale contractions fold to their letter
  (da ``aa`` ≡ å at this level too).
* tertiary  — case level. CLDR ``caseFirst`` varies by locale: Danish is
  upper-first with its aa-contraction case forms interleaved as
  Å < AA < Aa < å < aa (each pinned against DuckDB's ICU), most others
  lower-first, so the tertiary key is the token string with contraction
  forms mapped to ordered digits plus either raw bytes (upper-first:
  uppercase codepoints are smaller) or a case-swap (lower-first).

Separator 0x01 sorts below every printable character, so a prefix sorts
before its extensions exactly as in UCA.

Supported locale subset (validated property-style against DuckDB's ICU
collations in tests/test_properties.py): da/nb/no (æ ø å after z in that
order; the case forms of the ``aa``/``aå`` digraphs contract to å at the
primary level with ICU's exact case/secondary interleaving; upper-first),
sv/fi (å ä ö after z), de (ß ≡ ss at primary, umlauts at secondary),
es (ñ as a separate letter after n), cs (č ř š ž after their base letters;
digraph ``ch`` as a separate letter after h), pl (ą ć ę ł ń ó ś ź ż after
their bases), ro (ă â after a, î after i, ș ț after s/t with the legacy
cedilla forms ş/ţ EQUAL to them at every strength, as ICU ties them), tr (ç ğ ö ş ü after their bases and
the four-way dotted/dotless i: …h < ı < i < j with I the uppercase of ı and
İ of i, tokenized before lower() — Java's İ→"i"+combining-dot lowercasing
never runs), is (accented vowels as full letters after their bases, ð after
d, …z < þ < æ < ö), et (the base-letter move: s < š < z < ž < t, and
õ ä ö ü after w), lt (č š ž primary after their bases; the ogonek/dot/
macron vowels SECONDARY — 'ab' < 'ąb' < 'ac' — and y primary-equal to i,
i << į << y at the secondary level, via single-codepoint secondary
weights), sk (ch after h; ä and ô FULL letters after a/o while the acutes
stay secondary; č š ž after their bases), hr (č ć after c, dž đ after d,
š ž after s/z, and the lj/nj/dž digraph contractions with case forms
lj < Lj < LJ — mixed lJ is l+J, not a contraction), cy (EIGHT digraph
letters ch dd ff ng ll ph rh th, each after its base — ng after g — with
lower < title < upper case forms; circumflex vowels secondary), hu (cs
dzs gy ly ny sz ty zs as full letters — dz untailored — with the DOUBLED
written forms ccs/ssz/… equal to the spelled-out pair at primary+secondary
and a tertiary step after; ö/ü full letters with ő/ű secondary; contraction
matching via the leftmost-greedy marker regex because sz/zs overlap
cyclically). Outside the tailored letters,
accented input folds to its base letter at the primary level — full ICU
root-order for arbitrary scripts is out of scope (documented SURVEY §1.2);
punctuation is compared bytewise (ICU default non-ignorable).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from duckdb_parachute_spark.functions.metrics import strip_accents

#: level separator — below every printable char, so prefixes sort first.
_SEP = "\x01"
#: secondary "after" marker — above every letter byte we emit (å/ä/č are
#: 0xC3-0xC5-lead UTF-8; U+FFFF is 0xEF-lead), so an element tailored
#: secondary-after a letter beats any continuation of the plain letter.
_AFTER = "\uffff"

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()
_X_LOWER = (
    "æøåäöñüčřšž" + "ąćęłńóśźż" + "ăâîșțşţ" + "çğ" + "áðéíúýþõėįųū" + "ďĺľňôŕťđ"
    + "êûŵŷőű"
)
_X_UPPER = (
    "ÆØÅÄÖÑÜČŘŠŽ" + "ĄĆĘŁŃÓŚŹŻ" + "ĂÂÎȘȚŞŢ" + "ÇĞ" + "ÁÐÉÍÚÝÞÕĖĮŲŪ" + "ĎĹĽŇÔŔŤĐ"
    + "ÊÛŴŶŐŰ"
)
#: Vietnamese tone table (round 12): base letter -> its five toned forms in
#: ICU vi's SECONDARY order (measured on DuckDB: plain < grave < hỏi <
#: tilde < acute < dot-below, e.g. a < à < ả < ã < á < ạ). str.upper()
#: yields the exact uppercase forms.
_VI_TONES = {
    "a": "àảãáạ", "ă": "ằẳẵắặ", "â": "ầẩẫấậ",
    "e": "èẻẽéẹ", "ê": "ềểễếệ",
    "i": "ìỉĩíị",
    "o": "òỏõóọ", "ô": "ồổỗốộ", "ơ": "ờởỡớợ",
    "u": "ùủũúụ", "ư": "ừửữứự",
    "y": "ỳỷỹýỵ",
}
#: vi + lv chars missing from the _X swap tables (computed with dedupe so
#: translate() never sees a duplicated source char; lv needs the long
#: vowels ā ē ī ō — ū is already present via lt)
_VI_EXTRA_LOWER = "".join(
    c
    for c in ("ơư" + "".join(_VI_TONES.values()) + "āēīō")
    if c not in _X_LOWER and c not in _LOWER
)
_VI_EXTRA_UPPER = _VI_EXTRA_LOWER.upper()

#: translate() args for the lower-first tertiary key (swap case so that
#: lowercase sorts before uppercase bytewise).
_SWAP_SRC = _LOWER + _UPPER + _X_LOWER + _X_UPPER + _VI_EXTRA_LOWER + _VI_EXTRA_UPPER
_SWAP_DST = _UPPER + _LOWER + _X_UPPER + _X_LOWER + _VI_EXTRA_UPPER + _VI_EXTRA_LOWER


#: single-char tokens for the Danish aa/aå contractions' case forms (upper,
#: title, lower of each digraph — mixed 'aA'/'aÅ' are NOT contractions; all
#: pinned against DuckDB's ICU da). The replace order AA → Aa → aa → AÅ →
#: Aå → aå reproduces ICU's leftmost-greedy contraction matching on every
#: overlap: a pattern whose first char can be another's second char runs
#: AFTER it ('AAa' = AA|a, 'Aaa' = Aa|a, 'aaåx' = aa|å, 'aAå' = a|Aå).
_T_AA, _T_At, _T_aa = "\x02", "\x03", "\x04"
_T_AO, _T_Ao, _T_ao = "\x05", "\x06", "\x07"
#: Turkish case-crossing tokens: I is the uppercase of ı, İ of i — both must
#: leave the string BEFORE lower() runs (Java lowercases I→i, losing the
#: distinction, and İ→"i"+combining-dot, corrupting lengths).
_T_TI, _T_Ti = "\x0e", "\x0f"
#: Croatian digraph tokens (round 11): lj/nj/dž case forms lj<Lj<LJ etc. —
#: the mixed forms lJ/nJ/dŽ are NOT contractions (l + letter J), measured
#: on DuckDB's ICU hr: 'lJa' < 'lja' < 'Lja' < 'LJa'. No overlap hazards:
#: no pattern's first char is another's second char.
_T_lj, _T_Lj, _T_LJ = "\x10", "\x11", "\x12"
_T_nj, _T_Nj, _T_NJ = "\x13", "\x14", "\x15"
_T_dz, _T_Dz, _T_DZ = "\x16", "\x17", "\x18"


@dataclass(frozen=True)
class _LocaleSpec:
    """CLDR tailoring subset for one locale, as ordered replace rules
    per key level. ``tokenize`` runs first on the RAW string (case-sensitive
    contraction tokenization); each level then maps tokens/letters for
    bytewise comparison."""

    primary: tuple[tuple[str, str], ...]
    tokenize: tuple[tuple[str, str], ...] = field(default=())
    secondary: tuple[tuple[str, str], ...] = field(default=())
    #: tertiary per-char translate (src, dst) applied to the token string;
    #: identity means raw-bytes case order.
    tertiary: tuple[str, str] = field(default=("", ""))
    upper_first: bool = False
    #: leftmost-greedy contraction MARKER regex (round 11, Hungarian): when
    #: a locale's contractions overlap cyclically (hu sz/zs: sz's z starts
    #: zs and zs's s starts sz), NO order of chained replace() reproduces
    #: ICU's leftmost-greedy matching — but one global regexp_replace with
    #: longest-first alternatives does. Matches are wrapped \x1f…\x1f and
    #: the ordinary tokenize replaces then consume the UNAMBIGUOUS marked
    #: spellings ('\x1fsz\x1f').
    pretokenize: str = ""
    #: secondary per-char TRANSLATE (src, dst) applied AFTER the secondary
    #: replaces (round 13, root spec): one translate carries the ~190-char
    #: accent→weight table that would otherwise be 190 chained replaces.
    secondary_translate: tuple[str, str] = field(default=("", ""))
    #: primary per-char TRANSLATE (src, dst) applied AFTER the primary
    #: replaces (round 14, he): carries a SCRIPT REORDER — CLDR 'he'
    #: declares Hebrew-before-Latin, so Hebrew letters map to weight chars
    #: below 'a' (the primary level is post-lower(), so A-Z are free).
    primary_translate: tuple[str, str] = field(default=("", ""))
    #: regexp_replace applied FIRST, before tokenize (round 14, th): Thai
    #: prevowels collate AFTER the consonant they precede — one regex swap
    #: (single pass, non-overlapping, like ICU's own reorder scan).
    pretransform: tuple[str, str] = field(default=("", ""))
    #: regexp_replace pairs applied AFTER tokenize (round 16, ja): the
    #: contextual length/iteration-mark rules need the voiced kana
    #: ALREADY decomposed so one optional-mark group covers both plain
    #: and voiced contexts (and halfwidth ﾞ naturally blocks them).
    posttransform: tuple = field(default=())
    #: one F.translate applied BEFORE posttransform (round 16, ko): maps
    #: chars needing CONTEXTUAL regex treatment into contiguous
    #: unassigned-plane code blocks so the posttransform classes compile
    #: to O(1) RANGE checks — Java Pattern scans big enumerated classes
    #: linearly, which made 27 enumerated-class passes ~70x slower.
    pretranslate: tuple[str, str] = field(default=("", ""))
    #: apply strip_accents at the end of the primary pipeline (round 15,
    #: zh): a spec whose primary_translate already folds every in-scope
    #: accented char sets this False — the strip would be a no-op on the
    #: supported repertoire, and its astral-gated codepoint-map pass
    #: would fire on every supplementary-plane weight char.
    primary_strip: bool = True


_LOCALES: dict[str, _LocaleSpec] = {
    # Danish: …z < æ < ø < å; aa ≡ aå ≡ å at primary; caseFirst=upper with
    # the case-variant interleaving Å < AA < Aa < å < aa at tertiary and the
    # aå digraph's case forms AÅ < Aå < aå a SECONDARY step after the å/aa
    # group (CLDR da: &å<<<Å<<<aa<<<Aa<<<AA<<aå<<<Aå<<<AÅ, caseFirst=upper;
    # each pinned against DuckDB's ICU da —
    # reference extension/icu/icu_extension.cpp:119).
    "da": _LocaleSpec(
        tokenize=(
            ("AA", _T_AA),
            ("Aa", _T_At),
            ("aa", _T_aa),
            ("AÅ", _T_AO),
            ("Aå", _T_Ao),
            ("aå", _T_ao),
        ),
        primary=(
            (_T_AA, "z}"),
            (_T_At, "z}"),
            (_T_aa, "z}"),
            (_T_AO, "z}"),
            (_T_Ao, "z}"),
            (_T_ao, "z}"),
            ("æ", "z{"),
            ("ø", "z|"),
            ("å", "z}"),
        ),
        secondary=(
            (_T_AA, "å"),
            (_T_At, "å"),
            (_T_aa, "å"),
            (_T_AO, "å" + _AFTER),
            (_T_Ao, "å" + _AFTER),
            (_T_ao, "å" + _AFTER),
        ),
        tertiary=(
            "Å" + _T_AA + _T_At + "å" + _T_aa + _T_AO + _T_Ao + _T_ao,
            "12345678",
        ),
        upper_first=True,
    ),
    # Swedish / Finnish: …z < å < ä < ö.
    "sv": _LocaleSpec(primary=(("å", "z{"), ("ä", "z|"), ("ö", "z}"))),
    # German: ß ≡ ss at primary; umlauts are secondary (handled by the
    # generic accent fold + accents-intact secondary).
    "de": _LocaleSpec(primary=(("ß", "ss"),)),
    # Spanish (modern): ñ is a separate letter between n and o.
    "es": _LocaleSpec(primary=(("ñ", "n{"),)),
    # Czech: č/ř/š/ž after their bases; digraph ch after h.
    "cs": _LocaleSpec(
        primary=(("ch", "h{"), ("č", "c{"), ("ř", "r{"), ("š", "s{"), ("ž", "z{")),
    ),
    # Polish: ą ć ę ł ń ó ś ź ż are separate letters directly after their
    # bases (ź before ż).
    "pl": _LocaleSpec(
        primary=(
            ("ą", "a{"),
            ("ć", "c{"),
            ("ę", "e{"),
            ("ł", "l{"),
            ("ń", "n{"),
            ("ó", "o{"),
            ("ś", "s{"),
            ("ź", "z{"),
            ("ż", "z|"),
        ),
    ),
    # Romanian: ă < â after a, î after i, ș after s, ț after t; the legacy
    # cedilla forms ş/ţ are EQUAL to the comma-below forms at every ICU
    # strength (measured round 11 on DuckDB's ICU ro by sorting BOTH input
    # orders: ['ş','ș'] and ['ș','ş'] each come back unchanged — a stable
    # sort on equal keys; the old "pinned: 'șb' < 'şb'" was that stable-sort
    # artifact read as an ordering). Tokenize rewrites every cedilla case
    # form to its comma form BEFORE any level splits, so all three key
    # levels alias — the one documented exception to the key's injectivity.
    "ro": _LocaleSpec(
        tokenize=(("ş", "ș"), ("Ş", "Ș"), ("ţ", "ț"), ("Ţ", "Ț")),
        primary=(
            ("ă", "a{"),
            ("â", "a|"),
            ("î", "i{"),
            ("ș", "s{"),
            ("ț", "t{"),
        ),
    ),
    # Turkish: ç ğ ö ş ü after their bases, and the four-way dotted/dotless
    # i — alphabet …h < ı < i < j with I the UPPERCASE of ı and İ of i
    # (pinned: 'kız' < 'kIz' < 'kiz' < 'kİz' in ICU tr; lower-first case).
    # I/İ tokenize before lower() — see _T_TI/_T_Ti.
    "tr": _LocaleSpec(
        tokenize=(("I", _T_TI), ("İ", _T_Ti)),
        primary=(
            (_T_TI, "h{"),
            ("ı", "h{"),
            (_T_Ti, "h|"),
            ("i", "h|"),
            ("ç", "c{"),
            ("ğ", "g{"),
            ("ö", "o{"),
            ("ş", "s{"),
            ("ü", "u{"),
        ),
        secondary=((_T_TI, "ı"), (_T_Ti, "i")),
        tertiary=("ı" + _T_TI + "i" + _T_Ti, "0123"),
    ),
}
_LOCALES.update(
    {
        # Icelandic (round 10): accented vowels are FULL letters directly
        # after their bases, ð after d, and the tail …z < þ < æ < ö — all
        # pinned on DuckDB's ICU is: a á b d ð e é f i í o ó u ú y ý z þ æ ö,
        # lower-first case (aA). No contractions.
        "is": _LocaleSpec(
            primary=(
                ("á", "a{"), ("ð", "d{"), ("é", "e{"), ("í", "i{"),
                ("ó", "o{"), ("ú", "u{"), ("ý", "y{"),
                ("þ", "z{"), ("æ", "z|"), ("ö", "z}"),
            ),
        ),
        # Estonian (round 10): the famous BASE-LETTER MOVE — z sorts inside
        # the s group (s < š < z < ž < t), and õ ä ö ü follow w before x/y
        # (pinned on ICU et: s š z ž t u v w õ ä ö ü x y, lower-first).
        "et": _LocaleSpec(
            primary=(
                ("š", "s{"), ("ž", "s}"), ("z", "s|"),
                ("õ", "w{"), ("ä", "w|"), ("ö", "w}"), ("ü", "w~"),
            ),
        ),
        # Lithuanian (round 10): č/š/ž are primary letters after their
        # bases, but the ogonek/dot/macron vowels are SECONDARY differences
        # and y is PRIMARY-EQUAL to i (measured on DuckDB's ICU lt:
        # 'ab' < 'ąb' < 'ac', 'ib' < 'įb' < 'yb' < 'ic', eb < ęb < ėb,
        # ub < ųb < ūb — accent-like, NOT full letters; lower-first). The
        # generic accent fold supplies the primary merge for the vowels;
        # secondary replaces pin the within-group order where raw bytes
        # disagree (ė < ę and ū < ų bytewise, ICU wants the reverse).
        "lt": _LocaleSpec(
            primary=(
                ("č", "c{"), ("š", "s{"), ("ž", "z{"), ("y", "i"),
            ),
            # secondary weights must stay SINGLE codepoints here: UCA
            # compares secondaries position-by-position, so a 1→2 char
            # marker would shift later positions ('eą' must sort before
            # 'ęa' — the weight of position 1 decides, not string length).
            # Natural codepoints already give a < ą, i < į; the two pairs
            # whose byte order ICU reverses borrow the UPPERCASE codepoint
            # sitting one below the lower form (Ė=U+0116 < ė=U+0117,
            # Ū=U+016A < ū=U+016B), and y borrows dotless ı (U+0131 > į).
            secondary=(
                ("ę", "Ė"), ("ų", "Ū"), ("y", "ı"),
            ),
        ),
    }
)
_LOCALES.update(
    {
        # Slovak (round 11, measured on DuckDB's ICU sk): ch a full letter
        # after h (as in Czech); ä a FULL letter after a ('azz' < 'äa' <
        # 'ba' — unlike German's secondary umlaut); ô a full letter after o
        # ('ozz' < 'ôa' < 'pa', while ó stays a secondary accent); č š ž
        # after their bases. The acute/caron accents á é í ó ú ý ĺ ľ ŕ ň ď ť
        # are SECONDARY ('aa' < 'áa' < 'ab') — the generic accent fold
        # handles them, with ĺ(U+013A) < ľ(U+013E) already in codepoint
        # order. Lower-first case (cha < cHa < Cha < CHa = the cs contraction
        # case shape, reproduced by the lower()-collapse + case-swap).
        "sk": _LocaleSpec(
            primary=(
                ("ch", "h{"),
                ("ä", "a{"),
                ("č", "c{"),
                ("ô", "o{"),
                ("š", "s{"),
                ("ž", "z{"),
            ),
        ),
        # Croatian (round 11, measured on DuckDB's ICU hr): full-letter
        # alphabet c < č < ć < d < dž < đ < e, l < lj < m, n < nj < o,
        # s < š < t, z < ž. The digraphs lj/nj/dž contract case-sensitively
        # (lj < Lj < LJ at tertiary, lower-first; mixed lJ/nJ/dŽ are l+J
        # etc., NOT contractions — all pinned both input orders). Tokens
        # leave the string before lower() so DŽ→dž lowercasing never runs.
        "hr": _LocaleSpec(
            tokenize=(
                ("LJ", _T_LJ), ("Lj", _T_Lj), ("lj", _T_lj),
                ("NJ", _T_NJ), ("Nj", _T_Nj), ("nj", _T_nj),
                ("DŽ", _T_DZ), ("Dž", _T_Dz), ("dž", _T_dz),
            ),
            primary=(
                (_T_lj, "l{"), (_T_Lj, "l{"), (_T_LJ, "l{"),
                (_T_nj, "n{"), (_T_Nj, "n{"), (_T_NJ, "n{"),
                (_T_dz, "d{"), (_T_Dz, "d{"), (_T_DZ, "d{"),
                ("č", "c{"),
                ("ć", "c|"),
                ("đ", "d|"),
                ("š", "s{"),
                ("ž", "z{"),
            ),
            secondary=(
                (_T_lj, "lj"), (_T_Lj, "lj"), (_T_LJ, "lj"),
                (_T_nj, "nj"), (_T_Nj, "nj"), (_T_NJ, "nj"),
                (_T_dz, "dž"), (_T_Dz, "dž"), (_T_DZ, "dž"),
            ),
            tertiary=(
                _T_lj + _T_Lj + _T_LJ + _T_nj + _T_Nj + _T_NJ + _T_dz + _T_Dz + _T_DZ,
                "123123123",
            ),
        ),
    }
)
def _welsh_spec() -> _LocaleSpec:
    """Welsh (round 11, measured on DuckDB's ICU cy): EIGHT digraph letters
    — ch dd ff ng ll ph rh th — each a full letter directly after its base,
    including the famous ng AFTER g ('gzz' < 'nga' < 'ha'); case forms
    contract lower < title < upper (lLa < lla < Lla < LLa: mixed lL is
    l + L, not a contraction), lower-first; circumflex vowels â ê î ô û ŵ ŷ
    are secondary accents via the generic fold. Tokens come from the
    private-use area (24 of them: 8 digraphs × 3 case forms), built
    programmatically."""
    digraphs = ["ch", "dd", "ff", "ng", "ll", "ph", "rh", "th"]
    tokenize, primary, secondary = [], [], []
    t_src, t_dst = "", ""
    for i, dg in enumerate(digraphs):
        lower, title, upper = dg, dg.capitalize(), dg.upper()
        toks = [chr(0xE000 + 3 * i + j) for j in range(3)]
        # longest-uppercase first reproduces leftmost-greedy matching on
        # self-overlaps ('LLl' = LL|l, 'lll' = ll|l)
        tokenize += [(upper, toks[2]), (title, toks[1]), (lower, toks[0])]
        # each digraph is a full letter after its FIRST letter — except ng,
        # which sorts after G ('gzz' < 'nga' < 'ha'). Round 12: the slot
        # said 'n{' here, contradicting the measurement above — caught by
        # this round's 200-example deep pass drawing ['H', 'NG'].
        slot = ("g" if dg == "ng" else dg[0]) + "{"
        primary += [(t, slot) for t in toks]
        secondary += [(t, lower) for t in toks]
        t_src += "".join(toks)
        t_dst += "123"
    return _LocaleSpec(
        tokenize=tuple(tokenize),
        primary=tuple(primary),
        secondary=tuple(secondary),
        tertiary=(t_src, t_dst),
    )


_LOCALES["cy"] = _welsh_spec()


def _hungarian_spec() -> _LocaleSpec:
    """Hungarian (round 11, all measured on DuckDB's ICU hu): the digraphs
    cs dzs gy ly ny sz ty zs are FULL letters after their bases (dz is NOT
    tailored — 'dza' < 'dzz' measured, matching CLDR hu); ö/ü are full
    letters after o/u with ő/ű their secondary long forms; á é í ó ú stay
    secondary accents. The DOUBLED written forms (ccs ≡ cs+cs, ssz, ggy,
    lly, nny, tty, zzs, ddzs) expand to a doubled-marked first token + a
    plain second: equal at primary AND secondary to the spelled-out pair,
    with the tertiary per-token order cs < ccs-part < Cs < Ccs-part < CS <
    CCS-part (measured: cscsa < ccsa < CsCsa < Ccsa < CCSa). Contraction
    matching is the leftmost-greedy marker regex (pretokenize) because
    sz/zs overlap cyclically."""
    digraphs = ["cs", "dzs", "gy", "ly", "ny", "sz", "ty", "zs"]
    alts, tokenize, primary, secondary = [], [], [], []
    t_src, t_dst = "", ""
    for i, dg in enumerate(digraphs):
        lower, title, upper = dg, dg.capitalize(), dg.upper()
        dbl_lower = dg[0] + dg  # ccs, ddzs, ...
        dbl_title = dg[0].upper() + dg
        dbl_upper = dbl_lower.upper()
        # 6 tokens: lower, title, upper, and their doubled-marked variants
        t = [chr(0xE020 + 6 * i + j) for j in range(6)]
        # longest alternatives first: doubled forms, then plain case forms
        alts += [dbl_lower, dbl_title, dbl_upper, upper, title, lower]
        mk = lambda s: "\x1f" + s + "\x1f"
        tokenize += [
            (mk(dbl_lower), t[3] + t[0]),
            (mk(dbl_title), t[4] + t[0]),
            (mk(dbl_upper), t[5] + t[2]),
            (mk(upper), t[2]),
            (mk(title), t[1]),
            (mk(lower), t[0]),
        ]
        slot = dg[0] + "{"
        primary += [(x, slot) for x in t]
        secondary += [(x, lower) for x in t]
        t_src += "".join(t)
        # tertiary digits: lower=1 < dbl-part=2 < title=3 < dbl-title-part=4
        # < upper=5 < dbl-upper-part=6; token order in t is
        # [lower, title, upper, dbl-lo, dbl-ti, dbl-up]
        t_dst += "135246"
    return _LocaleSpec(
        pretokenize="(" + "|".join(alts) + ")",
        tokenize=tuple(tokenize),
        primary=tuple(primary)
        + (("ö", "o{"), ("ő", "o{"), ("ü", "u{"), ("ű", "u{")),
        secondary=tuple(secondary),
        tertiary=(t_src, t_dst),
    )


_LOCALES["hu"] = _hungarian_spec()


def _greek_spec() -> _LocaleSpec:
    """Greek (round 12, VERDICT r11 missing #3 — measured on DuckDB's ICU
    el): a different SCRIPT exercises the key machinery beyond Latin.
    Measured pins: [reorder Grek] puts Greek between digits and Latin
    ('0' < 'α' < … < 'ω' < 'a'), so the 24 letters map to ASCII 'A'-'X'
    (uppercase ASCII is free in the primary space — the primary level
    lowercases Latin first). Tonos is SECONDARY ('αα' < 'αά' < 'άα') with
    dialytika above it (ι < ί < ϊ < ΐ); case is TERTIARY lower-first with
    final sigma a tertiary step above uppercase: σ < Σ < ς (pinned:
    'σι' < 'Σι' < 'ςι' < 'σϊ' — ς/σ tie at both primary AND secondary,
    so 'σϊ' with its secondary dialytika sorts after all of them)."""
    gl = "αβγδεζηθικλμνξοπρστυφχψω"
    gu = "ΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡΣΤΥΦΧΨΩ"
    # accent folds FIRST (primary replaces run before the generic
    # strip_accents, which would otherwise fold ά->α after α was mapped)
    folds = [(t, b) for t, b in zip("άέήίόύώϊϋΐΰς", "αεηιουωιυιυσ")]
    primary = tuple(folds + [(c, chr(ord("A") + i)) for i, c in enumerate(gl)])
    # secondary ranks: tonos < dialytika < tonos+dialytika; ς ties σ
    sec = (
        [(t, b + "￰") for t, b in zip("άέήίόύώ", "αεηιουω")]
        + [("ϊ", "ι￴"), ("ϋ", "υ￴"), ("ΐ", "ι￸"), ("ΰ", "υ￸")]
        + [("ς", "σ")]
    )
    # tertiary: case-swap Greek (lower-first — uppercase codepoints are
    # smaller) with ς above the swapped Σ image (U+03E2 > U+03C3); the
    # tonos/dialytika case pairs swap too. ΐ/ΰ have no single-char upper:
    # their tertiary never decides (secondary already split them).
    t_src = gl + gu + "ς" + "άέήίόύώ" + "ΆΈΉΊΌΎΏ" + "ϊϋΪΫ"
    t_dst = gu + gl + "Ϣ" + "ΆΈΉΊΌΎΏ" + "άέήίόύώ" + "ΪΫϊϋ"
    return _LocaleSpec(primary=primary, secondary=tuple(sec), tertiary=(t_src, t_dst))


_LOCALES["el"] = _greek_spec()


def _vietnamese_spec() -> _LocaleSpec:
    """Vietnamese (round 12, VERDICT r11 missing #3 — measured on DuckDB's
    ICU vi): the stacked-diacritics locale. ă â after a, đ after d, ê after
    e, ô ơ after o, ư after u — FULL letters whose five TONED forms keep the
    letter's primary slot (ằ sorts with ă, not a — the stacking: breve is
    primary, tone secondary). Tone order is plain < grave < hỏi < tilde <
    acute < dot-below, positional ('aa' < 'aà' < 'aạ' < 'àa' < 'ăa');
    case is tertiary lower-first ('à' < 'À' < 'á' < 'Á' < 'aA' < 'Aa')."""
    letters = [
        ("ă", "a{"), ("â", "a|"), ("ê", "e{"),
        ("ô", "o{"), ("ơ", "o|"), ("ư", "u{"),
    ]
    primary = []
    for base, target in letters:
        primary.extend((t, target) for t in _VI_TONES[base])
        primary.append((base, target))
    primary.append(("đ", "d{"))
    # plain-vowel tones (à á ả ã ạ …) fold via the generic strip_accents
    marks = "￱￲￳￴￵"  # grave hỏi tilde acute dot
    sec = [
        (t, base + marks[r])
        for base, tones in _VI_TONES.items()
        for r, t in enumerate(tones)
    ]
    return _LocaleSpec(primary=tuple(primary), secondary=tuple(sec))


_LOCALES["vi"] = _vietnamese_spec()

def _russian_spec() -> _LocaleSpec:
    """Russian (round 12 — the SECOND non-Latin script after el, measured
    on DuckDB's ICU ru): [reorder Cyrl] puts Cyrillic between digits and
    Latin ('0' < а..я < a..z < Greek). The 32 primary letters (а-я with й
    a full letter; ё EXCLUDED — measured SECONDARY over е: 'еа' < 'ёа' <
    'ежз') map onto the 32 ASCII codes 0x41-0x60 ('A'-'Z' plus [\\]^_` —
    free in the primary space because the primary level lowercases Latin;
    a LITERAL [\\]^_` in input ties with the tail letters, the same
    accepted marker-collision caveat as the {|} letters markers). Case is
    tertiary lower-first via a Cyrillic swap local to this spec."""
    letters = "абвгдежзийклмнопрстуфхцчшщъыьэюя"
    assert len(letters) == 32
    e_slot = chr(ord("A") + letters.index("е"))
    primary = [("ё", e_slot)] + [
        (c, chr(ord("A") + i)) for i, c in enumerate(letters)
    ]
    upper = letters.upper()
    return _LocaleSpec(
        primary=tuple(primary),
        secondary=(("ё", "е￰"),),
        tertiary=(letters + upper + "ёЁ", upper + letters + "Ёё"),
    )


_LOCALES["ru"] = _russian_spec()


# Latvian (round 12, measured on DuckDB's ICU lv): č ģ ķ ļ ņ š ž are FULL
# letters directly after their bases; the macron vowels ā ē ī ō ū are
# SECONDARY ('aa' < 'āa' < 'ab', 'īa' < 'izz') — the generic accent fold +
# accents-intact secondary reproduce them with no explicit rules; case is
# tertiary lower-first (a < A < ā < Ā via the extended swap table).
_LOCALES["lv"] = _LocaleSpec(
    primary=(
        ("č", "c{"), ("ģ", "g{"), ("ķ", "k{"), ("ļ", "l{"),
        ("ņ", "n{"), ("š", "s{"), ("ž", "z{"),
    ),
)

# Slovenian (round 12, measured on DuckDB's ICU sl): c < č < ć < d < đ < e,
# s < š, z < ž — the Croatian letter set without the digraph contractions;
# lower-first case.
_LOCALES["sl"] = _LocaleSpec(
    primary=(
        ("č", "c{"), ("ć", "c|"), ("đ", "d{"), ("š", "s{"), ("ž", "z{"),
    ),
)

def _pua_run(base: int, n: int) -> str:
    """``n`` increasing codepoints from ``base``, skipping the per-plane
    noncharacters U+xFFFE/U+xFFFF (round 16 — the CJK Han repertoires
    outgrew a single plane-15 block; UTF-8 byte order is monotonic in
    codepoint, so a run crossing into plane 16 still sorts correctly)."""
    out: list[str] = []
    cp = base
    while len(out) < n:
        if (cp & 0xFFFE) != 0xFFFE:
            out.append(chr(cp))
        cp += 1
    if cp > 0x10FFFE:
        raise ValueError(f"PUA slot run overflow: base={base:#x} n={n}")
    return "".join(out)


def _latin_accent_tables() -> tuple[dict, str, str]:
    """The root spec's accented-Latin enumeration (also reused by zh):
    char -> (base letter, NFD mark-sequence rank) for every lowercase
    Latin char whose marks are in the measured DUCET ladder, plus the
    stroke/eth/middle-dot forms with no combining decomposition; and the
    derived secondary translate (src, dst) where each char maps to ONE
    private-use weight encoding (base, rank) — see _root_spec."""
    import unicodedata as _ud

    mark_order = {
        0x0301: 0, 0x0300: 1, 0x0306: 2, 0x0302: 3, 0x030C: 4, 0x030A: 5,
        0x0308: 6, 0x030B: 7, 0x0303: 8, 0x0307: 9, 0x0327: 10,
        # 12 stroke has no combining-mark decomposition — assigned via
        # the explicit table below
        0x0328: 15, 0x0304: 16, 0x0309: 17, 0x0323: 18,
        # COMMA-BELOW sits ABOVE dot-below (round-16 grid audit:
        # sort-key CA > C4 — ț keys after ṭ, ș after ṩ; the r13 sweep
        # sampled ș/ț only against cedilla forms and missed it)
        0x0326: 19,
    }
    # ð and ŀ are NOT in the accent window at all (round-16 grid audit):
    # ð carries the LIGATURE-band secondary (a bare [70], same band as
    # æ/ß's first element) and ŀ a [FB DB] mark above every accent —
    # both handled as explicit \uf000-band secondary replaces in the
    # root and zh specs, not here.
    explicit = {
        "ø": ("o", (12,)), "đ": ("d", (12,)), "ħ": ("h", (12,)),
        "ł": ("l", (12,)),
    }
    char_seq: dict[str, tuple[str, tuple[int, ...]]] = dict(explicit)
    # 0x1CD-0x1DC and 0x1F8-0x1F9 are the pinyin tone block (ǎ ǐ ǒ ǔ,
    # the ǖ-family double-mark forms, ǹ) — added round 15 for zh; for
    # root locales they fold exactly like the other caron/grave chars
    # (previously a raw-byte residual, strictly closer to ICU now)
    for cp in [*range(0xC0, 0x180), 0x219, 0x21B, *range(0x1CD, 0x1DD),
               *range(0x1F8, 0x1FA), *range(0x1E00, 0x1F00)]:
        c = chr(cp)
        if c != c.lower() or c in explicit:
            continue
        d = _ud.normalize("NFD", c)
        base, marks = d[0], d[1:]
        if not ("a" <= base <= "z") or not marks:
            continue
        if any(ord(m) not in mark_order for m in marks):
            continue
        char_seq[c] = (base, tuple(mark_order[ord(m)] for m in marks))
    ranks: dict[str, list[tuple[int, ...]]] = {}
    for base, seq in char_seq.values():
        ranks.setdefault(base, []).append(seq)
    for base in ranks:
        ranks[base] = sorted(set(ranks[base]))
    src = dst = ""
    for c, (base, seq) in sorted(char_seq.items()):
        code = 0xE800 + (ord(base) - 0x61) * 64 + ranks[base].index(seq) + 1
        src += c
        dst += chr(code)
    return char_seq, src, dst


def _root_spec() -> _LocaleSpec:
    """ICU ROOT collation over the Latin repertoire (round 13, VERDICT r12
    missing #3 — reference extension/icu registers every CLDR locale, and
    untailored ones resolve to root). All orders MEASURED on DuckDB's ICU
    through untailored locales (pt):

    * Accents are SECONDARY, in the DUCET mark order acute < grave < breve
      < circumflex < caron < ring < diaeresis < double-acute < tilde <
      dot-above < cedilla < comma-below < stroke < eth < middle-dot <
      ogonek < macron < hook-above < dot-below ('ax' < 'áx' < 'àx' < … <
      'ạx', 'cx' < 'ćx' < 'ĉx' < 'čx' < 'ċx' < 'çx', 'ȯx' < 'øx' < 'ǫx',
      'ḑx' < 'đx' < 'ðx', positional: 'aax' < 'aáx' < 'áax'). Each
      accented char maps to ONE private-use char whose codepoint encodes
      (base letter, rank of its NFD mark sequence within that base) — a
      single translate, and lexicographic sequence ranks make multi-mark
      chars (ắ = breve+acute) extend their single-mark prefix correctly.
    * Ligatures expand at primary (ß ≡ ss, æ ≡ ae, œ ≡ oe, ĳ ≡ ij); at
      SECONDARY the ligature's FIRST element carries a mark weight
      ABOVE every accent ('ae' < 'aé' < 'àe' < 'àé' < 'æ' and 'ss' <
      'sś' < 'sṣ' < 'śs' < 'ß', each measured; the sort-key bytes [70]
      vs the accents' two-byte [45 xx] confirm — round 15, previously
      mis-folded secondary-equal, found by a fresh hypothesis draw
      'Æ' vs 'aÉ').
      ĳ alone IS secondary-equal to ij, split at TERTIARY (sort-key
      [06 | d3d3]; 'ij' < 'ĳ' < 'ij́' measured); case forms split at
      tertiary by raw bytes ('aex' < … < 'AEx' < 'æx' < 'Æx').
    * Three genuine PRIMARY letters hide in the Latin blocks: þ after z,
      ŧ after t, ŋ after n ('tzx' < 'ŧx' < 'ux') — full-letter slots.
    * Case is tertiary lower-first ('ax' < 'aX' < 'Ax' < 'AX' < 'áx').

    Served for the measured allowlist of locales DuckDB's bundle resolves
    to root (en pt nl id it ms sw) — an unknown locale still raises, since
    CLDR-tailored locales we have not measured (az, uk, …) would silently
    get root order. Residuals: ʼn/ĸ/ſ and non-Latin bases stay raw-byte
    compared; symbols above 'z' (~, |) keep bytewise order where DUCET
    sorts them before letters — same caveat as every tailored spec."""
    char_seq, src, dst = _latin_accent_tables()
    return _LocaleSpec(
        primary=(
            ("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("ĳ", "ij"),
            ("þ", "z{"), ("ŧ", "t{"), ("ŋ", "n{"),
            ("ø", "o"), ("đ", "d"), ("ð", "d"), ("ł", "l"), ("ŀ", "l"),
            ("ħ", "h"),
        ),
        secondary=(
            # the ligature mark rides the FIRST element: one weight char
            # above every accent window (the windows end at \uee3f) and
            # below _AFTER serves all slots; ĳ folds — its split is
            # tertiary
            ("ß", chr(0xF000) + "s"),
            ("æ", chr(0xF000) + "e"),
            ("œ", chr(0xF000) + "e"),
            ("ĳ", "ij"),
            # ð/ŀ: ligature-band secondaries (grid audit r16 — ICU keys
            # ð [70] and ŀ [FB DB] above EVERY accent; the r13 ladder
            # placed them between stroke and ogonek, which 'ḑx'<'đx'<'ðx'
            # alone could not falsify)
            ("ð", chr(0xF000)),
            ("ŀ", chr(0xF000)),
        ),
        secondary_translate=(src, dst),
    )


_ROOT_SPEC = _root_spec()
#: locales served by the root spec: each is BOTH untailored in full CLDR
#: (so the mapping is right against any ICU) AND verified root-equal in
#: DuckDB's bundle on distinguishing material (accents, ligatures, ç/ch).
#: Locales the bundle strips to root but CLDR tailors (sq, ig, yo, ha,
#: zu — measured root-equal here) are NOT aliased, the same
#: CLDR-over-bundle stance as nb/no below; they still raise.
for _root_loc in ("en", "pt", "nl", "id", "it", "ms", "sw", "fr",
                  "af", "ga"):
    _LOCALES[_root_loc] = _ROOT_SPEC

# gl and fil are NOT root-equal (round-16 grid audit): both tailor ñ as a
# PRIMARY letter after n (sort-key 4502 vs n 44; es-style), and fil
# additionally has the ng digraph as a primary letter after ñ (4503,
# CLDR &n < ñ <<< Ñ < ng <<< Ng <<< NG; mixed 'nG' is NOT a contraction
# — probed). Both keep the full root accent/ligature model underneath.
# The ng case forms tokenize like the hr digraphs; the raw token bytes
# \x1a < \x1b < \x1c already encode the lower-first tertiary ladder.
import dataclasses as _dc

# ŋ keeps its own primary after the tailored letters in both (probed:
# fil/gl ŋ = 451E > ñ 4502 > ng 4503), so it re-maps past them.
_LOCALES["gl"] = _dc.replace(
    _ROOT_SPEC,
    primary=(("ñ", "n{"), ("ŋ", "n|")) + _ROOT_SPEC.primary,
)
_LOCALES["fil"] = _dc.replace(
    _ROOT_SPEC,
    tokenize=(("NG", "\x1c"), ("Ng", "\x1b"), ("ng", "\x1a")),
    primary=(("ñ", "n{"), ("\x1a", "n|"), ("\x1b", "n|"), ("\x1c", "n|"),
             ("ŋ", "n}"))
    + _ROOT_SPEC.primary,
    secondary=(("\x1a", "n|"), ("\x1b", "n|"), ("\x1c", "n|"))
    + _ROOT_SPEC.secondary,
)

# root-case swap additions: accented pairs the tailored tables don't carry
# (à/À, â/Â, ã/Ã, ë/Ë, ï/Ï, …) — previously raw-byte (upper-first) at the
# tertiary level; ICU root is lower-first for them everywhere, so the
# extension is strictly closer to ICU for every lower-first locale.
_ROOT_EXTRA_LOWER = "".join(
    c for c in sorted(
        set(_ROOT_SPEC.secondary_translate[0]) | {"ŀ", "ĳ", "ŋ", "ŧ", "œ"}
    )
    # swap ONLY pairs whose raw bytes are upper-first; ÿ/Ÿ (FF/178) is
    # already lower-first raw and swapping would INVERT it (round-16
    # grid audit find — masked until the ĳ/ŋ/œ gaps were fixed)
    if len(c.upper()) == 1 and c.upper() != c and c not in _SWAP_SRC
    and ord(c.upper()) < ord(c)
)
_ROOT_EXTRA_UPPER = _ROOT_EXTRA_LOWER.upper()
_SWAP_SRC = _SWAP_SRC + _ROOT_EXTRA_LOWER + _ROOT_EXTRA_UPPER
_SWAP_DST = _SWAP_DST + _ROOT_EXTRA_UPPER + _ROOT_EXTRA_LOWER


# Norwegian shares the Danish tailoring in CLDR. (DuckDB's bundled ICU data
# resolves 'nb'/'no' to the ROOT collation — observed empirically — so these
# aliases intentionally follow CLDR rather than that fallback.)
_LOCALES["nb"] = _LOCALES["da"]
_LOCALES["no"] = _LOCALES["da"]
_LOCALES["fi"] = _LOCALES["sv"]


def _hebrew_spec() -> _LocaleSpec:
    """Hebrew (round 14, VERDICT r13 next #5 — the first NON-LATIN script
    here): CLDR 'he' carries NO letter tailoring, but it DOES declare a
    script REORDER (Hebrew before Latin) on top of the DUCET fallback —
    exactly the class the root spec could not serve. Everything measured
    on DuckDB's ICU:

    * Letters sort in alphabet order (block codepoint order minus
      finals); a SCRIPT REORDER puts every Hebrew letter before every
      Latin one and after digits ('1' < 'א' < 'a') — letters translate to
      the free A-V range at the post-lower() primary level.
    * FINAL forms are a SECONDARY-after variant of their letter, BELOW
      every mark ('כא' < 'ךא' < 'כָא' measured): fold at primary, fold +
      low weight \\ue8fe at secondary.
    * Niqqud are SECONDARY marks in the measured order sheva <
      hataf-segol < hataf-patah < hataf-qamats < hiriq < tsere < segol <
      patah < qamats < holam < qubuts < sin-dot < shin-dot < dagesh <
      rafe ('ב' < 'בָ' < 'בא' < 'באָ' < 'בָא'); strip_accents drops them
      at primary (category Mn). Probed EQUALITY ties (aliased at every
      level, like ro's ş ≡ ș): meteg is completely IGNORABLE
      ('בֽ' = 'ב'), qamats-qatan ≡ qamats, holam-haser ≡ holam.
      Input is assumed canonically ordered (NFC) — ICU normalizes mark
      runs by combining class before collating; non-canonical sequences
      compare in raw mark order (same residual class as the Latin
      specs' precomposed assumption).
    * Yiddish ligatures expand: װ ≡ וו, ױ ≡ וי, ײ ≡ יי at primary AND
      secondary, tertiary raw bytes give the measured pair-first order
      ('וו' < 'װא').
    * Hebrew punctuation (geresh ׳ gershayim ״ maqaf ־ paseq ׀ sof-pasuq
      ׃ nun-hafukha ׆) sorts between '.' and digits in that order
      (measured) — mapped to '/1'…'/6'. Residuals: ASCII punctuation
      order vs these is bytewise (the standing caveat), and the rare
      upper/lower dots U+05C4/05C5 stay raw-byte."""
    finals = {"ך": "כ", "ם": "מ", "ן": "נ", "ף": "פ", "ץ": "צ"}
    ligs = {"װ": "וו", "ױ": "וי", "ײ": "יי"}
    punct = {"׳": "/1", "״": "/2", "־": "/3", "׀": "/4", "׃": "/5", "׆": "/6"}
    letters = "".join(
        chr(c) for c in [*range(0x05D0, 0x05DA), 0x05DB, 0x05DC, 0x05DE,
                         0x05E0, 0x05E1, 0x05E2, 0x05E4, *range(0x05E6, 0x05EB)]
    )
    # (mark, weight): shared weights carry the probed ties; meteg sits
    # past the end of the dst string, so the translate DELETES it
    mark_weights = [
        (0x05B0, 0), (0x05B1, 1), (0x05B2, 2), (0x05B3, 3), (0x05B4, 4),
        (0x05B5, 5), (0x05B6, 6), (0x05B7, 7), (0x05B8, 8), (0x05C7, 8),
        (0x05B9, 9), (0x05BA, 9), (0x05BB, 10), (0x05C2, 11), (0x05C1, 12),
        (0x05BC, 13), (0x05BF, 14),
    ]
    sec_src = "".join(chr(c) for c, _ in mark_weights) + "ֽ"
    sec_dst = "".join(chr(0xE901 + w) for _, w in mark_weights)
    return _LocaleSpec(
        primary=tuple(finals.items()) + tuple(ligs.items()) + tuple(punct.items()),
        primary_translate=(letters, "ABCDEFGHIJKLMNOPQRSTUV"),
        secondary=tuple(finals.items())
        + tuple(ligs.items()),
        secondary_translate=(sec_src, sec_dst),
        # tertiary: finals swap with their regulars (regular < final,
        # measured single-letter order), and the full-strength ties alias
        # here too: qamats-qatan -> qamats, holam-haser -> holam, meteg
        # deleted (dst two short)
        tertiary=("ךכםמןנףפץצ"
                  "ׇֺֽ",
                  "כךמםנןפףצץ"
                  "ָֹ"),
    )


_LOCALES["he"] = _hebrew_spec()


def _thai_spec() -> _LocaleSpec:
    """Thai (round 14, second non-Latin script): like 'he', CLDR 'th'
    rides the DUCET fallback with a script REORDER (digits < Thai <
    Latin) plus structural rules, every one probed on DuckDB's ICU:

    * PREVOWELS เแโใไ collate AFTER the consonant they precede ('เก'
      groups under ก) — one single-pass regex swap, non-overlapping like
      ICU's own scan (so 'เเก' -> เกเ and 'เกเ' -> กเเ stay distinct,
      matching the measured strict order).
    * Consonants ก-ฮ in codepoint order (raw); vowels are PRIMARY in the
      measured ladder ะ ั า ิ ี ึ ื ุ ู เ แ โ ใ ไ ฺ (phinthu LAST, after
      the prevowels) — translated to a contiguous PUA run ABOVE raw
      consonants, which also rescues the Mn vowels from the primary
      accent-strip; Latin letters translate above the vowels.
    * NIKHAHIT is a PRIMARY element slotted BETWEEN consonants and
      vowels ('กํข' < 'กะข'), and ำ is the CONTRACTION [า, nikhahit] —
      'กาข' < 'กำข' (ข < nikhahit) but 'กำa' < 'กาa' (nikhahit < Latin),
      both measured; the explicit sequence ํ + า contracts identically
      ('กําข' adjacent-below 'กำข', distinct only at tertiary).
    * LAKKHANGYAO ๅ is primary-EQUAL to า with a secondary step after
      ('กา' < 'กๅ' < any า+mark form).
    * Tone/sign marks are SECONDARY in the measured ladder yamakkan <
      thanthakhat < maitaikhu < mai ek..chattawa, positionally.
    * Thai digits ๐-๙ EQUAL ASCII 0-9 at every strength ('๐' = '0'
      probed TRUE) — aliased at all three levels.
    * CLDR th is alternate=SHIFTED: the VARIABLE class (space,
      punctuation, ฯ, ๆ — 'กฯ' = 'ก' probed TRUE) is ignorable at all
      three strengths; bounded here to ASCII space+punctuation plus the
      Thai signs (other scripts' punctuation stays raw, caveat)."""
    cons_swap = ("([\u0e40-\u0e44])([\u0e01-\u0e2e])", "$2$1")
    nik = "\ue1f0"  # the nikhahit primary element: consonants < it < vowels
    vowel_ladder = [0x0E30, 0x0E31, 0x0E32, 0x0E34, 0x0E35, 0x0E36, 0x0E37,
                    0x0E38, 0x0E39, 0x0E40, 0x0E41, 0x0E42, 0x0E43, 0x0E44,
                    0x0E3A]
    mark_ladder = [0x0E4E, 0x0E4C, 0x0E47, 0x0E48, 0x0E49, 0x0E4A, 0x0E4B]
    thai_digits = "".join(chr(0x0E50 + i) for i in range(10))
    digit_alias = tuple((chr(0x0E50 + i), str(i)) for i in range(10))
    # the explicit-sequence contractions ํ+า and ํ+ๅ collate like ำ at
    # primary AND secondary, splitting only at TERTIARY in the probed
    # order ํา (C7) < ำ (C8) < ํๅ (C5C6C6) — tokenized so the raw token
    # bytes \x1a < \x1b < \x1c carry that tertiary ladder directly
    # (round 16; r14 had modeled the ๅ variants as a SECONDARY step,
    # which the exhaustive grid falsified: ๅ is tertiary-equal to า,
    # 'กา' ≡ 'กๅ' through L2 with tert C6)
    am_tok = (("ํา", "\x1a"), ("ำ", "\x1b"), ("ํๅ", "\x1c"))
    am = tuple((t, "า" + nik) for _, t in am_tok)
    # VARIABLE (shifted → fully ignorable) is the PUNCTUATION class
    # only; the math/modifier/currency symbols ` ^ + < = > | ~ $ (and ฿)
    # keep real primaries in the measured order, BELOW digits (round-16
    # grid audit — each probed via icu_sort_key: ` 0C04 < ^ 0C0A <
    # + 0C79 < < 0C81 < = 0C83 < > 0C85 < | 0C89 < ~ 0C8D < $ 0D8A <
    # ฿ 0DAA < '0')
    variable = " !\"#%&'()*,-./:;?@[\\]_{}" + "ฯๆ"
    symbols = "`^+<=>|~$฿"
    p_src = ("".join(chr(c) for c in vowel_ladder) + "ํ" + _LOWER + symbols
             + variable)
    p_dst = ("".join(chr(0xE201 + i) for i in range(len(vowel_ladder)))
             + nik + "".join(chr(0xE801 + i) for i in range(26))
             + "".join(chr(0x02 + i) for i in range(len(symbols))))
    s_src = "".join(chr(c) for c in mark_ladder) + "ํ" + variable
    s_dst = ("".join(chr(0xE901 + i) for i in range(len(mark_ladder))) + nik)
    # UCA variable shifting, second half (round-16 grid audit): an
    # L1-IGNORABLE element (the secondary tone/sign marks 0E47-0E4C,
    # 0E4E) directly following a SHIFTED variable is itself shifted to
    # quaternary — fully ignorable (probed: ' ่' ≡ ' ' ≡ '!' all key
    # [0101]; 'ก่' keeps its mark). One regex deletes such runs before
    # any level sees them. Nikhahit/phinthu are primary elements and
    # stay.
    kill_after_var = (
        "([ -#%-*,-/:;?@\\x5B-\\x5D_{}ฯๆ])([\\u0E47-\\u0E4C\\u0E4E]+)", "$1")
    return _LocaleSpec(
        pretransform=(kill_after_var, cons_swap),
        tokenize=am_tok,
        primary=digit_alias + am + (("ๅ", "า"),),
        primary_translate=(p_src, p_dst),
        secondary=digit_alias + am + (("ๅ", "า"),),
        secondary_translate=(s_src, s_dst),
        # tertiary: digit aliases keep the full-strength tie; the variable
        # class (past the dst end) deletes
        tertiary=(thai_digits + variable, "0123456789"),
    )


_LOCALES["th"] = _thai_spec()


def _arabic_spec() -> _LocaleSpec:
    """Arabic (round 15, VERDICT r14 next #4 — third non-Latin script):
    like 'he', CLDR 'ar' rides the DUCET fallback with a script REORDER
    (punctuation < digits < Arabic < Latin). Every rule below was
    measured on DuckDB's ICU (reference extension/icu/
    icu_extension.cpp:119), decoding icu_sort_key('…','ar') into
    primary/secondary/tertiary runs and confirming each with sorts:

    * 33 PRIMARY letters in the measured ladder ا ب ت ث ج ح خ د ذ ر ز س
      ش ص ض ط ظ ع غ ف ق ك ػ ؼ ل م ن ه و ي ؽ ؾ ؿ — translated to a PUA
      run above digits; Latin a-z translate above Arabic (the reorder).
    * The HAMZA family shares the alef primary, split at SECONDARY in
      the measured ladder ء < أ < ؤ < إ < ئ < ا; آ (alef madda) EXPANDS
      to TWO alef primaries whose secondaries are [baseline, above-ا]
      (sort-key run-decode 2706 06 / 45 4c, confirmed by the measured
      order ءا < آ < أا < اء < اا).
    * ة is primary-EQUAL to ت with a BELOW-baseline secondary (sec 02 <
      05: ةب between تا and تب, measured); ى likewise under ي (sec 03).
    * HARAKAT ً ٌ ٍ َ ُ ِ ّ ْ (064B-0652), madda ٓ, and superscript
      alef ٰ are TERTIARY-only marks in ICU ar (sort keys carry sec 05),
      laddered in codepoint order — raw codepoints already induce the
      measured order ب < بً < … < بْ < بٰ, so they are simply DELETED at
      primary (strip_accents, category Mn) and secondary (translate past
      dst) and left raw at tertiary. COMBINING hamza above/below
      (0654/0655) are SECONDARY marks ABOVE the whole hamza-family
      ladder (بٰ < بٔ < بٕ measured).
    * TATWEEL ـ is completely ignorable ('بـا' = 'با' probed TRUE) —
      deleted at all three levels.
    * Arabic-Indic digits ٠-٩ EQUAL ASCII 0-9 at every strength
      ('٠' = '0' probed TRUE) — aliased at all three levels.
    * LAM-ALEF presentation forms ﻵﻶﻷﻸﻹﻺﻻﻼ (FEF5-FEFC) equal their
      logical lam + alef-form pairs at full strength (probed TRUE each)
      — tokenized to the pair so every level sees the logical spelling.
    * Arabic punctuation ، ؛ ؟ ٪ sorts directly after its ASCII
      counterpart and before digits (measured ك,ب < ك،ب < ك;ب < ك؛ب <
      ك0ب < كب) and is NOT variable-ignorable ('ك،' ≠ 'ك' probed) —
      mapped to counterpart+'~' at primary.
    * Input is assumed NFC (the he/th posture): ا+0654 arrives
      precomposed as أ. Residuals: other scripts and Quranic annotation
      signs (0656+) stay raw-byte; an ASCII ',~' ties ، at primary only
      (split at secondary, deterministic)."""
    letters = "ابتثجحخدذرزسشصضطظعغفقكػؼلمنهويؽؾؿ"
    harakat = "".join(chr(c) for c in range(0x064B, 0x0654))  # 064B-0653
    digits = "".join(chr(0x0660 + i) for i in range(10))
    lam_alef = {
        "ﻵ": "لآ", "ﻶ": "لآ", "ﻷ": "لأ", "ﻸ": "لأ",
        "ﻹ": "لإ", "ﻺ": "لإ", "ﻻ": "لا", "ﻼ": "لا",
    }
    # the five NFC compositions of the block (ICU normalizes internally,
    # so decomposed hamza/madda carriers tie their precomposed letter —
    # 'ا\u0653' ≡ 'آ' measured; everything else in scope has no
    # composition and keeps its combining-mark handling)
    nfc = {
        "ا\u0653": "آ", "ا\u0654": "أ", "و\u0654": "ؤ",
        "ا\u0655": "إ", "ي\u0654": "ئ",
    }
    # ى+0655 (alef maqsura + hamza below) is the ONE hamza-family
    # contraction with NO precomposed codepoint (round 16, VERDICT r15
    # #1): ICU keys it 2706/4A — a single alef primary with its own
    # secondary slot between ئ (49) and bare ا (4B), re-probed on the
    # exhaustive seat×mark grid (scripts/collation_grid_audit.py). It
    # gets its own ladder token — no precomposed alias exists.
    maq_hamza = ("ى\u0655", "\x19")
    # ASCII punctuation in the MEASURED DUCET ladder (space _ - , ; : ! ?
    # . ' " ( ) [ ] { } @ * / \\ & # % ` ^ + < = > | ~ $ — each probed via
    # icu_sort_key), translated to a \\x02.. run below digits; the Arabic
    # marks pair their ASCII counterpart with a near-max char so every
    # counterpart-prefixed string sorts before them (ICU: ',X' < '،'
    # for ANY X, measured).
    ascii_punct = " _-,;:!?.'\"()[]{}@*/\\&#%`^+<=>|~$"
    hi = "\uf8ff"
    punct = (("،", "," + hi), ("؛", ";" + hi), ("؟", "?" + hi), ("٪", "%" + hi))
    family_primary = (
        ("آ", "اا"), ("ء", "ا"), ("أ", "ا"), ("ؤ", "ا"), ("إ", "ا"), ("ئ", "ا"),
        ("\x19", "ا"),
    )
    # secondary ladder: ء stays raw (baseline, below the PUA weights);
    # آ's first alef is baseline too, its second sits above ا's weight
    family_secondary = (
        ("آ", "ء\ue907"), ("أ", "\ue901"), ("ؤ", "\ue902"), ("إ", "\ue903"),
        ("ئ", "\ue904"), ("\x19", "\ue905"), ("ا", "\ue906"),
    )
    return _LocaleSpec(
        # ICU matches the ى+0655 contraction DISCONTIGUOUSLY: tertiary-only
        # marks (harakat 064B-0652, superscript alef 0670) between ى and
        # 0655 are skipped, and their tertiary weights follow the
        # contraction's (probed: ىِّٕ keys sec 4A + tert [contraction]
        # [0650][0651]). NFC can't reorder them (ccc 27-35 < 220). One
        # regex hoists 0655 over the run so the literal tokenize sees it;
        # the displaced marks keep their relative order after the token.
        pretransform=("ى([\u064B-\u0652\u0670]+)\u0655", "ى\u0655$1"),
        # nfc aliases run BEFORE the lam-alef expansion (round-16 grid
        # audit): ICU gives the FEFB ligature its own l+a expansion and
        # does NOT contract a following 0654/0655 into it (probed:
        # ﻻ+0654 keys sec [4B][E880], NOT لأ's [46]) — expanding first
        # would let the alias recombine them.
        tokenize=tuple(nfc.items()) + tuple(lam_alef.items()) + (maq_hamza,),
        primary=family_primary + (("ة", "ت"), ("ى", "ي")) + punct,
        primary_translate=(
            letters + digits + _LOWER + ascii_punct + "ـ",
            "".join(chr(0xE101 + i) for i in range(len(letters)))
            + "0123456789"
            + "".join(chr(0xE801 + i) for i in range(26))
            + "".join(chr(0x02 + i) for i in range(len(ascii_punct))),
        ),
        secondary=family_secondary + (("ة", "Ā"), ("ى", "ā")),
        secondary_translate=(
            digits + "ٕٔ" + harakat + "ٰـ",
            "0123456789",
        ),
        # tertiary: digit aliases keep the full-strength tie; tatweel
        # (past the dst end) deletes; harakat stay raw — their codepoint
        # ladder 064B-0653 IS the measured tertiary order. COMBINING
        # 0654/0655 (secondary marks) carry the LOW normal tertiary in
        # ICU (06 — grid-probed: إٔ < إٓٔ), so they map BELOW the
        # whole harakat/0653/0670 ladder, not raw (round 16, the second
        # find of the exhaustive seat×mark grid).
        tertiary=(digits + "\u0654\u0655ـ", "0123456789\x1a\x1b"),
    )


_LOCALES["ar"] = _arabic_spec()


def _zh_spec(stroke: bool = False) -> _LocaleSpec:
    """Chinese pinyin ('zh' — round 15, the first CJK script; reference
    extension/icu/icu_extension.cpp:119). DuckDB's bundled ICU carries
    the full CLDR zh pinyin tailoring; every rule below was measured on
    it (sorts + icu_sort_key decodes):

    * HAN sorts by PINYIN READING in one reorder block between digits
      and Latin ('9' < '阿' < … < 'a'). The supported repertoire
      (round 16: 97,725 chars) — CJK Unified incl. U+9FFD-9FFF,
      Extension A, supplementary Extensions B/C/D/E/F/G/H/I, the twelve
      NFC-stable compatibility ideographs, and 〇 — every one with a
      DISTINCT measured primary (verified at generation;
      scripts/gen_zh_pinyin.py regenerates zh_pinyin_data from the live
      bundle). The probed zone structure is tailored Han (core pinyin +
      the Ext-A/plane-2 reading-interleaved zone) BELOW Latin and the
      bundle's implicit zone (9FFD-9FFF, Ext-H/I, unassigned tails)
      ABOVE Latin — reproduced as two slot runs around the Latin
      slots.
    * PINYIN TONE marks are SECONDARY-BEFORE the plain letter in the
      ladder macron < acute < caron < grave < plain ('ā'<'á'<'ǎ'<'à'<'a',
      'tǖz' < 'tüz', each measured; tone dominates case — 'āx' < 'āX' <
      'Āx' < 'ax'); ü is a FULL pinyin letter between u and v, and the
      root's þ/ŧ/ŋ letters keep their after-z/t/n slots (measured).
      Non-tone accents stay root-style secondary-ABOVE ('e' < 'ê');
      ligatures keep the root model ('ae' < 'æ', 'ss' < 'ß', measured).
    * CJK punctuation pairs its ASCII counterpart (',' < '，' < '、' <
      ';', '.' < '。' < '·', '(' < '（', '~' < '～', ' ' < '　', and —
      round 16 — the 12 brackets 〈〉《》「」『』【】〔〕 between '}' and
      '@' plus '‧' between '%' and '`', all measured), and the
      printable-ASCII ladder is the same measured DUCET order as
      'ar'. FULLWIDTH digits fold at primary+secondary and split at
      tertiary ('01' < '０1' < '0x'); fullwidth letters are a TERTIARY
      step inside the case ladder ('ax' < 'aX' < 'ａx' < 'ａX' < 'Ax' <
      'Ａx' — a < ａ < A < Ａ per slot, measured).
    * Residuals (documented): the combining-sequence pinyin syllabics
      m̄/ê̄, compatibility ideographs WITH canonical decompositions
      (out of scope by the NFC contract — NFC rewrites them to their
      unified forms), and other scripts stay raw-byte. zh_cn measured
      identical and aliases; zh_tw/zh_hant/yue (stroke), ja, and ko all
      landed in round 16 (``stroke=True``, _ja_spec, _ko_spec) — every
      locale the reference's bundle tailors is now served."""
    if stroke:
        from duckdb_parachute_spark.functions.zh_stroke_data import (
            BPMF_PRIM_ALIAS,
            BPMF_SEC,
            BPMF_SEC_DELETE,
            BPMF_TERT,
            HAN_STROKE_HIGH as HAN_PINYIN_HIGH,
            HAN_STROKE_ORDER as HAN_PINYIN_ORDER,
        )
    else:
        from duckdb_parachute_spark.functions.zh_pinyin_data import (
            HAN_PINYIN_HIGH,
            HAN_PINYIN_ORDER,
        )

        BPMF_PRIM_ALIAS, BPMF_SEC, BPMF_TERT = {}, {}, {}
        BPMF_SEC_DELETE = ""

    char_seq, acc_src, acc_dst = _latin_accent_tables()
    letters = "abcdefghijklmnŋopqrstŧuvwxyzþ"
    # slot layout (round 16 — the Han repertoire grew past one plane-15
    # block): tailored Han 0xF1000.., Latin 0x109000.., implicit-zone
    # Han 0x10A000.., the CJK-punct marker at the very top — matching
    # the PROBED zh primary zones (tailored Han 0x69-0xA6 < Latin
    # 0xA8-0xDA < implicit 0xFE).
    lat_slot = {c: chr(0x109000 + i) for i, c in enumerate(letters)}
    # tone ladder: macron < acute < caron < grave < plain (measured);
    # the ǖ-family + ü are NOT tones: they are a secondary ladder ABOVE
    # the root-accent window at the u slot (sort-key decode: u=05 <
    # û=458e < ů=4592 < ǖ=46 < ǘ=47 < ǚ=48 < ǜ=49 < ü=4a; confirmed by
    # 'tûz' < 'tǖz' < 'tüz')
    tone_sec = tuple(
        (c, w)
        for w, chars in (("\x11", "āēīōū"), ("\x12", "áéíóúńḿ"),
                         ("\x13", "ǎěǐǒǔň"), ("\x14", "àèìòùǹ"))
        for c in chars
    ) + tuple(
        (c, chr(0xEE01 + i)) for i, c in enumerate("ǖǘǚǜü")
    ) + tuple(
        # macron+acute / macron+grave vowels: ICU zh keys them as the
        # MACRON TONE followed by the generic acute/grave mark (probed
        # r16: ḗ = [02][88], ḕ = [02][8A] — NOT a root accent-window
        # weight). The trailing mark occupies an EXTRA secondary slot
        # the plain tone vowel doesn't have, so ICU compares it against
        # the NEXT element's weight — common for plain letters, 45xx
        # for accents, 70 for ligatures — and the mark always wins
        # ('ēḃ' < 'ḗḃ', 'ēß' < 'ḗß' both probed). The trailing chars
        # therefore sit ABOVE everything a following char can put at
        # the secondary level (raw ≤0x9FFF, the root window ≤\uee7f,
        # the ǖ/ế ladders, the \uf000 ligature band).
        (c, "\x11" + m)
        for c, m in (("ḗ", "\uf100"), ("ṓ", "\uf100"),
                     ("ḕ", "\uf101"), ("ṑ", "\uf101"),
                     # ṻ: macron TONE + root diaeresis (probed [02][96])
                     ("ṻ", "\uf102"))
    ) + (
        # ế/ề: tone acute/grave on pinyin ê — a ladder ABOVE the root
        # window at the e slot (probed ê=458E < ế=47 < ề=49, the ǘ/ǜ
        # slots); the o-circumflex family stays root (ố=458E88 probed)
        ("ế", chr(0xEE02)), ("ề", chr(0xEE04)),
    )
    # accented Latin folds to its base slot at primary (strip_accents is
    # skipped — primary_strip=False — so the fold must live here); the
    # whole ü/ǖ family has char_seq base u, which IS its primary slot
    acc_fold_src = "".join(c for c in char_seq if c not in lat_slot)
    acc_fold_dst = "".join(lat_slot[char_seq[c][0]] for c in acc_fold_src)
    fw_lower = "".join(chr(0xFF41 + i) for i in range(26))  # ａ-ｚ
    fw_digits = "".join(chr(0xFF10 + i) for i in range(10))  # ０-９
    # the printable-ASCII DUCET ladder with the CJK-native punctuation
    # at its MEASURED positions (round 16 closes the bracket residual:
    # 、 between , and ;, 。/· after ., the 12 CJK brackets between }
    # and @, ‧ between % and ` — each a distinct primary, so they are
    # plain translate slots like everything else). 51 slots outgrow the
    # sub-digit \x02-\x2f range, so digits re-slot to \x40.. (still
    # punct < digits < Han < Latin, the measured zone order); the
    # FULLWIDTH clones （），～ etc. and ０-９ fold at primary+secondary
    # and split at TERTIARY (，=[06|05|d0] — measured).
    punct_ladder = " _-,、;:!?.。·'\"()[]{}〈〉《》「」『』【】〔〕@*/\\&#%‧`^+<=>|~$"
    digit_slots = "".join(chr(0x40 + i) for i in range(10))
    fw_punct_src = "，；：！？（）～　"
    fw_punct_dst = ",;:!?()~ "
    return _LocaleSpec(
        primary=(("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("ĳ", "ij"),
                 # ð/ŀ fold to their base slots here (they left the
                 # shared accent table in round 16 — ligature-band chars)
                 ("ð", "d"), ("ŀ", "l")),
        primary_translate=(
            HAN_PINYIN_ORDER + HAN_PINYIN_HIGH
            + "".join(BPMF_PRIM_ALIAS)
            + letters + acc_fold_src
            + fw_lower + "0123456789" + fw_digits
            + fw_punct_src + punct_ladder,
            (low_run := _pua_run(0xF1000, len(HAN_PINYIN_ORDER)))
            + _pua_run(0x10A000, len(HAN_PINYIN_HIGH))
            + "".join(low_run[HAN_PINYIN_ORDER.index(r)]
                      for r in BPMF_PRIM_ALIAS.values())
            + "".join(lat_slot[c] for c in letters)
            + acc_fold_dst
            + "".join(lat_slot[c] for c in _LOWER)
            + digit_slots + digit_slots
            + "".join(
                chr(0x02 + punct_ladder.index(c)) for c in fw_punct_dst
            )
            + "".join(chr(0x02 + i) for i in range(len(punct_ladder))),
        ),
        primary_strip=False,
        secondary=tone_sec + (
            ("ß", chr(0xF000) + "s"),
            ("æ", chr(0xF000) + "e"),
            ("œ", chr(0xF000) + "e"),
            ("ĳ", "ij"),
            ("ð", chr(0xF000)),
            ("ŀ", chr(0xF000)),
        ),
        secondary_translate=(
            # Han chars are DELETED from the secondary text (src past the
            # dst end): ICU gives every Han element the common secondary
            # 05, and two strings whose primaries tie carry IDENTICAL Han
            # chars position-for-position, so the only comparison a Han
            # secondary can decide is against a PRECEDING element's
            # trailing mark — where the raw 4-byte plane-2 char wrongly
            # outranked the U+F100 trailing slots (round-16 fix, probed
            # 'ē𠀀' < 'ḗ𠀀'). Deletion reproduces ICU exactly: the
            # trailing mark wins against whatever follows.
            "".join(BPMF_SEC) + acc_src + fw_lower + fw_digits + fw_punct_src
            + HAN_PINYIN_ORDER + HAN_PINYIN_HIGH + BPMF_SEC_DELETE,
            "".join(BPMF_SEC.values()) + acc_dst + _LOWER + "0123456789"
            + fw_punct_dst,
        ),
        # tertiary: fullwidth letters slot INSIDE the case ladder (the
        # case swap runs after and leaves these weights alone); digits
        # and everything else stay raw
        tertiary=(fw_lower + fw_lower.upper() + "".join(BPMF_TERT),
                  "`" * 26 + "\x7f" * 26 + "".join(BPMF_TERT.values())),
    )


_LOCALES["zh"] = _zh_spec()
_LOCALES["zh_cn"] = _LOCALES["zh"]
#: Traditional-Chinese STROKE order ('zh_tw' — round 16): byte-identical
#: non-Han surface to 'zh' (probed: same order and tie classes on the
#: full Latin/accent/punct scope and random 2-char interactions), so the
#: spec is the zh builder with the Han tables swapped for the measured
#: stroke order (〇 keys INSIDE the stroke zone at its stroke count) and
#: the bopomofo letter zone between stroke Han and Latin — 19 extended
#: bopomofo letters are secondary-70/78 or tertiary-E0 variants of base
#: letters (alias tables, generated). zh_Hant and yue verified
#: byte-identical to zh_tw in the bundle at generation time.
_LOCALES["zh_tw"] = _zh_spec(stroke=True)
_LOCALES["zh_hant"] = _LOCALES["zh_tw"]
_LOCALES["yue"] = _LOCALES["zh_tw"]


def _ja_spec() -> _LocaleSpec:
    """Japanese ('ja' — round 16, VERDICT r15 missing #1; reference
    extension/icu/icu_extension.cpp:119). Every rule probed on DuckDB's
    bundled ICU ja tailoring (sort-key decodes + sorts; the data tables
    are GENERATED by scripts/gen_ja_collation.py, which re-verifies all
    invariants at generation):

    * KANA sort in 48 measured primary classes between Latin and Han
      (digits < Latin < kana < Han — NO kana-first reorder, probed).
      Hiragana ≡ katakana ≡ halfwidth katakana at EVERY strength
      (あ ≡ ア ≡ ｱ exact key ties); small kana are a tertiary step
      BELOW normal (03 < 05); dakuten/handakuten are SECONDARY marks
      (voiced precomposed decompose in tokenize so fullwidth が and
      halfwidth ｶ+ﾞ share L1/L2 and split only at the mark's tertiary
      06 vs E0).
    * The LENGTH MARK ー clones the preceding kana's VOWEL at
      primary+secondary with tertiary 02 (カー ≡L1L2 カア, probed per
      kana — 228-entry generated map); with no vowel context (after ん,
      ー-less chars, string start) it keeps its own symbol-zone primary
      between ゝ and digits. A voicing mark in between BLOCKS the clone
      (ｶﾞー probed unclonied); halfwidth ｰ NEVER clones and carries
      tertiary E0. Runs: 3 regex passes handle ーーー; ≥4 in a row
      after a vowel stay raw (documented residual).
    * ITERATION MARKS: ゝ after HIRAGANA (ヽ after katakana/halfwidth —
      script-matched, probed both ways) repeats the preceding kana CHAR
      at L1/L2 with a tertiary demotion (かゝ ≡L1L2 かか, tert 04 < 05)
      — one regex copies the char with a \x0e marker BEFORE the copy so
      the tertiary lands below the normal band. ICU does NOT chain them
      (かゝゝ probed: second ゝ raw) — single pass reproduces that — and
      ー/ゝ do not feed each other (かゝー, カーゝ probed raw); clone
      regexes run first to pin that order. ゞ/ヾ repeat + dakuten.
    * PUNCTUATION IS NON-SHIFTED: 45 measured primary tie-groups below
      digits (、 between , and ;, 。 after ., 「」『』【】 after the
      brackets, ゛゜ between ^ and +, $ last — each fullwidth clone an
      EXACT tie of its ASCII char, folded per level). 〇 is a digit-0
      alias; fullwidth alnum ties ASCII exactly; digits shift up one
      slot to free the ゝ/ー weights below '0'.
    * HAN: 97,724 chars (round 16: CJK Unified + Ext A + supplementary
      Extensions B..I + the NFC-stable compat singles; the bundle's
      implicit-zone chars key above the tailored reading zone and land
      at the run's tail) with distinct measured primaries above kana —
      generated translate table, zh-style.
    * Case is tertiary lower-first ('a' < 'A' probed) — the shared swap
      applies. Residuals: other scripts raw; non-NFC decomposed voiced
      kana; ーー runs ≥4 after a vowel."""
    from duckdb_parachute_spark.functions.ja_collation_data import (
        HAN_JA_ORDER,
        ITER_BEHAVIOR,
        KANA_CLASSES,
        LENGTH_CLONE,
        PUNCT_GROUPS,
        VOICED_DECOMP,
    )

    clone_tok = {v: chr(0x02 + v) for v in range(5)}
    rep_mark = "\x0e"
    # These regexes run POST-tokenize, i.e. on text where the voiced
    # precomposed kana are already base+mark — so one optional
    # [\u3099\u309A] group covers plain and voiced contexts alike, and
    # the halfwidth marks ﾞ/ﾟ (not in the group) BLOCK both rules,
    # exactly as probed (ｶﾞー and ｶﾞヽ stay raw; ｶー clones).
    post = []
    # vowel clones: class = unvoiced kana cloning vowel v (voiced ride
    # their base). SINGLE pass per vowel: ICU does not chain ー through
    # its own clone (カーー probed — the second ー keeps its symbol
    # primary), so runs need exactly one substitution.
    clone_classes = {v: "" for v in range(5)}
    for c, v in LENGTH_CLONE.items():
        if c not in VOICED_DECOMP:
            clone_classes[v] += c
    for v in range(5):
        post.append(
            (f"([{clone_classes[v]}])([\u3099\u309A]?)ー",
             "$1$2" + clone_tok[v])
        )
    # iteration marks: groups derived from the MEASURED per-(kana, mark)
    # behavior table — unvoiced kana repeat themselves (ゞ/ヾ add
    # dakuten); voiced contexts genuinely vary per kana (がゝ repeats が,
    # ゔゝ repeats う, ぱゞ repeats ば, ガヾ doubles the dakuten), so the
    # groups are built from ITER_BEHAVIOR, not assumed. ICU does not
    # chain the marks (かゝゝ: second ゝ raw — single pass reproduces
    # it), and clones run FIRST (かゝー and カーゝ both probed raw).
    copy_of = {
        "self": "$1$2", "plain": "$1",
        "self_dak": "$1$2\u3099", "plain_dak": "$1\u3099",
    }
    for m in "ゝゞヽヾ":
        groups: dict[tuple[str, str], str] = {}
        for (k, mk), b in ITER_BEHAVIOR.items():
            if mk != m:
                continue
            if k in VOICED_DECOMP:
                base, vmark = VOICED_DECOMP[k]
                groups.setdefault((vmark, b), "")
                groups[(vmark, b)] += base
            else:
                groups.setdefault(("", b), "")
                groups[("", b)] += k
        for (vmark, b), chars in sorted(groups.items()):
            # the (?<!\x0e) lookbehind keeps a repeat COPY from serving
            # as context for a FOLLOWING mark (ICU does not chain:
            # かゝゝ and あゝゞ both keep the second mark raw — the
            # cross-mark case found by the r16 sweep)
            ctx = (f"(?<!{rep_mark})([{chars}])({vmark})" if vmark
                   else f"(?<!{rep_mark})([{chars}])()")
            post.append((ctx + m, "$1$2" + rep_mark + copy_of[b]))
    # NON-contextual ゞ/ヾ (own symbol primary + dakuten) decompose only
    # AFTER the context rules — doing it in tokenize would turn every
    # leftover ヾ into a ゝ that the repeat regexes then misread (found
    # by the r16 sweep: あヾ must NOT repeat).
    post += [("ゞ", "ゝ\u3099"), ("ヾ", "ヽ\u3099")]

    # per-level tables from the measured classes
    digits = "0123456789"
    fw_digits = "".join(chr(0xFF10 + i) for i in range(10))
    fw_lower = "".join(chr(0xFF41 + i) for i in range(26))
    p_src = p_dst = s_src = s_dst = t_src = t_dst = ""
    # 47 symbol groups (45 punct ties + the ゝ and ー classes, merged at
    # their MEASURED positions — ~ < ゝ < ー < $ probed) -> \x02..\x30
    # run below the shifted digits
    for i, grp in enumerate(PUNCT_GROUPS):
        w = chr(0x02 + i)
        if grp == ["\x00ITER"]:
            for c in "ゝヽ":
                p_src += c
                p_dst += w
            continue
        if grp == ["\x00LENGTH"]:
            for c in "ーｰ":
                p_src += c
                p_dst += w
            continue
        rep = grp[0]
        for c in grp:
            p_src += c
            p_dst += w
            s_src += c
            s_dst += rep
            t_src += c
            t_dst += rep
    s_src += "ｰヽ"
    s_dst += "ーゝ"
    for c in digits + fw_digits + "〇":
        p_src += c
        p_dst += chr(0x31 + (ord(c) - 0x30) % 0x10 if c != "〇" else 0x31)
    for c in fw_digits + "〇":
        s_src += c
        s_dst += digits[(ord(c) - 0xFF10) % 0x10] if c != "〇" else "0"
        t_src += c
        t_dst += digits[(ord(c) - 0xFF10) % 0x10] if c != "〇" else "0"
    for i in range(26):
        p_src += chr(0xFF41 + i)
        p_dst += chr(0x61 + i)
        s_src += chr(0xFF41 + i) + chr(0xFF21 + i)
        s_dst += chr(0x61 + i) * 2
        t_src += chr(0xFF41 + i) + chr(0xFF21 + i)
        t_dst += chr(0x61 + i) + chr(0x41 + i)
    # kana classes: 0 = ゝヽ, 1 = ー/ｰ (handled above); 2.. get PUA slots
    for i, (normal, small, half) in enumerate(KANA_CLASSES):
        if i < 2:
            # tertiary bands for the symbol-zone classes
            for c in normal:
                t_src += c
                t_dst += "\x11"
            for c in half:
                t_src += c
                t_dst += "\x12"
            continue
        w = chr(0xE300 + i - 2)
        rep = normal[0]
        # tertiary bands: clone 02 (\x02-\x06 raw) < small \x0d <
        # repeat-marker \x0e (the 04 demotion — it must sit BETWEEN
        # small and normal: ッヽ > ッｯ but かゝ < かか, both probed) <
        # normal \x11 < halfwidth \x12 < voicing \x13/\x14
        for c, tb in [(c, "\x11") for c in normal] + [
            (c, "\x0d") for c in small
        ] + [(c, "\x12") for c in half]:
            p_src += c
            p_dst += w
            s_src += c
            s_dst += rep
            t_src += c
            t_dst += tb
    # clone tokens ride their vowel's class
    vow_rep = "アイウエオ"
    for v in range(5):
        tok = clone_tok[v]
        cls = next(
            i for i, (n, s, h) in enumerate(KANA_CLASSES) if vow_rep[v] in n
        )
        p_src += tok
        p_dst += chr(0xE300 + cls - 2)
        s_src += tok
        s_dst += KANA_CLASSES[cls][0][0]
        # tertiary: raw token \x02-\x06 is already the 02 band
    # Han block above kana
    p_src += HAN_JA_ORDER
    p_dst += _pua_run(0xF2000, len(HAN_JA_ORDER))
    # voicing marks: secondary ladder, tertiary fullwidth<halfwidth,
    # deleted at primary (past dst end, with the repeat marker)
    s_src += "゙ﾞ゚ﾟ"
    s_dst += "\ue9a1\ue9a1\ue9a2\ue9a2"
    t_src += "゙゚ﾞﾟ"
    t_dst += "\x13\x13\x14\x14"
    p_src += "゙゚ﾞﾟ" + rep_mark
    s_src += rep_mark
    # Han DELETED from the secondary text (same round-16 fix as zh —
    # probed 'カ𠀀' < 'ガ𠀀': the raw plane-2 char wrongly outranked the
    #  voicing-mark secondary; primaries tie only with identical
    # Han chars, so deletion reproduces ICU's common-05 exactly)
    s_src += HAN_JA_ORDER
    return _LocaleSpec(
        posttransform=tuple(post),
        tokenize=tuple(
            (c, p + m)
            for c, (p, m) in VOICED_DECOMP.items()
            if c not in "ゞヾ"
        ),
        primary=(),
        primary_translate=(p_src, p_dst),
        primary_strip=False,
        secondary_translate=(s_src, s_dst),
        tertiary=(t_src, t_dst),
    )


_LOCALES["ja"] = _ja_spec()


def _ko_spec() -> _LocaleSpec:
    """Korean ('ko' — round 16, the last named locale gap; reference
    extension/icu/icu_extension.cpp:119). Every rule probed on DuckDB's
    bundled ICU ko tailoring; the data tables are GENERATED by
    scripts/gen_ko_collation.py, which verifies all invariants:

    * Modern precomposed syllables are LV+T at the ELEMENT level: an
      LVT syllable's primary is its LV syllable's primary plus one byte
      determined only by the trailing jamo (verified for all 11,172).
      The spec mirrors that with 27 regex passes that append the
      trailing conjoining jamo after each syllable of its algorithmic
      (cp%28) class, then per-char slots: 399 LV classes in measured
      order, the 27 T slots in measured byte order ABOVE every LV slot
      (probed: a following syllable's compressed lead stays below every
      T byte, so '가나' < '각' while '가a' > '각' — the Latin slots sit
      above T).
    * The Hangul+Han zone reorders below Latin and above digits
      ('9' < '가' < 'a'). 7,476 tailored Han tie their primary READING's
      syllable at primary (LV or LVT — the expansion regexes carry the
      Han of each LVT reading class too) and rank AFTER it by a
      measured secondary; encoded as \\x02 for the syllable vs GLOBAL
      \\ue001+ slots in absolute measured order (a trailing jamo
      composes with a preceding syllable under FCD, so 價+U+11A8 ties
      恪 at primary ACROSS classes and their secondaries compare
      directly — the grid audit killed per-class ranks; full ties share
      a slot). 85,380 further Han
      keep own primaries between the Hangul zone and Latin; 4,868 sit
      in the implicit zone above Latin (zh-style split).
    * The whole zone carries EXPLICIT common secondaries/tertiaries
      (\\x02) rather than zh/ja-style deletion: Han and their reading
      syllables share primaries while being DIFFERENT chars, so streams
      must stay position-aligned for the rank band to compare only
      against in-class members (and \\x02 sits below every root accent
      window, preserving the trailing-mark rule for 'ḗ가' shapes).
    * The non-Hangul surface is ROOT-model and was probed byte-identical
      to 'pt' across the full Latin/accent/punct scope incl. two-char
      interactions: root accent windows (no zh tone ladder), the zh CJK
      punctuation ladder + ₩ as a new primary after $, fullwidth folds,
      digits re-slotted above punctuation; 〇 ties '0' EXACTLY (all
      three levels, probed).
    * TRAILING conjoining jamo (U+11A8-11C2) are in scope — they slot
      exactly like the expansion markers, reproducing ICU's FCD
      composition ('가'+U+11A8 ≡ '각', probed). Residuals (documented):
      standalone LEAD/VOWEL and compat/halfwidth jamo stay raw: a lead
      jamo's primary is a byte-prefix of every syllable built on it, so
      its order against a syllable depends on the following char, which
      a per-char key cannot express (measured: 'ᄀ가' < '가' < 'ᄀa').
      Composed NFC text never contains them. Old-Hangul/jamo-extended
      blocks and other scripts raw."""
    from duckdb_parachute_spark.functions.ko_collation_data import (
        KO_HAN_CLASSES,
        KO_HAN_HIGH,
        KO_HAN_LOW_EXTRA,
        KO_HAN_SEC_GROUPS,
        KO_LV_ORDER,
        KO_T_ORDER,
    )

    char_seq, acc_src, acc_dst = _latin_accent_tables()
    letters = "abcdefghijklmnŋopqrstŧuvwxyzþ"
    lat_slot = {c: chr(0x109000 + i) for i, c in enumerate(letters)}
    acc_fold_src = "".join(c for c in char_seq if c not in lat_slot)
    acc_fold_dst = "".join(lat_slot[char_seq[c][0]] for c in acc_fold_src)
    fw_lower = "".join(chr(0xFF41 + i) for i in range(26))
    fw_digits = "".join(chr(0xFF10 + i) for i in range(10))
    punct_ladder = (" _-,、;:!?.。·'\"()[]{}〈〉《》「」『』【】〔〕@*/\\&#%‧"
                    "`^+<=>|~$₩")
    digit_slots = "".join(chr(0x40 + i) for i in range(10))
    fw_punct_src = "，；：！？（）～　"
    fw_punct_dst = ",;:!?()~ "

    S_BASE, T_N = 0xAC00, 28
    n_syl = 19 * 21 * T_N
    lv_slots = _pua_run(0xF1000, len(KO_LV_ORDER))
    lv_slot = {s: lv_slots[i] for i, s in enumerate(KO_LV_ORDER)}
    t_slots = _pua_run(0xF1400, len(KO_T_ORDER))

    # T expansion in TWO stages (the 27 enumerated-class regexes were
    # ~70x slower — Java Pattern scans big enumerated classes linearly):
    # a pretranslate maps every LVT syllable and every LVT-reading Han
    # into T-GROUPED unassigned-plane code blocks, so each regex class
    # is two O(1) RANGES appending that T's trailing jamo.
    SYL_BLK, SYL_STRIDE = 0x40000, 0x200
    HAN_BLK, HAN_STRIDE = 0x50000, 0x2000
    t_index = {t: i for i, t in enumerate(KO_T_ORDER)}
    pre_src: list[str] = []
    pre_dst: list[str] = []
    p_src: list[str] = []
    p_dst: list[str] = []
    s_src: list[str] = []
    s_dst: list[str] = []
    for i in range(n_syl):
        t = i % T_N
        lv = chr(S_BASE + (i // T_N) * T_N)
        if not t:
            p_src.append(chr(S_BASE + i))
            p_dst.append(lv_slot[lv])
            continue
        ti = t_index[chr(0x11A7 + t)]
        code = chr(SYL_BLK + ti * SYL_STRIDE + i // T_N)
        pre_src.append(chr(S_BASE + i))
        pre_dst.append(code)
        p_src.append(code)
        p_dst.append(lv_slot[lv])
    for i, t in enumerate(KO_T_ORDER):
        p_src.append(t)
        p_dst.append(t_slots[i])
    han_code: dict[str, str] = {}
    han_serial = [0] * len(KO_T_ORDER)
    for key, hans in KO_HAN_CLASSES.items():
        for h in hans:
            if len(key) == 2:
                ti = t_index[key[1]]
                if han_serial[ti] >= HAN_STRIDE:
                    raise ValueError("ko Han code block overflow")
                code = chr(HAN_BLK + ti * HAN_STRIDE + han_serial[ti])
                han_serial[ti] += 1
                han_code[h] = code
                pre_src.append(h)
                pre_dst.append(code)
                p_src.append(code)
            else:
                p_src.append(h)
            p_dst.append(lv_slot[key[0]])
    post = tuple(
        (
            "([{}-{}{}-{}])".format(
                chr(SYL_BLK + ti * SYL_STRIDE),
                chr(SYL_BLK + ti * SYL_STRIDE + SYL_STRIDE - 1),
                chr(HAN_BLK + ti * HAN_STRIDE),
                chr(HAN_BLK + ti * HAN_STRIDE + HAN_STRIDE - 1),
            ),
            "$1" + t,
        )
        for ti, t in enumerate(KO_T_ORDER)
    )
    # GLOBAL secondary slots: trailing-jamo composition (價+ᆨ ties 恪 at
    # primary) makes cross-class secondary comparisons reachable, so the
    # slots encode the measured ABSOLUTE order, one slot per distinct
    # secondary (full ties share a slot); LVT-reading Han key via their
    # pretranslated codes
    for gi, grp in enumerate(KO_HAN_SEC_GROUPS):
        for h in grp:
            s_src.append(han_code.get(h, h))
            s_dst.append(chr(0xE001 + gi))
    zone_commons = (
        "".join(chr(S_BASE + i * T_N) for i in range(19 * 21))
        + "".join(pre_dst[: n_syl - 19 * 21])
        + KO_T_ORDER + KO_HAN_LOW_EXTRA + KO_HAN_HIGH
    )
    class_han = "".join(s_src)
    return _LocaleSpec(
        posttransform=post,
        pretranslate=("".join(pre_src), "".join(pre_dst)),
        primary=(("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("ĳ", "ij"),
                 ("ð", "d"), ("ŀ", "l")),
        primary_translate=(
            "".join(p_src) + KO_HAN_LOW_EXTRA + KO_HAN_HIGH + "〇"
            + letters + acc_fold_src + fw_lower + "0123456789" + fw_digits
            + fw_punct_src + punct_ladder,
            "".join(p_dst)
            + _pua_run(0xF2000, len(KO_HAN_LOW_EXTRA))
            + _pua_run(0x10A000, len(KO_HAN_HIGH))
            + digit_slots[0]
            + "".join(lat_slot[c] for c in letters)
            + acc_fold_dst
            + "".join(lat_slot[c] for c in _LOWER)
            + digit_slots + digit_slots
            + "".join(
                chr(0x02 + punct_ladder.index(c)) for c in fw_punct_dst
            )
            + "".join(chr(0x02 + i) for i in range(len(punct_ladder))),
        ),
        primary_strip=False,
        secondary=(
            ("ß", chr(0xF000) + "s"),
            ("æ", chr(0xF000) + "e"),
            ("œ", chr(0xF000) + "e"),
            ("ĳ", "ij"),
            ("ð", chr(0xF000)),
            ("ŀ", chr(0xF000)),
        ),
        secondary_translate=(
            class_han + acc_src + fw_lower + fw_digits + "〇" + fw_punct_src
            + zone_commons,
            "".join(s_dst) + acc_dst + _LOWER + "0123456789" + "0"
            + fw_punct_dst + "\x02" * len(zone_commons),
        ),
        tertiary=(fw_lower + fw_lower.upper() + "〇" + zone_commons
                  + class_han,
                  "`" * 26 + "\x7f" * 26 + "0"
                  + "\x02" * (len(zone_commons) + len(class_han))),
    )


_LOCALES["ko"] = _ko_spec()


def locale_collation_key(col: Column | str, locale: str) -> Column:
    """Three-level sort key reproducing DuckDB's ``COLLATE <locale>`` order
    (ICU, extension/icu/icu_extension.cpp) on the documented subset.

    Sorting / ranking / comparing on this key bytewise matches the ICU
    collation: the tertiary key is injective on the input except for pairs
    ICU itself compares EQUAL at every strength (ro's legacy-cedilla ş/ţ ≡
    comma-below ș/ț — those alias the full key, exactly as ICU ties them;
    a stable sort then preserves input order on both sides).
    Pure Catalyst expressions — scales as a plain projection.
    """
    c = F.col(col) if isinstance(col, str) else col
    try:
        spec = _LOCALES[locale.strip().lower()]
    except KeyError:
        raise ValueError(
            f"unsupported locale collation: {locale!r} (have {sorted(_LOCALES)})"
        ) from None
    tok = c
    pts = spec.pretransform
    if pts and isinstance(pts[0], str):
        pts = (pts,) if pts[0] else ()
    for pat, rep in pts:
        tok = F.regexp_replace(tok, pat, rep)
    if spec.pretokenize:
        tok = F.regexp_replace(tok, spec.pretokenize, "\x1f$1\x1f")
    for pat, rep in spec.tokenize:
        tok = F.replace(tok, F.lit(pat), F.lit(rep))
    if spec.pretranslate[0]:
        tok = F.translate(tok, *spec.pretranslate)
    for pat, rep in spec.posttransform:
        tok = F.regexp_replace(tok, pat, rep)
    prim = F.lower(tok)
    for pat, rep in spec.primary:
        prim = F.replace(prim, F.lit(pat), F.lit(rep))
    if spec.primary_translate[0]:
        prim = F.translate(prim, *spec.primary_translate)
    if spec.primary_strip:
        prim = strip_accents(prim)
    sec = F.lower(tok)
    for pat, rep in spec.secondary:
        sec = F.replace(sec, F.lit(pat), F.lit(rep))
    if spec.secondary_translate[0]:
        sec = F.translate(sec, *spec.secondary_translate)
    t_src, t_dst = spec.tertiary
    ter = F.translate(tok, t_src, t_dst) if t_src else tok
    if not spec.upper_first:
        ter = F.translate(ter, _SWAP_SRC, _SWAP_DST)
    # concat (not concat_ws) so a NULL input yields a NULL key.
    return F.concat(prim, F.lit(_SEP), sec, F.lit(_SEP), ter)


def collation_key(col: Column | str, spec: str) -> Column:
    """Comparison key for a collation spec — chainable like DuckDB's
    dot-combined ``NOCASE.NOACCENT``; a bare locale code (``'da'``) yields
    the ICU-style locale key."""
    c = F.col(col) if isinstance(col, str) else col
    if spec.strip().lower() in _LOCALES:
        return locale_collation_key(c, spec)
    for part in spec.split("."):
        p = part.strip().upper()
        if p == "NOCASE":
            c = F.lower(c)
        elif p == "NOACCENT":
            c = strip_accents(c)
        elif p in ("BINARY", "C", "POSIX", ""):
            pass
        else:
            raise ValueError(
                f"unsupported collation: {part!r} (NOCASE/NOACCENT/BINARY or a "
                f"locale in {sorted(_LOCALES)})"
            )
    return c


def collated_equals(a: Column | str, b: Column | str, spec: str) -> Column:
    """a = b under the collation — DuckDB's ``a COLLATE spec = b``."""
    return collation_key(a, spec) == collation_key(b, spec)
