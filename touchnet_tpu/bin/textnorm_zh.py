# Copyright (c) 2026 touchnet_tpu authors.
# Chinese text normalization for WER/CER scoring.
#
# Capability parity: reference touchnet/bin/textnorm_zh.py:1-1210 (SpeechIO
# lineage): quanjiao->banjiao, filler/punctuation removal, erhua removal
# with a lexical whitelist, and the full non-standard-word (NSW) pipeline —
# dates, money, mobile/fixed phone numbers, fractions, percentages,
# number+quantifier, long digit runs (verbatim reading), plain cardinals
# (incl. the idiomatic 两-before-unit and 十X readings), and X2X english
# restoration — plus the ark/tsv/txt CLI formats. Re-implemented from
# scratch as a rule table of (regex, rewriter) passes over a small hanzi
# number engine; `check_chars` uses unicode CJK ranges instead of the
# reference's 8k-char literal table (documented deviation).

import argparse
import csv
import re
import string
import sys

# -- hanzi number engine -----------------------------------------------------

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千"]
_BIG_UNITS = ["", "万", "亿", "万亿"]

# linguistic data (shared with the reference, which inherits it from
# SpeechIO): filler chars and the lexical-儿 whitelist
# exactly the reference's FILLER_CHARS (textnorm_zh.py:42) — removing more
# (嗯/哦/...) than the reference silently shifts WER on SpeechIO-style evals
_FILLERS = "呃啊"
_ERHUA_WHITELIST = (
    "儿女|儿子|儿孙|女儿|儿媳|妻儿|胎儿|婴儿|新生儿|婴幼儿|幼儿|少儿|小儿|"
    "儿歌|儿童|儿科|托儿所|孤儿|儿戏|儿化|台儿庄|鹿儿岛|正儿八经|吊儿郎当|"
    "生儿育女|托儿带女|养儿防老|痴儿呆女|佳儿佳妇|儿怜兽扰|儿无常父|"
    "儿不嫌母丑|儿行千里母担忧|儿大不由爷|苏乞儿"
)
_ERHUA_RE = re.compile(f"({_ERHUA_WHITELIST})")

_CURRENCY_NAMES = (
    "(人民币|美元|日元|英镑|欧元|马克|法郎|加拿大元|澳元|港币|先令|芬兰马克|"
    "爱尔兰镑|里拉|荷兰盾|埃斯库多|比塞塔|印尼盾|林吉特|新西兰元|比索|卢布|"
    "新加坡元|韩元|泰铢)"
)
_CURRENCY_UNITS = (
    "((亿|千万|百万|万|千|百)|(亿|千万|百万|万|千|百|)元|"
    "(亿|千万|百万|万|千|百|)块|角|毛|分)"
)
_QUANTIFIERS = (
    "(匹|张|座|回|场|尾|条|个|首|阙|阵|网|炮|顶|丘|棵|只|支|袭|辆|挑|担|颗|"
    "壳|窠|曲|墙|群|腔|砣|座|客|贯|扎|捆|刀|令|打|手|罗|坡|山|岭|江|溪|钟|"
    "队|单|双|对|出|口|头|脚|板|跳|枝|件|贴|针|线|管|名|位|身|堂|课|本|页|"
    "家|户|层|丝|毫|厘|分|钱|两|斤|担|铢|石|钧|锱|忽|(千|毫|微)克|毫|厘|"
    "分|寸|尺|丈|里|寻|常|铺|程|(千|分|厘|毫|微)米|撮|勺|合|升|斗|石|盘|"
    "碗|碟|叠|桶|笼|盆|盒|杯|钟|斛|锅|簋|篮|盘|桶|罐|瓶|壶|卮|盏|箩|箱|煲|"
    "啖|袋|钵|年|月|日|季|刻|时|周|天|秒|分|旬|纪|岁|世|更|夜|春|夏|秋|冬|"
    "代|伏|辈|丸|泡|粒|颗|幢|堆|条|根|支|道|面|片|张|颗|块)"
)


def _four_digit_tokens(n: int):
    """0 < n <= 9999 -> [(digit_char or unit_char, is_unit)] with internal
    zeros collapsed to one 零."""
    out = []
    digits = [int(c) for c in str(n)]
    size = len(digits)
    zero_pending = False
    for i, d in enumerate(digits):
        unit = _UNITS[size - 1 - i]
        if d == 0:
            zero_pending = bool(out)
            continue
        if zero_pending:
            out.append(_DIGITS[0])
            zero_pending = False
        out.append(_DIGITS[d] + unit)
    return out


# 两 replaces 二 directly before a >=百 unit when at the start of the number
# or right after another >=百 unit (reference num2chn alt_two semantics)
_LIANG_RE = re.compile(r"(?:(?<=^)|(?<=[百千万亿]))二(?=[百千万亿])")


def number_to_hanzi(num_str: str, liang: bool = True) -> str:
    """Arabic number (int or decimal, optional sign) -> spoken hanzi.
    ``liang``: idiomatic 两 before 百/千/万/亿 (reference alt_two=True)."""
    neg = num_str.startswith("-")
    if neg:
        num_str = num_str[1:]
    if "." in num_str:
        int_part, frac = num_str.split(".", 1)
    else:
        int_part, frac = num_str, None
    stripped = int_part.lstrip("0")
    zero_led = bool(int_part) and len(stripped) != len(int_part)
    if not stripped:
        # reference num2chn get_value: all-zero multi-digit strings read as
        # NOTHING ("00" -> ''); a single "0" (or empty) reads 零
        words = "" if len(int_part) > 1 else _DIGITS[0]
    else:
        n = int(stripped)
        groups = []
        while n > 0:
            groups.append(n % 10000)
            n //= 10000
        parts = []
        for gi in range(len(groups) - 1, -1, -1):
            g = groups[gi]
            if g == 0:
                continue
            piece = "".join(_four_digit_tokens(g))
            # 零-prefix when a higher group skips magnitude (e.g. 100005)
            if gi < len(groups) - 1 and g < 1000 and parts:
                piece = _DIGITS[0] + piece
            parts.append(piece + _BIG_UNITS[gi])
        words = "".join(parts)
        if zero_led:
            # leading zeros read as ONE 零 prefix and block the ^一十 idiom
            # (reference: "010" -> 零一十, "007" -> 零七, "01" -> 零一)
            words = _DIGITS[0] + words
        elif words.startswith("一十"):
            # idiomatic readings: ^一十X -> 十X
            words = words[1:]
        if liang:
            words = _LIANG_RE.sub("两", words)
    if frac:
        words += "点" + "".join(_DIGITS[int(c)] for c in frac)
    return ("负" if neg else "") + words


def read_digits(num_str: str) -> str:
    """Digit-by-digit reading incl. leading zeros (IDs, years, phones)."""
    return "".join(_DIGITS[int(c)] for c in num_str if c.isdigit())


# -- NSW rewriters ------------------------------------------------------------
# Each pass is (pattern, rewriter-over-match); passes run in the reference's
# order (normalize_nsw, textnorm_zh.py:939-1029), most specific first. The
# text is wrapped in ^...$ sentinels so boundary lookarounds always match.


def _rw_date(m: re.Match) -> str:
    gd = m.groupdict()
    year, month, day = gd.get("y"), gd.get("mo"), gd.get("d")
    out = ""
    if year:
        out += read_digits(year) + "年"
    if month:
        out += number_to_hanzi(month) + "月"
    if day:
        out += number_to_hanzi(day[:-1]) + day[-1]
    return out


def _rw_money(m: re.Match) -> str:
    return re.sub(r"\d+(\.\d+)?", lambda n: number_to_hanzi(n.group(0)),
                  m.group(0))


def _rw_phone(m: re.Match) -> str:
    # spaces / dashes / +86 become silence: digits read verbatim
    return read_digits(m.group(0))


def _rw_fraction(m: re.Match) -> str:
    numerator, denominator = m.group(0).split("/")
    return number_to_hanzi(denominator) + "分之" + number_to_hanzi(numerator)


def _rw_percent(m: re.Match) -> str:
    return "百分之" + number_to_hanzi(m.group(1))


def _rw_cardinal_prefix(m: re.Match) -> str:
    """number (+多/余/几 +quantifier suffix kept verbatim)"""
    return number_to_hanzi(m.group(1)) + m.group(0)[len(m.group(1)):]


def _rw_digit_run(m: re.Match) -> str:
    return read_digits(m.group(0))


def _rw_cardinal(m: re.Match) -> str:
    return number_to_hanzi(m.group(0))


_NSW_PASSES = [
    # dates: [19xx/20xx/xx]年 [x月 [x日/号]]
    (re.compile(
        r"(?<=\D)(?:(?P<y>[089]\d|(?:19|20)\d{2})年)?"
        r"(?:(?P<mo>\d{1,2})月(?:(?P<d>\d{1,2}[日号]))?)",
    ), _rw_date),
    (re.compile(r"(?<=\D)(?P<y>[089]\d|(?:19|20)\d{2})年"), _rw_date),
    # money: number [多余几] currency-unit [number currency-unit]
    (re.compile(
        r"(?<=\D)\d+(\.\d+)?[多余几]?" + _CURRENCY_UNITS
        + r"(\d" + _CURRENCY_UNITS + r"?)?"
    ), _rw_money),
    # mobile phones (optionally +86-prefixed 1[3-9]x 11-digit)
    (re.compile(
        r"(?<=\D)(\+?86 ?)?1([38]\d|5[0-35-9]|7[678]|9[89])\d{8}(?=\D)"
    ), _rw_phone),
    # fixed-line phones (optional area code + dash)
    (re.compile(r"(?<=\D)(0(10|2[1-3]|[3-9]\d{2})-?)?[1-9]\d{6,7}(?=\D)"),
     _rw_phone),
    # fractions a/b -> b分之a
    (re.compile(r"\d+/\d+"), _rw_fraction),
    # percentages
    (re.compile(r"(\d+(?:\.\d+)?)[%％]"), _rw_percent),
    # number + quantifier
    (re.compile(r"(\d+(?:\.\d+)?)[多余几]?" + _QUANTIFIERS), _rw_cardinal_prefix),
    # long digit runs read verbatim (IDs, codes)
    (re.compile(r"\d{4,32}"), _rw_digit_run),
    # remaining plain cardinals (signs are punctuation, as in the reference)
    (re.compile(r"\d+(?:\.\d+)?"), _rw_cardinal),
]

_X2X_RE = re.compile(r"([a-zA-Z]+)二([a-zA-Z]+)")  # restore P2P, B2B, ...


def normalize_nsw(text: str) -> str:
    """Non-standard words -> spoken hanzi (reference normalize_nsw)."""
    text = "^" + text + "$"
    for pattern, rewrite in _NSW_PASSES:
        text = pattern.sub(rewrite, text)
    text = _X2X_RE.sub(lambda m: f"{m.group(1)}2{m.group(2)}", text)
    return text.lstrip("^").rstrip("$")


# -- character-level transforms ----------------------------------------------

_QJ2BJ = {chr(0xFF01 + i): chr(0x21 + i) for i in range(94)}
_QJ2BJ["　"] = " "
_QJ2BJ_TRANSFORM = str.maketrans(_QJ2BJ)

_CN_PUNCS = (
    "！？｡。＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠"
    "｢｣､、〃《》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏·〈〉-"
)
_PUNCS = _CN_PUNCS + string.punctuation
_PUNCS_TRANSFORM = str.maketrans(_PUNCS, " " * len(_PUNCS))


def remove_erhua(text: str) -> str:
    """Drop non-lexical 儿, keeping whitelisted words (他女儿在那边儿 ->
    他女儿在那边)."""
    out = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch != "儿":
            out.append(ch)
            i += 1
            continue
        # keep iff some whitelist word COVERING this 儿 matches; search()
        # alone returns the first window match (e.g. 女儿 earlier in
        # 女儿和儿子), which may not be the covering one
        keep = False
        for m in _ERHUA_RE.finditer(text, max(0, i - 12), i + 12):
            if m.start() <= i < m.end():
                keep = True
                break
        if keep:
            out.append(ch)
        i += 1
    return "".join(out)


def _is_valid_char(c: str) -> bool:
    """check_chars charset: CJK ideographs + ascii letters/digits + space
    (the reference enumerates an 8k-char literal table; unicode ranges here)."""
    return (
        c == " "
        or c in string.ascii_letters
        or c in string.digits
        or "一" <= c <= "鿿"
        or "㐀" <= c <= "䶿"
    )


def remove_space(text: str) -> str:
    """Collapse whitespace, keeping a single space only between adjacent
    english/digit tokens (reference remove_space)."""
    tokens = text.split()
    en = set(string.ascii_letters + string.digits)
    out = []
    for k, t in enumerate(tokens):
        if k and tokens[k - 1][-1] in en and t[0] in en:
            out.append(" ")
        out.append(t)
    return "".join(out)


# -- the normalizer -----------------------------------------------------------


class TextNorm:
    """Configurable normalizer (reference TextNorm, textnorm_zh.py:1069-1130).
    Option defaults mirror the reference CLI (all off)."""

    def __init__(
        self,
        to_banjiao: bool = False,
        to_upper: bool = False,
        to_lower: bool = False,
        remove_fillers: bool = False,
        remove_erhua: bool = False,
        check_chars: bool = False,
        remove_space: bool = False,
        cc_mode: str = "",
    ):
        self.to_banjiao = to_banjiao
        self.to_upper = to_upper
        self.to_lower = to_lower
        self.remove_fillers = remove_fillers
        self.remove_erhua = remove_erhua
        self.check_chars = check_chars
        self.remove_space = remove_space
        self.cc = None
        if cc_mode:
            from opencc import OpenCC  # traditional<->simplified, optional

            self.cc = OpenCC(cc_mode)

    def __call__(self, text: str) -> str:
        if self.cc:
            text = self.cc.convert(text)
        if self.to_banjiao:
            text = text.translate(_QJ2BJ_TRANSFORM)
        if self.to_upper:
            text = text.upper()
        if self.to_lower:
            text = text.lower()
        if self.remove_fillers:
            text = "".join(c for c in text if c not in _FILLERS)
        if self.remove_erhua:
            text = remove_erhua(text)
        text = normalize_nsw(text)
        text = text.translate(_PUNCS_TRANSFORM)
        if self.check_chars:
            for c in text:
                if c != " " and not _is_valid_char(c):
                    print(f"WARNING: illegal char {c} in: {text}",
                          file=sys.stderr)
                    return ""
        if self.remove_space:
            text = remove_space(text)
        return text


def normalize(text: str, remove_fillers: bool = True, to_upper: bool = True,
              remove_erhua_flag: bool = True) -> str:
    """One-call normalization with the WER-scoring defaults (banjiao + NSW +
    punctuation removal + fillers + erhua + upper), whitespace-collapsed."""
    tn = TextNorm(
        to_banjiao=True,
        to_upper=to_upper,
        remove_fillers=remove_fillers,
        remove_erhua=remove_erhua_flag,
    )
    return re.sub(r"\s+", " ", tn(text)).strip()


# -- CLI -----------------------------------------------------------------------


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--to_banjiao", action="store_true")
    p.add_argument("--to_upper", action="store_true")
    p.add_argument("--to_lower", action="store_true")
    p.add_argument("--remove_fillers", action="store_true")
    p.add_argument("--remove_erhua", action="store_true")
    p.add_argument("--check_chars", action="store_true")
    p.add_argument("--remove_space", action="store_true")
    p.add_argument("--cc_mode", choices=["", "t2s", "s2t"], default="")
    p.add_argument("--log_interval", type=int, default=10000)
    p.add_argument("--has_key", action="store_true",
                   help="deprecated; same as --format ark")
    p.add_argument("--format", type=str, choices=["txt", "ark", "tsv"],
                   default="txt")
    p.add_argument("ifile", nargs="?", default="-")
    p.add_argument("ofile", nargs="?", default="-")
    args = p.parse_args(argv)
    if args.has_key:
        args.format = "ark"

    tn = TextNorm(
        to_banjiao=args.to_banjiao,
        to_upper=args.to_upper,
        to_lower=args.to_lower,
        remove_fillers=args.remove_fillers,
        remove_erhua=args.remove_erhua,
        check_chars=args.check_chars,
        remove_space=args.remove_space,
        cc_mode=args.cc_mode,
    )

    fin = sys.stdin if args.ifile == "-" else open(args.ifile, encoding="utf8")
    fout = (sys.stdout if args.ofile == "-"
            else open(args.ofile, "w", encoding="utf8"))
    ndone = 0
    if args.format == "tsv":
        reader = csv.DictReader(fin, delimiter="\t")
        assert "TEXT" in reader.fieldnames
        print("\t".join(reader.fieldnames), file=fout)
        for item in reader:
            text = item["TEXT"]
            if text:
                text = tn(text)
            if text:
                item["TEXT"] = text
                print("\t".join(item[f] for f in reader.fieldnames), file=fout)
            ndone += 1
            if ndone % args.log_interval == 0:
                print(f"text norm: {ndone} lines done.", file=sys.stderr,
                      flush=True)
    else:
        for line in fin:
            key, text = "", ""
            if args.format == "ark":  # kaldi archive: "key text"
                cols = line.strip().split(maxsplit=1)
                if len(cols) != 2:
                    continue
                key, text = cols
            else:
                text = line.strip()
            if text:
                text = tn(text)
            if text:
                print((key + "\t" + text) if args.format == "ark" else text,
                      file=fout)
            ndone += 1
            if ndone % args.log_interval == 0:
                print(f"text norm: {ndone} lines done.", file=sys.stderr,
                      flush=True)
    print(f"text norm: {ndone} lines done in total.", file=sys.stderr,
          flush=True)


if __name__ == "__main__":
    main()
