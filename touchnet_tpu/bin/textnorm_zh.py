# Copyright (c) 2026 touchnet_tpu authors.
# Chinese text normalization for WER/CER scoring.
#
# Capability parity: reference touchnet/bin/textnorm_zh.py (SpeechIO-style
# TN: full-width -> half-width, punctuation/filler removal, Arabic-number ->
# hanzi reading, erhua removal, English upper-casing). Re-implemented from
# scratch as a compact rule pipeline; CLI: one line in, one normalized line
# out (`--has_key` to keep "key text" format).

import argparse
import re
import sys

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千"]
_BIG_UNITS = ["", "万", "亿", "万亿"]

_FILLERS = "嗯呃啊唔噢喔哦诶欸"
_ERHUA_WHITELIST = {
    "女儿", "儿子", "儿女", "婴儿", "幼儿", "少儿", "小儿", "胎儿",
    "新生儿", "婴幼儿", "孤儿", "宠儿", "混血儿", "健儿", "育儿",
    "托儿所", "儿童", "儿孙", "儿媳", "男儿", "宁馨儿",
}


def _four_digits_to_hanzi(n: int) -> str:
    """0 <= n <= 9999 -> hanzi with internal zeros collapsed."""
    if n == 0:
        return _DIGITS[0]
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
    return "".join(out)


def number_to_hanzi(num_str: str) -> str:
    """Arabic number (int or decimal) -> spoken hanzi."""
    neg = num_str.startswith("-")
    if neg:
        num_str = num_str[1:]
    if "." in num_str:
        int_part, frac = num_str.split(".", 1)
    else:
        int_part, frac = num_str, None
    n = int(int_part) if int_part else 0
    if n == 0:
        words = _DIGITS[0]
    else:
        groups = []
        while n > 0:
            groups.append(n % 10000)
            n //= 10000
        parts = []
        for gi in range(len(groups) - 1, -1, -1):
            g = groups[gi]
            if g == 0:
                continue
            piece = _four_digits_to_hanzi(g)
            # 零-prefix when a higher group skips magnitude (e.g. 100005)
            if gi < len(groups) - 1 and g < 1000 and parts:
                piece = _DIGITS[0] + piece
            parts.append(piece + _BIG_UNITS[gi])
        words = "".join(parts)
        # idiomatic readings: 一十X -> 十X
        if words.startswith("一十"):
            words = words[1:]
    if frac:
        words += "点" + "".join(_DIGITS[int(c)] for c in frac)
    return ("负" if neg else "") + words


def digits_to_hanzi_verbatim(num_str: str) -> str:
    """Digit-by-digit reading (phone numbers, years)."""
    return "".join(_DIGITS[int(c)] for c in num_str if c.isdigit())


_FULLWIDTH = {chr(0xFF01 + i): chr(0x21 + i) for i in range(94)}
_FULLWIDTH["　"] = " "

_PUNCT_RE = re.compile(
    r"[、。，？！；：“”‘’"
    r"（）《》〈〉【】—…·"
    r"!-/:-@\[-`{-~\\,.?;:'\"()<>]"
)
_PERCENT_RE = re.compile(r"(\d+(?:\.\d+)?)%")
_YEAR_RE = re.compile(r"(\d{4})年")
_NUM_RE = re.compile(r"-?\d+(?:\.\d+)?")


def remove_erhua(text: str) -> str:
    """Drop non-lexical 儿 (keep whitelisted words like 女儿)."""
    out = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "儿":
            keep = False
            for w in _ERHUA_WHITELIST:
                j = w.index("儿")
                start = i - j
                if start >= 0 and text[start : start + len(w)] == w:
                    keep = True
                    break
            if keep:
                out.append(ch)
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def normalize(text: str, remove_fillers: bool = True, to_upper: bool = True,
              remove_erhua_flag: bool = True) -> str:
    # full-width -> half-width
    text = "".join(_FULLWIDTH.get(c, c) for c in text)
    # percentages / years before generic numbers
    text = _PERCENT_RE.sub(lambda m: "百分之" + number_to_hanzi(m.group(1)), text)
    text = _YEAR_RE.sub(lambda m: digits_to_hanzi_verbatim(m.group(1)) + "年", text)
    text = _NUM_RE.sub(lambda m: number_to_hanzi(m.group(0)), text)
    text = _PUNCT_RE.sub(" ", text)
    if remove_fillers:
        text = "".join(c for c in text if c not in _FILLERS)
    if remove_erhua_flag:
        text = remove_erhua(text)
    if to_upper:
        text = text.upper()
    return re.sub(r"\s+", " ", text).strip()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--has_key", action="store_true",
                        help="lines are '<key> <text>'")
    parser.add_argument("--to_upper", type=bool, default=True)
    parser.add_argument("--remove_fillers", type=bool, default=True)
    parser.add_argument("--remove_erhua", type=bool, default=True)
    parser.add_argument("infile", nargs="?", default="-")
    parser.add_argument("outfile", nargs="?", default="-")
    args = parser.parse_args(argv)

    fin = sys.stdin if args.infile == "-" else open(args.infile, encoding="utf8")
    fout = (sys.stdout if args.outfile == "-"
            else open(args.outfile, "w", encoding="utf8"))
    for line in fin:
        line = line.rstrip("\n")
        if args.has_key:
            parts = line.split(maxsplit=1)
            key = parts[0]
            body = parts[1] if len(parts) > 1 else ""
            fout.write(
                key + "\t" + normalize(
                    body, args.remove_fillers, args.to_upper, args.remove_erhua
                ) + "\n"
            )
        else:
            fout.write(
                normalize(line, args.remove_fillers, args.to_upper,
                          args.remove_erhua) + "\n"
            )


if __name__ == "__main__":
    main()
