"""Number expansion for the English text cleaner.

The reference lineage (keithito/tacotron ancestor of the reference's
Pattern_Generator; SURVEY.md §2.1 "Text frontend") expands numerals to words
before tokenization so that the character inventory stays small. This is a
dependency-free reimplementation (the upstream used the ``inflect`` package,
which is not available here).
"""

from __future__ import annotations

import re

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    (10 ** 12, "trillion"),
    (10 ** 9, "billion"),
    (10 ** 6, "million"),
    (10 ** 3, "thousand"),
    (10 ** 2, "hundred"),
]


def _int_to_words(n: int) -> str:
    if n < 0:
        return "minus " + _int_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, rem = divmod(n, 10)
        return _TENS[tens] + (" " + _ONES[rem] if rem else "")
    for scale, name in _SCALES:
        if n >= scale:
            head, rem = divmod(n, scale)
            out = _int_to_words(head) + " " + name
            if rem:
                out += " " + _int_to_words(rem)
            return out
    return _ONES[0]


_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _ordinal_words(n: int) -> str:
    words = _int_to_words(n).split(" ")
    last = words[-1]
    if last in _ORDINAL_IRREGULAR:
        words[-1] = _ORDINAL_IRREGULAR[last]
    elif last.endswith("y"):
        words[-1] = last[:-1] + "ieth"
    else:
        words[-1] = last + "th"
    return " ".join(words)


_COMMA_NUMBER_RE = re.compile(r"([0-9][0-9,]+[0-9])")
_DECIMAL_RE = re.compile(r"([0-9]+\.[0-9]+)")
_POUNDS_RE = re.compile(r"£([0-9,]*[0-9]+)")
_DOLLARS_RE = re.compile(r"\$([0-9.,]*[0-9]+)")
_ORDINAL_RE = re.compile(r"([0-9]+)(st|nd|rd|th)")
_NUMBER_RE = re.compile(r"[0-9]+")


def _expand_decimal(m: re.Match) -> str:
    intpart, frac = m.group(1).split(".")
    words = _int_to_words(int(intpart)) + " point"
    for digit in frac:
        words += " " + _ONES[int(digit)]
    return words


def _expand_dollars(m: re.Match) -> str:
    amount = m.group(1).replace(",", "")
    parts = amount.split(".")
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1][:2].ljust(2, "0")) if len(parts) > 1 and parts[1] else 0
    out = []
    if dollars:
        out.append(_int_to_words(dollars) + (" dollar" if dollars == 1 else " dollars"))
    if cents:
        out.append(_int_to_words(cents) + (" cent" if cents == 1 else " cents"))
    if not out:
        return "zero dollars"
    return ", ".join(out)


def _expand_number(m: re.Match) -> str:
    n = int(m.group(0))
    if 1000 < n < 3000:
        # Year-style reading: "1984" -> "nineteen eighty four".
        if n == 2000:
            return "two thousand"
        if 2000 < n < 2010:
            return "two thousand " + _int_to_words(n % 100)
        if n % 100 == 0:
            return _int_to_words(n // 100) + " hundred"
        return _int_to_words(n // 100) + " " + _int_to_words(n % 100)
    return _int_to_words(n)


def normalize_numbers(text: str) -> str:
    text = _COMMA_NUMBER_RE.sub(lambda m: m.group(1).replace(",", ""), text)
    text = _POUNDS_RE.sub(r"\1 pounds", text)
    text = _DOLLARS_RE.sub(_expand_dollars, text)
    text = _DECIMAL_RE.sub(_expand_decimal, text)
    text = _ORDINAL_RE.sub(lambda m: _ordinal_words(int(m.group(1))), text)
    text = _NUMBER_RE.sub(_expand_number, text)
    return text
