"""Date / time / price regex kernel for transaction-narrative cleaning.

Semantics replicated (re-derived, not copied) from the reference's cleaning
kernel (reference utils/regex_utils.py:4-109, golden-tested by
reference tests/export.csv — SURVEY.md §2.3 E16, §4.3): strip wordy dates
("14sep19", "4th of July 2021"), numeric dates ("2021-04-01", "01/04/2021"),
times ("12:30pm"), and prices ("12.34 gbp", "12,34%") from free-text card
narratives.

Dialect portability is the design constraint (SURVEY.md §4.3 calls this the
highest correctness risk): the reference compiles a Python-dialect pattern
(``(?P<name>)`` named groups, ``(?P=name)`` backrefs, ``re.VERBOSE``) that
Java's regex engine — and therefore Spark's native, codegen'd
``regexp_replace`` — cannot parse. Instead of translating at runtime we
BUILD the pattern from components, emitting a single compact string that is
simultaneously valid Python and Java dialect:

  * numbered backrefs only (``(\\x)...\\1``) — identical syntax in both;
  * no free-spacing mode — components are joined compactly;
  * inline flags ``(?i)`` — identical in both;
  * only portable constructs (``\\d \\D \\W \\s``, non-capturing groups,
    alternation, bounded quantifiers).

The capture-group budget is therefore load-bearing: the four delimiter
groups of the numeric-date alternatives are the ONLY capturing groups in
the final pattern, so they are always groups 1-4 in both engines. Tests
assert the Python path and the Spark/Java path agree on a fuzz corpus.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# numeric dates: 2021-04-01 / 01.04.2021 / 20210401 ...
# ---------------------------------------------------------------------------

_D2 = r"(?:[0-3]?\d)"  # day 0-31 (loose), optional leading zero
_M2 = r"(?:1[012]|0?[1-9])"  # month 1-12, optional leading zero
_Y4 = r"(?:(?:19|20)\d\d)"  # 20th/21st-century 4-digit year
_DSEP = r"([/\-._]?)"  # CAPTURING: delimiter, repeated via backref


def _numeric_date(groups_before: int) -> str:
    """Numeric date in any of 4 field orders, each requiring its internal
    delimiters to match via a backref (so ``2021-04.01`` does not match).

    ``groups_before`` = number of capturing groups already emitted to the
    left of this component in the final pattern; backref numbers are
    computed from it, keeping the component relocatable.
    """
    alts = []
    for i, (a, b, c) in enumerate(
        [(_Y4, _M2, _D2), (_Y4, _D2, _M2), (_D2, _M2, _Y4), (_M2, _D2, _Y4)]
    ):
        ref = groups_before + i + 1
        alts.append(f"(?:{a}{_DSEP}{b}\\{ref}{c})")
    body = "|".join(alts)
    # non-digit (or string edge) guards prevent eating into longer numbers
    return rf"(?:(?:^|\D)(?:{body})(?:\D|$))"


# ---------------------------------------------------------------------------
# wordy dates: 14sep19 / 4th of July 2021 / sept-21 ...
# ---------------------------------------------------------------------------

_ORDINAL = (
    r"(?:[23]?1st|2{1,2}nd|\d{1,2}th|2?3rd"
    r"|first|second|third|fourth|fifth|sixth|seventh|eighth|ninth)"
)
_DAY_W = rf"(?:{_ORDINAL}|(?:[0123]?\d))"
_MONTH_W = (
    r"(?:january|february|march|april|may|june|july|august|september"
    r"|october|november|december"
    r"|jan|feb|mar|apr|jun|jul|aug|sept|sep|oct|nov|dec)"
)
_YEAR_W = r"(?:(?:[12]?\d|')?\d\d)"  # 2-digit, 3/4-digit, or 'YY year
_YEAR_W4 = r"(?:[12]\d\d\d)"
_WSEP = r"(?:\s*(?:[\s.\-\\/,]|(?:of))\s*)"  # " of ", ". ", "-", ...


def _wordy_date() -> str:
    day_month = rf"(?:{_DAY_W}{_WSEP}{_MONTH_W})|(?:{_MONTH_W}{_WSEP}{_DAY_W})"
    ymd = rf"(?:(?:{_YEAR_W4}{_WSEP})?(?:{day_month})(?:{_WSEP}{_YEAR_W})?)"
    month_year = rf"(?:{_MONTH_W}{_WSEP}{_YEAR_W})"
    compact = rf"(?:{_DAY_W}{_MONTH_W}{_YEAR_W})|(?:{_DAY_W}{_MONTH_W}{_YEAR_W4})"
    masked = rf"(?:xx{_WSEP}xx{_WSEP}{_YEAR_W4})"
    body = rf"{ymd}|{month_year}|{compact}|{masked}"
    # non-word (or string edge) guards
    return rf"(?:(?:^|\W)(?:{body})(?:$|\W))"


# ---------------------------------------------------------------------------
# times: 12:30 / 9.45pm / 14h05:30
# ---------------------------------------------------------------------------

_TIME = (
    r"(?:[0-5]?\d(?:[:.h])[0-5]\d"  # HH:MM (also . and h separators)
    r"(?::[0-5]\d)?"  # optional :SS
    r"(?:\s*[ap]\.?m\.?)?)"  # optional am/pm
)


def build_datetime_pattern(include_numeric: bool = True) -> str:
    """The combined date+time scrub pattern, portable Python/Java dialect.

    Structure: (time? wordy-date time?) | (time? numeric-date time?) | time.
    Matches are replaced with a single space by the cleaner.

    ``include_numeric=False`` drops the numeric-date branch — the only one
    using backrefs — yielding a pattern RE2-class engines (DuckDB, Go) can
    also run. On text containing no numeric dates the two variants are
    equivalent, which is how the oracle cross-checks the full kernel.
    """
    wordy = _wordy_date()
    if include_numeric:
        numeric = _numeric_date(groups_before=0)  # groups 1-4 live here
        combined = (
            rf"(?:(?:{_TIME}?{wordy}{_TIME}?)|(?:{_TIME}?{numeric}{_TIME}?))"
            rf"|(?:{_TIME})"
        )
    else:
        combined = rf"(?:(?:{_TIME}?{wordy}{_TIME}?))|(?:{_TIME})"
    return rf"(?i)(?:{combined})"


DATETIME_PATTERN = build_datetime_pattern()

# price tokens: "12.34 gbp", "1.234,56gbp", "12,34%", "3.5%"
# (reference utils/regex_utils.py:107). No backrefs — portable as-is.
PRICE_PATTERN = r"(?:(?:\d+\.)*\d+,\d+|\d+\.\d+)[/\s]*(?:gbp|%)"
