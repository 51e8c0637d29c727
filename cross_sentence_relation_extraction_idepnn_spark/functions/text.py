"""Native Column text-normalization chain (SURVEY.md §2.8 T4–T13).

Reference semantics (``features_bb2016.py``), reproduced in the exact
apply order of ``features_bb2016.py:1373-1386`` — currency → time
(which also lowercases the whole line, :96-113) → numbers → url/hyphen
— because the T7 lowercasing changes what later stages see (T13).

Every stage is a JVM-side ``regexp_replace`` (whole-stage codegen); the
DuckDB oracle uses the same patterns in RE2 syntax. No UDFs.

- T4  tag spacing: ``<e1>``→`` <e1> `` etc., then space-squeeze
  (``features_bb2016.py:1615-1618``)
- T5  number masking: whole-number tokens → ``0`` (``:61-75``)
- T6  url masking ``//…``→``url``; hyphen-compound split (``:78-93``)
- T7  time-unit masking → ``time`` + lowercase (``:96-113``)
- T8  currency ``$``→``currency`` (``:115-127``)
- T9  entity extraction from tags (``:9-59``) — ``regexp_extract``
- T10 last word of multiword entity (``:1409-1413``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference time-unit list (features_bb2016.py:98-101, abridged to the
# classes that appear in synthetic corpora; extension is data, not code).
TIME_UNITS = [
    "second",
    "seconds",
    "minute",
    "minutes",
    "hour",
    "hours",
    "day",
    "days",
    "week",
    "weeks",
    "month",
    "months",
    "year",
    "years",
    "today",
    "yesterday",
    "tomorrow",
]

_TIME_RE = r"\b(" + "|".join(TIME_UNITS) + r")\b"


def space_tags(col: Column) -> Column:
    """T4: ensure entity tags are standalone tokens."""
    c = F.regexp_replace(col, r"(</?e[12]>)", r" $1 ")
    c = F.regexp_replace(c, r"  +", " ")
    return F.trim(c)


def mask_currency(col: Column) -> Column:
    """T8: ``$`` → `` currency `` (token-level in the reference)."""
    c = F.regexp_replace(col, r"\$", " currency ")
    return F.trim(F.regexp_replace(c, r"  +", " "))


def mask_time(col: Column) -> Column:
    """T7: lowercase the line (reference side effect!) then mask units."""
    return F.regexp_replace(F.lower(col), _TIME_RE, "time")


def mask_numbers(col: Column) -> Column:
    """T5: whole-number tokens → 0."""
    return F.regexp_replace(col, r"\b[0-9]+\b", "0")


def mask_urls(col: Column) -> Column:
    """T6: ``//…`` → url; split simple hyphen compounds."""
    c = F.regexp_replace(col, r"//\S*", "url")
    c = F.regexp_replace(c, r"\b([a-z]+)-([a-z]+)\b", r"$1 $2")
    return c


def normalize_chain(col: Column) -> Column:
    """T13: the full chain in reference order
    (currency → time → numbers → url), tags spaced first."""
    return mask_urls(mask_numbers(mask_time(mask_currency(space_tags(col)))))


def extract_entity(col: Column, which: int) -> Column:
    """T9: text between ``<eN>``…``</eN>``, lowercased."""
    return F.lower(F.regexp_extract(col, rf"<e{which}>(.*?)</e{which}>", 1))


def last_word(col: Column) -> Column:
    """T10: last word of a (possibly multiword) entity."""
    return F.element_at(F.split(col, " "), -1)


# ------------------------- T12: stopword / punctuation path (config-gated)
#
# Dead in the reference's DEFAULT config (the
# remove_punctuation_from_sentences call at features_bb2016.py:1631 is
# commented out; remove_stop_words is a helper), except the
# all-stopword record skip (:427,622,714). Gated here so the behaviors
# exist behind flags without changing default parity.

# exact reference sets (features_bb2016.py:1639-1640)
STOPLIST = frozenset(
    """a an and . - = * + : ; ! " # % & ( ) * + - . / : ; < = > ? @ [ \\ ]
    ^ _ ` { | } ~""".split()
)
PUNCTUATIONS = '!()-[]{};:"\\<>./?@#%^&*_~'


def remove_stopwords(col: Column) -> Column:
    """T12: drop stoplist tokens, single-space join, lstrip — the
    reference's ``remove_stop_words`` (features_bb2016.py:1656-1663)."""
    stop = F.array(*[F.lit(s) for s in sorted(STOPLIST)])
    return F.ltrim(
        F.array_join(
            F.filter(F.split(col, " "), lambda t: ~F.array_contains(stop, t)), " "
        )
    )


def remove_punctuation(col: Column) -> Column:
    """T12: char-level punctuation strip + lowercase — the reference's
    ``remove_punctuation_from_sentences`` (features_bb2016.py:1669-1678;
    call site commented out in the default config). ``translate`` keeps
    the exact char-set semantics with no regex escaping."""
    return F.translate(F.lower(col), PUNCTUATIONS, "")


def all_stopwords(col: Column) -> Column:
    """T12: True when every lowercased whitespace token is in the
    stoplist — the reference SKIPS such records
    (features_bb2016.py:427). Use as a gated filter:
    ``df.filter(~all_stopwords(col))``."""
    stop = F.array(*[F.lit(s) for s in sorted(STOPLIST)])
    kept = F.filter(
        F.split(F.lower(col), " "), lambda t: ~F.array_contains(stop, t)
    )
    return F.size(kept) == 0


def duck_normalize_chain(expr: str) -> str:
    """DuckDB (RE2) equivalent of :func:`normalize_chain`."""
    # DuckDB single-quoted strings keep backslashes literal — no escaping.
    time_re = _TIME_RE
    c = rf"trim(regexp_replace(regexp_replace({expr}, '(</?e[12]>)', ' \1 ', 'g'), '  +', ' ', 'g'))"
    c = rf"trim(regexp_replace(regexp_replace({c}, '\$', ' currency ', 'g'), '  +', ' ', 'g'))"
    c = rf"regexp_replace(lower({c}), '{time_re}', 'time', 'g')"
    c = rf"regexp_replace({c}, '\b[0-9]+\b', '0', 'g')"
    c = rf"regexp_replace({c}, '//\S*', 'url', 'g')"
    c = rf"regexp_replace({c}, '\b([a-z]+)-([a-z]+)\b', '\1 \2', 'g')"
    return c
