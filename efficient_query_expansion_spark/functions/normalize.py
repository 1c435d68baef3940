"""Text normalization — the canonical tokenizer-normalizer.

Reproduces, bit-for-bit, the observable behavior of the reference's
``normalize_text.py:17-133`` (NFD unicode fold -> ASCII -> control-char
strip -> space/newline collapse -> non-alphanumeric strip -> lower),
re-expressed as vectorized pandas (Arrow) UDFs for Spark. Every
downstream operator (tokenize, stats, postings, BM25, expansion)
consumes only this normal form, so the per-turn text-equality
invariant holds engine-wide.

Two layers:

* ``*_py`` pure-Python functions — the executable specification, used
  by unit-test oracles and driver-side query parsing.
* ``*_udf`` pandas UDFs — the distributed path (pandas ``.str``
  vectorized ops over Arrow batches; no per-row Python loop).
* ``normalize_text_sql`` — an ANSI-SQL rendering of the same pipeline
  for ASCII-clean input, used to express DuckDB oracles.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import Column
from pyspark.sql.types import StringType

# Regexes taken verbatim from the reference (normalize_text.py:5-14);
# they operate on ASCII-only text (after the fold) in both impls.
_REX_CONTROL = r"[\x00-\x09\x0E-\x19][\x00-\x09\x0E-\x20]*"
_REX_SPACES = r"[ ]{2,}"
_REX_NEWLINES = r"[ ]?[\n\x0A-\x0D][\n\x0A-\x0D ]*"
_REX_NON_ALNUM = r"[ ]?[^ 0-9a-zA-Z][^0-9a-zA-Z]*"
_REX_HYPHENS = "[\\-\\_\\.•]"

_rex_control = re.compile(_REX_CONTROL)
_rex_spaces = re.compile(_REX_SPACES)
_rex_newlines = re.compile(_REX_NEWLINES)
_rex_non_alnum = re.compile(_REX_NON_ALNUM)
_rex_hyphens = re.compile(_REX_HYPHENS)
_rex_camel = re.compile(r"(?<=[a-z])(?=[A-Z])")


# ---------------------------------------------------------------------------
# pure-Python specification (reference parity: normalize_text.py:17-59)
# ---------------------------------------------------------------------------

def normalize_text_step_1_py(text: str) -> str:
    text = unicodedata.normalize("NFD", text)
    text = text.encode("ascii", "ignore").decode("ascii")
    text = _rex_control.sub(" ", text)
    text = _rex_spaces.sub(" ", text)
    text = _rex_newlines.sub("\n", text)
    return text.strip()


def normalize_text_step_2_py(text: str) -> str:
    text = _rex_non_alnum.sub(" ", text)
    return text.lower().strip()


def normalize_text_py(text: str) -> str:
    return normalize_text_step_2_py(normalize_text_step_1_py(text))


def normalize_hyphens_py(text: str) -> str:
    """Join hyphenated/dotted words before normalizing ("wi-fi" -> "wifi")."""
    return normalize_text_py(_rex_hyphens.sub("", normalize_text_step_1_py(text)))


def normalize_multiword_py(text: str) -> str:
    """Split CamelCase ("PlayStation" -> "play station") then normalize.

    The reference inserts a space before an uppercase letter preceded by
    a lowercase letter (normalize_text.py:51-59); after the ASCII fold
    of step 1 that is exactly the ``(?<=[a-z])(?=[A-Z])`` boundary.
    """
    text = normalize_text_step_1_py(text)
    return normalize_text_step_2_py(_rex_camel.sub(" ", text))


def normalize_aliases_raw_py(
    aliases_raw: Iterable[str],
    ampersand: bool = True,
    hyphens: bool = True,
    multiword: bool = True,
    acronyms: bool = True,
) -> set[str]:
    """Alias-variant expansion (reference normalize_text.py:62-133).

    '&' alternatives, hyphen-joined and CamelCase-split variants, and
    acronym completion (add the spaced acronym iff the collapsed one is
    already an alias, and vice versa).
    """
    aliases: set[str] = set()
    for alias_raw in aliases_raw:
        raw_support = {alias_raw}
        if ampersand and "&" in alias_raw:
            parts = alias_raw.strip().split("&")
            raw_support.update(
                [
                    " ".join(parts),
                    "".join(parts),
                    " and ".join(parts),
                    " n ".join(parts),
                    "n".join(parts),
                ]
            )
        support = set()
        for raw in raw_support:
            support.add(normalize_text_py(raw))
            if hyphens:
                support.add(normalize_hyphens_py(raw))
            if multiword:
                support.add(normalize_multiword_py(raw))
        aliases.update(support)

    if acronyms:
        extra = set()
        for alias in aliases:
            if " " not in alias:
                continue
            initials = [
                letter
                for i, letter in enumerate(alias)
                if i == 0 or (alias[i - 1] == " " and letter != " ")
            ]
            collapsed, spaced = "".join(initials), " ".join(initials)
            if collapsed in aliases:
                if spaced not in aliases:
                    extra.add(spaced)
            elif spaced in aliases:
                extra.add(collapsed)
        aliases.update(extra)

    aliases.discard("")
    assert all("  " not in alias for alias in aliases)
    return aliases


_SRC_TAGS_ORDER = ("name", "alias", "redir")
_AND_REPLACEMENTS = (" ", "", " and ", " n ", "n")
_rex_parenthesis = re.compile(r"\s*\(.*?\)\s*$")


def normalize_aliases_tagged_py(
    src_tag_to_aliases_raw: dict,
    ampersand: bool = True,
    hyphens: bool = True,
    multiword: bool = True,
    acronyms: bool = True,
) -> dict:
    """Tagged alias-variant expansion — faithful port of reference
    nb 1.2 cell 2 ``normalize_aliases_raw``: alias → tuple of
    provenance tags, FIRST assignment wins (src_tag order
    name→alias→redir, then insertion order).

    Replicated reference details: aliases containing ':' are dropped;
    paren-stripped raws are postponed and tagged "norm()"; ampersand
    variants are tagged "norm&<i>"; the multiword pass is gated on
    the ``hyphens`` flag (reference cell 2 reuses the guard); acronym
    completion appends "acronym"/"norm." tags. The reference mutates
    its ordered dict while iterating (a py2 hazard); we iterate
    snapshots, so variants-of-variants are not expanded — identical
    output because the reference would raise there anyway.
    """
    assert all(k in _SRC_TAGS_ORDER for k in src_tag_to_aliases_raw)
    aliases: dict[str, tuple] = {}
    for src_tag in _SRC_TAGS_ORDER:
        if src_tag_to_aliases_raw.get(src_tag) is None:
            continue
        raws = [
            a for a in src_tag_to_aliases_raw[src_tag] if ":" not in a
        ]
        support: dict[str, tuple] = {}
        postponed = []
        for alias_raw in raws:
            stripped = _rex_parenthesis.sub("", alias_raw)
            if len(stripped) != len(alias_raw):
                postponed.append(stripped)  # ambiguous alias
            elif alias_raw not in support:
                support[alias_raw] = ()
        for alias_raw in postponed:
            if alias_raw not in support:
                support[alias_raw] = ("norm()",)

        if ampersand:
            for alias_raw, tags in list(support.items()):
                if "&" in alias_raw:
                    parts = alias_raw.strip().split("&")
                    for i, rep in enumerate(_AND_REPLACEMENTS):
                        new_raw = rep.join(parts)
                        if new_raw not in support:
                            support[new_raw] = (f"norm&{i}",) + tags

        for alias_raw, tags in support.items():
            alias = normalize_text_py(alias_raw)
            if alias not in aliases:
                aliases[alias] = (src_tag,) + tags
        if hyphens:
            for alias_raw, tags in support.items():
                alias = normalize_hyphens_py(alias_raw)
                if alias not in aliases:
                    aliases[alias] = (src_tag, "norm-") + tags
        if hyphens:  # reference gates the multiword pass on hyphens
            for alias_raw, tags in support.items():
                alias = normalize_multiword_py(alias_raw)
                if alias not in aliases:
                    aliases[alias] = (src_tag, "norm|") + tags

    if acronyms:
        extra: dict[str, tuple] = {}
        for alias in list(aliases):
            if " " not in alias:
                continue
            initials = [
                letter
                for i, letter in enumerate(alias)
                if i == 0 or (alias[i - 1] == " " and letter != " ")
            ]
            if len(initials) <= 1:
                continue
            acr = ("".join(initials), " ".join(initials))
            for a in acr:
                if a in aliases and (
                    len(aliases[a]) == 0 or aliases[a][-1] != "acronym"
                ):
                    aliases[a] = aliases[a] + ("acronym",)
            if acr[0] in aliases:
                if acr[1] not in aliases:
                    extra[acr[1]] = aliases[acr[0]] + ("norm.",)
            elif acr[1] in aliases:
                extra[acr[0]] = aliases[acr[1]] + ("norm.",)
        aliases.update(extra)

    aliases.pop("", None)
    assert all("  " not in a for a in aliases)
    return aliases


def acronym_of_py(alias: str) -> str:
    """Collapsed acronym of a normalized multiword alias ("wi fi" -> "wf")."""
    return "".join(w[0] for w in alias.split(" ") if w)


# ---------------------------------------------------------------------------
# vectorized pandas (Arrow) UDFs — the distributed path
# ---------------------------------------------------------------------------

def _step1_series(s: pd.Series) -> pd.Series:
    s = s.fillna("")
    s = s.str.normalize("NFD")
    s = s.str.encode("ascii", "ignore").str.decode("ascii")
    s = s.str.replace(_REX_CONTROL, " ", regex=True)
    s = s.str.replace(_REX_SPACES, " ", regex=True)
    s = s.str.replace(_REX_NEWLINES, "\n", regex=True)
    return s.str.strip()


def _step2_series(s: pd.Series) -> pd.Series:
    s = s.str.replace(_REX_NON_ALNUM, " ", regex=True)
    return s.str.lower().str.strip()


@F.pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return _step2_series(_step1_series(s))


@F.pandas_udf(StringType())
def ascii_fold_udf(s: pd.Series) -> pd.Series:
    """NFD-fold to ASCII only — the single step Java regex cannot do.

    Rows that are already pure ASCII pass through untouched (cheap C
    check), so on clean corpora this UDF is almost free; the rest of
    ``normalize_text`` then runs JVM-side (see tokenize.with_norm_text
    hybrid mode), keeping the hot path in whole-stage codegen.
    """
    s = s.fillna("")
    mask = ~s.map(str.isascii)
    if mask.any():
        folded = (
            s[mask]
            .str.normalize("NFD")
            .str.encode("ascii", "ignore")
            .str.decode("ascii")
        )
        s = s.copy()
        s[mask] = folded
    return s


@F.pandas_udf(StringType())
def normalize_hyphens_udf(s: pd.Series) -> pd.Series:
    return _step2_series(_step1_series(s).str.replace(_REX_HYPHENS, "", regex=True))


@F.pandas_udf(StringType())
def normalize_multiword_udf(s: pd.Series) -> pd.Series:
    return _step2_series(
        _step1_series(s).str.replace(r"(?<=[a-z])(?=[A-Z])", " ", regex=True)
    )


# ---------------------------------------------------------------------------
# SQL rendering (for DuckDB oracles over ASCII-clean corpora)
# ---------------------------------------------------------------------------

def normalize_text_sql(col: str, dialect: str = "duckdb") -> str:
    """SQL equivalent of ``normalize_text`` for input already free of
    non-ASCII codepoints (true of the synthetic ``documents`` table).

    Spark's ``regexp_replace`` replaces all matches by default; DuckDB
    needs the ``'g'`` option — hence the dialect switch. Semantics are
    identical.
    """
    g = ", 'g'" if dialect == "duckdb" else ""

    def rr(expr: str, pat: str, rep: str) -> str:
        if dialect != "duckdb":
            # Spark SQL string literals process backslash escapes;
            # DuckDB standard strings do not.
            pat = pat.replace("\\", "\\\\")
        return f"regexp_replace({expr}, '{pat}', {rep}{g})"

    step1 = "trim({})".format(
        rr(rr(rr(col, _REX_CONTROL, "' '"), _REX_SPACES, "' '"),
           _REX_NEWLINES, "chr(10)")
    )
    return f"trim(lower({rr(step1, _REX_NON_ALNUM, chr(39) + ' ' + chr(39))}))"


# every ASCII char outside [0-9a-zA-Z ] — the full set normalize_text
# eventually turns into a separator (controls via step 1, punctuation
# via step 2)
_NON_ALNUM_ASCII = "".join(
    chr(c)
    for c in range(128)
    if not (
        c == 0x20
        or 0x30 <= c <= 0x39
        or 0x41 <= c <= 0x5A
        or 0x61 <= c <= 0x7A
    )
)


def normalize_text_col(col: Column) -> Column:
    """Pure-JVM Column version for ASCII input (post-fold).

    Equivalent to ``normalize_text`` (step1 ∘ step2) but regex-free on
    the hot path: the composition maps every maximal run of
    non-alphanumeric characters to a single separator, which is
    ``translate`` (single-pass table lookup — java.util.regex runs at
    ~10 MB/s/core on the reference's negated-class pattern, 100x
    slower) + one space-collapse + trim + lower. Bit-equivalence with
    the Python specification is covered by the golden/parity tests.
    """
    spaced = F.translate(col, _NON_ALNUM_ASCII, " " * len(_NON_ALNUM_ASCII))
    return F.lower(F.trim(F.regexp_replace(spaced, " {2,}", " ")))
