"""Normalization parity: pandas UDFs and JVM Column pipeline must agree
bit-for-bit with the pure-Python specification (itself a faithful
Python-3 rendering of reference normalize_text.py:17-133), on golden
vectors + seeded fixture text.
"""

from __future__ import annotations

import pandas as pd
import pytest

from efficient_query_expansion_spark.functions.normalize import (
    _step1_series,
    _step2_series,
    acronym_of_py,
    normalize_aliases_raw_py,
    normalize_hyphens_py,
    normalize_multiword_py,
    normalize_text_py,
    normalize_text_sql,
)

GOLDEN = [
    ("Hello, World!", "hello world"),
    ("  multiple   spaces  ", "multiple spaces"),
    ("AT&T", "at t"),
    ("Wi-Fi", "wi fi"),
    ("PlayStation", "playstation"),
    ("café au lait", "cafe au lait"),
    ("résumé — naïve", "resume naive"),
    ("line1\nline2\r\nline3", "line1 line2 line3"),
    ("tabs\there", "tabs here"),
    ("U.S.A.", "u s a"),
    ("", ""),
    ("!!!", ""),
    ("MiXeD CaSe 123", "mixed case 123"),
    ("a  b   c", "a b c"),
    ("ＦＵＬＬｗｉｄｔｈ", ""),  # fullwidth latin does not NFD-fold to ascii
]

GOLDEN_HYPHENS = [
    ("Wi-Fi", "wifi"),
    ("e-mail", "email"),
    ("U.S.A.", "usa"),
    ("state_of-the.art", "stateoftheart"),
]

GOLDEN_MULTIWORD = [
    ("PlayStation", "play station"),
    ("DataFrame", "data frame"),
    ("iPhone", "i phone"),
    ("lowercase", "lowercase"),
    # only a lowercase->uppercase boundary splits (normalize_text.py:55)
    ("XMLHttpRequest", "xmlhttp request"),
]


def test_golden_normalize_py():
    for raw, want in GOLDEN:
        assert normalize_text_py(raw) == want, raw


def test_golden_hyphens_py():
    for raw, want in GOLDEN_HYPHENS:
        assert normalize_hyphens_py(raw) == want, raw


def test_golden_multiword_py():
    for raw, want in GOLDEN_MULTIWORD:
        assert normalize_multiword_py(raw) == want, raw


def test_series_impl_matches_py():
    raws = [r for r, _ in GOLDEN] + [r for r, _ in GOLDEN_HYPHENS] + [
        "weird \x07 control \x01chars", "trailing space \n ", "a&b&c",
    ]
    got = _step2_series(_step1_series(pd.Series(raws))).tolist()
    want = [normalize_text_py(r) for r in raws]
    assert got == want


def test_aliases_raw():
    aliases = normalize_aliases_raw_py(["AT&T"])
    # '&' alternatives: "at t", "att", "at and t", "at n t", "atnt"
    assert {"at t", "att", "at and t", "at n t", "atnt"} <= aliases
    # acronym completion: "at t" spaced acronym present iff collapsed in set
    a2 = normalize_aliases_raw_py(["International Business Machines", "IBM"])
    assert "ibm" in a2 and "i b m" in a2
    assert acronym_of_py("international business machines") == "ibm"


def test_udf_matches_py(spark, transcripts_tiny):
    from pyspark.sql import functions as F
    from efficient_query_expansion_spark.functions.normalize import (
        normalize_text_udf,
    )

    rows = (
        transcripts_tiny.limit(200)
        .select("text", normalize_text_udf("text").alias("norm"))
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r.norm == normalize_text_py(r.text)


def test_sql_rendering_matches_on_ascii(spark):
    import duckdb

    raws = ["hello world", "key agg row   scan", "a b  c!", "MiXeD 12"]
    df = spark.createDataFrame([(r,) for r in raws], "text string")
    df.createOrReplaceTempView("t_norm")
    spark_out = [
        r[0]
        for r in spark.sql(
            f"SELECT {normalize_text_sql('text', 'spark')} FROM t_norm"
        ).collect()
    ]
    duck_out = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {normalize_text_sql('text')} FROM (SELECT unnest(?) AS text)",
            params=[raws],
        ).fetchall()
    ]
    want = [normalize_text_py(r) for r in raws]
    assert spark_out == want
    assert duck_out == want


def test_tokenize_positions(spark, transcripts_tiny):
    from efficient_query_expansion_spark.operators.tokenize import (
        pattern_matches,
        token_positions,
        with_norm_text,
        with_tokens,
    )
    from efficient_query_expansion_spark.functions.normalize import (
        normalize_text_py,
    )

    df = with_tokens(with_norm_text(transcripts_tiny.limit(50)))
    pdf = df.select("conv_id", "turn_idx", "text", "tokens").toPandas()
    for _, row in pdf.iterrows():
        want = normalize_text_py(row.text).split(" ")
        want = [w for w in want if w != ""]
        assert list(row.tokens) == want

    # unrestricted matches == token positions
    tp = token_positions(df).count()
    pm = pattern_matches(df).count()
    assert tp == pm

    # phrase matching finds planted multiword entities
    pats = spark.createDataFrame(
        [("new york",), ("machine learning",), ("alpha",)], "pattern string"
    )
    m = pattern_matches(df, patterns=pats).toPandas()
    assert set(m.pattern.unique()) <= {"new york", "machine learning", "alpha"}
    # verify each phrase match against the raw tokens
    tok = {
        (r.conv_id, r.turn_idx): list(r.tokens) for _, r in pdf.iterrows()
    }
    for _, r in m.iterrows():
        toks = tok[(r.conv_id, r.turn_idx)]
        assert " ".join(toks[r.start_pos : r.end_pos + 1]) == r.pattern


def test_fuzz_hybrid_pipeline_vs_spec(spark):
    """Random unicode/control/punctuation strings: the distributed
    hybrid plan (Arrow fold + JVM translate) must equal the pure-
    Python specification byte-for-byte."""
    import random

    rng = random.Random(1234)
    alphabet = (
        [chr(c) for c in range(0x20, 0x7F)]
        + ["é", "ü", "ß", "漢", "字", "→", "…", "\x00", "\x07", "\n",
           "\r", "\t", "\x0b", "•", "Ω", "ñ", "́", " ", "  "]
    )
    raws = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
    )

    df = spark.createDataFrame([(r,) for r in raws], "text string")
    got = [r["norm_text"] for r in with_norm_text(df).collect()]
    # row order preserved for a narrow local frame without shuffle
    want = [normalize_text_py(r) for r in raws]
    assert got == want


def test_normalize_aliases_tagged_golden():
    """Tagged variant expansion (reference nb 1.2 cell 2) — golden
    vectors hand-derived from the reference's rules: first-wins tag
    assignment in src-tag order, norm&<i>/norm-/norm|/norm()/acronym/
    norm. provenance tags."""
    from efficient_query_expansion_spark.functions.normalize import (
        normalize_aliases_tagged_py as f,
    )

    assert f({"name": ["A&B"]}) == {
        "a b": ("name", "acronym"),
        "ab": ("name", "norm&1", "acronym"),
        "a and b": ("name", "norm&2"),
        "a n b": ("name", "norm&3", "acronym"),
        "anb": ("name", "norm&4", "acronym"),
        "an b": ("name", "norm|", "norm&4"),
    }
    # parenthesis-stripped raws are postponed and tagged norm();
    # colon-containing aliases are dropped entirely
    assert f(
        {"name": ["New York (state)", "New York"],
         "redir": ["NYC", "Category:NY"]}
    ) == {"new york": ("name",), "nyc": ("redir",)}
    # hyphen join keeps provenance of the pass that produced it
    assert f({"name": ["Wi-Fi"], "alias": ["wifi", "wireless fidelity"]}) == {
        "wi fi": ("name",),
        "wifi": ("name", "norm-"),
        "wireless fidelity": ("alias",),
    }
    # acronym completion: the missing spaced form is added with the
    # present form's tags + norm.
    assert f({"name": ["PlayStation"], "alias": ["PS"]}) == {
        "playstation": ("name",),
        "play station": ("name", "norm|"),
        "ps": ("alias", "acronym"),
        "p s": ("alias", "acronym", "norm."),
    }
    # src-tag precedence: name wins over alias for the same alias
    assert f({"name": ["Car"], "alias": ["car"]}) == {"car": ("name",)}
