"""CNF query representation — canonicalization, long form, containment.

``query_repr`` is the reference's nested-list IR (utils.py:1-44):
OR over *and_queries*, each an AND over *synsets*, each an OR of
``(term, tags...)`` tuples. The canonical string (T3) is the result
cache key and must match the reference renderer byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def query_repr_to_cnf_string(query_repr, uniq_repr: bool = True) -> str:
    """Canonical CNF string — parity with reference utils.py:1-20
    (``query_repr_to_sql_query``): each level sorted+deduped, phrases
    quoted, rendered ``((a | "a b") (c)) | ((...))``.
    """

    def join_fun(l, m, r, it):
        items = sorted(set(it)) if uniq_repr else list(it)
        return f"{l}{m.join(items)}{r}"

    return join_fun(
        "(", ") | (", ")",
        (
            join_fun(
                "(", ") (", ")",
                (
                    join_fun(
                        "", " | ", "",
                        (
                            f'"{syn_tag[0]}"' if " " in syn_tag[0] else syn_tag[0]
                            for syn_tag in synset
                        ),
                    )
                    for synset in and_query
                ),
            )
            for and_query in query_repr
        ),
    )


def cnf_string_to_query_repr(cnf: str):
    """Inverse parser — parity with reference utils.py:23-44."""
    assert cnf[:2] == "((" and cnf[-2:] == "))"
    return [
        [
            [
                (syn[1:-1] if (syn[0] == syn[-1] == '"') else syn,)
                for syn in synset.split(" | ")
            ]
            for synset in and_query.split(") (")
        ]
        for and_query in cnf[2:-2].split(")) | ((")
    ]


def query_reprs_to_long_df(spark, qid_to_repr: dict) -> DataFrame:
    """Normalized long table (qid, and_pos, syn_pos, term) — the
    DataFrame IR every retrieval plan consumes."""
    rows = [
        (int(qid), a_i, s_i, term_tag[0])
        for qid, repr_ in qid_to_repr.items()
        for a_i, and_query in enumerate(repr_)
        for s_i, synset in enumerate(and_query)
        for term_tag in synset
    ]
    return spark.createDataFrame(
        rows, "qid int, and_pos int, syn_pos int, term string"
    )


def cnf_match_expr(text_col, query_repr) -> "F.Column":
    """U5 — padded-substring CNF containment as a pure Column
    expression (reference nb 2.0 cell 20 ``query_match``): doc
    matches if ANY and_query has ALL synsets with ANY term contained
    as ``" term " in " text "``.
    """
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))

    def term_match(term):
        return padded.contains(f" {term} ")

    ors = []
    for and_query in query_repr:
        ands = None
        for synset in and_query:
            syn = None
            for term_tag in synset:
                m = term_match(term_tag[0])
                syn = m if syn is None else (syn | m)
            ands = syn if ands is None else (ands & syn)
        ors.append(ands)
    out = None
    for o in ors:
        out = o if out is None else (out | o)
    return out
