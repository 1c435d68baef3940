"""Deterministic synthetic fixtures (seed=42) — FIXTURES.md.

The primary input is the ``transcripts`` table with the authoritative
shape from BASELINE.json ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Everything is generated from ``numpy.random.RandomState(42)`` with a
closed vocabulary so that brute-force oracles are exhaustive. No
external data. The raw text deliberately contains unicode accents,
``&``, hyphens, CamelCase, punctuation and control characters to
exercise the normalizer (reference ``normalize_text.py:17-59``).

``transcripts_from_documents`` maps the driver-provided ``documents``
parquet table into the same transcripts shape with a deterministic
arithmetic rule expressible identically in Spark SQL and DuckDB — it is
the input for ``__spark_entry__`` and ``bench.py``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42

# --- closed vocabulary -----------------------------------------------------

# 10 "pattern letters" mirroring the reference's synthetic corpus
# (lib/cython/collection_stats/tests/main.cpp:375-388 uses "a b c ... j").
PATTERN_LETTERS = [
    "alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa",
]

# Content vocabulary arranged in synonym groups (drives thesaurus fixtures).
SYNONYM_GROUPS = [
    ("car", "auto", "automobile"),
    ("movie", "film", "picture"),
    ("purchase", "buy", "acquire"),
    ("house", "home", "dwelling"),
    ("fast", "quick", "rapid"),
    ("big", "large", "huge"),
    ("doctor", "physician"),
    ("lawyer", "attorney"),
    ("song", "tune", "melody"),
    ("ship", "vessel", "boat"),
    ("street", "road", "avenue"),
    ("child", "kid"),
    ("start", "begin", "commence"),
    ("end", "finish", "conclude"),
]
CONTENT_WORDS = [w for g in SYNONYM_GROUPS for w in g]

STOPWORDS = [
    "the", "a", "an", "of", "in", "on", "to", "and", "or", "is", "are",
    "was", "were", "be", "with", "for", "at", "by", "from", "it",
]

# Multiword entity phrases (<=6 words — segment filter, nb 1.3 cell 8)
# with alias sets including acronyms / collapsed forms.
ENTITIES = {
    "new york": ["new york", "ny", "big apple", "new york city"],
    "machine learning": ["machine learning", "ml", "statistical learning"],
    "wi fi": ["wi fi", "wifi", "wireless network"],
    "los angeles": ["los angeles", "la", "city of angels"],
    "query expansion": ["query expansion", "qe", "term expansion"],
    "world health organization": ["world health organization", "who"],
    "information retrieval": ["information retrieval", "ir"],
    "deep learning": ["deep learning", "dl"],
    "san francisco": ["san francisco", "sf", "golden gate city"],
    "operating system": ["operating system", "os"],
}

NOISE_WORDS = [
    "quartz", "nebula", "marble", "crimson", "willow", "ember", "falcon",
    "harbor", "lantern", "meadow", "onyx", "prairie", "saffron", "tundra",
]

# Raw-text variants planted to exercise normalization paths.
RAW_VARIANTS = [
    "AT&T", "Wi-Fi", "PlayStation", "café", "résumé",
    "U.S.A.", "e-mail", "DataFrame", "naivé", "rock&roll",
]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "search", "bash", "browser"]

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_EPOCH = datetime(2026, 1, 1, 0, 0, 0)


def _make_sentence(rng: np.random.RandomState) -> list[str]:
    """One seeded sentence as a list of raw tokens."""
    kind = rng.rand()
    words: list[str] = []
    if kind < 0.25:
        # pattern-letter run at known gaps (exercises window co-occurrence)
        start = rng.randint(0, 5)
        length = rng.randint(3, 11)
        step = rng.choice([1, 1, 1, 2])
        for i in range(length):
            words.append(PATTERN_LETTERS[(start + i * step) % 10])
            if rng.rand() < 0.2:
                words.append(rng.choice(STOPWORDS))
    elif kind < 0.45:
        # entity-bearing sentence
        entity = list(ENTITIES)[rng.randint(len(ENTITIES))]
        alias = ENTITIES[entity][rng.randint(len(ENTITIES[entity]))]
        pre = [CONTENT_WORDS[rng.randint(len(CONTENT_WORDS))]
               for _ in range(rng.randint(1, 4))]
        post = [STOPWORDS[rng.randint(len(STOPWORDS))]
                for _ in range(rng.randint(1, 3))]
        words = pre + alias.split() + post
    else:
        # mixed content / stopword / noise sentence
        n = rng.randint(4, 14)
        for _ in range(n):
            r = rng.rand()
            if r < 0.45:
                words.append(CONTENT_WORDS[rng.randint(len(CONTENT_WORDS))])
            elif r < 0.75:
                words.append(STOPWORDS[rng.randint(len(STOPWORDS))])
            elif r < 0.9:
                words.append(NOISE_WORDS[rng.randint(len(NOISE_WORDS))])
            else:
                words.append(RAW_VARIANTS[rng.randint(len(RAW_VARIANTS))])
    return words


def gen_transcripts_pdf(n_convs: int = 50, seed: int = SEED) -> pd.DataFrame:
    """Deterministic transcripts table (pandas). tiny=50 convs."""
    rng = np.random.RandomState(seed)
    rows = []
    ordinal = 0
    for i in range(n_convs):
        conv_id = f"conv{i:06d}"
        n_turns = rng.randint(2, 17)
        for t in range(n_turns):
            n_sents = rng.randint(1, 4)
            sents = [" ".join(_make_sentence(rng)) for _ in range(n_sents)]
            text = ". ".join(sents) + "."
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": ROLES[t % 3],
                    "text": text,
                    "tool": TOOLS[rng.randint(4)] if t % 3 == 2 else "",
                    "ts": _EPOCH + timedelta(seconds=13 * ordinal),
                }
            )
            ordinal += 1
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def gen_queries_pdf(n_queries: int = 60, seed: int = SEED + 1) -> pd.DataFrame:
    """Reference-style query set: 1-5 raw terms, incl. edge cases."""
    rng = np.random.RandomState(seed)
    fixed = [
        "the of and",                      # stopword-only (fallback path)
        "new york movie",                  # phrase segment + content
        "AT&T purchase",                   # ampersand
        "Wi-Fi fast",                      # hyphen
        "café song",                  # accent
        "PlayStation big",                 # CamelCase
        "machine learning doctor",         # phrase + content
        "alpha beta gamma",                # pattern letters
        "who vessel",                      # acronym collision with stopword-ish
        "query expansion fast car",        # phrase + multi content
    ]
    queries = list(fixed)
    pool = CONTENT_WORDS + PATTERN_LETTERS + list(ENTITIES) + NOISE_WORDS
    while len(queries) < n_queries:
        n = rng.randint(1, 6)
        terms = [pool[rng.randint(len(pool))] for _ in range(n)]
        if rng.rand() < 0.3:
            terms.insert(rng.randint(len(terms) + 1),
                         STOPWORDS[rng.randint(len(STOPWORDS))])
        queries.append(" ".join(terms))
    return pd.DataFrame(
        {"qid": np.arange(len(queries), dtype="int32"), "query": queries}
    )


def gen_thesaurus_tables(seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Thesaurus fixture tables (FIXTURES.md §3).

    ``segments`` is the dictionary over all single content words,
    entity phrases and their aliases; ``meanings`` carries the synonym
    groups (pos='noun' for simplicity plus a few 'verb'/'adj' groups);
    ``entity_alias`` links entities to alias segments with provenance
    tags (reference nb 1.2 cell 2 tag taxonomy).
    """
    seg_list: list[str] = []
    seg_id: dict[str, int] = {}

    def seg(s: str) -> int:
        if s not in seg_id:
            seg_id[s] = len(seg_list)
            seg_list.append(s)
        return seg_id[s]

    pos_of = {
        ("fast", "quick", "rapid"): "adj",
        ("big", "large", "huge"): "adj",
        ("purchase", "buy", "acquire"): "verb",
        ("start", "begin", "commence"): "verb",
        ("end", "finish", "conclude"): "verb",
    }
    meanings_rows = []
    for mid, group in enumerate(SYNONYM_GROUPS):
        pos = pos_of.get(group, "noun")
        for w in group:
            wid = seg(w)
            for s in group:
                meanings_rows.append(
                    {
                        "segment_id": wid,
                        "meaning_id": mid,
                        "pos": pos,
                        "syn_segment_id": seg(s),
                    }
                )

    entity_rows = []
    for eid, (canonical, aliases) in enumerate(ENTITIES.items()):
        for alias in aliases:
            tag = (
                "name" if alias == canonical
                else ("acronym" if " " not in alias and len(alias) <= 3 else "alias")
            )
            entity_rows.append(
                {"entity_id": eid, "segment_id": seg(alias), "tags": [tag]}
            )

    return {
        "segments": pd.DataFrame(
            {"segment_id": range(len(seg_list)), "segment": seg_list}
        ),
        "meanings": pd.DataFrame(meanings_rows),
        "entity_alias": pd.DataFrame(entity_rows),
        "stopwords": pd.DataFrame({"term": STOPWORDS}),
    }


# --- driver-testdata bridge ------------------------------------------------

TRANSCRIPTS_FROM_DOCUMENTS_SQL = """
SELECT
  'conv' || lpad(CAST(doc_id // 8 AS VARCHAR), 6, '0') AS conv_id,
  CAST(doc_id % 8 AS INT)                              AS turn_idx,
  CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                  ELSE 'tool' END                      AS role,
  text                                                 AS text,
  CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN 'search'
                  WHEN 2 THEN 'bash' ELSE 'browser' END AS tool,
  TIMESTAMP '2026-01-01 00:00:00'
    + CAST(doc_id * 13 AS BIGINT) * INTERVAL '1 second' AS ts
FROM {documents}
"""


def transcripts_from_documents(spark, sf_dir: str):
    """Deterministically reshape the driver's ``documents`` parquet
    table into the authoritative transcripts shape. Same arithmetic in
    DuckDB (see TRANSCRIPTS_FROM_DOCUMENTS_SQL) so oracles line up.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("conv"),
            F.lpad((F.col("doc_id") / 8).cast("bigint").cast("string"), 6, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.element_at(
            F.array(F.lit(""), F.lit("search"), F.lit("bash"), F.lit("browser")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("tool"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_dt_interval(secs=(F.col("doc_id") * 13).cast("double"))
        ).alias("ts"),
    )


def spark_transcripts(spark, n_convs: int = 50, seed: int = SEED):
    """Transcripts fixture as a Spark DataFrame (Arrow-converted)."""
    return spark.createDataFrame(
        gen_transcripts_pdf(n_convs, seed), schema=TRANSCRIPT_SCHEMA
    )
