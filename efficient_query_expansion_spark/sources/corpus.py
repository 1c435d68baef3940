"""Corpus sources (SURVEY §2.1 S1-S6): plain/gzip text, custom
doc-block, WikiExtractor and Sphinx-XML document streams → DataFrames.

``spark.read.text`` natively handles plain and ``.gz`` files and
multi-file globs (S1/S5); the three block formats (S2-S4) need
stateful line grouping, which Spark's line-based reader can't express
directly — so each file is parsed inside ``mapInPandas`` over
``(path, whole_file)`` rows from ``spark.read.format("binaryFile")``
(documents are small; files are the parallel unit, like the
reference's per-file generator at documents_utils.py:190-212). The
row-oriented outputs all share the Doc schema
(doc_id, title, content) per documents_utils.py:11-24.
"""

from __future__ import annotations

import gzip
import io
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = "doc_id string, title string, content string"
EXT_SCHEMA = (
    "doc_id string, title string, content string, url string,"
    " keywords string, description string"
)


def _maybe_gunzip(path: str, content: bytes) -> str:
    if path.endswith(".gz"):
        content = gzip.decompress(content)
    return content.decode("utf-8", errors="replace")


def _parse_custom_blocks(text: str):
    """``id \\n title \\n line... \\n\\n`` blocks
    (documents_utils.py:27-67)."""
    for block in re.split(r"\n\s*\n", text):
        lines = [ln for ln in block.split("\n")]
        while lines and lines[0] == "":
            lines = lines[1:]
        if len(lines) < 2:
            continue
        yield lines[0].strip(), lines[1], "\n".join(lines[2:])


def _parse_wiki_blocks(text: str):
    """WikiExtractor ``<doc id=.. title=..>...</doc>`` blocks
    (documents_utils.py:70-114)."""
    for m in re.finditer(
        r'<doc id="([^"]*)"[^>]*title="([^"]*)"[^>]*>\n?(.*?)</doc>',
        text,
        re.S,
    ):
        yield m.group(1), m.group(2), m.group(3).strip()


def _parse_sphinx_blocks(text: str):
    """Sphinx ``<sphinx:document id='..'>`` XML (documents_utils.py:
    117-169): subfields title/content/url/keywords/description."""

    def field(doc: str, name: str) -> str:
        m = re.search(
            rf"<{name}>(.*?)</{name}>", doc, re.S
        )
        return m.group(1).strip() if m else ""

    for m in re.finditer(
        r"<sphinx:document id='([^']*)'>(.*?)</sphinx:document>",
        text,
        re.S,
    ):
        body = m.group(2)
        yield (
            m.group(1),
            field(body, "title"),
            field(body, "content"),
            field(body, "url"),
            field(body, "keywords"),
            field(body, "description"),
        )


_PARSERS = {
    "custom": (_parse_custom_blocks, DOC_SCHEMA),
    "wiki": (_parse_wiki_blocks, DOC_SCHEMA),
    "sphinx": (_parse_sphinx_blocks, EXT_SCHEMA),
}


def read_documents(
    spark: SparkSession, paths: str | list[str], file_format: str = "custom"
) -> DataFrame:
    """S2-S5: multiplexing document reader → Doc rows."""
    parser, schema = _PARSERS[file_format]
    files = spark.read.format("binaryFile").load(paths).select(
        "path", "content"
    )
    ncols = len(schema.split(","))

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                text = _maybe_gunzip(path, bytes(content))
                for tup in parser(text):
                    rows.append(tup)
            yield pd.DataFrame(
                rows, columns=[c.split()[0] for c in schema.split(",")]
            ) if rows else pd.DataFrame(
                {c.split()[0]: [] for c in schema.split(",")}
            )

    return files.mapInPandas(run, schema=schema)


def write_normalized_corpus(df: DataFrame, path: str) -> None:
    """S10-ish sink: normalized corpus as parquet (the reference's
    newline-delimited text stream becomes a columnar table)."""
    df.write.mode("overwrite").parquet(path)
