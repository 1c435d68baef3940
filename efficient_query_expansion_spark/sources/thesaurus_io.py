"""Thesaurus sources (SURVEY §2.1 S7-S9): Wikidata JSON-lines,
gzip TSV alias files, OpenOffice thesaurus format.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def read_wikidata_aliases(
    spark: SparkSession, path: str, langs: tuple = ("en",)
) -> DataFrame:
    """S7: one JSON entity per line → (entity_id, label, aliases).

    ``spark.read.json`` + explode replaces the reference's streaming
    parser (nb 1.1 cell 21); label/alias languages are filtered
    relationally so Catalyst prunes the rest of the document.
    """
    raw = spark.read.json(path)
    lang = langs[0]
    return raw.select(
        F.col("id").alias("entity_id"),
        F.col(f"labels.{lang}.value").alias("label"),
        F.coalesce(
            F.transform(
                F.col(f"aliases.{lang}"), lambda a: a["value"]
            ),
            F.array().cast("array<string>"),
        ).alias("aliases"),
    ).where(F.col("label").isNotNull())


def read_alias_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S8: ``page_id \\t title \\t alias...`` gzip TSV →
    (page_id, title, aliases array). Gzip decompression and
    multi-file parallelism are native to the text source."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return lines.select(
        parts[0].alias("page_id"),
        parts[1].alias("title"),
        F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0))).alias(
            "aliases"
        ),
    ).where(F.size(parts) >= 2)


def write_alias_tsv(df: DataFrame, path: str) -> None:
    df.select(
        F.concat_ws(
            "\t",
            F.col("page_id"),
            F.col("title"),
            F.concat_ws("\t", F.col("aliases")),
        ).alias("value")
    ).write.mode("overwrite").option("compression", "gzip").text(path)


def parse_openoffice_thesaurus(
    spark: SparkSession, path: str
) -> DataFrame:
    """S9: OpenOffice thesaurus — header line ``word|N`` followed by N
    ``(pos)|syn|syn...`` meaning lines (nb 1.3 cell 18) →
    (word, meaning_idx, pos, synonyms array<string>).

    The format is stateful across lines, so each file parses inside
    ``mapInPandas`` over whole files (thesauri are MBs — one file is
    the parallel unit).
    """
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def run(batches):
        import gzip

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    data = gzip.decompress(data)
                lines = data.decode("utf-8", errors="replace").splitlines()
                i = 0
                if lines and "|" in lines[0] and not lines[0].startswith(
                    "("
                ) and lines[0].split("|")[-1].startswith("UTF"):
                    i = 1  # encoding header line e.g. "ISO8859-1"
                while i < len(lines):
                    head = lines[i].split("|")
                    i += 1
                    if len(head) != 2 or not head[1].isdigit():
                        continue
                    word, n = head[0], int(head[1])
                    for m in range(n):
                        if i >= len(lines):
                            break
                        parts = lines[i].split("|")
                        i += 1
                        pos = parts[0].strip("()")
                        rows.append((word, m, pos, parts[1:]))
            yield pd.DataFrame(
                rows, columns=["word", "meaning_idx", "pos", "synonyms"]
            )

    return files.mapInPandas(
        run,
        schema=(
            "word string, meaning_idx int, pos string,"
            " synonyms array<string>"
        ),
    )
