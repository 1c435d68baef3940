"""Wiki-markup bold-mention alias mining (reference nb 1.1 cells
5-17: ``pages_from`` + ``MyExtractor``): raw MediaWiki dump XML →
(page_id, title, redirect_title, first-paragraph bold aliases).

The reference streams the dump through a hand-rolled XML tag scanner
(cell 5) and a customized wikiextractor ``Extractor`` (cell 7) that
marks ``'''bold'''`` / ``'''''bold-italic'''''`` spans before the
markup cleanup, then collects the marked spans of the page's FIRST
section (everything before the first ``== heading ==``) as alias
candidates, discarding the page's own title (cell 17).

Spark-first shape: dump part-files are the parallel unit (the
reference pre-splits the dump, nb 1.0; S6) — each file parses inside
``mapInPandas`` over ``binaryFile`` rows like the other block sources
(sources/corpus.py), and alias extraction is a second row-parallel
``mapInPandas``. Downstream the frames feed the existing S8 TSV sink
and the J1 redirect/alias joins.

Deliberate deviations, all documented here:
* the reference runs the span-marked text through wikiextractor's
  full ``Extractor.extract`` — with template expansion DISABLED (nb
  1.1 cell 13: "Because of a bug into wikiextractor we disable this
  useful option"). We implement the cleanup steps that affect
  first-paragraph bold spans directly (comments, refs, templates
  dropped; wiki/external links reduced to their anchor text; HTML
  entities unescaped) instead of vendoring wikiextractor.
* the BeautifulSoup ``getText`` fallback for nested markup
  (cell 7 ``write_output``) uses bs4 when importable and a tag-strip
  regex otherwise (bs4 is not in this container).

Declared verbatim reuse: the ``[START_MENTION_B*]`` marker strings,
the heading/mention regexes (nb 1.1 cell 7), and wikiextractor's
public bold/italic span regexes are reproduced exactly — they ARE
the behavioral spec the golden oracle checks; everything around them
(the distributed plan, the cleanup pipeline, the page scanner's
regex-over-file form) is an independent construction.
"""

from __future__ import annotations

import html
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from efficient_query_expansion_spark.sources.corpus import _maybe_gunzip

PAGE_SCHEMA = (
    "page_id string, rev_id string, title string,"
    " redirect_title string, text string"
)
ALIAS_SCHEMA = "page_id string, title string, aliases array<string>"

_PAGE_RE = re.compile(r"<page>(.*?)</page>", re.S)
_TITLE_RE = re.compile(r"<title>(.*?)</title>")
_ID_RE = re.compile(r"<id>(\d+)</id>")
_REDIRECT_RE = re.compile(r'<redirect[^>]*title="([^"]*)"')
_TEXT_RE = re.compile(r"<text[^>]*?(/>|>(.*?)</text>)", re.S)

# wikiextractor's public span regexes (WikiExtractor.py): bold-italic
# must be marked before bold (cell 7 applies them innermost-first)
_BOLD_ITALIC_RE = re.compile(r"'''''(.+?)'''''")
_BOLD_RE = re.compile(r"'''(.+?)'''")
_HEADING_RE = re.compile(r"^\s*==(.*?)==\s*$")
_MENTION_B_RE = re.compile(r"\[START_MENTION_B\](.*?)\[END_MENTION_B\]")
_MENTION_BI_RE = re.compile(r"\[START_MENTION_BI\](.*?)\[END_MENTION_BI\]")

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# wikiextractor clean(): italics become quoted text, residual quote
# runs are dropped (the B/BI spans are already marker-protected)
_ITALIC_QUOTE_RE = re.compile(r"''\"([^\"]*?)\"''")
_ITALIC_RE = re.compile(r"''(.+?)''")
_QUOTE_QUOTE_RE = re.compile(r'""([^"]*?)""')
_REF_RE = re.compile(r"<ref[^>]*/>|<ref[^>]*>.*?</ref>", re.S)
_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}", re.S)
_WIKILINK_PIPE_RE = re.compile(r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]")
_WIKILINK_RE = re.compile(r"\[\[([^\[\]]*)\]\]")
_EXTLINK_LABEL_RE = re.compile(r"\[\w+://[^ \]]* ([^\]]*)\]")
_EXTLINK_RE = re.compile(r"\[\w+://[^\]]*\]")
_TAG_RE = re.compile(r"<[^>]+>")


def parse_dump_pages(text: str):
    """Page scanner (nb 1.1 cell 5 ``pages_from`` semantics on a
    whole part-file): yields (page_id, rev_id, title, redirect_title,
    text). The first two ``<id>`` tags are the page and revision ids;
    the redirect title is HTML-unescaped (the title is kept raw,
    matching the reference)."""
    for m in _PAGE_RE.finditer(text):
        body = m.group(1)
        tm = _TITLE_RE.search(body)
        ids = _ID_RE.findall(body)
        rm = _REDIRECT_RE.search(body)
        xm = _TEXT_RE.search(body)
        page_text = xm.group(2) or "" if xm else ""
        yield (
            ids[0] if ids else None,
            ids[1] if len(ids) > 1 else None,
            tm.group(1) if tm else None,
            html.unescape(rm.group(1)) if rm else None,
            page_text,
        )


def _strip_markup(span: str) -> str:
    """``BeautifulSoup(match).getText()`` fallback for nested markup
    (cell 7 ``write_output``), applied only when '<' is present."""
    try:
        from bs4 import BeautifulSoup  # not in this container

        return BeautifulSoup(span, "html.parser").get_text()
    except ImportError:
        return _TAG_RE.sub("", span)


def extract_bold_aliases(title: str, text: str) -> list[str]:
    """``MyExtractor`` semantics (nb 1.1 cell 7): mark bold /
    bold-italic spans in the lines BEFORE the first heading, clean
    the markup, and collect the distinct marked spans minus the page
    title. Returns a sorted list (the reference's set is unordered;
    sorting makes the frame deterministic)."""
    kept = []
    for line in (text or "").split("\n"):
        if _HEADING_RE.match(line):
            break
        kept.append(
            _BOLD_RE.sub(
                r"[START_MENTION_B]\1[END_MENTION_B]",
                _BOLD_ITALIC_RE.sub(
                    r"[START_MENTION_BI]\1[END_MENTION_BI]", line
                ),
            )
        )
    body = "\n".join(kept)
    # reduced Extractor.extract cleanup (see module docstring);
    # entities unescape FIRST (dump text is XML-escaped) so escaped
    # <ref>/tag markup is cleaned like wikiextractor does
    body = html.unescape(body)
    body = _COMMENT_RE.sub("", body)
    body = _REF_RE.sub("", body)
    # nested templates, innermost-out: iterate until a pass removes
    # nothing (a fixed small round count left 4+-deep nests leaking
    # literal {{...}} into aliases); the cap only guards degenerate
    # unbalanced-brace inputs
    for _ in range(64):
        body, n = _TEMPLATE_RE.subn("", body)
        if not n:
            break
    body = _WIKILINK_PIPE_RE.sub(r"\1", body)
    body = _WIKILINK_RE.sub(r"\1", body)
    body = _EXTLINK_LABEL_RE.sub(r"\1", body)
    body = _EXTLINK_RE.sub("", body)
    body = _ITALIC_QUOTE_RE.sub(r'"\1"', body)
    body = _ITALIC_RE.sub(r'"\1"', body)
    body = _QUOTE_QUOTE_RE.sub(r'"\1"', body)
    body = body.replace("'''", "").replace("''", '"')

    matches = set()
    for line in body.split("\n"):
        for match in (
            _MENTION_B_RE.findall(line) + _MENTION_BI_RE.findall(line)
        ):
            if "<" in match:  # nested markup inside templates
                match = _strip_markup(match)
            matches.add(match.strip().replace("\t", " "))
    matches.discard("")
    matches.discard(title)
    return sorted(matches)


def _open_for_range(path: str):
    """Seekable binary reader for a ``binaryFile``-style URI: plain
    ``open`` for ``file:`` / bare paths, ``pyarrow.fs`` for anything
    with a real scheme (hdfs://, s3://, ...) so byte-range splits
    work against distributed storage too."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(path)
    if parsed.scheme == "file":
        # binaryFile lists percent-encoded URIs ('my dump.xml' →
        # 'file:/.../my%20dump.xml'); unquote before open()
        return open(unquote(parsed.path), "rb")
    if parsed.scheme == "":
        # bare local path: taken literally (a file genuinely named
        # with %20 must not be unquoted)
        return open(path, "rb")
    from pyarrow import fs as pafs

    filesystem, rel = pafs.FileSystem.from_uri(path)
    return filesystem.open_input_file(rel)


_RANGE_CHUNK = 4 << 20


def _read_page_region(path: str, start: int, end: int) -> str:
    """Read the dump bytes owned by split [start, end): every page
    whose ``<page>`` open tag begins at an absolute offset in
    [start, end), overscanning past ``end`` until that last page's
    ``</page>`` closes (the Hadoop record-reader boundary rule). A
    page straddling ``start`` is left to the previous split — its
    open tag is outside this buffer, so the page regex skips the
    dangling tail naturally."""
    with _open_for_range(path) as f:
        f.seek(start)
        # +5 lookahead: a "<page>" tag STARTING at end-1..end-5 is
        # owned by this split and must be fully visible to rfind
        data = f.read(end - start + len(b"<page>") - 1)
        # does the last in-range <page> have its </page> yet?
        while True:
            last_open = data.rfind(b"<page>")
            if (
                last_open < 0
                or start + last_open >= end
                or data.find(b"</page>", last_open) >= 0
            ):
                break
            more = f.read(_RANGE_CHUNK)
            if not more:
                break
            data += more
    # drop complete pages whose open tag is past `end` (arrived via
    # overscan; they belong to the next split)
    cut = end - start
    while True:
        last_open = data.rfind(b"<page>")
        if last_open < 0 or last_open < cut:
            break
        data = data[:last_open]
    return data.decode("utf-8", errors="replace")


def read_wiki_dump(
    spark: SparkSession, paths, split_size: int | None = None
) -> DataFrame:
    """Dump part-files → page rows.

    Default (``split_size=None``): files are the parallel unit — the
    pre-split dump shape of reference nb 1.0 (S6). Pass ``split_size``
    to byte-range-split large UNSPLIT dump files instead: each file is
    planned into ``ceil(size/split_size)`` ranges aligned to
    ``<page>`` boundaries executor-side, so a single multi-GB dump
    file parallelizes across the cluster without pre-splitting.
    ``.gz`` parts are not byte-splittable (stream codec) and always
    fall back to one whole-file range; at 100-TB scale store dumps
    uncompressed or in a splittable codec. The split plan is a
    metadata-only listing (path, length) — no content moves through
    the driver."""
    files = spark.read.format("binaryFile").load(paths)

    if split_size is None:
        src = files.select("path", "content")

        def run(batches):
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    text = _maybe_gunzip(path, bytes(content))
                    rows.extend(parse_dump_pages(text))
                cols = [
                    "page_id", "rev_id", "title", "redirect_title", "text",
                ]
                yield (
                    pd.DataFrame(rows, columns=cols)
                    if rows
                    else pd.DataFrame({c: [] for c in cols})
                )

        return src.mapInPandas(run, schema=PAGE_SCHEMA)

    meta = files.select("path", "length").collect()
    splits = []
    for r in meta:
        if r["path"].endswith(".gz"):
            splits.append((r["path"], 0, int(r["length"])))
            continue
        for s in range(0, int(r["length"]), split_size):
            splits.append(
                (r["path"], s, min(s + split_size, int(r["length"])))
            )
    plan = spark.createDataFrame(
        splits, "path string, start long, end long"
    ).repartition(max(1, len(splits)))

    def run_ranges(batches):
        for pdf in batches:
            rows = []
            for path, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                if path.endswith(".gz"):
                    with _open_for_range(path) as f:
                        text = _maybe_gunzip(path, f.read())
                else:
                    text = _read_page_region(path, int(s), int(e))
                rows.extend(parse_dump_pages(text))
            cols = ["page_id", "rev_id", "title", "redirect_title", "text"]
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    return plan.mapInPandas(run_ranges, schema=PAGE_SCHEMA)


def bold_alias_frame(pages: DataFrame) -> DataFrame:
    """Non-redirect pages → (page_id, title, aliases) — the aliases
    part-file content of nb 1.1 cell 17 (one row per page, aliases
    still raw: normalization happens downstream in nb 1.2 / P6)."""
    src = pages.where(F.col("redirect_title").isNull()).select(
        "page_id", "title", "text"
    )

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "page_id": pdf["page_id"],
                    "title": pdf["title"],
                    "aliases": [
                        extract_bold_aliases(t, x)
                        for t, x in zip(pdf["title"], pdf["text"])
                    ],
                }
            )

    return src.mapInPandas(run, schema=ALIAS_SCHEMA)


def redirect_frame(pages: DataFrame) -> DataFrame:
    """Redirect pages → (page_id, title, redirect_title) — the
    redirects part-file of nb 1.1 cell 17 (pure column ops, no UDF)."""
    return pages.where(F.col("redirect_title").isNotNull()).select(
        "page_id", "title", "redirect_title"
    )


def normalized_entity_aliases(pages: DataFrame) -> DataFrame:
    """nb 1.2 integration: per non-redirect page, merge its title,
    its mined first-paragraph bold aliases, and the titles of
    redirect pages pointing at it, then run the tagged alias-variant
    normalization (``normalize_aliases_tagged_py``, the nb 1.2
    cell-2 port) → (entity_id, alias, tags) rows ready for
    :func:`thesaurus.assemble_thesaurus`. One groupBy on the
    redirect target + one Arrow pass — the full dump → thesaurus
    input chain with no driver-side state."""
    from efficient_query_expansion_spark.functions.normalize import (
        normalize_aliases_tagged_py,
    )

    al = bold_alias_frame(pages)
    rd = redirect_frame(pages).select(
        F.col("redirect_title").alias("title"),
        F.col("title").alias("rtitle"),
    )
    rgrp = rd.groupBy("title").agg(
        F.array_sort(F.collect_list("rtitle")).alias("redirs")
    )
    src = al.join(rgrp, "title", "left")

    def run(batches):
        for pdf in batches:
            rows = []
            for pid, title, aliases, redirs in zip(
                pdf["page_id"], pdf["title"], pdf["aliases"],
                pdf["redirs"],
            ):
                tagged = normalize_aliases_tagged_py(
                    {
                        "name": [title],
                        "alias": list(aliases),
                        "redir": (
                            list(redirs) if redirs is not None else []
                        ),
                    }
                )
                for alias, tags in tagged.items():
                    rows.append((pid, alias, list(tags)))
            yield pd.DataFrame(
                rows, columns=["entity_id", "alias", "tags"]
            )

    return src.mapInPandas(
        run, schema="entity_id string, alias string, tags array<string>"
    )
