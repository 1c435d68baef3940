"""Sources (S2-S9) and streaming incremental-maintenance tests."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F


def test_custom_block_reader(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text(
        "doc1\nTitle One\nline a\nline b\n\n"
        "doc2\nTitle Two\nonly line\n\n"
    )
    from efficient_query_expansion_spark.sources.corpus import (
        read_documents,
    )

    rows = {
        r["doc_id"]: r
        for r in read_documents(spark, str(p), "custom").collect()
    }
    assert rows["doc1"]["title"] == "Title One"
    assert rows["doc1"]["content"] == "line a\nline b"
    assert rows["doc2"]["content"] == "only line"


def test_wiki_and_sphinx_readers(spark, tmp_path):
    from efficient_query_expansion_spark.sources.corpus import (
        read_documents,
    )

    w = tmp_path / "wiki.txt.gz"
    w.write_bytes(
        gzip.compress(
            b'<doc id="42" url="u" title="Page A">\nbody text\n</doc>\n'
            b'<doc id="43" url="u" title="Page B">\nmore\n</doc>\n'
        )
    )
    rows = {
        r["doc_id"]: r for r in read_documents(spark, str(w), "wiki").collect()
    }
    assert rows["42"]["title"] == "Page A" and rows["42"]["content"] == "body text"

    s = tmp_path / "sphinx.xml"
    s.write_text(
        "<sphinx:document id='7'><title>T</title><content>C</content>"
        "<url>http://x</url><keywords>k</keywords>"
        "<description>d</description></sphinx:document>"
    )
    r = read_documents(spark, str(s), "sphinx").collect()[0]
    assert (r["doc_id"], r["title"], r["url"]) == ("7", "T", "http://x")


def test_alias_tsv_roundtrip(spark, tmp_path):
    from efficient_query_expansion_spark.sources.thesaurus_io import (
        read_alias_tsv,
        write_alias_tsv,
    )

    df = spark.createDataFrame(
        [("1", "Title", ["a", "b"]), ("2", "Other", [])],
        "page_id string, title string, aliases array<string>",
    )
    out = str(tmp_path / "tsv")
    write_alias_tsv(df, out)
    back = {r["page_id"]: r for r in read_alias_tsv(spark, out).collect()}
    assert back["1"]["title"] == "Title"
    assert list(back["1"]["aliases"]) == ["a", "b"]


def test_openoffice_parser(spark, tmp_path):
    from efficient_query_expansion_spark.sources.thesaurus_io import (
        parse_openoffice_thesaurus,
    )

    p = tmp_path / "th.dat"
    p.write_text(
        "car|2\n(noun)|auto|automobile\n(noun)|vehicle\n"
        "fast|1\n(adj)|quick|rapid\n"
    )
    rows = parse_openoffice_thesaurus(spark, str(p)).collect()
    by = {(r["word"], r["meaning_idx"]): r for r in rows}
    assert list(by[("car", 0)]["synonyms"]) == ["auto", "automobile"]
    assert by[("car", 1)]["pos"] == "noun"
    assert list(by[("fast", 0)]["synonyms"]) == ["quick", "rapid"]


def test_incremental_stream_matches_batch(spark, tmp_path):
    """foreachBatch merge (A6 streaming) == one-shot batch stats."""
    from efficient_query_expansion_spark.fixtures import spark_transcripts
    from efficient_query_expansion_spark.operators.stats import term_stats
    from efficient_query_expansion_spark.operators.tokenize import (
        token_positions,
        with_norm_text,
        with_tokens,
    )
    from efficient_query_expansion_spark.streaming.incremental import (
        incremental_term_stats,
    )

    t = spark_transcripts(spark, n_convs=12)
    inp = str(tmp_path / "in")
    # two parquet drops arriving over time
    t.where(F.col("conv_id") <= "conv000005").write.parquet(
        inp + "/drop1.parquet"
    )
    t.where(F.col("conv_id") > "conv000005").write.parquet(
        inp + "/drop2.parquet"
    )
    state = str(tmp_path / "state")
    q = incremental_term_stats(
        spark, inp + "/*", state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        r["term"]: (r["df"], r["tf"], r["tf2"])
        for r in spark.read.parquet(state).collect()
    }
    want = {
        r["term"]: (r["df"], r["tf"], r["tf2"])
        for r in term_stats(
            token_positions(with_tokens(with_norm_text(t)))
        ).collect()
    }
    assert got == want


def test_windowed_turn_rates_stream(spark, tmp_path):
    from efficient_query_expansion_spark.fixtures import spark_transcripts
    from efficient_query_expansion_spark.streaming.incremental import (
        windowed_turn_rates,
    )

    t = spark_transcripts(spark, n_convs=10)
    inp = str(tmp_path / "in2")
    t.write.parquet(inp + "/all.parquet")
    agg = windowed_turn_rates(spark, inp + "/*")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates_out").collect()
    assert sum(r["n_turns"] for r in rows) == t.count()
    assert {r["role"] for r in rows} == {"user", "assistant", "tool"}


def test_merge_stats_batch_epoch_idempotent(spark, tmp_path):
    """Redelivered micro-batches (same epoch_id) must not double-count
    — the applied-epoch ledger swaps atomically with the state."""
    from efficient_query_expansion_spark.fixtures import spark_transcripts
    from efficient_query_expansion_spark.streaming.incremental import (
        merge_stats_batch,
    )

    t = spark_transcripts(spark, n_convs=6)
    state = str(tmp_path / "state")
    assert merge_stats_batch(t, state, epoch_id=0) is True
    once = {
        r["term"]: (r["df"], r["tf"]) for r in
        spark.read.parquet(state).collect()
    }
    # redelivery of epoch 0: skipped, state unchanged
    assert merge_stats_batch(t, state, epoch_id=0) is False
    again = {
        r["term"]: (r["df"], r["tf"]) for r in
        spark.read.parquet(state).collect()
    }
    assert once == again
    # a genuinely new epoch applies additively
    assert merge_stats_batch(t, state, epoch_id=1) is True
    doubled = {
        r["term"]: (r["df"], r["tf"]) for r in
        spark.read.parquet(state).collect()
    }
    assert doubled == {k: (d * 2, f * 2) for k, (d, f) in once.items()}


def test_merge_stats_batch_crash_between_renames(spark, tmp_path):
    """A crash between the two swap renames leaves the state only
    under ``.old``; the next merge must restore it, not reset the
    accumulation."""
    import os
    import shutil

    from efficient_query_expansion_spark.fixtures import spark_transcripts
    from efficient_query_expansion_spark.streaming.incremental import (
        merge_stats_batch,
    )

    t = spark_transcripts(spark, n_convs=6)
    state = str(tmp_path / "state")
    assert merge_stats_batch(t, state, epoch_id=0) is True
    once = {
        r["term"]: (r["df"], r["tf"]) for r in
        spark.read.parquet(state).collect()
    }
    # simulate the crash window: old moved aside, new never renamed in
    os.rename(state, state + ".old")
    assert merge_stats_batch(t, state, epoch_id=1) is True
    assert not os.path.exists(state + ".old")
    merged = {
        r["term"]: (r["df"], r["tf"]) for r in
        spark.read.parquet(state).collect()
    }
    # epoch 0's contribution survived the simulated crash
    assert merged == {k: (d * 2, f * 2) for k, (d, f) in once.items()}
    shutil.rmtree(state)


def test_stateful_conversation_stats(spark, tmp_path):
    """applyInPandasWithState keyed state survives a query restart
    from the checkpoint: the second drop ACCUMULATES per-conversation
    counts instead of resetting them."""
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import spark_transcripts
    from efficient_query_expansion_spark.streaming.stateful import (
        conversation_state_stats,
        latest_conversation_state,
    )

    t = spark_transcripts(spark, n_convs=8)
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    half1 = t.where(F.col("turn_idx") % 2 == 0)
    half2 = t.where(F.col("turn_idx") % 2 == 1)
    half1.write.parquet(inp + "/drop1.parquet")

    q = conversation_state_stats(spark, inp + "/*", ckpt, out)
    q.awaitTermination(120)
    got1 = {
        r["conv_id"]: r["n_turns"]
        for r in latest_conversation_state(spark, out).collect()
    }
    want1 = {
        r["conv_id"]: r["n"]
        for r in half1.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert got1 == want1

    # second drop, same checkpoint -> state restored and accumulated
    half2.write.parquet(inp + "/drop2.parquet")
    q2 = conversation_state_stats(spark, inp + "/*", ckpt, out)
    q2.awaitTermination(120)
    got2 = {
        r["conv_id"]: (r["n_turns"], r["n_chars"])
        for r in latest_conversation_state(spark, out).collect()
    }
    want2 = {
        r["conv_id"]: (r["n"], r["c"])
        for r in t.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("c"),
        ).collect()
    }
    assert got2 == want2


def test_wiki_bold_alias_miner(spark, tmp_path):
    """nb 1.1 cells 5-17 semantics: heading cutoff, BI-before-B
    marking, link anchor text, escaped-ref removal, nested-tag strip,
    tab replacement, title self-discard, redirect capture."""
    from efficient_query_expansion_spark.sources.wiki_markup import (
        bold_alias_frame,
        extract_bold_aliases,
        read_wiki_dump,
        redirect_frame,
    )

    text = (
        "{{Infobox|x=1}}\n"
        "'''Alpha''' or '''''beta gamma''''' is a thing."
        "&lt;ref&gt;src&lt;/ref&gt;\n"
        "Linked '''[[target|anchor]]''' and '''A&amp;B''' plus"
        " a tab '''a\tb'''.\n"
        "== Heading ==\n"
        "'''after''' is ignored.\n"
    )
    got = extract_bold_aliases("Alpha", text)
    assert got == ["A&B", "a b", "anchor", "beta gamma"]

    dump = (
        "<mediawiki>\n<page>\n<title>Alpha</title>\n<id>1</id>\n"
        "<revision><id>9</id>"
        "<text xml:space=\"preserve\">" + text.replace("\t", "&#9;")
        + "</text></revision>\n</page>\n"
        "<page>\n<title>Beta</title>\n<id>2</id>\n"
        "<redirect title=\"Alpha &amp; Co\" />\n"
        "<revision><id>10</id><text xml:space=\"preserve\" /></revision>\n"
        "</page>\n</mediawiki>\n"
    )
    f = tmp_path / "dump.xml"
    f.write_text(dump)
    pages = read_wiki_dump(spark, str(tmp_path))
    al = {
        r["title"]: r["aliases"] for r in bold_alias_frame(pages).collect()
    }
    assert al == {"Alpha": ["A&B", "a b", "anchor", "beta gamma"]}
    rd = redirect_frame(pages).collect()
    assert [(r["page_id"], r["title"], r["redirect_title"]) for r in rd] == [
        ("2", "Beta", "Alpha & Co")
    ]


def test_wiki_dump_byte_range_splitting(spark, tmp_path):
    """One concatenated (unsplit) dump file, byte-range split into
    >1 task, parses to exactly the same page set as the whole-file
    path — every page lands in exactly one split regardless of where
    the range boundaries fall relative to <page> tags."""
    from efficient_query_expansion_spark.sources.wiki_markup import (
        read_wiki_dump,
    )

    pages = []
    for i in range(60):
        body = f"'''alias {i}''' body " + ("x" * (37 * (i % 7)))
        pages.append(
            f"<page>\n<title>Page {i}</title>\n<id>{i}</id>\n"
            f"<revision><id>{1000 + i}</id>"
            f'<text xml:space="preserve">{body}</text></revision>\n'
            f"</page>\n"
        )
    dump = "<mediawiki>\n" + "".join(pages) + "</mediawiki>\n"
    # space in the name: binaryFile lists it percent-encoded, and the
    # range opener must unquote before open()
    f = tmp_path / "big dump.xml"
    f.write_text(dump)

    whole = read_wiki_dump(spark, str(tmp_path))
    want = sorted(
        (r["page_id"], r["title"], r["text"]) for r in whole.collect()
    )
    assert len(want) == 60

    # split every ~700 bytes → dozens of ranges, boundaries land
    # mid-page, mid-tag, and between pages
    split = read_wiki_dump(spark, str(tmp_path), split_size=700)
    assert split.rdd.getNumPartitions() > 1
    got = sorted(
        (r["page_id"], r["title"], r["text"]) for r in split.collect()
    )
    assert got == want

    # degenerate range sizes still lose nothing
    for sz in (64, 123, 5000):
        n = read_wiki_dump(spark, str(tmp_path), split_size=sz).count()
        assert n == 60, f"split_size={sz} lost pages"


def test_template_nesting_beyond_three_levels(spark):
    """ADVICE r3: templates nested 4+ deep must not leak literal
    {{...}} text into extracted aliases."""
    from efficient_query_expansion_spark.sources.wiki_markup import (
        extract_bold_aliases,
    )

    deep = "{{a|{{b|{{c|{{d|{{e|x}}}}}}}}}}"
    got = extract_bold_aliases("T", deep + " '''kept''' tail")
    assert got == ["kept"]


def test_incremental_index_stream_builds_catalog(spark, tmp_path):
    """Round-4 streaming ingestion: parquet drops → segment catalog
    via foreachBatch append_segment; catalog_topk over the streamed
    catalog is bit-identical to a monolithic index over all turns,
    and a redelivered epoch is a no-op (idempotent catalog write)."""
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import spark_transcripts
    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
        sharded_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        build_index,
        read_catalog,
    )
    from efficient_query_expansion_spark.streaming.incremental import (
        incremental_index,
    )

    t = spark_transcripts(spark, n_convs=12)
    inp = str(tmp_path / "in")
    t.where(F.col("conv_id") <= "conv000005").write.parquet(
        inp + "/drop1.parquet"
    )
    t.where(F.col("conv_id") > "conv000005").write.parquet(
        inp + "/drop2.parquet"
    )
    cat_path = str(tmp_path / "catalog")
    q = incremental_index(
        spark, inp + "/*", cat_path, str(tmp_path / "ckpt"),
        shard_size=128,
    )
    q.awaitTermination(120)

    segments = read_catalog(spark, cat_path)
    assert len(segments) >= 1  # availableNow may batch drops together

    qrepr = {0: [[[("car",), ("auto",)]]], 1: [[[("fast",)]]]}
    ql = query_reprs_to_long_df(spark, qrepr)
    got = {
        (r["qid"], r["rank"]): (r["conv_id"], r["turn_idx"], r["score"])
        for r in catalog_topk(ql, segments, k=5).collect()
    }
    mono = build_index(t, shard_size=128)
    want = {
        (r["qid"], r["rank"]): (r["conv_id"], r["turn_idx"], r["score"])
        for r in sharded_topk(ql, mono, k=5).collect()
    }
    assert got == want  # bit-identical incl. float64 scores

    # redelivered epoch (checkpoint-commit failure) must be a no-op
    import json
    import os

    with open(os.path.join(cat_path, "catalog.json")) as fh:
        cat = json.load(fh)
    n_seg = len(cat["segments"])
    epoch = cat["applied_epochs"][0]
    cat2 = append_segment(
        t.limit(4), cat_path, applied_epoch=epoch, shard_size=128
    )
    assert len(cat2["segments"]) == n_seg


def test_streaming_catalog_auto_compaction(spark, tmp_path):
    """Round-5 standing-ingestion shape: 8 one-file micro-batches
    with ``max_segments=3`` — the stream compacts as it appends, the
    final catalog holds ≤3 segments, the epoch ledger records all 8
    micro-batches, and queries are bit-identical to a monolithic
    index over every turn."""
    import json
    import os

    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        spark_transcripts,
    )
    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
        sharded_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
        read_catalog,
    )
    from efficient_query_expansion_spark.streaming.incremental import (
        incremental_index,
    )

    t = spark_transcripts(spark, n_convs=16)
    convs = sorted(
        r["conv_id"] for r in t.select("conv_id").distinct().collect()
    )
    inp = str(tmp_path / "in")
    for i in range(8):
        part = set(convs[i::8])
        t.where(F.col("conv_id").isin(part)).coalesce(1).write.parquet(
            inp + f"/drop{i}.parquet"
        )
    cat_path = str(tmp_path / "catalog")
    q = incremental_index(
        spark, inp + "/*", cat_path, str(tmp_path / "ckpt"),
        shard_size=128, max_segments=3, max_files_per_trigger=1,
        num_partitions=2,
    )
    q.awaitTermination(300)

    with open(os.path.join(cat_path, "catalog.json")) as fh:
        cat = json.load(fh)
    assert len(cat["segments"]) <= 3
    assert len(cat["applied_epochs"]) == 8  # every micro-batch applied
    # compaction happened at least once and ids never recycle
    assert any(
        "compacted_from" in s["lineage"] for s in cat["segments"]
    )

    segments = read_catalog(spark, cat_path)
    qrepr = {0: [[[("car",), ("auto",)]]], 1: [[[("fast",)]]]}
    ql = query_reprs_to_long_df(spark, qrepr)
    got = {
        (r["qid"], r["rank"]): (r["conv_id"], r["turn_idx"], r["score"])
        for r in catalog_topk(ql, segments, k=5).collect()
    }
    mono = build_index(t, shard_size=128)
    want = {
        (r["qid"], r["rank"]): (r["conv_id"], r["turn_idx"], r["score"])
        for r in sharded_topk(ql, mono, k=5).collect()
    }
    assert got == want  # bit-identical incl. float64 scores
