"""Unit tests for the training-data pipeline operators (dedup,
similarity, text stats, multimodal plumbing). The driver-contract
test already proves DuckDB-oracle equality; these cover semantic
properties the oracles can't express.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (2, "the quick brown fox leaps over the lazy dog"),   # near dup
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over a lazy cat"),     # near dup
        (5, "el rapido zorro marron salta sobre el perro"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def docs_tokens(docs):
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    return with_tokens(with_norm_text(docs))


def test_exact_duplicates(docs):
    from efficient_query_expansion_spark.operators.dedup import (
        exact_duplicates,
    )

    rows = exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]["n_dups"] == 2 and rows[0]["keep_id"] == 0


def test_jaccard_and_lsh_agree_on_near_dups(docs_tokens):
    from efficient_query_expansion_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        token_shingles,
    )

    sh = token_shingles(docs_tokens, n=3)
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sh, threshold=0.0).collect()
    }
    # exact dup pair has jaccard 1.0; near-dups in (0,1); disjoint absent
    assert jac[(0, 1)] == 1.0
    assert 0.0 < jac[(0, 2)] < 1.0
    assert (0, 3) not in jac
    cand = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(sh, 8), 8, 2
        ).collect()
    }
    assert (0, 1) in cand           # identical docs always collide
    assert (0, 5) not in cand       # unrelated languages don't


def test_simhash_near_dup_hamming(docs_tokens):
    from efficient_query_expansion_spark.operators.dedup import simhash

    sh = {r["doc_id"]: r["simhash"] for r in
          simhash(docs_tokens, bits=16).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert sh[0] == sh[1]
    assert ham(sh[0], sh[2]) <= ham(sh[0], sh[3])


def test_similarity_bruteforce_and_ivf(spark):
    from efficient_query_expansion_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        lsh_topk,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(0, vecs[0].tolist())], "qid long, qvec array<float>"
    )
    top = brute_force_topk(emb, q, k=5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] > 0.999999
    # numpy oracle agreement on the top-5 ids
    sims = vecs @ vecs[0] / (
        np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0])
    )
    got = [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert got == sorted(range(50), key=lambda i: (-sims[i], i))[:5]

    planes = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in (1, 2, 3)],
        "hid long, hvec array<float>",
    )
    atop = lsh_topk(emb, q, planes, k=5).collect()
    # the query's own vector is in its own bucket ⇒ rank 1 survives
    assert sorted(r["rank"] for r in atop)[0] == 1
    assert atop[0]["vec_id"] == 0

    cents = spark.createDataFrame(
        [(0, vecs[10].tolist()), (1, vecs[20].tolist())],
        "cid long, cvec array<float>",
    )
    assign = {r["vec_id"]: r["cid"] for r in ivf_assign(emb, cents).collect()}
    assert assign[10] == 0 and assign[20] == 1
    assert set(assign) == set(range(50))


def test_multimodal_plumbing(spark, docs):
    from efficient_query_expansion_spark.operators.multimodal import (
        decode_media,
        extract_features,
        sample_frames,
        synthesize_media,
    )

    media = synthesize_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == docs.count()
    byid = {r["media_id"]: r for r in feats}
    assert byid[0]["n_bytes"] == len(
        "the quick brown fox jumps over the lazy dog".encode()
    )
    assert byid[0]["checksum"] == byid[1]["checksum"]  # same payload
    assert all(r["width"] >= 16 and r["height"] >= 16 for r in feats)
    # video/audio rows get multi-frame counts, images exactly 1
    assert all(
        (r["media_type"] == "image") == (r["n_frames"] == 1) for r in feats
    )

    frames = sample_frames(media, every_n_bytes=16, max_frames=4).collect()
    assert {r["media_id"] for r in frames} == set(range(6))
    assert max(r["frame_idx"] for r in frames) <= 3

    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image")


def test_language_id(spark):
    from efficient_query_expansion_spark.operators.textstats import (
        language_id,
    )
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    rows = [
        (0, "the cat is in the house and it is warm"),
        (1, "el perro y el gato se ven en la casa"),
        (2, "der hund und die katze das ist gut"),
        (3, "xyzzy plugh qwop zork"),
    ]
    df = with_tokens(with_norm_text(
        spark.createDataFrame(rows, "doc_id long, text string")))
    langs = {r["doc_id"]: r["lang"] for r in language_id(df).collect()}
    assert langs == {0: "en", 1: "es", 2: "de", 3: "und"}


def test_lsh_hot_bucket_cap(spark):
    """One degenerate bucket (many identical docs) must not explode
    the candidate self-join: the cap drops it, the report names it,
    and genuine near-dup pairs survive."""
    from efficient_query_expansion_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_hot_buckets,
        minhash_signatures,
        token_shingles,
    )

    rows = [(i, "boiler plate empty template text") for i in range(200)]
    rows += [
        (1000, "a genuinely unique document about spark joins and more"),
        (1001, "a genuinely unique document about spark joins and stuff"),
        (1002, "completely different content with nothing shared here at"
               " all whatsoever in any way"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    toks = with_tokens(with_norm_text(docs))
    sig = minhash_signatures(token_shingles(toks, n=3), num_hashes=8)

    capped = lsh_candidate_pairs(sig, max_bucket_size=50)
    pairs = capped.collect()
    # without the cap the boilerplate bucket alone emits 19,900 pairs
    assert len(pairs) < 100
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1000, 1001) in ids  # real near-dups survive the cap
    assert all(a >= 1000 for a, _ in ids)  # boilerplate dropped

    hot = lsh_hot_buckets(sig, max_bucket_size=50).collect()
    assert len(hot) >= 1 and all(r["bucket_n"] == 200 for r in hot)

    uncapped = lsh_candidate_pairs(sig)
    assert uncapped.count() >= 19900


def test_ngram_jaccard_shingle_df_cap(spark):
    """A boilerplate shingle shared by 200 docs would emit ~19,900
    join rows; max_shingle_df drops it before the join while real
    near-dup pairs (sharing low-df shingles) keep exact Jaccard over
    the surviving shingle space."""
    from efficient_query_expansion_spark.operators.dedup import (
        ngram_hot_shingles,
        ngram_jaccard_pairs,
        token_shingles,
    )
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    # every doc carries the same boilerplate header; two docs share a
    # long unique tail (true near-dups)
    rows = [
        (i, f"standard header line for all documents row{i} " )
        for i in range(200)
    ]
    tail = "unique payload about shuffle partition skew and remedies"
    rows += [(1000, "standard header line for all documents " + tail),
             (1001, "different intro line not like the others " + tail)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = token_shingles(with_tokens(with_norm_text(docs)), n=3)

    capped = ngram_jaccard_pairs(
        sh, threshold=0.3, max_shingle_df=50
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in ids          # real near-dups survive
    assert all(a >= 1000 for a, _ in ids)  # boilerplate-only pairs gone

    hot = ngram_hot_shingles(sh, max_shingle_df=50).collect()
    assert len(hot) >= 1
    assert all(r["shingle_df"] >= 200 for r in hot)
    # uncapped run on the same input shows the blowup the cap avoids
    assert ngram_jaccard_pairs(sh, threshold=0.99).count() == 0


def test_embedding_near_dup_bucket_cap(spark):
    """A degenerate embedding value (failed encoder batch → constant
    vector) floods one sign-LSH bucket; max_bucket_size drops that
    bucket before the self-join while a planted genuine near-dup pair
    in a healthy bucket survives."""
    from efficient_query_expansion_spark.operators.dedup import (
        embedding_hot_buckets,
        embedding_near_duplicates,
    )

    rng = np.random.RandomState(3)
    degenerate = [0.01] * 8
    rows = [(i, degenerate) for i in range(300)]
    base = rng.uniform(-1, 1, 8)
    near = base + rng.uniform(-0.01, 0.01, 8)
    rows += [(1000, [float(x) for x in base]),
             (1001, [float(x) for x in near])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    planes = spark.createDataFrame(
        [(h, [float(x) for x in rng.uniform(-1, 1, 8)])
         for h in range(4)],
        "hid long, hvec array<double>",
    )

    capped = embedding_near_duplicates(
        emb, planes, threshold=0.95, max_bucket_size=100
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in ids
    assert all(a >= 1000 for a, _ in ids)

    hot = embedding_hot_buckets(
        emb, planes, max_bucket_size=100
    ).collect()
    assert len(hot) >= 1 and all(r["bucket_n"] >= 300 for r in hot)

    # uncapped: the degenerate bucket emits the quadratic pair set
    uncapped = embedding_near_duplicates(emb, planes, threshold=0.95)
    assert uncapped.count() >= 300 * 299 / 2


def test_banded_lsh_recall_beats_single_table(spark):
    """OR over g tables makes recall tunable: on a synthetic corpus
    the banded (b=2, g=4) candidate set is a strict superset of any
    single table's and recall@10 improves over the 8-bit single
    table at the same verify pipeline."""
    from efficient_query_expansion_spark.operators.similarity import (
        banded_lsh_topk,
        banded_sign_lsh_buckets,
        brute_force_topk,
        lsh_topk,
    )

    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.limit(5).selectExpr(
        "vec_id as qid", "embedding as qvec"
    )
    base = emb.where(F.col("vec_id") >= 5)
    planes8 = spark.createDataFrame(
        [(h, [float(x) for x in rng.uniform(-1, 1, 8)]) for h in range(8)],
        "hid long, hvec array<double>",
    )

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["vec_id"])
        return out

    truth = sets(brute_force_topk(base, queries, k=10))

    def recall(approx):
        return sum(
            len(approx.get(q, set()) & truth[q]) / len(truth[q])
            for q in truth
        ) / len(truth)

    single = recall(sets(lsh_topk(base, queries, planes8, k=10)))
    banded = recall(
        sets(banded_lsh_topk(base, queries, planes8, k=10, num_tables=4))
    )
    assert banded > single
    assert banded >= 0.5  # 1-(1-2^-2)^4 ≈ 0.68 expected on uniform

    # structural: one bucket per (row, table); bucket width = b
    b = banded_sign_lsh_buckets(base, planes8, num_tables=4)
    rows_b = b.collect()
    assert len(rows_b) == base.count() * 4
    assert all(len(r["bucket"]) == 2 for r in rows_b)


def test_duplicate_clusters_components(spark):
    """Min-label propagation finds components across shapes the
    one-round star case doesn't cover: a 4-node chain (diameter 3),
    a clique, and an isolated pair."""
    from efficient_query_expansion_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain
            (10, 11), (10, 12), (11, 12),    # clique
            (20, 21),                        # pair
            (30, 30),                        # self-pair: must not vanish
        ],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30,
    }


def test_kmeans_fit_matches_numpy_oracle_and_improves_ivf(spark):
    """Spherical Lloyd parity vs a numpy port (same deterministic
    init, same empty-cluster rule), and trained centroids beat
    arbitrary-row centroids on IVF recall over clustered data."""
    from efficient_query_expansion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
    )

    rng = np.random.RandomState(13)
    dims, per = 6, 40
    centers = rng.uniform(-1, 1, (4, dims)) * 3
    rows = []
    for ci, c in enumerate(centers):
        for j in range(per):
            v = c + rng.normal(0, 0.3, dims)
            rows.append((ci * per + j, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )

    got = kmeans_fit(emb, k=4, max_iter=8)
    got_c = {
        r["cid"]: np.array(r["cvec"]) for r in got.collect()
    }

    # numpy oracle: identical algorithm
    X = np.array([v for _, v in rows], dtype=np.float64)
    C = X[:4].copy()
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    for _ in range(8):
        sims = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ C.T
        a = np.argmax(sims, axis=1)  # ties → lowest cid, same as Spark
        newC = C.copy()
        moved = 0.0
        for cid in range(4):
            m = X[a == cid]
            if len(m):
                mu = m.mean(axis=0)
                n = np.linalg.norm(mu)
                if n > 0:
                    newC[cid] = mu / n
        moved = np.abs(newC - C).max()
        C = newC
        if np.linalg.norm(C - newC) < 1e-6 and moved < 1e-6:
            break
    for cid in range(4):
        assert np.allclose(got_c[cid], C[cid], atol=1e-9), cid

    # trained centroids: recall@5 at n_probe=1 beats arbitrary rows
    queries = emb.limit(5).selectExpr(
        "vec_id as qid", "embedding as qvec"
    )

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["vec_id"])
        return out

    truth = sets(brute_force_topk(emb, queries, k=5))

    def recall(approx):
        return sum(
            len(approx.get(q, set()) & truth[q]) / len(truth[q])
            for q in truth
        ) / len(truth)

    arbitrary = emb.limit(4).selectExpr(
        "vec_id as cid", "embedding as cvec"
    )
    r_arb = recall(sets(ivf_topk(emb, queries, arbitrary, k=5, n_probe=1)))
    r_fit = recall(sets(ivf_topk(emb, queries, got, k=5, n_probe=1)))
    assert r_fit >= r_arb
    assert r_fit >= 0.9  # clusters recovered → probe-1 recall ~1


def _make_wav(rate=8000, secs=0.05, freq=440.0):
    import io
    import wave

    t = np.arange(int(rate * secs)) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 32000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def _make_ppm(h, w, seed=0):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes(), px


def _make_bmp24(px):
    import struct

    h, w = px.shape[:2]
    row = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        line = px[r][:, ::-1].tobytes()  # RGB → BGR
        body += line + b"\x00" * (row - len(line))
    data_off = 54
    header = struct.pack(
        "<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    return bytes(header) + bytes(body)


def test_real_media_decode_and_features(spark):
    """Codec-free real decoding: WAV samples round-trip exactly, PPM
    and BMP pixels match the source arrays, decoded features (RMS,
    ZCR, luma, frame counts) match numpy, and compressed payloads
    degrade to kind='undecodable' instead of failing the batch."""
    from efficient_query_expansion_spark.operators.multimodal import (
        decode_media,
        extract_decoded_features,
        resize_nearest,
        sample_video_frames,
    )

    wav_bytes, samples = _make_wav()
    d = decode_media(wav_bytes, "audio")
    assert d["rate"] == 8000
    assert np.allclose(d["samples"], samples / 32767.0, atol=1e-9)

    ppm_bytes, px = _make_ppm(6, 5, seed=1)
    assert np.array_equal(decode_media(ppm_bytes, "image")["pixels"], px)
    bmp_bytes = _make_bmp24(px)
    assert np.array_equal(decode_media(bmp_bytes, "image")["pixels"], px)

    frames = [_make_ppm(4, 4, seed=s) for s in range(5)]
    vid_bytes = b"PPMVID\x00\x00" + b"".join(b for b, _ in frames)
    dv = decode_media(vid_bytes, "video")
    assert len(dv["frames"]) == 5
    assert np.array_equal(dv["frames"][2], frames[2][1])

    media = spark.createDataFrame(
        [
            (1, bytearray(wav_bytes)),
            (2, bytearray(ppm_bytes)),
            (3, bytearray(bmp_bytes)),
            (4, bytearray(vid_bytes)),
            (5, bytearray(b"\xff\xd8\xff compressed jpeg-ish")),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in
           extract_decoded_features(media).collect()}
    assert got[1]["kind"] == "audio"
    assert got[1]["duration_s"] == pytest.approx(0.05, abs=1e-9)
    srm = samples / 32767.0
    assert got[1]["rms"] == pytest.approx(
        float(np.sqrt(np.mean(srm * srm))), rel=1e-9
    )
    assert got[2]["kind"] == "image" and got[2]["width"] == 5
    assert got[2]["mean_lum"] == pytest.approx(float(px.mean()), rel=1e-9)
    assert got[3]["mean_lum"] == got[2]["mean_lum"]  # BMP == PPM pixels
    assert got[4]["kind"] == "video" and got[4]["n_frames"] == 5
    assert got[5]["kind"] == "undecodable" and got[5]["rms"] is None

    thumbs = sample_video_frames(media, every_k=2, thumb=(2, 2)).collect()
    assert [r["frame_idx"] for r in thumbs] == [0, 2, 4]
    want = resize_nearest(frames[2][1], 2, 2).tobytes()
    assert bytes(thumbs[1]["thumb_rgb"]) == want


def test_media_poison_payloads_degrade(spark):
    """Corrupt payloads whose magic bytes match a supported format
    (truncated P6/BMP, junk RIFF), zero-frame video containers, and
    8-bit WAV silence must degrade gracefully — a poison row can
    never kill the batch job."""
    import io
    import wave

    from efficient_query_expansion_spark.operators.multimodal import (
        extract_decoded_features,
        sample_video_frames,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)           # 8-bit PCM is UNSIGNED, 0x80 zero
        w.setframerate(8000)
        w.writeframes(b"\x80" * 100)  # digital silence
    rows = [
        (1, bytearray(b"RIFF0000WAVEjunk not a real wave file")),
        (2, bytearray(b"P6\n5 5\n255\n" + b"\x01" * 10)),  # truncated
        (3, bytearray(b"BM" + b"\x00" * 10)),              # truncated
        (4, bytearray(b"PPMVID\x00\x00")),                 # 0 frames
        (5, bytearray(buf.getvalue())),                    # 8-bit WAV
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           extract_decoded_features(media).collect()}
    assert got[1]["kind"] == "undecodable"
    assert got[2]["kind"] == "undecodable"
    assert got[3]["kind"] == "undecodable"
    assert got[4]["kind"] == "video" and got[4]["n_frames"] == 0
    assert got[5]["kind"] == "audio"
    assert got[5]["rms"] == pytest.approx(0.0, abs=1e-9)  # silence
    # frame sampling likewise skips poison rows instead of failing
    assert sample_video_frames(media).count() == 0


def test_duplicate_clusters_raises_when_unconverged(spark):
    """An edge set still contracting at max_iterations must raise
    (silent mis-clustering would keep several survivors of one
    duplicate family); enough rounds converge it."""
    from efficient_query_expansion_spark.operators.dedup import (
        duplicate_clusters,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="did not converge"):
        duplicate_clusters(chain, max_iterations=1)
    ok = {r["cluster_id"] for r in
          duplicate_clusters(chain, max_iterations=30).collect()}
    assert ok == {0}


def test_duplicate_clusters_star_contraction_is_logarithmic(spark):
    """The round-4 star-contraction rewrite: a 100-node chain
    (diameter 99 — the pathological case for min-label propagation,
    which needed 100 rounds) converges in ≤ 7 large/small-star
    rounds, and labels are exactly component minima."""
    from efficient_query_expansion_spark.operators.dedup import (
        duplicate_clusters,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a long, id_b long"
    )
    stats: dict = {}
    got = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(chain, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(100)}
    # ≤ 7 contraction rounds + exactly 1 signature-confirming round
    assert stats["rounds"] <= 8, stats


def test_optional_codec_hooks_declared_when_libs_absent():
    """JPEG/PNG and FLAC/OGG magic route to the library-backed hooks;
    without Pillow/soundfile they must raise NotImplementedError
    naming the missing library (and degrade to 'undecodable'
    downstream, covered by the poison test). Where a library IS
    installed the same truncated payloads raise that library's own
    decode error instead — the round-trip tests below cover those
    environments, so this one only asserts the absent-library
    contract."""
    import importlib.util

    from efficient_query_expansion_spark.operators.multimodal import (
        decode_media,
    )

    cases = [
        (b"\xff\xd8\xff\xe0" + b"x" * 16, "PIL", "Pillow"),
        (b"\x89PNG\r\n\x1a\n" + b"x" * 16, "PIL", "Pillow"),
        (b"fLaC" + b"x" * 16, "soundfile", "soundfile"),
    ]
    ran = 0
    for payload, module, lib in cases:
        if importlib.util.find_spec(module) is not None:
            continue  # library present: round-trip tests cover it
        with pytest.raises(NotImplementedError, match=lib):
            decode_media(payload, "image")
        ran += 1
    if ran == 0:
        pytest.skip("Pillow and soundfile both installed")


def test_pillow_decode_when_importable(spark):
    """Executes only where Pillow exists (cluster images): a PNG
    payload decodes to exact pixels through the same decode_media
    hook the stdlib formats use."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    from efficient_query_expansion_spark.operators.multimodal import (
        decode_media,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    out = decode_media(buf.getvalue(), "image")
    assert out["kind"] == "image"
    assert np.array_equal(out["pixels"], px)


def test_soundfile_decode_when_importable(spark):
    """Executes only where soundfile exists: a FLAC payload decodes
    losslessly through the decode_media hook."""
    sf = pytest.importorskip("soundfile")
    import io

    import numpy as np

    from efficient_query_expansion_spark.operators.multimodal import (
        decode_media,
    )

    t = np.arange(800) / 8000.0
    samples = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    buf = io.BytesIO()
    sf.write(buf, samples, 8000, format="FLAC")
    out = decode_media(buf.getvalue(), "audio")
    assert out["kind"] == "audio" and out["rate"] == 8000
    assert np.allclose(out["samples"], samples, atol=1e-4)
