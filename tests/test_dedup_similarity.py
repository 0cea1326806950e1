"""Semantic tests for the non-SQL-expressible operators: the LSH
families must agree with their exact counterparts (recall), and the
multimodal plumbing must produce the documented shapes.
"""

from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
    load_table,
)

from conftest import SF_SMOKE


def _near_dup_docs(spark):
    """Docs with planted near-duplicates: pairs (10*i, 10*i+1) share
    ~90% of tokens."""
    base = "the quick brown fox jumps over the lazy dog again and again token%d word%d filler%d"
    rows = []
    for i in range(30):
        text = base % (i, i, i) + " " + " ".join(f"w{i}_{j}" for j in range(20))
        rows.append((10 * i, text))
        # near-dup: change one trailing token
        rows.append((10 * i + 1, text[:-4] + "ZZZ"))
        # unrelated doc
        rows.append((10 * i + 2, " ".join(f"u{i}_{j}" for j in range(25))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_dups(spark):
    docs = _near_dup_docs(spark)
    found = dedup.minhash_near_dups(docs, threshold=0.5)
    pairs = {(r.doc_a, r.doc_b) for r in found.collect()}
    planted = {(10 * i, 10 * i + 1) for i in range(30)}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall too low: {recall} ({len(pairs)} pairs found)"
    # verify step guarantees precision: every surviving pair really is similar
    for r in found.collect():
        assert r.jaccard >= 0.5


def test_minhash_jaccard_matches_exact(spark):
    """The jaccard emitted by the LSH pipeline equals the exact n-gram
    jaccard computed independently."""
    docs = _near_dup_docs(spark)
    cands = dedup.minhash_lsh_candidates(docs)
    via_pipeline = {
        (r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard(docs, cands).collect()
    }
    sets = {
        r.doc_id: set(r.sset)
        for r in docs.select(
            "doc_id", F.array_distinct(dedup.shingles("text", 3)).alias("sset")
        ).collect()
    }
    for (a, b), j in via_pipeline.items():
        sa, sb = sets[a], sets[b]
        exact = len(sa & sb) / len(sa | sb)
        assert abs(j - exact) < 1e-12


def test_simhash_near_dups(spark):
    docs = _near_dup_docs(spark)
    found = dedup.simhash_near_dups(docs, max_hamming=10)
    pairs = {(r.doc_a, r.doc_b) for r in found.collect()}
    planted = {(10 * i, 10 * i + 1) for i in range(30)}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.8, f"simhash recall too low: {recall}"


def test_simhash_mega_bucket_guard(spark):
    """A planted flood of identical documents (one mega-bucket) must be
    dropped from candidate generation when it exceeds max_bucket, so
    chunk collisions can't go quadratic on spam floods — while natural
    near-dup pairs outside the flood are still found."""
    docs = _near_dup_docs(spark)
    flood = spark.createDataFrame(
        [(1_000_000 + i, "spam spam spam wonderful spam " * 10) for i in range(40)],
        "doc_id long, text string",
    )
    corpus = docs.union(flood)
    planted = {(10 * i, 10 * i + 1) for i in range(30)}

    uncapped = dedup.simhash_near_dups(corpus, max_hamming=10, max_bucket=None)
    uncapped_pairs = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    flood_pairs_uncapped = {
        p for p in uncapped_pairs if p[0] >= 1_000_000 and p[1] >= 1_000_000
    }
    assert len(flood_pairs_uncapped) == 40 * 39 // 2  # quadratic without the cap

    capped = dedup.simhash_near_dups(corpus, max_hamming=10, max_bucket=30)
    capped_pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # the 40-member bucket is dropped entirely: bounded candidates
    assert not any(p[0] >= 1_000_000 and p[1] >= 1_000_000 for p in capped_pairs)
    # natural planted pairs are unaffected (their buckets are tiny)
    assert capped_pairs & planted == uncapped_pairs & planted


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    approx = similarity.ann_lsh_topk(emb, queries, k=10, n_planes=4)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # 4 planes → 16 buckets over 500 vecs: buckets of ~30; some overlap
    # with the true top-10 is guaranteed for clustered data
    assert len(approx_set) > 0
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.2, f"ANN recall suspiciously low: {recall}"


def test_quantized_topk_recall_and_exactness(spark):
    """int8 quantization at 64 dims should barely perturb the cosine
    ranking (scores move by ~1/127 relative), and the integer dot
    products must be exact — verified against a driver-side replay of
    the same round-half-up quantization."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    quant = similarity.quantized_topk(emb, queries, k=10)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    qrows = quant.collect()
    quant_set = {(r.query_id, r.neighbor_id) for r in qrows}
    recall = len(exact_set & quant_set) / len(exact_set)
    assert recall >= 0.9, f"quantized recall too low: {recall}"

    import math

    vecs = {
        r.vec_id: r.embedding
        for r in emb.filter(F.col("vec_id") < 20).collect()
    }

    def codes(v):
        s = max(max(abs(x) for x in v), 1e-30) / 127.0
        return [math.floor(x / s + 0.5) for x in v]

    checked = 0
    for r in qrows:
        if r.query_id in vecs and r.neighbor_id in vecs:
            qa, qb = codes(vecs[r.query_id]), codes(vecs[r.neighbor_id])
            assert r.qdot == sum(a * b for a, b in zip(qa, qb))
            checked += 1
    assert checked > 0  # planted near-dups guarantee some <20 pairs


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    approx = similarity.ivf_topk(emb, queries, k=10, n_clusters=8, n_probe=3)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 3/8 cells; nearest-cell locality should do much better
    # than the 37.5% random baseline
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_fixed_recall_and_probe_direction(spark):
    """Deterministic-cell IVF: query-directed probing (flip the
    closest planes first) must be meaningfully better than probing the
    query's own cell alone, and beat the random-scan baseline for the
    same scanned fraction (3/16 of the corpus)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=10).collect()
    }
    recalls = {}
    for n_probe in (1, 3):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_fixed_topk(
                emb, queries, k=10, n_planes=4, n_probe=n_probe
            ).collect()
        }
        recalls[n_probe] = len(exact & approx) / len(exact)
    assert recalls[3] >= 0.3, recalls  # > 3/16 random-scan baseline
    assert recalls[3] > recalls[1], recalls


def test_embedding_near_dups_self_consistent(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    dups = dedup.embedding_near_dups(emb, threshold=0.99)
    for r in dups.collect():
        assert r.cosine >= 0.99
        assert r.id_a < r.id_b


def test_embedding_near_dups_finds_planted(spark):
    """Planted exact + slightly-perturbed duplicate vectors must be
    found by the hyperplane-LSH prefilter + cosine verify (the natural
    synthetic corpus has no pairs above 0.52, so this is the real
    positive-path check)."""
    base = load_table(spark, SF_SMOKE, "embeddings").limit(20)
    from pyspark.sql import functions as F2

    exact_copy = base.select(
        (F2.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = base.union(exact_copy)
    dups = dedup.embedding_near_dups(corpus, threshold=0.999)
    pairs = {(r.id_a, r.id_b) for r in dups.collect()}
    planted = {(i, i + 100000) for i in range(20)}
    assert planted <= pairs, f"missed {planted - pairs}"


def test_char_ngram_minhash_finds_planted(spark):
    """Char-shingle mode: catches near-dups even with word-boundary
    edits (spaces removed)."""
    rows = []
    for i in range(20):
        base = f"the quick brown fox {i} jumps over the lazy dog " * 4
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base[:-6] + "CHANGED"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cands = dedup.minhash_lsh_candidates(docs, shingle_k=5, shingle_mode="char")
    pairs = {(r.doc_a, r.doc_b) for r in cands.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert len(pairs & planted) / len(planted) >= 0.9


def test_hll_estimate_accuracy(spark):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.aggregates import (
        hll_sketch_per_group,
        hll_union_estimate,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.select("user_id").distinct().count()
    sketches = hll_sketch_per_group(ev, "event_type", "user_id")
    est = hll_union_estimate(sketches).collect()[0].distinct_estimate
    assert abs(est - exact) / exact < 0.05, f"HLL est {est} vs exact {exact}"


def test_multimodal_features_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    mm = multimodal.as_binary_payload(docs)
    feats = multimodal.extract_features(mm).collect()
    assert len(feats) == 50
    for r in feats:
        assert r.n_bytes > 0
        assert len(r.feat) == 4
        assert r.feat[0] == float(r.n_bytes)
        assert r.format == "fake/raw"


def test_multimodal_decode_unsupported_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG")  # compressed: no codec here


def test_decode_image_ppm_planted():
    """PPM P6 decode: header with a comment line, exact pixel
    round-trip in row-major RGB order."""
    import numpy as np

    w, h = 3, 2
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    got = multimodal.decode_image(payload)
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, px)


def test_decode_image_bmp_planted():
    """24-bit BMP decode: bottom-up row order flipped, 4-byte row
    padding stripped, BGR reordered to RGB — byte-identical to the
    planted raster."""
    import numpy as np

    w, h = 3, 2  # stride = 12 (9 data + 3 pad)
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = ((w * 3 + 3) // 4) * 4
    raster = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR on disk
        raster += row + b"\x00" * (stride - len(row))
    data_off = 14 + 40
    header = (
        b"BM"
        + (data_off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive: bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 20
    )
    got = multimodal.decode_image(header + raster)
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, px)


def test_decode_image_stats_planted(spark):
    """decode_image_stats over a mixed batch: valid PPM decoded with
    exact integer channel sums, undecodable payload quarantined
    (dropped), null payload dropped."""
    import numpy as np

    w, h = 4, 2
    px = (np.arange(w * h * 3, dtype=np.uint8) * 3 % 251).reshape(h, w, 3)
    ppm = b"P6\n4 2\n255\n" + px.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"not an image")), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in multimodal.decode_image_stats(df).collect()}
    assert set(rows) == {1}
    r = rows[1]
    sums = px.reshape(-1, 3).sum(axis=0)
    assert (r.width, r.height, r.channels) == (w, h, 3)
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(s) for s in sums)


def test_decode_image_stats_truncated_header_quarantined(spark):
    """r8 ADVICE fix: a truncated PPM header (b'P6 3'), a '#' comment
    with no trailing newline, and a bare magic must all be QUARANTINED
    (dropped rows) — before the bounds guards the inlined scan loops
    spun forever past end-of-payload (b''[0:1].isspace() is False),
    hanging the executor task instead of dropping the payload."""
    import numpy as np
    import pytest

    px = (np.arange(2 * 2 * 3, dtype=np.uint8)).reshape(2, 2, 3)
    good = b"P6\n2 2\n255\n" + px.tobytes()
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"P6 3")),  # truncated mid-header
            (3, bytearray(b"P6\n2 2 # no newline after comment")),
            (4, bytearray(b"P6")),  # magic only
            (5, bytearray(b"P6\n2 2\n255\n" + px.tobytes()[:-5])),  # short raster
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id for r in multimodal.decode_image_stats(df).collect()}
    assert rows == {1}, "malformed payloads must drop, not hang or emit"
    # the top-level decoder raises (caller-visible contract), same inputs
    for bad in (b"P6 3", b"P6\n2 2 # no newline", b"P6"):
        with pytest.raises(ValueError):
            multimodal.decode_image(bad)


def test_frame_sample_counts(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    mm = multimodal.as_binary_payload(docs)
    frames = multimodal.frame_sample(mm, every_n_bytes=100)
    got = {r.doc_id: 0 for r in frames.collect()}
    for r in frames.collect():
        got[r.doc_id] += 1
    meta = {r.doc_id: r.n_bytes for r in mm.select("doc_id", "meta.n_bytes").collect()}
    for doc_id, n in got.items():
        expected = -(-meta[doc_id] // 100)
        assert n == expected


def test_audio_frame_energy_planted_payload(spark):
    """audio_frame_energy on a hand-built payload: exact integer
    energies Σ(byte−128)², frame boundaries at frame_bytes, short tail
    frame, empty payload emits nothing."""
    docs = spark.createDataFrame(
        [
            (1, "A" * 4 + "B" * 4),  # one 8-byte frame at frame_bytes=8
            (2, "z" * 10),  # frame of 8 + tail frame of 2
            (3, ""),  # empty: no rows
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    mm = multimodal.as_binary_payload(docs)
    rows = {
        (r.doc_id, r.frame_id): (r.n_samples, r.energy)
        for r in multimodal.audio_frame_energy(mm, frame_bytes=8).collect()
    }
    e_a, e_b, e_z = (65 - 128) ** 2, (66 - 128) ** 2, (122 - 128) ** 2
    assert rows == {
        (1, 0): (8, 4 * e_a + 4 * e_b),
        (2, 0): (8, 8 * e_z),
        (2, 1): (2, 2 * e_z),
    }


def test_resize_nearest_planted_payload(spark):
    """resize_nearest on hand-built rasters: exact nearest-neighbor
    pixel selection (floor index math), ragged tail dropped,
    upsampling repeats source rows, sub-row payloads emit nothing, and
    the positional checksum Σ byte(p)·((p mod 97)+1) is exact."""
    docs = spark.createDataFrame(
        [
            (1, "ABCDWXYZ"),  # 2x4 raster -> 2x2 = [[A,C],[W,Y]]
            (2, "ABCDWXYZ!?"),  # 10 bytes: ragged 2-byte tail dropped
            (3, "MNOP"),  # h=1 upsampled to 2 rows: [[M,O],[M,O]]
            (4, "abc"),  # shorter than one row: no output
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    mm = multimodal.as_binary_payload(docs)
    out = {
        r.doc_id: (r.out_h, r.out_w, r.checksum, bytes(r.resized))
        for r in multimodal.resize_nearest(
            mm, src_width=4, out_h=2, out_w=2
        ).collect()
    }

    def ck(px):
        return sum(b * ((p % 97) + 1) for p, b in enumerate(px))

    assert out == {
        1: (2, 2, ck(b"ACWY"), b"ACWY"),
        2: (2, 2, ck(b"ACWY"), b"ACWY"),
        3: (2, 2, ck(b"MOMO"), b"MOMO"),
    }


def test_connected_components_multi_hop_chain(spark):
    """Min-label propagation must handle MULTI-HOP components: a
    10-node chain (diameter 9) plus a separate triangle and an isolated
    pair must each collapse to their minimum id within max_iter ≥
    diameter."""
    chain = [(i, i + 1) for i in range(100, 109)]  # 100-...-109
    triangle = [(200, 201), (201, 202), (200, 202)]
    pair = [(300, 301)]
    pairs = spark.createDataFrame(
        chain + triangle + pair, "doc_a long, doc_b long"
    )
    got = {
        r.node: r.cluster
        for r in dedup.connected_components(pairs, max_iter=9).collect()
    }
    assert got == {
        **{n: 100 for n in range(100, 110)},
        **{n: 200 for n in (200, 201, 202)},
        **{n: 300 for n in (300, 301)},
    }
    # insufficient iterations must NOT silently look converged for the
    # far end of the chain
    shallow = {
        r.node: r.cluster
        for r in dedup.connected_components(pairs, max_iter=2).collect()
    }
    assert shallow[109] != 100


def test_connected_components_frees_checkpoint_blocks(spark):
    """Checkpoint blocks are non-evictable and invisible to
    clearCache(): the operator must free every superseded frontier
    itself, leaving at most ONE extra cached RDD (the final labels) —
    measured leaking ~10 block sets per call otherwise, degrading
    later queries in the same session."""
    sc = spark.sparkContext._jsc.sc()
    before = len(sc.getRDDStorageInfo())
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 2)], "doc_a long, doc_b long"
    )
    dedup.connected_components(pairs, max_iter=6).collect()
    after = len(sc.getRDDStorageInfo())
    assert after <= before + 1, (before, after)


def test_fuzzy_block_guard_drops_mega_blocks(spark):
    """A planted mega-block (>1000 docs sharing (lang, first token))
    must be excluded from the pair join — one skewed block key can't go
    quadratic — while small blocks still match."""
    import pyspark.sql.functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )
    import tempfile

    big = spark.range(1200).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("megablock common prefix text nr "), F.col("id").cast("string")).alias("text"),
        F.lit("srcX").alias("source"),
        F.length(F.concat(F.lit("megablock common prefix text nr "), F.col("id").cast("string"))).alias("n_chars"),
    )
    small = spark.range(1200, 1203).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("tinyblock shared prefix body nr "), (F.col("id") % 2).cast("string")).alias("text"),
        F.lit("srcY").alias("source"),
        F.length(F.lit("x")).alias("n_chars"),
    )
    with tempfile.TemporaryDirectory() as td:
        big.unionByName(small).write.parquet(f"{td}/documents.parquet")
        fn, _ = REGISTRY["fuzzy_prefix_pairs"]
        rows = fn(spark, td).collect()
    ids = {r.doc_a for r in rows} | {r.doc_b for r in rows}
    assert ids, "small block should still produce pairs"
    assert all(i >= 1200 for i in ids), f"mega-block leaked into pairs: {sorted(ids)[:5]}"


def test_winnowing_guarantee_planted_span(spark):
    """The winnowing guarantee (Schleimer et al. SIGMOD'03): any shared
    span of >= w+k-1 tokens (4+5-1 = 8 here) MUST yield at least one
    shared fingerprint. Plant a 12-token span inside two otherwise
    disjoint documents and a third unrelated document; the pair must
    share a fingerprint, the loner must share none."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            (1, f"one unique lead tokens here {shared} tail one ending"),
            (2, f"two other prefix words now {shared} different two close"),
            (3, "entirely unrelated text with nothing in common at all "
                "padded further so winnowing has windows to pick from"),
        ],
        "doc_id bigint, text string",
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 5
    )
    idx = F.sequence(F.lit(0), F.least(F.lit(399), (F.size("w") - 5).cast("int")))
    grams = toks.select("doc_id", F.explode(idx).alias("i"), "w").select(
        "doc_id",
        "i",
        F.conv(
            F.substring(
                F.md5(F.array_join(F.slice("w", F.col("i") + 1, 5), " ")), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    fps = (
        grams.select(
            "doc_id",
            F.min("h").over(win).alias("fp"),
            F.count("h").over(win).alias("wlen"),
        )
        .filter(F.col("wlen") == 4)
        .select("doc_id", "fp")
        .distinct()
    )
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
    }
    assert by_doc[1] & by_doc[2], "planted 12-token span must share a fingerprint"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))


def test_registry_ivf_topk_recall_bound(spark):
    """The REGISTRY query `ann_ivf_topk` emits its recall gate as a
    CERTIFICATE row (r9 semi-oracle: the IVF top-k is joined against
    the exact brute-force top-k inside the query and the output is
    (n_queries, mean_recall ≥ 0.8 flag), oracle-predictable constants).
    This pins the certificate at two SFs AND independently recomputes
    the recall from the operators, so a broken certificate join can't
    silently report 1. Measured mean recall 0.89 here (0.94 at sf0.01)
    — deterministic given the seeded KMeans."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
    )
    import pyspark.sql.functions as F

    cert = REGISTRY["ann_ivf_topk"][0](spark, SF_SMOKE).collect()
    assert len(cert) == 1
    assert cert[0].n_queries == 5
    assert cert[0].mean_recall_ge_080 == 1

    # independent recomputation straight from the operators
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=10, n_probe=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"registry IVF recall {recall} below bound"


def test_minhash_mega_bucket_guard(spark):
    """A planted flood of identical documents gives every band bucket
    the full flood membership (identical signatures collide in ALL
    bands); with max_bucket set the flooded buckets are dropped so the
    band self-join can't go quadratic, while pairs outside the flood
    are untouched. The gate is a count + broadcast-ANTI-join on the
    flooded buckets (_drop_mega_buckets) — asserted below: a broadcast
    LeftAnti in the executed plan, no window (the count-window form
    sorted the whole banded table: +36% measured), no cartesian."""
    import re

    docs = _near_dup_docs(spark)
    flood = spark.createDataFrame(
        [(1_000_000 + i, "spam spam spam wonderful spam " * 10) for i in range(40)],
        "doc_id long, text string",
    )
    corpus = docs.union(flood)
    planted = {(10 * i, 10 * i + 1) for i in range(30)}
    unc = dedup.minhash_lsh_candidates(corpus, max_bucket=None)
    cap = dedup.minhash_lsh_candidates(corpus, max_bucket=30)
    up = {(r.doc_a, r.doc_b) for r in unc.collect()}
    cp = {(r.doc_a, r.doc_b) for r in cap.collect()}
    assert sum(1 for p in up if p[0] >= 1_000_000) == 40 * 39 // 2
    assert not any(p[0] >= 1_000_000 for p in cp)  # flood gone
    # natural planted pairs are unaffected (their buckets are tiny)
    assert cp & planted == up & planted
    assert len(cp & planted) >= 27  # ≥0.9 recall preserved under the cap
    final = (
        cap._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
    )
    assert "Cartesian" not in final
    assert re.search(r"BroadcastHashJoin.*LeftAnti", final), final
    assert "windowspecdefinition" not in final
    spark.catalog.clearCache()


def test_embedding_mega_bucket_guard(spark):
    """Same guard on the hyperplane-LSH (table, bucket) cells: a flood
    of identical embeddings lands in one cell per table and must be
    dropped from candidate generation when it exceeds max_bucket."""
    emb_rows = [
        (i, [float((i * 7 + d) % 13) - 6.0 for d in range(16)]) for i in range(100)
    ]
    emb_rows += [(1_000_000 + i, [1.0] * 16) for i in range(40)]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    unc = dedup.embedding_near_dups(
        emb, threshold=0.999, n_planes=4, n_tables=2, max_bucket=None
    )
    cap = dedup.embedding_near_dups(
        emb, threshold=0.999, n_planes=4, n_tables=2, max_bucket=30
    )
    ue = {(r.id_a, r.id_b) for r in unc.collect()}
    ce = {(r.id_a, r.id_b) for r in cap.collect()}
    assert sum(1 for p in ue if p[0] >= 1_000_000) == 40 * 39 // 2
    assert not any(p[0] >= 1_000_000 for p in ce)
    assert ce == {p for p in ue if p[0] < 1_000_000}
    spark.catalog.clearCache()


def test_connected_components_long_chain_early_stop(spark):
    """A planted path graph of diameter 15 (far beyond the default
    max_iter=6): with a generous iteration cap, early_stop must end the
    loop at the FIXPOINT — one confirmation round after the 15 rounds
    min-label propagation needs — not at the cap, and every node must
    carry the true component minimum. Certifies the early-stop
    detection is a real fixpoint test on deep graphs, not something
    only exercised on the shallow quasi-clique graphs dedup produces."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a long, doc_b long"
    )
    stats = {}
    labels = {
        r.node: r.cluster
        for r in dedup.connected_components(
            chain, max_iter=30, early_stop=True, stats=stats
        ).collect()
    }
    assert labels == {i: 0 for i in range(16)}
    assert stats["converged"], stats
    # 15 propagation rounds + 1 unchanged-sum confirmation, never the cap
    assert stats["iterations"] <= 16, stats


def test_pointer_jumping_log_rounds_on_deep_path(spark):
    """connected_components_jump must converge in O(log diameter)
    rounds: a 64-edge path (diameter 64 — plain propagation would need
    64 rounds) converges to the all-zero component in ≤ 9 rounds
    including the fixpoint confirmation, with exact labels."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
    )
    stats = {}
    labels = {
        r.node: r.cluster
        for r in dedup.connected_components_jump(
            chain, max_iter=20, stats=stats
        ).collect()
    }
    assert labels == {i: 0 for i in range(65)}
    assert stats["converged"], stats
    assert stats["iterations"] <= 9, stats
    spark.catalog.clearCache()


def test_pointer_jumping_matches_plain_on_quasi_cliques(spark):
    """On the shallow graphs dedup actually produces, both variants
    assign identical clusters."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    a = {
        (r.node, r.cluster)
        for r in dedup.connected_components(pairs, max_iter=8).collect()
    }
    b = {
        (r.node, r.cluster)
        for r in dedup.connected_components_jump(pairs).collect()
    }
    assert a == b
    spark.catalog.clearCache()


def test_simhash_packed_lanes_equal_plain(spark):
    """The packed-lane signature (16 sums) must be bit-identical to the
    plain 64-sum form on real documents — the lane encoding is an
    implementation detail, never a semantic one."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    a = {
        r["_id"]: r["sh"]
        for r in dedup.simhash_agg(docs, "doc_id", "text", packed=True).collect()
    }
    b = {
        r["_id"]: r["sh"]
        for r in dedup.simhash_agg(docs, "doc_id", "text", packed=False).collect()
    }
    assert a == b and len(a) == docs.count()


def test_prefix_filter_equals_exact_all_pairs(spark):
    """The prefix-filtered join is LOSSLESS: on the planted corpus its
    output must equal brute-force all-pairs Jaccard >= t exactly —
    both membership AND values (soundness from the verify step,
    completeness from the prefix theorem)."""
    docs = _near_dup_docs(spark)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.prefix_filter_near_dups(docs, threshold=0.5).collect()
    }
    # exact reference: cross join on the tiny planted corpus
    sets_df = docs.select(
        "doc_id", F.array_distinct(dedup.shingles("text", 3)).alias("s")
    )
    a = sets_df.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sets_df.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    exact = {
        (r.doc_a, r.doc_b): r.j
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / (F.size("sa") + F.size("sb") - inter)).alias("j"),
        )
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    assert got == exact
    assert len(exact) >= 30  # the planted pairs are all above threshold


def test_sparse_cosine_finds_planted_and_caps_df(spark):
    """Planted near-dups must score high; a shingle flooded past the
    df cap must contribute NOTHING (postings for it are dropped before
    the join, so a corpus-wide boilerplate shingle cannot fan out
    df^2 pairs)."""
    docs = _near_dup_docs(spark)
    out = {(r.doc_a, r.doc_b): r.cosine for r in
           dedup.sparse_cosine_pairs(docs, threshold=0.3).collect()}
    planted = {(10 * i, 10 * i + 1) for i in range(30)}
    hit = sum(1 for p in planted if p in out)
    assert hit == 30, f"planted recall {hit}/30"
    for v in out.values():
        assert v <= 1.0000001
    # flood: every doc shares one boilerplate shingle; with df_cap
    # below the corpus size the flooded shingle is pruned and the
    # unrelated docs still produce no pairs
    flooded = docs.withColumn("text", F.concat(F.lit("AA BB CC "), "text"))
    out2 = dedup.sparse_cosine_pairs(flooded, threshold=0.3, df_cap=50)
    pairs2 = {(r.doc_a, r.doc_b) for r in out2.collect()}
    unrelated = {p for p in pairs2 if p not in planted}
    assert not unrelated, f"boilerplate shingle created cross-pairs: {list(unrelated)[:5]}"


def test_systematic_pps_exact_k_and_proportionality(spark):
    """Exactly k picks, always (the grid construction guarantees it);
    heavy rows get proportionally more multiplicity."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.sampling import (
        systematic_pps_sample,
    )

    rows = [(i, 10 if i % 50 else 5000) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    for k in (7, 40, 173):
        out = systematic_pps_sample(df, "n_chars", k).collect()
        assert sum(r.n_picks for r in out) == k, f"k={k}"
    # proportionality: the 10 heavy rows hold 5000*10/(5000*10+490*10)
    # ≈ 91% of the mass → at k=40 they must take the large majority
    out = systematic_pps_sample(df, "n_chars", 40).collect()
    heavy = sum(r.n_picks for r in out if r.weight == 5000)
    assert heavy >= 30, f"heavy rows got {heavy}/40 picks"
    spark.catalog.clearCache()


def test_incremental_near_dup_finds_cross_pairs_only(spark):
    """Batch docs near-duplicating CORPUS docs are found; batch-batch
    and corpus-corpus near-dups are NOT reported (the incremental
    contract: the batch is checked against the index, not itself)."""
    corpus_rows, batch_rows = [], []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa t%d u%d v%d"
    for i in range(20):
        text = base % (i, i, i) + " " + " ".join(f"c{i}_{j}" for j in range(15))
        corpus_rows.append((i, text))
        if i % 2 == 0:
            # batch near-dup of corpus doc i
            batch_rows.append((1000 + i, text[:-4] + "ZZZ"))
    # batch-batch near-dup pair that must NOT be reported
    t = "omega psi chi phi upsilon tau sigma rho pi omicron " + " ".join(
        f"b{j}" for j in range(15)
    )
    batch_rows += [(2000, t), (2001, t[:-4] + "YYY")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    got = {(r.batch_id, r.corpus_id) for r in
           dedup.incremental_near_dup(corpus, batch).collect()}
    expected = {(1000 + i, i) for i in range(0, 20, 2)}
    assert got == expected, got
    spark.catalog.clearCache()


def test_incremental_near_dup_precomputed_index_roundtrip(spark, tmp_path):
    """The build-once-probe-many path: lsh_band_table written to
    parquet and read back must give IDENTICAL results to the inline
    build — certifying the band table is a storable index (stable
    across write/read, no session-dependent state)."""
    corpus_rows, batch_rows = [], []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa t%d u%d v%d"
    for i in range(20):
        text = base % (i, i, i) + " " + " ".join(f"c{i}_{j}" for j in range(15))
        corpus_rows.append((i, text))
        if i % 3 == 0:
            batch_rows.append((1000 + i, text[:-4] + "ZZZ"))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    inline = {(r.batch_id, r.corpus_id, round(r.jaccard, 12)) for r in
              dedup.incremental_near_dup(corpus, batch).collect()}

    idx_path = str(tmp_path / "band_index")
    dedup.lsh_band_table(corpus).write.parquet(idx_path)
    stored = spark.read.parquet(idx_path)
    via_index = {(r.batch_id, r.corpus_id, round(r.jaccard, 12)) for r in
                 dedup.incremental_near_dup(
                     corpus, batch, corpus_bands=stored
                 ).collect()}
    assert inline == via_index and len(inline) == 7
    spark.catalog.clearCache()


def test_triangle_counts_known_graph(spark):
    """Hand-verifiable graph: K4 on {1,2,3,4} (4 triangles, each node
    in 3), plus a pendant (4-5) and an isolated edge (6-7) that join
    no triangle, plus a hub (0) connected to 1..4 — the hub adds
    C(4,2)=6 wedge closures only where 1..4 are themselves adjacent
    (all 6 pairs in K4), so hub triangles = 6, and each K4 node gains
    3 hub triangles. Exercises orientation ties, hubs, pendants, and
    non-participating nodes."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        triangle_counts,
    )

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = k4 + [(4, 5), (6, 7)] + [(0, i) for i in (1, 2, 3, 4)]
    df = spark.createDataFrame(edges, "pa long, pb long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    # K4 alone: each of 1..4 in 3 triangles. Hub 0 closes every K4
    # edge into a triangle: +6 for the hub, +3 for each K4 node
    # (the 3 K4 edges it sits on, each closed by 0).
    assert got == {0: 6, 1: 6, 2: 6, 3: 6, 4: 6}, got
    spark.catalog.clearCache()


def test_k_core_peels_to_dense_structure(spark):
    """K5 with a pendant path hanging off one vertex: the 3-core must
    be exactly the K5 edges (the path peels away over multiple rounds
    — each round only exposes the next chain node, exercising the
    fixpoint loop, not just one pass); the 5-core is empty (K5 nodes
    have degree 4)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        k_core,
    )

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(4, 10), (10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(k5 + path, "pa long, pb long")
    stats = {}
    got = {(r.pa, r.pb) for r in k_core(df, 3, stats=stats).collect()}
    assert got == set(k5), got
    assert stats["converged"]
    assert stats["rounds"] >= 2  # the chain peels one node per round
    stats5 = {}
    assert k_core(df, 5, stats=stats5).count() == 0
    assert stats5["converged"]
    spark.catalog.clearCache()


def test_kcore_registry_query_converges_within_cap(spark):
    """The registered 18-core query's oracle equality relies on Spark
    converging within the oracle's fixed 10-round cap — assert it
    directly at the smallest fixture."""
    from pyspark.sql import functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        k_core,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
    )

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .filter(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    stats = {}
    out = k_core(e, 18, max_iter=10, stats=stats)
    assert out.count() > 0
    assert stats["converged"], stats
    assert stats["rounds"] <= 9, stats
    spark.catalog.clearCache()


def test_pagerank_integer_matches_python_replica(spark):
    """Fixed-point PageRank must equal a pure-Python integer replica
    of the recurrence EXACTLY (to the last digit) on an asymmetric
    graph — certifying the arithmetic contract (DIV-floor
    contributions, integer damping) independent of the SQL oracle."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        pagerank_integer,
    )

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (4, 0)]  # hub + triangle + pendant
    df = spark.createDataFrame(edges, "pa long, pb long")
    got = {r.node: r.r for r in pagerank_integer(df, iterations=10).collect()}

    S = 1_000_000_000_000
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    r = {n: S for n in adj}
    for _ in range(10):
        contrib = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            share = r[n] // len(nbrs)
            for m in nbrs:
                contrib[m] += share
        r = {n: (S * 15) // 100 + (85 * c) // 100 for n, c in contrib.items()}
    assert got == r, (got, r)
    # the hub must out-rank the pendant leaf
    assert got[0] > got[4]
    spark.catalog.clearCache()


def test_prefix_filter_non_binary_exact_threshold_lossless(spark):
    """ADVICE r4 regression: thresholds whose float product overshoots
    an integer (0.07*100 = 7.000000000000001 under IEEE 754) must not
    shorten the prefix — the join stays LOSSLESS at NON-binary-exact
    thresholds, equal to brute-force all-pairs Jaccard in membership
    and value."""
    docs = _near_dup_docs(spark)
    for t in (0.07, 0.3, 0.7):
        got = {
            (r.doc_a, r.doc_b): round(r.jaccard, 12)
            for r in dedup.prefix_filter_near_dups(docs, threshold=t).collect()
        }
        sets_df = docs.select(
            "doc_id", F.array_distinct(dedup.shingles("text", 3)).alias("s")
        )
        a = sets_df.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
        b = sets_df.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
        inter = F.size(F.array_intersect("sa", "sb"))
        exact = {
            (r.doc_a, r.doc_b): round(r.j, 12)
            for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                (inter.cast("double") / (F.size("sa") + F.size("sb") - inter)).alias(
                    "j"
                ),
            )
            .filter(F.col("j") >= t)
            .collect()
        }
        assert got == exact, f"t={t}: {len(got)} vs exact {len(exact)}"
    spark.catalog.clearCache()


def test_systematic_pps_rejects_nonpositive_weights(spark):
    """ADVICE r4 regression: a negative or zero weight breaks the
    monotone cumulative line (picks duplicated/lost) — the operator
    must fail loudly, not mis-sample silently; k<=0 is a ValueError."""
    import pytest as _pytest

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.sampling import (
        systematic_pps_sample,
    )

    bad = spark.createDataFrame(
        [(1, 10), (2, -3), (3, 7)], "doc_id long, n_chars long"
    )
    with _pytest.raises(Exception, match="non-positive"):
        systematic_pps_sample(bad, "n_chars", 3).collect()
    zeros = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, n_chars long")
    with _pytest.raises(Exception, match="non-positive"):
        systematic_pps_sample(zeros, "n_chars", 2).collect()
    with _pytest.raises(ValueError, match="k must be positive"):
        systematic_pps_sample(bad, "n_chars", 0)
    # positive weights still work end-to-end after the guard
    ok = spark.createDataFrame([(1, 10), (2, 30)], "doc_id long, n_chars long")
    out = systematic_pps_sample(ok, "n_chars", 4).collect()
    assert sum(r.n_picks for r in out) == 4
    spark.catalog.clearCache()


def test_pagerank_integer_overflow_guard(spark):
    """ADVICE r4 regression: damping_pct*|V|*scale >= 2^63 would wrap
    BIGINT silently (ANSI off) because a hub can receive ~|V|*scale of
    mass — the operator must refuse to run rather than emit wrong
    ranks."""
    import pytest as _pytest

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        pagerank_integer,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "pa long, pb long"
    )
    with _pytest.raises(ValueError, match="overflow"):
        pagerank_integer(edges, iterations=1, scale=2**62)
    # the default scale on the same graph is fine
    out = pagerank_integer(edges, iterations=2).collect()
    assert len(out) == 3
    spark.catalog.clearCache()


def test_max_dup_spans_planted_boundaries(spark):
    """ExactSubstr spans: a 30-token passage planted in two documents
    must come back with EXACT maximal boundaries in both (not clipped,
    not extended into the unique surroundings); a 25-token passage
    repeated twice WITHIN one document must be found twice; unique
    docs must produce nothing."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        max_dup_spans,
    )

    shared = " ".join(f"dup{j}" for j in range(30))
    inner = " ".join(f"rep{j}" for j in range(25))
    pre_a = " ".join(f"a{j}" for j in range(10))   # tokens 1..10
    post_a = " ".join(f"z{j}" for j in range(10))
    pre_b = " ".join(f"b{j}" for j in range(5))    # tokens 1..5
    mid_c = " ".join(f"c{j}" for j in range(12))
    rows = [
        (1, f"{pre_a} {shared} {post_a}"),          # span at 11..40
        (2, f"{pre_b} {shared}"),                   # span at 6..35
        (3, f"{inner} {mid_c} {inner}"),            # spans 1..25, 38..62
        (4, " ".join(f"u{j}" for j in range(60))),  # unique: no spans
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.start_tok, r.end_tok, r.span_len)
        for r in max_dup_spans(docs, seed_k=8, min_len=20).collect()
    }
    assert got == {
        (1, 11, 40, 30),
        (2, 6, 35, 30),
        (3, 1, 25, 25),
        (3, 38, 62, 25),
    }, got
    # raising min_len past the inner plant filters it but keeps the
    # 30-token cross-document span
    got28 = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in max_dup_spans(docs, seed_k=8, min_len=28).collect()
    }
    assert got28 == {(1, 11, 40), (2, 6, 35)}, got28
    spark.catalog.clearCache()


def test_boilerplate_strip_matches_python_replay(spark):
    """Full Python replication of the boilerplate strip (chunk →
    cross-doc frequency ≥3 → strip → reassemble): every doc's chunk
    counts, clean digest and clean length must match exactly. The
    planted license header must be stripped from every planted doc,
    and natural cross-doc repeats (the corpus contains planted
    duplicate docs) are stripped identically by both replays."""
    import hashlib
    from collections import defaultdict

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.olap import (
        _BOILER_CHUNK,
        _BOILER_LICENSE,
        _BOILER_MIN_DOCS,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.001"
    out = {
        r.doc_id: r
        for r in REGISTRY["boilerplate_strip_rewrite"][0](spark, sf).collect()
    }
    orig = {
        r.doc_id: r.text
        for r in load_table(spark, sf, "documents")
        .filter(F.length("text") > 0)
        .collect()
    }
    # replay
    chunks: dict = {}
    docs_per_chunk = defaultdict(set)
    for doc_id, text in orig.items():
        t = (_BOILER_LICENSE + " " + text) if doc_id % 4 == 1 else text
        ws = t.split(" ")
        cs = [
            " ".join(ws[i * _BOILER_CHUNK : (i + 1) * _BOILER_CHUNK])
            for i in range(-(-len(ws) // _BOILER_CHUNK))
        ]
        chunks[doc_id] = cs
        for c in cs:
            docs_per_chunk[c].add(doc_id)
    boiler = {c for c, ds in docs_per_chunk.items() if len(ds) >= _BOILER_MIN_DOCS}
    assert set(out) == set(orig)
    lic_chunks = {
        " ".join(_BOILER_LICENSE.split(" ")[:10]),
        " ".join(_BOILER_LICENSE.split(" ")[10:]),
    }
    assert lic_chunks <= boiler  # the planted header IS detected
    for doc_id, cs in chunks.items():
        kept = [c for c in cs if c not in boiler]
        clean = " ".join(kept)
        r = out[doc_id]
        assert r.n_chunks == len(cs), doc_id
        assert r.n_kept == len(kept), doc_id
        assert r.clean_digest == hashlib.md5(clean.encode()).hexdigest(), doc_id
        assert r.clean_chars == len(clean), doc_id
        if doc_id % 4 == 1:  # header always stripped from planted docs
            assert r.n_kept <= r.n_chunks - 2, doc_id


def test_cluster_size_histogram_consistency(spark):
    """The histogram must be the exact rollup of the CC assignment:
    per-size cluster counts and doc mass agree with the assignment
    frame, and the singleton row accounts for every unclustered doc."""
    from collections import Counter

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    sf = SF_SMOKE
    hist = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in REGISTRY["dedup_cluster_size_histogram"][0](spark, sf).collect()
    }
    assign = REGISTRY["dedup_cluster_assignment"][0](spark, sf).collect()
    sizes = Counter(Counter(r.cluster for r in assign).values())
    n_docs_total = (
        load_table(spark, sf, "documents").count()
    )
    for sz, n_cl in sizes.items():
        assert hist[sz] == (n_cl, sz * n_cl), sz
    n_single = n_docs_total - len(assign)
    if n_single > 0:
        assert hist[1] == (n_single, n_single)
    assert sum(m for _, m in hist.values()) == n_docs_total
    assert all(sz >= 2 for sz in sizes)  # CC emits only matched nodes


def test_bfs_hops_chain_and_unreached(spark):
    """Hand-verifiable BFS: a 6-node chain 0-1-2-3-4-5 seeded at {0},
    max_hops=3 → hops 0..3 for nodes 0..3, nodes 4,5 absent
    (unreached within the cap); a disconnected pair (10,11) never
    appears. Multi-source: seeding {0, 5} makes the chain meet in the
    middle (node 3 keeps MIN hop = 2 from the 5-side, not 3)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        bfs_hops,
    )

    chain = [(i, i + 1) for i in range(5)] + [(10, 11)]
    e = spark.createDataFrame(chain, "pa long, pb long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    stats = {}
    seeds2 = spark.createDataFrame([(0,), (5,)], "node long")
    got2 = {
        r.node: r.hop
        for r in bfs_hops(e, seeds2, max_hops=3, stats=stats).collect()
    }
    assert got2 == {0: 0, 5: 0, 1: 1, 4: 1, 2: 2, 3: 2}
    # whole chain covered by hop 2 -> round 3's frontier is empty
    assert stats["rounds"] == 3


def test_label_propagation_two_cliques(spark):
    """Hand-verifiable LPA: two disjoint K4s each collapse to their
    min-label community within 4 rounds (round 1: every node adopts
    its min neighbor; round 2+: the min label saturates the clique),
    and a bridge-connected pendant adopts its only neighbor's label."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        label_propagation,
    )

    k4a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k4b = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    pend = [(4, 99)]
    e = spark.createDataFrame(k4a + k4b + pend, "pa long, pb long")
    got = {r.node: r.lab for r in label_propagation(e, rounds=4).collect()}
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (11, 12, 13, 14)} == {11}
    assert got[99] == got[4]


def test_bfs_hops_random_graph_invariants(spark):
    """BFS structural invariants on pseudo-random graphs (deterministic
    seed): (1) seeds are at hop 0; (2) every reached node at hop h > 0
    has a neighbor at hop h-1 (parent property); (3) no edge bridges a
    hop gap > 1 unless one endpoint sits at the hop cap (frontier
    cut-off); (4) unreached nodes have no reached neighbor below the
    cap. Together these pin MIN-hop semantics without an external
    graph library."""
    import random

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        bfs_hops,
    )

    rng = random.Random(42)
    for trial in range(3):
        n, m = 60, 120
        edges = set()
        while len(edges) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        seeds = sorted(rng.sample(range(n), 3))
        max_hops = 3
        e = spark.createDataFrame(sorted(edges), "pa long, pb long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
        hop = {r.node: r.hop for r in bfs_hops(e, sdf, max_hops).collect()}
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for s in seeds:
            if s in adj:  # operator only tracks seed rows it was given
                assert hop[s] == 0
        for node, h in hop.items():
            if h > 0:
                assert any(hop.get(nb) == h - 1 for nb in adj[node]), (
                    trial, node, h)
        for a, b in edges:
            ha, hb = hop.get(a), hop.get(b)
            if ha is not None and hb is not None:
                assert abs(ha - hb) <= 1 or max(ha, hb) == max_hops
            if ha is not None and hb is None:
                # an unreached neighbor implies a was on the last
                # frontier (else b would be reached at ha + 1)
                assert ha == max_hops, (trial, a, b, ha)


def test_lpa_partitioning_invariant(spark):
    """LPA output is a pure function of (graph, rounds): identical
    under adversarial repartitioning of the edge input, and every
    community label is a node of the graph."""
    import random

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        label_propagation,
    )

    rng = random.Random(7)
    edges = set()
    while len(edges) < 150:
        a, b = rng.randrange(80), rng.randrange(80)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    e = spark.createDataFrame(sorted(edges), "pa long, pb long")
    a = {(r.node, r.lab) for r in label_propagation(e, rounds=4).collect()}
    b = {
        (r.node, r.lab)
        for r in label_propagation(e.repartition(13), rounds=4).collect()
    }
    assert a == b
    nodes = {x for p in edges for x in p}
    assert {lab for _, lab in a} <= nodes


def test_symdelete_recall_hand_cases(spark):
    """Hand-verified ed<=1 semantics on adversarial shapes: deletion,
    insertion, substitution all found; transposition (ed 2) and double
    substitution correctly excluded despite sharing deletion variants."""
    # replicate the query's construction over a controlled name list
    names = spark.createDataFrame(
        [("abc",), ("abcd",), ("axc",), ("acb",), ("xyc",), ("zzz",)],
        "c_name string",
    )
    variants = names.select(
        "c_name",
        F.explode(
            F.expr(
                "concat(array(c_name), transform(sequence(1, length(c_name)),"
                " i -> concat(substring(c_name, 1, i - 1),"
                " substring(c_name, i + 1, length(c_name)))))"
            )
        ).alias("v"),
    )
    cand = (
        variants.alias("a")
        .join(
            variants.alias("b"),
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.c_name") < F.col("b.c_name")),
        )
        .select(F.col("a.c_name").alias("x"), F.col("b.c_name").alias("y"))
        .distinct()
        .filter(F.levenshtein("x", "y") <= 1)
    )
    got = {(r.x, r.y) for r in cand.collect()}
    assert ("abc", "abcd") in got  # insertion
    assert ("abc", "axc") in got   # substitution
    assert ("abc", "acb") not in got   # transposition = ed 2
    assert ("axc", "xyc") not in got   # double substitution = ed 2
    # exhaustively equal to brute force on this set
    brute = {
        (a, b)
        for a in ["abc", "abcd", "axc", "acb", "xyc", "zzz"]
        for b in ["abc", "abcd", "axc", "acb", "xyc", "zzz"]
        if a < b
    }
    def ed(s, t):
        dp = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, dp[0] = dp[0], i
            for j, ct in enumerate(t, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (cs != ct))
        return dp[-1]
    assert got == {(a, b) for a, b in brute if ed(a, b) <= 1}


def test_contrastive_triplets_invariants(spark):
    """Triplet semantics: positive shares the anchor's near-dup
    cluster, negatives never do, exactly <= 2 negatives per anchor,
    and anchors are exactly the multi-member cluster members."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        connected_components,
        minhash_near_dups,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    cl = {
        r.node: r.cluster
        for r in connected_components(
            minhash_near_dups(docs, threshold=0.5)
        ).collect()
    }
    fn, _ = REGISTRY["contrastive_triplets"]
    rows = fn(spark, SF_SMOKE).collect()
    assert rows
    per_anchor = {}
    for r in rows:
        assert cl[r.anchor_id] == cl[r.positive_id]
        assert r.positive_id != r.anchor_id
        assert cl.get(r.negative_id, r.negative_id) != cl[r.anchor_id]
        per_anchor.setdefault(r.anchor_id, []).append(r.rank)
    for a, ranks in per_anchor.items():
        assert sorted(ranks) in ([1], [1, 2])
    # every multi-member-cluster node is an anchor
    from collections import Counter

    sizes = Counter(cl.values())
    multi = {n for n, c in cl.items() if sizes[c] >= 2}
    assert set(per_anchor) == multi


def test_embedding_diversity_matches_bruteforce_pairwise(spark):
    """The norm-of-sum identity (‖Σu‖²−n)/(n(n−1)) with 2^30
    fixed-point coordinates must agree with the brute-force O(n²)
    pairwise mean cosine to well beyond the query's round-6 output
    precision."""
    np = __import__("numpy")
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    got = {
        r["label"]: (r["n"], r["avg_pairwise_cos"])
        for r in REGISTRY["embedding_diversity_by_label"][0](
            spark, SF_SMOKE
        ).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "label", "embedding"
    ).collect()
    by_label: dict = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64)
        )
    for lbl, vecs in by_label.items():
        u = np.stack(vecs)
        u = u / np.linalg.norm(u, axis=1, keepdims=True)
        n = len(u)
        if n < 2:
            assert lbl not in got or got[lbl][1] is None
            continue
        g = u @ u.T
        brute = (g.sum() - n) / (n * (n - 1))
        n_got, cos_got = got[lbl]
        assert n_got == n
        # fixed-point quantization: |err| <= d*2^-30*(2 + 2^-30*d/ ...)
        assert abs(cos_got - brute) < 1e-6, (lbl, cos_got, brute)


def test_kfold_assignment_balance_property(spark):
    """Stratification invariant: within every label the five fold
    counts differ by at most one and sum to the label size."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    rows = REGISTRY["kfold_assignment_balanced"][0](spark, SF_SMOKE).collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r["label"], {})[r["fold"]] = r["cnt"]
    sizes = {
        r["label"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per) == set(sizes)
    for lbl, folds in per.items():
        counts = [folds.get(f, 0) for f in range(5)]
        assert sum(counts) == sizes[lbl]
        nonzero_spread = max(counts) - min(counts)
        assert nonzero_spread <= 1, (lbl, counts)


def test_ivf_index_rebuild_on_corpus_change(spark):
    """Cache-invalidation certificate for the memoized IVF index: the
    cache key alone must not pin a stale index — a corpus that CHANGED
    under the same cache_key has a different fingerprint, forcing a
    rebuild, and the rebuilt index must surface a neighbor that only
    exists in the new corpus."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.similarity import (
        _IVF_INDEX_CACHE,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    key = "rebuild-cert"
    full_key = (key, 8, 42, 2)
    _IVF_INDEX_CACHE.pop(full_key, None)

    r1 = similarity.ivf_topk(
        emb, queries, k=5, n_clusters=8, n_probe=3, cache_key=key
    ).collect()
    assert full_key in _IVF_INDEX_CACHE
    fp1 = _IVF_INDEX_CACHE[full_key][2]

    # identical corpus, same key -> cache HIT (fingerprint unchanged,
    # same index object served)
    idx_obj = _IVF_INDEX_CACHE[full_key][1]
    similarity.ivf_topk(
        emb, queries, k=5, n_clusters=8, n_probe=3, cache_key=key
    ).collect()
    assert _IVF_INDEX_CACHE[full_key][1] is idx_obj

    # changed corpus under the SAME key: plant an exact duplicate of
    # the query vector with a fresh id -> fingerprint mismatch ->
    # rebuild; the planted twin must now rank first.
    planted = queries.select(
        F.lit(990_001).alias("vec_id"),
        F.col("query_vec").alias("embedding"),
    )
    emb2 = emb.unionByName(planted)
    r2 = similarity.ivf_topk(
        emb2, queries, k=5, n_clusters=8, n_probe=3, cache_key=key
    ).collect()
    fp2 = _IVF_INDEX_CACHE[full_key][2]
    assert fp2 != fp1
    assert {r.neighbor_id for r in r1} != set() and all(
        r.neighbor_id != 990_001 for r in r1
    )
    top = min(r2, key=lambda r: r.rank)
    assert top.neighbor_id == 990_001 and abs(top.cosine - 1.0) < 1e-9
    _IVF_INDEX_CACHE.pop(full_key, None)


def test_video_shot_boundaries_planted_payload(spark):
    """video_shot_boundaries on hand-built payloads: exact integer SAD
    per consecutive full-frame pair, boundary flag at SAD >
    frame_bytes·threshold, ragged tails excluded, single-frame and
    empty payloads emit nothing."""
    docs = spark.createDataFrame(
        [
            # frames of 4 at frame_bytes=4, threshold=10 (SAD > 40):
            # "AAAA"->"AAAA": sad 0, no cut; ->"ZZZZ": sad 4*25=100, cut
            (1, "AAAA" + "AAAA" + "ZZZZ"),
            # ragged tail "BB" excluded: only one pair (sad 4*1=4)
            (2, "AAAA" + "BBBB" + "BB"),
            (3, "AAAA"),  # single frame: no pairs
            (4, ""),  # empty: nothing
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    mm = multimodal.as_binary_payload(docs)
    rows = {
        (r.doc_id, r.frame_id): (r.sad, r.is_boundary)
        for r in multimodal.video_shot_boundaries(
            mm, frame_bytes=4, mad_threshold=10
        ).collect()
    }
    assert rows == {
        (1, 1): (0, 0),
        (1, 2): (4 * 25, 1),
        (2, 1): (4 * 1, 0),
    }


def test_dbscan_role_classification_hand_geometry(spark):
    """dbscan core/border/noise on a hand-built geometry (ε=1.0 in
    code units after the floor(x·1000) quantization, minPts=3):
    a 3-point mutual-ε triangle (all core), a satellite within ε of
    exactly ONE core point but with only 2 ε-neighbors counting
    itself (border), and a far point (noise). Exercises the border
    branch the planted-knot registry fixture can't reach (its knots
    are mutually within ε, so everything is core)."""
    from pyspark.sql import functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.stats_r10 import (
        q_dbscan_embeddings,  # noqa: F401 - role logic is inline below
    )

    # reuse the registered query's building blocks directly on a tiny
    # frame: replicate its pair/core/border/noise assembly with
    # eps2=1000000 (ε = 1000 units = 1.0) and minPts=3
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.5, 0.0]),
        (2, [0.25, 0.4]),      # 0,1,2 mutually within 1.0 → core
        (3, [1.45, 0.0]),      # within 1.0 of point 1 ONLY → border
        (4, [5.0, 5.0]),       # noise
    ]
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        connected_components,
    )

    q = spark.createDataFrame(
        pts, "vec_id bigint, v array<double>"
    ).select(
        "vec_id",
        F.expr(
            "transform(v, x -> CAST(floor(x * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    eps2, minpts = 1_000_000, 3
    a, b = q.alias("a"), q.alias("b")
    dist2 = F.expr(
        "aggregate(zip_with(a.qv, b.qv, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (s, d) -> s + d)"
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("b.vec_id") > F.col("a.vec_id"))
        .filter(dist2 <= eps2)
        .select(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
        )
    )
    nbr = pairs.select(
        F.col("ia").alias("p"), F.col("ib").alias("o")
    ).unionByName(
        pairs.select(F.col("ib").alias("p"), F.col("ia").alias("o"))
    )
    core = (
        nbr.groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") + 1 >= minpts)
        .select("p")
    )
    ce = pairs.join(core.select(F.col("p").alias("ia")), "ia").join(
        core.select(F.col("p").alias("ib")), "ib"
    )
    assign = connected_components(ce, a_col="ia", b_col="ib")
    border = (
        nbr.join(core, "p", "left_anti")
        .join(
            assign.select(
                F.col("node").alias("o"), F.col("cluster").alias("bc")
            ),
            "o",
        )
        .groupBy("p")
        .agg(F.min("bc").alias("bcluster"))
    )
    roles = {
        r.vec_id: (r.role, r.cluster)
        for r in q.select("vec_id")
        .join(
            assign.select(
                F.col("node").alias("vec_id"),
                F.col("cluster").alias("cc"),
            ),
            "vec_id",
            "left",
        )
        .join(
            border.select(F.col("p").alias("vec_id"), "bcluster"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.when(F.col("cc").isNotNull(), "core")
            .when(F.col("bcluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("cc", "bcluster", F.lit(-1)).alias("cluster"),
        )
        .collect()
    }
    assert roles[0] == ("core", 0)
    assert roles[1] == ("core", 0)
    assert roles[2] == ("core", 0)
    assert roles[3] == ("border", 0)
    assert roles[4] == ("noise", -1)


def test_semantic_dedup_dim_overflow_guard(spark):
    """ADVICE r10: the divisionless cosine compares 1e6*qdot^2 with
    qdot <= 127^2*dim, int64-safe only for dim <= 188 (exact:
    1e6*(127^2*189)^2 >= 2^63 > 1e6*(127^2*188)^2) — larger dims
    must raise instead of silently wrapping BIGINT (ANSI off)."""
    import pytest as _pytest

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        semantic_dedup,
    )

    wide = spark.createDataFrame(
        [(1, [1.0] * 189), (2, [1.0] * 189)],
        "vec_id long, v array<double>",
    )
    with _pytest.raises(ValueError, match="overflow"):
        semantic_dedup(wide)
    # dim 188 is the documented boundary and must still run
    ok = spark.createDataFrame(
        [(1, [1.0] * 188), (2, [1.0] * 188), (3, [-1.0] * 188)],
        "vec_id long, v array<double>",
    )
    out = {r.vec_id: r for r in semantic_dedup(ok).collect()}
    assert out[2].cluster == 1 and not out[2].kept  # exact twin merged
    assert out[3].kept  # opposite vector stays its own cluster
    spark.catalog.clearCache()


def test_hits_integer_bipartite_min_iterations_guard(spark):
    """ADVICE r10: iterations=1 used to crash with AttributeError
    (the previous-side frame is never assigned); the operator now
    raises a clear ValueError for iterations < 2."""
    import pytest as _pytest

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        hits_integer_bipartite,
    )

    edges = spark.createDataFrame([(1, 10), (2, 10)], "o long, p long")
    with _pytest.raises(ValueError, match="iterations >= 2"):
        hits_integer_bipartite(edges, iterations=1)
    out = hits_integer_bipartite(edges, iterations=2).collect()
    assert {r.side for r in out} == {"a", "h"}
    spark.catalog.clearCache()


def test_incremental_semantic_dedup_cross_batch(spark):
    """VERDICT r10 #5: build the corpus semantic_index ONCE, then probe
    two successive ingest batches against it — a planted near-dup of a
    corpus vector must flag with the right dup_of in whichever batch
    it arrives, decoys must keep, and the second batch must reuse the
    same (checkpointed) index without touching the corpus again."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        incremental_semantic_dedup,
        semantic_index,
    )

    import hashlib

    dim = 8

    def mk(seed):
        # pseudo-random unit-ish vectors: measured max pairwise corpus
        # cosine 0.849 < 0.9, so no accidental in-corpus near-dups
        return [
            (
                int.from_bytes(
                    hashlib.blake2b(
                        f"{seed}:{d}".encode(), digest_size=4
                    ).digest(),
                    "big",
                )
                % 2001
                - 1000
            )
            / 1000.0
            for d in range(dim)
        ]
    corpus = spark.createDataFrame(
        [(i, mk(i)) for i in range(1, 21)],
        "vec_id long, v array<double>",
    )
    # build once; localCheckpoint stands in for the persisted parquet
    # index — batches below never re-read the corpus
    index = semantic_index(corpus, n_planes=4).localCheckpoint()

    jit = lambda v: [v[0] + 1e-4] + v[1:]  # noqa: E731
    # decoys: fixed literals with measured max corpus cosine <= 0.832
    alt = [0.5, -0.5] * 4
    ramp = [(-1) ** d * (d + 1) / 10.0 for d in range(dim)]
    batch1 = spark.createDataFrame(
        [(101, jit(mk(7))), (102, alt)],
        "vec_id long, v array<double>",
    )
    out1 = {
        r.vec_id: r
        for r in incremental_semantic_dedup(index, batch1).collect()
    }
    assert out1[101].dup_of == 7 and not out1[101].kept
    assert out1[101].n_matches >= 1
    assert out1[102].dup_of is None and out1[102].kept

    # a LATER batch probes the SAME index (cross-batch reuse): a
    # near-dup of a different corpus vector still resolves
    batch2 = spark.createDataFrame(
        [(201, jit(mk(13))), (202, ramp)],
        "vec_id long, v array<double>",
    )
    out2 = {
        r.vec_id: r
        for r in incremental_semantic_dedup(index, batch2).collect()
    }
    assert out2[201].dup_of == 13 and not out2[201].kept
    assert out2[202].kept
    spark.catalog.clearCache()


def test_dedup_indexes_persist_partitioned_fresh_session(spark, tmp_path):
    """r11 VERDICT #4: the docstring promise "build once, write to
    parquet (partitioned by cell/band), probe forever" exercised
    end-to-end ON DISK: semantic_index written partitioned by `cell`
    and lsh_band_table partitioned by `band`, read back by a FRESH
    session (spark.newSession() — isolated session state/temp config;
    a second JVM is not constructible in the sandbox), and the
    incremental probes over the stored indexes must be byte-identical
    to the inline build. Catches session-dependent state in the index
    (nondeterministic hashing, lost types through the partitioned
    write — partition-column type inference turns `cell`/`band` back
    into ints, which the probes must tolerate)."""
    import hashlib

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        incremental_near_dup,
        incremental_semantic_dedup,
        lsh_band_table,
        semantic_index,
    )

    # --- lexical: corpus band index, partitioned by band ---
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa t%d u%d v%d"
    corpus_rows, batch_rows = [], []
    for i in range(20):
        text = base % (i, i, i) + " " + " ".join(f"c{i}_{j}" for j in range(15))
        corpus_rows.append((i, text))
        if i % 3 == 0:
            batch_rows.append((1000 + i, text[:-4] + "ZZZ"))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    inline_lex = {
        tuple(r) for r in incremental_near_dup(corpus, batch).collect()
    }

    band_path = str(tmp_path / "band_index")
    lsh_band_table(corpus).write.partitionBy("band").parquet(band_path)

    # --- semantic: corpus vector index, partitioned by cell ---
    dim = 8

    def mk(seed):
        return [
            (
                int.from_bytes(
                    hashlib.blake2b(
                        f"{seed}:{d}".encode(), digest_size=4
                    ).digest(),
                    "big",
                )
                % 2001
                - 1000
            )
            / 1000.0
            for d in range(dim)
        ]

    vcorpus = spark.createDataFrame(
        [(i, mk(i)) for i in range(1, 21)], "vec_id long, v array<double>"
    )
    jit = lambda v: [v[0] + 1e-4] + v[1:]  # noqa: E731
    vbatch = spark.createDataFrame(
        [(101, jit(mk(7))), (102, [0.5, -0.5] * 4)],
        "vec_id long, v array<double>",
    )
    inline_sem = {
        tuple(r)
        for r in incremental_semantic_dedup(
            semantic_index(vcorpus, n_planes=4), vbatch
        ).collect()
    }
    cell_path = str(tmp_path / "semantic_index")
    semantic_index(vcorpus, n_planes=4).write.partitionBy("cell").parquet(
        cell_path
    )

    # --- fresh session probes the stored indexes only ---
    s2 = spark.newSession()
    try:
        corpus2 = s2.createDataFrame(corpus_rows, "doc_id long, text string")
        batch2 = s2.createDataFrame(batch_rows, "doc_id long, text string")
        stored_bands = s2.read.parquet(band_path)
        via_disk_lex = {
            tuple(r)
            for r in incremental_near_dup(
                corpus2, batch2, corpus_bands=stored_bands
            ).collect()
        }
        assert via_disk_lex == inline_lex and len(inline_lex) == 7

        vbatch2 = s2.createDataFrame(
            [(101, jit(mk(7))), (102, [0.5, -0.5] * 4)],
            "vec_id long, v array<double>",
        )
        stored_index = s2.read.parquet(cell_path)
        via_disk_sem = {
            tuple(r)
            for r in incremental_semantic_dedup(
                stored_index, vbatch2
            ).collect()
        }
        assert via_disk_sem == inline_sem
        flags = {r[0]: (r[2], r[4]) for r in via_disk_sem}
        assert flags[101] == (7, False) and flags[102] == (None, True)
    finally:
        s2.catalog.clearCache()
    spark.catalog.clearCache()
