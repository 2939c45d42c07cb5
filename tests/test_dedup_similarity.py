"""Library operators: dedup family, similarity search, text functions,
multimodal image ops."""

import pytest
from pyspark.sql import functions as F

from weaver_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_phash_hamming,
    dedup_simhash,
)
from weaver_spark.operators.images import decode_meta, embed_stub, frame_sample, resize
from weaver_spark.operators.similarity import knn_bruteforce, knn_lsh, recall_at_k


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup of 1
        (4, "completely different text about spark shuffle partitions and joins etc"),
        (5, "another unrelated document discussing bloom filters and politeness"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_dedup_exact(docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs, "doc_id", "text").collect())
    assert kept == [1, 3, 4, 5]  # 2 collapsed into 1 (min id wins)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(docs, "doc_id", "text", num_hashes=16, bands=8).collect()
    }
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup collides in >=1 band
    assert (4, 5) not in pairs


def test_simhash_hamming(docs):
    sigs, pairs = dedup_simhash(docs, "doc_id", "text", bits=32, max_hamming=4)
    s = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert s[1] == s[2]  # identical text -> identical simhash
    p = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert p[(1, 2)] == 0
    assert (1, 3) in p and p[(1, 3)] <= 4


def test_ngram_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(
            docs, "doc_id", "text", shingle_n=2, threshold=0.5, max_df=None
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (4, 5) not in pairs


def test_phash_hamming_pairs(spark):
    from weaver_spark.codec import phash64
    from weaver_spark.webgen import gen_pixels
    import numpy as np

    px = gen_pixels("img_00000001")
    noisy = np.clip(px.astype(int) + 2, 0, 255).astype(np.uint8)
    other = gen_pixels("img_00000044")
    rows = [("a", phash64(px)), ("b", phash64(noisy)), ("c", phash64(other))]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup_phash_hamming(df, "image_id", max_hamming=8).collect()
    }
    assert ("a", "b") in pairs and pairs[("a", "b")] <= 8
    assert ("a", "c") not in pairs


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(9))
    # 3 well-separated clusters of 30 vectors each
    rows = []
    for c in range(3):
        center = rng.normal(size=16) * 10
        for i in range(30):
            v = center + rng.normal(size=16)
            rows.append((c * 30 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_bruteforce_clusters(vectors):
    queries = vectors.where(F.col("vec_id").isin(0, 30, 60))
    out = knn_bruteforce(vectors, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    for r in rows:
        assert r["neighbor_id"] // 30 == r["query_id"] // 30  # same cluster


def test_knn_lsh_recall(vectors):
    queries = vectors.where(F.col("vec_id") < 5)
    exact = knn_bruteforce(vectors, queries, k=5)
    approx = knn_lsh(vectors, queries, k=5, dim=16, n_planes=4, n_tables=4)
    r = recall_at_k(exact, approx, k=5)
    assert r >= 0.8  # clustered data, 4 tables: near-perfect recall


def test_knn_ivf_recall_and_cells(vectors):
    from weaver_spark.operators.similarity import knn_ivf

    # one codebook entry per cluster (ids 0/30/60) -> cells == clusters,
    # so even single-probe search recovers the exact neighbors
    centroids = vectors.where(F.col("vec_id").isin(0, 30, 60))
    queries = vectors.where(F.col("vec_id").isin(5, 35, 65))
    exact = knn_bruteforce(vectors, queries, k=5)
    approx = knn_ivf(vectors, queries, centroids, k=5, n_probe=1)
    assert recall_at_k(exact, approx, k=5) == 1.0
    # probed neighbors stay within the query's own cluster
    for r in approx.collect():
        assert r["neighbor_id"] // 30 == r["query_id"] // 30


def test_lang_id_and_quality(spark):
    from weaver_spark.functions.text import lang_id_col, quality_score_col, token_count_col

    rows = [
        (1, "the cat sat on the mat and it is warm in that house of ours"),
        (2, "der hund ist nicht in das haus und die katze ist da"),
        (3, "le chat est dans la maison et les oiseaux sont une famille"),
        (4, "el perro es de los gatos y una casa que es por alli"),
        (5, "xqz gkl pqr"),  # gibberish
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: (r["lang"], r["q"], r["n"])
        for r in df.select(
            "id",
            lang_id_col(F.col("text")).alias("lang"),
            quality_score_col(F.col("text")).alias("q"),
            token_count_col(F.col("text")).alias("n"),
        ).collect()
    }
    assert got[1][0] == "en"
    assert got[2][0] == "de"
    assert got[3][0] == "fr"
    assert got[4][0] == "es"
    assert got[5][0] == "unknown"
    assert got[1][1] > got[5][1]  # english prose scores above gibberish


def test_image_ops_roundtrip(spark):
    from weaver_spark.codec import decode_image, psnr
    from weaver_spark.webgen import gen_payload, gen_pixels

    rows = []
    for i in range(6):
        iid = f"img_{i:08d}"
        payload, w, h, fmt, ph = gen_payload(iid)
        rows.append((iid, payload))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    meta = {r["image_id"]: r for r in decode_meta(df).collect()}
    assert all(m["decode_ok"] for m in meta.values())
    for i in range(6):
        iid = f"img_{i:08d}"
        px = gen_pixels(iid)
        assert (meta[iid]["h"], meta[iid]["w"]) == px.shape[:2]
        assert meta[iid]["fmt"] == ("png" if i % 2 == 0 else "jpeg")

    rs = resize(df, 16, 16).collect()
    assert all(r["w"] == 16 and r["h"] == 16 for r in rs)
    for r in rs:
        assert decode_image(bytes(r["bytes"])).shape == (16, 16, 3)

    frames = frame_sample(df, k=4).collect()
    assert len(frames) == 24  # 6 images x 4 frames
    emb = embed_stub(df, dim=16).collect()
    assert all(len(r["embedding"]) == 16 for r in emb)
    # embeddings are deterministic + normalized
    import numpy as np

    for r in emb:
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-5
