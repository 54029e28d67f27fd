"""Multimodal column tests: schema/partitioning/batch-shape are real even
though decode is a deterministic stub (task brief: stub the decode, make
the Spark plumbing real and tested)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from azure_based_pii_redactor_spark.engine.operators.multimodal import (
    decode_media_metadata,
    frame_sample,
    generate_media,
    media_features,
    media_stats,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    return generate_media(spark, 200, seed=42).cache()


def test_media_generator_deterministic(spark):
    a = generate_media(spark, 60, seed=9, parts=2).toPandas().sort_values("media_id")
    b = generate_media(spark, 60, seed=9, parts=6).toPandas().sort_values("media_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_decode_metadata(spark, media):
    decoded = decode_media_metadata(media)
    pdf = decoded.toPandas()
    assert len(pdf) == 200
    kinds = set(pdf["kind"])
    assert kinds == {"image", "audio", "video"}
    img = pdf[pdf.kind == "image"]
    assert (img["width"] >= 16).all() and (img["n_frames"] == 1).all()
    aud = pdf[pdf.kind == "audio"]
    assert (aud["sample_rate"] >= 8000).all()
    vid = pdf[pdf.kind == "video"]
    assert (vid["n_frames"] >= 2).all()


def test_frame_sample(spark, media):
    frames = frame_sample(media, every_n=2).toPandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] % 2 == 0).all()
    assert frames["frame"].map(len).gt(0).all()
    # every sampled frame belongs to a video
    decoded = decode_media_metadata(media).toPandas()
    vids = set(decoded[decoded.kind == "video"]["media_id"])
    assert set(frames["media_id"]) <= vids


def test_resize_output_shapes(spark, media):
    out = resize_images(media, 32, 32).toPandas()
    decoded = decode_media_metadata(media).toPandas()
    assert len(out) == (decoded.kind == "image").sum()
    # real BMPs re-encode at 32x32x3 (+54-byte header); fake-container
    # images re-header to 10 + 32*32 payload bytes
    sizes = out["payload"].map(lambda b: (bytes(b)[:2], len(b)))
    assert all(
        n == 54 + 32 * 32 * 3 if m == b"BM" else n == 10 + 32 * 32
        for m, n in sizes
    )


def test_media_features_unit_norm(spark, media):
    import numpy as np

    feats = media_features(media, dim=16).toPandas()
    assert len(feats) == 200
    norms = feats["embedding"].map(
        lambda v: float(np.linalg.norm(np.array(v)))
    )
    assert ((norms - 1).abs() < 1e-3).all()


def test_media_stats_rollup(spark, media):
    pdf = media_stats(media).toPandas()
    assert pdf["n"].sum() == 200
    assert set(pdf["kind"]) == {"audio", "image", "video"}


def test_multimodal_suite_sections(spark):
    """The merged driver entry carries all three media paths with the
    documented schema and deterministic row counts."""
    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        multimodal_suite,
    )

    pdf = multimodal_suite(spark, "unused").toPandas()
    assert list(pdf.columns) == ["section", "key", "n", "m1", "m2"]
    by_sec = pdf.groupby("section").size().to_dict()
    assert set(by_sec) == {"kind_stats", "frame_sample", "audio"}
    assert by_sec["kind_stats"] == 3  # one row per media kind
    # every audio clip appears once; every video contributes one rollup
    kind_rows = pdf[pdf.section == "kind_stats"].set_index("key")
    assert by_sec["audio"] == kind_rows.loc["audio", "n"]
    assert by_sec["frame_sample"] == kind_rows.loc["video", "n"]
    # determinism: same seed -> same values
    again = multimodal_suite(spark, "unused").toPandas()
    assert pdf.equals(again)


def test_ivf_recall_vs_brute_force(spark):
    from azure_based_pii_redactor_spark.engine.operators.similarity import (
        knn_cosine_ivf,
        knn_cosine_topk,
    )

    sf = "/root/testdata/sf0.001"
    brute = knn_cosine_topk(spark, sf).toPandas()
    ivf = knn_cosine_ivf(spark, sf).toPandas()
    bpairs = set(zip(brute.query_id, brute.neighbor_id))
    ipairs = set(zip(ivf.query_id, ivf.neighbor_id))
    recall = len(bpairs & ipairs) / len(bpairs)
    assert recall >= 0.85, recall  # n_probe=6/8 lists on random vectors
    # scores for shared pairs identical to the brute-force double math
    merged = brute.merge(ivf, on=["query_id", "neighbor_id"],
                         suffixes=("_b", "_i"))
    assert (merged["score_b"] == merged["score_i"]).all()


def test_connected_components_known_graph(spark):
    from azure_based_pii_redactor_spark.engine.operators.dedup import (
        connected_components,
    )

    # two components: {1,2,3,4} (chain) and {10,11}; 99 isolated never appears
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    comps = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_minhash_clusters_end_to_end(spark):
    from azure_based_pii_redactor_spark.engine.operators.dedup import (
        dedup_minhash_clusters,
    )

    rows = dedup_minhash_clusters(spark, "/root/testdata/sf0.001").collect()
    assert rows  # LSH candidates exist in documents
    for r in rows:
        members = [int(x) for x in r.members.split(",")]
        assert r.keeper_id == min(members)
        assert r.n_members == len(members) > 1


def test_simhash_hamming_block_join_is_exact(spark):
    """The block-equality candidate join is EXACT by pigeonhole (k
    differing bits cannot touch all k+1 blocks): its output must equal
    the all-pairs O(N^2) Hamming scan, and the plan must carry no
    cartesian."""
    from azure_based_pii_redactor_spark.engine.operators.dedup import (
        dedup_simhash_hamming,
        dedup_simhash_hamming_exact,
    )

    sf = "/root/testdata/sf0.001"
    got = [(r.doc_a, r.doc_b, r.hamming)
           for r in dedup_simhash_hamming(spark, sf).collect()]
    want = [(r.doc_a, r.doc_b, r.hamming)
            for r in dedup_simhash_hamming_exact(spark, sf).collect()]
    assert got == want and len(got) > 0
    plan = dedup_simhash_hamming(
        spark, sf
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bmp_roundtrip_and_resize():
    """Real BMP codec: encode->decode is pixel-exact (incl. row padding
    for non-multiple-of-4 widths); nearest-neighbor resize matches the
    index-math reference."""
    import numpy as np

    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    for h, w in ((5, 5), (7, 3), (16, 17), (1, 1)):
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all(), (h, w)
    px = rng.integers(0, 256, (10, 6, 3)).astype(np.uint8)
    small = resize_nearest(px, 3, 5)
    assert small.shape == (5, 3, 3)
    assert (small[0, 0] == px[0, 0]).all()
    assert (small[4, 2] == px[8, 4]).all()  # yi=4*10//5=8, xi=2*6//3=4


def test_resize_images_handles_real_bmp(spark):
    """The Spark resize stage decodes real BMP blobs and re-encodes at
    the target size; fake-container images resize via re-header."""
    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        decode_bmp,
        generate_media,
        resize_images,
    )

    media = generate_media(spark, 120, seed=42)
    out = resize_images(media, 8, 8).collect()
    assert out
    n_bmp = 0
    for r in out:
        raw = bytes(r.payload)
        if raw[:2] == b"BM":
            px = decode_bmp(raw)
            assert px.shape == (8, 8, 3)
            n_bmp += 1
    assert n_bmp > 0  # the generator mixes real BMPs in


def test_decode_metadata_parses_bmp(spark):
    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        decode_media_metadata,
        generate_media,
    )

    media = generate_media(spark, 120, seed=42)
    rows = decode_media_metadata(media).filter("kind = 'image'").collect()
    assert rows and all(r.width > 0 and r.height > 0 for r in rows)


def test_wav_roundtrip_and_audio_stats(spark):
    """Real WAV codec: encode->decode is sample-exact; audio_stats
    computes true RMS/ZCR on decoded samples (full-scale square wave ->
    rms 1.0, zcr 1.0)."""
    import numpy as np

    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        audio_stats,
        decode_wav,
        encode_wav,
        generate_media,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    samples = rng.integers(-32768, 32768, 777).astype(np.int16)
    back, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000 and (back == samples).all()

    square = np.tile(np.array([32767, -32768], np.int16), 100)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(square, 8000)), None)],
        "media_id long, kind string, payload binary,"
        " meta map<string,string>",
    )
    row = audio_stats(df).collect()[0]
    assert row.sample_rate == 8000
    assert abs(row.rms - 1.0) < 0.01
    assert abs(row.zero_crossing_rate - 1.0) < 0.01

    # generator mixes real WAVs; stats run over both formats
    media = generate_media(spark, 150, seed=42)
    rows = audio_stats(media).collect()
    assert rows and all(r.sample_rate >= 8000 for r in rows)


def test_resize_jpeg_png_via_pil_when_available(spark):
    """Skip-gated twin of the Iceberg pattern (VERDICT r3 #5): the
    PIL-backed JPEG/PNG branch of resize_images
    (engine/operators/multimodal.py) is exercised the moment Pillow
    appears on the cluster -- a PNG blob round-trips through
    decode -> NEAREST resize -> re-encode in ITS OWN format, with the
    expected output pixels recomputed via resize_nearest.  In this
    sandbox Pillow is absent, so the test skips cleanly and the
    no-PIL contract (NotImplementedError) is asserted instead by
    test_resize_unknown_format_requires_pil."""
    PIL = pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        resize_images,
        resize_nearest,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    px = rng.integers(0, 256, (40, 24, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), {})],
        "media_id long, kind string, payload binary,"
        " meta map<string,string>",
    )
    out = resize_images(media, width=8, height=8).collect()
    assert len(out) == 1
    img = Image.open(io.BytesIO(bytes(out[0].payload)))
    assert img.format == "PNG"  # re-encoded in the ORIGINAL format
    assert img.size == (8, 8)
    got = np.asarray(img.convert("RGB"))
    want = resize_nearest(px, 8, 8)
    assert (got == want).all()


def test_resize_unknown_format_requires_pil(spark):
    """Without Pillow the JPEG/PNG branch must fail LOUDLY with the
    documented NotImplementedError, not silently pass blobs through."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: the positive-path test covers this")
    except ImportError:
        pass
    from pyspark.errors.exceptions.captured import PythonException

    from azure_based_pii_redactor_spark.engine.operators.multimodal import (
        resize_images,
    )

    # a minimal PNG signature -- not BMP, not the synthetic container
    blob = b"\x89PNG\r\n\x1a\n" + b"\0" * 32
    media = spark.createDataFrame(
        [(1, "image", bytearray(blob), {})],
        "media_id long, kind string, payload binary,"
        " meta map<string,string>",
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_images(media, width=8, height=8).collect()


def test_semdedup_cluster_scoped(spark):
    """SemDeDup (Abbas 2023): planted near-dup groups are collapsed to
    one keeper each -- the member LEAST similar to its cluster centroid
    (the paper's diversity-preserving rule) -- while unrelated vectors
    survive; the result is deterministic under repartitioning; and the
    real embeddings table runs end-to-end."""
    import numpy as np

    from pyspark.sql import functions as F

    from azure_based_pii_redactor_spark.engine.operators.similarity import (
        embedding_semdedup,
        semdedup,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype("float32").tolist()) for i in range(40)]
    # plant two dup groups: ids 100/101 ~ copies of vec 3; 200/201/202
    # ~ copies of vec 7 (tiny perturbations keep cosine ~0.999)
    for gid, src, n in ((100, 3, 2), (200, 7, 3)):
        for j in range(n):
            v = base[src] + 1e-3 * rng.normal(size=16)
            v /= np.linalg.norm(v)
            rows.append((gid + j, v.astype("float32").tolist()))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )

    out = {r.keeper_id: r for r in
           semdedup(emb, n_lists=4, threshold=0.95).collect()}
    # every component contains its source vector + planted copies
    allm = sorted(
        m for r in out.values() for m in r.members.split(",")
    )
    assert {int(x) for x in allm} == {3, 100, 101, 7, 200, 201, 202}
    for r in out.values():
        members = [int(x) for x in r.members.split(",")]
        dropped = [int(x) for x in r.dropped.split(",") if x]
        assert len(dropped) == len(members) - 1
        assert r.keeper_id not in dropped
    # keeper = member with LOWEST centroid similarity (tie-broken by id)
    from azure_based_pii_redactor_spark.engine.operators.similarity import (
        _ivf_centroids,
    )

    cents = _ivf_centroids(emb, 4)
    by_id = {i: np.array(v, dtype=np.float64) for i, v in rows}
    for r in out.values():
        members = [int(x) for x in r.members.split(",")]
        sims = {m: float((by_id[m] @ cents.T).max()) for m in members}
        want = min(members, key=lambda m: (sims[m], m))
        assert r.keeper_id == want, (r, sims)

    # determinism under input reshuffling
    again = {r.keeper_id: r.members for r in semdedup(
        emb.orderBy(F.rand(5)).repartition(7), n_lists=4, threshold=0.95
    ).collect()}
    assert again == {k: r.members for k, r in out.items()}

    # the shipped table runs end-to-end (random vectors: few/no dups
    # at the default threshold -- just must not error and stay stable)
    res = embedding_semdedup(spark, "/root/testdata/sf0.001").collect()
    assert isinstance(res, list)


def test_semdedup_degenerate_inputs(spark):
    """Guard behavior (review r6): an empty corpus yields an empty
    result (not a numpy crash); a corpus smaller than n_lists clamps
    the list count and still dedups; n_lists beyond the centroid
    sample is a loud, named error."""
    import numpy as np

    import pytest as _pytest

    from azure_based_pii_redactor_spark.engine.operators.similarity import (
        semdedup,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semdedup(empty, n_lists=8).count() == 0

    v = (np.ones(8) / np.sqrt(8)).astype("float32").tolist()
    tiny = spark.createDataFrame(
        [(1, v), (2, v), (3, v)], "vec_id long, embedding array<float>"
    )
    out = semdedup(tiny, n_lists=8, threshold=0.9).collect()
    assert len(out) == 1 and out[0].n_members == 3

    with _pytest.raises(ValueError, match="sample_cap"):
        semdedup(tiny, n_lists=1000)
