"""Tests for the training-data pipeline: dedup recall/precision, similarity
search, text stats, multimodal plumbing. Constructed corpora with KNOWN
ground truth (near-dup clusters, planted similar vectors) — the driver's
oracle checks cover engine-vs-DuckDB parity; these cover the probabilistic
structures' guarantees (LSH recall, SimHash-vs-Jaccard consistency)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline import dedup as DD
from crawler_ai_spark.pipeline import multimodal as MM
from crawler_ai_spark.pipeline import similarity as SIM
from crawler_ai_spark.pipeline import textstats as TS

WORDS = (
    "spark shuffle partition broadcast join window filter scan sort merge "
    "agg hash stream batch row column vector table query data"
).split()


def _mk_docs(spark, n=120, seed=7):
    """n docs in near-dup clusters: every 4th doc is a light mutation of its
    cluster head (a few tokens swapped) → known high-Jaccard pairs."""
    rng = np.random.default_rng(seed)
    rows = []
    base_texts = []
    for i in range(n):
        if i % 4 == 0:
            toks = list(rng.choice(WORDS, size=40))
            base_texts.append(toks)
            rows.append((i, " ".join(toks)))
        else:
            toks = list(base_texts[-1])
            for _ in range(2):  # mutate 2 of 40 tokens → jaccard ≈ 0.8+
                toks[int(rng.integers(0, len(toks)))] = str(rng.choice(WORDS))
            rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _mk_vectors(spark, n_clusters=20, per_cluster=5, dim=32, seed=3):
    """Clustered unit vectors: intra-cluster cosine ≥ ~0.95 (small noise),
    inter-cluster ~0 — known ANN ground truth."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            g = rng.standard_normal(dim)
            g /= np.linalg.norm(g)
            # unit noise scaled to ε=0.15 → intra-cluster cosine ≈ 1/(1+ε²)
            # ≈ 0.978, comfortably above the 0.9 dup threshold
            v = center + 0.15 * g
            v /= np.linalg.norm(v)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id LONG, label INT, embedding ARRAY<FLOAT>")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z"), (4, "a  b   c")],
        "doc_id LONG, text STRING",
    )
    groups = DD.exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == 1
    kept = DD.exact_dedup(docs)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 4]


def test_minhash_lsh_matches_bruteforce(spark):
    docs = _mk_docs(spark)
    brute = {(r.a_id, r.b_id) for r in DD.jaccard_pairs(docs, threshold=0.6).collect()}
    lsh = {(r.a_id, r.b_id) for r in DD.minhash_lsh_pairs(docs, threshold=0.6).collect()}
    assert brute, "constructed corpus must contain near-dup pairs"
    # precision is exact by construction (candidates re-verified); recall
    # must be ≥ 1-1e-6 at 32×2 banding → equality expected here
    assert lsh == brute


def test_jaccard_max_df_guard(spark):
    docs = _mk_docs(spark)
    full = DD.jaccard_pairs(docs, threshold=0.6)
    # dropping shingles that appear in > half the docs must keep true dup pairs
    capped = DD.jaccard_pairs(docs, threshold=0.6, max_df=60)
    assert capped.count() >= 0 and full.count() > 0


def test_simhash_banding_complete(spark):
    """The pigeonhole banding (4×16-bit chunks) must find EVERY pair with
    hamming ≤ 3 — verified against driver-side brute-force hamming."""
    docs = _mk_docs(spark)
    sigs = {r.id: r.simhash for r in DD.simhash_signatures(docs).collect()}
    ids = sorted(sigs)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 3:
                brute.add((a, b))
    got = {(r.a_id, r.b_id) for r in DD.simhash_pairs(docs, max_hamming=3).collect()}
    assert got == brute


def test_simhash_correlates_with_similarity(spark):
    """Near-dup pairs (jaccard ≥ 0.8) must sit at materially lower hamming
    distance than random pairs — the property that makes SimHash a useful
    candidate generator (exact thresholds are corpus-dependent)."""
    docs = _mk_docs(spark)
    sigs = {r.id: r.simhash for r in DD.simhash_signatures(docs).collect()}
    dup = {(r.a_id, r.b_id) for r in DD.jaccard_pairs(docs, threshold=0.8).collect()}
    assert dup

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")

    dup_mean = sum(ham(a, b) for a, b in dup) / len(dup)
    ids = sorted(sigs)
    rand = [(ids[i], ids[(i * 7 + 13) % len(ids)]) for i in range(len(ids))]
    rand = [(a, b) for a, b in rand if a != b and (min(a, b), max(a, b)) not in dup]
    rand_mean = sum(ham(a, b) for a, b in rand) / len(rand)
    assert dup_mean < rand_mean * 0.6, (dup_mean, rand_mean)


def test_simhash_deterministic(spark):
    docs = _mk_docs(spark, n=24)
    s1 = {(r.id, r.simhash) for r in DD.simhash_signatures(docs).collect()}
    s2 = {(r.id, r.simhash) for r in DD.simhash_signatures(docs).collect()}
    assert s1 == s2


def test_embedding_dup_pairs_find_clusters(spark):
    emb = _mk_vectors(spark, n_clusters=6, per_cluster=4)
    pairs = DD.embedding_dup_pairs(emb, threshold=0.9).collect()
    labels = {r.vec_id: r.label for r in emb.collect()}
    assert pairs, "clustered vectors must produce near-dup pairs"
    for p in pairs:
        assert labels[p.a_id] == labels[p.b_id], "cross-cluster false positive"


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def test_cosine_topk_self_first(spark):
    emb = _mk_vectors(spark, n_clusters=5, per_cluster=4)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = SIM.cosine_topk(queries, emb, k=4).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    labels = {r.vec_id: r.label for r in emb.collect()}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert rows[0].neighbor_id == q, "rank 1 must be the vector itself"
        # same-cluster members dominate the top-k
        same = sum(labels[r.neighbor_id] == labels[q] for r in rows)
        assert same >= 3


def test_hyperplane_lsh_recall(spark):
    emb = _mk_vectors(spark, n_clusters=15, per_cluster=5)
    brute = {(r.a_id, r.b_id) for r in DD.embedding_dup_pairs(emb, 0.9, vec_col="embedding").collect()}
    lsh = {
        (r.a_id, r.b_id)
        for r in SIM.hyperplane_lsh_pairs(emb, 0.9, dim=32, n_tables=12, bits=8).collect()
    }
    assert brute
    assert lsh <= brute, "LSH must be a subset (exact verify) of brute force"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"recall {recall}"


def test_hyperplane_topk_approximates_exact(spark):
    emb = _mk_vectors(spark, n_clusters=8, per_cluster=5, dim=32)
    queries = emb.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = SIM.cosine_topk(queries, emb, k=5)
    approx = SIM.hyperplane_topk(queries, emb, k=5, dim=32, n_tables=12, bits=6)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.7


def test_ivf_topk_approximates_exact(spark):
    emb = _mk_vectors(spark, n_clusters=8, per_cluster=5, dim=32)
    queries = emb.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = SIM.cosine_topk(queries, emb, k=5)
    approx = SIM.ivf_topk(queries, emb, k=5, n_centroids=8, n_probe=4)
    rows = approx.collect()
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(a & e) / len(e) >= 0.9
    # the query's own cell is always probed first → rank 1 is itself
    for r in rows:
        if r.rank == 1:
            assert r.neighbor_id == r.query_id


def test_ivf_indexed_equals_inline(spark, tmp_path):
    """The persisted index (partitionBy(cell) + stored centroids) must
    return exactly what the inline ivf_topk computes, and the probe scan
    must actually prune partitions."""
    emb = _mk_vectors(spark, n_clusters=8, per_cluster=5, dim=32)
    queries = emb.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "ivf")
    SIM.build_ivf_index(emb, idx, n_centroids=8)
    got = SIM.ivf_topk_indexed(spark, idx, queries, k=5, n_probe=4)
    want = SIM.ivf_topk(queries, emb, k=5, n_centroids=8, n_probe=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # partition pruning is real: the index scan's plan carries a cell
    # partition filter (remove the isin() and this fails even though the
    # join would still restrict the rows)
    plan = spark._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("Scan parquet") :]
    pf = scan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in pf and ("IN" in pf.upper() or "isin" in pf), pf
    import glob

    assert len(glob.glob(f"{idx}/cells/cell=*")) == 8


def test_ivf_is_deterministic(spark):
    emb = _mk_vectors(spark, n_clusters=6, per_cluster=4, dim=32)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = SIM.ivf_topk(queries, emb, k=4, n_centroids=6, n_probe=3).collect()
    b = SIM.ivf_topk(queries, emb, k=4, n_centroids=6, n_probe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------


def test_lang_id_markers(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat is in the house and the dog is out"),
            (1, "el perro es de la casa y la una es grande"),
            (2, "der hund ist und das ist ein nicht"),
            (3, "zzz qqq www"),
            (4, ""),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.lang for r in docs.select(
        "doc_id", TS.lang_id(F.col("text")).alias("lang")).collect()}
    assert got[0] == "en" and got[1] == "es" and got[2] == "de"
    assert got[3] == "und" and got[4] == "und"


def test_quality_score_ordering(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and runs far away today"),
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "xy"),
        ],
        "doc_id LONG, text STRING",
    )
    q = {r.doc_id: r.q for r in docs.select(
        "doc_id", TS.quality_score(F.col("text")).alias("q")).collect()}
    assert q[0] > q[1] > q[2]


def test_token_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b  c"), (1, ""), (2, "  "), (3, "hello,world 42x")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: (r.n, r.nb) for r in docs.select(
        "doc_id",
        TS.token_count(F.col("text")).alias("n"),
        TS.bpe_ish_token_count(F.col("text")).alias("nb"),
    ).collect()}
    assert rows[0] == (3, 3)
    assert rows[1][0] == 0 and rows[2][0] == 0
    # hello , world 42 x → 5 BPE-ish pieces
    assert rows[3] == (2, 5)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_media_meta_sniffing(spark):
    media = MM.synth_media(spark, 20)
    meta = {r.media_id: r for r in MM.extract_media_meta(media).collect()}
    assert len(meta) == 20
    assert meta[0].mime_sniffed == "image/png" and meta[0].width == 16
    assert meta[1].mime_sniffed == "image/gif"
    assert meta[2].mime_sniffed == "image/bmp"
    assert meta[3].mime_sniffed == "audio/wav"
    assert meta[4].mime_sniffed == "video/mp4"


def test_media_decode_jpeg_is_real():
    """Round 4: baseline JPEG decodes FOR REAL (pipeline/jpegcodec.py);
    the NotImplementedError stand-in now covers only codec-less formats."""
    from crawler_ai_spark.pipeline.jpegcodec import encode_jpeg

    w, h = 16, 12
    px = bytes(((x * 7 + y * 13 + c * 29) % 256)
               for y in range(h) for x in range(w) for c in range(3))
    d = MM._decode_image(encode_jpeg(w, h, px, 3))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert 0.0 < d["mean_pixel"] < 1.0 and len(d["pixel_sha256"]) == 64
    # a JPEG with no scan is a data error, not a missing codec
    with pytest.raises(ValueError):
        MM._decode_image(b"\xff\xd8\xff\xd9")
    # the stand-in still serves genuinely codec-less formats (e.g. WebP)
    webp = b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 16
    with pytest.raises(NotImplementedError):
        MM._decode_image(webp)
    fake = MM._decode_image(webp, fake=True)
    assert fake["width"] is None
    # malformed PNG/GIF are data errors, not missing-codec errors
    with pytest.raises(ValueError):
        MM._decode_image(b"\x89PNG\r\n\x1a\n" + b"\0" * 16)
    with pytest.raises(ValueError):
        MM._decode_image(b"GIF89a" + bytes([16, 0, 12, 0]))


def test_png_codec_roundtrip_all_filters():
    """decode_png is a REAL stdlib decoder: encode→decode round-trips
    bit-exactly, and externally-filtered rows (Sub/Up/Average/Paeth)
    reconstruct correctly — pinned against a hand-built PNG whose rows
    use every filter type."""
    import struct as st
    import zlib

    w, h = 7, 5
    px = bytes(((x * 11 + y * 17 + c * 5) % 256) for y in range(h) for x in range(w) for c in range(3))
    blob = MM.encode_png(w, h, px, channels=3)
    d = MM.decode_png(blob)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["pixels"] == px
    assert d["pixel_sum"] == sum(px) and d["n_pix"] == len(px)

    # hand-build a PNG exercising filters 1-4 (encode_png only emits 0)
    stride = w * 3
    rows = [bytearray(px[y * stride : (y + 1) * stride]) for y in range(h)]
    filtered = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        row = rows[y]
        out = bytearray(stride)
        for x in range(stride):
            left = row[x - 3] if x >= 3 else 0
            up = rows[y - 1][x] if y else 0
            ul = rows[y - 1][x - 3] if (y and x >= 3) else 0
            if ftype == 0:
                out[x] = row[x]
            elif ftype == 1:
                out[x] = (row[x] - left) & 0xFF
            elif ftype == 2:
                out[x] = (row[x] - up) & 0xFF
            elif ftype == 3:
                out[x] = (row[x] - ((left + up) >> 1)) & 0xFF
            else:
                pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[x] = (row[x] - pred) & 0xFF
        filtered.append(ftype)
        filtered.extend(out)

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    blob2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    assert MM.decode_png(blob2)["pixels"] == px


def test_png_codec_palette_and_gray():
    import struct as st
    import zlib

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    # 4x2 palette image: indices 0..3 cycling, palette maps i -> (i, 2i, 3i)
    palette = bytes(v for i in range(4) for v in (i, 2 * i, 3 * i))
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    raw = b"\x00" + idx[:4] + b"\x00" + idx[4:]
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = MM.decode_png(blob)
    assert d["channels"] == 3
    assert d["pixels"] == bytes(
        v for i in [0, 1, 2, 3, 3, 2, 1, 0] for v in (i, 2 * i, 3 * i)
    )
    # grayscale round-trip
    g = bytes(range(12))
    d2 = MM.decode_png(MM.encode_png(4, 3, g, channels=1))
    assert d2["channels"] == 1 and d2["pixels"] == g


def test_decode_image_features_on_real_bytes(spark):
    """media_meta-adjacent gate: the mapInPandas decode pass produces true
    pixel stats for the synth corpus' REAL PNGs and BMPs, NULLs elsewhere."""
    media = MM.synth_media(spark, 20)
    feats = {r.media_id: r for r in MM.decode_image_features(media).collect()}
    assert len(feats) == 20
    blobs = {r.media_id: bytes(r.content) for r in media.collect()}
    for i in range(20):
        if i % 5 == 0:
            d = MM.decode_png(blobs[i])
            r = feats[i]
            assert (r.width, r.height, r.channels) == (16 + i % 64, 9 + i % 48, 3)
            assert r.pixel_sha256 == d["pixel_sha256"]
            assert r.mean_pixel == d["mean_pixel"] > 0
        elif i % 5 == 1:
            d = MM.decode_gif(blobs[i])
            r = feats[i]
            assert (r.width, r.height, r.channels) == (8 + i % 32, 8 + i % 32, 3)
            assert r.pixel_sha256 == d["pixel_sha256"]
            assert r.mean_pixel == d["mean_pixel"] > 0
        elif i % 5 == 2:
            d = MM.decode_bmp(blobs[i])
            r = feats[i]
            assert (r.width, r.height, r.channels) == (32 + i % 16, 24 + i % 16, 3)
            assert r.pixel_sha256 == d["pixel_sha256"]
            assert r.mean_pixel == d["mean_pixel"] > 0
        else:
            assert feats[i].width is None and feats[i].pixel_sha256 is None


def test_gif_codec_roundtrip_lzw_and_interlace():
    """decode_gif is a REAL LZW decoder: encode→decode round-trips the
    palette-expanded pixels (exercising variable code widths + dictionary
    growth on a large frame), and an interlaced variant deinterlaces to
    the same image."""
    import struct as st

    w, h = 40, 30  # 1200 px through 8-color LZW → several width bumps
    palette = bytes(v for j in range(8) for v in (j * 31 % 256, j * 57 % 256, j * 13 % 256))
    idx = bytes(((x * 3 + y * 7) % 8) for y in range(h) for x in range(w))
    blob = MM.encode_gif(w, h, idx, palette)
    d = MM.decode_gif(blob)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    expect = bytes(v for ci in idx for v in palette[ci * 3 : ci * 3 + 3])
    assert d["pixels"] == expect
    assert d["pixel_sum"] == sum(expect) and d["n_pix"] == len(expect)

    # interlaced variant: rows stored in 4-pass order, flag bit 0x40
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    rows = [idx[y * w : (y + 1) * w] for y in range(h)]
    interlaced_idx = b"".join(rows[y] for y in order)
    lzw = MM._lzw_encode(interlaced_idx, 3)
    blocks = bytearray([3])
    for i in range(0, len(lzw), 255):
        c = lzw[i : i + 255]
        blocks.append(len(c))
        blocks.extend(c)
    blocks.append(0)
    blob_i = (
        b"GIF89a" + st.pack("<HHBBB", w, h, 0x80 | 2, 0, 0) + palette
        + b"\x2C" + st.pack("<HHHHB", 0, 0, w, h, 0x40) + bytes(blocks) + b"\x3B"
    )
    assert MM.decode_gif(blob_i)["pixels"] == expect
    # extension blocks (e.g. GCE) are skipped, animated first frame wins
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    blob_a = blob[:13] + palette + gce + blob[13 + len(palette):]
    assert MM.decode_gif(blob_a)["pixels"] == expect


def test_bmp_codec_roundtrip_padding_and_topdown():
    """decode_bmp handles 4-byte row padding (w*3 % 4 != 0), bottom-up
    (the writer's form) and top-down (negative height) layouts, and the
    PNG/BMP codecs agree on identical pixel content."""
    import struct as st

    w, h = 5, 3  # stride 15 -> 1 pad byte per row
    px = bytes(((x * 11 + y * 17 + c * 5) % 256) for y in range(h) for x in range(w) for c in range(3))
    blob = MM.encode_bmp(w, h, px, channels=3)
    d = MM.decode_bmp(blob)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["pixels"] == px
    assert d["pixel_sum"] == sum(px) and d["n_pix"] == len(px)
    # same pixels through the PNG codec -> identical stats + hash
    dp = MM.decode_png(MM.encode_png(w, h, px, channels=3))
    assert dp["pixel_sha256"] == d["pixel_sha256"]
    assert dp["mean_pixel"] == d["mean_pixel"]

    # top-down variant: negate height, rows in natural order
    stride, pad = w * 3, b"\x00" * ((4 - (w * 3) % 4) % 4)
    rows = b"".join(
        bytes(
            v
            for x in range(w)
            for v in (
                px[(y * w + x) * 3 + 2], px[(y * w + x) * 3 + 1], px[(y * w + x) * 3],
            )
        )
        + pad
        for y in range(h)
    )
    off = 14 + 40
    td = (
        b"BM" + st.pack("<IHHI", off + len(rows), 0, 0, off)
        + st.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
        + rows
    )
    assert MM.decode_bmp(td)["pixels"] == px
    # unsupported depth is a data error
    bad = bytearray(blob)
    st.pack_into("<H", bad, 28, 8)
    with pytest.raises(ValueError):
        MM.decode_bmp(bytes(bad))


def test_frame_sample_plan(spark):
    media = MM.synth_media(spark, 20)
    plan = MM.frame_sample_plan(media)
    rows = plan.collect()
    assert rows and all(r.frame_no == r.sample_idx * 125 for r in rows)


# ---------------------------------------------------------------------------
# P12 byte-parity: Spark summarize expr ≡ pure-Python twin
# ---------------------------------------------------------------------------


def test_summarize_description_parity(spark):
    from crawler_ai_spark.functions.jobs import summarize_description_expr
    from crawler_ai_spark.functions.textnorm import summarize_description

    texts = [
        "",
        "short one.",
        "word " * 100,                              # long, spaces only
        ("s" * 250) + ". " + "tail " * 30,          # period past 60%
        ("s" * 100) + ". " + ("t" * 400),           # period before 60%
        "x" * 400,                                   # no period, no space
        "a. " * 200,
        "Ünïcodé — wörds " * 40,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i LONG, t STRING")
    got = {
        r.i: r.s
        for r in df.select("i", summarize_description_expr(F.col("t")).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == summarize_description(t), (i, got[i], summarize_description(t))


def test_connected_components_multi_hop(spark):
    """Label propagation must close transitive chains (min id travels the
    full diameter), handle stars, and keep disjoint edges separate."""
    from crawler_ai_spark.pipeline.dedup import connected_components

    edges = [
        (10, 11), (11, 12), (12, 13), (13, 14),   # chain, min=10
        (50, 7), (50, 8), (50, 9),                # star, min=7
        (100, 101),                               # lone edge
    ]
    df = spark.createDataFrame(edges, "a_id LONG, b_id LONG")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        50: 7, 7: 7, 8: 7, 9: 7,
        100: 100, 101: 100,
    }


def test_connected_components_deep_chain_and_random(spark):
    """Pointer jumping must converge in O(log diameter) rounds: a 60-node
    chain needs 59 naive propagation rounds (> the max_iter budget) but
    ~7 with path halving; a random graph must match union-find exactly.
    Pre-fix the loop silently returned non-converged labels on the chain."""
    import random

    import pyspark.sql.functions as F

    from crawler_ai_spark.pipeline.dedup import connected_components

    chain = spark.range(59).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    labels = {r.node: r.cluster_id for r in connected_components(chain).collect()}
    assert len(labels) == 60 and set(labels.values()) == {0}

    rnd = random.Random(42)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expect = {n: min(comp[find(n)]) for n in nodes}
    df = spark.createDataFrame(edges, "a_id LONG, b_id LONG")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == expect


def test_wav_codec_roundtrip_and_bounds():
    """decode_wav parses real RIFF containers: 8- and 16-bit PCM
    round-trip, the RIFF size field bounds the walk (trailing noise
    ignored), and non-PCM is a data error."""
    import struct as st

    s8 = bytes((j * 7 + 3) % 256 for j in range(500))
    blob = MM.encode_wav(s8, rate=8000, channels=1, bits=8)
    d = MM.decode_wav(blob + b"\xde\xad" * 20)  # trailing garbage
    assert (d["channels"], d["sample_rate"], d["bits"], d["n_frames"]) == (1, 8000, 8, 500)
    assert d["abs_sum"] == sum(abs(b - 128) for b in s8)
    assert d["peak"] == max(abs(b - 128) for b in s8)
    assert d["duration_ms"] == 500 * 1000 // 8000

    s16 = [(j * 997 - 16000) % 65536 - 32768 for j in range(300)]
    d2 = MM.decode_wav(MM.encode_wav(s16, rate=44100, channels=2, bits=16))
    assert (d2["channels"], d2["bits"], d2["n_frames"]) == (2, 16, 150)
    assert d2["abs_sum"] == sum(abs(v) for v in s16)

    bad = bytearray(blob)
    st.pack_into("<H", bad, 20, 3)  # audio_format = IEEE float
    with pytest.raises(ValueError):
        MM.decode_wav(bytes(bad))


def test_mp4_probe_roundtrip():
    blob = MM.encode_mp4_stub(640, 360, duration_ticks=1500, timescale=600)
    m = MM.probe_mp4(blob + b"junk after the last box")
    assert m["brand"] == "mp42"
    assert (m["width"], m["height"]) == (640, 360)
    assert m["timescale"] == 600 and m["duration_ms"] == 1500 * 1000 // 600
    assert m["n_tracks"] == 1
    with pytest.raises(ValueError):
        MM.probe_mp4(b"\x00\x00\x00\x18mdat" + b"\x00" * 16)  # no ftyp
    with pytest.raises(ValueError):
        MM.probe_mp4(blob[:20])  # ftyp only, no moov


def test_decode_audio_features_on_real_bytes(spark):
    media = MM.synth_media(spark, 20)
    feats = {r.media_id: r for r in MM.decode_audio_features(media).collect()}
    assert len(feats) == 20
    blobs = {r.media_id: bytes(r.content) for r in media.collect()}
    for i in range(20):
        if i % 5 == 3:
            d = MM.decode_wav(blobs[i])
            r = feats[i]
            assert (r.channels, r.sample_rate, r.bits) == (1, 8000, 8)
            assert r.n_frames == 160 + i * 5
            assert r.abs_sum == d["abs_sum"] and r.pcm_sha256 == d["pcm_sha256"]
        else:
            assert feats[i].channels is None and feats[i].pcm_sha256 is None


def test_nearest_resize_hand_checked():
    # 4x2 RGB source, downsample to 2x1: dst (x,y) samples (x*4//2, y*2//1)
    src = bytes(range(24))
    out = MM.nearest_resize(src, 4, 2, 3, 2, 1)
    assert out == src[0:3] + src[6:9]
    # upsample 1x1 -> 3x2 replicates the single pixel
    one = bytes([7, 8, 9])
    assert MM.nearest_resize(one, 1, 1, 3, 3, 2) == one * 6
    with pytest.raises(ValueError):
        MM.nearest_resize(one, 1, 1, 3, 0, 2)


def test_resize_images_roundtrip(spark):
    """The resize pass decodes real containers, resamples, and re-encodes
    a PNG whose pixels ARE the resampled bytes."""
    media = MM.synth_media(spark, 15)
    rows = {r.media_id: r for r in MM.resize_images(media, 6, 4).collect()}
    blobs = {r.media_id: bytes(r.content) for r in media.collect()}
    for i in range(15):
        r = rows[i]
        if i % 5 in (0, 1, 2):  # PNG / GIF / BMP — all real decodes
            d = MM._try_decode_pixels(blobs[i])
            want = MM.nearest_resize(d["pixels"], d["width"], d["height"], d["channels"], 6, 4)
            assert (r.width, r.height) == (6, 4)
            assert (r.src_width, r.src_height) == (d["width"], d["height"])
            assert r.pixel_sum == sum(want) and r.n_pix == len(want)
            back = MM.decode_png(bytes(r.content))
            assert back["pixels"] == want
        else:
            assert r.content is None and r.pixel_sum is None


def test_media_jpeg_through_spark_decode_and_resize(spark):
    """JPEG rows flow through the SAME Spark media passes as PNG/BMP/GIF
    now that _try_decode_pixels handles baseline JPEG: decode features
    (true dims/means/hashes) and the decode→resize→PNG-re-encode pass."""
    import numpy as np

    from crawler_ai_spark.pipeline.jpegcodec import encode_jpeg
    from crawler_ai_spark.pipeline.multimodal import decode_png

    rows = []
    for i in range(6):
        w, h = 12 + i, 10 + i
        px = bytes(
            min(255, 10 + x * 3 + y * 2 + c * 11)
            for y in range(h) for x in range(w) for c in range(3)
        )
        blob = encode_jpeg(w, h, px, 3, subsample=(i % 2 == 1))
        rows.append((i, "image", blob, "image/jpeg", len(blob)))
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in MM.decode_image_features(media).collect()}
    assert len(feats) == 6
    for i in range(6):
        assert (feats[i].width, feats[i].height, feats[i].channels) == (12 + i, 10 + i, 3)
        assert feats[i].pixel_sha256 is not None and 0 < feats[i].mean_pixel < 1
    resized = {r.media_id: r for r in MM.resize_images(media, 8, 6).collect()}
    for i in range(6):
        out = decode_png(bytes(resized[i].content))
        assert (out["width"], out["height"], out["channels"]) == (8, 6, 3)
    # a decoded-then-resized JPEG is deterministic end to end
    again = {r.media_id: bytes(r.content) for r in MM.resize_images(media, 8, 6).collect()}
    assert all(bytes(resized[i].content) == again[i] for i in range(6))
