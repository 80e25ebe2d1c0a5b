"""Image codec + validation plumbing: PNG round-trips exactly, the lossy stub
stays within its quantization bound (>40 dB), phash is stable, and the J8
validation join (BASELINE.json per-row invariant) passes on the fixture."""

import numpy as np
import pytest

from ghcrawler_spark import fixtures
from ghcrawler_spark.functions.images import (
    PSNR_INF,
    decode_image,
    fake_jpeg_decode,
    fake_jpeg_encode,
    phash64,
    png_decode,
    png_encode,
    psnr,
    resize_thumbnail_udf,
    validate_against_reference,
)


def _pixels(seed=7, h=32, w=48):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_png_roundtrip_exact():
    px = _pixels()
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_deterministic():
    px = _pixels()
    assert png_encode(px) == png_encode(px.copy())


def test_fake_jpeg_psnr_bound():
    px = _pixels()
    dec = fake_jpeg_decode(fake_jpeg_encode(px))
    val = psnr(px, dec)
    assert 40.0 <= val < PSNR_INF


def test_psnr_identical_is_inf():
    px = _pixels()
    assert psnr(px, px) == PSNR_INF


def test_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"whatever", "webp")
    with pytest.raises(NotImplementedError):
        fake_jpeg_decode(b"\xff\xd8not-our-stub-bytes")


def test_phash_stable_and_robust():
    px = _pixels()
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # quantization (the lossy stub) must not move the average-hash much
    h2 = phash64(fake_jpeg_decode(fake_jpeg_encode(px)))
    assert bin(h1 ^ h2).count("1") <= 6


def test_validation_join_on_fixture(spark):
    from pyspark.sql import functions as F

    fx = fixtures.generate(seed=11, n_hosts=3)
    corpus, _, _ = fixtures.to_spark(spark, fx)
    fetched = corpus.select("image_id", "bytes", "fmt", "caption")
    # the reference frame is the lossless PNG truth
    ref = corpus.select(
        "image_id",
        F.col("ref_bytes").alias("bytes"),
        F.lit("png").alias("fmt"),
        "caption",
    )
    out = validate_against_reference(fetched, ref)
    rows = out.select("image_id", "fmt", "psnr_db", "caption_ok", "valid").collect()
    assert rows and all(r["valid"] for r in rows)
    jpegs = [r for r in rows if r["fmt"] == "jpeg"]
    assert jpegs, "fixture should include lossy images"
    assert all(40.0 <= r["psnr_db"] < PSNR_INF for r in jpegs)


def test_resize_thumbnail_udf(spark):
    fx = fixtures.generate(seed=5, n_hosts=2)
    corpus, _, _ = fixtures.to_spark(spark, fx)
    thumb = corpus.limit(4).select(
        "image_id", resize_thumbnail_udf(8)("bytes", "fmt").alias("thumb")
    )
    for r in thumb.collect():
        px = png_decode(bytes(r["thumb"]))
        assert px.shape == (8, 8, 3)


def test_real_jpeg_roundtrip_and_guards():
    """Round-4: the pure-numpy baseline JFIF codec is REAL — round-trips
    arbitrary sizes above the 40 dB gate at quality 100, rejects
    non-baseline flavors with precise errors, and decode_image routes real
    JFIF bytes to it (legacy stub bytes still decode)."""
    import numpy as np
    import pytest as _pytest

    from ghcrawler_spark.functions.images import decode_image, psnr
    from ghcrawler_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(3)
    for shape in [(16, 16, 3), (24, 40, 3), (33, 57, 3)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        enc = jpeg_encode(px, quality=100)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        dec = jpeg_decode(enc)
        assert dec.shape == px.shape
        assert psnr(dec, px) >= 40.0
        # decode_image routes by the SOI signature
        assert (decode_image(enc, "jpeg") == dec).all()
    # quality scaling is monotone in error
    px = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    p75 = psnr(jpeg_decode(jpeg_encode(px, 75)), px)
    p95 = psnr(jpeg_decode(jpeg_encode(px, 95)), px)
    assert p75 < p95
    # guards: truncation and non-baseline markers fail loudly
    enc = jpeg_encode(px, 90)
    with _pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])
    prog = bytearray(enc)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with _pytest.raises(ValueError):
        jpeg_decode(bytes(prog))
    with _pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")


def test_curation_gates_each_gate_fires_independently(spark):
    """v3 lane: every gate trips on exactly the row crafted to violate it,
    and only the clean row survives the conjunction."""
    from pyspark.sql import functions as F

    from ghcrawler_spark.functions.images import curation_gates

    good_caption = "a photograph of a small red boat on a calm lake"
    rows = [
        # (id, w, h, fmt, caption, expect: which gate fails — None = kept)
        (0, 800, 600, "png", good_caption, None),
        (1, 100, 250, "png", good_caption, "res_ok"),       # w below floor
        (2, 400, 150, "jpeg", good_caption, "res_ok"),      # h below floor
        (3, 2000, 400, "png", good_caption, "aspect_ok"),   # 5:1 panorama
        (4, 800, 600, "gif", good_caption, "fmt_ok"),       # disallowed fmt
        (5, 800, 600, "png", "tiny caption here", "caption_gate_ok"),  # <5 tok
        (6, 800, 600, "png", "a b c d e", "caption_gate_ok"),  # <20 chars
        (7, 800, 600, "jpeg", "x " * 2000, "caption_gate_ok"),  # >2048 chars
        # boundary rows: exactly at the limits must PASS
        (8, 200, 200, "png", good_caption, None),           # floor exactly
        (9, 600, 200, "jpeg", good_caption, None),          # aspect exactly 3
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "image_id long, w int, h int, fmt string, caption string",
    )
    gates = curation_gates(
        F.col("w"), F.col("h"), F.col("fmt"), F.col("caption")
    )
    out = {
        r["image_id"]: r
        for r in df.select(
            "image_id", *[v.alias(k) for k, v in gates.items()]
        ).collect()
    }
    for rid, _w, _h, _fmt, _cap, failing in rows:
        got = out[rid]
        assert got["kept"] == (failing is None), f"row {rid}"
        for gate in ("res_ok", "aspect_ok", "fmt_ok", "caption_gate_ok"):
            assert got[gate] == (gate != failing), f"row {rid} gate {gate}"
    assert out[0]["caption_tokens"] == len(good_caption.split())
