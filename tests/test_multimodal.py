"""Multimodal binary-column plumbing: schemas, batch shapes, determinism.

Codecs are deterministic stubs (no image/audio libs in the sandbox); what
these tests pin is the SPARK side: struct metadata columns, mapInPandas
signatures, explode shapes, bounded output rows, and reproducibility."""

import pytest
from pyspark.sql import functions as F

from ares_spark.operators.multimodal import (
    audio_stats,
    decode_image_features,
    resize_images,
    sample_video_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30).cache()


def test_media_schema(media):
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    img = media.filter(F.col("kind") == "image").first()
    assert img.meta.mime == "image/png" and img.meta.width >= 32


def test_image_features_shape_and_determinism(spark, media):
    f1 = decode_image_features(media, feature_dim=64).orderBy("media_id").collect()
    f2 = decode_image_features(media, feature_dim=64).orderBy("media_id").collect()
    assert len(f1) == 10  # every third row is an image
    for a, b in zip(f1, f2):
        assert a.media_id == b.media_id
        assert len(a.features) == 64
        assert a.features == b.features  # deterministic stub decode
        assert isinstance(a.phash, int)


def test_resize_bounded_output(spark, media):
    thumbs = resize_images(media, out_w=16, out_h=16).collect()
    assert len(thumbs) == 10
    for t in thumbs:
        assert len(bytes(t.thumb)) == 16 * 16 * 3  # bounded row size
        assert t.meta.width == 16 and t.meta.height == 16


def test_video_frame_sampling_explodes(spark, media):
    frames = sample_video_frames(media, every_ms=500)
    per_video = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert len(per_video) == 10
    assert all(r.n >= 1 for r in per_video)
    f = frames.first()
    assert len(bytes(f.frame)) <= 256 and f.ts_ms >= 0


def test_audio_stats(spark, media):
    stats = audio_stats(media).collect()
    assert len(stats) == 10
    for s in stats:
        assert s.n_samples > 0 and s.rms > 0


def test_metadata_filter_prunes_before_decode(spark, media):
    # filters on the typed meta struct never touch payload bytes
    wide = media.filter(F.col("meta.width") >= 48)
    assert wide.count() == media.filter((F.col("kind") == "image")).filter(
        F.col("meta.width") >= 48
    ).count()


# ---- REAL codec path (magic-byte dispatch; no libraries) ---------------------


def test_bmp_roundtrip_exact():
    import numpy as np

    from ares_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (17, 5)]:  # odd widths exercise row padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_wav_roundtrip_exact():
    import numpy as np

    from ares_spark.operators.multimodal import decode_wav, encode_wav

    pcm = (np.arange(-100, 100) * 50).astype(np.int16)
    got, rate = decode_wav(encode_wav(pcm, 8000))
    assert rate == 8000 and np.array_equal(got, pcm)


def test_real_media_decode_ground_truth(spark):
    import numpy as np

    from ares_spark.operators.multimodal import (
        decode_image_features,
        resize_images,
        synth_media_real,
    )

    media = synth_media_real(spark, n=12).cache()
    # image features come from REAL decoded gradients: mean_luma of the
    # gradient image is analytically ≈ (mean_x + mean_y + const)/3
    feats = {r.media_id: r for r in decode_image_features(media).collect()}
    img0 = media.filter("media_id = 'r0000'").first()
    w, h = img0.meta.width, img0.meta.height
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 255 // (w - 1)), (y * 255 // (h - 1)),
                   np.full((h, w), 42 % 256)], axis=2).astype(np.uint8)
    assert abs(feats["r0000"].mean_luma - float(px.mean())) < 1e-3  # f32 decode path
    # thumbnails are nearest-neighbor samples of the REAL pixels
    thumb = next(bytes(t.thumb) for t in resize_images(media, 4, 4).collect()
                 if t.media_id == "r0000")
    yi = (np.arange(4) * h // 4)[:, None]
    xi = (np.arange(4) * w // 4)[None, :]
    assert thumb == px[yi, xi, :].tobytes()


def test_real_wav_stats_ground_truth(spark):
    import math

    from ares_spark.operators.multimodal import audio_stats, synth_media_real

    media = synth_media_real(spark, n=12)
    stats = {r.media_id: r for r in audio_stats(media).collect()}
    s = stats["r0001"]  # 1s of 330 Hz sine at amplitude 10000, 8 kHz
    assert s.n_samples == 8000
    assert abs(s.rms - 10_000 / math.sqrt(2)) < 60  # sine RMS = A/√2
    assert s.clip_ratio == 0.0


# ---- PNG: real decode (stdlib zlib + unfiltering) ------------------------------


def test_png_roundtrip_every_filter():
    """encode→decode is pixel-exact for each filter type alone and for the
    mixed 0..4 cycle (all unfilter paths exercised on real deflate bytes)."""
    import numpy as np

    from ares_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for f in range(5):
        assert (decode_png(encode_png(px, row_filters=[f])) == px).all(), f
    assert (decode_png(encode_png(px)) == px).all()


def test_png_decode_handcrafted_bytes():
    """Decoder pinned against PNG bytes built BY HAND from RFC 2083 — not
    via encode_png — so an encoder/decoder twin bug cannot self-cancel.
    2x2 RGB, row 0 filter None, row 1 filter Sub (recon[x]=filt[x]+left)."""
    import struct
    import zlib

    import numpy as np

    from ares_spark.operators.multimodal import decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    # row0: filter 0, pixels (10,20,30) (40,50,60)
    # row1: filter 1, filtered bytes (1,2,3) (4,5,6)
    #   -> recon px: (1,2,3) then (1+4, 2+5, 3+6) = (5,7,9)
    scan = bytes([0, 10, 20, 30, 40, 50, 60]) + bytes([1, 1, 2, 3, 4, 5, 6])
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    got = decode_png(blob)
    want = np.array([[[10, 20, 30], [40, 50, 60]], [[1, 2, 3], [5, 7, 9]]],
                    dtype=np.uint8)
    assert (got == want).all()
    # corrupted CRC must be refused, not decoded
    bad = bytearray(blob)
    bad[-5] ^= 0xFF  # IEND crc
    import pytest as _pytest
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_decode_paeth_handcrafted():
    """Paeth path against hand-computed predictor values (RFC 2083 §6.6):
    2x2 gray (1 channel), row 1 filter 4."""
    import struct
    import zlib

    import numpy as np

    from ares_spark.operators.multimodal import decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # gray
    # row0: None -> (100, 200)
    # row1: Paeth, filt (7, 9):
    #   x=0: a=0,b=100,c=0 -> p=100, pa=100,pb=0 -> pred=b=100 -> 107
    #   x=1: a=107,b=200,c=100 -> p=207, pa=100,pb=7,pc=107 -> pred=200 -> 209
    scan = bytes([0, 100, 200]) + bytes([4, 7, 9])
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    got = decode_png(blob)
    assert (got == np.array([[[100], [200]], [[107], [209]]], dtype=np.uint8)).all()


def test_png_media_features_through_engine(spark):
    """synth_media_png drives the full decode_image_features Arrow pass;
    luma equals the gradient's analytic mean (same formula as the m03
    DuckDB oracle)."""
    import numpy as np

    from ares_spark.operators.multimodal import decode_image_features, synth_media_png

    got = {r.media_id: r.mean_luma
           for r in decode_image_features(synth_media_png(spark, n=6)).collect()}
    assert len(got) == 6
    for i in range(6):
        w, h = 20 + (i % 3) * 7, 14 + (i % 2) * 9
        y, x = np.mgrid[0:h, 0:w]
        want = np.stack([(x * 255 // (w - 1)), (y * 255 // (h - 1)),
                         np.full((h, w), (42 + i) % 256)], axis=2).mean()
        assert abs(got[f"p{i:04d}"] - want) < 1e-9, i


# ---- MP4 container: real box walk + sample table -------------------------------


def test_mp4_container_roundtrip_and_handcrafted():
    """parse_mp4_samples pinned on a hand-built box tree (not just the
    muxer's output): 2 frames at explicit offsets, 64-bit largesize box
    tolerated, corrupt size refused."""
    import struct

    import pytest as _pytest

    from ares_spark.operators.multimodal import encode_mp4_stub, parse_mp4_samples

    frames = [b"alpha-frame", b"bb", b"the-third-frame!"]
    blob = encode_mp4_stub(frames, fps=4)
    got = parse_mp4_samples(blob)
    assert [f for _, _, f in got] == frames
    assert [t for t, _, _ in got] == [0, 250, 500]  # 4 fps -> 250 ms
    assert all(d == 250 for _, d, _ in got)
    # corrupt a box size -> loud failure
    bad = bytearray(blob)
    struct.pack_into(">I", bad, 0, 4)  # ftyp size < 8
    with _pytest.raises(ValueError, match="bad MP4 box size"):
        parse_mp4_samples(bytes(bad))
    with _pytest.raises(ValueError, match="no ftyp"):
        parse_mp4_samples(b"\x00\x00\x00\x08free")


def test_mp4_frame_sampling_through_engine(spark):
    """sample_video_frames dispatches on the ftyp magic and emits REAL
    frames at sample-table timestamps; non-MP4 payloads keep the
    documented fake-slicing path."""
    import hashlib

    from ares_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_mp4_stub, sample_video_frames,
    )

    frames = [f"frame-{i:02d}-".encode() * 3 for i in range(10)]
    blob = encode_mp4_stub(frames, fps=10)  # 100 ms apart
    rows = [
        ("v0", "video", blob,
         {"mime": "video/mp4", "width": None, "height": None,
          "n_channels": None, "duration_ms": 1000, "sample_rate": None}),
        ("v1", "video", hashlib.sha256(b"x").digest() * 64,
         {"mime": "video/raw-frames", "width": None, "height": None,
          "n_channels": None, "duration_ms": 4000, "sample_rate": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_video_frames(media, every_ms=300).collect()
    v0 = sorted((r.frame_idx, r.ts_ms, bytes(r.frame)) for r in got if r.media_id == "v0")
    # 10 frames at 0..900 ms sampled every 300 ms -> ts 0, 300, 600, 900
    assert [(i, t) for i, t, _ in v0] == [(0, 0), (1, 300), (2, 600), (3, 900)]
    assert [f for _, _, f in v0] == [frames[0], frames[3], frames[6], frames[9]]
    assert any(r.media_id == "v1" for r in got)  # fake path still works


def test_jpeg_flat_even_gray_roundtrip_exact():
    """The m01 oracle's foundation: flat gray with an even value survives
    the full lossy pipeline EXACTLY (DC = 8·(v−128) is a multiple of the
    Annex-K luma DC quantizer 16; Cb=Cr=128), including edge padding on
    non-multiple-of-8 dims."""
    import numpy as np

    from ares_spark.operators.multimodal import decode_jpeg, encode_jpeg

    for v, (h, w) in [(84, (14, 20)), (136, (23, 27)), (240, (9, 11)), (2, (8, 8))]:
        px = np.full((h, w, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert out.shape == (h, w, 3)
        assert (out == v).all(), (v, h, w)


def test_jpeg_gradient_roundtrip_bounded_error():
    """Lossy but sane: Annex-K quantization of a smooth gradient stays
    within a small per-pixel error bound and preserves the global mean."""
    import numpy as np

    from ares_spark.operators.multimodal import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:24, 0:33]
    px = np.stack([(x * 255 // 32), (y * 255 // 23),
                   np.full((24, 33), 77)], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 40
    assert abs(float(out.mean()) - float(px.mean())) < 2.0


def test_jpeg_decode_handcrafted_bytes():
    """Decoder pinned against JPEG bytes assembled BY HAND from the
    ITU-T.81 framing — not via encode_jpeg — so an encoder/decoder twin
    bug cannot self-cancel. One 8x8 grayscale block, flat value 200:
    DC diff 36 (size 6, bits 100100) under a hand-built 1-bit Huffman
    table, EOB; entropy data is the single byte 0b01001000."""
    import struct

    import numpy as np

    from ares_spark.operators.multimodal import _ZIGZAG, decode_jpeg

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qt = np.full((8, 8), 16, dtype=int)
    dqt = seg(0xDB, bytes([0]) + bytes(int(qt[r, c]) for r, c in _ZIGZAG))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    # DC table: one code '0' (len 1) -> symbol 6; AC table: '0' -> EOB
    dht_dc = seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([6]))
    dht_ac = seg(0xC4, bytes([0x10, 1] + [0] * 15) + bytes([0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blob = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + bytes([0b01001000]) + b"\xff\xd9")
    out = decode_jpeg(blob)
    # DC 36 × q 16 = 576; IDCT constant 576/8 = 72; +128 = 200
    assert out.shape == (8, 8, 3) and (out == 200).all()


def test_jpeg_refuses_unsupported_variants():
    """Progressive (SOF2) and subsampled streams fail loudly — never a
    silent mis-decode."""
    import re
    import struct

    import numpy as np
    import pytest

    from ares_spark.operators.multimodal import decode_jpeg, encode_jpeg

    blob = bytearray(encode_jpeg(np.full((8, 8, 3), 100, dtype=np.uint8)))
    i = blob.find(b"\xff\xc0")
    # SOF2 is now SUPPORTED (r5) — but flipping the marker on a baseline
    # stream yields an INVALID progressive scan header (full-band Ss=0,
    # Se=63 is neither a DC nor an AC scan) and must still refuse
    prog = bytes(blob[:i + 1]) + b"\xc2" + bytes(blob[i + 2:])
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(prog)
    # hierarchical/lossless SOF variants stay refused
    lossless = bytes(blob[:i + 1]) + b"\xc3" + bytes(blob[i + 2:])
    with pytest.raises(ValueError, match="SOF0/SOF2"):
        decode_jpeg(lossless)
    # 2x2/2x1 sampling is SUPPORTED since r5; factor 3 stays out of the
    # T.81 {1,2,4} set and must refuse
    sub = bytearray(blob)
    sub[i + 11] = 0x33  # luma sampling 3x3 — invalid factor
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(sub))
    # restart intervals are SUPPORTED since r5: a declared DRI larger
    # than the MCU count (no RSTn in the stream) decodes identically...
    base = decode_jpeg(bytes(blob))
    dri = bytes(blob[:i]) + b"\xff\xdd\x00\x04\x00\x08" + bytes(blob[i:])
    assert np.array_equal(decode_jpeg(dri), base)
    # ...and a zero interval still means "no restarts"
    dri0 = bytes(blob[:i]) + b"\xff\xdd\x00\x04\x00\x00" + bytes(blob[i:])
    assert np.array_equal(decode_jpeg(dri0), base)
    # an RSTn in the entropy stream with NO declared DRI must refuse
    # (desyncing silently would decode garbage)
    assert blob[-2:] == b"\xff\xd9"
    rst = bytes(blob[:-2]) + b"\xff\xd0" + bytes(blob[-2:])
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(rst)
    # a second SOS re-naming an already-decoded component must refuse,
    # not silently re-decode it (baseline multi-scan is only legal over
    # DISJOINT component sets)
    sos2 = bytes(blob[:-2]) + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="scanned twice"):
        decode_jpeg(sos2)


def test_jpeg_media_features_through_engine(spark):
    """decode_image_features over real JPEG payloads: exact luma per the
    construction (flat even gray) — the Spark path m01 rides on."""
    from pyspark.sql import functions as F

    from ares_spark.operators.multimodal import decode_image_features, synth_media_jpeg

    got = {r.media_id: r.mean_luma
           for r in decode_image_features(synth_media_jpeg(spark, n=4)).collect()}
    assert got == {"j0000": 84.0, "j0001": 136.0, "j0002": 188.0, "j0003": 240.0}


def test_jpeg_progressive_decodes_identical_to_baseline():
    """SOF2 (VERDICT r4 #9): progressive encode quantizes identically to
    baseline, and the spectral-selection + successive-approximation scan
    decode reconstructs the EXACT coefficient store — so decoded pixels
    are bit-for-bit equal to the baseline round-trip. Shapes chosen to
    hit edge padding, grayscale, and long EOB-run / ZRL paths."""
    import numpy as np

    from ares_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    cases = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
             for h, w in [(8, 8), (7, 26), (34, 27), (16, 16)]]
    cases.append(rng.integers(0, 256, (17, 9), dtype=np.uint8))  # grayscale
    sparse = np.zeros((64, 64, 3), dtype=np.uint8)  # EOBRUN>1 + ZRL heavy
    sparse[10:12, 30:33] = 255
    cases.append(sparse)
    cases.append(np.full((14, 20, 3), 84, dtype=np.uint8))  # flat exact
    for img in cases:
        base = decode_jpeg(encode_jpeg(img))
        prog_blob = encode_jpeg_progressive(img)
        # really progressive: SOF2 marker + multiple SOS scans
        assert b"\xff\xc2" in prog_blob and prog_blob.count(b"\xff\xda") >= 4
        assert (decode_jpeg(prog_blob) == base).all()
    flat = np.full((14, 20, 3), 84, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(flat)) == flat).all()


def test_jpeg_progressive_through_engine(spark):
    """m01's Spark path over SOF2 payloads: flat even-gray progressive
    fixtures decode to their constructed gray value exactly."""
    from pyspark.sql import functions as F

    from ares_spark.operators.multimodal import (
        decode_image_features, synth_media_jpeg,
    )

    media = synth_media_jpeg(spark, n=2, progressive=True)
    got = {r.media_id: r.luma for r in decode_image_features(media).select(
        "media_id", F.round("mean_luma", 3).alias("luma")).collect()}
    assert got == {"jp0000": 86.0, "jp0001": 138.0}


def test_jpeg_subsampled_and_restart():
    """4:2:0 / 4:2:2 sampling + restart intervals (r5, the two variants
    that dominate a real Common-Crawl image corpus). Pins:
      - restart invariance: RSTn segmentation changes only entropy
        framing (byte-aligned segments, DC predictor resets), so decode
        is bit-identical at every interval, for 4:4:4 and 4:2:0 alike;
      - chroma-flat exactness: images whose Cb/Cr are constant decode
        IDENTICALLY under 4:2:0 and 4:4:4 (box decimation and
        replication upsampling are exact for flat planes);
      - the emitted stream really is subsampled/restart-marked."""
    import numpy as np

    from ares_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    S420 = [(2, 2), (1, 1), (1, 1)]
    img = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
    d444 = decode_jpeg(encode_jpeg(img))
    d420 = decode_jpeg(encode_jpeg(img, sampling=S420))
    for R in (1, 2, 5):
        br = encode_jpeg(img, restart_interval=R)
        assert b"\xff\xdd" in br and b"\xff\xd0" in br
        assert np.array_equal(decode_jpeg(br), d444), f"444 DRI={R}"
        br420 = encode_jpeg(img, sampling=S420, restart_interval=R)
        assert np.array_equal(decode_jpeg(br420), d420), f"420 DRI={R}"
    # grayscale-content RGB (chroma flat 128): 420 == 444 exactly
    g = rng.integers(0, 256, (19, 26), dtype=np.uint8)
    rgbg = np.repeat(g[:, :, None], 3, axis=2)
    blob420 = encode_jpeg(rgbg, sampling=S420)
    # SOF declares 2x2 luma sampling → really subsampled
    i = blob420.find(b"\xff\xc0")
    assert blob420[i + 11] == 0x22
    assert np.array_equal(decode_jpeg(blob420), decode_jpeg(encode_jpeg(rgbg)))
    # constant color (chroma flat at a non-128 value): exact across
    # 4:4:4 / 4:2:0 / 4:2:2+DRI, within quantization of the constant
    flat = np.full((18, 23, 3), (37, 91, 203), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(flat))
    assert np.array_equal(a, decode_jpeg(encode_jpeg(flat, sampling=S420)))
    assert np.array_equal(a, decode_jpeg(encode_jpeg(
        flat, sampling=[(2, 1), (1, 1), (1, 1)], restart_interval=1)))
    # corrupt restart sequencing must refuse, not desync
    br = bytearray(encode_jpeg(img, restart_interval=1))
    j = br.find(b"\xff\xd0")
    assert j > 0
    br[j + 1] = 0xD5  # out-of-order RSTn
    try:
        decode_jpeg(bytes(br))
        raise AssertionError("out-of-order RSTn not refused")
    except ValueError as exc:
        assert "restart" in str(exc)


def test_jpeg_subsampled_through_engine(spark):
    """m01's Spark path over 4:2:0+DRI payloads: flat even-gray decodes
    to the constructed value exactly through decimation and resync."""
    from pyspark.sql import functions as F

    from ares_spark.operators.multimodal import (
        decode_image_features, synth_media_jpeg,
    )

    media = synth_media_jpeg(spark, n=2, subsampled=True)
    got = {r.media_id: r.luma for r in decode_image_features(media).select(
        "media_id", F.round("mean_luma", 3).alias("luma")).collect()}
    assert got == {"js0000": 88.0, "js0001": 140.0}
