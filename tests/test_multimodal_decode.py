"""Real (numpy-only) image decode tier: PPM/PGM parsing, content features,
nearest-neighbor resize — pinned against locally-computed expectations on
generated fixtures (no codec library exists in this container, so the
uncompressed netpbm formats ARE the real-decode surface)."""

import numpy as np
import pytest

from codecdb_queryengine_spark.operators import multimodal as M


def _ppm(w, h, px=None, comment=False):
    if px is None:
        px = (np.arange(w * h * 3, dtype=np.uint64) % 251).astype(np.uint8).reshape(h, w, 3)
    head = b"P6\n"
    if comment:
        head += b"# a comment line\n"
    head += f"{w} {h}\n255\n".encode()
    return head + px.tobytes(), px


def _pgm(w, h):
    px = (np.arange(w * h, dtype=np.uint64) % 241).astype(np.uint8).reshape(h, w, 1)
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes(), px


def test_decode_ppm_roundtrip_and_comments():
    payload, px = _ppm(7, 5, comment=True)
    w, h, got = M.decode_image(payload)
    assert (w, h) == (7, 5)
    assert np.array_equal(got, px)


def test_decode_pgm_replicates_gray_to_rgb():
    payload, px = _pgm(4, 3)
    w, h, got = M.decode_image(payload)
    assert (w, h) == (4, 3)
    assert np.array_equal(got, np.repeat(px, 3, axis=2))


def test_decode_rejects_non_images_and_garbage_headers():
    assert M.decode_image(b"hello world, not an image") is None
    assert M.decode_image(b"P6\nnot numbers\n") is None
    assert M.decode_image(b"P6\n4 4\n65535\n" + b"\0" * 96) is None  # 2-byte samples
    with pytest.raises(NotImplementedError):
        M.decode_image(None)


def test_image_features_match_local_numpy():
    payload, px = _ppm(8, 4)
    feats = M.decode_features(payload)
    f = px.astype(np.float64) / 255.0
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    want = [
        np.log1p(8), np.log1p(4), 2.0,
        f[:, :, 0].mean(), f[:, :, 1].mean(), f[:, :, 2].mean(),
        luma.std(), np.abs(np.diff(luma, axis=1)).mean(),
    ]
    assert feats == pytest.approx(want)
    # non-image payloads take the stub tier with the same dimensionality
    stub = M.decode_features(b"plain text")
    assert len(stub) == len(feats) == M.FEATURE_DIM


def test_resize_real_pixels_nearest_neighbor():
    payload, px = _ppm(6, 6)
    out = M.resize_image(payload, 3, 2)
    w, h, got = M.decode_image(out)
    assert (w, h) == (3, 2)
    ys = (np.arange(2) * 6) // 2
    xs = (np.arange(3) * 6) // 3
    assert np.array_equal(got, px[ys][:, xs])


def test_extract_features_auto_tier_through_spark(spark):
    payload, px = _ppm(5, 5)
    rows = [
        (1, "image", bytearray(payload), 5, 5),
        (2, "text", bytearray(b"just words"), 10, 1),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r.media_id: list(r.feature) for r in M.extract_features(media).collect()}
    assert got[1] == pytest.approx(M.image_features(5, 5, px))
    assert got[2] == pytest.approx(M.decode_stub(b"just words"))


def _y4m(w, h, n_frames):
    frames = []
    payload = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    for k in range(n_frames):
        y = ((np.arange(w * h, dtype=np.uint64) + 10 * k) % 256).astype(np.uint8)
        frames.append(y.reshape(h, w))
        payload += b"FRAME\n" + y.tobytes() + bytes((w * h) // 2)
    return payload, frames


def test_decode_y4m_frames():
    payload, frames = _y4m(4, 2, 3)
    w, h, got = M.decode_y4m(payload)
    assert (w, h) == (4, 2) and len(got) == 3
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    assert M.decode_y4m(b"not a video") is None


def test_decode_wav_and_features():
    import struct

    sr = 8000
    samples = (np.sin(np.linspace(0, 40, 800)) * 20000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    srr, ch, ss = M.decode_wav(wav)
    assert (srr, ch, len(ss)) == (8000, 1, 800)
    feats = M.decode_features(wav)
    mono = ss.mean(axis=1)
    assert feats[3] == pytest.approx(np.sqrt((mono**2).mean()))  # rms
    assert len(feats) == M.FEATURE_DIM
    # a non-PCM RIFF falls through to the stub tier
    not_pcm = wav[:20] + struct.pack("<H", 3) + wav[22:]
    assert M.decode_wav(not_pcm) is None


def test_frame_sample_real_y4m_through_spark(spark):
    payload, frames = _y4m(4, 2, 6)
    rows = [(7, "video", bytearray(payload), 4, 2)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = sorted(
        M.frame_sample(media, max_frames=3).collect(), key=lambda r: r.frame_idx
    )
    assert len(got) == 3
    # stride 2 over 6 frames -> frames 0, 2, 4, as raw luma planes
    for row, want in zip(got, [frames[0], frames[2], frames[4]]):
        assert bytes(row.frame_payload) == want.tobytes()


def _bmp(w, h, px=None, top_down=False):
    import struct

    if px is None:
        px = (np.arange(w * h * 3, dtype=np.uint64) % 239).astype(np.uint8).reshape(h, w, 3)
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\0" * (row_bytes - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    return bytes(head + info + body), px


def test_decode_bmp_bottom_up_and_top_down():
    for top_down in (False, True):
        payload, px = _bmp(5, 3, top_down=top_down)
        w, h, got = M.decode_image(payload)
        assert (w, h) == (5, 3)
        assert np.array_equal(got, px)
    # compressed/odd-bpp BMPs fall through to None (stub tier)
    payload, _ = _bmp(4, 4)
    rle = payload[:30] + (1).to_bytes(4, "little") + payload[34:]
    assert M.decode_image(rle) is None


def test_decode_y4m_rejects_high_bitdepth_and_parses_8bit_aliases():
    """C420p10/p12/p16 have 2-byte samples this 8-bit reader must NOT
    mis-slice (r5 review: a prefix match on '420' accepted them); the
    8-bit alias tags (C420jpeg/C420mpeg2/C420paldv) all parse."""
    payload, frames = _y4m(4, 2, 2)
    for alias in (b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        w, h, got = M.decode_y4m(payload.replace(b"C420", alias))
        assert (w, h) == (4, 2) and len(got) == 2
        assert np.array_equal(got[0], frames[0])
    for deep in (b"C420p10", b"C420p12", b"C420p16", b"C422p10"):
        assert M.decode_y4m(payload.replace(b"C420", deep)) is None


def test_perceptual_hash_bits_known_image():
    # 2x2 image: luma row0 rises (bit0=1), row1 falls (bit1=0)
    px = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]],
        dtype=np.uint8,
    )
    assert M.perceptual_hash_bits(px) == 0b01
    # constant image: no strict rise anywhere -> 0
    flat = np.full((2, 4, 3), 7, dtype=np.uint8)
    assert M.perceptual_hash_bits(flat) == 0
    # width 1 (no neighbor pairs) and oversize (>63 bits) are undefined
    assert M.perceptual_hash_bits(np.zeros((3, 1, 3), dtype=np.uint8)) is None
    assert M.perceptual_hash_bits(np.zeros((9, 9, 3), dtype=np.uint8)) is None
    # 8x8 (56 bits) is the production resize target and must be accepted
    assert M.perceptual_hash_bits(np.zeros((8, 8, 3), dtype=np.uint8)) == 0


def test_perceptual_hash_spark_identical_payloads_collide(spark):
    header = b"P6\n2 2\n255\n"
    img_a = header + bytes([0, 0, 0, 255, 255, 255, 255, 255, 255, 0, 0, 0])
    img_b = header + bytes(range(12))
    rows = [(0, img_a), (1, img_a), (2, img_b), (3, b"not an image")]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in M.perceptual_hash(media).collect()}
    assert out[0]["phash"] == out[1]["phash"] == 1
    assert out[2]["phash"] is not None and out[2]["phash"] != 1
    assert out[3]["phash"] is None and out[3]["width"] is None
