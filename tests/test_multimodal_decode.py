"""Real-decode path of multimodal_image_resize (VERDICT r03 item 7).

The operator's decode is no longer a fake: a from-scratch binary PPM (P6)
parser reads width/height from the payload BYTES and the resampler moves
actual raster pixels.  These tests pin the parser against hand-written
images (including netpbm edge cases: comments, multi-digit dims, malformed
input) and the resampler against a hand-computed nearest-neighbor result,
independent of the Spark pipeline; the SQL oracle then proves the same
arithmetic end-to-end through mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdatawork_spark.operators.pipeline_ops import _parse_ppm, _resize_nn


def _ppm(w, h, raster, header=None):
    return (header or b"P6\n%d %d\n255\n" % (w, h)) + raster


def test_parse_ppm_roundtrip():
    raster = bytes(range(2 * 3 * 3))  # 2x3 image, distinct byte per cell
    w, h, maxval, img = _parse_ppm(_ppm(2, 3, raster))
    assert (w, h, maxval) == (2, 3, 255)
    assert img.shape == (3, 2, 3) and img.dtype == np.uint8
    assert img.tobytes() == raster


def test_parse_ppm_comments_and_whitespace():
    # netpbm allows comments and arbitrary whitespace between header fields
    header = b"P6 # rgb thumb\n# full-line comment\n 12\t9 # dims\n255\n"
    raster = bytes((i * 5) % 256 for i in range(12 * 9 * 3))
    w, h, maxval, img = _parse_ppm(header + raster)
    assert (w, h, maxval) == (12, 9, 255)
    assert img.tobytes() == raster


@pytest.mark.parametrize(
    "payload, msg",
    [
        (b"P5\n2 2\n255\n" + b"\0" * 12, "not a P6"),
        (b"P6\n2 2\n65535\n" + b"\0" * 24, "16-bit"),
        (b"P6\n4 4\n255\n" + b"\0" * 5, "truncated"),
        (b"P6\n2", "truncated"),
    ],
)
def test_parse_ppm_malformed_raises(payload, msg):
    with pytest.raises(ValueError, match=msg):
        _parse_ppm(payload)


def test_resize_nn_hand_computed():
    # 4x2 image downsized to max side 2: tw=2, th=1; src cols = [0, 2],
    # src row = [0] — nearest-neighbor floor indexing
    img = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = _resize_nn(img, 2)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == img[0, 0].tolist()
    assert out[0, 1].tolist() == img[0, 2].tolist()


def test_resize_nn_never_zero_dim():
    img = np.zeros((1, 100, 3), dtype=np.uint8)  # extreme aspect ratio
    out = _resize_nn(img, 16)
    assert out.shape == (1, 16, 3)


def test_operator_checksum_matches_decode(spark, sf_dir):
    """End-to-end: re-derive one document's checksum outside Spark from the
    same deterministic raster and compare with the operator's output row."""
    from bigdatawork_spark.registry import QUERIES

    row = QUERIES["multimodal_image_resize"](spark, sf_dir).limit(1).collect()[0]
    did, w, h = row["doc_id"], row["width"], row["height"]
    px = ((did * 31 + 7 * np.arange(w * h * 3, dtype=np.int64)) % 256).astype(
        np.uint8
    )
    pw, ph, _, img = _parse_ppm(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
    assert (pw, ph) == (w, h)
    thumb = _resize_nn(img, 16)
    assert row["target_w"] == thumb.shape[1]
    assert row["target_h"] == thumb.shape[0]
    assert row["pix_checksum"] == int(thumb.sum(dtype=np.int64))


def test_iter_ppm_stream_multi_frame():
    from bigdatawork_spark.operators.pipeline_ops import _iter_ppm_stream

    f1 = b"P6\n2 1\n255\n" + bytes(range(6))
    f2 = b"P6\n1 2\n255\n" + bytes(range(100, 106))
    frames = list(_iter_ppm_stream(f1 + f2))
    assert [(w, h) for w, h, _ in frames] == [(2, 1), (1, 2)]
    assert frames[0][2].tobytes() == bytes(range(6))
    assert frames[1][2].tobytes() == bytes(range(100, 106))


def test_iter_ppm_stream_trailing_garbage_raises():
    from bigdatawork_spark.operators.pipeline_ops import _iter_ppm_stream

    good = b"P6\n1 1\n255\nabc"
    with pytest.raises(ValueError, match="not a P6"):
        list(_iter_ppm_stream(good + b"JUNK"))


def test_decode_wav_roundtrip():
    import io
    import wave

    from bigdatawork_spark.operators.pipeline_ops import _decode_wav

    pcm = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.tobytes())
    payload = buf.getvalue()
    assert len(payload) == 44 + 2 * len(pcm)  # canonical RIFF header
    sr, s = _decode_wav(payload)
    assert sr == 8000
    assert s.tolist() == pcm.tolist()


def test_decode_wav_rejects_stereo():
    import io
    import wave

    from bigdatawork_spark.operators.pipeline_ops import _decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\0\0" * 8)
    with pytest.raises(ValueError, match="mono"):
        _decode_wav(buf.getvalue())


# ---- property-based round-trips (pure Python, no Spark session) ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    max_side=st.integers(1, 64),
)
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_and_resize_properties(w, h, seed, max_side):
    rng = np.random.default_rng(seed)
    raster = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    pw, ph, maxval, img = _parse_ppm(b"P6\n%d %d\n255\n" % (w, h) + raster)
    assert (pw, ph, maxval) == (w, h, 255)
    assert img.tobytes() == raster  # lossless decode
    out = _resize_nn(img, max_side)
    th, tw = out.shape[0], out.shape[1]
    assert 1 <= tw and 1 <= th  # never a zero dim
    assert max(tw, th) <= max(max_side, 1)
    # every output pixel exists somewhere in the source (nearest neighbor
    # copies, never interpolates)
    src = {bytes(px) for row in img for px in row}
    assert all(bytes(px) in src for row in out for px in row)


@given(
    n=st.integers(1, 500),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_properties(n, sr, seed):
    import io
    import wave

    from bigdatawork_spark.operators.pipeline_ops import _decode_wav

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=n, dtype=np.int64).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    got_sr, s = _decode_wav(buf.getvalue())
    assert got_sr == sr
    assert s.tolist() == pcm.tolist()  # bit-exact PCM round-trip


@given(
    dims=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 8)), min_size=1, max_size=6
    ),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_stream_frame_count_and_order(dims, seed):
    from bigdatawork_spark.operators.pipeline_ops import _iter_ppm_stream

    rng = np.random.default_rng(seed)
    frames = [
        b"P6\n%d %d\n255\n" % (w, h)
        + rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        for w, h in dims
    ]
    got = list(_iter_ppm_stream(b"".join(frames)))
    assert [(w, h) for w, h, _ in got] == dims


# ---------------------------------------------------------------------------
# PNG codec (multimodal_png_decode, round 7): zlib inflate + filter reversal


def test_png_roundtrip_all_filters():
    from bigdatawork_spark.operators.pipeline_ops import _png_decode, _png_encode

    w, h = 5, 7  # 7 rows → every filter type 0..4 appears at least once
    raw = bytes((i * 11 + 3) % 256 for i in range(w * h * 3))
    blob = _png_encode(w, h, raw)
    w2, h2, pix, fsum = _png_decode(blob)
    assert (w2, h2) == (w, h)
    assert pix == raw  # inflate + filter reconstruction is byte-exact
    assert fsum == sum(r % 5 for r in range(h))


def test_png_decode_rejects_corruption():
    from bigdatawork_spark.operators.pipeline_ops import _png_decode, _png_encode

    blob = bytearray(_png_encode(4, 4, bytes(48)))
    with pytest.raises(ValueError, match="signature"):
        _png_decode(b"JUNK" + bytes(blob[4:]))
    # flip one IDAT byte: the chunk CRC must catch it
    idat_pos = bytes(blob).index(b"IDAT") + 6
    blob[idat_pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _png_decode(bytes(blob))


def test_png_roundtrip_properties():
    from bigdatawork_spark.operators.pipeline_ops import _png_decode, _png_encode

    rng = np.random.RandomState(7)
    for _ in range(12):
        w = int(rng.randint(1, 33))
        h = int(rng.randint(1, 26))
        raw = rng.randint(0, 256, size=w * h * 3, dtype=np.int64).astype(
            np.uint8
        ).tobytes()
        w2, h2, pix, _ = _png_decode(_png_encode(w, h, raw))
        assert (w2, h2) == (w, h) and pix == raw
