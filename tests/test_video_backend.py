"""The r19 re-encoded-video frame tap (multimodal.py
``_video_blob_frame_pixels`` / ``_imageio_frame_pixels``): the
H.264-tier seam behind ``video_frame_hashes(backend='auto')``.

This container has no imageio/pyav/ffmpeg, so the seam's plumbing is
driven through an injected stub module (same shape as the real
imageio.v3 surface) and the real-codec equivalence test is gated on
the import, like test_png_pil_backend.
"""
import sys
import types

import numpy as np
import pytest

from dwc_dataframe_validator_spark.operators import multimodal as mm


def _mp4ish() -> bytes:
    return bytes(4) + b"ftyp" + b"isom" + bytes(64)


def _h264_avi() -> bytes:
    """An AVI whose vids handler is not MJPG — the honest tier."""
    frames = [mm.jpeg_encode(np.zeros((8, 8, 3), np.uint8))]
    blob = mm.avi_mjpeg_encode(frames, 8, 8)
    assert b"vidsMJPG" in blob
    return blob.replace(b"vidsMJPG", b"vidsH264", 1)


def _install_stub_imageio(monkeypatch, frames):
    v3 = types.ModuleType("imageio.v3")

    def imread(_buf, index=None):
        return np.asarray(frames)

    v3.imread = imread
    pkg = types.ModuleType("imageio")
    pkg.v3 = v3
    monkeypatch.setitem(sys.modules, "imageio", pkg)
    monkeypatch.setitem(sys.modules, "imageio.v3", v3)


def test_pure_backend_never_taps():
    # oracle determinism: 'pure' yields no frames for H.264-tier
    # containers even if a codec were importable
    assert mm._video_blob_frame_pixels(_mp4ish(), 4, "pure") is None
    with pytest.raises(NotImplementedError):
        mm.avi_mjpeg_frames(_h264_avi())
    assert mm._video_blob_frame_pixels(_h264_avi(), 4, "pure") is None


def test_missing_backend_is_honest_boundary():
    # no imageio in this container: auto degrades to no-frames
    # (→ one ok=false row), never an exception
    assert not mm._video_backend_available()
    assert mm._video_blob_frame_pixels(_mp4ish(), 4, "auto") is None
    assert mm._video_blob_frame_pixels(_h264_avi(), 4, "auto") is None


def test_stubbed_tap_feeds_the_hash_grid(monkeypatch):
    rng = np.random.default_rng(7)
    frames = (rng.random((6, 16, 16, 3)) * 255).astype(np.uint8)
    _install_stub_imageio(monkeypatch, frames)
    monkeypatch.setattr(mm, "_video_backend_available", lambda: True)
    got = mm._video_blob_frame_pixels(_mp4ish(), 4, "auto")
    assert got is not None and len(got) == 4
    # even stride over 6 frames: step 1 → frames 0..3
    for k in range(4):
        assert np.array_equal(got[k], frames[k])
        assert got[k].dtype == np.uint8 and got[k].shape == (16, 16, 3)
    # the non-MJPG AVI falls through to the same tap
    got = mm._video_blob_frame_pixels(_h264_avi(), 4, "auto")
    assert got is not None and len(got) == 4
    # grayscale single-image decode normalizes to (h, w, 3)
    _install_stub_imageio(monkeypatch, (rng.random((12, 10)) * 255
                                        ).astype(np.uint8))
    got = mm._video_blob_frame_pixels(_mp4ish(), 4, "auto")
    assert len(got) == 1 and got[0].shape == (12, 10, 3)
    # undecodable payload → honest None

    def broken(_buf, index=None):
        raise OSError("cannot decode")

    sys.modules["imageio.v3"].imread = broken
    assert mm._video_blob_frame_pixels(_mp4ish(), 4, "auto") is None


def test_codec_free_paths_untouched_by_backend(monkeypatch):
    # MJPEG AVI and GIF decode identically whether or not the tap
    # exists — the tap only ever ADDS coverage
    rng = np.random.default_rng(11)
    px = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    blob = mm.avi_mjpeg_encode([mm.jpeg_encode(px)] * 3, 8, 8)
    base = mm._video_blob_frame_pixels(blob, 4, "pure")
    monkeypatch.setattr(mm, "_video_backend_available", lambda: True)
    _install_stub_imageio(monkeypatch, np.zeros((2, 4, 4, 3), np.uint8))
    tapped = mm._video_blob_frame_pixels(blob, 4, "pure")
    assert len(base) == len(tapped) == 3
    for a, b in zip(base, tapped):
        assert np.array_equal(a, b)


@pytest.mark.skipif(not mm._video_backend_available(),
                    reason="imageio/pyav not installed")
def test_real_reencode_merges_with_mjpeg_class(spark):
    """Backend equivalence with the REAL codec: an H.264/VP9
    re-encode of an MJPEG class must land in the same
    video_near_dup cluster (runs only where imageio+pyav import)."""
    import io

    import imageio.v3 as iio

    rng = np.random.default_rng(5)
    px = [(rng.random((32, 32, 3)) * 255).astype(np.uint8)
          for _ in range(4)]
    avi = mm.avi_mjpeg_encode([mm.jpeg_encode(p) for p in px], 32, 32)
    buf = io.BytesIO()
    iio.imwrite(buf, np.stack(px), extension=".mp4", fps=4)
    rows = [(1, bytearray(avi)), (2, bytearray(buf.getvalue()))]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = mm.video_near_dup(df, threshold=10, backend="auto").collect()
    clusters = {r["id"]: r["cluster"] for r in out}
    assert clusters[1] == clusters[2]
