"""Native JPEG decode pipeline: numerics vs PIL, throughput sanity."""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def jpeg_files(tmp_path):
    rs = np.random.RandomState(0)
    paths = []
    for i in range(8):
        img = rs.randint(0, 255, (48, 64, 3), np.uint8)
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_native_decode_matches_pil(jpeg_files):
    native = pytest.importorskip("focus_tpu.native")
    if not native.available():
        pytest.skip("native decode unavailable (no g++/libjpeg)")
    out = native.decode_jpeg_batch(jpeg_files, 48, 64, num_threads=2)
    assert out.shape == (8, 48, 64, 3)
    for i, p in enumerate(jpeg_files):
        ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(out[i], ref, atol=1e-3)


def test_native_decode_resize_and_normalize(tmp_path):
    """Downscale of a smooth gradient (PIL antialiases downsamples; the
    native path is cv2-style point bilinear, so only compare on smooth
    content)."""
    native = pytest.importorskip("focus_tpu.native")
    if not native.available():
        pytest.skip("native decode unavailable")
    gx, gy = np.meshgrid(np.linspace(0, 255, 64), np.linspace(0, 255, 48))
    img = np.stack([gx, gy, (gx + gy) / 2], -1).astype(np.uint8)
    p = str(tmp_path / "grad.jpg")
    Image.fromarray(img).save(p, quality=98)
    mean, std = (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)
    out = native.decode_jpeg_batch([p], 24, 32, mean=mean, std=std)
    assert out.shape == (1, 24, 32, 3)
    ref_img = Image.open(p).convert("RGB").resize((32, 24), Image.BILINEAR)
    ref = (np.asarray(ref_img, np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out[0][2:-2, 2:-2], ref[2:-2, 2:-2], atol=0.12)


def test_native_decode_handles_missing_file(jpeg_files):
    native = pytest.importorskip("focus_tpu.native")
    if not native.available():
        pytest.skip("native decode unavailable")
    # any decode failure -> None, so callers fall back to the retrying
    # PIL path instead of silently shipping black frames (round-4
    # advisor finding)
    out = native.decode_jpeg_batch(
        [jpeg_files[0], "/nonexistent/x.jpg"], 16, 16
    )
    assert out is None
    out_u8 = native.decode_jpeg_batch_u8(
        [jpeg_files[0], "/nonexistent/x.jpg"], 16, 16
    )
    assert out_u8 is None
    # an all-good batch still decodes
    ok = native.decode_jpeg_batch([jpeg_files[0]], 16, 16)
    assert ok is not None and ok.shape == (1, 16, 16, 3)


def test_jpeg_dims(jpeg_files):
    native = pytest.importorskip("focus_tpu.native")
    if not native.available():
        pytest.skip("native decode unavailable")
    assert native.jpeg_dims(jpeg_files[0]) == (64, 48)


def test_native_decode_u8_matches_f32(jpeg_files):
    """uint8 output path = f32 path rounded to the nearest byte."""
    native = pytest.importorskip("focus_tpu.native")
    if not native.available():
        pytest.skip("native decode unavailable")
    f32 = native.decode_jpeg_batch(
        jpeg_files, 32, 48, mean=(0, 0, 0), std=(1, 1, 1), scale=1.0,
        num_threads=2,
    )
    u8 = native.decode_jpeg_batch_u8(jpeg_files, 32, 48, num_threads=2)
    assert u8.dtype == np.uint8
    np.testing.assert_allclose(
        u8.astype(np.float32), f32, atol=0.501
    )


def test_native_decode_u8_dct_scale(tmp_path):
    """DCT-scaled decode engages on >=2x downscales and stays close to
    the full-resolution bilinear on smooth content (it is an
    area-average + bilinear filter, not bit-identical)."""
    native = pytest.importorskip("focus_tpu.native")
    if not native.available():
        pytest.skip("native decode unavailable")
    gx, gy = np.meshgrid(np.linspace(0, 255, 512), np.linspace(0, 255, 384))
    img = np.stack([gx, gy, (gx + gy) / 2], -1).astype(np.uint8)
    p = str(tmp_path / "grad.jpg")
    Image.fromarray(img).save(p, quality=95)
    plain = native.decode_jpeg_batch_u8([p], 48, 64, num_threads=1)
    dct = native.decode_jpeg_batch_u8([p], 48, 64, num_threads=1,
                                      dct_scale=True)
    assert np.abs(
        plain.astype(np.float32) - dct.astype(np.float32)
    ).mean() < 2.0
