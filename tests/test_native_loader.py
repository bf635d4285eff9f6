"""Native C++ loader parity: decode vs PIL, resize vs core.resize, full
sample path vs the Python pipeline, threaded batch sanity."""

import numpy as np
import pytest

from tpu_diinn.native import loader as nl
from tpu_diinn.core.resize import resize_np

pytestmark = pytest.mark.skipif(
    not nl.available(), reason=f"native loader unavailable: "
                               f"{nl.build_error()}")

IMG = "/root/reference/images/overview.png"


def _png(tmp_path, arr):
    from PIL import Image
    p = tmp_path / "t.png"
    Image.fromarray(arr).save(p)
    return str(p)


def test_decode_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    arr = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    p = _png(tmp_path, arr)
    got = nl.decode_image(p)
    np.testing.assert_array_equal(got, arr)
    assert nl.image_size(p) == (37, 53)


def test_decode_jpeg(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = (rng.random((24, 31, 3)) * 255).astype(np.uint8)
    p = tmp_path / "t.jpg"
    Image.fromarray(arr).save(p, quality=95)
    got = nl.decode_image(str(p))
    want = np.asarray(Image.open(p).convert("RGB"))
    # both decode the same jpeg stream; allow libjpeg version wiggle
    assert got.shape == want.shape
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0


@pytest.mark.parametrize("in_size,out_size", [
    ((97, 151), (48, 48)), ((48, 48), (97, 151)), ((64, 64), (64, 64)),
])
def test_resize_matches_python(in_size, out_size):
    rng = np.random.default_rng(3)
    img = rng.random((*in_size, 3)).astype(np.float32) * 255
    got = nl.resize_bicubic(img, out_size)
    want = resize_np(img, out_size)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_patch_matches_python_pipeline(tmp_path):
    from tpu_diinn.data.datasets import SRDatasetDownsample
    rng = np.random.default_rng(1)
    img8 = (rng.random((200, 300, 3)) * 255).astype(np.uint8)
    lr_n, hr_n = nl.sample_patch(img8, 10, 20, 144, 48, True, False, True)
    crop = img8[10:154, 20:164].astype(np.float32)
    want_lr = resize_np(crop, (48, 48))

    def flip(x, hf, vf, df):
        if hf:
            x = x[::-1]
        if vf:
            x = x[:, ::-1]
        if df:
            x = np.transpose(x, (1, 0, 2))
        return x

    np.testing.assert_allclose(lr_n, flip(want_lr, 1, 0, 1) / 255.0,
                               atol=1e-6)
    np.testing.assert_allclose(hr_n, flip(crop, 1, 0, 1) / 255.0, atol=1e-6)


def test_dataset_native_vs_python_paths(tmp_path):
    """Same seed -> identical samples through native and Python paths."""
    from tpu_diinn.data import datasets as ds
    rng = np.random.default_rng(7)
    arr = (rng.random((160, 220, 3)) * 255).astype(np.uint8)
    root = tmp_path / "data"
    hrdir = root / "DIV2K" / "DIV2K_train_HR"
    hrdir.mkdir(parents=True)
    from PIL import Image
    Image.fromarray(arr).save(hrdir / "0001.png")
    kw = dict(root=str(root), scales=[2, 3], patch_size=24, augment=True)
    d_native = ds.SRDatasetDownsample(use_native=True, **kw)
    d_python = ds.SRDatasetDownsample(use_native=False, **kw)
    assert d_native._native is not None
    s_n = d_native.sample(0, np.random.default_rng(55))
    s_p = d_python.sample(0, np.random.default_rng(55))
    for scale in (2, 3):
        np.testing.assert_allclose(s_n[scale][0], s_p[scale][0], atol=1e-5)
        np.testing.assert_allclose(s_n[scale][1], s_p[scale][1], atol=1e-5)


def test_sample_batch_threaded():
    lrs, hrs = nl.sample_batch([IMG] * 6, [0] * 6, [0] * 6, 96, 48,
                               [0, 1] * 3, [1, 0] * 3, [0] * 6, n_threads=3)
    assert lrs.shape == (6, 48, 48, 3) and hrs.shape == (6, 96, 96, 3)
    assert np.isfinite(lrs).all()
    # flip flags actually differ between items
    assert not np.allclose(lrs[0], lrs[1])


def test_sample_patch_rejects_out_of_range():
    img8 = np.zeros((50, 50, 3), np.uint8)
    with pytest.raises(ValueError):
        nl.sample_patch(img8, 40, 40, 20, 10, False, False, False)
