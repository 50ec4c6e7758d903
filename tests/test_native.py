"""Native data-plane kernels must match the numpy/reference semantics."""

import numpy as np
import pytest

from aglayout_tpu.data import native

pytestmark = pytest.mark.skipif(
    native.load_lib() is None, reason="native/libdatapath.so not built"
)


def test_assemble_objects_matches_numpy():
    rng = np.random.RandomState(0)
    n, max_atts, att_dim, size = 12, 30, 106, 64
    img_w = rng.uniform(300, 800, n)
    img_h = rng.uniform(300, 800, n)
    x = rng.uniform(0, 200, n)
    y = rng.uniform(0, 200, n)
    w = rng.uniform(30, 300, n)
    h = rng.uniform(30, 300, n)
    boxes_px = np.stack([x, y, w, h], 1)
    att_ids = np.full((n, max_atts), -1, np.int32)
    for i in range(n):
        k = rng.randint(0, 4)
        att_ids[i, :k] = rng.choice(att_dim, k, replace=False)
    valid = (rng.rand(n) > 0.2).astype(np.float32)

    boxes, boxes_s, masks, masks_s, attribute = native.assemble_objects(
        boxes_px, img_w, img_h, att_ids, valid, att_dim, size
    )

    # numpy reference (the dataset.py implementation semantics)
    for i in range(n):
        if valid[i] <= 0:
            np.testing.assert_array_equal(boxes[i], [0, 0, 1, 1])
            assert masks[i].sum() == 0 and attribute[i].sum() == 0
            continue
        x0, y0 = x[i] / img_w[i], y[i] / img_h[i]
        x1, y1 = (x[i] + w[i]) / img_w[i], (y[i] + h[i]) / img_h[i]
        np.testing.assert_allclose(boxes[i], [x0, y0, x1, y1], rtol=1e-6)
        ref = np.zeros((size, size), np.float32)
        ref[
            int(np.round(y0 * size)) : int(np.round(y1 * size)),
            int(np.round(x0 * size)) : int(np.round(x1 * size)),
        ] = 1
        np.testing.assert_array_equal(masks[i], ref)
        # shift semantics
        width = x1 - x0
        sx0, sx1 = x0, x1
        if width < 0.5:
            left, right = x0, 1 - x1
            if left > right:
                sx0, sx1 = x0 - left * 0.8, x1 - left * 0.8
            elif right > left:
                sx0, sx1 = x0 + right * 0.8, x1 + right * 0.8
        np.testing.assert_allclose(boxes_s[i], [sx0, y0, sx1, y1], rtol=1e-5, atol=1e-7)
        ids = att_ids[i][att_ids[i] >= 0]
        ref_att = np.zeros(att_dim, np.float32)
        ref_att[ids] = 1
        np.testing.assert_array_equal(attribute[i], ref_att)


def test_normalize_images_matches_numpy():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    out = native.normalize_images(imgs)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (imgs.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_threading_consistent():
    rng = np.random.RandomState(2)
    n = 37
    boxes_px = np.stack(
        [rng.uniform(0, 100, n), rng.uniform(0, 100, n), rng.uniform(20, 200, n), rng.uniform(20, 200, n)], 1
    )
    img_w = np.full(n, 400.0)
    img_h = np.full(n, 300.0)
    att_ids = np.full((n, 5), -1, np.int32)
    valid = np.ones(n, np.float32)
    a = native.assemble_objects(boxes_px, img_w, img_h, att_ids, valid, 10, 32, num_threads=1)
    b = native.assemble_objects(boxes_px, img_w, img_h, att_ids, valid, 10, 32, num_threads=8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)




def test_native_jpeg_decode_matches_pil(tmp_path):
    """decode_batch (libjpeg + PIL-compatible triangle resize + normalize)
    vs the PIL path; PIL quantizes resample weights to int16, so agreement
    is to ~1/255 in pixel units."""
    from PIL import Image

    from aglayout_tpu.data import native
    from aglayout_tpu.data.dataset import _load_image

    if native.load_lib() is None:
        import pytest

        pytest.skip("libdatapath.so not built")

    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate([(500, 375), (64, 64), (333, 217)]):
        img = np.zeros((h, w, 3), np.uint8)
        img[:] = rng.randint(0, 255, 3)
        for _ in range(5):
            x0, y0 = rng.randint(0, w - 20), rng.randint(0, h - 20)
            img[y0 : y0 + 20, x0 : x0 + 20] = rng.randint(0, 255, 3)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    # one non-JPEG: must be reported failed, not crash
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    size = 64
    out, dims, n_failed = native.decode_batch(paths + [bad], size)
    assert n_failed == 1 and dims[-1, 0] == 0

    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    for j, p in enumerate(paths):
        ref, W, H = _load_image(p, size)
        assert (dims[j] == [W, H]).all()
        # compare in pixel units
        diff = np.abs(out[j] - ref) * std * 255.0
        assert diff.max() < 2.5, (j, diff.max())

    # fast_scale: DCT-domain scaled decode (the production Loader path).
    # Original dims must still be reported (box normalization depends on
    # them). Pixels approximate the full-res resample: mean well under
    # 1.5/255; the max lands on DCT-truncation ringing at this synthetic
    # corpus's hard 20px block edges (~20/255, comparable to the JPEG
    # quality-92 artifacts already present there).
    out_f, dims_f, nf = native.decode_batch(paths, size, fast_scale=True)
    assert nf == 0
    np.testing.assert_array_equal(dims_f, dims[: len(paths)])
    for j, p in enumerate(paths):
        ref, _, _ = _load_image(p, size)
        diff = np.abs(out_f[j] - ref) * std * 255.0
        assert diff.mean() < 1.5, (j, diff.mean())
        assert np.percentile(diff, 99) < 16.0, (j, np.percentile(diff, 99))
        assert diff.max() < 64.0, (j, diff.max())  # gross-breakage guard
