"""Native C++ data-plane tests: fused decode/crop/resize/flip/normalize vs
the cv2 reference path, batch API, and dataset integration."""
import cv2
import numpy as np
import pytest

from virtex_tpu.data.native_pipeline import (
    NativeCaptionTrainPipeline,
    NativeEvalPipeline,
    native_available,
    sample_random_resized_crop,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native dataplane not built")


def jpeg_bytes(h=96, w=128, seed=0):
    img = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1])
    assert ok
    return enc.tobytes(), img


def test_dims_and_full_decode():
    from virtex_tpu import native
    data, img = jpeg_bytes()
    assert native.jpeg_dims(data) == (96, 128)
    out = native.decode_transform(data, None, 64)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32


def test_downscale_matches_cv2_inter_area():
    """The shipped native path must track the behavioral reference's pixels:
    cv2 selects INTER_AREA when shrinking (data/transforms.py `_resize`),
    and so does the native dispatcher. Residual = JPEG-decoder differences
    + cv2's fixed-point rounding, bounded tightly here (0..255 units)."""
    from virtex_tpu import native
    data, _ = jpeg_bytes(seed=3)
    out = native.decode_transform(
        data, (8, 16, 64, 64), 32, flip=False,
        mean=np.zeros(3, np.float32), std=np.full(3, 1 / 255.0, np.float32))
    dec = cv2.imdecode(np.frombuffer(data, np.uint8),
                       cv2.IMREAD_COLOR)[:, :, ::-1]
    crop = dec[8:8 + 64, 16:16 + 64]
    ref = cv2.resize(crop, (32, 32), interpolation=cv2.INTER_AREA)
    delta = np.abs(out - ref.astype(np.float32))
    assert delta.max() < 2.0 and delta.mean() < 0.5


def test_upscale_matches_cv2_inter_linear():
    from virtex_tpu import native
    data, _ = jpeg_bytes(seed=4)
    # 16x16 crop grown to 32 → bilinear branch
    out = native.decode_transform(
        data, (8, 16, 16, 16), 32, flip=False,
        mean=np.zeros(3, np.float32), std=np.full(3, 1 / 255.0, np.float32))
    dec = cv2.imdecode(np.frombuffer(data, np.uint8),
                       cv2.IMREAD_COLOR)[:, :, ::-1]
    crop = dec[8:8 + 16, 16:16 + 16]
    ref = cv2.resize(crop, (32, 32), interpolation=cv2.INTER_LINEAR)
    delta = np.abs(out - ref.astype(np.float32))
    assert delta.max() < 4.0 and delta.mean() < 1.0


def test_flip_is_mirror():
    from virtex_tpu import native
    data, _ = jpeg_bytes(seed=5)
    a = native.decode_transform(data, None, 32, flip=False,
                                mean=np.zeros(3, np.float32),
                                std=np.ones(3, np.float32))
    b = native.decode_transform(data, None, 32, flip=True,
                                mean=np.zeros(3, np.float32),
                                std=np.ones(3, np.float32))
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-6)


def test_batch_api_and_error_raises():
    from virtex_tpu import native
    data, _ = jpeg_bytes(seed=7)
    rects = np.array([[0, 0, -1, -1], [4, 4, 40, 40]], np.int32)
    out = native.batch_decode_transform(
        [data, data], rects, np.array([0, 1], np.int32), 24)
    assert out.shape == (2, 24, 24, 3)
    assert np.abs(out).sum() > 0
    # A corrupt JPEG raises, like the per-item path — silently zero-filled
    # slots would train on black images with real captions.
    rects3 = np.array([[0, 0, -1, -1]] * 3, np.int32)
    with pytest.raises(ValueError, match="1/3"):
        native.batch_decode_transform(
            [data, data, b"not a jpeg"], rects3,
            np.array([0, 1, 0], np.int32), 24)


def test_native_jitter_matches_numpy_reference(rng):
    """The in-kernel color jitter must match the numpy ColorJitter ops for
    fixed parameters (hue within HSV-quantization tolerance)."""
    from virtex_tpu import native
    from virtex_tpu.data.transforms import _shift_hue

    data, img = jpeg_bytes(h=64, w=64, seed=21)
    dec = cv2.imdecode(np.frombuffer(data, np.uint8),
                       cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32)

    order = [0, 1, 2, 3]
    b, c, s, h = 1.3, 0.8, 1.2, 0.05
    jp = native.jitter_params(order, b, c, s, h)
    out = native.decode_transform(
        data, None, 64, False,
        mean=np.zeros(3, np.float32), std=np.full(3, 1 / 255., np.float32),
        jitter=jp)

    # numpy reference: same op order on the same decoded image
    ref = dec.copy()
    ref = ref * b
    mean = ref.mean()
    ref = (ref - mean) * c + mean
    gray = ref @ np.array([0.299, 0.587, 0.114], np.float32)
    ref = (ref - gray[..., None]) * s + gray[..., None]
    ref = _shift_hue(ref, h)
    diff = np.abs(out - ref)
    assert np.median(diff) < 3.0  # hue quantization differences only
    assert np.mean(diff) < 6.0


def test_rrc_param_sampler_bounds(rng):
    for _ in range(50):
        y, x, ch, cw = sample_random_resized_crop(100, 150, rng)
        assert 0 <= y and y + ch <= 100
        assert 0 <= x and x + cw <= 150


def test_train_pipeline_swaps_caption(rng):
    data, _ = jpeg_bytes(seed=9)
    pipe = NativeCaptionTrainPipeline(crop_size=32, flip_p=1.0,
                                      use_jitter=False)
    img, caption = pipe(data, "a dog on the left side", rng)
    assert img.shape == (32, 32, 3)
    assert "right" in caption and "left" not in caption
    # normalized output: roughly centered stats
    assert -3 < img.mean() < 3


def test_eval_pipeline_matches_python_path(rng):
    from virtex_tpu.data.transforms import default_image_transform
    # smooth gradient image: resampling-order differences stay small (noise
    # images amplify them)
    yy, xx = np.mgrid[0:100, 0:140]
    img = np.stack([yy * 2, xx, (yy + xx)], -1).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1])
    data = enc.tobytes()
    pipe = NativeEvalPipeline(crop_size=64, resize_size=72)
    out, _ = pipe(data, None)
    ref_t = default_image_transform(crop_size=64, resize_size=72)
    dec = cv2.imdecode(np.frombuffer(data, np.uint8),
                       cv2.IMREAD_COLOR)[:, :, ::-1]
    ref, _ = ref_t(dec, None, rng)
    assert out.shape == ref.shape
    # different resampling order → compare loosely in normalized units
    assert np.abs(out - ref).mean() < 0.25


def test_captioning_dataset_native(tmp_path, rng):
    from tests.utils_fixtures import make_fake_coco, make_tokenizer
    from virtex_tpu.data import CaptioningDataset

    root = make_fake_coco(str(tmp_path / "coco"))
    tok = make_tokenizer(tmp_path)
    ds = CaptioningDataset(root, "train", tok, max_caption_length=12,
                           use_native=True, crop_size=48)
    item = ds.__getitem__(0, rng=rng)
    assert item["image"].shape == (48, 48, 3)
    assert item["caption_tokens"][0] == 1


def test_batch_fetch_bit_identical_to_per_item(tmp_path):
    """dataset.get_batch (one OpenMP native call) must equal N single
    __getitem__ calls with the same per-item RNGs — pixels, captions,
    tokens."""
    from tests.utils_fixtures import make_fake_coco, make_tokenizer
    from virtex_tpu.data import CaptioningDataset
    from virtex_tpu.data.loader import item_rng

    root = make_fake_coco(str(tmp_path / "coco"), n_images=6)
    tok = make_tokenizer(tmp_path)
    ds = CaptioningDataset(root, "train", tok, max_caption_length=12,
                           use_native=True, crop_size=48)
    assert ds.supports_batch_fetch
    indices = [0, 3, 1, 5]
    batch_items = ds.get_batch(indices,
                               [item_rng(7, 0, i) for i in indices])
    for got, i in zip(batch_items, indices):
        want = ds.__getitem__(i, rng=item_rng(7, 0, i))
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_loader_uses_batch_fetch_same_stream(tmp_path):
    """The DataLoader stream must be identical whether the dataset serves
    batched (native OpenMP) or per-item fetches."""
    from tests.utils_fixtures import make_fake_coco, make_tokenizer
    from virtex_tpu.data import CaptioningDataset
    from virtex_tpu.data.loader import DataLoader

    root = make_fake_coco(str(tmp_path / "coco"), n_images=8)
    tok = make_tokenizer(tmp_path)
    ds = CaptioningDataset(root, "train", tok, max_caption_length=12,
                           use_native=True, crop_size=48)

    def stream(force_per_item, workers):
        if force_per_item:
            ds.supports_batch_fetch = False
        else:
            ds.supports_batch_fetch = True
        ld = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        num_workers=workers, infinite=True)
        it = iter(ld)
        return [next(it) for _ in range(4)]

    ref = stream(True, 0)
    for force, workers in [(False, 0), (False, 2)]:
        got = stream(force, workers)
        for b_got, b_ref in zip(got, ref):
            for k in b_ref:
                np.testing.assert_array_equal(b_got[k], b_ref[k])
    ds.supports_batch_fetch = True


@pytest.mark.parametrize("dataset_name", ["masked_lm", "token_cls"])
def test_batch_fetch_parity_other_caption_datasets(tmp_path, dataset_name):
    """masked-LM and token-classification get_batch (OpenMP path) must be
    bit-identical to per-item fetches — incl. the masking RNG stream."""
    from tests.utils_fixtures import make_fake_coco, make_tokenizer
    from virtex_tpu.data.datasets.classification import (
        TokenClassificationDataset,
    )
    from virtex_tpu.data.datasets.masked_lm import MaskedLmDataset
    from virtex_tpu.data.loader import item_rng

    root = make_fake_coco(str(tmp_path / "coco"), n_images=6)
    tok = make_tokenizer(tmp_path)
    cls = MaskedLmDataset if dataset_name == "masked_lm" \
        else TokenClassificationDataset
    ds = cls(root, "train", tok, max_caption_length=12, use_native=True,
             crop_size=48)
    assert ds.supports_batch_fetch
    indices = [5, 0, 2, 4]
    got = ds.get_batch(indices, [item_rng(3, 1, i) for i in indices])
    for item, i in zip(got, indices):
        want = ds.__getitem__(i, rng=item_rng(3, 1, i))
        for k in want:
            np.testing.assert_array_equal(item[k], want[k], err_msg=k)
