"""uint8-feed path: datasets emit uint8 when DEVICE_NORMALIZE drops the
host-side normalize, and the backbone's on-device normalization matches the
host float path exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.utils_fixtures import make_fake_coco, make_tokenizer
from virtex_tpu.config import Config
from virtex_tpu.factories import PretrainingDatasetFactory
from virtex_tpu.modules import ResNetVisualBackbone


def test_factory_dataset_emits_uint8(tmp_path, rng):
    root = make_fake_coco(str(tmp_path / "coco"))
    tok_path = str(tmp_path / "tok.model")
    make_tokenizer(tmp_path)
    cfg = Config(override_list=[
        "DATA.ROOT", root, "DATA.TOKENIZER_MODEL", tok_path,
        "DATA.VOCAB_SIZE", 151, "DATA.IMAGE_CROP_SIZE", 48,
        "DATA.USE_NATIVE_LOADER", False,  # exercise the cv2 path here
        "DATA.DEVICE_NORMALIZE", True])
    ds = PretrainingDatasetFactory.from_config(cfg, split="train")
    item = ds.__getitem__(0, rng=rng)
    assert item["image"].dtype == np.uint8
    assert item["image"].shape == (48, 48, 3)

    cfg2 = Config(override_list=[
        "DATA.ROOT", root, "DATA.TOKENIZER_MODEL", tok_path,
        "DATA.VOCAB_SIZE", 151, "DATA.IMAGE_CROP_SIZE", 48,
        "DATA.USE_NATIVE_LOADER", False,
        "DATA.DEVICE_NORMALIZE", False])
    ds2 = PretrainingDatasetFactory.from_config(cfg2, split="train")
    assert ds2.__getitem__(0, rng=rng)["image"].dtype == np.float32


def test_backbone_normalizes_uint8_like_host():
    vb = ResNetVisualBackbone("resnet18", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (1, 32, 32, 3), np.uint8)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    variables = vb.init(jax.random.PRNGKey(0), jnp.asarray(f32), train=False)
    out_f = vb.apply(variables, jnp.asarray(f32), train=False)
    out_u = vb.apply(variables, jnp.asarray(u8), train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)
