"""Hub-style entry point smoke (reference hubconf.py:10-35): resnet50()
returns an (apply_fn, variables) pair emitting the 7x7x2048 spatial grid."""
import importlib.util
import os

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hub_resnet50_feature_extractor():
    # Load by explicit path: other parity tests put /root/reference on
    # sys.path, whose hubconf.py (torchvision-importing) would shadow ours.
    spec = importlib.util.spec_from_file_location(
        "virtex_tpu_hubconf", os.path.join(REPO, "hubconf.py"))
    hubconf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hubconf)

    apply_fn, variables = hubconf.resnet50(pretrained=False)
    feats = apply_fn(variables, jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert feats.shape == (2, 7, 7, 2048)


def test_resnet50_extractor_callable_contract():
    """The reference-shaped single-callable contract: f(images) -> grid,
    accepting NHWC or NCHW input."""
    import numpy as np

    import hubconf

    f = hubconf.resnet50_extractor(pretrained=False)
    nhwc = np.random.RandomState(0).rand(2, 64, 64, 3).astype("float32")
    out = f(nhwc)
    assert out.shape == (2, 2, 2, 2048)
    out2 = f(nhwc.transpose(0, 3, 1, 2))  # NCHW
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-5)
