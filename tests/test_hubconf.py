"""Hub-style entry point smoke (reference hubconf.py:10-35): resnet50()
returns an (apply_fn, variables) pair emitting the 7x7x2048 spatial grid."""
import sys

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_hub_resnet50_feature_extractor():
    import hubconf

    apply_fn, variables = hubconf.resnet50(pretrained=False)
    feats = apply_fn(variables, jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert feats.shape == (2, 7, 7, 2048)
