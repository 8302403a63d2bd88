"""SubsampledBatchNorm: exactness at stride 1, statistical fidelity and
gradient flow at stride > 1, tiny-grid clamp, naming parity for the
checkpoint converter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from virtex_tpu.modules.normalization import SubsampledBatchNorm


def _data(shape=(8, 16, 16, 12), seed=0, dtype=jnp.float32):
    x = jax.random.normal(jax.random.PRNGKey(seed), shape) * 3.0 + 1.5
    return x.astype(dtype)


def test_stride1_matches_flax_batchnorm_train_and_eval():
    x = _data()
    ours = SubsampledBatchNorm(use_running_average=False, momentum=0.9,
                               epsilon=1e-5, stat_stride=1)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v_ours = ours.init(jax.random.PRNGKey(1), x)
    v_ref = ref.init(jax.random.PRNGKey(1), x)

    y_ours, m_ours = ours.apply(v_ours, x, mutable=["batch_stats"])
    y_ref, m_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m_ours["batch_stats"]["mean"],
                               m_ref["batch_stats"]["mean"],
                               rtol=1e-5, atol=1e-6)
    # running var follows torch semantics: UNBIASED batch variance in the
    # running average (flax tracks the biased one) — rescale flax's update
    # by n/(n-1) to compare. init var is 1.0, momentum 0.9:
    # ours = 0.9*1 + 0.1*var*n/(n-1); flax = 0.9*1 + 0.1*var.
    n = x.size // x.shape[-1]
    expected = 0.9 + (np.asarray(m_ref["batch_stats"]["var"]) - 0.9) \
        * (n / (n - 1))
    np.testing.assert_allclose(m_ours["batch_stats"]["var"], expected,
                               rtol=1e-5, atol=1e-6)

    # eval mode normalizes with the stored statistics — same math as flax,
    # given the same stats (our STORED var differs by Bessel's correction,
    # so hand flax our stats)
    eval_ours = SubsampledBatchNorm(use_running_average=True)
    eval_ref = nn.BatchNorm(use_running_average=True)
    ye_ours = eval_ours.apply({**v_ours, **m_ours}, x)
    ye_ref = eval_ref.apply({"params": v_ref["params"],
                             "batch_stats": m_ours["batch_stats"]}, x)
    np.testing.assert_allclose(ye_ours, ye_ref, rtol=1e-5, atol=1e-5)


def test_running_stats_match_torch_batchnorm():
    """Multi-step running-stat parity with torch BatchNorm2d — the
    reference's actual BN (virtex/modules/visual_backbones.py:43 uses
    torchvision ResNets, i.e. nn.BatchNorm2d): biased var normalizes,
    UNBIASED var enters the running average."""
    import torch

    rng = np.random.RandomState(0)
    xs = [rng.randn(4, 6, 5, 5).astype(np.float32) * 2 + 0.5
          for _ in range(3)]
    tbn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
    tbn.train()
    for x in xs:
        tbn(torch.tensor(x))

    bn = SubsampledBatchNorm(momentum=0.9, epsilon=1e-5)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(xs[0].transpose(0, 2, 3, 1)))
    stats = v["batch_stats"]
    for x in xs:
        _, m = bn.apply({"params": v["params"], "batch_stats": stats},
                        jnp.asarray(x.transpose(0, 2, 3, 1)),
                        mutable=["batch_stats"])
        stats = m["batch_stats"]
    np.testing.assert_allclose(stats["mean"],
                               tbn.running_mean.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"],
                               tbn.running_var.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_param_and_stat_names_match_converter_contract():
    v = SubsampledBatchNorm().init(jax.random.PRNGKey(0), _data())
    assert set(v["params"]) == {"scale", "bias"}
    assert set(v["batch_stats"]) == {"mean", "var"}


@pytest.mark.parametrize("stride", [2, 4])
def test_strided_stats_close_to_full(stride):
    # iid data: a 1/stride row subsample estimates the same moments
    x = _data((16, 32, 32, 8), seed=3)
    full = SubsampledBatchNorm(stat_stride=1)
    sub = SubsampledBatchNorm(stat_stride=stride)
    v = full.init(jax.random.PRNGKey(1), x)
    _, m_full = full.apply(v, x, mutable=["batch_stats"])
    _, m_sub = sub.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(m_sub["batch_stats"]["mean"],
                               m_full["batch_stats"]["mean"],
                               rtol=0.2, atol=0.05)
    np.testing.assert_allclose(m_sub["batch_stats"]["var"],
                               m_full["batch_stats"]["var"],
                               rtol=0.1, atol=0.05)


def test_tiny_grid_never_subsampled():
    # H=7 (layer4): clamp max(1, min(stride, H//4)) -> stride 1 (exact)
    x = _data((4, 7, 7, 8), seed=5)
    full = SubsampledBatchNorm(stat_stride=1)
    sub = SubsampledBatchNorm(stat_stride=4)
    v = full.init(jax.random.PRNGKey(1), x)
    y_full, m_full = full.apply(v, x, mutable=["batch_stats"])
    y_sub, m_sub = sub.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(y_sub, y_full, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(m_sub["batch_stats"]["var"],
                               m_full["batch_stats"]["var"], rtol=1e-6)


def test_gradients_flow_through_strided_stats():
    x = _data((8, 16, 16, 4), seed=7)
    bn = SubsampledBatchNorm(stat_stride=4)
    v = bn.init(jax.random.PRNGKey(1), x)

    def loss(params, x):
        y, _ = bn.apply({"params": params,
                         "batch_stats": v["batch_stats"]}, x,
                        mutable=["batch_stats"])
        return jnp.sum(jnp.square(y))

    gp = jax.grad(loss)(v["params"], x)
    gx = jax.grad(loss, argnums=1)(v["params"], x)
    assert np.isfinite(np.asarray(gp["scale"])).all()
    assert float(jnp.abs(gx).sum()) > 0.0
    # rows outside the stat subsample still receive normalize-apply grads
    assert float(jnp.abs(gx[:, 1]).sum()) > 0.0


def test_bf16_compute_fp32_stats():
    x = _data((8, 16, 16, 4), seed=9, dtype=jnp.bfloat16)
    bn = SubsampledBatchNorm(stat_stride=2, dtype=jnp.bfloat16)
    v = bn.init(jax.random.PRNGKey(1), x)
    y, m = bn.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    assert m["batch_stats"]["mean"].dtype == jnp.float32
    assert m["batch_stats"]["var"].dtype == jnp.float32
