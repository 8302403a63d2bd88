"""Mesh/sharding tests on the 8-device virtual CPU platform: mesh
construction, TP param-sharding rules, and a REAL executed dp×tp train step
(the in-suite version of __graft_entry__.dryrun_multichip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from virtex_tpu.engine import TrainState, initialize_model, make_train_step
from virtex_tpu.models import ForwardCaptioningModel
from virtex_tpu.modules import ResNetVisualBackbone, TransformerTextualHead
from virtex_tpu.optim import build_optimizer, make_schedule
from virtex_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    param_sharding,
    shard_batch,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh2 = create_mesh(data=4, model=2)
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)


def test_tp_param_sharding_rules():
    mesh = create_mesh(data=4, model=2)
    params = {
        "textual": {"transformer": {"layer_0": {
            "self_attn": {"query": {"kernel": jnp.zeros((8, 8)),
                                    "bias": jnp.zeros((8,))},
                          "out": {"kernel": jnp.zeros((8, 8))}},
            "ffn": {"intermediate": {"kernel": jnp.zeros((8, 16))},
                    "output": {"kernel": jnp.zeros((16, 8))}},
            "norm1": {"scale": jnp.zeros((8,))},
        }}},
        "visual": {"cnn": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 4))}}},
    }
    sh = param_sharding(params, mesh)
    layer = sh["textual"]["transformer"]["layer_0"]
    assert layer["self_attn"]["query"]["kernel"].spec == P(None, MODEL_AXIS)
    assert layer["self_attn"]["out"]["kernel"].spec == P(MODEL_AXIS, None)
    assert layer["ffn"]["intermediate"]["kernel"].spec == P(None, MODEL_AXIS)
    assert layer["ffn"]["output"]["kernel"].spec == P(MODEL_AXIS, None)
    assert layer["norm1"]["scale"].spec == P()
    assert sh["visual"]["cnn"]["conv1"]["kernel"].spec == P()
    # model=1 → everything replicated
    sh1 = param_sharding(params, create_mesh())
    assert sh1["textual"]["transformer"]["layer_0"]["self_attn"]["query"][
        "kernel"].spec == P()


@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
def test_dp_tp_train_step_executes():
    mesh = create_mesh(data=4, model=2)
    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=64, hidden_size=32,
            num_layers=1, attention_heads=4, feedforward_size=64,
            dropout=0.1, max_caption_length=8, dtype=jnp.float32))
    rng = np.random.RandomState(0)
    tokens = rng.randint(4, 64, (8, 8)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": rng.rand(8, 32, 32, 3).astype(np.float32),
             "caption_tokens": tokens,
             "noitpac_tokens": tokens[:, ::-1].copy(),
             "caption_lengths": np.full((8,), 8, np.int32)}
    with mesh:
        sharded = shard_batch(batch, mesh)
        # batch dim sharded over 'data' (4 shards of 2)
        s = sharded["image"].sharding
        assert s.spec == P(DATA_AXIS)
        variables = initialize_model(model, sharded, jax.random.PRNGKey(0),
                                     mesh)
        # TP rules actually applied: attention QKV kernels sharded on the
        # model axis, conv kernels replicated
        qkv = variables["params"]["textual"]["transformer"]["layer_0"][
            "self_attn"]["query"]["kernel"]
        assert qkv.sharding.spec == P(None, MODEL_AXIS)
        conv = variables["params"]["visual"]["cnn"]["conv1"]["kernel"]
        assert conv.sharding.spec == P()
        tx = build_optimizer(variables["params"], "sgd",
                             make_schedule("none", 10, 0), lr=0.01,
                             cnn_lr=0.01, use_lookahead=False)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        step = make_train_step(model, tx, mesh, donate=False)
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
        loss1 = float(metrics["loss"])
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(loss1)
    assert int(state.step) == 2
