"""All five pretext tasks: config → factory → model → train-step TRACE
(jax.eval_shape — validates shapes/dtypes/wiring without paying XLA compile
on the 1-core CI host), plus an end-to-end beam/nucleus captioner run on a
tiny captioning model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.config import Config
from virtex_tpu.engine import TrainState, make_train_step
from virtex_tpu.engine.captioner import decode_predictions, make_caption_fn
from virtex_tpu.factories import (
    CaptionDecoderFactory,
    OptimizerFactory,
    PretrainingModelFactory,
)

TASKS = ["virtex", "captioning", "masked_lm", "token_classification",
         "multilabel_classification"]


def tiny_config(name):
    overrides = [
        "MODEL.NAME", name,
        "MODEL.VISUAL.NAME", "torchvision::resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
        "DATA.VOCAB_SIZE", 60,
        "DATA.MAX_CAPTION_LENGTH", 8,
        "DATA.IMAGE_CROP_SIZE", 32,
        "DTYPE", "float32",
    ]
    if name in {"token_classification", "multilabel_classification"}:
        overrides += ["MODEL.TEXTUAL.NAME", "none"]
    else:
        overrides += ["MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H32_A4_F64"]
    return Config(override_list=overrides)


def batch_for(name, B=2):
    rng = np.random.RandomState(0)
    tokens = rng.randint(4, 60, (B, 8)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": jnp.asarray(rng.rand(B, 32, 32, 3), jnp.float32)}
    if name in {"virtex", "captioning"}:
        batch.update(caption_tokens=jnp.asarray(tokens),
                     noitpac_tokens=jnp.asarray(tokens[:, ::-1].copy()),
                     caption_lengths=jnp.full((B,), 8, jnp.int32))
    elif name == "masked_lm":
        batch.update(caption_tokens=jnp.asarray(tokens),
                     masked_labels=jnp.asarray(tokens),
                     caption_lengths=jnp.full((B,), 8, jnp.int32))
    else:
        batch.update(labels=jnp.asarray(tokens))
    return batch


@pytest.mark.parametrize("name", TASKS)
def test_task_train_step_traces(name):
    _C = tiny_config(name)
    model = PretrainingModelFactory.from_config(_C)
    batch = batch_for(name)
    variables = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch)
    # materialize params for optimizer masks (eval_shape gives ShapeDtype)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    tx = OptimizerFactory.from_config(_C, variables["params"])
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)

    step = make_train_step(model, tx, jit=False)
    out_shapes = jax.eval_shape(step, state, batch, jax.random.PRNGKey(0))
    new_state, metrics = out_shapes
    assert metrics["loss"].shape == ()
    assert metrics["loss"].dtype == jnp.float32
    assert new_state.step.dtype == jnp.int32


@pytest.mark.parametrize("decoder_name", ["beam_search", "nucleus_sampling"])
def test_captioner_end_to_end(decoder_name):
    _C = Config(override_list=[
        "MODEL.NAME", "captioning",
        "MODEL.VISUAL.NAME", "torchvision::resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
        "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H32_A4_F64",
        "MODEL.DECODER.NAME", decoder_name,
        "MODEL.DECODER.BEAM_SIZE", 2,
        "DATA.VOCAB_SIZE", 60,
        "DATA.MAX_CAPTION_LENGTH", 6,
        "DATA.IMAGE_CROP_SIZE", 32,
        "DTYPE", "float32",
    ])
    model = PretrainingModelFactory.from_config(_C)
    decoder = CaptionDecoderFactory.from_config(_C)
    batch = batch_for("captioning")
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    caption_fn = make_caption_fn(model, decoder, sos_index=1)
    preds = caption_fn(variables, batch["image"], jax.random.PRNGKey(2))
    assert preds.shape == (2, 6)
    assert preds.dtype == jnp.int32

    class FakeTok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    caps = decode_predictions(preds, FakeTok(), eos_index=2)
    assert len(caps) == 2
