"""Factory-layer tests: name grammars, config-driven construction, transform
kwargs via literal_eval, optimizer/schedule wiring."""
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.config import Config
from virtex_tpu.data import transforms as T
from virtex_tpu.factories import (
    CaptionDecoderFactory,
    Factory,
    ImageTransformsFactory,
    LRSchedulerFactory,
    OptimizerFactory,
    PretrainingModelFactory,
    TextualHeadFactory,
    VisualBackboneFactory,
)
from virtex_tpu.models import (
    BidirectionalCaptioningModel,
    MaskedLMModel,
    TokenClassificationModel,
)
from virtex_tpu.modules import LinearTextualHead, TransformerTextualHead
from virtex_tpu.utils.beam_search import AutoRegressiveBeamSearch
from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling


def test_factory_not_instantiable():
    with pytest.raises(ValueError):
        Factory()


def test_transform_kwargs_grammar():
    t = ImageTransformsFactory.create(
        "random_resized_crop::{'scale': (0.08, 1.0)}", 32)
    assert t.scale == (0.08, 1.0)
    t2 = ImageTransformsFactory.create("horizontal_flip")
    assert t2.p == 0.5


def test_visual_backbone_grammar():
    vb = VisualBackboneFactory.create("torchvision::resnet50")
    assert vb.name_or_arch == "resnet50"
    assert vb.visual_feature_size == 2048
    with pytest.raises(KeyError):
        VisualBackboneFactory.create("timm::resnet50")


def test_textual_head_grammar():
    cfg = Config(override_list=[
        "MODEL.TEXTUAL.NAME", "transdec_prenorm::L4_H512_A8_F2048",
        "MODEL.NAME", "captioning"])
    head = TextualHeadFactory.from_config(cfg)
    assert isinstance(head, TransformerTextualHead)
    assert (head.num_layers, head.hidden_size, head.attention_heads,
            head.feedforward_size) == (4, 512, 8, 2048)
    assert head.norm_type == "pre"
    assert head.mask_future_positions
    assert not head.bidirectional


def test_textual_head_none_is_linear():
    cfg = Config(override_list=["MODEL.TEXTUAL.NAME", "none",
                                "MODEL.NAME", "token_classification"])
    head = TextualHeadFactory.from_config(cfg)
    assert isinstance(head, LinearTextualHead)


def test_masked_lm_head_not_causal():
    cfg = Config(override_list=["MODEL.NAME", "masked_lm"])
    head = TextualHeadFactory.from_config(cfg)
    assert not head.mask_future_positions
    assert not head.bidirectional


@pytest.mark.parametrize("name,klass", [
    ("virtex", BidirectionalCaptioningModel),
    ("masked_lm", MaskedLMModel),
    ("token_classification", TokenClassificationModel),
])
def test_pretraining_model_factory(name, klass):
    overrides = ["MODEL.NAME", name]
    if name == "token_classification":
        overrides += ["MODEL.TEXTUAL.NAME", "none"]
    cfg = Config(override_list=overrides)
    model = PretrainingModelFactory.from_config(cfg)
    assert isinstance(model, klass)
    if name == "virtex":
        assert model.caption_backward
        assert model.textual.bidirectional


def test_caption_decoder_factory():
    cfg = Config()
    dec = CaptionDecoderFactory.from_config(cfg)
    assert isinstance(dec, AutoRegressiveBeamSearch)
    assert dec.beam_size == 5
    assert dec.max_steps == 30  # derived from MAX_CAPTION_LENGTH
    cfg2 = Config(override_list=["MODEL.DECODER.NAME", "nucleus_sampling"])
    dec2 = CaptionDecoderFactory.from_config(cfg2)
    assert isinstance(dec2, AutoRegressiveNucleusSampling)


def test_optimizer_factory_builds_chain():
    cfg = Config(override_list=["OPTIM.NUM_ITERATIONS", 100,
                                "OPTIM.WARMUP_STEPS", 10])
    params = {"visual": {"cnn": {"kernel": jnp.ones((2, 2))}},
              "textual": {"transformer": {"norm1": {"bias": jnp.zeros(2)}}}}
    tx = OptimizerFactory.from_config(cfg, params)
    state = tx.init(params)
    grads = params
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["visual"]["cnn"]["kernel"])))


def test_lr_scheduler_factory():
    cfg = Config(override_list=["OPTIM.LR_DECAY_NAME", "multistep",
                                "OPTIM.LR_STEPS", [50, 80],
                                "OPTIM.NUM_ITERATIONS", 100,
                                "OPTIM.WARMUP_STEPS", 0])
    s = LRSchedulerFactory.from_config(cfg)
    assert float(s(60)) == pytest.approx(0.1)
