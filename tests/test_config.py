import os

import pytest
import yaml

from virtex_tpu.config import CfgNode, Config


def test_defaults():
    C = Config()
    assert C.OPTIM.BATCH_SIZE == 256
    assert C.MODEL.NAME == "virtex"
    assert C.DATA.VOCAB_SIZE == 10000
    assert C.DATA.MAX_CAPTION_LENGTH == 30
    assert C.MODEL.DECODER.MAX_DECODING_STEPS == 30
    assert C.MODEL.TEXTUAL.NAME == "transdec_postnorm::L1_H2048_A32_F8192"
    assert C.OPTIM.NO_DECAY == ".*textual.(embedding|transformer).*(norm.*|bias)"


def test_override_list():
    C = Config(override_list=["OPTIM.BATCH_SIZE", 1024, "OPTIM.LR", 0.01])
    assert C.OPTIM.BATCH_SIZE == 1024
    assert C.OPTIM.LR == 0.01


def test_override_list_string_decoding():
    C = Config(override_list=["OPTIM.BATCH_SIZE", "64", "MODEL.VISUAL.FROZEN", "true"])
    assert C.OPTIM.BATCH_SIZE == 64
    assert C.MODEL.VISUAL.FROZEN is True


def test_yaml_file_and_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"OPTIM": {"BATCH_SIZE": 512, "LR": 0.05}}))
    child = tmp_path / "child.yaml"
    child.write_text(
        "_BASE_: base.yaml\n" + yaml.safe_dump({"OPTIM": {"LR": 0.07}})
    )
    C = Config(str(child))
    assert C.OPTIM.BATCH_SIZE == 512  # from base
    assert C.OPTIM.LR == 0.07  # child wins


def test_merge_order_file_then_list(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text(yaml.safe_dump({"OPTIM": {"BATCH_SIZE": 512}}))
    C = Config(str(f), ["OPTIM.BATCH_SIZE", 1024])
    assert C.OPTIM.BATCH_SIZE == 1024


def test_frozen():
    C = Config()
    with pytest.raises(AttributeError):
        C.OPTIM.BATCH_SIZE = 1
    with pytest.raises(AttributeError):
        C.NEW_KEY = 1


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config(override_list=["OPTIM.NOT_A_KEY", 3])


def test_type_checking():
    with pytest.raises(TypeError):
        Config(override_list=["OPTIM.BATCH_SIZE", "not_an_int"])


def test_int_to_float_promotion():
    C = Config(override_list=["OPTIM.LR", 1])
    assert C.OPTIM.LR == 1.0 and isinstance(C.OPTIM.LR, float)


def test_scientific_notation_override():
    # PyYAML alone leaves "1e-4" a string (its float resolver wants a dot);
    # the reference decodes via literal_eval, which accepts it — so must we.
    C = Config(override_list=["OPTIM.LR", "1e-4", "OPTIM.WEIGHT_DECAY",
                              "5E-5"])
    assert C.OPTIM.LR == pytest.approx(1e-4)
    assert C.OPTIM.WEIGHT_DECAY == pytest.approx(5e-5)


def test_dump_roundtrip(tmp_path):
    C = Config(override_list=["OPTIM.BATCH_SIZE", 128])
    p = tmp_path / "dump.yaml"
    C.dump(str(p))
    C2 = Config(str(p))
    assert C2.OPTIM.BATCH_SIZE == 128
    assert C2.MODEL.TEXTUAL.NAME == C.MODEL.TEXTUAL.NAME


def test_decoder_steps_follow_caption_length():
    C = Config(override_list=["DATA.MAX_CAPTION_LENGTH", 50])
    assert C.MODEL.DECODER.MAX_DECODING_STEPS == 50
    # But an explicit override wins:
    C2 = Config(
        override_list=[
            "DATA.MAX_CAPTION_LENGTH", 50, "MODEL.DECODER.MAX_DECODING_STEPS", 20,
        ]
    )
    assert C2.MODEL.DECODER.MAX_DECODING_STEPS == 20


def test_cfgnode_clone_independent():
    n = CfgNode({"a": {"b": 1}})
    m = n.clone()
    m.a.b = 2
    assert n.a.b == 1
