"""Torch-free .pth interchange (round-4 verdict #5): reference checkpoints
(torch>=1.6 zip pickles, `/root/reference/virtex/utils/checkpointing.py`)
must be readable with zipfile+pickle+numpy alone — a TPU-native deployment
has no torch. Torch is used here only to WRITE the fixtures."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from virtex_tpu.utils.checkpoint_convert import (  # noqa: E402
    _read_pth_without_torch,
    load_torch_checkpoint,
)


def _fixture_ckpt(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {
        "visual.cnn.conv1.weight": torch.randn(8, 3, 7, 7, generator=g),
        "textual.output.bias": torch.randn(16, generator=g),
        "half": torch.randn(4, 5, generator=g).half(),
        "bf16": torch.randn(3, 3, generator=g).bfloat16(),
        "longs": torch.arange(12, dtype=torch.int64).reshape(3, 4),
        "flags": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.5),
        # non-contiguous: saved with transposed strides over the same storage
        "transposed": torch.randn(4, 6, generator=g).t(),
        # nonzero storage_offset: a narrow()'d view keeps the full storage
        "offset": torch.randn(10, generator=g)[3:7],
    }
    path = str(tmp_path / "checkpoint_42.pth")
    torch.save({"model": sd, "iteration": 42,
                "optimizer": {"state": {}, "param_groups": [
                    {"lr": 0.1, "params": [0, 1]}]}}, path)
    return path, sd


def test_pure_reader_matches_torch(tmp_path):
    path, sd = _fixture_ckpt(tmp_path)
    ckpt = _read_pth_without_torch(path)
    assert ckpt["iteration"] == 42
    for k, v in sd.items():
        got = ckpt["model"][k]
        want = v.detach().float().numpy() if v.dtype == torch.bfloat16 \
            else v.detach().numpy()
        np.testing.assert_array_equal(got, want, err_msg=k)
    # bf16 upcast is exact (bf16 == upper half of fp32)
    assert ckpt["model"]["bf16"].dtype == np.float32
    assert ckpt["model"]["longs"].dtype == np.int64
    assert ckpt["model"]["flags"].dtype == np.bool_


def test_load_torch_checkpoint_with_torch_blocked(tmp_path, monkeypatch):
    path, sd = _fixture_ckpt(tmp_path)
    # `import torch` must not happen on the zip path: block it outright.
    monkeypatch.setitem(sys.modules, "torch", None)
    out = load_torch_checkpoint(path)
    assert set(out) == set(sd)
    np.testing.assert_array_equal(
        out["visual.cnn.conv1.weight"],
        sd["visual.cnn.conv1.weight"].numpy())
    np.testing.assert_array_equal(out["transposed"],
                                  sd["transposed"].numpy())


def test_legacy_format_without_torch(tmp_path, monkeypatch):
    """Reference-era torchvision ImageNet weights (e.g.
    resnet50-19c8e357.pth) are LEGACY (pre-1.6, non-zip) torch pickles —
    the `--weight-init torchvision` path must read them torch-free too."""
    g = torch.Generator().manual_seed(1)
    sd = {
        "conv1.weight": torch.randn(8, 3, 7, 7, generator=g),
        "bn1.running_var": torch.rand(8, generator=g),
        "bn1.num_batches_tracked": torch.tensor(7, dtype=torch.int64),
        "fc.weight": torch.randn(10, 8, generator=g),
    }
    path = str(tmp_path / "legacy.pth")
    torch.save(sd, path, _use_new_zipfile_serialization=False)

    monkeypatch.setitem(sys.modules, "torch", None)
    from virtex_tpu.utils.checkpoint_convert import (
        _read_legacy_pth_without_torch,
    )
    out = load_torch_checkpoint(path)
    assert set(out) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)
    # np.asarray duck-typing (the convert_resnet/_set path) also works
    lazy = _read_legacy_pth_without_torch(path)
    np.testing.assert_array_equal(np.asarray(lazy["fc.weight"]),
                                  sd["fc.weight"].numpy())


def test_benign_namespace_loads_torch_free(tmp_path, monkeypatch):
    """A torchvision training-script checkpoint saves argparse.Namespace
    alongside the state dict (reference clf_linear.py:137-141): the reader
    rebuilds it as an inert opaque object — NO torch fallback (which would
    be an arbitrary-code-execution hole for refused pickles) and no torch
    needed at all."""
    import argparse
    path = str(tmp_path / "tv_train.pth")
    sd = {"fc.weight": torch.randn(4, 4)}
    torch.save({"state_dict": sd, "args": argparse.Namespace(lr=0.1)}, path)
    monkeypatch.setitem(sys.modules, "torch", None)
    out = load_torch_checkpoint(path)
    np.testing.assert_array_equal(out["fc.weight"], sd["fc.weight"].numpy())


def test_refused_globals_stand_even_with_torch_importable(tmp_path):
    """A refused global must raise from load_torch_checkpoint — NOT route
    into torch.load(weights_only=False), which would execute exactly the
    pickle globals the refusal blocked (torch importable here)."""
    import pickle
    import zipfile

    # A graph referencing a non-allowlisted callable: os.system.
    payload = pickle.dumps({"model": {}, "cmd": __import__("os").system})
    path = str(tmp_path / "refused.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_torch_checkpoint(path)


def test_refused_globals_without_torch_raise_informatively(tmp_path,
                                                           monkeypatch):
    import pathlib
    import pickle
    path = str(tmp_path / "tv_train2.pth")
    torch.save({"state_dict": {"w": torch.zeros(2)},
                "where": pathlib.PurePosixPath("x")}, path)
    monkeypatch.setitem(sys.modules, "torch", None)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_torch_checkpoint(path)


def test_out_of_bounds_tensor_record_refused(tmp_path):
    """A crafted/truncated .pth whose tensor record indexes past its
    storage must be refused, not as_strided into process memory."""
    import io
    import pickle
    import zipfile
    import torch._utils

    sentinel = object()

    class Evil:
        def __reduce__(self):
            return (torch._utils._rebuild_tensor_v2,
                    (sentinel, 0, (1 << 20,), (1,), False, None))

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            return (("storage", torch.FloatStorage, "0", "cpu", 4)
                    if obj is sentinel else None)

    buf = io.BytesIO()
    P(buf, protocol=2).dump({"model": {"w": Evil()}})
    path = str(tmp_path / "oob.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", np.arange(4, dtype="<f4").tobytes())
    with pytest.raises(pickle.UnpicklingError, match="outside its storage"):
        _read_pth_without_torch(path)


def test_format_unknown_reaches_torch_fallback(tmp_path, monkeypatch):
    """A file that is neither zip- nor legacy-pickle-format (e.g. an
    ancient tar-format .pth) must reach the torch.load fallback — the
    legacy reader's plain UnpicklingError on non-pickle bytes is a parse
    failure, not a refusal."""
    path = str(tmp_path / "ancient.pth")
    with open(path, "wb") as f:
        f.write(b"ustar\x00 not a pickle at all \xff\xfe")
    calls = {}

    def fake_load(p, map_location=None, weights_only=None):
        calls["path"] = p
        return {"model": {"w": np.zeros(2, np.float32)}}

    monkeypatch.setattr(torch, "load", fake_load)
    out = load_torch_checkpoint(path)
    assert calls["path"] == path
    np.testing.assert_array_equal(out["w"], np.zeros(2, np.float32))


def test_format_unknown_without_torch_raises_clearly(tmp_path, monkeypatch):
    path = str(tmp_path / "ancient2.pth")
    with open(path, "wb") as f:
        f.write(b"ustar\x00 not a pickle at all \xff\xfe")
    monkeypatch.setitem(sys.modules, "torch", None)
    with pytest.raises(ValueError, match="unrecognized checkpoint format"):
        load_torch_checkpoint(path)


def test_legacy_refusal_stands_with_torch_importable(tmp_path, monkeypatch):
    """A REFUSED global inside a non-zip pickle must still raise — never
    route into torch.load(weights_only=False)."""
    import pickle
    path = str(tmp_path / "refused_legacy.pth")
    with open(path, "wb") as f:
        f.write(pickle.dumps(__import__("os").system))

    def must_not_call(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("torch.load reached for a refused pickle")

    monkeypatch.setattr(torch, "load", must_not_call)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_torch_checkpoint(path)


def test_valid_zip_decoy_pickle_never_reaches_torch(tmp_path, monkeypatch):
    """Round-5 review repro: a VALID zip checkpoint with a decoy short-named
    data.pkl whose bytes crash our reader must raise — not fall through to
    torch.load(weights_only=False), which would unpickle the second,
    attacker-controlled data.pkl torch itself would select."""
    import pickle
    import zipfile
    path = str(tmp_path / "tworoot.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("a/data.pkl", b"\xff\xfe not a pickle")  # decoy (shortest)
        zf.writestr("archive/data.pkl",
                    pickle.dumps({"model": {},
                                  "cmd": __import__("os").system}))

    called = {}

    def fake_load(*a, **k):  # returning success makes a fallthrough VISIBLE
        called["reached"] = True
        return {"model": {}}

    monkeypatch.setattr(torch, "load", fake_load)
    with pytest.raises(Exception):
        load_torch_checkpoint(path)
    assert not called, "torch.load reached for a valid-zip file"


def test_valid_zip_truncated_storage_never_reaches_torch(tmp_path,
                                                         monkeypatch):
    """A valid torch-zip whose storage member is truncated to a non-multiple
    of the dtype itemsize (np.frombuffer ValueError) must raise, not divert
    to the unrestricted torch fallback."""
    import io
    import pickle
    import zipfile
    import torch._utils

    sentinel = object()

    class T:
        def __reduce__(self):
            return (torch._utils._rebuild_tensor_v2,
                    (sentinel, 0, (2,), (1,), False, None))

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            return (("storage", torch.FloatStorage, "0", "cpu", 2)
                    if obj is sentinel else None)

    buf = io.BytesIO()
    P(buf, protocol=2).dump({"model": {"w": T()}})
    path = str(tmp_path / "trunc.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", b"\x00" * 6)  # 6 bytes: not /4

    called = {}

    def fake_load(*a, **k):
        called["reached"] = True
        return {"model": {}}

    monkeypatch.setattr(torch, "load", fake_load)
    with pytest.raises(Exception):
        load_torch_checkpoint(path)
    assert not called, "torch.load reached for a valid-zip file"


def test_plain_pickled_tensor_refused_not_fallen_through(tmp_path,
                                                         monkeypatch):
    """Whole-package review repro (legacy-path RCE): a plain pickle whose
    FIRST value is a bare torch tensor (storage via _load_from_bytes →
    _OpaqueObject in our reader) and whose later payload is malicious. The
    malformed tensor rebuild must raise RefusedPickleError — a TypeError
    would classify the file as format-unknown and hand it to torch's
    unpickler, which executes the payload while parsing the first pickle."""
    import pickle

    class Evil:
        def __reduce__(self):
            marker = str(tmp_path / "pwned_marker")
            return (__import__("os").system, (f"touch {marker}",))

    path = str(tmp_path / "plain.pth")
    with open(path, "wb") as f:
        pickle.dump({"w": torch.zeros(2), "x": Evil()}, f, protocol=4)

    called = {}

    def fake_load(*a, **k):
        called["reached"] = True
        return {"model": {}}

    monkeypatch.setattr(torch, "load", fake_load)
    with pytest.raises(pickle.UnpicklingError,
                       match="non-persistent storage"):
        load_torch_checkpoint(path)
    assert not called, "torch.load reached for a refusable plain pickle"
    assert not (tmp_path / "pwned_marker").exists()


def test_torch_fallback_is_weights_only(tmp_path, monkeypatch):
    """Defense in depth: even when a genuinely format-unknown file DOES
    reach the torch fallback, it must be loaded with weights_only=True —
    the fallback can never be an arbitrary-code path, whatever the
    error-type routing above it concluded."""
    path = str(tmp_path / "ancient3.pth")
    with open(path, "wb") as f:
        f.write(b"ustar\x00 not a pickle at all \xff\xfe")
    seen = {}

    def fake_load(p, map_location=None, weights_only=None):
        seen["weights_only"] = weights_only
        return {"model": {"w": np.zeros(2, np.float32)}}

    monkeypatch.setattr(torch, "load", fake_load)
    out = load_torch_checkpoint(path)
    assert seen["weights_only"] is True
    np.testing.assert_array_equal(out["w"], np.zeros(2, np.float32))


def test_refuses_arbitrary_globals(tmp_path):
    """The reader must not execute arbitrary pickle globals (it's fed
    downloaded files): a pickle referencing os.system raises."""
    import pickle
    import zipfile
    path = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl",
                    pickle.dumps(__import__("os").system))
    with pytest.raises(pickle.UnpicklingError):
        _read_pth_without_torch(path)
