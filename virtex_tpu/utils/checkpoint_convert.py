r"""
Convert reference (PyTorch) VirTex checkpoints to this framework's
flax variable trees.

This is the north-star parity artifact (SURVEY §7.2): torchvision ResNet
layout quirks (OIHW kernels, BN running stats) and
``nn.TransformerDecoder``'s packed ``in_proj_weight``
(``virtex/modules/textual_heads.py:208-210``) are mapped exactly, so
reference pretrained weights produce bit-equivalent (within fp tolerance)
features in the flax modules.

Input is a ``{name: np.ndarray}`` dict (call ``.numpy()`` on torch tensors
or use :func:`load_torch_checkpoint`); no torch import needed here.
"""
from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight → flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _t_lin(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) → flax kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def convert_resnet(sd: Dict[str, np.ndarray], prefix: str = ""
                   ) -> Tuple[Dict, Dict]:
    """torchvision ResNet state-dict → (params, batch_stats) trees matching
    :class:`virtex_tpu.modules.resnet.ResNet` naming."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(src: str, dst: Tuple[str, ...]):
        _set(params, dst + ("scale",), sd[f"{src}.weight"])
        _set(params, dst + ("bias",), sd[f"{src}.bias"])
        _set(stats, dst + ("mean",), sd[f"{src}.running_mean"])
        _set(stats, dst + ("var",), sd[f"{src}.running_var"])

    _set(params, ("conv1", "kernel"), _t_conv(sd[f"{prefix}conv1.weight"]))
    bn(f"{prefix}bn1", ("bn1",))

    block_re = re.compile(
        rf"{re.escape(prefix)}layer(\d+)\.(\d+)\.conv1\.weight")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd for m in [block_re.fullmatch(k)] if m})
    for stage, idx in blocks:
        src = f"{prefix}layer{stage}.{idx}"
        dst = f"layer{stage}_{idx}"
        n_convs = 3 if f"{src}.conv3.weight" in sd else 2
        for c in range(1, n_convs + 1):
            _set(params, (dst, f"conv{c}", "kernel"),
                 _t_conv(sd[f"{src}.conv{c}.weight"]))
            bn(f"{src}.bn{c}", (dst, f"bn{c}"))
        if f"{src}.downsample.0.weight" in sd:
            _set(params, (dst, "downsample_conv", "kernel"),
                 _t_conv(sd[f"{src}.downsample.0.weight"]))
            bn(f"{src}.downsample.1", (dst, "downsample_bn"))
    return params, stats


def _convert_mha(sd: Dict[str, np.ndarray], src: str) -> Dict:
    """torch nn.MultiheadAttention → our q/k/v/out denses. The packed
    in_proj weight is (3H, H) stacked [q; k; v]."""
    w = sd[f"{src}.in_proj_weight"]
    b = sd[f"{src}.in_proj_bias"]
    H = w.shape[1]
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {"kernel": _t_lin(w[i * H:(i + 1) * H]),
                     "bias": np.asarray(b[i * H:(i + 1) * H])}
    out["out"] = {"kernel": _t_lin(sd[f"{src}.out_proj.weight"]),
                  "bias": np.asarray(sd[f"{src}.out_proj.bias"])}
    return out


def _ln(sd, src):
    return {"scale": np.asarray(sd[f"{src}.weight"]),
            "bias": np.asarray(sd[f"{src}.bias"])}


def convert_transformer_stack(sd: Dict[str, np.ndarray], src: str,
                              num_layers: int, prenorm: bool) -> Dict:
    """torch ``nn.TransformerDecoder`` (``<src>.layers.N.*``) → our
    :class:`TransformerDecoder` params."""
    # The layer count is enumerable from the keys — a caller-supplied
    # num_layers smaller than reality would silently drop trained layers
    # (model-zoo loads would then keep random init for them).
    present = {int(m.group(1))
               for k in sd
               for m in [re.match(rf"{re.escape(src)}\.layers\.(\d+)\.", k)]
               if m}
    if present and len(present) != num_layers:
        raise ValueError(
            f"checkpoint has {len(present)} decoder layers under "
            f"{src!r} but num_layers={num_layers} was requested")
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        lsrc = f"{src}.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": _convert_mha(sd, f"{lsrc}.self_attn"),
            "cross_attn": _convert_mha(sd, f"{lsrc}.multihead_attn"),
            "ffn": {
                "intermediate": {"kernel": _t_lin(sd[f"{lsrc}.linear1.weight"]),
                                 "bias": np.asarray(sd[f"{lsrc}.linear1.bias"])},
                "output": {"kernel": _t_lin(sd[f"{lsrc}.linear2.weight"]),
                           "bias": np.asarray(sd[f"{lsrc}.linear2.bias"])},
            },
            "norm1": _ln(sd, f"{lsrc}.norm1"),
            "norm2": _ln(sd, f"{lsrc}.norm2"),
            "norm3": _ln(sd, f"{lsrc}.norm3"),
        }
    if prenorm and f"{src}.norm.weight" in sd:
        out["final_norm"] = _ln(sd, f"{src}.norm")
    return out


def convert_virtex_checkpoint(sd: Dict[str, np.ndarray],
                              num_layers: int = 1,
                              prenorm: bool = False) -> Dict[str, Any]:
    r"""Full reference VirTex model state-dict → flax
    ``{"params": …, "batch_stats": …}``.

    Handles: visual backbone (``visual.cnn.*``), textual head
    (``textual.*``), and — for bicaptioning — the backward transformer
    (``backward_textual.transformer.*``), which shares everything else
    (``virtex/models/captioning.py:57-63``).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if f"visual.cnn.conv1.weight" in sd:
        cnn_params, cnn_stats = convert_resnet(sd, prefix="visual.cnn.")
    else:  # textual-only checkpoint (partial load)
        cnn_params, cnn_stats = {}, {}

    if ("textual.visual_projection.weight" not in sd
            and "textual.output.weight" in sd):
        # LinearTextualHead (classification pretext tasks / "none" head,
        # reference textual_heads.py:46-95): a single GAP→Linear.
        textual_linear: Dict[str, Any] = {"output": {
            "kernel": _t_lin(sd["textual.output.weight"]),
            "bias": np.asarray(sd["textual.output.bias"]),
        }}
        return {
            "params": {"visual": {"cnn": cnn_params},
                       "textual": textual_linear},
            "batch_stats": {"visual": {"cnn": cnn_stats}},
        }

    textual: Dict[str, Any] = {
        "visual_projection": {
            "kernel": _t_lin(sd["textual.visual_projection.weight"]),
            "bias": np.asarray(sd["textual.visual_projection.bias"]),
        },
        "embedding": {
            "words": {"embedding": np.asarray(
                sd["textual.embedding.words.weight"])},
            "positions": {"embedding": np.asarray(
                sd["textual.embedding.positions.weight"])},
            "layer_norm": _ln(sd, "textual.embedding.layer_norm"),
        },
        "transformer": convert_transformer_stack(
            sd, "textual.transformer", num_layers, prenorm),
        "output_bias": np.asarray(sd["textual.output.bias"]),
    }
    if any(k.startswith("backward_textual.transformer.") for k in sd):
        textual["backward_transformer"] = convert_transformer_stack(
            sd, "backward_textual.transformer", num_layers, prenorm)

    return {
        "params": {"visual": {"cnn": cnn_params}, "textual": textual},
        "batch_stats": {"visual": {"cnn": cnn_stats}},
    }


# ---------------------------------------------------------------------------
# Torch-free .pth reading. A TPU-native deployment has no torch, but the
# reference's published checkpoints are torch-pickle zips
# (``virtex/utils/checkpointing.py:127-174``) — a zip archive holding
# ``<name>/data.pkl`` (the object graph, with persistent-id references to
# storages) plus ``<name>/data/<key>`` raw little-endian storage bytes.
# The reader below rebuilds tensors as numpy straight from those records.
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"), "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"), "BFloat16Storage": np.dtype("<u2"),
    "LongStorage": np.dtype("<i8"), "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"), "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"), "BoolStorage": np.dtype("?"),
    "UntypedStorage": np.dtype("u1"),
}


class _OpaqueObject:
    """Stand-in for non-tensor torch objects in the pickle graph (optimizer
    state classes, backward hooks, …) — constructed and state-set without
    error, carrying no data. Only the tensor-bearing entries matter here."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return _OpaqueObject()

    def __setstate__(self, state):
        pass


_ALLOWED_GLOBALS = {
    ("collections", "OrderedDict"), ("collections", "defaultdict"),
    ("builtins", "dict"), ("builtins", "list"), ("builtins", "set"),
    ("builtins", "tuple"), ("builtins", "complex"),
    ("builtins", "frozenset"), ("builtins", "bytearray"),
}

# Known-benign non-torch globals that real checkpoints carry next to the
# tensors (a torchvision training-script checkpoint saves its argparse
# args, reference clf_linear.py:137-141). Rebuilt as inert
# _OpaqueObjects — their content is irrelevant, only the tensors matter.
# Do NOT widen this casually: anything not here is refused outright.
_OPAQUE_GLOBALS = {("argparse", "Namespace")}

# One distinct stub class per storage-type name, so persistent_load can
# recover the dtype from the class the pickle stream referenced.
_storage_stub_cache: Dict[str, type] = {}


def _storage_stub(name: str) -> type:
    cls = _storage_stub_cache.get(name)
    if cls is None:
        cls = type(name, (_OpaqueObject,), {})
        _storage_stub_cache[name] = cls
    return cls


class RefusedPickleError(pickle.UnpicklingError):
    """A restricted reader DELIBERATELY refused the pickle graph (unknown
    global, malformed/out-of-bounds tensor record, unsupported storage).
    Distinct from a plain :class:`pickle.UnpicklingError` raised by the
    pickle machinery on non-pickle bytes ("invalid load key ..."), so
    :func:`load_torch_checkpoint` can let refusals stand while genuinely
    format-unknown files still reach the torch fallback."""


def _pid_storage(pid, path: str):
    """Validate a torch persistent id ``('storage', type, key, location,
    numel[, view_metadata])`` → ``(key, numpy dtype, is_bf16)``."""
    if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
        raise RefusedPickleError(f"unknown persistent id {pid!r}")
    storage_type, key = pid[1], pid[2]
    dtype_name = getattr(storage_type, "__name__", str(storage_type))
    dtype = _STORAGE_DTYPES.get(dtype_name)
    if dtype is None:
        raise RefusedPickleError(
            f"unsupported storage type {dtype_name} in {path}")
    return key, dtype, dtype_name == "BFloat16Storage"


def _strided_view(base: np.ndarray, offset, size, stride,
                  path: str) -> np.ndarray:
    """Bounds-checked equivalent of torch's tensor-from-storage rebuild.
    offset/size/stride come from the (untrusted) pickle, so every element
    the view would touch is validated against the storage length before
    ``as_strided`` — otherwise a crafted or truncated ``.pth`` could read
    arbitrary process memory into the "weights"."""
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    offset = int(offset)
    if (len(size) != len(stride) or offset < 0
            or any(s < 0 for s in size) or any(s < 0 for s in stride)):
        raise RefusedPickleError(f"malformed tensor record in {path}")
    if 0 in size:
        return np.zeros(size, dtype=base.dtype)
    last = offset + sum((sz - 1) * st for sz, st in zip(size, stride))
    if last >= len(base):
        raise RefusedPickleError(
            f"tensor record in {path} reads outside its storage "
            f"(element {last} of {len(base)})")
    arr = np.lib.stride_tricks.as_strided(
        base[offset:], shape=size,
        strides=tuple(s * base.itemsize for s in stride))
    return np.ascontiguousarray(arr)


class _RestrictedUnpickler(pickle.Unpickler):
    """Shared restricted unpickler for both ``.pth`` readers: torch tensor
    rebuilds route through :meth:`_rebuild_tensor`, a small stdlib
    allowlist passes through, storage types become dtype-carrying stubs,
    other torch classes become inert :class:`_OpaqueObject`\\ s — and any
    OTHER global is refused rather than executed."""

    def __init__(self, file, path: str):
        super().__init__(file)
        self._path = path

    def _rebuild_tensor(self, storage, offset, size, stride):
        raise NotImplementedError

    def find_class(self, module, name):
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return (lambda storage, offset, size, stride, *_unused:
                        self._rebuild_tensor(storage, offset, size, stride))
            if name == "_rebuild_parameter":
                return lambda data, *_unused: data
        if module == "torch" and name == "Size":
            return tuple
        if (module, name) in _ALLOWED_GLOBALS:
            return super().find_class(module, name)
        if module.startswith("torch") and name.endswith("Storage"):
            return _storage_stub(name)
        if module.startswith("torch") or (module, name) in _OPAQUE_GLOBALS:
            return _OpaqueObject
        # Anything else in a checkpoint is unexpected — refuse rather
        # than execute arbitrary pickle globals.
        raise RefusedPickleError(
            f"refusing unknown global {module}.{name} in {self._path}")


class NotZipFormatError(ValueError):
    """``path`` is not a torch>=1.6 zip checkpoint AT ALL (not a zip, or a
    zip with no ``data.pkl``). The ONLY zip-reader failure that may divert
    to the legacy/torch fallbacks: any other error from a file that IS a
    valid torch-zip (refusal, malformed storage, truncation) must
    propagate — routing it onward would hand a recognized-format file that
    the restricted reader rejected to ``torch.load(weights_only=False)``
    (the round-5 review's two-root-archive RCE repro)."""


def _read_pth_without_torch(path: str):
    """Parse a torch>=1.6 zip-format ``.pth`` with zipfile+pickle+numpy
    only. Tensors come back as numpy arrays (bfloat16 upcast to float32,
    exact — bf16 is the upper half of fp32).

    Known limitation: a BARE storage in the graph (``torch.save`` of a
    ``TypedStorage`` value that no tensor rebuild consumes) comes back as
    a ``_StorageRef`` whose deferred ``load()`` fails once the archive is
    closed on return; ``load_torch_checkpoint`` drops such entries (no
    ``detach``). No reference or torchvision checkpoint contains one."""
    import zipfile

    try:
        zf_cm = zipfile.ZipFile(path)
    except zipfile.BadZipFile as e:
        raise NotZipFormatError(f"{path}: not a zip-format checkpoint") from e
    # Context-managed: every storage read happens during unpickling (tensor
    # rebuilds call _StorageRef.load() inline), so the archive handle can
    # close on return — long-lived processes (zoo fetch/convert loops) must
    # not leak an fd per checkpoint.
    with zf_cm as zf:
        pkl_names = [n for n in zf.namelist()
                     if n.split("/")[-1] == "data.pkl"]
        if not pkl_names:
            raise NotZipFormatError(
                f"{path}: no data.pkl member — not a torch>=1.6 zip "
                f"checkpoint (legacy tar/pickle formats need the torch "
                f"fallback)")
        pkl_name = min(pkl_names, key=len)
        prefix = pkl_name[: -len("data.pkl")]

        class _StorageRef:
            __slots__ = ("dtype", "key", "is_bf16")

            def __init__(self, dtype, key, is_bf16):
                self.dtype, self.key, self.is_bf16 = dtype, key, is_bf16

            def load(self) -> np.ndarray:
                arr = np.frombuffer(zf.read(f"{prefix}data/{self.key}"),
                                    dtype=self.dtype)
                if self.is_bf16:
                    arr = (arr.astype(np.uint32) << 16).view(np.float32)
                return arr

        class _Unpickler(_RestrictedUnpickler):
            def _rebuild_tensor(self, storage, offset, size, stride):
                if not isinstance(storage, _StorageRef):
                    # plain-pickled tensor (storage via _load_from_bytes →
                    # _OpaqueObject): refuse explicitly — same class as the
                    # legacy-path guard (zip failures propagate either way,
                    # but a refusal beats an AttributeError).
                    raise RefusedPickleError(
                        f"tensor rebuilt from a non-persistent storage in "
                        f"{path} (plain-pickled tensor?) — refusing")
                return _strided_view(storage.load(), offset, size, stride,
                                     path)

            def persistent_load(self, pid):
                key, dtype, is_bf16 = _pid_storage(pid, path)
                return _StorageRef(dtype, key, is_bf16)

        with zf.open(pkl_name) as f:
            return _Unpickler(f, path).load()


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _read_legacy_pth_without_torch(path: str):
    """Parse a legacy (pre-1.6, non-zip) torch pickle ``.pth`` — the format
    of reference-era torchvision ImageNet weights (e.g.
    ``resnet50-19c8e357.pth``, loaded by the ``--weight-init torchvision``
    path). Layout (torch ``_legacy_save``): four consecutive pickles
    (magic, protocol version, sys_info, the object graph), then the pickled
    storage-key list, then per key an int64 element count + raw bytes.

    Storage payloads come AFTER the object pickle, so tensor rebuilds are
    deferred: persistent ids produce lazy refs, and the returned tree is
    materialized once the payload section has been read."""
    storage_dtypes: Dict[str, np.dtype] = {}
    storage_bytes: Dict[str, bytes] = {}

    class _LazyTensor:
        """numpy-convertible deferred tensor (materializes on access)."""

        def __init__(self, root_key, dtype, is_bf16, storage_offset,
                     size, stride):
            self._spec = (root_key, dtype, is_bf16, storage_offset,
                          size, stride)

        def _materialize(self) -> np.ndarray:
            root_key, dtype, is_bf16, offset, size, stride = self._spec
            base = np.frombuffer(storage_bytes[root_key], dtype=dtype)
            if is_bf16:
                base = (base.astype(np.uint32) << 16).view(np.float32)
            return _strided_view(base, offset, size, stride, path)

        # Walk-free conversion: np.asarray() and the .detach().numpy()
        # duck-type both materialize, so existing consumers
        # (load_torch_checkpoint's final loop, convert_resnet's _set)
        # need no special casing.
        def __array__(self, dtype=None, copy=None):
            a = self._materialize()
            return a.astype(dtype) if dtype is not None else a

        def detach(self):
            return self

        def numpy(self) -> np.ndarray:
            return self._materialize()

    class _Unpickler(_RestrictedUnpickler):
        def _rebuild_tensor(self, storage_ref, offset, size, stride):
            # A PLAIN-pickled tensor (torch.save's _legacy_save uses
            # persistent ids; pickle.dump(tensor) instead routes storage
            # through torch.storage._load_from_bytes, which our find_class
            # stubs to _OpaqueObject) must be REFUSED here: letting the
            # malformed unpack raise TypeError would classify the file as
            # format-unknown and divert it to the torch fallback before
            # the restricted reader ever reaches a refusable payload —
            # the legacy-path twin of the zip two-root bypass (round-5
            # whole-package review, live-reproduced).
            if not (isinstance(storage_ref, tuple) and len(storage_ref) == 3):
                raise RefusedPickleError(
                    f"tensor rebuilt from a non-persistent storage in "
                    f"{path} (plain-pickled tensor?) — refusing")
            root_key, dtype, is_bf16 = storage_ref
            return _LazyTensor(root_key, dtype, is_bf16, offset, size, stride)

        def persistent_load(self, pid):
            # ('storage', type, root_key, location, numel[, view_metadata])
            root_key, dtype, is_bf16 = _pid_storage(pid, path)
            storage_dtypes[root_key] = dtype
            view_metadata = pid[5] if len(pid) > 5 else None
            if view_metadata is not None:
                raise RefusedPickleError(
                    f"legacy storage views unsupported ({path}); load this "
                    f"file once with torch and re-save")
            return (root_key, dtype, is_bf16)

    with open(path, "rb") as f:
        # Header pickles (magic, protocol version, sys_info, key list) go
        # through the same restricted unpickler — no arbitrary globals.
        magic = _Unpickler(f, path).load()
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"{path}: not a legacy torch pickle")
        _Unpickler(f, path).load()    # protocol version
        _Unpickler(f, path).load()    # sys_info
        obj = _Unpickler(f, path).load()
        keys = _Unpickler(f, path).load()
        for key in keys:
            numel = int.from_bytes(f.read(8), "little")
            storage_bytes[key] = f.read(
                numel * storage_dtypes[key].itemsize)
    return obj


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``checkpoint_<iter>.pth`` into a numpy state dict.

    Torch-free: zip-format checkpoints (torch>=1.6 — every published
    reference checkpoint) and legacy pickle files (reference-era
    torchvision ImageNet weights) are both parsed with
    zipfile/pickle+numpy, so a TPU-native deployment needs no torch.
    ``torch.load`` remains the last-resort fallback for FORMAT-unknown
    files only (ancient tar-format etc., when torch is importable) — and
    runs with ``weights_only=True`` as defense in depth: error-type
    routing decides WHICH reader handles a file, and two review-found
    bypasses of that routing (zip two-root decoy, plain-pickled tensor in
    the legacy path) showed the fallback must be unable to execute code
    even when the classification is wrong. A :class:`RefusedPickleError`
    — a restricted reader REFUSING a graph — always propagates. A PLAIN
    ``pickle.UnpicklingError`` from the legacy reader means the bytes are
    not a pickle stream at all ("invalid load key ..." on e.g. an ancient
    tar-format file), so it takes the format-unknown fallback like any
    other parse failure.
    Known-benign extras real checkpoints carry (the
    ``argparse.Namespace`` a torchvision training script saves beside its
    ``state_dict``, reference ``clf_linear.py:137-141``) are instead
    rebuilt as inert objects by the readers themselves
    (``_OPAQUE_GLOBALS``)."""
    try:
        ckpt = _read_pth_without_torch(path)
    except NotZipFormatError:
        # Only the NOT-A-ZIP classification falls through (a failure INSIDE
        # a valid torch-zip — refusal, truncated storage, malformed record —
        # propagates above: a recognized-format file our reader rejected
        # must never reach torch.load). Try the legacy reader; if the
        # FORMAT is still unrecognized (any error that is not a deliberate
        # refusal), fall back to torch.
        try:
            ckpt = _read_legacy_pth_without_torch(path)
        except RefusedPickleError:
            raise
        except Exception as legacy_err:
            try:
                import torch
            except ImportError:
                raise ValueError(
                    f"{path}: unrecognized checkpoint format (not torch-zip "
                    f"or legacy pickle) and torch is not installed for the "
                    f"fallback") from legacy_err
            try:
                ckpt = torch.load(path, map_location="cpu",
                                  weights_only=True)
            except TypeError as torch_err:
                # torch < 1.13 has no weights_only kwarg — report the
                # version incompatibility, not a bogus "loader rejected
                # your file". Still fails closed (no weights_only=False).
                if "weights_only" not in str(torch_err):
                    raise
                raise ValueError(
                    f"{path}: unrecognized checkpoint format, and this "
                    f"torch ({getattr(torch, '__version__', '?')}) lacks "
                    f"torch.load(weights_only=...) (needs >= 1.13) for "
                    f"the safe fallback. Upgrade torch, or if you trust "
                    f"this file, load and re-save it with torch yourself."
                ) from torch_err
            except Exception as torch_err:
                raise ValueError(
                    f"{path}: unrecognized checkpoint format and torch's "
                    f"weights-only loader also rejected it ({torch_err!r})."
                    f" If you trust this file, load and re-save it with "
                    f"torch yourself; this loader will not run "
                    f"weights_only=False on downloaded checkpoints."
                ) from torch_err
    # reference checkpoints nest under "model"; torchvision training-script
    # checkpoints under "state_dict" (reference clf_linear.py:137-141)
    sd = ckpt
    for key in ("model", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            sd = ckpt[key]
            break
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()
            if isinstance(v, np.ndarray) or hasattr(v, "detach")}


# ---------------------------------------------------------------------------
# Reverse direction: flax variable trees → reference torch state-dicts.
# Completes the interchange story (SURVEY §5.4: "checkpoints are also the
# interchange format"): models pretrained HERE can flow back into the
# reference's eval tooling / published-checkpoint workflows unchanged.
# ---------------------------------------------------------------------------


def _f_conv(k: np.ndarray) -> np.ndarray:
    """flax HWIO conv kernel → torch OIHW."""
    return np.ascontiguousarray(np.asarray(k, np.float32).transpose(3, 2, 0, 1))


def _f_lin(k: np.ndarray) -> np.ndarray:
    """flax kernel (in, out) → torch Linear weight (out, in)."""
    return np.ascontiguousarray(np.asarray(k, np.float32).T)


def export_resnet(params: Dict[str, Any], stats: Dict[str, Any],
                  prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_resnet`: our ResNet trees → torchvision
    state-dict naming (incl. ``num_batches_tracked`` for strict loads)."""
    out: Dict[str, np.ndarray] = {}

    def bn(src: Dict, st: Dict, dst: str):
        out[f"{dst}.weight"] = np.asarray(src["scale"], np.float32)
        out[f"{dst}.bias"] = np.asarray(src["bias"], np.float32)
        out[f"{dst}.running_mean"] = np.asarray(st["mean"], np.float32)
        out[f"{dst}.running_var"] = np.asarray(st["var"], np.float32)
        out[f"{dst}.num_batches_tracked"] = np.asarray(0, np.int64)

    out[f"{prefix}conv1.weight"] = _f_conv(params["conv1"]["kernel"])
    bn(params["bn1"], stats["bn1"], f"{prefix}bn1")
    for key in sorted(k for k in params if k.startswith("layer")):
        stage, idx = key[len("layer"):].split("_")
        dst = f"{prefix}layer{stage}.{idx}"
        blk_p, blk_s = params[key], stats[key]
        for c in (1, 2, 3):
            if f"conv{c}" in blk_p:
                out[f"{dst}.conv{c}.weight"] = _f_conv(
                    blk_p[f"conv{c}"]["kernel"])
                bn(blk_p[f"bn{c}"], blk_s[f"bn{c}"], f"{dst}.bn{c}")
        if "downsample_conv" in blk_p:
            out[f"{dst}.downsample.0.weight"] = _f_conv(
                blk_p["downsample_conv"]["kernel"])
            bn(blk_p["downsample_bn"], blk_s["downsample_bn"],
               f"{dst}.downsample.1")
    return out


def _export_ln(tree: Dict, dst: str, out: Dict) -> None:
    out[f"{dst}.weight"] = np.asarray(tree["scale"], np.float32)
    out[f"{dst}.bias"] = np.asarray(tree["bias"], np.float32)


def export_transformer_stack(tree: Dict[str, Any], dst: str
                             ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_transformer_stack`: our decoder params →
    torch ``nn.TransformerDecoder`` naming (packed ``in_proj_weight``)."""
    out: Dict[str, np.ndarray] = {}
    layers = sorted((k for k in tree if k.startswith("layer_")),
                    key=lambda k: int(k.split("_")[1]))
    for key in layers:
        i = int(key.split("_")[1])
        l = tree[key]
        for src_attn, dst_attn in (("self_attn", "self_attn"),
                                   ("cross_attn", "multihead_attn")):
            a = l[src_attn]
            out[f"{dst}.layers.{i}.{dst_attn}.in_proj_weight"] = np.vstack(
                [_f_lin(a[n]["kernel"]) for n in ("query", "key", "value")])
            out[f"{dst}.layers.{i}.{dst_attn}.in_proj_bias"] = np.concatenate(
                [np.asarray(a[n]["bias"], np.float32)
                 for n in ("query", "key", "value")])
            out[f"{dst}.layers.{i}.{dst_attn}.out_proj.weight"] = _f_lin(
                a["out"]["kernel"])
            out[f"{dst}.layers.{i}.{dst_attn}.out_proj.bias"] = np.asarray(
                a["out"]["bias"], np.float32)
        out[f"{dst}.layers.{i}.linear1.weight"] = _f_lin(
            l["ffn"]["intermediate"]["kernel"])
        out[f"{dst}.layers.{i}.linear1.bias"] = np.asarray(
            l["ffn"]["intermediate"]["bias"], np.float32)
        out[f"{dst}.layers.{i}.linear2.weight"] = _f_lin(
            l["ffn"]["output"]["kernel"])
        out[f"{dst}.layers.{i}.linear2.bias"] = np.asarray(
            l["ffn"]["output"]["bias"], np.float32)
        for n in ("norm1", "norm2", "norm3"):
            _export_ln(l[n], f"{dst}.layers.{i}.{n}", out)
    if "final_norm" in tree:
        _export_ln(tree["final_norm"], f"{dst}.norm", out)
    return out


def export_virtex_checkpoint(variables: Dict[str, Any]
                             ) -> Dict[str, np.ndarray]:
    r"""Full flax ``{"params", "batch_stats"}`` → reference VirTex model
    state-dict (``{name: np.ndarray}``). ``torch.save({"model": {k:
    torch.tensor(v) …}})`` then yields a checkpoint the reference's
    ``CheckpointManager.load`` consumes.

    Mirrors the reference's module sharing (``captioning.py:57-63``): for
    bicaptioning the ``backward_textual`` entries for visual projection,
    embedding and output duplicate the forward ones, exactly as the
    reference's ``state_dict()`` emits them.
    """
    # .get: the convert direction accepts textual-only trees (partial
    # load), so the export direction stays symmetric for them.
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    if (params.get("visual", {}).get("cnn")
            and stats.get("visual", {}).get("cnn")):
        out.update(export_resnet(params["visual"]["cnn"],
                                 stats["visual"]["cnn"],
                                 prefix="visual.cnn."))
    t = params["textual"]

    if "visual_projection" not in t and "output" in t:
        # LinearTextualHead (inverse of the convert-direction branch).
        out["textual.output.weight"] = _f_lin(t["output"]["kernel"])
        out["textual.output.bias"] = np.asarray(t["output"]["bias"],
                                                np.float32)
        return out

    def textual_shared(dst: str) -> Dict[str, np.ndarray]:
        words = np.asarray(t["embedding"]["words"]["embedding"], np.float32)
        shared = {
            f"{dst}.visual_projection.weight": _f_lin(
                t["visual_projection"]["kernel"]),
            f"{dst}.visual_projection.bias": np.asarray(
                t["visual_projection"]["bias"], np.float32),
            f"{dst}.embedding.words.weight": words,
            f"{dst}.embedding.positions.weight": np.asarray(
                t["embedding"]["positions"]["embedding"], np.float32),
            # output weight is TIED to the word embedding
            # (reference textual_heads.py:199-200)
            f"{dst}.output.weight": words,
            f"{dst}.output.bias": np.asarray(t["output_bias"], np.float32),
        }
        ln = t["embedding"]["layer_norm"]
        shared[f"{dst}.embedding.layer_norm.weight"] = np.asarray(
            ln["scale"], np.float32)
        shared[f"{dst}.embedding.layer_norm.bias"] = np.asarray(
            ln["bias"], np.float32)
        return shared

    out.update(textual_shared("textual"))
    out.update(export_transformer_stack(t["transformer"],
                                        "textual.transformer"))
    if "backward_transformer" in t:
        out.update(textual_shared("backward_textual"))
        out.update(export_transformer_stack(t["backward_transformer"],
                                            "backward_textual.transformer"))
    return out
