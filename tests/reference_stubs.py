"""Shared import shims that make the FULL reference model zoo importable.

The reference's model modules transitively import ``torchvision``,
``sentencepiece`` and ``albumentations`` (none installed in this image)
through ``virtex/data/__init__.py``. The model/optim code paths the parity
tests exercise never *call* into those libraries, so minimal stand-ins
unblock the import chain. ``torchvision.models.resnet18`` is the one stub
that must be REAL: the reference's ``TorchvisionVisualBackbone``
(``visual_backbones.py:20-75``) instantiates it and iterates
``named_children()`` up to ``layer4``, so we provide a faithful torch
ResNet-18 whose state-dict surface is pinned against the torchvision layout
fixture (``torchvision_stub.make_torch_resnet18_sd``) by
``test_train_trajectory_parity.py``.

Import this module BEFORE ``import virtex.*``:

    from reference_stubs import install_reference_stubs, TorchResNet18
    install_reference_stubs()
"""
import sys
import types

from torch import nn


class BasicBlock(nn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    """Child-module ORDER matters: the reference backbone forward iterates
    ``named_children()`` and returns at ``layer4``."""

    def __init__(self, zero_init_residual=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (c_in, c_out, stride) in enumerate(chans, start=1):
            setattr(self, f"layer{i}", nn.Sequential(
                BasicBlock(c_in, c_out, stride), BasicBlock(c_out, c_out)))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, 1000)
        if zero_init_residual:
            for m in self.modules():
                if isinstance(m, BasicBlock):
                    nn.init.zeros_(m.bn2.weight)


class Bottleneck(nn.Module):
    """torchvision-layout bottleneck (1x1 → 3x3[stride] → 1x1×4)."""

    def __init__(self, c_in, width, stride=1):
        super().__init__()
        c_out = 4 * width
        self.conv1 = nn.Conv2d(c_in, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, c_out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(c_out)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class TorchResNet50(nn.Module):
    """Faithful torch ResNet-50 with torchvision's exact module layout —
    needed so ``scripts/feature_bitcheck.py`` can load the FLAGSHIP
    (``torchvision::resnet50``) reference checkpoints on a torchvision-less
    box. State-dict surface is pinned against
    ``torchvision_stub.make_torch_resnet50_sd`` by
    ``test_train_trajectory_parity.py``."""

    BLOCKS = [(64, 64, 1, 3), (256, 128, 2, 4),
              (512, 256, 2, 6), (1024, 512, 2, 3)]

    def __init__(self, zero_init_residual=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        for i, (c_in, width, stride, n) in enumerate(self.BLOCKS, start=1):
            blocks = [Bottleneck(c_in, width, stride)]
            blocks += [Bottleneck(4 * width, width) for _ in range(n - 1)]
            setattr(self, f"layer{i}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, 1000)
        if zero_init_residual:
            for m in self.modules():
                if isinstance(m, Bottleneck):
                    nn.init.zeros_(m.bn3.weight)


def _stub_module(name):
    """A ``types.ModuleType`` with a real ``__spec__`` so in-process callers
    of ``importlib.util.find_spec`` see a normal module instead of raising
    ``ValueError`` on a spec-less fake."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_fake_torchvision():
    tv = _stub_module("torchvision")
    models = _stub_module("torchvision.models")

    def _make_factory(cls):
        def factory(pretrained=False, zero_init_residual=False, **kw):
            if pretrained:
                # Same outcome a torchvision-less box gives (ImportError
                # from ``import torchvision``), just deferred to the weights
                # request: this stub has no model zoo to download from.
                raise ImportError(
                    "reference_stubs torchvision stub: pretrained weights "
                    "are not available (real torchvision is not installed)")
            return cls(zero_init_residual)
        return factory

    def _models_getattr(name):
        # PEP 562 fallback: unknown arch → clear stub error. Must be
        # AttributeError (not ImportError) so hasattr()/dunder probes like
        # ``__file__`` behave normally.
        raise AttributeError(
            f"reference_stubs torchvision stub: models.{name} is not "
            "provided (only resnet18/resnet50; real torchvision is not "
            "installed)")

    models.resnet18 = _make_factory(TorchResNet18)
    models.resnet50 = _make_factory(TorchResNet50)
    models.__getattr__ = _models_getattr
    tv.models = models
    datasets = _stub_module("torchvision.datasets")
    datasets.ImageNet = object  # downstream.py:11 imports it; never used here
    tv.datasets = datasets
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", models)
    sys.modules.setdefault("torchvision.datasets", datasets)


def _install_fake_albumentations():
    """``virtex.data.transforms`` subclasses albumentations transforms and
    builds ``DEFAULT_IMAGE_TRANSFORM`` at module scope (transforms.py:1-97);
    the model/optim path never applies them, so permissive no-op base
    classes are enough to satisfy the import chain."""
    class _T:
        def __init__(self, *a, **k):
            pass

    alb = _stub_module("albumentations")
    for name in ("BasicTransform", "ImageOnlyTransform", "RandomResizedCrop",
                 "CenterCrop", "Resize", "SmallestMaxSize", "Normalize",
                 "Compose", "HorizontalFlip", "ColorJitter"):
        setattr(alb, name, type(name, (_T,), {}))
    sys.modules.setdefault("albumentations", alb)


def _install_fake_sentencepiece():
    """The reference's ``virtex.data.tokenizers`` does ``import
    sentencepiece`` at module scope (tokenizers.py:3) but nothing in the
    model/optim path we exercise ever calls it — an empty module unblocks
    the import chain."""
    sp = _stub_module("sentencepiece")
    sp.SentencePieceProcessor = object
    sys.modules.setdefault("sentencepiece", sp)


def install_reference_stubs():
    """Idempotent; real installations win (``find_spec`` guard, so a fake is
    never registered when the genuine package is importable — the
    ``setdefault`` alone only protected packages imported *before* us).

    The reference tree goes at the END of ``sys.path``: it has top-level
    ``hubconf.py``/``scripts/`` that would otherwise shadow this repo's own
    top-level modules for every test collected after this one (the repo has
    no ``virtex`` package, so ``import virtex.*`` still resolves to the
    reference)."""
    import importlib.util

    def _importable(name):
        if name in sys.modules:  # find_spec raises on spec-less fakes
            return True
        try:
            return importlib.util.find_spec(name) is not None
        except (ImportError, ValueError):
            return False

    if "/root/reference" in sys.path:
        sys.path.remove("/root/reference")
    sys.path.append("/root/reference")
    if not _importable("torchvision"):
        _install_fake_torchvision()
    if not _importable("sentencepiece"):
        _install_fake_sentencepiece()
    if not _importable("albumentations"):
        _install_fake_albumentations()
