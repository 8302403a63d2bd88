"""Synthetic torchvision-style ResNet-18/50 state dicts (correct
names/shapes, random values) — lets converter/export tests run without
torchvision, and pins the reference_stubs torch models' layouts."""
import numpy as np

_STAGES = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}


def make_torch_resnet18_sd(seed: int = 0):
    rng = np.random.RandomState(seed)

    def w(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    sd = {"conv1.weight": w(64, 3, 7, 7)}

    def bn(name, c):
        sd[f"{name}.weight"] = w(c) + 1.0
        sd[f"{name}.bias"] = w(c)
        sd[f"{name}.running_mean"] = w(c)
        sd[f"{name}.running_var"] = np.abs(w(c)) + 1.0

    bn("bn1", 64)
    for stage, (c_in, c_out) in _STAGES.items():
        for block in range(2):
            p = f"layer{stage}.{block}"
            first_in = c_in if block == 0 else c_out
            sd[f"{p}.conv1.weight"] = w(c_out, first_in, 3, 3)
            bn(f"{p}.bn1", c_out)
            sd[f"{p}.conv2.weight"] = w(c_out, c_out, 3, 3)
            bn(f"{p}.bn2", c_out)
            if block == 0 and stage > 1:
                sd[f"{p}.downsample.0.weight"] = w(c_out, c_in, 1, 1)
                bn(f"{p}.downsample.1", c_out)
    return sd


# (stage_in, bottleneck_width, n_blocks) per stage; out = 4 * width.
_STAGES_50 = [(64, 64, 3), (256, 128, 4), (512, 256, 6), (1024, 512, 3)]


def make_torch_resnet50_sd(seed: int = 0):
    """torchvision resnet50 state-dict layout (bottlenecks; EVERY stage's
    block 0 carries a downsample — layer1 included, 64→256 channels)."""
    rng = np.random.RandomState(seed)

    def w(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    sd = {"conv1.weight": w(64, 3, 7, 7)}

    def bn(name, c):
        sd[f"{name}.weight"] = w(c) + 1.0
        sd[f"{name}.bias"] = w(c)
        sd[f"{name}.running_mean"] = w(c)
        sd[f"{name}.running_var"] = np.abs(w(c)) + 1.0

    bn("bn1", 64)
    for stage, (c_in, width, n_blocks) in enumerate(_STAGES_50, start=1):
        c_out = 4 * width
        for block in range(n_blocks):
            p = f"layer{stage}.{block}"
            first_in = c_in if block == 0 else c_out
            sd[f"{p}.conv1.weight"] = w(width, first_in, 1, 1)
            bn(f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = w(width, width, 3, 3)
            bn(f"{p}.bn2", width)
            sd[f"{p}.conv3.weight"] = w(c_out, width, 1, 1)
            bn(f"{p}.bn3", c_out)
            if block == 0:
                sd[f"{p}.downsample.0.weight"] = w(c_out, first_in, 1, 1)
                bn(f"{p}.downsample.1", c_out)
    return sd
