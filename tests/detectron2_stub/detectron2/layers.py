import torch


def get_norm(norm: str, out_channels: int):
    if not norm:
        return torch.nn.Identity()
    assert norm in ("BN", "SyncBN", "FrozenBN", "GN"), norm
    return torch.nn.BatchNorm2d(out_channels)
