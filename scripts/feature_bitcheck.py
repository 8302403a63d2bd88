r"""
Feature bit-check: load one ``.pth`` checkpoint into BOTH the reference
torch model (imported from ``/root/reference``) and our converted flax
model, and require agreement on

  1. the layer4 visual grid — ``(B, 7, 7, 2048)`` for ResNet-50 at 224px
     (reference ``virtex/modules/visual_backbones.py:55-74``), eval-mode BN;
  2. the composed training loss (+ components), train-mode BN
     (reference ``virtex/models/captioning.py:111-138``,
     ``masked_lm.py:61-76``, ``classification.py:82-93``);
  3. the full backward pass, via d(loss)/d(image) — one tensor that the
     entire gradient graph of both models feeds into.

All five pretext tasks are supported (bicaptioning/captioning/masked_lm/
token_classification/multilabel_classification — the whole zoo surface).

Exits nonzero on any mismatch. This is step [2/5] of
``scripts/reproduce_parity.sh``: on real-data day it gates the published
checkpoint's conversion; the synthetic rehearsal runs it against the
exported-then-reimported ``.pth`` it already produces.

The torch side prefers real torchvision; on a torchvision-less box the
faithful torch ResNet-18/50 from ``tests/reference_stubs.py`` is injected
(state-dict layout pinned against torchvision's in
``tests/test_train_trajectory_parity.py``). Dropout is forced to 0 on both
sides (stochastic masks cannot be compared); everything else — BN modes,
shared bicaptioning modules, CE reduction — runs the two frameworks'
production code paths.

Usage:
    python scripts/feature_bitcheck.py \
        --config configs/task_ablations/bicaptioning_R_50_L1_H2048.yaml \
        --checkpoint-path bicaptioning_R_50_L1_H2048.pth \
        [--config-override KEY VALUE ...] [--batch-size 2] [--tolerance 1e-3]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, os.path.join(REPO, "tests"))

# Forced on both sides: fp32 compute (torch is fp32) and no dropout.
FORCED_OVERRIDES = ["DTYPE", "float32", "MODEL.TEXTUAL.DROPOUT", "0.0"]

CAPTIONING_MODELS = {"virtex", "bicaptioning", "captioning"}


def _rel_diff(ours, ref):
    """max |a-b| scaled by the reference magnitude (robust to near-zero)."""
    import numpy as np
    ours, ref = np.asarray(ours, np.float64), np.asarray(ref, np.float64)
    denom = float(np.max(np.abs(ref))) + 1e-12
    return float(np.max(np.abs(ours - ref))) / denom


def _check(name, ours, ref, tol, failures):
    rel = _rel_diff(ours, ref)
    status = "PASS" if rel <= tol else "FAIL"
    print(f"feature_bitcheck: [{status}] {name}: rel={rel:.3e} "
          f"(tol {tol:.0e})")
    if rel > tol:
        failures.append(name)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--config-override", nargs="*", default=[])
    ap.add_argument("--checkpoint-path", required=True,
                    help="reference torch .pth checkpoint")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tolerance", type=float, default=1e-3,
                    help="relative tolerance for grid/loss")
    ap.add_argument("--grad-tolerance", type=float, default=5e-3,
                    help="relative tolerance for d(loss)/d(image)")
    args = ap.parse_args()

    from virtex_tpu.utils.common import apply_platform_override

    apply_platform_override()

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from reference_stubs import install_reference_stubs

    install_reference_stubs()

    from virtex.models.captioning import (  # noqa: E402 (needs stubs)
        BidirectionalCaptioningModel as RefBidirectional,
        ForwardCaptioningModel as RefForward,
    )
    from virtex.models.classification import (
        MultiLabelClassificationModel as RefMultiLabel,
        TokenClassificationModel as RefTokenCls,
    )
    from virtex.models.masked_lm import MaskedLMModel as RefMaskedLM
    from virtex.modules.textual_heads import (
        LinearTextualHead as RefLinearHead,
        TransformerDecoderTextualHead,
    )
    from virtex.modules.visual_backbones import TorchvisionVisualBackbone

    from virtex_tpu.factories import TextualHeadFactory
    from virtex_tpu.model_zoo import model_zoo
    from virtex_tpu.utils.checkpoint_convert import load_torch_checkpoint

    overrides = list(args.config_override) + FORCED_OVERRIDES

    # ---- our side: converted flax model through the production zoo path --
    model, variables, _C = model_zoo.get(
        os.path.abspath(args.config), pretrained=True,
        checkpoint_path=args.checkpoint_path, overrides=overrides)
    task = _C.MODEL.NAME

    # ---- reference side: the reference's own model code, wired the way
    # the reference factory wires it (factories.py:440-470) ----------------
    arch = _C.MODEL.VISUAL.NAME.split("::")[-1]
    visual = TorchvisionVisualBackbone(
        arch, visual_feature_size=_C.MODEL.VISUAL.FEATURE_SIZE)
    if _C.MODEL.TEXTUAL.NAME == "none":
        textual = RefLinearHead(
            visual_feature_size=_C.MODEL.VISUAL.FEATURE_SIZE,
            vocab_size=_C.DATA.VOCAB_SIZE)
    else:
        m = TextualHeadFactory.NAME_RE.fullmatch(_C.MODEL.TEXTUAL.NAME)
        if not m:
            print(f"feature_bitcheck: cannot parse textual head "
                  f"{_C.MODEL.TEXTUAL.NAME!r}")
            return 2
        textual = TransformerDecoderTextualHead(
            visual_feature_size=_C.MODEL.VISUAL.FEATURE_SIZE,
            vocab_size=_C.DATA.VOCAB_SIZE,
            hidden_size=int(m.group("H")),
            num_layers=int(m.group("L")),
            attention_heads=int(m.group("A")),
            feedforward_size=int(m.group("F")),
            dropout=0.0,
            norm_first=(m.group("norm") == "pre"),
            mask_future_positions=(task in CAPTIONING_MODELS),
            max_caption_length=_C.DATA.MAX_CAPTION_LENGTH,
            padding_idx=_C.DATA.UNK_INDEX)
    if task in CAPTIONING_MODELS:
        ref_cls = (RefBidirectional if task in ("virtex", "bicaptioning")
                   else RefForward)
        ref = ref_cls(visual, textual, sos_index=_C.DATA.SOS_INDEX,
                      eos_index=_C.DATA.EOS_INDEX)
    elif task == "masked_lm":
        ref = RefMaskedLM(visual, textual)
    elif task == "token_classification":
        ref = RefTokenCls(visual, textual, ignore_indices=[
            _C.DATA.UNK_INDEX, _C.DATA.SOS_INDEX, _C.DATA.EOS_INDEX,
            _C.DATA.MASK_INDEX])
    elif task == "multilabel_classification":
        ref = RefMultiLabel(visual, textual, ignore_indices=[0])
    else:
        print(f"feature_bitcheck: unknown MODEL.NAME={task!r}")
        return 2

    sd = load_torch_checkpoint(args.checkpoint_path)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    missing, unexpected = ref.load_state_dict(torch_sd, strict=False)
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    if real_missing or unexpected:
        print(f"feature_bitcheck: FAIL — state-dict mismatch loading "
              f"{args.checkpoint_path} into the reference model:\n"
              f"  missing:    {real_missing}\n  unexpected: {list(unexpected)}")
        return 1

    # ---- fixed inputs -----------------------------------------------------
    B, S = args.batch_size, _C.DATA.IMAGE_CROP_SIZE
    T = _C.DATA.MAX_CAPTION_LENGTH
    rng = np.random.RandomState(args.seed)
    images = (rng.rand(B, 3, S, S).astype(np.float32) - 0.5) / 0.25
    low = max(_C.DATA.SOS_INDEX, _C.DATA.EOS_INDEX, _C.DATA.UNK_INDEX,
              _C.DATA.MASK_INDEX) + 1
    batch_np = {}
    if task == "multilabel_classification":
        # instance labels 1..VOCAB-1 (0 = ignored background), with a
        # padded row and a duplicate (the reference uniques per row)
        labels = rng.randint(1, _C.DATA.VOCAB_SIZE, (B, 5)).astype(np.int64)
        labels[0, 3:] = 0
        if B > 1:
            labels[1, 2] = labels[1, 1]
        batch_np["labels"] = labels
    elif task == "token_classification":
        labels = rng.randint(low, _C.DATA.VOCAB_SIZE, (B, 5)).astype(np.int64)
        labels[0, 3:] = 0
        batch_np["labels"] = labels
    else:  # captioning family + masked_lm share the token layout
        tokens = rng.randint(low, _C.DATA.VOCAB_SIZE, (B, T)).astype(np.int64)
        tokens[:, 0] = _C.DATA.SOS_INDEX
        lengths = np.full((B,), T, np.int64)
        if T > 3:  # one padded row exercises the length mask
            tokens[0, T - 2:], lengths[0] = 0, T - 2
        if task == "masked_lm":
            masked_labels = np.zeros_like(tokens)
            for i in range(B):  # two DISTINCT masked positions per row
                n_mask = min(2, lengths[i] - 1)
                for p in rng.choice(np.arange(1, lengths[i]), size=n_mask,
                                    replace=False):
                    masked_labels[i, p] = tokens[i, p]
                    tokens[i, p] = _C.DATA.MASK_INDEX
            batch_np["masked_labels"] = masked_labels
        else:
            noitpac = np.zeros_like(tokens)
            for i in range(B):
                noitpac[i, :lengths[i]] = tokens[i, :lengths[i]][::-1]
            batch_np["noitpac_tokens"] = noitpac
        batch_np["caption_tokens"] = tokens
        batch_np["caption_lengths"] = lengths

    failures: list = []

    # ---- check 1: eval-mode layer4 grid (BEFORE any train-mode forward —
    # train-mode BN would move the running stats this compares) ------------
    ref.eval()
    with torch.no_grad():
        ref_grid = ref.visual(torch.tensor(images)).numpy()
    our_grid = np.asarray(model.apply(
        variables, jnp.asarray(images.transpose(0, 2, 3, 1)),
        # every pretext model composes .visual; captioning also exposes
        # encode_visual, but this spelling covers MLM/classification too
        method=lambda m, x: m.visual(x, train=False)))
    print(f"feature_bitcheck: visual grid shape {our_grid.shape} "
          f"(reference {tuple(ref_grid.shape)})")
    _check("layer4 grid (eval BN)", our_grid,
           ref_grid.transpose(0, 2, 3, 1), args.tolerance, failures)

    # ---- checks 2+3: train-mode composed loss + d(loss)/d(image) ---------
    ref.train()
    images_t = torch.tensor(images, requires_grad=True)
    ref_out = ref({"image": images_t,
                   **{k: torch.tensor(v) for k, v in batch_np.items()}})
    ref_out["loss"].backward()
    ref_grad = images_t.grad.detach().numpy()

    jbatch = {k: jnp.asarray(v, jnp.int32) for k, v in batch_np.items()}

    def loss_fn(img):
        out = model.apply(variables, {**jbatch, "image": img}, train=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(0)})[0]
        return out["loss"], out["loss_components"]

    (our_loss, our_components), our_grad = jax.value_and_grad(
        loss_fn, has_aux=True)(jnp.asarray(images.transpose(0, 2, 3, 1)))

    _check("training loss", float(our_loss),
           float(ref_out["loss"].detach()), args.tolerance, failures)
    for key, val in sorted(our_components.items()):
        ref_val = ref_out["loss_components"][key].detach()
        _check(f"loss component {key}", float(val), float(ref_val),
               args.tolerance, failures)
    _check("d(loss)/d(image)",
           np.asarray(our_grad).transpose(0, 3, 1, 2), ref_grad,
           args.grad_tolerance, failures)

    if failures:
        print(f"feature_bitcheck: FAIL — {len(failures)} check(s) diverged: "
              f"{failures}")
        return 1
    print(f"feature_bitcheck: PASS — converted flax model matches the "
          f"reference torch model on {args.checkpoint_path} "
          f"(grid + loss + input gradient, B={B}, {S}px, T={T})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
