r"""
Analytic MFU / roofline account of the flagship training step (round-4
verdict #4): FLOPs and minimum HBM traffic for bicaptioning_R_50_L1_H1024
at the bench recipe (2 micro-batches x 128 @ 224^2), against v5e-1 peaks
(197 TFLOP/s bf16, 819 GB/s HBM), reconciled with the measured 64.15
ms/step device profile (docs/design.md).

Counting rules:
- matmul/conv FLOPs = 2 * MACs; backward = 2x forward (dgrad + wgrad),
  so a train step = 3x forward FLOPs. Elementwise/BN FLOPs are omitted
  (they are bandwidth-, not compute-, limited; they appear in the bytes
  account instead).
- minimum HBM bytes = every conv/matmul activation written once forward +
  read once backward (bf16), input gradients written once, weights read
  fwd + read bwd + grad written (fp32 master), optimizer moments
  read+written (adamw-like: sgd momentum + lookahead slow params), batch
  read once. This is a FLOOR: real traffic adds BN stat passes, re-reads
  across fusion boundaries, and padding.

Run: python bench/roofline.py [--img-per-sec 2040] [--batch 256]
Prints a table + one JSON line; bench.py embeds the MFU figure when
VIRTEX_BENCH_MFU=1 (env-gated to keep the driver JSON schema stable).
"""
from __future__ import annotations

import argparse
import json

V5E_PEAK_BF16 = 197e12       # FLOP/s (MXU, bf16)
V5E_HBM_BW = 819e9           # bytes/s

# Flagship dims (configs/_base_bicaptioning_R_50_L1_H1024.yaml)
CROP = 224
CAP_LEN = 30
HIDDEN = 1024
FFN = 4096
VOCAB = 10000
VISUAL_FEAT = 2048
GRID = 7 * 7                  # layer4 tokens at 224^2


def resnet50_convs(crop: int):
    """Yield (h_out, w_out, c_in, c_out, k) for every conv in R-50
    (torchvision v1.5 layout, matching modules/resnet.py: the stage
    stride sits on the 3x3, so the first 1x1 runs at full spatial)."""
    convs = [(crop // 2, crop // 2, 3, 64, 7)]          # stem, stride 2
    spatial = crop // 4                                  # after maxpool
    c_in = 64
    for stage, (n_blocks, c_mid) in enumerate(
            [(3, 64), (4, 128), (6, 256), (3, 512)]):
        c_out = c_mid * 4
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            s_out = spatial // stride
            convs.append((spatial, spatial, c_in, c_mid, 1))  # pre-stride
            convs.append((s_out, s_out, c_mid, c_mid, 3))     # strided 3x3
            convs.append((s_out, s_out, c_mid, c_out, 1))
            if b == 0:
                convs.append((s_out, s_out, c_in, c_out, 1))  # downsample
            c_in, spatial = c_out, s_out
    return convs


def resnet50_flops_fwd(batch: int, crop: int) -> float:
    return sum(2.0 * batch * h * w * co * (k * k * ci)
               for h, w, ci, co, k in resnet50_convs(crop))


def resnet50_act_elems(batch: int, crop: int) -> float:
    """Conv output elements (NHWC) — the activations that must round-trip
    HBM between forward and backward."""
    return sum(batch * h * w * co for h, w, ci, co, k in resnet50_convs(crop))


def resnet50_params() -> float:
    p = sum(k * k * ci * co for _, _, ci, co, k in resnet50_convs(CROP))
    # BN scale/bias per conv output channel (+ running stats excluded: not
    # optimizer-updated)
    p += sum(2 * co for _, _, _, co, _ in resnet50_convs(CROP))
    return p


def textual_flops_fwd(batch: int) -> float:
    """Bicaptioning textual compute: shared visual projection + two
    1-layer decoders (forward + backward captioning) with tied-output
    logits."""
    B, T, H, V = batch, CAP_LEN, HIDDEN, GRID
    f = 2.0 * B * V * VISUAL_FEAT * H                    # visual projection
    per_dir = 0.0
    per_dir += 3 * 2.0 * B * T * H * H                   # self-attn qkv
    per_dir += 2 * 2.0 * B * T * T * H                   # QK^T + AV
    per_dir += 2.0 * B * T * H * H                       # self out proj
    per_dir += 2.0 * B * T * H * H                       # cross q
    per_dir += 2 * 2.0 * B * V * H * H                   # cross k,v
    per_dir += 2 * 2.0 * B * T * V * H                   # cross scores+mix
    per_dir += 2.0 * B * T * H * H                       # cross out proj
    per_dir += 2 * 2.0 * B * T * H * FFN                 # FFN in+out
    per_dir += 2.0 * B * T * H * VOCAB                   # tied logits
    return f + 2 * per_dir


def textual_params() -> float:
    per_dir = (4 * HIDDEN * HIDDEN + 2 * HIDDEN * HIDDEN
               + 2 * HIDDEN * HIDDEN + 2 * HIDDEN * FFN)
    shared = (VISUAL_FEAT * HIDDEN + VOCAB * HIDDEN      # proj + embedding
              + CAP_LEN * HIDDEN)                        # positions
    return shared + 2 * per_dir


def account(batch: int, img_per_sec: float, measured_step_ms: float | None):
    fwd = resnet50_flops_fwd(batch, CROP) + textual_flops_fwd(batch)
    step_flops = 3.0 * fwd

    params = resnet50_params() + textual_params()
    act_elems = (resnet50_act_elems(batch, CROP)
                 # textual activations: per-direction ~ (T+V)*H per
                 # sublayer output x ~6 sublayers + logits
                 + 2 * batch * (6 * (CAP_LEN + GRID) * HIDDEN
                                + CAP_LEN * VOCAB))
    bytes_floor = (
        act_elems * 2 * 2              # bf16 fwd write + bwd read
        + act_elems * 2                # input-gradient writes (bf16)
        + params * 4 * 3               # fp32 weights: fwd read, bwd read, grad write
        + params * 4 * 4               # momentum + lookahead slow: read+write each
        + batch * CROP * CROP * 3 * 4  # input batch, fp32 host layout
    )

    t_step = batch / img_per_sec
    achieved_flops = step_flops / t_step
    mfu = achieved_flops / V5E_PEAK_BF16
    t_bw_floor = bytes_floor / V5E_HBM_BW
    t_compute_floor = step_flops / V5E_PEAK_BF16

    rows = [
        ("forward FLOPs/img", f"{fwd / batch / 1e9:.2f} GF"),
        ("train-step FLOPs (x3, batch)", f"{step_flops / 1e12:.2f} TF"),
        ("params (optimizer-visible)", f"{params / 1e6:.1f} M"),
        ("min HBM bytes/step", f"{bytes_floor / 1e9:.2f} GB"),
        ("step time @ measured img/s", f"{t_step * 1e3:.2f} ms"),
        ("compute floor (197 TF/s)", f"{t_compute_floor * 1e3:.2f} ms"),
        ("bandwidth floor (819 GB/s)", f"{t_bw_floor * 1e3:.2f} ms"),
        ("MFU", f"{mfu * 100:.1f} %"),
        ("HBM floor utilization", f"{t_bw_floor / t_step * 100:.1f} %"),
    ]
    if measured_step_ms:
        rows.append(("device step (profile)", f"{measured_step_ms:.2f} ms"))
        rows.append(("device-time MFU",
                     f"{step_flops / (measured_step_ms / 1e3) / V5E_PEAK_BF16 * 100:.1f} %"))
    width = max(len(r[0]) for r in rows)
    for name, val in rows:
        print(f"  {name:<{width}}  {val}")
    return {
        "mfu": round(mfu, 4),
        "flops_per_step": step_flops,
        "bytes_floor_per_step": bytes_floor,
        "bw_floor_ms": round(t_bw_floor * 1e3, 2),
        "compute_floor_ms": round(t_compute_floor * 1e3, 2),
        "step_ms": round(t_step * 1e3, 2),
    }


def mfu_at(img_per_sec: float, batch: int = 256) -> float:
    """MFU for bench.py's env-gated JSON field."""
    fwd = resnet50_flops_fwd(batch, CROP) + textual_flops_fwd(batch)
    return 3.0 * fwd * img_per_sec / batch / V5E_PEAK_BF16


# ---------------------------------------------------------------------------
# Decode roofline (round-5 verdict #6): the analytic anchor for the measured
# KV-cache decode device times (bench/decode_profile.py: 20.9 ms/call beam-5
# @ bs32, 11.33 ms/call nucleus @ bs32, full 30 steps, encode included).
# ---------------------------------------------------------------------------

def decode_step_weight_params() -> float:
    """Matmul params STREAMED from HBM on every decode step (forward-dir
    textual only): self-attn qkv+out, cross-attn q+out (cross K/V are
    computed once at init and cached), FFN, tied-embedding logits."""
    return (4 * HIDDEN * HIDDEN          # self-attn q,k,v,out
            + 2 * HIDDEN * HIDDEN        # cross-attn q,out
            + 2 * HIDDEN * FFN           # FFN in+out
            + HIDDEN * VOCAB             # tied logits
            + 6 * HIDDEN)                # LN scales/biases (negligible)


def decode_init_weight_params() -> float:
    """Params touched once per call at init_decode: visual projection and
    the cross-attention K/V projections that fill the static cache."""
    return VISUAL_FEAT * HIDDEN + 2 * HIDDEN * HIDDEN


def decode_account(batch_images: int, beam_size: int, steps: int,
                   measured_ms: float | None, label: str):
    """Per-call floor for the compiled caption_fn: R-50 encode (eval BN) +
    param pre-cast (cast_decode_params) + ``steps`` KV-cache decode steps
    over R = batch x beams rows. Floors are MAXIMUM(compute, bandwidth)
    per phase — a lower bound no schedule can beat; the measured/floor
    ratio quantifies the sequential-small-kernel overhead that dominates
    latency-bound decode."""
    R = batch_images * beam_size
    t_avg = steps / 2.0  # self-attn cache grows 0..steps

    # --- encode phase (once per call) -----------------------------------
    enc_flops = resnet50_flops_fwd(batch_images, CROP)
    enc_bytes = (resnet50_act_elems(batch_images, CROP) * 2 * 2  # w+r, bf16
                 + resnet50_params() * 2                         # weights bf16
                 + batch_images * CROP * CROP * 3 * 4)           # input fp32
    # param pre-cast (fp32 read + bf16 write, textual decode set) + init
    # projections compute
    cast_bytes = (decode_step_weight_params()
                  + decode_init_weight_params()) * (4 + 2)
    init_flops = 2.0 * batch_images * (GRID * VISUAL_FEAT * HIDDEN
                                       + GRID * 2 * HIDDEN * HIDDEN)

    # --- per decode step --------------------------------------------------
    w_step = decode_step_weight_params()
    step_flops = 2.0 * R * (6 * HIDDEN * HIDDEN + 2 * HIDDEN * FFN
                            + HIDDEN * VOCAB            # matmuls
                            + 2 * t_avg * HIDDEN        # self QK^T + AV
                            + 2 * GRID * HIDDEN)        # cross scores+mix
    step_bytes = (
        w_step * 2                                      # weights, bf16
        + 2 * R * t_avg * HIDDEN * 2                    # self K,V cache read
        + 2 * R * HIDDEN * 2                            # K,V append write
        + 2 * R * GRID * HIDDEN * 2                     # cross K,V read
        + R * VOCAB * 4 * 2)                            # logits write + topk read
    if beam_size > 1:
        # beam reorder: the flat row-gather rewrites the full static cache
        # (read + write, K and V) every step — the layout trade measured in
        # docs/design.md (round-3: flipping it cost 21%).
        step_bytes += 2 * 2 * R * steps * HIDDEN * 2

    total_flops = enc_flops + init_flops + steps * step_flops
    total_bytes = enc_bytes + cast_bytes + steps * step_bytes
    # phase-wise floor: each phase is bound by its own limiting resource
    floor_ms = 1e3 * (
        max(enc_flops / V5E_PEAK_BF16, enc_bytes / V5E_HBM_BW)
        + max(init_flops / V5E_PEAK_BF16, cast_bytes / V5E_HBM_BW)
        + steps * max(step_flops / V5E_PEAK_BF16, step_bytes / V5E_HBM_BW))
    weight_ms = 1e3 * steps * w_step * 2 / V5E_HBM_BW
    out = {
        "decoder": label,
        "rows": R,
        "floor_ms": round(floor_ms, 3),
        "weight_stream_ms": round(weight_ms, 3),
        "encode_floor_ms": round(1e3 * max(enc_flops / V5E_PEAK_BF16,
                                           enc_bytes / V5E_HBM_BW), 3),
        "step_floor_us": round(1e6 * max(step_flops / V5E_PEAK_BF16,
                                         step_bytes / V5E_HBM_BW), 1),
        "total_gflops": round(total_flops / 1e9, 2),
        "total_mb": round(total_bytes / 1e6, 1),
    }
    rows = [
        (f"[{label}] rows (batch x beams)", f"{R}"),
        ("encode floor (R-50 fwd)", f"{out['encode_floor_ms']} ms"),
        ("per-step floor", f"{out['step_floor_us']} us"),
        ("  of which weight stream", f"{w_step * 2 / V5E_HBM_BW * 1e6:.1f} us"),
        (f"call floor ({steps} steps)", f"{out['floor_ms']} ms"),
    ]
    if measured_ms:
        out["measured_ms"] = measured_ms
        out["floor_utilization"] = round(floor_ms / measured_ms, 3)
        rows.append(("measured device (profile)", f"{measured_ms:.2f} ms"))
        rows.append(("floor utilization",
                     f"{100 * floor_ms / measured_ms:.1f} %"))
    width = max(len(r[0]) for r in rows)
    for name, val in rows:
        print(f"  {name:<{width}}  {val}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-per-sec", type=float, default=2040.0,
                    help="measured throughput (BENCH_r03: 2039.1)")
    ap.add_argument("--batch", type=int, default=256,
                    help="global batch (bench recipe: 2x128)")
    ap.add_argument("--measured-step-ms", type=float, default=None,
                    help="device profile step time for --batch; default "
                         "scales the measured 64.15 ms per 128-image "
                         "micro-step linearly with --batch")
    ap.add_argument("--decode", action="store_true",
                    help="print the DECODE account (beam-5 + nucleus @ "
                         "bs32, 30 steps) instead of the train step")
    ap.add_argument("--decode-batch", type=int, default=32)
    ap.add_argument("--measured-beam-ms", type=float, default=20.9,
                    help="decode_profile.py device ms/call, beam-5 @ bs32")
    ap.add_argument("--measured-nucleus-ms", type=float, default=11.33,
                    help="decode_profile.py device ms/call, nucleus @ bs32")
    args = ap.parse_args()
    if args.decode:
        beam = decode_account(args.decode_batch, 5, CAP_LEN,
                              args.measured_beam_ms, "beam-5")
        nucleus = decode_account(args.decode_batch, 1, CAP_LEN,
                                 args.measured_nucleus_ms, "nucleus")
        print(json.dumps({"beam": beam, "nucleus": nucleus}))
        return
    measured_ms = args.measured_step_ms
    if measured_ms is None:
        # Device time is batch-linear in the measured 64-256 range, so the
        # default must track --batch (a fixed 128.3 ms would misreport
        # device-time MFU by the batch ratio).
        measured_ms = 64.15 * args.batch / 128.0
    out = account(args.batch, args.img_per_sec, measured_ms)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
