r"""
Host data-plane micro-benchmark: native C++ fused pipeline vs the cv2/numpy
reference path, on synthetic COCO-sized JPEGs (640×480).

Usage: python bench/data_bench.py [n_images]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from virtex_tpu.data.native_pipeline import (
    NativeCaptionTrainPipeline,
    native_available,
)
from virtex_tpu.data.transforms import (
    ColorJitter,
    Compose,
    HorizontalFlip,
    Normalize,
    RandomResizedSquareCrop,
)


def synth_jpegs(n, h=480, w=640, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    base = rng.randint(0, 255, (h, w, 3), np.uint8)
    for i in range(n):
        img = np.roll(base, i * 7, axis=1)
        ok, enc = cv2.imencode(".jpg", img)
        out.append(enc.tobytes())
    return out


def main(n=300):
    blobs = synth_jpegs(n)
    rng = np.random.RandomState(0)

    # cv2 reference path: decode + RandomResizedCrop + flip + jitter + norm
    ref = Compose([RandomResizedSquareCrop(224, scale=(0.2, 1.0)),
                   HorizontalFlip(0.5), ColorJitter(), Normalize()])
    t0 = time.perf_counter()
    for b in blobs:
        img = cv2.imdecode(np.frombuffer(b, np.uint8),
                           cv2.IMREAD_COLOR)[:, :, ::-1]
        ref(img, "a cat on the left", rng)
    t_ref = time.perf_counter() - t0

    results = {"cv2_img_per_sec": round(n / t_ref, 1)}

    if native_available():
        pipe = NativeCaptionTrainPipeline(224)
        t0 = time.perf_counter()
        for b in blobs:
            pipe(b, "a cat on the left", rng)
        t_nat = time.perf_counter() - t0
        results["native_img_per_sec"] = round(n / t_nat, 1)
        results["speedup"] = round(t_ref / t_nat, 2)

        # fused path without python-side jitter (pure C++ per image)
        pipe2 = NativeCaptionTrainPipeline(224, use_jitter=False)
        t0 = time.perf_counter()
        for b in blobs:
            pipe2(b, None, rng)
        results["native_nojitter_img_per_sec"] = round(
            n / (time.perf_counter() - t0), 1)

        # OpenMP whole-batch path (one native call per 64 images; the win
        # scales with host core count — this box has 1 core)
        results["host_cores"] = os.cpu_count()
        t0 = time.perf_counter()
        for lo in range(0, n, 64):
            chunk = blobs[lo:lo + 64]
            pipe.batch(chunk, [None] * len(chunk),
                       [np.random.RandomState(i) for i in range(len(chunk))])
        results["native_batch_img_per_sec"] = round(
            n / (time.perf_counter() - t0), 1)

    # Feed margin vs the measured device demand (bench.py, v5e-1): how
    # many host cores must run the whole-batch native path to keep the
    # chip fed. Per-core figure == the batch path on this 1-core box.
    device_demand = float(os.environ.get("DEVICE_IMG_PER_SEC", "1966"))
    per_core = results.get("native_batch_img_per_sec",
                           results["cv2_img_per_sec"])
    results["device_img_per_sec"] = device_demand
    results["feed_cores_required"] = round(device_demand / per_core, 1)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
