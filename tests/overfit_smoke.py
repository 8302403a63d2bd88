r"""
End-to-end learning smoke test (run manually; ~2 min on TPU, longer on CPU):
overfit 8 synthetic COCO images with a small bicaptioning model and require
(a) loss < 1.0 and (b) beam search to reproduce >= 6/8 memorized captions
exactly — exercises data plane (native uint8 feed), model, optax stack, and
the compiled KV-cache decode in one loop.

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu python tests/overfit_smoke.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import jax
from virtex_tpu.utils.common import setup_compilation_cache
setup_compilation_cache()
jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np
from utils_fixtures import make_fake_coco, make_tokenizer
import pathlib, shutil
root = "/tmp/overfit_coco"
shutil.rmtree(root, ignore_errors=True)
make_fake_coco(root, n_images=8)
tok = make_tokenizer(pathlib.Path("/tmp"))

from virtex_tpu.config import Config
from virtex_tpu.data import CaptioningDataset, DataLoader
from virtex_tpu.engine import TrainState, initialize_model, make_train_step
from virtex_tpu.engine.captioner import decode_predictions, make_caption_fn
from virtex_tpu.factories import (CaptionDecoderFactory, OptimizerFactory,
                                  PretrainingModelFactory)
from virtex_tpu.parallel import create_mesh, shard_batch

_C = Config(override_list=[
    "MODEL.NAME", "bicaptioning",
    "MODEL.VISUAL.NAME", "torchvision::resnet18",
    "MODEL.VISUAL.FEATURE_SIZE", 512,
    "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H128_A4_F256",
    "MODEL.TEXTUAL.DROPOUT", 0.0,
    "DATA.ROOT", root, "DATA.TOKENIZER_MODEL", "/tmp/tok.model",
    "DATA.VOCAB_SIZE", tok.get_vocab_size(),
    "DATA.IMAGE_CROP_SIZE", 64,
    "DATA.MAX_CAPTION_LENGTH", 16,
    "DATA.IMAGE_TRANSFORM_TRAIN", ["smallest_resize", "center_crop"],
    "OPTIM.OPTIMIZER_NAME", "adamw", "OPTIM.LR", 0.001, "OPTIM.CNN_LR", 0.001,
    "OPTIM.WEIGHT_DECAY", 0.0001, "OPTIM.LOOKAHEAD.USE", False,
    "OPTIM.NUM_ITERATIONS", 300, "OPTIM.WARMUP_STEPS", 20,
])
ds = CaptioningDataset(root, "train", tok, max_caption_length=16,
                       image_transform=None, use_native="auto", crop_size=64,
                       emit_uint8=True)
# deterministic single batch of all 8 images (fixed caption choice via rng seed)
items = [ds.__getitem__(i, rng=np.random.RandomState(0)) for i in range(8)]
batch = ds.collate_fn(items)
model = PretrainingModelFactory.from_config(_C)
mesh = create_mesh(1, 1)
with mesh:
    sb = shard_batch(batch, mesh)
    variables = initialize_model(model, sb, jax.random.PRNGKey(0), mesh)
    tx = OptimizerFactory.from_config(_C, variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, tx, mesh)
    rng = jax.random.PRNGKey(1)
    for it in range(300):
        state, m = step(state, sb, rng)
        if it % 50 == 0:
            print(f"iter {it}: loss {float(m['loss']):.4f}", flush=True)
    print(f"final loss {float(m['loss']):.4f}", flush=True)
    # decode with the trained weights
    decoder = CaptionDecoderFactory.from_config(_C)
    vars_eval = {"params": state.params, "batch_stats": state.batch_stats}
    # train-consistent prefixes for a model trained HERE (the default
    # "reference" mode reproduces the reference's train/inference mismatch
    # — prefixes without SOS — and memorizes only ~2/8 on this probe)
    fn = make_caption_fn(model, decoder, sos_index=1, prefix_mode="sos")
    preds = fn(vars_eval, sb["image"])
    caps = decode_predictions(preds, tok, eos_index=2)
gt = [tok.decode([int(t) for t in row if t not in (0, 1, 2)])
      for row in np.asarray(batch["caption_tokens"])]
matches = sum(c.strip() == g.strip() for c, g in zip(caps, gt))
for c, g in list(zip(caps, gt))[:4]:
    print(f"  pred: {c!r}  gt: {g!r}", flush=True)
print(f"exact caption matches: {matches}/8", flush=True)
assert float(m["loss"]) < 1.0, "did not overfit"
assert matches >= 6, f"beam search should reproduce memorized captions, got {matches}"
print("OVERFIT TEST PASS")
