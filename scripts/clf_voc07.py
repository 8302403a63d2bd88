r"""
VOC07 SVM evaluation: extract frozen-backbone features on device, train
per-class linear SVMs on the host CPU pool.

Parity target: reference ``scripts/clf_voc07.py:56-258`` — GAP(2048)
features L2-normalised, LinearSVC over costs {0.01, 0.1, 1, 10} with 3-fold
AP cross-validation and class_weight {1: 2, −1: 1}; mean test AP = mAP.
"""
from __future__ import annotations

import logging
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from virtex_tpu.config import Config
from virtex_tpu.data.loader import DataLoader
from virtex_tpu.engine import apply_backbone_weight_init, initialize_model
from virtex_tpu.factories import (
    DownstreamDatasetFactory,
    VisualBackboneFactory,
)
from virtex_tpu.models.downstream import LinearClassifierModel
from virtex_tpu.utils.common import common_parser, common_setup

logger = logging.getLogger("virtex_tpu")

SVM_COSTS = [0.01, 0.1, 1.0, 10.0]


def train_test_single_svm(args):
    """One one-vs-all SVM with cost cross-validation
    (reference ``clf_voc07.py:56-105``)."""
    feats_train, tgts_train, feats_test, tgts_test, cls_name = args
    from sklearn.model_selection import cross_val_score
    from sklearn.svm import LinearSVC

    cls_labels = np.copy(tgts_train)
    # 0 = ignore → treat as negative (reference clf_voc07.py:63-66)
    cls_labels[cls_labels == 0] = -1

    best_crossval_ap, best_cost = -1.0, SVM_COSTS[0]
    for cost in SVM_COSTS:
        clf = LinearSVC(C=cost, class_weight={1: 2, -1: 1}, max_iter=2000,
                        penalty="l2", loss="squared_hinge", dual="auto")
        ap_scores = cross_val_score(clf, feats_train, cls_labels, cv=3,
                                    scoring="average_precision")
        if ap_scores.mean() > best_crossval_ap:
            best_crossval_ap, best_cost = ap_scores.mean(), cost

    clf = LinearSVC(C=best_cost, class_weight={1: 2, -1: 1}, max_iter=2000,
                    dual="auto")
    clf.fit(feats_train, cls_labels)

    from sklearn.metrics import average_precision_score
    # exclude difficult/ignore instances from evaluation
    # (reference clf_voc07.py:96-101), then {0 absent → −1}
    keep = tgts_test != -1
    test_labels = np.copy(tgts_test[keep])
    test_labels[test_labels == 0] = -1
    ap = average_precision_score(
        test_labels, clf.decision_function(feats_test[keep]))
    return cls_name, float(ap)


def extract_features(model, variables, dataset, batch_size, workers):
    # pad_final: every image contributes (drop_last would silently compute
    # the SVMs/mAP on a truncated set); padded tail rows are trimmed below,
    # and the static batch shape keeps ONE compiled feature program.
    loader = DataLoader(dataset, batch_size, shuffle=False,
                        num_workers=workers, infinite=False,
                        drop_last=False, pad_final=True)

    @jax.jit
    def feat_fn(variables, images):
        return model.apply(variables, images, method="features")

    all_feats, all_labels = [], []
    for batch in loader:
        feats = feat_fn(variables, jax.numpy.asarray(batch["image"]))
        all_feats.append(np.asarray(feats))
        all_labels.append(np.asarray(batch["label"]))
    return (np.concatenate(all_feats)[: len(dataset)],
            np.concatenate(all_labels)[: len(dataset)])


def main(_A) -> None:
    _C = Config(_A.config, _A.config_override)
    _DOWNC = (Config(_A.down_config, _A.down_config_override)
              if _A.down_config else _C)
    common_setup(_DOWNC, _A, job_type="clf_voc07")

    visual = VisualBackboneFactory.create(_C.MODEL.VISUAL.NAME, frozen=True)
    model = LinearClassifierModel(visual=visual, num_classes=20)

    train_ds = DownstreamDatasetFactory.from_config(_DOWNC, split="trainval")
    test_ds = DownstreamDatasetFactory.from_config(_DOWNC, split="test")

    sample = {"image": jax.numpy.zeros((1, 224, 224, 3)),
              "label": jax.numpy.zeros((1,), jax.numpy.int32)}
    variables = initialize_model(model, sample, jax.random.PRNGKey(0))
    # Four init modes like the reference (clf_voc07.py:40-47 shares
    # clf_linear's flag); "virtex" needs --checkpoint-path.
    apply_backbone_weight_init(
        variables, _A.weight_init, _A.checkpoint_path,
        arch=_C.MODEL.VISUAL.NAME.split("::")[-1])

    logger.info("Extracting features (train)…")
    feats_train, tgts_train = extract_features(
        model, variables, train_ds, _DOWNC.OPTIM.BATCH_SIZE, _A.cpu_workers)
    logger.info("Extracting features (test)…")
    feats_test, tgts_test = extract_features(
        model, variables, test_ds, _DOWNC.OPTIM.BATCH_SIZE, _A.cpu_workers)

    class_names = getattr(train_ds, "class_names",
                          [str(i) for i in range(tgts_train.shape[1])])
    jobs = [
        (feats_train, tgts_train[:, c], feats_test, tgts_test[:, c], name)
        for c, name in enumerate(class_names)
    ]
    with mp.Pool(processes=min(len(jobs), os.cpu_count() or 4)) as pool:
        results = pool.map(train_test_single_svm, jobs)

    aps = {name: ap for name, ap in results}
    mAP = 100.0 * np.mean(list(aps.values()))
    for name, ap in sorted(aps.items()):
        logger.info(f"AP {name}: {100 * ap:.2f}")
    logger.info(f"VOC07 mAP: {mAP:.2f}")
    print(f'{{"metric": "voc07_mAP", "value": {mAP:.3f}}}')


if __name__ == "__main__":
    parser = common_parser(description="VOC07 SVM evaluation.")
    parser.add_argument("--down-config", default=None)
    parser.add_argument("--down-config-override", nargs="*", default=[],
                        help="Key-value pairs patching the downstream "
                             "config (reference clf_voc07.py:31-35).")
    parser.add_argument(
        "--weight-init",
        choices=["random", "imagenet", "torchvision", "virtex"],
        default="virtex",
        help="Backbone init mode (reference clf_voc07.py:40-47).")
    parser.add_argument("--checkpoint-path", default=None)
    main(parser.parse_args())
