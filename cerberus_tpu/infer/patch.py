"""Patch-classifier evaluation (tissue-type head accuracy harness).

Parity target: ``infer/patch.py`` — load joblib ``.dat`` patch files, run
the classifier head, print per-class AP / accuracy / F1 and the normalized
confusion matrix (:61-116). The reference version is bit-rotted (imports a
nonexistent ``PatchDataset2``, :14, and takes a ``run_paramset`` arg the CLI
never passes — SURVEY.md §7 bug list); this is the working rebuild: it uses
the real ``PatchDataset`` contract (``{"img", "ann"}`` joblib payloads,
loader/infer_loader.py:101-137) and the standard manager constructor.
"""
from __future__ import annotations

from typing import Dict, Optional

import joblib
import numpy as np

import jax
import jax.numpy as jnp

from ..models.net_desc import net_forward
from ..utils import cropping_center, recur_find_ext
from .manager import InferManager as BaseInferManager


def load_patch_dataset(file_path_list, input_shape):
    """joblib ``.dat`` files -> (images (N,h,w,3) uint8, labels (N,))."""
    imgs, labels = [], []
    for path in file_path_list:
        info = joblib.load(path)
        patch = cropping_center(np.asarray(info["img"]),
                                (input_shape, input_shape))
        imgs.append(patch)
        labels.append(int(info["ann"]))
    return np.stack(imgs), np.array(labels)


class InferManager(BaseInferManager):
    """Patch-classification evaluation."""

    def process_file_list(self, run_args: dict,
                          class_names: Optional[Dict[int, str]] = None):
        for variable, value in run_args.items():
            setattr(self, variable, value)
        file_path_list = recur_find_ext(self.input_dir, [".dat"])
        assert len(file_path_list) > 0, "Not Detected Any Files From Path"

        imgs, true_list = load_patch_dataset(file_path_list,
                                             int(self.patch_input_shape))
        n_classes = dict(self.cfg.decoder_kwargs)["Patch-Class"]["OUT"]
        if class_names is None:
            class_names = {i + 1: str(i + 1) for i in range(n_classes)}

        @jax.jit
        def cls_step(p, batch):
            out = net_forward(p, batch, self.cfg,
                              compute_dtype=self.compute_dtype)
            logits = out["Patch-Class"].astype(jnp.float32)
            return jax.nn.softmax(logits.reshape(logits.shape[0], -1), -1)

        batch_size = int(self.batch_size)
        prob_list = []
        for start in range(0, len(imgs), batch_size):
            chunk = imgs[start : start + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                # full pad rows (zeros_like(chunk[:pad]) yields only
                # len(chunk) rows when the tail is smaller than the pad,
                # breaking the fixed-batch-shape compile discipline)
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            probs = np.asarray(cls_step(self.params, chunk))
            prob_list.append(probs[: batch_size - pad])
        prob_list = np.concatenate(prob_list, axis=0)
        return evaluate_classification(true_list, prob_list, class_names)


def evaluate_classification(true_list, prob_list, class_names) -> Dict:
    """Print + return AP/accuracy/F1/confusion-matrix metrics
    (infer/patch.py:76-116 semantics)."""
    from sklearn import metrics

    nr_classes = prob_list.shape[-1]
    results = {}
    all_ap = []
    for idx in range(nr_classes):
        true_oneclass = (true_list == idx).astype("int")
        if true_oneclass.sum() == 0:
            continue
        ap = metrics.average_precision_score(true_oneclass,
                                             prob_list[..., idx])
        all_ap.append(ap)
        name = class_names.get(idx + 1, str(idx + 1))
        print("%s-AP" % name, ap)
    print("=" * 40)

    pred_list = np.argmax(prob_list, -1)
    acc_all = float(np.mean(true_list == pred_list))
    all_acc = []
    for idx in range(nr_classes):
        sel = true_list == idx
        if sel.sum() == 0:
            continue
        acc = float(np.mean(pred_list[sel] == idx))
        all_acc.append(acc)
        print("%s-accu" % class_names.get(idx + 1, str(idx + 1)), acc)
    print("=" * 40)

    f1_score = metrics.f1_score(true_list, pred_list, average=None,
                                labels=np.arange(nr_classes),
                                zero_division=0)
    for idx in range(nr_classes):
        print("%s-F1" % class_names.get(idx + 1, str(idx + 1)),
              f1_score[idx])
    print("=" * 40)
    print("ALL-accu", acc_all)
    print("AVG-accu", float(np.mean(all_acc)) if all_acc else float("nan"))
    print("AVG-AP", float(np.mean(all_ap)) if all_ap else float("nan"))
    print("AVG-F1", float(np.mean(f1_score)))
    print("=" * 40)
    conf_mat = metrics.confusion_matrix(true_list, pred_list,
                                        labels=np.arange(nr_classes),
                                        normalize="true")
    print(conf_mat)
    results.update({
        "acc_all": acc_all,
        "avg_acc": float(np.mean(all_acc)) if all_acc else float("nan"),
        "avg_ap": float(np.mean(all_ap)) if all_ap else float("nan"),
        "avg_f1": float(np.mean(f1_score)),
        "conf_mat": conf_mat,
    })
    return results
