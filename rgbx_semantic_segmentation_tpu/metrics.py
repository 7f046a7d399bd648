"""Segmentation metrics: confusion matrix and the IoU family.

Numerical parity targets: reference `utils/metric.py:8-30` (`hist_info`,
`compute_score`). Provided both as pure-numpy (host aggregation, bit-identical to
the reference) and as jittable jax.numpy versions for on-device accumulation so the
confusion matrix can be reduced across a device mesh with `psum` instead of a host
round-trip per image.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

np.seterr(divide="ignore", invalid="ignore")


def hist_info(n_cl: int, pred: np.ndarray, gt: np.ndarray):
    """Confusion matrix over valid pixels (reference utils/metric.py:8-15).

    Valid pixels are 0 <= gt < n_cl; the 255 ignore label falls out naturally.
    Returns (hist[n_cl, n_cl], labeled, correct) where hist[g, p] counts pixels of
    ground-truth class g predicted as class p.
    """
    assert pred.shape == gt.shape
    k = (gt >= 0) & (gt < n_cl)
    labeled = np.sum(k)
    correct = np.sum(pred[k] == gt[k])
    hist = np.bincount(
        n_cl * gt[k].astype(int) + pred[k].astype(int), minlength=n_cl ** 2
    ).reshape(n_cl, n_cl)
    return hist, labeled, correct


def hist_info_jax(n_cl: int, pred: jnp.ndarray, gt: jnp.ndarray):
    """Jittable confusion matrix. Same semantics as :func:`hist_info`.

    Uses a one-pass scatter-add with invalid pixels routed to a scratch bin, so the
    shape is static and the op maps onto the VPU without host sync.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < n_cl)
    labeled = jnp.sum(valid)
    correct = jnp.sum(valid & (pred == gt))
    # Route invalid pixels to an extra trailing bin, then drop it.
    idx = jnp.where(valid, n_cl * gt + jnp.clip(pred, 0, n_cl - 1), n_cl * n_cl)
    flat = jnp.zeros((n_cl * n_cl + 1,), jnp.int32).at[idx].add(1)
    hist = flat[: n_cl * n_cl].reshape(n_cl, n_cl)
    return hist, labeled, correct


class Scores(NamedTuple):
    iou: np.ndarray
    mean_iou: float
    mean_iou_no_back: float
    freq_iou: float
    mean_pixel_acc: float
    pixel_acc: float


def compute_score(hist: np.ndarray, correct, labeled) -> Scores:
    """IoU family from an accumulated confusion matrix
    (reference utils/metric.py:17-30)."""
    hist = np.asarray(hist, dtype=np.float64)
    iou = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    mean_iou = np.nanmean(iou)
    mean_iou_no_back = np.nanmean(iou[1:])
    freq = hist.sum(1) / hist.sum()
    freq_iou = (iou[freq > 0] * freq[freq > 0]).sum()
    class_acc = np.diag(hist) / hist.sum(axis=1)
    mean_pixel_acc = np.nanmean(class_acc)
    pixel_acc = float(correct) / float(labeled) if labeled else float("nan")
    return Scores(iou, float(mean_iou), float(mean_iou_no_back), float(freq_iou),
                  float(mean_pixel_acc), float(pixel_acc))


def print_iou(scores: Scores, class_names: Sequence[str] = None,
              show_no_back: bool = False) -> str:
    """Formatted per-class IoU table (reference utils/visualize.py:54-74)."""
    n = len(scores.iou)
    lines = []
    for i in range(n):
        cls = f"{i + 1} {class_names[i]}" if class_names else f"Class {i + 1}"
        lines.append(f"{cls:8s}\t{scores.iou[i] * 100:.3f}%")
    if show_no_back:
        summary = (
            f"mean_IoU: {scores.mean_iou * 100:.3f}% "
            f"|| mean_IoU_no_back: {scores.mean_iou_no_back * 100:.3f}% "
            f"|| freq_IoU: {scores.freq_iou * 100:.3f}% "
            f"|| mean_pixel_acc: {scores.mean_pixel_acc * 100:.3f}% "
            f"|| pixel_acc: {scores.pixel_acc * 100:.3f}%"
        )
    else:
        summary = (
            f"mean_IoU: {scores.mean_iou * 100:.3f}% "
            f"|| freq_IoU: {scores.freq_iou * 100:.3f}% "
            f"|| mean_pixel_acc: {scores.mean_pixel_acc * 100:.3f}% "
            f"|| pixel_acc: {scores.pixel_acc * 100:.3f}%"
        )
    line = "-" * 24
    lines.append(f"{line}{summary}{line}")
    return "\n".join(lines)
