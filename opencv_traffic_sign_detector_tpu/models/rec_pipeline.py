"""Fused recognition inference: MSER proposals -> HOG -> LDA heads on device.

The reference ships this path commented out (`Reconocimiento de
Objetos/main.py:64`): run the trained classifier over a test directory and
emit resultado.txt detections.  Here it's a first-class batched pipeline:
per frame, proposals (REC variant: grow 1.15, 32x32 crops) are HOG-described
and pushed through the six binary LDA heads (stacked into one [6, 2, D]
tensor contraction) with the reference's arbitration rule — everything
under one jit per batch.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ClassifierConfig, PipelineConfig
from ..constants import (
    DEDUP_COORD_TOL,
    DEDUP_HIST_TOL,
    RECOG_CROP,
    RECOG_GROW,
)
from ..data.gt import GroundTruthBox
from ..data.images import list_frame_files, load_image_bgr
from ..ops.color import bgr_to_gray
from ..ops.dedup import dedup_by_coords, dedup_by_histogram
from ..ops.geometry import filter_and_grow_boxes
from ..ops.hog import gray_descriptors, hog_descriptors
from ..ops.mser import mser_regions
from ..ops.preprocess import enhance_contrast
from ..ops.resize import crop_and_resize
from .recognizer import SignClassifier, arbitrate_lda_heads


def _stack_heads(clf: SignClassifier) -> tuple[np.ndarray, np.ndarray]:
    """Six binary LDA heads -> (coefs [6, 2, D], intercepts [6, 2])."""
    coefs = np.stack([h.coef for h in clf.heads]).astype(np.float32)
    ints = np.stack([h.intercept for h in clf.heads]).astype(np.float32)
    return coefs, ints


def classify_crops_lda(
    feats: jnp.ndarray,
    head_coefs: jnp.ndarray,
    head_ints: jnp.ndarray,
    tol: float,
):
    """[N, D] features -> (labels [N] 0..6, confidence [N]).

    One einsum evaluates all six heads; per-head probabilities are the
    binary-LDA sigmoid of the class-score contrast, then the reference
    arbitration picks the winner.
    """
    scores = jnp.einsum("nd,hcd->hnc", feats, head_coefs) + head_ints[:, None, :]
    p1 = jax.nn.sigmoid(scores[..., 1] - scores[..., 0])  # [6, N]
    probs = jnp.stack([1.0 - p1, p1], axis=-1)  # [6, N, 2]
    labels = arbitrate_lda_heads(probs, tol)
    conf = jnp.max(jnp.maximum(probs[..., 0], probs[..., 1]), axis=0)
    sign_conf = jnp.max(jnp.where(p1 >= 0.5, p1, 0.0), axis=0)
    conf = jnp.where(labels > 0, sign_conf, conf)
    return labels, conf


def recognize_frame(bgr: jnp.ndarray, head_coefs, head_ints, cfg: PipelineConfig,
                    features: str):
    """One frame -> (boxes [D,4] xyxy, labels [D], scores [D], valid [D])."""
    gray = enhance_contrast(bgr)
    props, pvalid = mser_regions(gray, cfg.mser)
    boxes, keep = filter_and_grow_boxes(props, pvalid, RECOG_GROW)
    crops = crop_and_resize(bgr, boxes, RECOG_CROP)
    crops, boxes, keep = dedup_by_histogram(crops, boxes, keep, DEDUP_HIST_TOL)
    crops, boxes, keep = dedup_by_coords(crops, boxes, keep, DEDUP_COORD_TOL)
    gray_crops = bgr_to_gray(crops)
    feats = hog_descriptors(gray_crops) if features == "HOG" else gray_descriptors(gray_crops)
    labels, conf = classify_crops_lda(feats, head_coefs, head_ints, cfg.no_sign_tol)
    final = keep & (labels > 0)

    d = cfg.max_detections
    n = final.shape[0]
    (idx,) = jnp.nonzero(final, size=d, fill_value=n)
    count = jnp.sum(final)
    valid = jnp.arange(d) < count
    pad = lambda x, fill: jnp.concatenate(
        [x, jnp.full((1,) + x.shape[1:], fill, x.dtype)]
    )
    return (
        pad(boxes, 0)[idx],
        pad(labels, 0)[idx],
        pad(conf, 0.0)[idx],
        valid,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "features"))
def recognize_batch(frames, head_coefs, head_ints, cfg: PipelineConfig,
                    features: str):
    return jax.vmap(
        lambda f: recognize_frame(f, head_coefs, head_ints, cfg, features)
    )(frames)


@dataclasses.dataclass
class RecognitionPipeline:
    """Host-facing recognizer over directories of frames (LDABAYES heads)."""

    cfg: PipelineConfig
    classifier: SignClassifier

    def __post_init__(self):
        if self.classifier.config.classifier != "LDABAYES":
            raise NotImplementedError(
                "fused device inference currently supports the LDABAYES "
                "heads; KNN classification runs via predict_classifier()"
            )
        self._coefs, self._ints = _stack_heads(self.classifier)

    def recognize_frames(self, frames: np.ndarray, names: list[str]):
        boxes, labels, scores, valid = recognize_batch(
            jnp.asarray(frames),
            jnp.asarray(self._coefs),
            jnp.asarray(self._ints),
            self.cfg,
            self.classifier.config.features,
        )
        boxes = np.asarray(boxes)
        labels = np.asarray(labels)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        out: list[GroundTruthBox] = []
        for b in range(frames.shape[0]):
            for i in np.nonzero(valid[b])[0]:
                x1, y1, x2, y2 = (int(v) for v in boxes[b, i])
                out.append(
                    GroundTruthBox(
                        filename=names[b], x1=x1, y1=y1, x2=x2, y2=y2,
                        class_id=int(labels[b, i]), score=float(scores[b, i]),
                    )
                )
        return out

    def run_directory(self, directory: str, progress: bool = False):
        files = list_frame_files(directory)
        bsz = self.cfg.batch_size
        detections: list[GroundTruthBox] = []
        for start in range(0, len(files), bsz):
            chunk = files[start : start + bsz]
            frames = np.stack(
                [load_image_bgr(f"{directory}/{f}") for f in chunk]
            )
            names = list(chunk)
            if len(chunk) < bsz:
                reps = bsz - len(chunk)
                frames = np.concatenate([frames, frames[-1:].repeat(reps, 0)])
                names += ["__pad__"] * reps
            dets = self.recognize_frames(frames, names)
            detections.extend(d for d in dets if d.filename != "__pad__")
            if progress:
                print(f"  processed {min(start + bsz, len(files))}/{len(files)} frames")
        return detections
