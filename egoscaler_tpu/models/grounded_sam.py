"""GroundedSAM: zero-shot object masks (detect -> segment -> refine).

Rebuild of third_party/grounded_sam/grounded_sam.py:83-225 with the same
`predict(image, labels, threshold) -> (masks, boxes, scores)` API:

* detection through the stage-6 `Detector` protocol (HF Grounding-DINO
  locally, motion-detector fallback);
* segmentation through a `Segmenter` protocol: `HFSamSegmenter` (local
  facebook/sam-vit-huge weights, the reference's segmenter) or
  `GrabCutSegmenter` (cv2 box-seeded segmentation — weight-free
  fallback that still produces tight object masks);
* polygon refinement (largest-contour fill, grounded_sam.py:106-156)
  with cv2.

The JAX-native SAM lives in models/sam.py (HF-parity tested); this
module carries the pipeline API, the segmenter protocol, and the
refinement logic.
"""
from __future__ import annotations

from typing import List, Optional, Protocol, Sequence, Tuple

import numpy as np


class Segmenter(Protocol):
    def segment(
        self, image: np.ndarray, boxes: Sequence[Sequence[float]]
    ) -> np.ndarray:
        """(H, W, 3) + [[x1,y1,x2,y2], ...] -> (N, H, W) bool masks."""
        ...


class HFSamSegmenter:
    """SAM via local HF weights (the reference segmenter)."""

    def __init__(self, model_path: str, device: str = "cpu"):
        from transformers import AutoModelForMaskGeneration, AutoProcessor

        self.model = AutoModelForMaskGeneration.from_pretrained(
            model_path, local_files_only=True
        ).to(device)
        self.processor = AutoProcessor.from_pretrained(
            model_path, local_files_only=True
        )
        self.device = device

    def segment(self, image, boxes):
        import torch

        inputs = self.processor(
            images=image, input_boxes=[[list(b) for b in boxes]],
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            outputs = self.model(**inputs)
        masks = self.processor.post_process_masks(
            masks=outputs.pred_masks,
            original_sizes=inputs.original_sizes,
            reshaped_input_sizes=inputs.reshaped_input_sizes,
        )[0]
        # (N, 3, H, W) multi-mask -> mean>0 (grounded_sam.py:108-113)
        m = masks.float().mean(dim=1)
        return (m > 0).numpy()


class JaxSamSegmenter:
    """JAX-native SAM (models/sam.py) behind the Segmenter protocol.

    Loads HF sam-vit-* checkpoints via convert_sam; picks the best mask
    by predicted IoU per box."""

    def __init__(self, checkpoint_path: Optional[str] = None, cfg=None,
                 params=None, rng_seed: int = 0):
        import jax
        import jax.numpy as jnp

        from egoscaler_tpu.models.sam import SamConfig, SamModel

        self.cfg = cfg or SamConfig.vit_h()
        self.model = SamModel(self.cfg)
        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            from egoscaler_tpu.models.convert import convert_sam, load_torch_file

            self.params = convert_sam(
                load_torch_file(checkpoint_path),
                num_vision_layers=self.cfg.vision.num_layers,
                num_decoder_layers=self.cfg.decoder.num_layers,
            )
        else:
            s = self.cfg.vision.image_size
            self.params = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, s, s, 3), jnp.float32),
                input_boxes=jnp.zeros((1, 1, 4), jnp.float32),
            )
        self._fwd = jax.jit(
            lambda p, img, boxes: self.model.apply(p, img, input_boxes=boxes)
        )

    def segment(self, image, boxes):
        import jax
        import jax.numpy as jnp

        h, w = image.shape[:2]
        s = self.cfg.vision.image_size
        img = jax.image.resize(
            jnp.asarray(image, jnp.float32) / 255.0, (s, s, 3), "linear"
        )
        # ImageNet normalization (HF SamProcessor)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        img = ((img - mean) / std)[None]
        scale = jnp.asarray([s / w, s / h, s / w, s / h], jnp.float32)
        bx = jnp.asarray(boxes, jnp.float32)[None] * scale
        masks, iou = self._fwd(self.params, img, bx)
        best = jnp.argmax(iou[0], axis=-1)  # (P,)
        sel = jnp.take_along_axis(
            masks[0], best[:, None, None, None], axis=1
        )[:, 0]  # (P, gh, gw)
        sel = jax.image.resize(sel, (sel.shape[0], h, w), "linear")
        return np.asarray(sel > 0)


class GrabCutSegmenter:
    """Box-seeded cv2 GrabCut — weight-free segmentation fallback."""

    def __init__(self, iters: int = 3):
        self.iters = iters

    def segment(self, image, boxes):
        import cv2

        h, w = image.shape[:2]
        out = []
        for x1, y1, x2, y2 in boxes:
            x1, y1 = max(int(x1), 0), max(int(y1), 0)
            x2, y2 = min(int(x2), w - 1), min(int(y2), h - 1)
            if x2 - x1 < 3 or y2 - y1 < 3:
                m = np.zeros((h, w), bool)
                m[y1:y2, x1:x2] = True
                out.append(m)
                continue
            mask = np.zeros((h, w), np.uint8)
            bgd = np.zeros((1, 65), np.float64)
            fgd = np.zeros((1, 65), np.float64)
            try:
                cv2.grabCut(
                    np.ascontiguousarray(image[..., :3].astype(np.uint8)),
                    mask, (x1, y1, x2 - x1, y2 - y1), bgd, fgd,
                    self.iters, cv2.GC_INIT_WITH_RECT,
                )
                m = (mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)
                if not m.any():
                    raise ValueError
            except Exception:
                m = np.zeros((h, w), bool)
                m[y1:y2, x1:x2] = True
            out.append(m)
        return np.stack(out) if out else np.zeros((0, h, w), bool)


def mask_to_polygon(mask: np.ndarray) -> List[List[int]]:
    """Largest-contour polygon (grounded_sam.py:148-156)."""
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return []
    largest = max(contours, key=cv2.contourArea)
    return largest.reshape(-1, 2).tolist()


def polygon_to_mask(
    polygon: List[List[int]], shape: Tuple[int, int]
) -> np.ndarray:
    """(grounded_sam.py:125-146)."""
    import cv2

    mask = np.zeros(shape, np.uint8)
    if polygon:
        cv2.fillPoly(mask, [np.array(polygon, np.int32)], color=(255,))
    return mask


def refine_masks(
    masks: np.ndarray, polygon_refinement: bool = False
) -> List[np.ndarray]:
    """(grounded_sam.py:106-123)."""
    out = [m.astype(np.uint8) for m in masks]
    if polygon_refinement:
        for i, m in enumerate(out):
            poly = mask_to_polygon(m)
            out[i] = (polygon_to_mask(poly, m.shape) > 0).astype(np.uint8)
    return out


class GroundedSAM:
    """predict() facade (grounded_sam.py:160-225 API)."""

    def __init__(
        self,
        detector=None,
        segmenter: Optional[Segmenter] = None,
        polygon_refinement: bool = True,
    ):
        if detector is None:
            from egoscaler_tpu.pipelines.stages.stage6_boxes import MotionDetector

            detector = MotionDetector()
        self.detector = detector
        self.segmenter = segmenter or GrabCutSegmenter()
        self.polygon_refinement = polygon_refinement

    def predict(
        self,
        image: np.ndarray,
        labels: Sequence[str],
        threshold: float = 0.3,
    ):
        """-> (masks (N, H, W) uint8, boxes (N, 4), scores (N,)) or
        (None, None, None) when nothing is detected."""
        image = np.asarray(image)
        dets = self.detector.detect([image, image], labels, threshold)[-1]
        if not dets:
            return None, None, None
        boxes = [
            [d["box"]["xmin"], d["box"]["ymin"], d["box"]["xmax"], d["box"]["ymax"]]
            for d in dets
        ]
        scores = np.array([d["score"] for d in dets], np.float32)
        masks = self.segmenter.segment(image, boxes)
        masks = refine_masks(masks, self.polygon_refinement)
        return np.stack(masks), np.array(boxes, np.float32), scores
