"""Stage 6: per-frame bounding boxes for "person. hand. {object}.".

Rebuild of egoscaler/data/train/6_get_bounding_box.py: zero-shot
detection on every frame in [start, end], writing
bboxes/{ds}/{uid}/{file}.json as {timestamp: [{label, score, box}]}.

Detection is behind the `Detector` protocol:
* `HFGroundingDino`: local HF Grounding-DINO weights (the reference's
  detector), batch inference;
* `MotionDetector`: zero-egress fallback boxing the dominant moving
  region via frame differencing — keeps the pipeline runnable and gives
  the registration stage its moving-region exclusion masks.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Protocol, Sequence

import numpy as np

from egoscaler_tpu.pipelines.stages.common import (
    list_stage_files,
    read_json,
    write_json,
)


class Detector(Protocol):
    def detect(
        self, images: Sequence[np.ndarray], text_labels: Sequence[str],
        threshold: float,
    ) -> List[List[Dict]]:
        """Per image: [{'label', 'score', 'box': {xmin,ymin,xmax,ymax}}]."""
        ...


class HFGroundingDino:
    """Local Grounding-DINO (6_get_bounding_box.py:126-140)."""

    def __init__(self, model_path: str, device: str = "cpu"):
        from transformers import (
            AutoModelForZeroShotObjectDetection,
            AutoProcessor,
        )

        self.processor = AutoProcessor.from_pretrained(
            model_path, local_files_only=True
        )
        self.model = AutoModelForZeroShotObjectDetection.from_pretrained(
            model_path, local_files_only=True
        ).to(device)
        self.device = device

    def detect(self, images, text_labels, threshold=0.3):
        import torch

        text = ". ".join(text_labels) + "."
        results = []
        with torch.no_grad():
            inputs = self.processor(
                images=list(images), text=[text] * len(images),
                return_tensors="pt",
            ).to(self.device)
            outputs = self.model(**inputs)
            # transformers renamed box_threshold -> threshold (~4.51);
            # the reference pins the old API (6_get_bounding_box.py:136)
            import inspect

            post_fn = self.processor.post_process_grounded_object_detection
            box_kw = (
                "box_threshold"
                if "box_threshold" in inspect.signature(post_fn).parameters
                else "threshold"
            )
            post = post_fn(
                outputs,
                inputs.input_ids,
                text_threshold=threshold,
                target_sizes=[img.shape[:2] for img in images],
                **{box_kw: threshold},
            )
        for r in post:
            dets = []
            # transformers >= 4.51 deprecates "labels" (becomes integer
            # ids); "text_labels" carries the matched phrases
            labels = r.get("text_labels") or r["labels"]
            for score, label, box in zip(r["scores"], labels, r["boxes"]):
                x1, y1, x2, y2 = [int(v) for v in box.tolist()]
                dets.append(
                    {
                        "label": str(label),
                        "score": float(score),
                        "box": {"xmin": x1, "ymin": y1, "xmax": x2, "ymax": y2},
                    }
                )
            results.append(dets)
        return results


class JaxGroundingDino:
    """JAX-native Grounding-DINO (models/grounding_dino.py) behind the
    Detector protocol — the TPU path for the reference's stage-6 detector
    (6_get_bounding_box.py:126-140).

    Tokenization is injected: pass `tokenize_fn(text) -> (input_ids,
    token_type_ids)` (e.g. an HF BertTokenizer's encode) so the model
    stays importable without tokenizer assets.  Images are resized to a
    fixed square (static shapes -> one compiled XLA program per size).
    """

    IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, cfg, variables, tokenize_fn, image_size: int = 800,
                 text_len: int = 64):
        import functools

        import jax
        import jax.numpy as jnp

        from egoscaler_tpu.models.grounding_dino import GroundingDinoForDetection

        self.cfg = cfg
        self.variables = variables
        self.tokenize = tokenize_fn
        self.image_size = image_size
        self.text_len = min(text_len, cfg.max_text_len)
        model = GroundingDinoForDetection(cfg)

        @functools.partial(jax.jit)
        def forward(variables, pixels, ids, tt, mask, self_masks, pos):
            out = model.apply(variables, pixels, ids, tt, mask, self_masks, pos)
            return out["logits"], out["pred_boxes"]

        self._forward = forward
        self._jnp = jnp

    def detect(self, images, text_labels, threshold=0.3):
        import jax
        import jax.numpy as jnp

        from egoscaler_tpu.models.grounding_dino import (
            post_process_detection,
            special_token_masks,
        )

        text = ". ".join(text_labels) + "."
        ids, token_types = self.tokenize(text)
        ids = np.asarray(ids, np.int32)[: self.text_len]
        token_types = np.asarray(token_types, np.int32)[: self.text_len]
        pad = self.text_len - len(ids)
        mask = np.concatenate([np.ones(len(ids), bool), np.zeros(pad, bool)])
        ids = np.pad(ids, (0, pad))
        token_types = np.pad(token_types, (0, pad))

        n = len(images)
        batch_ids = np.tile(ids, (n, 1))
        self_masks, pos = special_token_masks(batch_ids)

        s = self.image_size
        pixels = np.zeros((n, s, s, 3), np.float32)
        sizes = []
        for i, img in enumerate(images):
            sizes.append(img.shape[:2])
            arr = jnp.asarray(img.astype(np.float32) / 255.0)
            arr = jax.image.resize(arr, (s, s, 3), "bilinear")
            pixels[i] = (np.asarray(arr) - self.IMAGENET_MEAN) / self.IMAGENET_STD

        logits, boxes = self._forward(
            self.variables,
            jnp.asarray(pixels),
            jnp.asarray(batch_ids),
            jnp.asarray(np.tile(token_types, (n, 1))),
            jnp.asarray(np.tile(mask, (n, 1))),
            jnp.asarray(self_masks),
            jnp.asarray(pos.astype(np.int32)),
        )
        logits, boxes = np.asarray(logits), np.asarray(boxes)

        results = []
        for i in range(n):
            post = post_process_detection(
                logits[i : i + 1], boxes[i : i + 1], sizes[i], threshold
            )[0]
            dets = []
            for score, box in zip(post["scores"], post["boxes"]):
                x1, y1, x2, y2 = [int(v) for v in box]
                dets.append(
                    {
                        "label": "object",
                        "score": float(score),
                        "box": {"xmin": x1, "ymin": y1, "xmax": x2, "ymax": y2},
                    }
                )
            results.append(dets)
        return results


class MotionDetector:
    """Frame-difference moving-region boxes (weight-free fallback)."""

    def __init__(self, diff_quantile: float = 0.95, min_size: int = 8):
        self.q = diff_quantile
        self.min_size = min_size

    def detect(self, images, text_labels, threshold=0.3):
        results = []
        prev = None
        for img in images:
            gray = img.astype(np.float32).mean(-1)
            if prev is None:
                results.append([])
                prev = gray
                continue
            diff = np.abs(gray - prev)
            prev = gray
            # 0.9x keeps pixels sitting exactly at the quantile value
            # (constant-intensity movers) above the threshold
            t = np.quantile(diff, self.q) * 0.9
            mask = diff > max(t, 5.0)
            ys, xs = np.nonzero(mask)
            if len(xs) < self.min_size:
                results.append([])
                continue
            box = {
                "xmin": int(np.percentile(xs, 2)),
                "ymin": int(np.percentile(ys, 2)),
                "xmax": int(np.percentile(xs, 98)),
                "ymax": int(np.percentile(ys, 98)),
            }
            results.append(
                [{"label": text_labels[-1], "score": 0.5, "box": box}]
            )
        # first frame inherits the second frame's detections
        if len(results) > 1 and not results[0]:
            results[0] = results[1]
        return results


def run(args, detector: Optional[Detector] = None) -> None:
    from PIL import Image

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration

    detector = detector or MotionDetector()
    infos = [read_json(f) for f in list_stage_files(args.data_dir, "infos")]
    for data in infos:
        if "start_sec" not in data:
            continue
        out_path = os.path.join(
            args.data_dir, "bboxes", data["dataset_name"], data["video_uid"],
            data["file_name"] + ".json",
        )
        if os.path.exists(out_path):
            continue
        duration = [round(float(t), 3) for t in clip_duration(data["timestamp"])]
        window = [
            t for t in duration if data["start_sec"] <= t <= data["end_sec"]
        ]
        images_dir = os.path.join(
            args.data_dir, "images", data["dataset_name"], data["video_uid"],
            data["file_name"],
        )
        frames, times = [], []
        for t in window:
            f = os.path.join(images_dir, f"{t}.jpg")
            if os.path.exists(f):
                frames.append(np.asarray(Image.open(f)))
                times.append(t)
        if not frames:
            continue
        labels = ["person", "hand", data["manipulated_object"]]
        dets = detector.detect(frames, labels, threshold=args.threshold)
        write_json(out_path, {str(t): d for t, d in zip(times, dets)})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--threshold", type=float, default=0.3)
    p.add_argument("--detector", default="motion",
                   choices=["motion", "grounding-dino"])
    p.add_argument("--model_path", default=None)
    args = p.parse_args()
    det = (
        HFGroundingDino(args.model_path)
        if args.detector == "grounding-dino"
        else MotionDetector()
    )
    run(args, det)


if __name__ == "__main__":
    main()
