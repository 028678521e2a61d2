"""Model-scoring stage: the YOLO cat detector as an actor-pool map_batches.

Rebuild of /root/reference/yolo_cat_detector.py: the model loads once per
process there (:57-75); here the scorer class loads once per ACTOR in
``__init__`` and scores whole Arrow batches in ``__call__`` — the canonical
stateful Ray Data stage (SURVEY.md ST2).

No GPU or ultralytics in this container, so the default scorer is a
deterministic pseudo-model: detections are derived from a SHA256 of the
image bytes, reproducing the reference's *output schema and keep/drop
semantics* exactly (has_cat, detections[{confidence,bbox}],
detection_count, avg_confidence, total_confidence —
yolo_cat_detector.py:104-119) without any weights. A real YOLO drops in by
passing ``model_factory`` — the plumbing (batching, actor pool sizing,
num_gpus) is identical.

The reference's running average (yolo_cat_detector.py:161,219-220) is a
weighted mean: sum of per-image total_confidence / total detections — NOT
the mean of per-image averages. ``detection_summary`` reproduces that.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


import ray.data

from ..config import ScorerConfig, DEFAULT_SCORER

DETECTION_TYPE = pa.list_(
    pa.struct([("confidence", pa.float64()), ("bbox", pa.list_(pa.float64()))])
)


class PseudoCatScorer:
    """Deterministic stand-in for YOLOv8: per image, derive 0-3 candidate
    detections from the content hash; a detection's confidence is
    hash-uniform in [0,1) and kept if >= confidence_threshold
    (yolo_cat_detector.py:100-110 semantics)."""

    def __init__(self, cfg: ScorerConfig = DEFAULT_SCORER):
        self.cfg = cfg

    def _detect(self, blob: bytes) -> list[dict]:
        h = hashlib.sha256(blob if blob is not None else b"").digest()
        n_candidates = h[0] % 4
        dets = []
        for i in range(n_candidates):
            conf = int.from_bytes(h[1 + 4 * i : 5 + 4 * i], "little") / 2**32
            if conf >= self.cfg.confidence_threshold:
                x1 = h[16 + i] / 255.0 * 100
                y1 = h[20 + i] / 255.0 * 100
                dets.append(
                    {
                        "confidence": conf,
                        "bbox": [x1, y1, x1 + 50.0, y1 + 50.0],
                    }
                )
        return dets

    def __call__(self, batch: pa.Table) -> pa.Table:
        dets = [self._detect(b) for b in batch["bytes"].to_pylist()]
        return append_detection_columns(batch, dets)


def append_detection_columns(
    batch: pa.Table, per_image_dets: list[list[dict]]
) -> pa.Table:
    """The SINGLE output-schema builder every scorer (pseudo or real) goes
    through — so a model swap cannot drift the schema
    (yolo_cat_detector.py:104-119 fields)."""
    all_dets, has_cat, counts, avg_conf, tot_conf = [], [], [], [], []
    for dets in per_image_dets:
        total = sum(d["confidence"] for d in dets)
        all_dets.append(dets)
        has_cat.append(len(dets) > 0)
        counts.append(len(dets))
        avg_conf.append(total / len(dets) if dets else 0.0)
        tot_conf.append(total)
    out = batch
    for name, arr in (
        ("detections", pa.array(all_dets, type=DETECTION_TYPE)),
        ("has_cat", pa.array(has_cat, type=pa.bool_())),
        ("detection_count", pa.array(counts, type=pa.int32())),
        ("avg_confidence", pa.array(avg_conf, type=pa.float64())),
        ("total_confidence", pa.array(tot_conf, type=pa.float64())),
    ):
        out = out.append_column(name, arr)
    return out


class YoloCatScorer:
    """Real ultralytics YOLOv8 adapter (yolo_cat_detector.py:57-75 load,
    :100-119 per-image decision): weights load ONCE per actor in __init__;
    detections keep class == cat_class_id at confidence >=
    confidence_threshold. Emits the identical output schema via
    ``append_detection_columns``. Import-gated — constructing it without
    ultralytics/Pillow raises, and the adapter tests skip in containers
    without the libraries (the seam itself is import-checked regardless)."""

    def __init__(self, cfg: ScorerConfig = DEFAULT_SCORER, weights: str = "yolov8n.pt"):
        import io

        import numpy as np
        from PIL import Image
        from ultralytics import YOLO

        self._io = io
        self._np = np
        self._Image = Image
        self.model = YOLO(weights)
        self.cfg = cfg

    def _detect(self, blob: bytes) -> list[dict]:
        if not blob:
            return []
        try:
            img = self._Image.open(self._io.BytesIO(blob)).convert("RGB")
        except Exception:
            return []
        results = self.model(self._np.asarray(img), verbose=False)
        dets: list[dict] = []
        for r in results:
            for box in r.boxes:
                cls = int(box.cls[0])
                conf = float(box.conf[0])
                if cls == self.cfg.cat_class_id and conf >= self.cfg.confidence_threshold:
                    x1, y1, x2, y2 = (float(v) for v in box.xyxy[0])
                    dets.append({"confidence": conf, "bbox": [x1, y1, x2, y2]})
        return dets

    def __call__(self, batch: pa.Table) -> pa.Table:
        dets = [self._detect(b) for b in batch["bytes"].to_pylist()]
        return append_detection_columns(batch, dets)


def score_images(
    images: "ray.data.Dataset",
    cfg: ScorerConfig = DEFAULT_SCORER,
    *,
    scorer_cls=PseudoCatScorer,
    concurrency: int = 4,
    batch_size: int = 256,
    num_gpus: float = 0,
) -> "ray.data.Dataset":
    """Actor-pool scoring stage. With a real model, size ``batch_size`` by
    VRAM and set num_gpus; the pseudo-model needs neither."""
    kwargs = dict(
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return images.map_batches(scorer_cls, **kwargs)


def split_by_detection(scored: "ray.data.Dataset"):
    """(valid, removed) — the keep/drop routing of
    yolo_cat_detector.py:150-172, quarantine instead of unlink."""
    return scored.filter(expr="has_cat == True"), scored.filter(expr="has_cat == False")


def detection_summary(scored: "ray.data.Dataset") -> dict:
    """A3: global stats with the reference's weighted-mean semantics
    (yolo_cat_detector.py:219-220): avg_confidence = sum(total_confidence)
    / sum(detection_count) over images WITH cats."""
    from ray.data.aggregate import Count, Sum

    agg = scored.aggregate(
        Count(),
        Sum("detection_count", alias_name="total_detections"),
        Sum("total_confidence", alias_name="sum_confidence"),
    )
    with_cats = scored.filter(expr="has_cat == True").count()
    total_det = agg["total_detections"] or 0
    return {
        "total_images": agg["count()"],
        "images_with_cats": with_cats,
        "images_without_cats": agg["count()"] - with_cats,
        "total_detections": int(total_det),
        "avg_confidence": (agg["sum_confidence"] / total_det) if total_det else 0.0,
    }
