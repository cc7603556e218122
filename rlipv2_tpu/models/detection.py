"""Plain object detection path (OD pre-training init).

Capability parity with the reference's `--coco` path (reference:
models/detr.py:510-519 vanilla DETR + SetCriterion + PostProcess;
engine.py:204-289 eval loop): a compact DETR detector reusing the vanilla
encoder/decoder layers, the detection Hungarian matcher/criterion, the
detection postprocess, and a pycocotools-gated COCO mAP evaluator
(reference datasets/coco_eval.py). Mainly used to produce detector
initializations that convert_parameters-style converters map into the HOI
key space (engine/convert.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.config import ModelConfig
from rlipv2_tpu.losses.matcher import hungarian_match
from rlipv2_tpu.models.layers import MLP, normalize_pixels
from rlipv2_tpu.models.parse import DecoderLayer, EncoderLayer
from rlipv2_tpu.models.parseda import downsample_mask
from rlipv2_tpu.models.resnet import ResNet
from rlipv2_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou
from rlipv2_tpu.ops.positional import sine_position_embedding

NEG = -1e9


class DETRDetector(nn.Module):
    """Single-level vanilla DETR with a fixed `num_classes` head."""

    cfg: ModelConfig
    num_classes: int = 91

    @nn.compact
    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        B = pixels.shape[0]
        nq = c.num_queries

        feat = ResNet(name_variant=c.backbone.name, num_outputs=1, dtype=dt)(
            normalize_pixels(pixels, dt)
        )[-1]
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(mask, num_pos_feats=t.hidden_dim // 2).astype(dt)
        src = nn.Dense(t.hidden_dim, dtype=dt, name="input_proj")(feat)
        src = src.reshape(B, h * w, t.hidden_dim)
        pos = pos.reshape(B, h * w, t.hidden_dim)
        valid = mask.reshape(B, h * w)

        x = src
        for i in range(t.enc_layers):
            x = EncoderLayer(c, dt, name=f"enc_{i}")(x, pos, valid, deterministic)

        qe = self.param(
            "query_embed", nn.initializers.normal(1.0), (nq, t.hidden_dim), jnp.float32
        )
        query_pos = jnp.broadcast_to(qe.astype(dt)[None], (B, nq, t.hidden_dim))
        tgt = jnp.zeros_like(query_pos)
        hs = []
        for i in range(t.dec_layers):
            tgt = DecoderLayer(c, dt, name=f"dec_{i}")(
                tgt, query_pos, x, pos, valid, deterministic
            )
            hs.append(tgt)

        cls_head = nn.Dense(self.num_classes + 1, dtype=dt, name="class_embed")
        box_head = MLP(t.hidden_dim, 4, 3, dtype=dt, name="bbox_embed")
        logits = jnp.stack([cls_head(hh) for hh in hs]).astype(jnp.float32)
        boxes = jnp.stack(
            [jax.nn.sigmoid(box_head(hh)) for hh in hs]
        ).astype(jnp.float32)
        out = {"pred_logits": logits[-1], "pred_boxes": boxes[-1]}
        if c.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[l], "pred_boxes": boxes[l]}
                for l in range(t.dec_layers - 1)
            ]
        return out


def detection_matching_costs(
    outputs, labels, boxes, valid,
    cost_class=1.0, cost_bbox=5.0, cost_giou=2.0,
):
    """DETR detection matcher costs (reference: models/matcher.py:22-92)."""
    prob = jax.nn.softmax(outputs["pred_logits"].astype(jnp.float32), -1)
    c_cls = -jnp.take_along_axis(
        prob[:, :, None, :], labels[:, None, :, None].astype(jnp.int32), -1
    )[..., 0]
    pb = outputs["pred_boxes"].astype(jnp.float32)
    c_bbox = jnp.abs(pb[:, :, None] - boxes[:, None]).sum(-1)
    c_giou = -generalized_box_iou(box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(boxes))
    C = cost_class * c_cls + cost_bbox * c_bbox + cost_giou * c_giou
    return jnp.where(valid[:, None, :], C, 0.0)


def detection_losses(outputs, labels, boxes, valid, num_classes, eos_coef=0.1):
    """SetCriterion detection losses (reference: models/detr.py:99-246):
    CE with no-object down-weighting, L1 + GIoU on matched pairs,
    cardinality metric. Matching + aux handled here."""

    def single(out):
        C = detection_matching_costs(out, labels, boxes, valid)
        match = hungarian_match(C)  # (B, M)
        B, Q, _ = out["pred_logits"].shape
        target = jnp.full((B, Q), num_classes, jnp.int32)
        scat = jnp.where(valid, match, Q)
        target = target.at[jnp.arange(B)[:, None], scat].set(
            labels.astype(jnp.int32), mode="drop"
        )
        logp = jax.nn.log_softmax(out["pred_logits"].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, target[..., None], -1)[..., 0]
        wgt = jnp.where(target == num_classes, eos_coef, 1.0)
        loss_ce = (nll * wgt).sum() / wgt.sum()

        num = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
        src_b = out["pred_boxes"][jnp.arange(B)[:, None], match].astype(jnp.float32)
        v = valid.astype(jnp.float32)
        l1 = (jnp.abs(src_b - boxes).sum(-1) * v).sum() / num
        g = jnp.diagonal(
            generalized_box_iou(box_cxcywh_to_xyxy(src_b), box_cxcywh_to_xyxy(boxes)),
            axis1=1, axis2=2,
        )
        giou = ((1.0 - g) * v).sum() / num

        card = (
            jnp.abs(
                (jnp.argmax(out["pred_logits"], -1) != num_classes).sum(-1)
                - valid.sum(-1)
            ).astype(jnp.float32).mean()
        )
        return {"loss_ce": loss_ce, "loss_bbox": l1, "loss_giou": giou,
                "cardinality_error": card}

    losses = single({k: v for k, v in outputs.items() if k != "aux_outputs"})
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        for k, v in single(aux).items():
            losses[f"{k}_{i}"] = v
    return losses


def postprocess_detection(outputs, orig_sizes, top_k: int = 100):
    """DETR PostProcess (reference: models/detr.py:258-302): softmax drop
    no-object, per-query best class, boxes scaled xyxy; top-k by score."""
    prob = jax.nn.softmax(outputs["pred_logits"].astype(jnp.float32), -1)[..., :-1]
    scores = prob.max(-1)
    labels = prob.argmax(-1)
    h, w = orig_sizes[:, 0], orig_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], 1).astype(jnp.float32)[:, None]
    boxes = box_cxcywh_to_xyxy(outputs["pred_boxes"].astype(jnp.float32)) * scale
    k = min(top_k, scores.shape[1])
    idx = jnp.argsort(-scores, axis=1)[:, :k]
    take = lambda x: jnp.take_along_axis(x, idx.reshape(*idx.shape, *(1,) * (x.ndim - 2)), 1)
    return {
        "scores": jnp.take_along_axis(scores, idx, 1),
        "labels": jnp.take_along_axis(labels, idx, 1),
        "boxes": jnp.take_along_axis(boxes, idx[..., None], 1),
    }


def coco_evaluate(predictions: list, coco_gt_path) -> Optional[dict]:
    """COCO bbox mAP (reference: datasets/coco_eval.py). predictions:
    [{image_id, category_id, bbox xywh, score}]. Uses pycocotools when
    present, else the self-contained COCOeval reimplementation
    (eval/coco_eval.py)."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        import json

        from rlipv2_tpu.eval.coco_eval import coco_evaluate_bbox

        with open(coco_gt_path) as f:
            gt_json = json.load(f)
        return coco_evaluate_bbox(predictions, gt_json)
    coco = COCO(str(coco_gt_path))
    dets = coco.loadRes(predictions)
    ev = COCOeval(coco, dets, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return {"mAP": float(ev.stats[0]), "mAP50": float(ev.stats[1])}
