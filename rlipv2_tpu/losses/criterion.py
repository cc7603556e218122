"""SetCriterionHOI — the HOI/RLIP loss suite, static shapes end-to-end.

Capability parity (reference: models/hoi.py:3627-4766 `SetCriterionHOI`):
  * loss_obj_labels: cross-entropy over text-slot classes with the last
    object slot as no-object and `eos_coef` down-weighting (reference
    :3696-3908); subject CE added in `subject_class` mode; temperature /
    focal-CE / label-smoothing variants; obj/sub class-error metrics.
  * loss_obj_cardinality (reference :3909-3923).
  * loss_verb_labels: CornerNet-style focal `_neg_loss` (reference
    :4455-4479), plain BCE, and the QFL-style `_soft_neg_loss` with
    GIoU-scaled soft verb labels (RPL, reference :3932-3977 + :4481-4496);
    pseudo-verb soft labels added on top when provided.
  * loss_sub_obj_boxes: L1 + GIoU; object terms masked by
    `exist_obj_boxes = (obj_boxes != 0).any(-1)` and renormalized
    (reference :4162-4194).
  * auxiliary per-decoder-layer duplication with independent matchings
    (reference :4747-4764).
  * triplet filtering: drop GT triplets whose accumulated matching cost
    across all decoder layers exceeds mean + 0.5*std (reference
    :4657-4726) — implemented as a validity-mask update, no re-padding.
  * num_interactions normalization is all-reduced across data shards via
    `psum` when an axis name is given (reference :4736-4740 uses
    torch.distributed.all_reduce).

TPU-first: matched targets are (B, M)-indexed gathers/scatters instead of
ragged per-image indexing; every mask multiply replaces a boolean index.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rlipv2_tpu.config import LossConfig
from rlipv2_tpu.losses.matcher import MatchCosts, hoi_matching_costs, hungarian_match
from rlipv2_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou
from rlipv2_tpu.structures import HOITargets

NEG = -1e9


def _masked_log_softmax(logits, slot_valid):
    """Softmax over valid class slots only. slot_valid: (B, T) or None."""
    if slot_valid is not None:
        logits = jnp.where(slot_valid[:, None, :], logits, NEG)
    return jax.nn.log_softmax(logits, axis=-1)


def _scatter_classes(match, tgt_labels, tgt_valid, Q, no_obj_idx):
    """Build (B, Q) class targets: no-object everywhere, GT at matched qs."""
    B, M = match.shape
    target = jnp.full((B, Q), no_obj_idx, jnp.int32)
    scatter_idx = jnp.where(tgt_valid, match, Q)  # Q = out-of-range -> drop
    return target.at[jnp.arange(B)[:, None], scatter_idx].set(
        tgt_labels.astype(jnp.int32), mode="drop"
    )


def _gather_queries(x, match):
    """x (B, Q, ...) gathered at match (B, M) -> (B, M, ...)."""
    B, M = match.shape
    return x[jnp.arange(B)[:, None], match]


@dataclasses.dataclass
class SetCriterionHOI:
    cfg: LossConfig
    subject_class: bool = False
    pseudo_verb: bool = False
    temperature: float = 0.07
    # per-verb statistics for the weighted/CB focal verb-loss variants
    # (reference loads hico_verb_samples.npz: models/hoi.py:3674-3694)
    verb_neg_weights: Optional[jnp.ndarray] = None  # (V,) for weighted_bce
    verb_sample_counts: Optional[jnp.ndarray] = None  # (V,) for CB_focal_bce

    def _contrastive_align(self, logits, match, positive_rows, tgt_valid,
                           slot_valid):
        """Cross-modal contrastive alignment (reference: models/hoi.py:
        4497-4619 `_contrastive_align`). positive_rows: (B, M, T) bool —
        the target positive map per GT (one-hot labels for obj/sub,
        multi-hot verb labels with a zero no-verb column for verbs).
        Unmatched queries' positives default to the LAST (no-obj/no-verb)
        slot; returns the reference's SUM-reduced loss."""
        c = self.cfg
        B, Q, T = logits.shape
        logits = logits.astype(jnp.float32) / self.temperature
        if slot_valid is not None:
            logits = jnp.where(slot_valid[:, None, :], logits, NEG)

        # scatter target positive rows to matched query slots
        scatter_idx = jnp.where(tgt_valid, match, Q)
        pos = jnp.zeros((B, Q, T), bool)
        pos = pos.at[:, :, T - 1].set(True)
        pos = pos.at[jnp.arange(B)[:, None], scatter_idx].set(
            positive_rows, mode="drop"
        )

        posf = pos.astype(jnp.float32)
        neg_logits = logits

        # vis-to-text: per query
        pos_term = (-logits * posf).sum(-1)
        neg_term = jax.nn.logsumexp(neg_logits, axis=-1)
        num_pos = posf.sum(-1) + 1e-6
        vis_with_pos = pos.any(-1)
        v2t = jnp.where(vis_with_pos, pos_term / num_pos + neg_term, 0.0).sum()
        if not c.matching_symmetric:
            return v2t
        # text-to-vis: per text slot
        pos_term_t = (-logits * posf).sum(1)
        neg_term_t = jax.nn.logsumexp(neg_logits, axis=1)
        num_pos_t = posf.sum(1) + 1e-6
        text_with_pos = pos.any(1)
        t2v = jnp.where(
            text_with_pos, pos_term_t / num_pos_t + neg_term_t, 0.0
        ).sum()
        return (v2t + t2v) / 2.0

    def _obj_ce(self, logits, match, labels, tgt_valid, slot_valid):
        """Weighted CE with no-object = last slot. Returns (loss, err%)."""
        c = self.cfg
        B, Q, T = logits.shape
        no_obj = T - 1
        if "with_tem" in c.obj_loss_type:
            logits = logits / self.temperature
        target = _scatter_classes(match, labels, tgt_valid, Q, no_obj)
        logp = _masked_log_softmax(logits.astype(jnp.float32), slot_valid)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]  # (B, Q)

        w = jnp.where(target == no_obj, c.eos_coef, 1.0)
        if c.naive_obj_smooth > 0:
            s = c.naive_obj_smooth
            onehot = jax.nn.one_hot(target, T)
            soft = onehot * (1 - s + s / T) + (1 - onehot) * s / T
            if slot_valid is not None:
                soft = soft * slot_valid[:, None, :]
            nll = -(logp * soft).sum(-1)
        if "focal" in c.obj_loss_type:
            pt = jnp.exp(-nll)
            loss = ((1 - pt) ** 2 * nll * w).mean()
        else:
            loss = (nll * w).sum() / w.sum()

        # top-1 error over matched queries
        pred = jnp.argmax(logits, axis=-1)
        pred_at = _gather_queries(pred, match)
        correct = (pred_at == labels) & tgt_valid
        err = 100.0 * (1.0 - correct.sum() / jnp.maximum(tgt_valid.sum(), 1))
        return loss, err

    def _neg_loss(self, pred, gt, slot_valid):
        """CornerNet focal (reference models/hoi.py:4455-4479)."""
        eps = 1e-6
        pred = jnp.clip(pred, eps, 1.0 - eps)
        mask = slot_valid[:, None, :].astype(pred.dtype)
        pos = (gt == 1).astype(pred.dtype) * mask
        neg = (gt < 1).astype(pred.dtype) * mask
        neg_w = (1.0 - gt) ** 4
        pos_loss = jnp.log(pred) * (1 - pred) ** 2 * pos
        neg_loss = jnp.log(1 - pred) * pred**2 * neg_w * neg
        num_pos = pos.sum()
        total = pos_loss.sum() + neg_loss.sum()
        return jnp.where(num_pos > 0, -total / jnp.maximum(num_pos, 1.0), -neg_loss.sum())

    def _soft_neg_loss(self, pred, gt, slot_valid, beta=2.0):
        """QFL-style soft focal (reference models/hoi.py:4481-4496)."""
        eps = 1e-6
        pred = jnp.clip(pred, eps, 1.0 - eps)
        mask = slot_valid[:, None, :].astype(pred.dtype)
        loss = (
            jnp.abs(gt - pred) ** beta
            * ((1 - gt) * jnp.log(1 - pred) + gt * jnp.log(pred))
            * mask
        )
        num_pos = ((gt > 0).astype(pred.dtype) * mask).sum()
        return jnp.where(num_pos > 0, -loss.sum() / jnp.maximum(num_pos, 1.0), -loss.sum())

    def loss_verb_hm(self, outputs, gt_verb_hm):
        """CornerNet focal between the predicted verb heatmap and per-image
        GT heatmaps nearest-resized onto each image's valid region
        (reference models/hoi.py:4244-4258 loss_verb_hm; the dynamic
        per-image `F.interpolate(gt, (valid_1, valid_2))` + crop is
        re-expressed as a static-shape nearest gather over the full grid
        with the pad region masked — TPU-friendly, same values).

        outputs['verb_hm'] = (pred (B, C, h, w) sigmoid probs,
        pad_mask (B, h, w) True = padding); gt_verb_hm (B, C, Hg, Wg)."""
        pred, pad = outputs["verb_hm"]
        pred = pred.astype(jnp.float32)
        gt_verb_hm = gt_verb_hm.astype(jnp.float32)
        B, C, h, w = pred.shape
        Hg, Wg = gt_verb_hm.shape[2], gt_verb_hm.shape[3]
        valid_1 = jnp.sum(~pad[:, :, 0], axis=1)  # (B,)
        valid_2 = jnp.sum(~pad[:, 0, :], axis=1)
        iy = jnp.arange(h)[None, :]
        ix = jnp.arange(w)[None, :]
        gy = jnp.clip(
            (iy * Hg // jnp.maximum(valid_1[:, None], 1)), 0, Hg - 1
        )
        gx = jnp.clip(
            (ix * Wg // jnp.maximum(valid_2[:, None], 1)), 0, Wg - 1
        )
        gt = jax.vmap(lambda g, y, x: g[:, y][:, :, x])(
            gt_verb_hm, gy, gx
        )  # (B, C, h, w)
        region = (
            (iy < valid_1[:, None])[:, None, :, None]
            & (ix < valid_2[:, None])[:, None, None, :]
        ).astype(jnp.float32)

        eps = 1e-6
        p = jnp.clip(pred, eps, 1.0 - eps)
        pos = (gt == 1).astype(jnp.float32) * region
        neg = (gt < 1).astype(jnp.float32) * region
        pos_loss = jnp.log(p) * (1 - p) ** 2 * pos
        neg_loss = jnp.log(1 - p) * p**2 * (1 - gt) ** 4 * neg
        num_pos = pos.sum(axis=(1, 2, 3))  # per image, as the reference
        per_img = jnp.where(
            num_pos > 0,
            -(pos_loss.sum(axis=(1, 2, 3)) + neg_loss.sum(axis=(1, 2, 3)))
            / jnp.maximum(num_pos, 1.0),
            -neg_loss.sum(axis=(1, 2, 3)),
        )
        return {"loss_verb_hm": per_img.sum()}

    def _verb_loss(
        self, verb_logits, match, targets, verb_valid, costs: MatchCosts,
        target_verb_sim=None, curing_score=None,
    ):
        c = self.cfg
        B, Q, V = verb_logits.shape
        labels = targets.verb_labels.astype(jnp.float32)  # (B, M, V)
        if c.giou_verb_label:
            # RPL: scale matched targets by (GIoU + 1) / 2 at the match.
            # Soft labels are targets, not predictions: detached (the
            # reference's matcher runs under @torch.no_grad).
            giou_qm = jax.lax.stop_gradient(-costs.giou)  # positive giou
            g = jnp.take_along_axis(giou_qm, match[:, :, None], axis=1)
            soft = jnp.clip((jnp.diagonal(g, axis1=1, axis2=2) + 1.0) / 2.0, 0.0, 1.0)
            # ^ take giou at (match[b,m], m): gather rows then diagonal
            if self.pseudo_verb and target_verb_sim is not None:
                labels = labels + target_verb_sim
            labels = labels * soft[..., None]
        elif c.naive_verb_smooth > 0:
            s = c.naive_verb_smooth
            labels = labels * (1 - s + s / V) + (1 - labels) * s / V
        labels = labels * targets.valid[..., None]

        # scatter matched rows into (B, Q, V); unmatched queries -> all-zero
        target_full = jnp.zeros((B, Q, V), jnp.float32)
        scatter_idx = jnp.where(targets.valid, match, Q)
        target_full = target_full.at[
            jnp.arange(B)[:, None], scatter_idx
        ].set(labels, mode="drop")

        logits = verb_logits.astype(jnp.float32)
        if c.verb_loss_type == "bce":
            mask = verb_valid[:, None, :].astype(jnp.float32)
            bce = jnp.maximum(logits, 0) - logits * target_full + jnp.log1p(
                jnp.exp(-jnp.abs(logits))
            )
            # mean over valid elements (reference: unmasked elementwise mean)
            return (bce * mask).sum() / jnp.maximum(mask.sum() * Q, 1.0)
        pred = jax.nn.sigmoid(logits)
        if curing_score is not None:
            # verb curing suppresses verb predictions by the pair-quality
            # score inside the focal loss too (reference: models/hoi.py:
            # 4000-4002)
            pred = pred * curing_score.astype(jnp.float32)
        if c.verb_loss_type == "weighted_bce":
            return self._weighted_bce(pred, target_full, verb_valid)
        if c.verb_loss_type == "asymmetric_bce":
            return self._asymmetric_bce(pred, target_full, verb_valid)
        if c.verb_loss_type == "CB_focal_bce":
            return self._cb_focal_bce(pred, target_full, verb_valid)
        if c.giou_verb_label or c.naive_verb_smooth > 0:
            return self._soft_neg_loss(pred, target_full, verb_valid)
        return self._neg_loss(pred, target_full, verb_valid)

    def _weighted_bce(self, pred, gt, slot_valid, eps=1e-6):
        """Per-verb negative down-weighting from dataset statistics
        (reference: models/hoi.py:4353-4375 `_weighted_bce`)."""
        pred = jnp.clip(pred, eps, 1.0 - eps)
        mask = slot_valid[:, None, :].astype(pred.dtype)
        V = pred.shape[-1]
        nw = (
            self.verb_neg_weights
            if self.verb_neg_weights is not None
            else jnp.ones((V,), pred.dtype)
        )
        pos = (gt == 1).astype(pred.dtype) * mask
        neg = (gt < 1).astype(pred.dtype) * mask
        pos_loss = (jnp.log(pred) * pos).sum()
        neg_loss = (jnp.log(1 - pred) * nw[None, None, :] * neg).sum()
        num_pos = pos.sum()
        return jnp.where(
            num_pos > 0, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0),
            -neg_loss,
        )

    def _asymmetric_bce(self, pred, gt, slot_valid, eps=1e-6,
                        gamma_pos=0.0, gamma_neg=3.0, m=0.01, vol=1.0):
        """Asymmetric focal BCE with probability margin on negatives
        (reference: models/hoi.py:4405-4434 `_asymmetric_bce`)."""
        mask = slot_valid[:, None, :].astype(pred.dtype)
        pos = (gt == 1).astype(pred.dtype) * mask
        neg = (gt < 1).astype(pred.dtype) * mask
        neg_w = (1.0 - gt) ** 4
        pred_p = jnp.clip(pred, eps, 1.0)
        pos_loss = (jnp.log(pred_p) * (1 - pred_p) ** gamma_pos * vol * pos).sum()
        pred_m = jnp.clip(pred - m, 0.0, 1.0 - eps)
        neg_loss = (
            jnp.log(1 - pred_m) * pred_m**gamma_neg * neg_w * vol * neg
        ).sum()
        num_pos = pos.sum()
        return jnp.where(
            num_pos > 0, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0),
            -neg_loss,
        )

    def _cb_focal_bce(self, pred, gt, slot_valid, eps=1e-6, gamma=2.0,
                      alpha=0.5, vol=2.0, beta=0.9999):
        """Class-balanced focal BCE weighted by per-verb effective sample
        numbers (reference: models/hoi.py:4377-4403 `_CB_focal_bce`)."""
        mask = slot_valid[:, None, :].astype(pred.dtype)
        V = pred.shape[-1]
        counts = (
            self.verb_sample_counts
            if self.verb_sample_counts is not None
            else jnp.ones((V,), pred.dtype)
        )
        bw = ((1 - beta) / (1 - jnp.power(beta, counts)))[None, None, :]
        pred = jnp.clip(pred, eps, 1.0 - eps)
        pos = (gt == 1).astype(pred.dtype) * mask
        neg = (gt < 1).astype(pred.dtype) * mask
        neg_w = (1.0 - gt) ** 4
        pos_loss = (
            jnp.log(pred) * (1 - pred) ** gamma * alpha * vol * pos * bw
        ).sum()
        neg_loss = (
            jnp.log(1 - pred) * pred**gamma * neg_w * (1 - alpha) * vol * neg * bw
        ).sum()
        num_pos = pos.sum()
        return jnp.where(
            num_pos > 0, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0),
            -neg_loss,
        )

    def _box_losses(self, outputs, match, targets, num_interactions):
        src_sub = _gather_queries(outputs["pred_sub_boxes"].astype(jnp.float32), match)
        src_obj = _gather_queries(outputs["pred_obj_boxes"].astype(jnp.float32), match)
        tv = targets.valid.astype(jnp.float32)
        exist_obj = jnp.any(targets.obj_boxes != 0, axis=-1).astype(jnp.float32) * tv

        l1_sub = jnp.abs(src_sub - targets.sub_boxes).sum(-1) * tv
        l1_obj = jnp.abs(src_obj - targets.obj_boxes).sum(-1) * exist_obj

        g_sub = jnp.diagonal(
            generalized_box_iou(
                box_cxcywh_to_xyxy(src_sub), box_cxcywh_to_xyxy(targets.sub_boxes)
            ),
            axis1=1,
            axis2=2,
        )
        g_obj = jnp.diagonal(
            generalized_box_iou(
                box_cxcywh_to_xyxy(src_obj), box_cxcywh_to_xyxy(targets.obj_boxes)
            ),
            axis1=1,
            axis2=2,
        )
        return {
            "loss_sub_bbox": l1_sub.sum() / num_interactions,
            "loss_obj_bbox": l1_obj.sum() / (exist_obj.sum() + 1e-4),
            "loss_sub_giou": ((1.0 - g_sub) * tv).sum() / num_interactions,
            "loss_obj_giou": ((1.0 - g_obj) * exist_obj).sum() / (exist_obj.sum() + 1e-4),
        }

    def _single(self, outputs, targets, obj_valid, verb_valid,
                num_interactions, target_verb_sim=None, log=True):
        c = self.cfg
        costs = hoi_matching_costs(
            outputs,
            targets,
            verb_valid,
            cost_obj_class=c.set_cost_obj_class,
            cost_verb_class=c.set_cost_verb_class,
            cost_bbox=c.set_cost_bbox,
            cost_giou=c.set_cost_giou,
            subject_class=self.subject_class,
        )
        match = hungarian_match(costs.total)  # (B, M)

        losses = {}
        if c.obj_loss_type == "cross_modal_matching":
            T_obj = outputs["pred_obj_logits"].shape[-1]
            obj_rows = jax.nn.one_hot(
                targets.obj_labels, T_obj, dtype=jnp.bool_
            ) & targets.valid[..., None]
            losses["loss_obj_matching"] = self._contrastive_align(
                outputs["pred_obj_logits"], match, obj_rows, targets.valid,
                obj_valid,
            )
            if self.subject_class:
                sub_rows = jax.nn.one_hot(
                    targets.sub_labels, T_obj, dtype=jnp.bool_
                ) & targets.valid[..., None]
                losses["loss_sub_matching"] = self._contrastive_align(
                    outputs["pred_sub_logits"], match, sub_rows, targets.valid,
                    obj_valid,
                )
        else:
            obj_loss, obj_err = self._obj_ce(
                outputs["pred_obj_logits"], match, targets.obj_labels,
                targets.valid, obj_valid,
            )
            if self.subject_class:
                sub_loss, sub_err = self._obj_ce(
                    outputs["pred_sub_logits"], match, targets.sub_labels,
                    targets.valid, obj_valid,
                )
                obj_loss = obj_loss + sub_loss
                if log:
                    losses["sub_class_error"] = sub_err
            losses["loss_obj_ce"] = obj_loss
            if log:
                losses["obj_class_error"] = obj_err

        # cardinality metric
        logits = outputs["pred_obj_logits"]
        no_obj = logits.shape[-1] - 1
        card_pred = (jnp.argmax(logits, -1) != no_obj).sum(-1).astype(jnp.float32)
        tgt_len = targets.valid.sum(-1).astype(jnp.float32)
        losses["obj_cardinality_error"] = jnp.abs(card_pred - tgt_len).mean()

        if c.verb_loss_type == "cross_modal_matching":
            # verb positive rows: multi-hot labels + zero no-verb column
            # pinned to the LAST slot (reference: models/hoi.py:4529-4539)
            verb_rows = (targets.verb_labels > 0) & targets.valid[..., None]
            verb_rows = verb_rows.at[..., -1].set(False)
            losses["loss_verb_matching"] = self._contrastive_align(
                outputs["pred_verb_logits"], match, verb_rows, targets.valid,
                verb_valid,
            )
        else:
            losses["loss_verb_ce"] = self._verb_loss(
                outputs["pred_verb_logits"], match, targets, verb_valid, costs,
                target_verb_sim, outputs.get("curing_score"),
            )
        losses.update(self._box_losses(outputs, match, targets, num_interactions))

        if "recon_stat" in outputs:
            # masked entity modeling: the same obj/box losses on the
            # cross-reconstructed states, suffixed `_recon`
            # (reference: models/hoi.py:4119-4128)
            recon = outputs["recon_stat"]
            r_obj, _ = self._obj_ce(
                recon["pred_obj_logits"], match, targets.obj_labels,
                targets.valid, obj_valid,
            )
            if self.subject_class and "pred_sub_logits" in recon:
                r_sub, _ = self._obj_ce(
                    recon["pred_sub_logits"], match, targets.sub_labels,
                    targets.valid, obj_valid,
                )
                r_obj = r_obj + r_sub
            losses["loss_obj_ce_recon"] = r_obj
            losses.update(
                {
                    f"{k}_recon": v
                    for k, v in self._box_losses(
                        recon, match, targets, num_interactions
                    ).items()
                }
            )
        return losses, costs, match

    def __call__(
        self,
        outputs: dict,
        targets: HOITargets,
        obj_valid: jnp.ndarray,  # (B, T_obj) valid object text slots
        verb_valid: jnp.ndarray,  # (B, T_verb)
        axis_name: Optional[str] = None,
        target_verb_sim: Optional[jnp.ndarray] = None,
    ) -> dict:
        c = self.cfg

        if c.triplet_filtering:
            targets = self._triplet_filter(outputs, targets, obj_valid, verb_valid)

        num = targets.valid.sum().astype(jnp.float32)
        if axis_name is not None:
            num = jax.lax.pmean(num, axis_name)
        num_interactions = jnp.maximum(num, 1.0)

        losses, _, _ = self._single(
            outputs, targets, obj_valid, verb_valid, num_interactions,
            target_verb_sim, log=True,
        )
        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            aux_losses, _, _ = self._single(
                aux, targets, obj_valid, verb_valid, num_interactions,
                target_verb_sim, log=False,
            )
            losses.update({f"{k}_{i}": v for k, v in aux_losses.items()})
        return losses

    def _triplet_filter(self, outputs, targets, obj_valid, verb_valid):
        """RLIPv2 triplet filtering: accumulate each GT's matched cost over
        the final + aux layers; drop GTs above mean + 0.5*std."""
        c = self.cfg

        def layer_cost(out):
            costs = hoi_matching_costs(
                out, targets, verb_valid, subject_class=self.subject_class
            )
            match = hungarian_match(costs.total)
            C = (
                1.0 * costs.obj_class
                + 1.0 * costs.sub_class
                + 1.0 * costs.verb_class
                + 2.5 * costs.bbox
                + 1.0 * costs.giou
            )  # (B, Q, M)
            picked = jnp.take_along_axis(C, match[:, :, None], axis=1)
            return jnp.diagonal(picked, axis1=1, axis2=2)  # (B, M)

        main = {k: v for k, v in outputs.items() if k != "aux_outputs"}
        total = layer_cost(main)
        for aux in outputs.get("aux_outputs", []):
            total = total + layer_cost(aux)
        total = jax.lax.stop_gradient(total)

        v = targets.valid
        n = jnp.maximum(v.sum(), 1)
        mean = (total * v).sum() / n
        var = (((total - mean) * v) ** 2).sum() / jnp.maximum(n - 1, 1)
        thr = mean + jnp.sqrt(var) * 0.5
        keep = v & (total <= thr)
        return targets._replace(valid=keep)

    def tagger_losses(
        self,
        outputs: dict,
        targets: HOITargets,
        obj_valid: jnp.ndarray,
        verb_valid: jnp.ndarray,
    ) -> dict:
        """Slot-aligned R-Tagger reconstruction losses (reference:
        models/hoi.py:4036-4118 `loss_verb_tagger`): predictions at pair
        slot m reconstruct GT pair m — no matching. Box L1+GIoU, sub/obj CE
        (eos on the last slot), verb BCE or focal. Requires
        subject_class=True outputs."""
        c = self.cfg
        v = targets.valid.astype(jnp.float32)  # (B, M)
        num = jnp.maximum(v.sum(), 1.0)

        src_sub = outputs["pred_sub_boxes"].astype(jnp.float32)
        src_obj = outputs["pred_obj_boxes"].astype(jnp.float32)
        exist_obj = jnp.any(targets.obj_boxes != 0, axis=-1).astype(jnp.float32) * v

        l1_sub = jnp.abs(src_sub - targets.sub_boxes).sum(-1) * v
        l1_obj = jnp.abs(src_obj - targets.obj_boxes).sum(-1) * exist_obj
        g_sub = jnp.diagonal(
            generalized_box_iou(
                box_cxcywh_to_xyxy(src_sub), box_cxcywh_to_xyxy(targets.sub_boxes)
            ),
            axis1=1, axis2=2,
        )
        g_obj = jnp.diagonal(
            generalized_box_iou(
                box_cxcywh_to_xyxy(src_obj), box_cxcywh_to_xyxy(targets.obj_boxes)
            ),
            axis1=1, axis2=2,
        )
        losses = {
            "loss_sub_bbox": l1_sub.sum() / num,
            "loss_obj_bbox": l1_obj.sum() / (exist_obj.sum() + 1e-4),
            "loss_sub_giou": ((1.0 - g_sub) * v).sum() / num,
            "loss_obj_giou": ((1.0 - g_obj) * exist_obj).sum() / (exist_obj.sum() + 1e-4),
        }

        # sub/obj CE at valid slots only (weighted mean like F.cross_entropy)
        def slot_ce(logits, labels):
            B, M, T = logits.shape
            logp = _masked_log_softmax(logits.astype(jnp.float32), obj_valid)
            nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), -1)[..., 0]
            w = jnp.where(labels == T - 1, c.eos_coef, 1.0) * v
            return (nll * w).sum() / jnp.maximum(w.sum(), 1e-4)

        losses["loss_obj_ce"] = slot_ce(
            outputs["pred_obj_logits"], targets.obj_labels
        ) + slot_ce(outputs["pred_sub_logits"], targets.sub_labels)

        verb_logits = outputs["pred_verb_logits"].astype(jnp.float32)
        target_v = targets.verb_labels.astype(jnp.float32) * v[..., None]
        mask = (verb_valid[:, None, :] & targets.valid[..., None]).astype(jnp.float32)
        if c.verb_loss_type == "bce":
            bce = (
                jnp.maximum(verb_logits, 0)
                - verb_logits * target_v
                + jnp.log1p(jnp.exp(-jnp.abs(verb_logits)))
            )
            losses["loss_verb_ce"] = (bce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            pred = jax.nn.sigmoid(verb_logits)
            eps = 1e-6
            pred = jnp.clip(pred, eps, 1 - eps)
            pos = (target_v == 1).astype(jnp.float32) * mask
            neg = (target_v < 1).astype(jnp.float32) * mask
            pos_l = jnp.log(pred) * (1 - pred) ** 2 * pos
            neg_l = jnp.log(1 - pred) * pred**2 * (1 - target_v) ** 4 * neg
            npos = pos.sum()
            total = pos_l.sum() + neg_l.sum()
            losses["loss_verb_ce"] = jnp.where(
                npos > 0, -total / jnp.maximum(npos, 1.0), -neg_l.sum()
            )
        return losses

    def weighted_total(self, losses: dict) -> jnp.ndarray:
        """Weighted sum matching the reference's weight_dict semantics
        (reference: models/detr.py:571-621 + engine.py:106-109), including
        the cross-modal matching / recon coefficients and the optional
        exponential per-layer aux decay (reference: models/detr.py:608-621
        — deeper aux layers get hyper^(dec_layers-1-i) on the six core
        coefficients)."""
        c = self.cfg
        w = {
            "loss_obj_ce": c.obj_loss_coef,
            "loss_verb_ce": c.verb_loss_coef,
            "loss_sub_bbox": c.bbox_loss_coef,
            "loss_obj_bbox": c.bbox_loss_coef,
            "loss_sub_giou": c.giou_loss_coef,
            "loss_obj_giou": c.giou_loss_coef,
            "loss_sub_matching": c.obj_loss_coef,
            "loss_obj_matching": c.obj_loss_coef,
            "loss_verb_matching": c.verb_loss_coef,
            "loss_obj_ce_recon": c.obj_loss_coef * c.masked_loss_coef,
            "loss_sub_bbox_recon": c.bbox_loss_coef * c.masked_loss_coef,
            "loss_obj_bbox_recon": c.bbox_loss_coef * c.masked_loss_coef,
            "loss_sub_giou_recon": c.giou_loss_coef * c.masked_loss_coef,
            "loss_obj_giou_recon": c.giou_loss_coef * c.masked_loss_coef,
        }
        exponential_keys = {
            "loss_sub_bbox", "loss_obj_bbox", "loss_sub_giou",
            "loss_obj_giou", "loss_obj_ce", "loss_verb_ce",
        }
        aux_idx = [
            int(k.split("_")[-1])
            for k in losses
            if k.split("_")[-1].isdigit()
        ]
        dec_layers = (max(aux_idx) + 2) if aux_idx else 1
        total = 0.0
        for k, v in losses.items():
            tail = k.split("_")[-1]
            if tail.isdigit():
                base, i = k.rsplit("_", 1)[0], int(tail)
                if base in w:
                    coef = w[base]
                    if c.exponential_loss and base in exponential_keys:
                        coef = coef * c.exponential_hyper ** (dec_layers - 1 - i)
                    total = total + coef * v
            elif k in w:
                total = total + w[k] * v
        return total
