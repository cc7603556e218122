"""DETR-style segmentation heads (panoptic/instance masks).

Capability parity with reference models/segmentation.py:
  * MHAttentionMap (:150-180) — per-head 2-D attention softmax between
    decoder queries and the /32 feature map (no value multiply);
  * MaskHeadSmallConv (:79-148) — FPN-style conv head upsampling
    /32 -> /16 -> /8 -> /4 with GroupNorm(8) and nearest-neighbor
    upsampling;
  * DETRsegm (:34-74) — detection model + mask branch;
  * dice_loss (:182-198) / sigmoid_focal_loss (:200-226);
  * PostProcessSegm (:228-249) and PostProcessPanoptic (:251-373) —
    host-side numpy stitching (per-pixel argmax over kept queries, stuff
    merging, small-segment filtering). We return the id map + segment
    info instead of COCO's PNG payload (zero-egress sandbox: no PIL
    round-trip; the byte encoding is IO formatting, not model behavior).

TPU-first notes: everything is NHWC; nearest upsampling is
`jax.image.resize(method="nearest")` which XLA lowers to a cheap
broadcast-reshape; the per-query mask batch is folded into the leading
axis ONCE ((B*nq, h, w, C)) so all convs run as big static-batch convs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MHAttentionMap(nn.Module):
    """2-D attention softmax between queries and the feature map."""

    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, feat, valid_mask=None):
        # q: (B, nq, C); feat: (B, h, w, C); valid_mask: (B, h, w) True=real
        nh = self.num_heads
        hd = self.hidden_dim // nh
        qh = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_linear")(q)
        kh = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_linear")(feat)
        B, nq = q.shape[0], q.shape[1]
        h, w = feat.shape[1], feat.shape[2]
        qh = qh.reshape(B, nq, nh, hd) * (float(hd) ** -0.5)
        kh = kh.reshape(B, h, w, nh, hd)
        weights = jnp.einsum(
            "bqnc,bhwnc->bqnhw", qh, kh, preferred_element_type=jnp.float32
        )
        if valid_mask is not None:
            neg = jnp.asarray(-1e9, weights.dtype)
            weights = jnp.where(
                valid_mask[:, None, None, :, :], weights, neg
            )
        flat = weights.reshape(B, nq, nh, h * w)
        flat = jax.nn.softmax(flat, axis=-1)
        return flat.reshape(B, nq, nh, h, w).astype(self.dtype)


class MaskHeadSmallConv(nn.Module):
    """FPN conv head: (B*nq, h/32, w/32, dim+nheads) -> (B*nq, h/4, w/4, 1)."""

    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fpns: Sequence[jnp.ndarray]):
        # fpns: [(B*nq, h16, w16, C16), (B*nq, h8, w8, C8), (B*nq, h4, w4, C4)]
        cd = self.context_dim
        inter = [cd // 2, cd // 4, cd // 8, cd // 16]

        def conv_gn(y, feats, name):
            y = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"lay{name}")(y)
            # GroupNorm(8) at canonical widths (reference); clamp for tiny
            # test configs whose later stages drop below 8 channels
            y = nn.GroupNorm(num_groups=min(8, feats), epsilon=1e-5, dtype=self.dtype,
                             name=f"gn{name}")(y)
            return nn.relu(y)

        def up_to(y, ref):
            return jax.image.resize(
                y, (y.shape[0], ref.shape[1], ref.shape[2], y.shape[3]),
                method="nearest",
            )

        # lay1 keeps the input width (reference: Conv2d(dim, dim)), rounded
        # up to a multiple of 8 so GroupNorm(8) divides it for any config
        x = conv_gn(x, -(-x.shape[-1] // 8) * 8, "1")
        x = conv_gn(x, inter[0], "2")
        for i, (fpn, feats) in enumerate(zip(fpns, inter[1:])):
            adapted = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                              name=f"adapter{i + 1}")(fpn)
            x = adapted + up_to(x, adapted)
            x = conv_gn(x, feats, str(i + 3))
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="out_lay")(x)


class DETRSegm(nn.Module):
    """Detection DETR + mask branch (reference DETRsegm). Self-contained:
    runs its own backbone (4 levels: /4 /8 /16 /32), vanilla encoder/
    decoder, class/box heads, then the mask attention + FPN head."""

    cfg: "ModelConfig"  # noqa: F821 - imported lazily to avoid cycles
    num_classes: int = 91

    @nn.compact
    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        from rlipv2_tpu.models.layers import MLP, normalize_pixels
        from rlipv2_tpu.models.parse import DecoderLayer, EncoderLayer
        from rlipv2_tpu.models.parseda import downsample_mask
        from rlipv2_tpu.models.resnet import ResNet
        from rlipv2_tpu.ops.positional import sine_position_embedding

        c = self.cfg
        t = c.transformer
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        B = pixels.shape[0]
        nq = c.num_queries

        feats = ResNet(
            name_variant=c.backbone.name, num_outputs=4, dtype=dt
        )(normalize_pixels(pixels, dt))  # [/4, /8, /16, /32]
        feat = feats[-1]
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(
            mask, num_pos_feats=t.hidden_dim // 2
        ).astype(dt)
        proj = nn.Conv(t.hidden_dim, (1, 1), dtype=dt, name="input_proj")(feat)
        src = proj.reshape(B, h * w, t.hidden_dim)
        posf = pos.reshape(B, h * w, t.hidden_dim)
        valid = mask.reshape(B, h * w)

        x = src
        for i in range(t.enc_layers):
            x = EncoderLayer(c, dt, name=f"enc_{i}")(
                x, posf, valid, deterministic
            )
        memory = x

        qe = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (nq, t.hidden_dim), jnp.float32,
        )
        query_pos = jnp.broadcast_to(qe.astype(dt)[None], (B, nq, t.hidden_dim))
        tgt = jnp.zeros_like(query_pos)
        hs = []
        for i in range(t.dec_layers):
            tgt = DecoderLayer(c, dt, name=f"dec_{i}")(
                tgt, query_pos, memory, posf, valid, deterministic
            )
            hs.append(tgt)

        cls_head = nn.Dense(self.num_classes + 1, dtype=dt, name="class_embed")
        box_head = MLP(t.hidden_dim, 4, 3, dtype=dt, name="bbox_embed")
        logits = jnp.stack([cls_head(hh) for hh in hs]).astype(jnp.float32)
        boxes = jnp.stack(
            [jax.nn.sigmoid(box_head(hh)) for hh in hs]
        ).astype(jnp.float32)

        # mask branch on the FINAL decoder states
        nheads = t.nheads
        attn = MHAttentionMap(t.hidden_dim, nheads, dtype=dt, name="bbox_attention")(
            hs[-1], memory.reshape(B, h, w, t.hidden_dim), mask
        )  # (B, nq, nheads, h, w)
        # fold queries into the batch axis once
        ctx = jnp.broadcast_to(
            proj[:, None], (B, nq, h, w, t.hidden_dim)
        ).reshape(B * nq, h, w, t.hidden_dim)
        amap = jnp.transpose(attn, (0, 1, 3, 4, 2)).reshape(
            B * nq, h, w, nheads
        )
        seg_x = jnp.concatenate([ctx, amap.astype(dt)], axis=-1)
        fpns = [
            jnp.broadcast_to(
                f[:, None], (B, nq) + f.shape[1:]
            ).reshape((B * nq,) + f.shape[1:])
            for f in (feats[2], feats[1], feats[0])
        ]
        masks = MaskHeadSmallConv(t.hidden_dim, dtype=dt, name="mask_head")(
            seg_x, fpns
        )  # (B*nq, h/4*8, w/4*8... final /4, 1)
        mh, mw = masks.shape[1], masks.shape[2]
        masks = masks.reshape(B, nq, mh, mw).astype(jnp.float32)

        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
            "pred_masks": masks,
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[l], "pred_boxes": boxes[l]}
                for l in range(t.dec_layers - 1)
            ]
        return out


def dice_loss(inputs, targets, num_boxes):
    """Mask DICE/F-1 loss (reference segmentation.py:182-198);
    inputs are logits, targets binary masks, both (N, H*W)."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.sum(probs * targets, axis=1)
    denominator = jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return jnp.sum(loss) / num_boxes


def sigmoid_focal_loss(inputs, targets, num_boxes, alpha=0.25, gamma=2.0):
    """Per-pixel focal loss on mask logits (reference :200-226)."""
    probs = jax.nn.sigmoid(inputs)
    ce = optax_sigmoid_ce(inputs, targets)
    p_t = probs * targets + (1 - probs) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return jnp.sum(jnp.mean(loss, axis=1)) / num_boxes


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable binary CE with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def postprocess_segm(outputs, orig_sizes, max_hw, threshold=0.5):
    """PostProcessSegm (reference :228-249): upsample predicted masks to
    the padded batch resolution, crop to each image's unpadded extent and
    resize to original size, then threshold. Host-side numpy.

    outputs: dict with pred_masks (B, nq, mh, mw) logits
    orig_sizes: (B, 2) original (h, w); max_hw: (H, W) padded size.
    Returns list of (nq, h_orig, w_orig) bool arrays.
    """
    masks = np.asarray(outputs["pred_masks"], np.float32)
    B, nq = masks.shape[:2]
    H, W = max_hw
    results = []
    for b in range(B):
        m = masks[b]  # (nq, mh, mw)
        zoom_h = H / m.shape[1]
        zoom_w = W / m.shape[2]
        idx_h = (np.arange(H) / zoom_h).astype(np.int64).clip(0, m.shape[1] - 1)
        idx_w = (np.arange(W) / zoom_w).astype(np.int64).clip(0, m.shape[2] - 1)
        up = m[:, idx_h][:, :, idx_w]  # nearest upsample to padded size
        oh, ow = int(orig_sizes[b][0]), int(orig_sizes[b][1])
        ih = (np.linspace(0, up.shape[1] - 1, oh)).astype(np.int64)
        iw = (np.linspace(0, up.shape[2] - 1, ow)).astype(np.int64)
        resized = up[:, ih][:, :, iw]
        results.append(1 / (1 + np.exp(-resized)) > threshold)
    return results


def postprocess_panoptic(
    outputs,
    orig_sizes,
    is_thing_map: Optional[dict] = None,
    threshold: float = 0.85,
    min_area: int = 4,
):
    """PostProcessPanoptic (reference :251-373), host-side numpy: keep
    confident non-no-object queries, per-pixel argmax over their mask
    logits, merge segments of the same stuff class, drop tiny segments.
    Returns per image a dict {seg_ids: (h, w) int array, segments_info}.
    (COCO's PNG byte payload is IO formatting; the id map is returned
    directly.)"""
    logits = np.asarray(outputs["pred_logits"], np.float32)
    masks = np.asarray(outputs["pred_masks"], np.float32)
    B, nq, num_cls1 = logits.shape
    exp = np.exp(logits - logits.max(-1, keepdims=True))
    probs = exp / exp.sum(-1, keepdims=True)
    scores = probs[..., :-1].max(-1)
    labels = probs[..., :-1].argmax(-1)
    results = []
    for b in range(B):
        keep = scores[b] > threshold
        if not keep.any():
            oh, ow = int(orig_sizes[b][0]), int(orig_sizes[b][1])
            results.append({"seg_ids": np.zeros((oh, ow), np.int32),
                            "segments_info": []})
            continue
        m = masks[b][keep]  # (k, mh, mw)
        klabels = labels[b][keep]
        oh, ow = int(orig_sizes[b][0]), int(orig_sizes[b][1])
        ih = (np.linspace(0, m.shape[1] - 1, oh)).astype(np.int64)
        iw = (np.linspace(0, m.shape[2] - 1, ow)).astype(np.int64)
        m = m[:, ih][:, :, iw]
        assign = m.argmax(0)  # (oh, ow) winner query per pixel
        # merge same-class stuff segments
        if is_thing_map is not None:
            canon = {}
            remap = np.arange(len(klabels))
            for i, lab in enumerate(klabels):
                if not is_thing_map.get(int(lab), True):
                    if int(lab) in canon:
                        remap[i] = canon[int(lab)]
                    else:
                        canon[int(lab)] = i
            assign = remap[assign]
        seg_ids = np.zeros((oh, ow), np.int32)
        segments_info = []
        sid = 0
        for i in range(len(klabels)):
            px = assign == i
            area = int(px.sum())
            if area <= min_area:
                continue
            sid += 1
            seg_ids[px] = sid
            segments_info.append({
                "id": sid,
                "category_id": int(klabels[i]),
                "isthing": bool(
                    is_thing_map.get(int(klabels[i]), True)
                ) if is_thing_map else True,
                "area": area,
            })
        results.append({"seg_ids": seg_ids, "segments_info": segments_info})
    return results
