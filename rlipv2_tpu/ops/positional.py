"""Positional encodings (pure jnp, NHWC layout).

Capability parity:
  * DETR-style sine embedding over a padded image grid with validity mask
    (reference: models/position_encoding.py:22-60). We keep the exact
    cumsum-over-valid-pixels + normalize semantics so converted PyTorch
    checkpoints see identical positional signals.
  * DAB anchor sine embedding for 2-d / 4-d box coordinates
    (reference: models/dab_deformable/deformable_transformer.py:1777-1806).
  * inverse_sigmoid (reference: util/misc.py:460-464).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """pos (..., D) -> (..., D) where pairs are [sin(p0), cos(p1), sin(p2), ...]

    Matches torch.stack((p[0::2].sin(), p[1::2].cos()), -1).flatten(-2).
    """
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def sine_position_embedding(
    valid_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    offset: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sine position embedding over a padded grid.

    valid_mask: (B, H, W) bool, True where the pixel is real (NOT padding;
      note the reference stores the inverted mask and flips it internally).
    Returns (B, H, W, 2*num_pos_feats) with [y-embed || x-embed] channels.
    """
    if scale is None:
        scale = 2.0 * math.pi
    not_mask = valid_mask.astype(dtype)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=dtype)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def gen_sineembed_for_position(pos: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """Sine embedding of normalized anchor coords.

    pos: (..., 2) or (..., 4) in [0, 1] (cx, cy[, w, h]).
    Returns (..., 2*dim) or (..., 4*dim); channel order [y, x] or [y, x, w, h]
    to match the reference layout.
    """
    scale = 2.0 * math.pi
    dim_t = jnp.arange(dim, dtype=pos.dtype)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / dim)

    def emb(coord):  # (...,) -> (..., dim)
        return _interleave_sin_cos(coord[..., None] * scale / dim_t)

    pos_y = emb(pos[..., 1])
    pos_x = emb(pos[..., 0])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    if pos.shape[-1] == 4:
        pos_w = emb(pos[..., 2])
        pos_h = emb(pos[..., 3])
        return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)
    raise ValueError(f"pos last dim must be 2 or 4, got {pos.shape[-1]}")


def _make_learned_position_module():
    import flax.linen as nn
    import jax

    class LearnedPositionEmbedding(nn.Module):
        """Learned absolute position embedding (reference:
        models/position_encoding.py:61-86 `PositionEmbeddingLearned`):
        50-slot row/col embedding tables initialized uniform, concatenated
        [x_emb || y_emb] per pixel; drop-in for the sine embedding
        (selected in the reference via --position_embedding learned,
        models/position_encoding.py:89-101)."""

        num_pos_feats: int = 128
        max_len: int = 50
        dtype: "jnp.dtype" = jnp.float32

        @nn.compact
        def __call__(self, valid: jnp.ndarray) -> jnp.ndarray:
            """valid: (B, H, W) bool -> (B, H, W, 2 * num_pos_feats)."""
            B, H, W = valid.shape
            init = jax.nn.initializers.uniform(scale=1.0)
            row = self.param(
                "row_embed", init, (self.max_len, self.num_pos_feats),
                jnp.float32,
            )
            col = self.param(
                "col_embed", init, (self.max_len, self.num_pos_feats),
                jnp.float32,
            )
            x_emb = col[:W].astype(self.dtype)  # (W, F)
            y_emb = row[:H].astype(self.dtype)  # (H, F)
            pos = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        x_emb[None, :, :], (H, W, self.num_pos_feats)
                    ),
                    jnp.broadcast_to(
                        y_emb[:, None, :], (H, W, self.num_pos_feats)
                    ),
                ],
                axis=-1,
            )
            return jnp.broadcast_to(
                pos[None], (B, H, W, 2 * self.num_pos_feats)
            )

    return LearnedPositionEmbedding


LearnedPositionEmbedding = _make_learned_position_module()
