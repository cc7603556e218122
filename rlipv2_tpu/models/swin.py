"""Swin Transformer backbone — placeholder (implemented in a later pass).

Target parity: reference models/swin/swin_transformer.py (763 LoC) with
T/S/B/L (+384) variants, out_indices [1,2,3], drop-path, remat.
"""

from __future__ import annotations

import flax.linen as nn


class SwinTransformer(nn.Module):
    @classmethod
    def from_name(cls, name, **kw):
        raise NotImplementedError(
            "Swin backbone lands in a later milestone; use resnet50 presets."
        )
