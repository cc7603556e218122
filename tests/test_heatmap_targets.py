"""GT verb-heatmap construction vs the importable reference functions.

Oracle: /root/reference/util/image.py gaussian_radius / gaussian2D /
draw_umich_gaussian, and a composition mirroring the hm branch of
/root/reference/datasets/hico.py:376-407.
"""

from __future__ import annotations

import importlib.util
import math
import sys

import numpy as np
import pytest

from rlipv2_tpu.data.heatmap import (
    draw_umich_gaussian, gaussian2d, gaussian_radius, make_verb_heatmap,
)


@pytest.fixture(scope="module")
def ref_image():
    # util/image.py imports cv2; stub it (unused by the gaussian helpers)
    import types

    if "cv2" not in sys.modules:
        sys.modules["cv2"] = types.ModuleType("cv2")
    spec = importlib.util.spec_from_file_location(
        "_ref_util_image", "/root/reference/util/image.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gaussian_radius_matches_reference(ref_image):
    rng = np.random.RandomState(0)
    for _ in range(50):
        h, w = rng.randint(0, 200, 2)
        ours = gaussian_radius((h, w))
        ref = ref_image.gaussian_radius((h, w))
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_gaussian2d_matches_reference(ref_image):
    for d in (1, 3, 7, 15, 31):
        np.testing.assert_array_equal(
            gaussian2d((d, d), sigma=d / 6),
            ref_image.gaussian2D((d, d), sigma=d / 6),
        )


@pytest.mark.parametrize(
    "center,radius",
    [
        ((40, 25), 6),
        ((0, 0), 5),        # crops at top-left
        ((63, 47), 8),      # crops at bottom-right
        ((10, 46), 3),
        ((62, 2), 0),       # zero radius = single pixel
    ],
)
def test_draw_umich_gaussian_matches_reference(ref_image, center, radius):
    ours = np.zeros((48, 64), np.float32)
    ref = np.zeros((48, 64), np.float32)
    # pre-existing content exercises the max-blend
    ours[20:30, 30:40] = 0.4
    ref[20:30, 30:40] = 0.4
    draw_umich_gaussian(ours, center, radius)
    ref_image.draw_umich_gaussian(ref, center, radius)
    np.testing.assert_array_equal(ours, ref)


def test_make_verb_heatmap_matches_reference_composition(ref_image):
    """Composition parity with the reference hm branch
    (datasets/hico.py:376-407): midpoint center, ceil-|delta| radius,
    int cast, single hoi_cate=0 channel."""
    rng = np.random.RandomState(1)
    H, W = 96, 128
    n = 6
    sub = np.zeros((n, 4), np.float32)
    obj = np.zeros((n, 4), np.float32)
    for arr in (sub, obj):
        xy = rng.uniform(0, [W - 10, H - 10], (n, 2))
        wh = rng.uniform(4, 40, (n, 2))
        arr[:, :2] = xy
        arr[:, 2:] = np.minimum(xy + wh, [W, H])

    got = make_verb_heatmap(sub, obj, (H, W))
    assert got.shape == (1, H, W)

    exp = np.zeros((1, H, W), np.float32)
    for i in range(n):
        s_ct = ((sub[i, 0] + sub[i, 2]) / 2, (sub[i, 1] + sub[i, 3]) / 2)
        o_ct = ((obj[i, 0] + obj[i, 2]) / 2, (obj[i, 1] + obj[i, 3]) / 2)
        rel_ct = np.array(
            [(s_ct[0] + o_ct[0]) / 2, (s_ct[1] + o_ct[1]) / 2], np.float32
        )
        radius = ref_image.gaussian_radius(
            (math.ceil(abs(s_ct[0] - o_ct[0])),
             math.ceil(abs(s_ct[1] - o_ct[1])))
        )
        radius = max(0, int(radius))
        ref_image.draw_umich_gaussian(exp[0], rel_ct.astype(np.int32), radius)

    np.testing.assert_array_equal(got, exp)
    assert got.max() > 0.99  # at least one full-strength peak


def test_heatmap_feeds_loss_verb_hm():
    """The builder's output drives losses/criterion.loss_verb_hm at the
    model's map resolution (reference models/hoi.py:4244-4258 interpolates
    GT to the valid feature area; here shapes already agree)."""
    import jax.numpy as jnp

    from rlipv2_tpu.config import LossConfig
    from rlipv2_tpu.losses import SetCriterionHOI

    B, Hf, Wf = 2, 12, 16
    gt = np.stack([
        make_verb_heatmap(
            np.array([[1, 1, 7, 6]], np.float32),
            np.array([[6, 3, 14, 10]], np.float32),
            (Hf, Wf),
        )
        for _ in range(B)
    ])
    assert gt.max() > 0.99
    crit = SetCriterionHOI(LossConfig())
    pred = jnp.asarray(
        np.random.RandomState(0).rand(B, 1, Hf, Wf).astype(np.float32) * 0.5
    )
    mask = jnp.zeros((B, Hf, Wf), bool)
    out = {"verb_hm": (pred, mask)}
    loss = crit.loss_verb_hm(out, jnp.asarray(gt))["loss_verb_hm"]
    assert np.isfinite(float(loss)) and float(loss) > 0
