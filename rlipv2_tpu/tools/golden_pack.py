"""Torch-oracle golden pack: regression-lock full-model output fidelity
WITHOUT needing torch or the reference checkout at check time.

The live parity suite (tests/test_parseda_full_parity.py) imports the
torch reference for every run. This pack freezes one parity scenario into
a committed fixture (tests/fixtures/golden_pack.npz) that is independent
of both:

  * the fixture does NOT store weights (the parity config is ~96M params
    / ~386 MB — uncommittable). Instead it stores the torch model's
    state-dict MANIFEST (ordered names + shapes + dtypes) and the weights
    are REGENERATED from a deterministic numpy stream (`synth_state_dict`)
    — the same function the generator used to fill the torch model before
    capturing its outputs;
  * it stores the canned inputs and the torch reference outputs
    (pred_obj_logits / pred_verb_logits / pred_sub_boxes / pred_obj_boxes
    + aux layers), captured once by tools/make_golden_pack.py (which DOES
    need torch + the reference, and asserts live parity before writing).

Checking (`check_pack`, wired into tests/test_golden_pack.py and
`python -m rlipv2_tpu.tools.golden_check pack`) needs only numpy + our
converter + our model: regenerate the state dict, convert
(engine.convert.convert_rlip_parseda operates on plain numpy mappings),
run, compare. Any regression in converter or model numerics breaks it.

Reference contract being locked: models/hoi.py:1871-2257 RLIP_ParSeDA +
models/dab_deformable/deformable_transformer.py:234-744 (VERDICT r4
next #7).
"""

from __future__ import annotations

import json
import os

import numpy as np

PACK_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "golden_pack.npz",
)

# dims of the frozen scenario — must match tools/make_golden_pack.py
B, H, W = 2, 128, 128
NQ, ENC, DEC = 8, 4, 2
N_OBJ, N_PRED = 4, 4
T = N_OBJ + N_PRED


def synth_state_dict(names, shapes, dtypes, seed: int = 0) -> dict:
    """Deterministically regenerate a torch-layout state dict from its
    manifest: ONE numpy RandomState stream, values drawn per tensor in
    manifest order.

    Rules (keyed on tensor rank/name, matching what a healthy init looks
    like so the frozen outputs are non-degenerate):
      * `running_var`      -> U[0.75, 1.25)           (positive variance)
      * `running_mean`     -> 0.1 * randn
      * other 1-D `weight` -> 1 + 0.1 * randn         (LayerNorm/FrozenBN scale)
      * everything float   -> 0.02 * randn            (matmuls, biases, embeds)
      * integer tensors    -> zeros                    (num_batches_tracked)
    """
    rng = np.random.RandomState(seed)
    out = {}
    for name, shape, dt in zip(names, shapes, dtypes):
        shape = tuple(int(s) for s in shape)
        dt = np.dtype(dt)
        if not np.issubdtype(dt, np.floating):
            out[name] = np.zeros(shape, dt)
            continue
        if name.endswith("running_var"):
            v = rng.rand(*shape) * 0.5 + 0.75
        elif name.endswith("running_mean"):
            v = rng.randn(*shape) * 0.1
        elif len(shape) == 1 and name.endswith("weight"):
            v = 1.0 + rng.randn(*shape) * 0.1
        else:
            v = rng.randn(*shape) * 0.02
        out[name] = v.astype(dt)
    return out


def pack_config():
    from rlipv2_tpu.config import (
        BackboneConfig,
        ModelConfig,
        TextEncoderConfig,
        TransformerConfig,
    )

    return ModelConfig(
        backbone=BackboneConfig(name="resnet_test", num_outputs=3),
        text_encoder=TextEncoderConfig(num_layers=1),
        transformer=TransformerConfig(
            enc_layers=ENC, dec_layers=DEC, dropout=0.0
        ),
        num_queries=NQ, max_obj_texts=N_OBJ, max_verb_texts=N_PRED,
        dtype="float32",
    )


def load_pack(path: str = PACK_PATH):
    z = np.load(path, allow_pickle=False)
    manifest = json.loads(str(z["manifest_json"]))
    return z, manifest


def check_pack(path: str = PACK_PATH, atol: float = 2e-3) -> dict:
    """Regenerate weights -> convert -> run our model -> compare against
    the frozen torch outputs. Returns {key: max_abs_delta} on success,
    raises AssertionError otherwise. No torch, no reference checkout."""
    import jax.numpy as jnp

    from rlipv2_tpu.engine.convert import convert_rlip_parseda
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    z, manifest = load_pack(path)
    sd = synth_state_dict(
        manifest["names"], manifest["shapes"], manifest["dtypes"],
        seed=int(manifest["seed"]),
    )
    cfg = pack_config()
    params = convert_rlip_parseda(sd, cfg)

    out = RLIPParSeDA(cfg).apply(
        {"params": params},
        jnp.asarray(z["pixels"]),
        jnp.asarray(z["pixel_valid"]),
        jnp.asarray(z["text_emb"]),
        jnp.asarray(z["text_valid"]),
        N_OBJ,
    )

    keys = ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
            "pred_obj_boxes")
    report = {}
    for key in keys:
        got = np.asarray(out[key], np.float32)
        want = z[f"ref_{key}"]
        d = float(np.abs(got - want).max())
        report[key] = d
        assert d <= atol, f"{key}: max delta {d} > {atol}"
    n_aux = int(z["n_aux"])
    assert len(out["aux_outputs"]) == n_aux, (
        f"aux layers {len(out['aux_outputs'])} != frozen {n_aux}"
    )
    for l in range(n_aux):
        for key in keys:
            got = np.asarray(out["aux_outputs"][l][key], np.float32)
            want = z[f"ref_aux{l}_{key}"]
            d = float(np.abs(got - want).max())
            report[f"aux{l}.{key}"] = max(report.get(f"aux{l}.{key}", 0.0), d)
            assert d <= atol, f"aux[{l}].{key}: max delta {d} > {atol}"
    return report
