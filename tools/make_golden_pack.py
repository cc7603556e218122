"""Generate tests/fixtures/golden_pack.npz (dev-time only; needs torch +
the reference checkout + the parity-test harness).

Flow (see rlipv2_tpu/tools/golden_pack.py for the why):
  1. build the reduced-depth torch reference RLIP_ParSeDA
     (tests/test_parseda_full_parity._build_torch_model);
  2. OVERWRITE every state-dict tensor from the deterministic numpy
     stream `synth_state_dict` (so check time can regenerate the weights
     without torch);
  3. run the torch forward on canned inputs (pre-pooled text branch);
  4. SELF-CHECK: convert + run our flax model live, assert parity at the
     pack tolerance;
  5. write the manifest + inputs + torch outputs.

Usage:  python tools/make_golden_pack.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

from rlipv2_tpu.tools.golden_pack import (  # noqa: E402
    B, H, W, N_OBJ, N_PRED, T, PACK_PATH,
    check_pack, pack_config, synth_state_dict,
)


def main():
    import ref_import
    from test_parseda_full_parity import _build_torch_model

    ref_import.install_stubs()
    misc = __import__("util.misc", fromlist=["NestedTensor"])

    model_t = _build_torch_model()
    sd0 = model_t.state_dict()
    names = list(sd0.keys())
    shapes = [list(v.shape) for v in sd0.values()]
    dtypes = [str(np.dtype(str(v.numpy().dtype))) for v in sd0.values()]
    seed = 0

    synth = synth_state_dict(names, shapes, dtypes, seed=seed)
    model_t.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in synth.items()},
        strict=True,
    )
    model_t.eval()

    rng = np.random.RandomState(0)
    imgs = rng.randn(B, 3, H, W).astype(np.float32)
    text768 = rng.randn(T, B, 768).astype(np.float32)
    sums = torch.tensor([[N_OBJ, N_PRED]] * B)

    samples = misc.NestedTensor(
        torch.tensor(imgs), torch.zeros(B, H, W, dtype=torch.bool)
    )
    with torch.no_grad():
        cache = model_t(
            samples, encode_and_save=True,
            text=(
                torch.zeros(T, B, dtype=torch.bool),
                torch.tensor(text768),
                sums,
            ),
        )
        out_t = model_t(samples, encode_and_save=False, memory_cache=cache)

    keys = ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
            "pred_obj_boxes")
    arrs = {
        "manifest_json": np.asarray(json.dumps({
            "names": names, "shapes": shapes, "dtypes": dtypes, "seed": seed,
        })),
        "pixels": np.transpose(imgs, (0, 2, 3, 1)).astype(np.float32),
        "pixel_valid": np.ones((B, H, W), bool),
        "text_emb": np.transpose(text768, (1, 0, 2)).astype(np.float32),
        "text_valid": np.ones((B, T), bool),
        "n_aux": np.asarray(len(out_t["aux_outputs"])),
    }
    for key in keys:
        arrs[f"ref_{key}"] = out_t[key].numpy().astype(np.float32)
    for l, aux in enumerate(out_t["aux_outputs"]):
        for key in keys:
            arrs[f"ref_aux{l}_{key}"] = aux[key].numpy().astype(np.float32)

    os.makedirs(os.path.dirname(PACK_PATH), exist_ok=True)
    np.savez_compressed(PACK_PATH, **arrs)
    size_kb = os.path.getsize(PACK_PATH) / 1024
    print(f"wrote {PACK_PATH} ({size_kb:.0f} KiB)")

    # self-check through the torch-free path
    report = check_pack(PACK_PATH)
    worst = max(report.values())
    print(f"self-check PASS (worst delta {worst:.2e})")
    _ = pack_config()  # assert the config builds


if __name__ == "__main__":
    main()
