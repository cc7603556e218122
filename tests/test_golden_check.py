"""CI drill of the golden-output gate (tools/golden_check.py): a synthetic
RLIP-ParSeDA torch checkpoint is saved as a real .pth, the "reference"
detection dump is produced by the torch model + the reference
PostProcessHOI (reference: models/hoi.py:4769-4873), and the tool's
load -> convert -> forward -> postprocess -> dump -> compare loop must
match it within tolerance. The same command path runs unchanged the
moment real pretrained weights appear (VERDICT r3 next #7)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402
from test_parseda_full_parity import (  # noqa: E402
    DEC,
    ENC,
    N_OBJ,
    N_PRED,
    NQ,
    T,
    _build_torch_model,
)

from rlipv2_tpu.config import (  # noqa: E402
    BackboneConfig,
    ModelConfig,
    TextEncoderConfig,
    TransformerConfig,
)
from rlipv2_tpu.tools.golden_check import (  # noqa: E402
    compare_dumps,
    convert_checkpoint,
    dump_detections,
    load_dump,
    load_torch_state_dict,
    preprocess_images,
    run_detections,
)

MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def test_golden_check_end_to_end(tmp_path, monkeypatch):
    ref_import.install_stubs()
    model_t = _build_torch_model()

    # --- a real .pth on disk, reference checkpoint layout {'model': sd}
    ckpt = tmp_path / "synthetic_rlip_parseda.pth"
    torch.save({"model": model_t.state_dict()}, ckpt)

    # --- synthetic images of different sizes, shared eval transform
    rng = np.random.RandomState(3)
    images = [
        rng.randint(0, 255, (96, 128, 3), np.uint8),
        rng.randint(0, 255, (120, 100, 3), np.uint8),
    ]
    pixels, valid, sizes = preprocess_images(
        images, val_size=64, max_size=96
    )
    text_feats = rng.randn(T, 768).astype(np.float32)

    # --- reference dump: torch forward (eval text branch) + reference
    # PostProcessHOI on the SAME transformed pixels
    misc = __import__("util.misc", fromlist=["NestedTensor"])
    hoi = ref_import.load("models.hoi")
    B = pixels.shape[0]
    px_norm = (pixels.astype(np.float32) / 255.0 - MEAN) / STD
    samples = misc.NestedTensor(
        torch.tensor(px_norm.transpose(0, 3, 1, 2)),
        torch.tensor(~valid),
    )
    text768 = torch.tensor(np.tile(text_feats[:, None], (1, B, 1)))
    sums = torch.tensor([[N_OBJ, N_PRED]] * B)
    with torch.no_grad():
        cache = model_t(
            samples, encode_and_save=True,
            text=(torch.zeros(T, B, dtype=torch.bool), text768, sums),
        )
        out_t = model_t(samples, encode_and_save=False, memory_cache=cache)
        monkeypatch.chdir("/root/reference")  # PostProcessHOI prior np.load
        post_t = hoi.PostProcessHOI(subject_category_id=0)
        results_t = post_t(out_t, torch.tensor(sizes))
    ref_dump = tmp_path / "reference.npz"
    dump_detections(
        [
            {
                "labels": r["labels"].numpy(),
                "boxes": r["boxes"].numpy(),
                "verb_scores": r["verb_scores"].numpy(),
            }
            for r in results_t
        ],
        str(ref_dump),
    )
    monkeypatch.chdir(str(tmp_path))

    # --- the gate: load .pth -> convert -> run -> dump -> compare
    cfg = ModelConfig(
        backbone=BackboneConfig(name="resnet_test", num_outputs=3),
        text_encoder=TextEncoderConfig(num_layers=1),
        transformer=TransformerConfig(
            enc_layers=ENC, dec_layers=DEC, dropout=0.0
        ),
        num_queries=NQ, max_obj_texts=N_OBJ, max_verb_texts=N_PRED,
        dtype="float32",
    )
    sd = load_torch_state_dict(str(ckpt))
    params = convert_checkpoint(sd, cfg)
    results = run_detections(params, cfg, pixels, valid, sizes, text_feats)
    ours_dump = tmp_path / "ours.npz"
    dump_detections(results, str(ours_dump))

    report = compare_dumps(
        load_dump(str(ours_dump)), load_dump(str(ref_dump)),
        box_tol=0.5, score_tol=2e-3,
    )
    assert report["n_images"] == 2
    # sanity: the comparison is not vacuous
    assert results[0]["verb_scores"].shape == (NQ // 2, N_PRED)

    # and the gate actually gates: perturbed scores must fail
    bad = load_dump(str(ours_dump))
    bad[0]["verb_scores"] = bad[0]["verb_scores"] + 0.05
    with pytest.raises(AssertionError):
        compare_dumps(bad, load_dump(str(ref_dump)), score_tol=2e-3)
