"""Golden-output gate: real-checkpoint detection parity in one command.

The north-star fidelity check (BASELINE.md: 23.29 NF / 45.09 fine-tuned
within 0.2 mAP on converted weights) is blocked on assets — no pretrained
`.pth` or dataset exists in this environment. This tool is everything
BETWEEN "weights appear" and "mAP parity measured": it loads an RLIP-ParSeDA
torch checkpoint, converts it (`engine.convert.convert_rlip_parseda`), runs
images through the eval transform + forward + the reference PostProcessHOI
contract (reference: models/hoi.py:4769-4873 — softmax objects minus the
no-object column, sigmoid verbs, cxcywh->xyxy x orig size,
`verb_scores *= obj_score`), dumps per-image detections to an .npz, and
compares two dumps within tolerance.

Usage:
  # produce our detections from a checkpoint
  python -m rlipv2_tpu.tools.golden_check run \
      --checkpoint rlip_parseda_r50.pth --backbone resnet50 \
      --images img1.jpg img2.jpg --text_feats hico_vocab_feats.npz \
      --out ours.npz

  # compare against a reference-produced dump (same npz schema)
  python -m rlipv2_tpu.tools.golden_check compare \
      --ours ours.npz --ref reference.npz --box_tol 0.5 --score_tol 1e-3

Dump schema (one .npz): n_images, and per image i the PostProcessHOI
per-image result arrays `img{i}_labels` (2nq,), `img{i}_boxes` (2nq, 4)
xyxy original pixels, `img{i}_verb_scores` (nq, V). CI exercises the full
loop on a synthetic checkpoint + a torch-reference-produced dump
(tests/test_golden_check.py), so this gate is ready the moment real
weights appear.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """torch.load a checkpoint; unwraps the reference's {'model': sd}
    layout (reference: main.py:599-629) and strips DDP 'module.'."""
    import torch

    from rlipv2_tpu.engine.convert import numpyify

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return numpyify(sd)


def default_config(backbone: str = "resnet50", text_layers: int = 12,
                   num_queries: int = 200, n_obj: int = 81,
                   n_verb: int = 117):
    from rlipv2_tpu.config import (
        BackboneConfig,
        ModelConfig,
        TextEncoderConfig,
        TransformerConfig,
    )

    return ModelConfig(
        backbone=BackboneConfig(name=backbone, num_outputs=3),
        text_encoder=TextEncoderConfig(num_layers=text_layers),
        transformer=TransformerConfig(),
        num_queries=num_queries,
        max_obj_texts=n_obj,
        max_verb_texts=n_verb,
        dtype="float32",
    )


def convert_checkpoint(sd: dict, cfg):
    from rlipv2_tpu.engine.convert import convert_rlip_parseda

    return {"params": convert_rlip_parseda(sd, cfg)}


def preprocess_images(
    images: Sequence[np.ndarray],
    val_size: int = 800,
    max_size: int = 1333,
    bucket: Optional[tuple[int, int]] = None,
):
    """Reference val transform (shorter side -> val_size, cap max_size;
    reference datasets/hico.py:497-500) + pad to one fixed bucket.
    Returns (pixels uint8 (B,H,W,3), valid (B,H,W), orig_sizes (B,2) hw)."""
    from rlipv2_tpu.data.transforms import HOITransform

    tfm = HOITransform(train=False, max_size=max_size, val_size=val_size,
                       normalize=False)
    outs, sizes = [], []
    for im in images:
        arr = np.asarray(im)
        sizes.append((arr.shape[0], arr.shape[1]))
        t = {"boxes": np.zeros((0, 4), np.float32),
             "labels": np.zeros((0,), np.int64)}
        out, _ = tfm(arr, t)
        outs.append(np.asarray(out))
    if bucket is None:
        H = max(o.shape[0] for o in outs)
        W = max(o.shape[1] for o in outs)
        H, W = -(-H // 32) * 32, -(-W // 32) * 32
    else:
        H, W = bucket
    B = len(outs)
    pixels = np.zeros((B, H, W, 3), outs[0].dtype)
    valid = np.zeros((B, H, W), bool)
    for b, o in enumerate(outs):
        h, w = o.shape[:2]
        pixels[b, :h, :w] = o
        valid[b, :h, :w] = True
    return pixels, valid, np.asarray(sizes, np.float32)


def run_detections(
    params,
    cfg,
    pixels: np.ndarray,
    valid: np.ndarray,
    orig_sizes: np.ndarray,
    text_feats: np.ndarray,  # (T, 768) pooled label features
    batch_size: int = 4,
):
    """Forward + PostProcessHOI-contract postprocess -> per-image result
    dicts (labels/boxes/verb_scores/sub_ids/obj_ids)."""
    import jax
    import jax.numpy as jnp

    from rlipv2_tpu.eval.postprocess import postprocess_hoi, to_image_results
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    model = RLIPParSeDA(cfg)
    apply_fn = jax.jit(
        lambda p, px, v, te, tv: model.apply(
            p, px, v, te, tv, cfg.max_obj_texts
        ),
    )
    results = []
    n = pixels.shape[0]
    for s in range(0, n, batch_size):
        px = pixels[s: s + batch_size]
        B = px.shape[0]
        te = np.tile(text_feats[None], (B, 1, 1)).astype(np.float32)
        out = apply_fn(
            params,
            jnp.asarray(px),
            jnp.asarray(valid[s: s + batch_size]),
            jnp.asarray(te),
            jnp.ones((B, te.shape[1]), bool),
        )
        post = postprocess_hoi(out, jnp.asarray(orig_sizes[s: s + batch_size]))
        results.extend(to_image_results(post))
    return results


def dump_detections(results, path: str) -> None:
    arrs = {"n_images": np.asarray(len(results))}
    for i, r in enumerate(results):
        arrs[f"img{i}_labels"] = np.asarray(r["labels"])
        arrs[f"img{i}_boxes"] = np.asarray(r["boxes"], np.float32)
        arrs[f"img{i}_verb_scores"] = np.asarray(r["verb_scores"], np.float32)
    np.savez(path, **arrs)


def load_dump(path: str):
    z = np.load(path)
    n = int(z["n_images"])
    return [
        {
            "labels": z[f"img{i}_labels"],
            "boxes": z[f"img{i}_boxes"],
            "verb_scores": z[f"img{i}_verb_scores"],
        }
        for i in range(n)
    ]


def compare_dumps(ours, ref, box_tol: float = 0.5, score_tol: float = 1e-3,
                  label_agree: float = 1.0):
    """Assert detection-level parity: per-image labels (>= label_agree
    fraction equal), boxes within box_tol pixels, verb scores within
    score_tol. Returns a report dict (max deltas) on success, raises
    AssertionError with the failing image otherwise."""
    assert len(ours) == len(ref), (len(ours), len(ref))
    report = {"n_images": len(ours), "max_box_delta": 0.0,
              "max_score_delta": 0.0, "min_label_agree": 1.0}
    for i, (a, b) in enumerate(zip(ours, ref)):
        agree = float(np.mean(np.asarray(a["labels"]) == np.asarray(b["labels"])))
        bd = float(np.abs(a["boxes"] - b["boxes"]).max()) if a["boxes"].size else 0.0
        sdel = float(np.abs(a["verb_scores"] - b["verb_scores"]).max()) \
            if a["verb_scores"].size else 0.0
        report["max_box_delta"] = max(report["max_box_delta"], bd)
        report["max_score_delta"] = max(report["max_score_delta"], sdel)
        report["min_label_agree"] = min(report["min_label_agree"], agree)
        assert agree >= label_agree, f"img {i}: label agreement {agree:.4f}"
        assert bd <= box_tol, f"img {i}: box delta {bd:.4f} px > {box_tol}"
        assert sdel <= score_tol, f"img {i}: score delta {sdel:.5f} > {score_tol}"
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="checkpoint -> detections dump")
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--backbone", default="resnet50")
    r.add_argument("--images", nargs="+", required=True)
    r.add_argument("--text_feats", required=True,
                   help="npz with 'feats' (T,768) pooled label features "
                        "(obj texts then verb texts, no-object last obj "
                        "slot); produce with the model's encode_text")
    r.add_argument("--n_obj", type=int, default=81)
    r.add_argument("--n_verb", type=int, default=117)
    r.add_argument("--num_queries", type=int, default=200)
    r.add_argument("--val_size", type=int, default=800)
    r.add_argument("--out", required=True)
    c = sub.add_parser("compare", help="compare two dumps")
    c.add_argument("--ours", required=True)
    c.add_argument("--ref", required=True)
    c.add_argument("--box_tol", type=float, default=0.5)
    c.add_argument("--score_tol", type=float, default=1e-3)
    k = sub.add_parser(
        "pack",
        help="check the committed torch-oracle golden pack (no torch / "
             "reference needed; tools/make_golden_pack.py regenerates it)",
    )
    k.add_argument("--pack", default=None)
    k.add_argument("--atol", type=float, default=2e-3)
    args = p.parse_args(argv)

    if args.cmd == "pack":
        from rlipv2_tpu.tools.golden_pack import PACK_PATH, check_pack

        report = check_pack(args.pack or PACK_PATH, atol=args.atol)
        print("GOLDEN PACK PASS", {k: f"{v:.2e}" for k, v in report.items()})
        return

    if args.cmd == "compare":
        report = compare_dumps(
            load_dump(args.ours), load_dump(args.ref),
            box_tol=args.box_tol, score_tol=args.score_tol,
        )
        print("GOLDEN CHECK PASS", report)
        return

    from PIL import Image

    cfg = default_config(args.backbone, num_queries=args.num_queries,
                         n_obj=args.n_obj, n_verb=args.n_verb)
    sd = load_torch_state_dict(args.checkpoint)
    params = convert_checkpoint(sd, cfg)
    images = [np.asarray(Image.open(f).convert("RGB")) for f in args.images]
    pixels, valid, sizes = preprocess_images(images, val_size=args.val_size)
    feats = np.load(args.text_feats)["feats"]
    results = run_detections(params, cfg, pixels, valid, sizes, feats)
    dump_detections(results, args.out)
    print(f"wrote {args.out} ({len(results)} images)")


if __name__ == "__main__":
    main()
