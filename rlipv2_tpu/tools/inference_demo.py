"""Single-image HOI inference demo.

Capability parity with the reference demo scripts
(inference_on_custom_imgs_hico.py:198-451 and _pseudo_coco.py): load an
image, run the flagship model with the HICO (or custom) label vocabulary,
postprocess, and return/print the top-k (subject box, object box, object,
verb, score) triplets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def run_inference(
    model,
    params,
    image: np.ndarray,  # (H, W, 3) uint8
    text_encoder,
    cfg,
    object_texts: Optional[Sequence[str]] = None,
    verb_texts: Optional[Sequence[str]] = None,
    top_k: int = 10,
    score_threshold: float = 0.0,
    bucket=(832, 1344),
    val_size: int = 800,
):
    import jax
    import jax.numpy as jnp

    from rlipv2_tpu.data.transforms import HOITransform
    from rlipv2_tpu.data.vocab import HICO_OBJECT_NAMES, HICO_VERB_NAMES
    from rlipv2_tpu.eval.postprocess import postprocess_hoi

    object_texts = list(object_texts or HICO_OBJECT_NAMES)
    verb_texts = list(verb_texts or HICO_VERB_NAMES)
    n_obj = len(object_texts) + 1  # + no-object slot

    h0, w0 = image.shape[:2]
    tf = HOITransform(train=False, val_size=val_size, max_size=int(val_size * 1333 / 800))
    img, _ = tf(image, {"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros(0, np.int64)})
    H, W = bucket
    pixels = np.zeros((1, H, W, 3), np.float32)
    valid = np.zeros((1, H, W), bool)
    hh, ww = img.shape[:2]
    pixels[0, :hh, :ww] = img
    valid[0, :hh, :ww] = True

    feats = text_encoder(object_texts + ["no objects"] + verb_texts)
    text_emb = jnp.asarray(feats)[None]
    text_valid = jnp.ones((1, len(feats)), bool)

    out = model.apply(
        params,
        jnp.asarray(pixels),
        jnp.asarray(valid),
        text_emb,
        text_valid,
        n_obj,
    )
    post = postprocess_hoi(out, jnp.asarray([[float(h0), float(w0)]]))

    verb_scores = np.asarray(post["verb_scores"][0])  # (nq, V)
    obj_labels = np.asarray(post["obj_labels"][0])
    sub_boxes = np.asarray(post["sub_boxes"][0])
    obj_boxes = np.asarray(post["obj_boxes"][0])

    nq, V = verb_scores.shape
    flat = verb_scores.ravel()
    order = np.argsort(-flat)[: max(top_k, 1)]
    results = []
    for k in order:
        q, v = divmod(int(k), V)
        score = float(flat[k])
        if score < score_threshold:
            break
        results.append(
            {
                "score": score,
                "verb": verb_texts[v],
                "object": object_texts[int(obj_labels[q])],
                "sub_box": sub_boxes[q].tolist(),
                "obj_box": obj_boxes[q].tolist(),
            }
        )
    return results


def main(argv=None):
    import argparse

    from PIL import Image

    from rlipv2_tpu.cli import build_everything, get_parser
    from rlipv2_tpu.engine.checkpoint import CheckpointManager

    p = argparse.ArgumentParser("rlipv2_tpu inference demo")
    p.add_argument("image")
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--tokenizer_dir", required=True)
    p.add_argument("--preset", default="rlip_parseda_v2_r50")
    p.add_argument("--top_k", type=int, default=10)
    args = p.parse_args(argv)

    cli_args = get_parser().parse_args(
        ["--preset", args.preset, "--tokenizer_dir", args.tokenizer_dir]
    )
    ctx = build_everything(cli_args)
    state = ctx["state"]
    restored = CheckpointManager(args.checkpoint).restore(state)
    if restored is not None:
        state = restored

    image = np.asarray(Image.open(args.image).convert("RGB"))
    results = run_inference(
        ctx["model"], state.params, image, ctx["text_encoder"], ctx["cfg"],
        top_k=args.top_k,
    )
    for r in results:
        print(
            f"{r['score']:.3f}  person {r['verb']} {r['object']}  "
            f"sub={['%.0f' % v for v in r['sub_box']]} "
            f"obj={['%.0f' % v for v in r['obj_box']]}"
        )
    return results


if __name__ == "__main__":
    main()
