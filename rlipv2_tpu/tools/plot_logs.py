"""Training-log plotting (reference: util/plot_utils.py:23-110).

The reference's `plot_logs` reads DETR-style `log.txt` files (one JSON
object per epoch with flat `train_*` / `test_*` keys) and draws one
subplot per field — solid lines for train, dashed for test, one color
per run. This port keeps those semantics and additionally understands
this repo's nested per-epoch records (`{"epoch": E, "train": {...},
"test": {...}}`, utils/logging.py append_log_line), flattening them to
the same `train_*` / `test_*` columns — so a reference-produced log and
an rlipv2_tpu-produced log plot side by side in one figure.

`plot_precision_recall` mirrors util/plot_utils.py:79-110: it loads
COCO-eval dumps (`precision` (n_iou, n_points, n_cat, n_area, max_det),
`scores`, `recall`, and the recall thresholds), prints mAP@50 / mean
score / F1 per file, and draws precision/recall + scores/recall curves.
It accepts the reference's torch `.pth` dumps (via torch.load, when
torch is importable) and `.npz` archives with the same keys.

CLI: python -m rlipv2_tpu.tools.plot_logs RUN_DIR [RUN_DIR ...]
         --fields loss mAP --out curves.png
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path, PurePath

import numpy as np


def _ensure_agg():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _palette(n):
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("tab10")
    return [cmap(i % 10) for i in range(n)]


def _flatten_record(rec: dict) -> dict:
    """Nested {"train": {...}, "test": {...}} -> flat train_*/test_* keys;
    already-flat reference records pass through unchanged."""
    out = {}
    for k, v in rec.items():
        if k in ("train", "test") and isinstance(v, dict):
            for kk, vv in v.items():
                out[f"{k}_{kk}"] = vv
        else:
            out[k] = v
    return out


def load_log(run_dir, log_name: str = "log.txt"):
    """One run directory -> pandas DataFrame of flattened epoch records."""
    import pandas as pd

    rows = []
    with open(Path(run_dir) / log_name) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append(_flatten_record(json.loads(line)))
    return pd.DataFrame(rows)


def plot_logs(logs, fields=("loss", "mAP"), ewm_col=0, log_name="log.txt"):
    """Reference util/plot_utils.py:23-77 semantics: one subplot per
    field, one color per run, solid = train, dashed = test, exponential
    weighted smoothing with center-of-mass `ewm_col`.

    The reference's `mAP` special case read column 1 of the stacked
    `test_coco_eval` array (AP@50); here detection logs keep that path
    and HOI logs plot `test_mAP` directly (evaluate_hoi's headline key).
    """
    plt = _ensure_agg()

    if not isinstance(logs, (list, tuple)):
        if isinstance(logs, (PurePath, str)):
            logs = [logs]
        else:
            raise ValueError(
                f"plot_logs: expected list[Path] or Path, got {type(logs)}"
            )
    for d in logs:
        if not Path(d).exists():
            raise ValueError(f"plot_logs: invalid run directory {d}")

    dfs = [load_log(p, log_name) for p in logs]

    fig, axs = plt.subplots(ncols=len(fields), figsize=(16, 5), squeeze=False)
    axs = axs[0]

    for df, color in zip(dfs, _palette(len(dfs))):
        for j, field in enumerate(fields):
            if field == "mAP":
                if "test_coco_eval" in df.columns:  # detection logs
                    arr = np.stack(df["test_coco_eval"].dropna().values)[:, 1]
                elif "test_coco_eval_bbox" in df.columns:
                    arr = np.stack(
                        df["test_coco_eval_bbox"].dropna().values
                    )[:, 1]
                elif "test_mAP" in df.columns:  # HOI / SGG logs
                    arr = df["test_mAP"].to_numpy(dtype=float)
                else:
                    continue
                import pandas as pd

                smoothed = pd.Series(arr).ewm(com=ewm_col).mean()
                axs[j].plot(smoothed, c=color)
            else:
                cols = [
                    c
                    for c in (f"train_{field}", f"test_{field}")
                    if c in df.columns
                ]
                if not cols:
                    continue
                df.interpolate().ewm(com=ewm_col).mean().plot(
                    y=cols,
                    ax=axs[j],
                    color=[color] * len(cols),
                    style=["-", "--"][: len(cols)],
                )
    for ax, field in zip(axs, fields):
        ax.legend([Path(p).name for p in logs])
        ax.set_title(field)
    return fig, axs


def _load_eval_dump(path):
    """COCO-eval dump -> dict(precision, scores, recall, recThrs)."""
    path = Path(path)
    if path.suffix == ".npz":
        z = np.load(path, allow_pickle=True)
        return {k: z[k] for k in ("precision", "scores", "recall", "recThrs")}
    import torch  # reference dumps are torch.save'd (util/plot_utils.py:90)

    data = torch.load(path, map_location="cpu", weights_only=False)
    return {
        "precision": np.asarray(data["precision"]),
        "scores": np.asarray(data["scores"]),
        "recall": np.asarray(data["recall"]),
        "recThrs": np.asarray(data["params"].recThrs),
    }


def plot_precision_recall(files, naming_scheme="iter"):
    """Reference util/plot_utils.py:79-110."""
    plt = _ensure_agg()

    files = [Path(f) for f in files]
    if naming_scheme == "exp_id":
        names = [f.parts[-3] for f in files]
    elif naming_scheme == "iter":
        names = [f.stem for f in files]
    else:
        raise ValueError(f"not supported {naming_scheme}")

    fig, axs = plt.subplots(ncols=2, figsize=(16, 5))
    for f, color, name in zip(files, _palette(len(files)), names):
        data = _load_eval_dump(f)
        # precision is (n_iou, n_points, n_cat, n_area, max_det); take all
        # classes, all areas, 100 detections at IoU .5 — as the reference
        precision = data["precision"][0, :, :, 0, -1].mean(1)
        scores = data["scores"][0, :, :, 0, -1].mean(1)
        recall = data["recThrs"]
        prec = precision.mean()
        rec = data["recall"][0, :, 0, -1].mean()
        print(
            f"{naming_scheme} {name}: mAP@50={prec * 100: 05.1f}, "
            f"score={scores.mean():0.3f}, "
            f"f1={2 * prec * rec / (prec + rec + 1e-8):0.3f}"
        )
        axs[0].plot(recall, precision, c=color)
        axs[1].plot(recall, scores, c=color)

    axs[0].set_title("Precision / Recall")
    axs[0].legend(names)
    axs[1].set_title("Scores / Recall")
    axs[1].legend(names)
    return fig, axs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("runs", nargs="+", help="run output dirs with log.txt")
    ap.add_argument("--fields", nargs="+", default=["loss", "mAP"])
    ap.add_argument("--ewm_col", type=float, default=0)
    ap.add_argument("--log_name", default="log.txt")
    ap.add_argument("--out", default="curves.png")
    args = ap.parse_args(argv)

    fig, _ = plot_logs(
        [Path(r) for r in args.runs],
        fields=tuple(args.fields),
        ewm_col=args.ewm_col,
        log_name=args.log_name,
    )
    fig.savefig(args.out, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
