"""tools/plot_logs.py: reference util/plot_utils.py:23-110 port.

Covers both log formats (this repo's nested per-epoch records and the
reference's flat train_*/test_* records), the mAP special case, and the
precision/recall dump reader on a synthetic npz.
"""
import json

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from rlipv2_tpu.tools.plot_logs import (  # noqa: E402
    load_log,
    main,
    plot_logs,
    plot_precision_recall,
)


def _write_nested_log(d, n=5):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "log.txt", "w") as f:
        for e in range(n):
            f.write(json.dumps({
                "epoch": e,
                "train": {"loss": 10.0 - e, "loss_bbox": 1.0 / (e + 1)},
                "test": {"mAP": 0.1 * e, "loss": 9.0 - e},
                "epoch_time": 12.3,
            }) + "\n")


def _write_flat_log(d, n=5):
    # reference main.py:781-789 style: flat train_*/test_* keys
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "log.txt", "w") as f:
        for e in range(n):
            f.write(json.dumps({
                "epoch": e,
                "train_loss": 8.0 - e,
                "test_loss": 7.5 - e,
                "test_mAP": 0.05 * e,
            }) + "\n")


def test_load_log_flattens_nested(tmp_path):
    _write_nested_log(tmp_path / "run")
    df = load_log(tmp_path / "run")
    assert list(df["epoch"]) == [0, 1, 2, 3, 4]
    assert "train_loss" in df.columns and "test_mAP" in df.columns
    assert df["train_loss"].iloc[0] == 10.0
    assert df["test_mAP"].iloc[4] == pytest.approx(0.4)


def test_plot_logs_mixed_formats(tmp_path):
    _write_nested_log(tmp_path / "ours")
    _write_flat_log(tmp_path / "ref")
    fig, axs = plot_logs(
        [tmp_path / "ours", tmp_path / "ref"], fields=("loss", "mAP")
    )
    # loss subplot: train solid + test dashed per run = 4 lines
    assert len(axs[0].get_lines()) == 4
    # mAP subplot: one smoothed test_mAP line per run
    assert len(axs[1].get_lines()) == 2
    ys = axs[1].get_lines()[0].get_ydata()
    assert ys[-1] == pytest.approx(0.4)  # ewm(com=0) == identity
    matplotlib.pyplot.close(fig)


def test_plot_logs_single_path_and_bad_dir(tmp_path):
    _write_nested_log(tmp_path / "run")
    fig, _ = plot_logs(tmp_path / "run", fields=("loss",))
    matplotlib.pyplot.close(fig)
    with pytest.raises(ValueError):
        plot_logs(tmp_path / "missing", fields=("loss",))
    with pytest.raises(ValueError):
        plot_logs(42, fields=("loss",))


def test_plot_precision_recall_npz(tmp_path, capsys):
    # pycocotools layout: (n_iou, n_points, n_cat, n_area, max_det)
    rng = np.random.RandomState(0)
    rec_thrs = np.linspace(0, 1, 101)
    f = tmp_path / "latest.npz"
    np.savez(
        f,
        precision=rng.uniform(0.4, 0.9, (10, 101, 3, 4, 3)),
        scores=rng.uniform(0, 1, (10, 101, 3, 4, 3)),
        recall=rng.uniform(0.3, 0.8, (10, 3, 4, 3)),
        recThrs=rec_thrs,
    )
    fig, axs = plot_precision_recall([f])
    out = capsys.readouterr().out
    assert "mAP@50=" in out and "f1=" in out
    line = axs[0].get_lines()[0]
    assert len(line.get_xdata()) == 101
    matplotlib.pyplot.close(fig)


def test_cli_writes_png(tmp_path):
    _write_nested_log(tmp_path / "run")
    out = tmp_path / "c.png"
    main([str(tmp_path / "run"), "--fields", "loss", "mAP",
          "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
