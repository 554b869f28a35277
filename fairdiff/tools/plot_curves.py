"""Render training-metric curves from metrics.jsonl as PNG panels.

The reference monitors finetuning through wandb line panels (train_DAL,
train_gender_gap, val_gender_gap — the curves embedded in each
experiment README under _github-images/exp-*/). fairdiff's source of
truth is `<output_dir>/metrics.jsonl`; this CLI renders the same panels
locally, so bias-convergence can be compared against the reference's
published curves without a wandb account.

Overlays: --runs takes a comma-separated list of `label=metrics.jsonl`
to plot runs against each other, and --csv a comma-separated list of
`label=path.csv` (wandb export format: a `Step` column plus one value
column) to overlay curves exported from a reference wandb run.

  python -m fairdiff.tools.plot_curves --runs ours=outputs/exp1/metrics.jsonl \
      --csv reference=ref_train_gender_gap.csv --keys gender_gap \
      --save_dir outputs/exp1/curves
"""

from __future__ import annotations

import csv as csv_lib
import json
from dataclasses import dataclass
from pathlib import Path

from fairdiff.utils import config as cfglib

# wandb-panel parity: metric keys plotted when --keys auto (the reference
# panels, exp-1 README "Below, we present logs from several example runs")
AUTO_KEYS = [
    "train_loss_fair",      # train_DAL
    "train_loss_face",
    "train_loss",
    "gender_gap",           # train_gender_gap
    "gender_gap_abs",
    "race_gap",
    "gender_race_gap",
    "age_gap",
    "eval_gender_gap",      # val_gender_gap
    "eval_ema_gender_gap",
    "eval_race_gap",
    "eval_ema_race_gap",
    "grad_norm",
    "face_rate",
]

# fixed categorical hue order (never cycled; >6 runs fold to "other" gray)
SERIES_COLORS = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300",
]
OTHER_COLOR = "#8a8a85"
GRID_COLOR = "#e6e4df"
TEXT_COLOR = "#34322d"


@dataclass
class PlotConfig:
    runs: str = ""        # comma-separated label=metrics.jsonl
    csv: str = ""         # comma-separated label=wandb_export.csv
    keys: str = "auto"    # comma list or "auto"
    save_dir: str = "outputs/curves"
    smooth: float = 0.0   # EMA factor (wandb-style), 0=off
    metrics_jsonl: str = ""  # shorthand for one unlabeled run


def _parse_labeled(spec: str, default_prefix: str) -> list[tuple[str, Path]]:
    out = []
    for i, item in enumerate(s for s in spec.split(",") if s.strip()):
        label, _, path = item.strip().rpartition("=")
        out.append((label or f"{default_prefix}{i}", Path(path)))
    return out


def load_jsonl_series(path: Path) -> dict[str, tuple[list[int], list[float]]]:
    """{metric: (steps, values)} from a metrics.jsonl file."""
    series: dict[str, tuple[list[int], list[float]]] = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:  # torn tail line of a live run
                continue
            step = int(rec.get("step", len(series)))
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, (int, float)):
                    continue
                s = series.setdefault(k, ([], []))
                s[0].append(step)
                s[1].append(float(v))
    return series


def load_csv_series(path: Path) -> tuple[list[int], list[float]]:
    """wandb CSV export: a Step column + the first numeric value column."""
    steps, vals = [], []
    with open(path) as f:
        reader = csv_lib.DictReader(f)
        step_col = next(
            (c for c in reader.fieldnames or [] if c.lower() == "step"), None
        )
        for row in reader:
            val = None
            for c, raw in row.items():
                if c == step_col or raw in (None, ""):
                    continue
                try:
                    val = float(raw)
                    break
                except ValueError:
                    continue
            if val is None:
                continue
            steps.append(int(float(row[step_col])) if step_col else len(steps))
            vals.append(val)
    return steps, vals


def ema_smooth(values: list[float], factor: float) -> list[float]:
    """wandb's exponential smoothing (factor in [0,1), 0 = identity)."""
    if not factor:
        return values
    out, acc = [], None
    for v in values:
        acc = v if acc is None else acc * factor + v * (1.0 - factor)
        out.append(acc)
    return out


def main(cfg: PlotConfig) -> list[Path]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = _parse_labeled(cfg.runs, "run")
    if cfg.metrics_jsonl:
        runs.insert(0, ("run", Path(cfg.metrics_jsonl)))
    overlays = _parse_labeled(cfg.csv, "csv")
    if not runs and not overlays:
        raise SystemExit("pass --metrics_jsonl, --runs label=path, or --csv")

    data = {label: load_jsonl_series(p) for label, p in runs}
    keys = (
        [k for k in AUTO_KEYS if any(k in s for s in data.values())]
        if cfg.keys == "auto"
        else [k.strip() for k in cfg.keys.split(",") if k.strip()]
    )
    if not keys and overlays:
        # csv-only invocation: one panel named after the first overlay
        keys = [overlays[0][0]]

    out_dir = Path(cfg.save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for key in keys:
        fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=120)
        n_series = 0
        rows: list[tuple[str, int, float]] = []
        for label, series in data.items():
            if key not in series:
                continue
            steps, vals = series[key]
            color = (
                SERIES_COLORS[n_series]
                if n_series < len(SERIES_COLORS) else OTHER_COLOR
            )
            ax.plot(
                steps, ema_smooth(vals, cfg.smooth),
                color=color, linewidth=2, label=label,
            )
            rows += [(label, s, v) for s, v in zip(steps, vals)]
            n_series += 1
        # each CSV overlay is a single exported curve: it attaches to the
        # FIRST requested key only (put the key it belongs to first)
        for label, p in overlays:
            if key != keys[0]:
                continue
            steps, vals = load_csv_series(p)
            color = (
                SERIES_COLORS[n_series]
                if n_series < len(SERIES_COLORS) else OTHER_COLOR
            )
            ax.plot(
                steps, ema_smooth(vals, cfg.smooth),
                color=color, linewidth=2, linestyle="--", label=label,
            )
            rows += [(label, s, v) for s, v in zip(steps, vals)]
            n_series += 1
        if n_series == 0:
            plt.close(fig)
            continue
        ax.set_title(key, color=TEXT_COLOR)
        ax.set_xlabel("step", color=TEXT_COLOR)
        ax.grid(True, color=GRID_COLOR, linewidth=0.8)
        ax.tick_params(colors=TEXT_COLOR)
        for spine in ax.spines.values():
            spine.set_color(GRID_COLOR)
        if n_series >= 2:
            ax.legend(frameon=False, labelcolor=TEXT_COLOR)
        fig.tight_layout()
        png = out_dir / f"{key}.png"
        fig.savefig(png)
        plt.close(fig)
        # data behind every panel stays machine-readable next to it
        with open(out_dir / f"{key}.csv", "w", newline="") as f:
            w = csv_lib.writer(f)
            w.writerow(["run", "step", key])
            w.writerows(rows)
        written.append(png)
    print(f"[plot_curves] wrote {len(written)} panel(s) -> {out_dir}")
    return written


if __name__ == "__main__":
    main(cfglib.cli_parse(PlotConfig))
