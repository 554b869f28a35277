"""plot_curves CLI: wandb-panel parity rendering from metrics.jsonl."""

import json

from fairdiff.tools.plot_curves import (
    PlotConfig, ema_smooth, load_csv_series, load_jsonl_series, main,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_load_jsonl_series_skips_non_numeric_and_torn_lines(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_jsonl(p, [
        {"step": 1, "time": 0.0, "gender_gap": 0.5, "note": "text"},
        {"step": 2, "gender_gap": 0.25},
    ])
    with open(p, "a") as f:
        f.write('{"step": 3, "gender_ga')  # live-run torn tail
    series = load_jsonl_series(p)
    assert series["gender_gap"] == ([1, 2], [0.5, 0.25])
    assert "note" not in series and "time" not in series


def test_load_csv_series_wandb_export_format(tmp_path):
    p = tmp_path / "ref.csv"
    p.write_text("Step,run - val_gender_gap\n0,0.9\n100,0.4\n")
    steps, vals = load_csv_series(p)
    assert steps == [0, 100] and vals == [0.9, 0.4]


def test_ema_smooth_matches_wandb_recurrence():
    vals = [1.0, 0.0, 0.0]
    out = ema_smooth(vals, 0.5)
    assert out == [1.0, 0.5, 0.25]
    assert ema_smooth(vals, 0.0) is vals


def test_main_writes_panels_and_backing_csv(tmp_path):
    run_a = tmp_path / "a.jsonl"
    run_b = tmp_path / "b.jsonl"
    _write_jsonl(run_a, [{"step": s, "train_loss": 1.0 / (s + 1),
                          "gender_gap": 0.5} for s in range(3)])
    _write_jsonl(run_b, [{"step": s, "train_loss": 2.0 / (s + 1)}
                         for s in range(3)])
    ref_csv = tmp_path / "ref.csv"
    ref_csv.write_text("Step,val\n0,0.9\n2,0.3\n")
    out = tmp_path / "curves"
    written = main(PlotConfig(
        runs=f"a={run_a},b={run_b}", csv=f"reference={ref_csv}",
        keys="train_loss,gender_gap", save_dir=str(out),
    ))
    assert [p.name for p in written] == ["train_loss.png", "gender_gap.png"]
    # backing CSV holds every plotted series; the overlay only on key #1
    rows = (out / "train_loss.csv").read_text()
    assert "reference" in rows and "a," in rows and "b," in rows
    assert "reference" not in (out / "gender_gap.csv").read_text()


def test_main_csv_only_renders_a_panel(tmp_path):
    ref_csv = tmp_path / "ref.csv"
    ref_csv.write_text("Step,val\n0,0.9\n100,0.4\n")
    written = main(PlotConfig(csv=f"reference={ref_csv}",
                              save_dir=str(tmp_path / "o")))
    assert [p.stem for p in written] == ["reference"]


def test_main_auto_keys_only_present_metrics(tmp_path):
    run = tmp_path / "m.jsonl"
    _write_jsonl(run, [{"step": 0, "gender_gap": 0.1, "unknown_key": 5.0}])
    written = main(PlotConfig(metrics_jsonl=str(run),
                              save_dir=str(tmp_path / "o")))
    assert [p.stem for p in written] == ["gender_gap"]
