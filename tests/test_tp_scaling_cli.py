"""tools/tp_scaling drive test (tiny CPU config).

The r4 evidence runs (PERF.md "TP scaling evidence") exercised this CLI
at production shapes; this pins the contract at fixture scale: measured
rows for divisor lane counts, a RECORDED skip row for non-divisors
(ADVICE r3: json_out must match stdout), and a fit summary that projects
data-axis scaling only (the TP=2 memory projection was falsified by the
unet_vjp sweep and must stay gone).
"""

from __future__ import annotations

import json

import pytest

pytestmark = pytest.mark.slow  # compiles two tiny pair programs


def test_trainer_pair_tiny_rows_skip_and_fit(tmp_path, capsys):
    from fairdiff.tools.tp_scaling import TPScalingConfig, main

    out = tmp_path / "rows.json"
    rows = main(TPScalingConfig(
        mode="trainer_pair", tiny=True, lanes=(2, 3, 4),
        json_out=str(out),
    ))

    measured = [r for r in rows if "temp_gb" in r]
    skipped = [r for r in rows if "skipped" in r]
    assert [r["lanes"] for r in measured] == [2, 4]
    assert len(skipped) == 1 and skipped[0]["lanes"] == 3
    # json_out mirrors the in-memory rows including the skip record
    assert json.loads(out.read_text()) == rows
    # activation bytes grow with lanes; args (frozen weights) do not
    assert measured[1]["temp_gb"] > measured[0]["temp_gb"]
    assert measured[1]["arg_gb"] == pytest.approx(
        measured[0]["arg_gb"], rel=0.05
    )

    fit = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if "trainer_pair_fit" in ln][-1]
    )
    assert fit["gb_per_lane"] > 0
    assert fit["max_lanes_2chip_dp"] == 2 * fit["max_lanes_1chip"]
    assert "max_lanes_tp2_projected" not in fit
