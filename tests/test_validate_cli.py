"""Smoke test of the acceptance-harness CLI (tiny budget)."""

import json
import sys


def test_validate_cli_end_to_end(tmp_path, capsys):
    from gflownet_spai_tpu.validate.__main__ import main

    rc = main([
        "--matrix", "LF10", "--epochs", "8", "--batch-size", "4",
        "--maxiter", "500", "--out-dir", str(tmp_path),
    ])
    report = json.loads((tmp_path / "validation.json").read_text())
    for key in ("none", "ilu", "sampled_spai", "classic_spai"):
        assert key in report
        assert report[key]["iterations"] >= 1
    assert rc in (0, 1)
    out = capsys.readouterr().out
    assert "preconditioner" in out
