"""Smoke test of the acceptance-harness CLI (tiny budget)."""

import json
import sys


def test_validate_cli_end_to_end(tmp_path, capsys):
    from gflownet_spai_tpu.validate.__main__ import main

    rc = main([
        "--matrix", "LF10_like", "--epochs", "8", "--batch-size", "4",
        "--maxiter", "500", "--out-dir", str(tmp_path),
        "--jacobi-poly", "4", "--chebyshev", "4", "--vcycle", "2",
    ])
    report = json.loads((tmp_path / "validation.json").read_text())
    for key in ("none", "ilu", "sampled_spai", "classic_spai", "jacobi_poly",
                "chebyshev", "vcycle"):
        assert key in report
        assert report[key]["iterations"] >= 1
    assert report["jacobi_poly"]["iterations"] <= report["none"]["iterations"]
    assert report["chebyshev"]["iterations"] <= report["none"]["iterations"]
    assert rc in (0, 1)
    out = capsys.readouterr().out
    assert "preconditioner" in out


def test_sample_cli_end_to_end(tmp_path):
    from gflownet_spai_tpu.train import TrainConfig, train
    from gflownet_spai_tpu.sample.__main__ import main as sample_main
    import json

    out = str(tmp_path / "r")
    train(TrainConfig(matrix="LF10_like", batch_size=4, num_epochs=4, out_dir=out),
          progress=False)
    rc = sample_main([
        "--run-dir", out, "--matrix", "LF10_like", "--num-samples", "64",
        "--batch-size", "32", "--export-mtx", str(tmp_path / "m.mtx"),
    ])
    assert rc == 0
    s = json.loads((tmp_path / "r" / "sample_summary.json").read_text())
    assert s["samples"] == 64
    assert (tmp_path / "m.mtx").exists()


def test_sample_cli_restores_round4_checkpoint_shape(tmp_path):
    """The checkpoint-shape flags (edge-feats channel, subtb flow head,
    plateau-patience 0 optimizer, replay buffer, pinned alpha): restoring
    must match the orbax template and score rewards at the training run's
    alpha (a learned-alpha rescore flips their sign on thinning runs)."""
    import json
    from gflownet_spai_tpu.sample.__main__ import main as sample_main
    from gflownet_spai_tpu.train import TrainConfig, train

    out = str(tmp_path / "r4")
    train(TrainConfig(matrix="LF10_like", seed_method="spai", seed_k=2,
                      reward_baseline="identity", loss="subtb",
                      backward="linear", edge_feats=True, replay_size=8,
                      plateau_patience=0, alpha_fixed=0.98,
                      batch_size=4, num_epochs=4, out_dir=out),
          progress=False)
    rc = sample_main([
        "--run-dir", out, "--matrix", "LF10_like", "--seed-method", "spai",
        "--seed-k", "2", "--reward-baseline", "identity",
        "--loss", "subtb", "--backward", "linear", "--edge-feats",
        "--replay-size", "8", "--plateau-patience", "0",
        "--alpha-fixed", "0.98",
        "--num-samples", "16", "--batch-size", "16",
    ])
    assert rc == 0
    s = json.loads((tmp_path / "r4" / "sample_summary.json").read_text())
    assert s["samples"] == 16
    assert s["alpha"] == 0.98
