"""CLI tests: argv parsing and the run_attfind pipeline as a script."""

import json
import numpy as np
import pytest

from stylex_tpu.cli import parse_argv


def test_parse_argv_forms():
    kwargs = parse_argv(
        [
            "--data", "./d",
            "--image-size=32",
            "--new",
            "--aug-types", "['translation','cutout']",
            "--learning_rate", "2e-4",
            "--num-devices", "None",
            "--use-old-architecture", "false",
        ]
    )
    assert kwargs["data"] == "./d"
    assert kwargs["image_size"] == 32
    assert kwargs["new"] is True
    assert kwargs["aug_types"] == ["translation", "cutout"]
    assert kwargs["learning_rate"] == 2e-4
    assert kwargs["num_devices"] is None
    assert kwargs["use_old_architecture"] is False


def test_parse_argv_rejects_positional():
    with pytest.raises(SystemExit):
        parse_argv(["train"])


@pytest.mark.slow
def test_run_attfind_cli_end_to_end(tmp_path):
    """Train 2 steps, then run the AttFind script against the checkpoint."""
    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.train.trainer import Trainer

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.0,
                     save_every=1, evaluate_every=10**9)
    trainer = Trainer(name="attcli", base_dir=str(tmp_path), model_cfg=cfg,
                      train_cfg=tc, classifier_name="mobilenet")
    trainer.set_data_src(dataset_name="synthetic")
    trainer.train()
    trainer.loader.close()
    trainer.save(1)

    from stylex_tpu.run_attfind import main

    out = tmp_path / "attfind_out"
    main([
        "--name", "attcli",
        "--base-dir", str(tmp_path),
        "--dataset-name", "synthetic",
        "--classifier-name", "mobilenet",
        "--num-images", "3",
        "--num-indices", "2",
        "--coord-batch", "80",
        "--results-folder", str(out),
        "--visualize-top", "1",
    ])
    assert (out / "style_change_records.hdf5").exists()
    ranked = json.loads((out / "top_styles.json").read_text())["ranked"]
    assert len(ranked) >= 1
    direction, sindex = ranked[0]
    assert direction in (0, 1)

    # replay-results driver (`all_results_notebook.ipynb` equivalent):
    # report-only from the precomputed records, no model forward
    from stylex_tpu.replay_results import main as replay_main

    replay_out = tmp_path / "replay_out"
    replay_main([
        "--records", str(out / "style_change_records.hdf5"),
        "--out", str(replay_out),
        "--num-indices", "2",
    ])
    report = json.loads((replay_out / "top_styles.json").read_text())
    assert [tuple(x) for x in report["ranked"]] == [tuple(x) for x in ranked]
    assert report["per_style"][0]["sindex"] == sindex

    # with a checkpoint: renders the panel suite from the stored latents
    replay_main([
        "--records", str(out / "style_change_records.hdf5"),
        "--out", str(replay_out),
        "--num-indices", "2",
        "--name", "attcli",
        "--base-dir", str(tmp_path),
        "--classifier-name", "mobilenet",
        "--visualize-top", "1",
    ])
    assert (replay_out / f"style_{direction}_{sindex}_by_distance.png").exists()
