"""CLI surface smoke tests: every tool parses --help (flag-surface parity
with the reference) and the parsers expose the documented flags."""

import pytest


CLI_MODULES = [
    "train",
    "train_folds",
    "test_ensemble",
    "est_lands_csv",
    "compute_actual_dice_on_test",
    "overlay_est_ann",
    "overlay_est_heat",
    "preprocess_full_res",
    "seg_fullres",
    "full_res_3d_viz",
    "export_torch_net",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_help_parses(name, capsys):
    mod = __import__("deepfluoro_tpu.cli." + name, fromlist=["build_parser"])
    with pytest.raises(SystemExit) as exc:
        mod.build_parser().parse_args(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "usage:" in out


def test_train_reference_flags_present():
    from deepfluoro_tpu.cli.train import build_parser

    # the flags of the documented paper command (train_test_code/Readme.md:16)
    flags = [
        "--train-pats", "--num-classes", "--init-lr", "--momentum",
        "--unet-batch-norm", "--unet-no-max-pool", "--unet-img-dim",
        "--unet-num-lvls", "--batch-size", "--max-num-epochs",
        "--unet-init-feats-exp", "--wgt-decay", "--data-aug", "--unet-padding",
        "--nesterov", "--checkpoint-net", "--checkpoint-freq", "--use-lands",
        "--best-net", "--lr-sched", "--train-valid-split", "--train-loss-txt",
        "--valid-loss-txt", "--heat-coeff",
    ]
    parser = build_parser()
    opts = {o for a in parser._actions for o in a.option_strings}
    missing = [f for f in flags if f not in opts]
    assert not missing, missing


def test_test_ensemble_reference_flags_present():
    from deepfluoro_tpu.cli.test_ensemble import build_parser

    parser = build_parser()
    opts = {o for a in parser._actions for o in a.option_strings}
    for f in ("--nets", "--pats", "--no-gpu", "--times"):
        assert f in opts
