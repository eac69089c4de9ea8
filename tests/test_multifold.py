"""Tests for simultaneous multi-fold (leave-one-specimen-out) training."""

import numpy as np
import jax
import pytest

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset
from deepfluoro_tpu.data.hdf5 import load_dataset
from deepfluoro_tpu.train import TrainConfig
from deepfluoro_tpu.train.multifold import fold_state, train_multifold


@pytest.fixture(scope="module")
def h5p(tmp_path_factory):
    return write_synthetic_dataset(
        str(tmp_path_factory.mktemp("mf") / "ds.h5"),
        num_specimens=3, num_projs=6, img_dim=32,
    )


def test_folds_train_independently(h5p):
    cfg = TrainConfig(
        num_classes=7, batch_size=3, proj_unet_dim=36, depth=2, init_feats_exp=2,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
        optim_type="sgd", init_lr=0.05, momentum=0.9, nesterov=True,
        data_aug=False, seed=0,
    )
    # 3 folds: hold out specimen k+1, train on the others
    folds = [load_dataset(h5p, [p for p in (1, 2, 3) if p != k]) for k in (1, 2, 3)]
    model, stacked, hist = train_multifold(folds, cfg, num_epochs=4, verbose=False)

    losses = hist[-1]
    assert losses.shape == (3,)
    assert np.isfinite(losses).all()
    # all folds improved
    assert (hist[-1] < hist[0]).all()

    # folds started from different inits and saw different data -> diverged
    p0 = jax.tree.leaves(fold_state(stacked, 0).params)[0]
    p1 = jax.tree.leaves(fold_state(stacked, 1).params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_fold_state_usable_for_inference(h5p):
    from deepfluoro_tpu.infer.ensemble import make_ensemble_forward
    import jax.numpy as jnp

    cfg = TrainConfig(
        num_classes=7, batch_size=3, proj_unet_dim=36, depth=2, init_feats_exp=2,
        batch_norm=True, padding=True, no_max_pool=True, num_lands=14,
        optim_type="sgd", init_lr=0.05,
    )
    folds = [load_dataset(h5p, [2, 3])]
    model, stacked, _ = train_multifold(folds, cfg, num_epochs=1, verbose=False)
    st = fold_state(stacked, 0)
    variables = {"params": st.params, "batch_stats": st.batch_stats}
    fwd = make_ensemble_forward(model, 14, (32, 32))
    from deepfluoro_tpu.infer.ensemble import stack_variables

    seg, heats, labels = fwd(stack_variables([variables]), jnp.zeros((1, 36, 36, 1)))
    assert labels.shape == (1, 32, 32)


def test_train_folds_cli_end_to_end(tmp_path, h5p):
    """train_folds CLI -> per-fold checkpoints -> test_ensemble consumes them."""
    import os
    from deepfluoro_tpu.cli import test_ensemble, train_folds

    prefix = str(tmp_path / "fold")
    train_folds.main([
        h5p, "--pats", "1,2,3", "--num-classes", "7", "--batch-size", "3",
        "--unet-img-dim", "36", "--epochs", "2", "--unet-num-lvls", "2",
        "--unet-init-feats-exp", "2", "--unet-batch-norm", "--unet-padding",
        "--unet-no-max-pool", "--use-lands", "--init-lr", "0.05",
        "--net-prefix", prefix,
    ])
    for p in (1, 2, 3):
        assert os.path.exists("{}_spec{:02d}.pt".format(prefix, p))

    # fold 1's net (specimen 1 held out) evaluated on specimen 1
    out_h5 = str(tmp_path / "out.h5")
    test_ensemble.main([
        h5p, out_h5, "--pats", "1",
        "--nets", "{}_spec01.pt".format(prefix),
    ])
    import h5py
    with h5py.File(out_h5) as f:
        assert f["nn-segs"].shape[0] == 6
        assert f["nn-heats"].shape[1] == 14
