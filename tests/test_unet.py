"""Shape / structure / numerics tests for the Flax U-Net against the
reference architecture (unet.py:40-260)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.models import UNet


def _init(model, shape=(1, 64, 64, 1)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


class TestShapes:
    def test_padded_same_shape_seg_only(self):
        model = UNet(n_classes=7, depth=3, wf=3, padding=True, batch_norm=False)
        variables, x = _init(model, (2, 64, 64, 1))
        seg = model.apply(variables, x, train=False)
        assert seg.shape == (2, 64, 64, 7)
        # softmax output sums to 1 across classes
        np.testing.assert_allclose(np.asarray(seg.sum(-1)), 1.0, atol=1e-5)

    def test_joint_heads_paper_config_shapes(self):
        # paper config (train_test_code/Readme.md:14-17) scaled down:
        # depth 6 wf 5 at 192 -> use depth 4 wf 2 at 96 for test speed
        model = UNet(
            n_classes=7, depth=4, wf=2, padding=True, batch_norm=True,
            max_pool=False, num_lands=14, do_res=True, block_depth=2,
        )
        x = jnp.zeros((1, 96, 96, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        seg, heats = model.apply(variables, x, train=False)
        assert seg.shape == (1, 96, 96, 7)
        assert heats.shape == (1, 96, 96, 14)

    def test_unpadded_valid_convs_shrink(self):
        # classic Ronneberger config: VALID convs shrink the output
        model = UNet(n_classes=2, depth=3, wf=2, padding=False, do_res=False)
        variables, x = _init(model, (1, 92, 92, 1))
        seg = model.apply(variables, x, train=False)
        assert seg.shape[1] < 92 and seg.shape[2] < 92

    def test_upsample_mode(self):
        model = UNet(n_classes=3, depth=3, wf=2, padding=True, up_mode="upsample")
        variables, x = _init(model, (1, 32, 32, 1))
        seg = model.apply(variables, x, train=False)
        assert seg.shape == (1, 32, 32, 3)

    def test_no_softmax_logits(self):
        model = UNet(n_classes=3, depth=2, wf=2, padding=True, do_soft_max=False)
        variables, x = _init(model, (1, 16, 16, 1))
        seg = model.apply(variables, x, train=False)
        s = np.asarray(seg.sum(-1))
        assert not np.allclose(s, 1.0, atol=1e-3)

    def test_lands_block_depth(self):
        model = UNet(
            n_classes=3, depth=2, wf=3, padding=True, num_lands=4,
            lands_block_depth=2, lands_num_1x1=2,
        )
        variables, x = _init(model, (1, 16, 16, 1))
        seg, heats = model.apply(variables, x, train=False)
        assert heats.shape == (1, 16, 16, 4)

    def test_lands_single_1x1(self):
        model = UNet(n_classes=3, depth=2, wf=3, padding=True, num_lands=4, lands_num_1x1=1)
        variables, x = _init(model, (1, 16, 16, 1))
        seg, heats = model.apply(variables, x, train=False)
        assert heats.shape == (1, 16, 16, 4)


class TestParamStructure:
    def test_param_count_matches_torch_reference(self):
        """Parameter-count parity with the reference (unet.py) for a mid-size
        config; torch-CPU builds the reference-equivalent network."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        depth, wf, n_classes, num_lands, block_depth = 3, 3, 7, 14, 2

        model = UNet(
            n_classes=n_classes, depth=depth, wf=wf, padding=True,
            batch_norm=True, max_pool=False, num_lands=num_lands,
            do_res=True, block_depth=block_depth,
        )
        variables, x = _init(model, (1, 32, 32, 1))
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

        # Reference-equivalent torch construction (independent transcription
        # of unet.py:40-260, NOT an import of the reference code).
        def conv_block_params(cin, cout, bd, bn, res):
            n = 0
            c = cin
            for _ in range(bd):
                n += cout * c * 9 + cout  # 3x3 conv + bias
                if bn:
                    n += 2 * cout  # BN affine
                c = cout
            if res:
                n += cout * cin * 1 + cout  # 1x1 + bias
            return n

        want = 0
        prev = 1
        for i in range(depth):
            cout = 2 ** (wf + i)
            want += conv_block_params(prev, cout, block_depth, True, True)
            prev = cout
            if i != depth - 1:
                want += prev * prev * 4 + prev  # 2x2 strided downsample conv
        # NOTE: the reference also allocates a downsample conv for the deepest
        # level (unet.py:92-93) that forward() never uses (unet.py:163-171);
        # we deliberately do not create those dead parameters.
        for i in reversed(range(depth - 1)):
            cout = 2 ** (wf + i)
            cin = 2 ** (wf + i + 1)
            # ConvTranspose2d(in, out, k=2, s=2): out*in*4 + out
            want += cout * cin * 4 + cout
            want += conv_block_params(cin, cout, block_depth, True, True)
            prev = cout
        want += n_classes * prev  # seg 1x1, no bias
        # lands head: first 1x1 (feat + n_classes) -> num_lands + n_classes, then -> num_lands
        want += (num_lands + n_classes) * (prev + n_classes)
        want += num_lands * (num_lands + n_classes)

        assert n_params == want

    def test_batch_stats_created_only_with_bn(self):
        m_bn = UNet(n_classes=2, depth=2, wf=2, padding=True, batch_norm=True)
        v, _ = _init(m_bn, (1, 16, 16, 1))
        assert "batch_stats" in v
        m_nobn = UNet(n_classes=2, depth=2, wf=2, padding=True, batch_norm=False)
        v, _ = _init(m_nobn, (1, 16, 16, 1))
        assert "batch_stats" not in v


class TestTraining:
    def test_bn_train_mode_updates_stats(self):
        model = UNet(n_classes=2, depth=2, wf=2, padding=True, batch_norm=True)
        variables, x = _init(model, (2, 16, 16, 1))
        x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1)), jnp.float32)
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )

    def test_gradients_flow(self):
        model = UNet(n_classes=3, depth=2, wf=2, padding=True, num_lands=2)
        variables, _ = _init(model, (1, 16, 16, 1))
        x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 1)), jnp.float32)

        def loss_fn(params):
            seg, heats = model.apply({"params": params}, x, train=False)
            return jnp.sum(seg**2) + jnp.sum(heats**2)

        grads = jax.grad(loss_fn)(variables["params"])
        norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(norms))
        assert sum(n > 0 for n in norms) > len(norms) * 0.8

    def test_jit_forward(self):
        model = UNet(n_classes=3, depth=2, wf=2, padding=True, num_lands=2)
        variables, x = _init(model, (1, 16, 16, 1))
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        seg, heats = fwd(variables, x)
        assert seg.shape == (1, 16, 16, 3)

    def test_bfloat16_compute(self):
        model = UNet(n_classes=3, depth=2, wf=2, padding=True, num_lands=2, dtype=jnp.bfloat16)
        variables, x = _init(model, (1, 16, 16, 1))
        seg, heats = model.apply(variables, x, train=False)
        # outputs come back in float32 (softmax/loss dtype policy)
        assert seg.dtype == jnp.float32
        assert heats.dtype == jnp.float32


class TestRemat:
    def test_remat_is_bit_identical(self):
        """remat=True must change only the memory/compute schedule: same
        parameter tree (checkpoint compatibility); forward/gradients/BN
        stats equal up to float reassociation in the recomputed backward
        (observed ~1e-8)."""
        kw = dict(n_classes=7, depth=3, wf=3, padding=True, batch_norm=True,
                  max_pool=False, num_lands=14, do_res=True, block_depth=2)
        plain = UNet(**kw)
        remat = UNet(remat=True, **kw)
        x = jnp.asarray(np.random.default_rng(0).random((2, 48, 48, 1)), jnp.float32)
        v = plain.init(jax.random.PRNGKey(0), x, train=False)
        # identical parameter structure -> init of one serves the other
        v2 = remat.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

        def loss(model, variables):
            (seg, heats), mutated = model.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return jnp.mean(seg) + jnp.mean(heats), mutated

        (l1, m1), g1 = jax.value_and_grad(lambda p: loss(plain, {**v, "params": p}), has_aux=True)(v["params"])
        (l2, m2), g2 = jax.value_and_grad(lambda p: loss(remat, {**v, "params": p}), has_aux=True)(v["params"])
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
        for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    def test_remat_in_config_meta(self):
        from deepfluoro_tpu.train.config import TrainConfig, build_model

        cfg = TrainConfig(remat=True)
        assert build_model(cfg).remat is True
        meta = cfg.to_checkpoint_meta()
        assert meta["remat"] is True
        back = TrainConfig.from_checkpoint_meta(meta)
        assert back.remat is True
        # old checkpoints without the key default to off
        meta.pop("remat")
        assert TrainConfig.from_checkpoint_meta(meta).remat is False
