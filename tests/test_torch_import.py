"""Checkpoint-parity test: a torch model following the reference's module
naming (transcribed from the documented architecture, unet.py:40-260) is
randomly initialized, its state dict imported through compat.torch_import,
and the Flax forward must reproduce the torch forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepfluoro_tpu.compat.torch_import import import_torch_state_dict  # noqa: E402
from deepfluoro_tpu.train import TrainConfig, build_model  # noqa: E402


class RefBlock(nn.Module):
    """Transcription of the reference UNetConvBlock naming (block.N indices,
    res_conv1x1)."""

    def __init__(self, cin, cout, bn, block_depth, do_res):
        super().__init__()
        layers = []
        c = cin
        for _ in range(block_depth):
            layers.append(nn.Conv2d(c, cout, 3, padding=1))
            layers.append(nn.ReLU())
            if bn:
                layers.append(nn.BatchNorm2d(cout))
            c = cout
        self.block = nn.Sequential(*layers)
        self.do_res = do_res
        if do_res:
            self.res_conv1x1 = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        out = self.block(x)
        if self.do_res:
            out = out + self.res_conv1x1(x)
        return out


class RefUp(nn.Module):
    def __init__(self, cin, cout, bn, block_depth, do_res):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.conv_block = RefBlock(cin, cout, bn, block_depth, do_res)

    def forward(self, x, bridge):
        up = self.up(x)
        return self.conv_block(torch.cat([up, bridge], dim=1))


class RefUNet(nn.Module):
    """Reference-named torch U-Net (padding=True, upconv, no-max-pool)."""

    def __init__(self, n_classes, depth, wf, bn, num_lands, block_depth=2, do_res=True):
        super().__init__()
        self.depth = depth
        self.down_path = nn.ModuleList()
        self.downsample_convs = nn.ModuleList()
        cin = 1
        for i in range(depth):
            cout = 2 ** (wf + i)
            self.down_path.append(RefBlock(cin, cout, bn, block_depth, do_res))
            cin = cout
            self.downsample_convs.append(nn.Conv2d(cin, cin, 2, stride=2))
        self.up_path = nn.ModuleList()
        for i in reversed(range(depth - 1)):
            cout = 2 ** (wf + i)
            self.up_path.append(RefUp(cin, cout, bn, block_depth, do_res))
            cin = cout
        self.seg_conv = nn.Conv2d(cin, n_classes, 1, bias=False)
        self.num_lands = num_lands
        if num_lands > 0:
            self.lands_1x1 = nn.Sequential(
                nn.Conv2d(cin + n_classes, num_lands + n_classes, 1, bias=False),
                nn.Conv2d(num_lands + n_classes, num_lands, 1, bias=False),
            )

    def forward(self, x):
        skips = []
        for i, down in enumerate(self.down_path):
            x = down(x)
            if i != self.depth - 1:
                skips.append(x)
                x = self.downsample_convs[i](x)
        for k, up in enumerate(self.up_path):
            x = up(x, skips[-k - 1])
        seg_logits = self.seg_conv(x)
        seg = torch.softmax(seg_logits, dim=1)
        if self.num_lands > 0:
            h = torch.cat([x, seg_logits], dim=1)
            return seg, self.lands_1x1(h)
        return seg


def _randomize_bn_stats(net, rng):
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.5, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, m.running_var.shape).astype(np.float32)))


@pytest.mark.parametrize("bn,num_lands", [(True, 4), (False, 0), (True, 0), (False, 4)])
def test_forward_parity(bn, num_lands, rng):
    torch.manual_seed(0)
    tnet = RefUNet(n_classes=5, depth=3, wf=2, bn=bn, num_lands=num_lands).eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet, rng)

    cfg = TrainConfig(
        num_classes=5, depth=3, init_feats_exp=2, batch_norm=bn, padding=True,
        no_max_pool=True, num_lands=num_lands, block_depth=2, use_res=True,
    )
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = import_torch_state_dict(sd, cfg)

    model = build_model(cfg)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    x = rng.random((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))

    jout = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)

    if num_lands > 0:
        tseg, theat = tout
        jseg, jheat = jout
        np.testing.assert_allclose(
            np.transpose(np.asarray(jseg), (0, 3, 1, 2)), tseg.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(jheat), (0, 3, 1, 2)), theat.numpy(), atol=2e-4
        )
    else:
        np.testing.assert_allclose(
            np.transpose(np.asarray(jout), (0, 3, 1, 2)), tout.numpy(), atol=2e-5
        )


def test_argmax_map_parity(rng):
    """The contract that matters downstream: identical argmax label maps."""
    torch.manual_seed(1)
    tnet = RefUNet(n_classes=7, depth=3, wf=3, bn=True, num_lands=4).eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet, rng)
    cfg = TrainConfig(
        num_classes=7, depth=3, init_feats_exp=3, batch_norm=True, padding=True,
        no_max_pool=True, num_lands=4,
    )
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = import_torch_state_dict(sd, cfg)
    model = build_model(cfg)

    x = rng.random((1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tseg, _ = tnet(torch.from_numpy(x))
    jseg, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    np.testing.assert_array_equal(
        np.asarray(jseg.argmax(-1)[0]), tseg.argmax(1)[0].numpy()
    )


def test_full_checkpoint_roundtrip(tmp_path, rng):
    """torch.save a reference-format checkpoint dict and import it."""
    from deepfluoro_tpu.compat import import_torch_checkpoint

    torch.manual_seed(2)
    tnet = RefUNet(n_classes=5, depth=2, wf=2, bn=True, num_lands=4).eval()
    cfg = TrainConfig(
        num_classes=5, depth=2, init_feats_exp=2, batch_norm=True, padding=True,
        no_max_pool=True, num_lands=4,
    )
    state = dict(cfg.to_checkpoint_meta())
    state["model-state-dict"] = tnet.state_dict()
    state["epoch"] = 12
    p = str(tmp_path / "ref.pt")
    torch.save(state, p)

    cfg2, params, stats = import_torch_checkpoint(p)
    assert cfg2.depth == 2 and cfg2.num_lands == 4 and cfg2.batch_norm
    model = build_model(cfg2)
    x = rng.random((1, 16, 16, 1)).astype(np.float32)
    seg, heats = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    assert seg.shape == (1, 16, 16, 5)
