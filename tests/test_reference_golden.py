"""Golden parity against the ACTUAL reference code (VERDICT r2 item 2,
SURVEY §4 "(c) parity tests vs reference semantics").

Every earlier torch-parity test compared against local *transcriptions* of
the reference; a shared misreading would pass silently. This module
sys.path-imports the real ``/root/reference/train_test_code`` modules —
unet.py, dice.py, ncc.py, dataset.py — and pins:

* same random checkpoint -> identical argmax maps / matching outputs through
  compat.torch_import (real unet.py:161-193 forward), including the
  never-before-tested ``up_mode='upsample'`` and ``pad_mode='circular'``
  configurations (VERDICT r2 item 5a/5b);
* identical soft-dice / NCC / joint loss values (real dice.py:20-55,
  ncc.py:12-38);
* the real ``get_dataset`` load chain (OOB->inf landmark marking, one-hot,
  min-max) vs data.hdf5.load_dataset on the same archive;
* the real ``RandomDataAugDataSet.__getitem__`` no-aug chain (reflect pad ->
  z-norm -> heatmap synthesis, dataset.py:287-326) vs prepare_batch;
* the real affine augmentation stage (dataset.py:150-251) with frozen RNG
  draws injected, vs ops.image's warp/matrix/landmark transforms.

torchvision is NOT installed here, so a minimal faithful shim (PIL-backed,
quantizing float->uint8 exactly like torchvision's to_pil_image, inverse
matrix per torchvision's documented formula with the PIL +0.5 center) is
registered before importing dataset.py. The image warp itself therefore
runs through PIL's C affine transform — an oracle fully independent of this
repo's jax warp. The reference applies its warp to uint8-quantized data
(to_pil_image mul(255).byte()) while this framework warps in float32, so
image comparisons carry a ~2/255 quantization band; geometry errors (wrong
center/direction/composition) would exceed it by orders of magnitude.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/train_test_code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference code not available"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepfluoro_tpu.data.fixtures import write_synthetic_dataset  # noqa: E402


# --------------------------------------------------------------------------
# torchvision shim (PIL-backed; see module docstring)
# --------------------------------------------------------------------------

def _install_torchvision_shim():
    import importlib.util

    if "torchvision" in sys.modules and not getattr(
        sys.modules["torchvision"], "_dft_shim", False
    ):
        return  # a real torchvision is already imported; use it
    if (
        "torchvision" not in sys.modules
        and importlib.util.find_spec("torchvision") is not None
    ):
        return  # a real torchvision is importable; never shadow it
    import PIL.Image

    tv = types.ModuleType("torchvision")
    tv._dft_shim = True
    transforms = types.ModuleType("torchvision.transforms")
    tf = types.ModuleType("torchvision.transforms.functional")

    class InterpolationMode:
        NEAREST = PIL.Image.NEAREST
        BILINEAR = PIL.Image.BILINEAR

    def to_pil_image(pic, mode=None):
        # torchvision: float tensors are scaled+TRUNCATED to uint8 unless
        # mode='F' (torchvision/transforms/functional.py to_pil_image)
        t = pic
        if t.ndim == 3 and t.shape[0] == 3:  # CHW RGB (overlay scripts)
            if t.is_floating_point() and mode != "F":
                t = t.mul(255).byte()
            return PIL.Image.fromarray(
                t.permute(1, 2, 0).contiguous().cpu().numpy(), "RGB"
            )
        if t.ndim == 3:
            assert t.shape[0] == 1
            t = t[0]
        if t.is_floating_point() and mode != "F":
            t = t.mul(255).byte()
        return PIL.Image.fromarray(t.cpu().numpy())

    def to_tensor(img):
        arr = np.asarray(img)
        assert arr.dtype == np.uint8
        if arr.ndim == 3:  # HWC RGB -> CHW float
            return torch.from_numpy(arr.astype(np.float32) / 255.0).permute(2, 0, 1)
        assert arr.ndim == 2
        return torch.from_numpy(arr.astype(np.float32) / 255.0)[None]

    def _get_inverse_affine_matrix(center, angle, translate, scale, shear):
        # torchvision's documented closed form (functional.py); the
        # reference calls this directly for analytic landmark transforms
        # (dataset.py:233-238)
        rot = math.radians(angle)
        sx = math.radians(shear[0])
        sy = math.radians(shear[1])
        cx, cy = center
        tx, ty = translate
        a = math.cos(rot - sy) / math.cos(sy)
        b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
        c = math.sin(rot - sy) / math.cos(sy)
        d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
        matrix = [d, -b, 0.0, -c, a, 0.0]
        matrix = [x / scale for x in matrix]
        matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
        matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
        matrix[2] += cx
        matrix[5] += cy
        return matrix

    def affine(img, angle, translate, scale, shear, interpolation=PIL.Image.NEAREST):
        # torchvision PIL path on every version the reference can run
        # (>=0.9 for InterpolationMode): center = (w*0.5, h*0.5) — the
        # legacy +0.5 center was dropped upstream ('visually better to
        # estimate the center without 0.5 offset'). The reference's
        # LANDMARK transform keeps its own +0.5 center (dataset.py:230-231),
        # which is exactly its documented 1px-off quirk.
        w, h = img.size
        center = (w * 0.5, h * 0.5)
        matrix = _get_inverse_affine_matrix(
            center, angle, (float(translate[0]), float(translate[1])), scale,
            (float(shear[0]), float(shear[1])),
        )
        return img.transform((w, h), PIL.Image.AFFINE, matrix, interpolation)

    utils = types.ModuleType("torchvision.utils")

    def save_image(tensor, path, normalize=False):
        # torchvision.utils.save_image: make_grid for batches (nrow=8,
        # padding=2, pad_value=0), then mul(255).add_(0.5).clamp_(0,255)
        # — i.e. ROUNDS where to_pil_image truncates
        assert not normalize
        if tensor.ndim == 4:
            n, c, hh, ww = tensor.shape
            xmaps = min(8, n)
            ymaps = (n + xmaps - 1) // xmaps
            height, width = hh + 2, ww + 2
            grid = tensor.new_zeros((c, height * ymaps + 2, width * xmaps + 2))
            for k in range(n):
                y, x = divmod(k, xmaps)
                grid[
                    :, y * height + 2 : y * height + 2 + hh,
                    x * width + 2 : x * width + 2 + ww,
                ] = tensor[k]
            tensor = grid
        nd = (
            tensor.clone().mul(255).add_(0.5).clamp_(0, 255)
            .permute(1, 2, 0).to(torch.uint8).numpy()
        )
        PIL.Image.fromarray(nd, "RGB").save(path)

    utils.save_image = save_image

    tf.to_pil_image = to_pil_image
    tf.to_tensor = to_tensor
    tf.affine = affine
    tf._get_inverse_affine_matrix = _get_inverse_affine_matrix
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = tf
    tv.transforms = transforms
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tf
    sys.modules["torchvision.utils"] = utils


@pytest.fixture(scope="module")
def ref():
    """Import the real reference modules (unet, dice, ncc, dataset, util)."""
    _install_torchvision_shim()
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        mods = types.SimpleNamespace(
            unet=importlib.import_module("unet"),
            dice=importlib.import_module("dice"),
            ncc=importlib.import_module("ncc"),
            dataset=importlib.import_module("dataset"),
            util=importlib.import_module("util"),
            warm_restarts_lr=importlib.import_module("warm_restarts_lr"),
        )
        yield mods
    finally:
        sys.path.remove(REF_DIR)


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("golden") / "synthetic.h5"
    return write_synthetic_dataset(str(path), num_specimens=2, num_projs=4, img_dim=32)


# --------------------------------------------------------------------------
# losses: real dice.py / ncc.py as oracle
# --------------------------------------------------------------------------

class TestGoldenLosses:
    def _rand_seg_pair(self, rng, b=3, c=7, h=24, w=24):
        logits = rng.standard_normal((b, c, h, w)).astype(np.float32)
        pred = torch.softmax(torch.from_numpy(logits), dim=1)
        tgt = np.eye(c, dtype=np.float32)[rng.integers(0, c, (b, h, w))]
        tgt = np.transpose(tgt, (0, 3, 1, 2))
        return pred, torch.from_numpy(tgt)

    @pytest.mark.parametrize("skip_bg", [True, False])
    def test_soft_dice(self, ref, rng, skip_bg):
        from deepfluoro_tpu.ops.losses import per_sample_dice

        pred, tgt = self._rand_seg_pair(rng)
        want = float(ref.dice.DiceLoss2D(skip_bg=skip_bg)(pred, tgt))
        got = float(
            jnp.mean(
                per_sample_dice(
                    jnp.asarray(np.transpose(pred.numpy(), (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(tgt.numpy(), (0, 2, 3, 1))),
                    skip_bg=skip_bg,
                )
            )
        )
        assert got == pytest.approx(want, rel=1e-5)

    def test_soft_dice_empty_class_quirk(self, ref, rng):
        """A class empty in BOTH pred and target: the eps/eps = 'dice 1'
        quirk (dice.py:24-27) must match the real code exactly."""
        from deepfluoro_tpu.ops.losses import per_sample_dice

        pred, tgt = self._rand_seg_pair(rng, b=2, c=4)
        # zero out class 3 everywhere in both
        pred = pred.clone()
        pred[:, 3] = 0.0
        tgt[:, 3] = 0.0
        want = float(ref.dice.DiceLoss2D(skip_bg=False)(pred, tgt))
        got = float(
            jnp.mean(
                per_sample_dice(
                    jnp.asarray(np.transpose(pred.numpy(), (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(tgt.numpy(), (0, 2, 3, 1))),
                    skip_bg=False,
                )
            )
        )
        assert got == pytest.approx(want, rel=1e-5)

    def test_ncc_2d(self, ref, rng):
        from deepfluoro_tpu.ops.losses import ncc_2d

        x = rng.standard_normal((3, 5, 16, 16)).astype(np.float32)
        y = rng.standard_normal((3, 5, 16, 16)).astype(np.float32)
        want = ref.ncc.ncc_2d(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        got = np.asarray(ncc_2d(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("heat_coeff", [0.5, 0.25])
    def test_joint_loss(self, ref, rng, heat_coeff):
        from deepfluoro_tpu.ops.losses import per_sample_joint

        pred, tgt = self._rand_seg_pair(rng, b=2, c=7, h=20, w=20)
        ph = rng.standard_normal((2, 4, 20, 20)).astype(np.float32)
        th = rng.random((2, 4, 20, 20)).astype(np.float32)
        want = float(
            ref.dice.DiceAndHeatMapLoss2D(skip_bg=False, heatmap_wgt=heat_coeff)(
                (pred, torch.from_numpy(ph)), (tgt, torch.from_numpy(th))
            )
        )
        got = float(
            jnp.mean(
                per_sample_joint(
                    jnp.asarray(np.transpose(pred.numpy(), (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(ph, (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(tgt.numpy(), (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(th, (0, 2, 3, 1))),
                    heat_coeff,
                )
            )
        )
        assert got == pytest.approx(want, rel=1e-5)


# --------------------------------------------------------------------------
# model: real unet.py forward as oracle (same checkpoint -> same outputs)
# --------------------------------------------------------------------------

def _flax_from_torch(ref_net, flax_kwargs, torch_cfg):
    """Build the flax UNet with ``flax_kwargs`` and fill its params from the
    real torch net's state dict. Handles 'upconv' through the production
    compat.torch_import path; 'upsample' (Sequential Upsample+Conv1x1, names
    up_path.k.up.1.*) is remapped here since no reference CLI/checkpoint can
    ever contain it (train.py exposes no --up-mode flag)."""
    from flax.core import freeze

    from deepfluoro_tpu.compat.torch_import import import_torch_state_dict
    from deepfluoro_tpu.models.unet import UNet as FlaxUNet
    from deepfluoro_tpu.train.config import TrainConfig

    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    if flax_kwargs.get("up_mode", "upconv") == "upsample":
        # rename up_path.k.up.1.* -> up_path.k.up.* so the shared converter
        # sees the conv; its kernel is a plain Conv (1x1), not ConvTranspose
        renamed = {}
        for k, v in sd.items():
            renamed[k.replace(".up.1.", ".up.")] = v
        sd = renamed

    cfg = TrainConfig(**torch_cfg)
    params, stats = import_torch_state_dict(sd, cfg)
    if flax_kwargs.get("up_mode", "upconv") == "upsample":
        # the converter imported the conv under the 'upconv' name and layout
        # (ConvTranspose: in/out axes swapped, spatial flip — identity for
        # 1x1); rebuild it as the plain 1x1 conv the flax 'upsample' path
        # names up_1x1
        for k in range(cfg.depth - 1):
            w = params[f"up_{k}"].pop("up_conv")
            params[f"up_{k}"]["up_1x1"] = {
                "kernel": np.transpose(w["kernel"][::-1, ::-1], (0, 1, 3, 2)),
                "bias": w["bias"],
            }

    model = FlaxUNet(n_classes=cfg.num_classes, depth=cfg.depth,
                     wf=cfg.init_feats_exp, padding=cfg.padding,
                     batch_norm=cfg.batch_norm, max_pool=not cfg.no_max_pool,
                     num_lands=cfg.num_lands, do_res=cfg.use_res,
                     block_depth=cfg.block_depth, **flax_kwargs)
    variables = {"params": freeze(params)}
    if stats:
        variables["batch_stats"] = freeze(stats)
    return model, variables


GOLDEN_NET_CONFIGS = [
    # (name, torch kwargs beyond defaults, flax extra kwargs, input hw)
    ("paper_style", dict(depth=3, wf=3, padding=True, batch_norm=True,
                         max_pool=False, num_lands=4, do_res=True,
                         block_depth=2), {}, 32),
    ("upsample", dict(depth=3, wf=3, padding=True, batch_norm=False,
                      max_pool=True, num_lands=0, do_res=True,
                      block_depth=2, up_mode="upsample"),
     {"up_mode": "upsample"}, 32),
    ("circular", dict(depth=2, wf=3, padding=True, batch_norm=False,
                      max_pool=True, num_lands=0, do_res=True,
                      block_depth=2, pad_mode="circular"),
     {"pad_mode": "circular"}, 32),
    # do_res=False: the REAL reference crashes for padding=False + do_res
    # (the 1x1 residual keeps the input size while valid convs shrink it,
    # unet.py:229-232), so no reference checkpoint can hold that combination
    ("valid_convs", dict(depth=2, wf=3, padding=False, batch_norm=False,
                         max_pool=True, num_lands=0, do_res=False,
                         block_depth=2), {}, 64),
]


class TestGoldenUNet:
    @pytest.mark.parametrize(
        "name,tkw,fkw,hw", GOLDEN_NET_CONFIGS, ids=[c[0] for c in GOLDEN_NET_CONFIGS]
    )
    def test_forward_parity(self, ref, rng, name, tkw, fkw, hw):
        import zlib

        # deterministic across processes — hash() is salted per interpreter,
        # which made the reference weights (and any tolerance-boundary
        # failure) unreproducible between runs
        torch.manual_seed(zlib.crc32(name.encode()) % (2**31))
        tkw = dict(tkw)
        up_mode = tkw.pop("up_mode", "upconv")
        pad_mode = tkw.pop("pad_mode", "zeros")
        net = ref.unet.UNet(
            in_channels=1, n_classes=7, up_mode=up_mode, pad_mode=pad_mode, **tkw
        )
        net.eval()

        torch_cfg = dict(
            num_classes=7, depth=tkw["depth"], init_feats_exp=tkw["wf"],
            padding=tkw["padding"], batch_norm=tkw["batch_norm"],
            no_max_pool=not tkw["max_pool"], num_lands=tkw["num_lands"],
            use_res=tkw["do_res"], block_depth=tkw["block_depth"],
        )
        model, variables = _flax_from_torch(net, fkw, torch_cfg)

        x = rng.standard_normal((2, 1, hw, hw)).astype(np.float32)
        with torch.no_grad():
            out_t = net(torch.from_numpy(x))
        out_f = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                            train=False)

        if tkw["num_lands"] > 0:
            seg_t, heats_t = out_t
            seg_f, heats_f = out_f
            np.testing.assert_allclose(
                np.transpose(np.asarray(heats_f), (0, 3, 1, 2)),
                heats_t.numpy(), atol=2e-4,
            )
        else:
            seg_t, seg_f = out_t, out_f
        seg_f = np.transpose(np.asarray(seg_f), (0, 3, 1, 2))
        np.testing.assert_allclose(seg_f, seg_t.numpy(), atol=1e-5)
        # the contract SURVEY §4(c) names: same checkpoint -> same argmax map
        np.testing.assert_array_equal(
            seg_f.argmax(axis=1), seg_t.numpy().argmax(axis=1)
        )


# --------------------------------------------------------------------------
# data: real dataset.py as oracle
# --------------------------------------------------------------------------

class TestGoldenDataset:
    def test_get_dataset_load_parity(self, ref, fixture_h5):
        """Real get_dataset (OOB->inf marking, one-hot encode, dataset.py
        :405-462) vs data.hdf5.load_dataset on the same archive."""
        from deepfluoro_tpu.data.hdf5 import load_dataset

        ds = ref.dataset.get_dataset(fixture_h5, [1, 2], num_classes=7)
        ours = load_dataset(fixture_h5, [1, 2])

        np.testing.assert_array_equal(ds.projs.numpy()[:, 0], ours.projs)
        onehot = np.eye(7, dtype=np.float32)[ours.segs]
        np.testing.assert_array_equal(
            ds.segs.numpy(), np.transpose(onehot, (0, 3, 1, 2))
        )
        # identical inf marking of out-of-bounds landmarks
        ref_lands = ds.lands.numpy()
        np.testing.assert_array_equal(
            np.isinf(ref_lands), np.isinf(ours.lands)
        )
        np.testing.assert_array_equal(
            np.nan_to_num(ref_lands, posinf=0), np.nan_to_num(ours.lands, posinf=0)
        )

    def test_get_dataset_minmax_parity(self, ref, fixture_h5):
        from deepfluoro_tpu.data.hdf5 import load_dataset

        ds = ref.dataset.get_dataset(fixture_h5, [1], num_classes=7, minmax=True)
        ours = load_dataset(fixture_h5, [1], minmax=True)
        np.testing.assert_allclose(ds.projs.numpy()[:, 0], ours.projs, atol=1e-7)

    def test_noaug_getitem_parity(self, ref, fixture_h5):
        """The real no-aug __getitem__ tail — reflect pad to proj_pad_dim,
        z-norm, on-the-fly Gaussian heatmap synthesis (dataset.py:287-326) —
        vs prepare_batch with prob_of_aug=0."""
        from deepfluoro_tpu.data import AugmentConfig, load_dataset, prepare_batch

        pad_dim = 40
        ds = ref.dataset.get_dataset(fixture_h5, [1], num_classes=7, pad_img_dim=pad_dim)
        ours = load_dataset(fixture_h5, [1])

        aug = AugmentConfig(num_classes=7, proj_pad_dim=pad_dim, prob_of_aug=0.0)
        prepared = prepare_batch(
            aug, jax.random.PRNGKey(0),
            jnp.asarray(ours.projs), jnp.asarray(ours.segs), jnp.asarray(ours.lands),
        )

        for i in range(min(3, len(ds))):
            p, s, lands, h = ds[i]
            np.testing.assert_allclose(
                np.asarray(prepared["proj"][i, :, :, 0]), p.numpy()[0], atol=2e-5
            )
            np.testing.assert_array_equal(
                np.transpose(np.asarray(prepared["seg"][i]), (2, 0, 1)), s.numpy()
            )
            np.testing.assert_allclose(
                np.transpose(np.asarray(prepared["heats"][i]), (2, 0, 1)),
                h.numpy()[:, 0], atol=1e-6,
            )

    def test_calc_pad_amount_parity(self, ref):
        from deepfluoro_tpu.ops.image import calc_pad_amount

        for padded in (33, 40, 192, 365):
            for cur in (7, 32, 180, 190):
                if padded > cur:
                    assert calc_pad_amount(padded, cur) == ref.dataset.calc_pad_amount(
                        padded, cur
                    )


class _ScriptedRandom:
    """Stands in for dataset.py's module-level ``random`` so the affine
    stage runs with chosen parameters (VERDICT r2 item 2: 'frozen RNG draws
    injected')."""

    def __init__(self, seq):
        self.seq = list(seq)

    def random(self):
        return self.seq.pop(0)

    def uniform(self, a, b):
        return self.seq.pop(0)

    def randint(self, a, b):  # pragma: no cover - erase disabled in tests
        raise AssertionError("unexpected randint draw")


class TestGoldenAffine:
    ROT, MAG, SHX, SHY, SCALE = -3.7, 0.55, 0.6, -0.8, 1.07

    def _run_reference_affine(self, ref, img, lands, pad_dim):
        """Drive the REAL __getitem__ through exactly the affine stage:
        aug gate on, invert/noise/gamma/erase off, scripted parameter
        draws. Returns (warped proj, warped seg, transformed lands,
        (trans_x, trans_y))."""
        h, w = img.shape
        seg = (img > img.mean()).astype(np.float32)
        projs = torch.from_numpy(img[None, None])
        segs = torch.from_numpy(np.stack([1.0 - seg, seg])[None])
        lands_t = torch.from_numpy(lands[None])

        ds = ref.dataset.RandomDataAugDataSet(
            projs, segs, lands_t, proj_pad_dim=pad_dim
        )
        ds.prob_of_aug = 1.0
        ds.do_invert = False
        ds.do_noise = False
        ds.do_gamma = False
        ds.do_affine = True
        ds.do_erase = False
        ds.do_norm_01_scale = False
        ds.include_heat_map = False

        # draw order (dataset.py:107-185): gate, [torch.randn direction],
        # magnitude, rot, shear_x, shear_y, scale
        scripted = _ScriptedRandom([0.0, self.MAG, self.ROT, self.SHX, self.SHY, self.SCALE])
        orig_random = ref.dataset.random
        ref.dataset.random = scripted
        torch.manual_seed(1234)
        expected_dir = torch.randn(2)
        expected_dir /= expected_dir.norm()
        trans = expected_dir * (self.MAG * 20)
        try:
            torch.manual_seed(1234)  # reproduce the direction draw inside
            p, s, l, _ = ds[0]
        finally:
            ref.dataset.random = orig_random
        assert not scripted.seq, "not all scripted draws consumed"
        return p.numpy()[0], s.numpy(), l.numpy(), (float(trans[0]), float(trans[1]))

    def test_affine_warp_parity(self, ref, rng):
        """The real PIL warp chain (pad-for-affine -> quantize -> PIL
        affine -> crop, dataset.py:150-225) vs ops.image.affine_warp with
        the equivalent matrix. Agreement within the uint8 quantization band
        the reference's PIL round-trip imposes."""
        from deepfluoro_tpu.ops.image import (
            affine_warp,
            calc_pad_amount,
            center_crop,
            inverse_affine_matrix,
        )

        h = w = 48
        pad_dim = 56
        # smooth image: quantization-band comparisons need bounded gradients
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = (np.sin(yy / 6.0) + np.cos(xx / 7.0) + 2.0) / 4.0
        lands = np.array([[10.0, 30.0], [20.0, 12.0]], dtype=np.float32)

        p_ref, s_ref, l_ref, (tx, ty) = self._run_reference_affine(
            ref, img, lands, pad_dim
        )

        # repo computation: reflect pad by ceil(dim/2) + extra_pad, warp
        # about the padded frame's PIL center, crop back to padded target
        extra = calc_pad_amount(pad_dim, h)
        pad1 = int(math.ceil(h / 2.0)) + extra
        pad2 = int(math.ceil(w / 2.0)) + extra
        padded = np.pad(img, ((pad1, pad1), (pad2, pad2)), "reflect")
        ph, pw = padded.shape
        m = inverse_affine_matrix(
            (pw * 0.5, ph * 0.5), self.ROT, (tx, ty), self.SCALE,
            (self.SHX, self.SHY),
        )
        warped = affine_warp(jnp.asarray(padded), m, order=1)
        p_ours = np.asarray(center_crop(warped, (h + 2 * extra, w + 2 * extra)))

        assert p_ref.shape == p_ours.shape
        # interior comparison (PIL fills moved-in borders with 0 from the
        # finite padded frame; the repo warps with mirror boundary)
        sl = slice(8, -8)
        np.testing.assert_allclose(p_ours[sl, sl], p_ref[sl, sl], atol=0.012)

        # landmark geometry: the real analytic transform (through the PIL
        # center convention) vs transform_landmarks
        from deepfluoro_tpu.ops.image import transform_landmarks

        m_l = inverse_affine_matrix(
            (w / 2.0 + 0.5, h / 2.0 + 0.5), self.ROT, (tx, ty), self.SCALE,
            (self.SHX, self.SHY),
        )
        l_ours = np.asarray(transform_landmarks(jnp.asarray(lands), m_l, (h, w)))
        finite = np.isfinite(l_ref) & np.isfinite(l_ours)
        assert finite.any(), "all landmarks OOB: the comparison is vacuous"
        np.testing.assert_allclose(l_ours[finite], l_ref[finite], atol=1e-3)

    def test_warped_blob_lands_on_transformed_landmark(self, ref):
        """Independent geometry oracle: a bright blob at a landmark must,
        after the REAL PIL warp, peak at the analytically transformed
        landmark position (+-1px) — pinning image-warp/landmark-transform
        consistency without trusting either matrix transcription."""
        h = w = 48
        blob_xy = (31.0, 14.0)  # (x=col, y=row)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.exp(-(((xx - blob_xy[0]) ** 2 + (yy - blob_xy[1]) ** 2) / 8.0))
        lands = np.array([[blob_xy[0]], [blob_xy[1]]], dtype=np.float32)

        p_ref, _, l_ref, _ = self._run_reference_affine(ref, img, lands, pad_dim=0)

        assert np.all(np.isfinite(l_ref))
        peak = np.unravel_index(np.argmax(p_ref), p_ref.shape)  # (row, col)
        # l_ref is (x, y) = (col, row) in the UNPADDED frame; p_ref is the
        # pad-for-affine crop back to the original shape
        assert abs(peak[1] - l_ref[0, 0]) <= 1.0
        assert abs(peak[0] - l_ref[1, 0]) <= 1.0

        # and the repo's transform agrees with the real one
        from deepfluoro_tpu.ops.image import inverse_affine_matrix, transform_landmarks

        # reproduce the scripted translation
        torch.manual_seed(1234)
        d = torch.randn(2)
        d /= d.norm()
        tx, ty = (d * (self.MAG * 20)).tolist()
        m = inverse_affine_matrix(
            (w / 2.0 + 0.5, h / 2.0 + 0.5), self.ROT, (tx, ty), self.SCALE,
            (self.SHX, self.SHY),
        )
        l_ours = np.asarray(transform_landmarks(jnp.asarray(lands), m, (h, w)))
        np.testing.assert_allclose(l_ours, l_ref, atol=1e-3)


# --------------------------------------------------------------------------
# LR schedules: real warm_restarts_lr.py / torch ReduceLROnPlateau as oracle
# --------------------------------------------------------------------------

class TestGoldenSchedules:
    def test_warm_restart_lr_sequence(self, ref):
        """Drive the REAL WarmRestartLR (warm_restarts_lr.py:14-63) attached
        to a torch SGD optimizer and this framework's host-side scheduler
        through 35 epochs x 4 intra-epoch fractional steps (the train-loop
        usage, train.py:427-428): every intra-epoch LR, every end-of-epoch
        LR, and every just_restarted flag must match. Covers the restart
        boundaries of the growing periods (3, 6, 12, 24 -> restarts after
        epochs 3, 9, 21)."""
        from deepfluoro_tpu.train.schedules import WarmRestartLR

        base_lr = 0.1
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base_lr)
        sched_t = ref.warm_restarts_lr.WarmRestartLR(
            opt, init_run_period_epochs=3, growth_factor=2
        )
        sched_j = WarmRestartLR(base_lr, init_run_period_epochs=3, growth_factor=2)

        steps_per_epoch = 4
        for epoch in range(35):
            for s in range(steps_per_epoch):
                ratio = s / steps_per_epoch
                sched_t.intra_epoch_step(ratio)
                lr_t = opt.param_groups[0]["lr"]
                lr_j = sched_j.intra_epoch_step(ratio)
                assert lr_j == pytest.approx(lr_t, abs=1e-12), (epoch, s)
            sched_t.step()
            sched_j.step()
            assert sched_j.just_restarted == sched_t.just_restarted, epoch
            assert sched_j.get_lr() == pytest.approx(
                sched_t.get_lr()[0], abs=1e-12
            ), epoch

    def test_plateau_lr_sequence(self, ref):
        """The plateau scheduler vs REAL torch.optim.lr_scheduler.
        ReduceLROnPlateau built exactly like the reference (train.py:339:
        mode='min', factor=0.1, configurable patience/cooldown, verbose) on
        a metric stream engineered to hit improvement, patience expiry,
        cooldown suppression, and a second decay."""
        from deepfluoro_tpu.train.schedules import ReduceLROnPlateau

        base_lr = 0.1
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base_lr)
        sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.1, patience=2, cooldown=2
        )
        sched_j = ReduceLROnPlateau(base_lr, factor=0.1, patience=2, cooldown=2)

        # improving, stuck past patience (decay), cooldown-masked stagnation,
        # stuck again (second decay), tiny sub-threshold "improvements"
        metrics = [1.0, 0.9, 0.8, 0.8, 0.8, 0.8, 0.8, 0.8, 0.8, 0.8, 0.8,
                   0.79999, 0.79998, 0.79997, 0.79996, 0.79995, 0.79994]
        for i, m in enumerate(metrics):
            sched_t.step(m)
            lr_j = sched_j.step(m)
            assert lr_j == pytest.approx(opt.param_groups[0]["lr"], abs=1e-15), i
