"""Tests for the full-resolution preprocessing pipeline, examples overlays,
and projective geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepfluoro_tpu.data.fixtures import (
    DEFAULT_LAND_NAMES,
    write_synthetic_dataset,
    write_synthetic_fullres_dataset,
)
from deepfluoro_tpu.data.hdf5 import load_dataset
from deepfluoro_tpu.data.preprocess import (
    BORDER_CROP_PX,
    beer_lambert_log,
    full_res_to_preprocessed,
    preprocess_landmarks,
    preprocess_projection,
)
from deepfluoro_tpu.viz.projective import (
    focal_len_from_intrinsic,
    invert_rigid,
    pixel_index_to_detector_pt,
    vol_to_camera_xform,
)


@pytest.fixture(scope="module")
def fullres_h5(tmp_path_factory):
    p = tmp_path_factory.mktemp("fr") / "full.h5"
    return write_synthetic_fullres_dataset(str(p), num_specimens=1, num_projs=3, img_dim=148)


class TestBeerLambert:
    def test_inverts_attenuation(self, rng):
        mu = rng.random((16, 16)).astype(np.float32) + 0.1
        raw = np.exp(-mu)  # bone (high mu) is dark
        out = np.asarray(beer_lambert_log(jnp.asarray(raw)))
        # bone should now be bright: monotonically increasing with mu
        flat_mu, flat_out = mu.ravel(), out.ravel()
        order = np.argsort(flat_mu)
        assert (np.diff(flat_out[order]) > -1e-5).all()

    def test_max_maps_to_zero(self, rng):
        raw = rng.random((8, 8)).astype(np.float32) + 0.5
        out = np.asarray(beer_lambert_log(jnp.asarray(raw)))
        assert out.min() == pytest.approx(0.0, abs=1e-4)
        assert out[np.unravel_index(raw.argmax(), raw.shape)] == pytest.approx(0.0, abs=1e-4)


class TestPreprocessProjection:
    def test_crop_and_downsample_shape(self, rng):
        img = jnp.asarray(rng.random((148, 148)), jnp.float32)
        out = preprocess_projection(img, 2)
        assert out.shape == (24, 24)  # (148-100)/2

    def test_rot180(self, rng):
        img = np.zeros((148, 148), np.float32) + 1.0
        img[55, 60] = 5.0  # inside crop region; cropped coords (5, 10)
        out_no = np.asarray(preprocess_projection(jnp.asarray(img), 1, False, True))
        out_rot = np.asarray(preprocess_projection(jnp.asarray(img), 1, True, True))
        assert out_no[5, 10] == 5.0
        assert out_rot[48 - 1 - 5, 48 - 1 - 10] == 5.0

    def test_seg_stays_discrete(self, rng):
        seg = rng.integers(0, 7, (148, 148)).astype(np.float32)
        out = np.asarray(preprocess_projection(jnp.asarray(seg), 4, False, True))
        assert set(np.unique(out)) <= set(float(v) for v in range(7))


class TestPreprocessLandmarks:
    def test_crop_offset_and_scale(self):
        lands = np.array([[150.0], [250.0]])  # (x, y) full-res
        out = preprocess_landmarks(lands, (1536, 1536), 8, rot_180=False)
        # cropped: (100, 200); the landmark scale must equal the image
        # resize's actual scale out_dim/cropped_dim (1436//8=179 -> 179/1436),
        # not 1/8, so coords stay aligned with the resampled frame
        scale = (1436 // 8) / 1436
        assert out[0, 0] == pytest.approx((100 + 0.5) * scale - 0.5, abs=1e-4)
        assert out[1, 0] == pytest.approx((200 + 0.5) * scale - 0.5, abs=1e-4)

    def test_scale_matches_image_resize_nondivisible(self):
        """A landmark placed at a pixel peak must land on the same peak after
        image and landmark preprocessing, even when the cropped dim is not
        divisible by the factor (1336 @ 16x)."""
        import jax.numpy as jnp

        img = np.zeros((1436, 1436), np.float32)
        r, c = 700, 900  # full-res peak
        # blob wider than the 16x sampling stride so nearest sampling hits it
        img[r - 12 : r + 13, c - 12 : c + 13] = 1.0
        out_img = np.asarray(preprocess_projection(jnp.asarray(img), 16, False, True))
        pr, pc = np.unravel_index(out_img.argmax(), out_img.shape)

        lands = np.array([[float(c)], [float(r)]])
        out_l = preprocess_landmarks(lands, (1436, 1436), 16, rot_180=False)
        assert abs(out_l[0, 0] - pc) <= 1.0
        assert abs(out_l[1, 0] - pr) <= 1.0

    def test_rot180(self):
        lands = np.array([[150.0], [250.0]])
        out = preprocess_landmarks(lands, (1536, 1536), 1, rot_180=True)
        assert out[0, 0] == pytest.approx(1436 - 1 - 100)
        assert out[1, 0] == pytest.approx(1436 - 1 - 200)


class TestFullResConversion:
    def test_roundtrip_schema(self, fullres_h5, tmp_path):
        out = str(tmp_path / "pp.h5")
        full_res_to_preprocessed(fullres_h5, out, ds_factor=2)
        data = load_dataset(out, [1])
        assert data.projs.shape == (3, 24, 24)
        assert data.segs.shape == (3, 24, 24)
        assert data.lands.shape == (3, 2, 14)
        from deepfluoro_tpu.data.hdf5 import get_land_names_from_dataset

        # full-res gt-landmarks groups iterate alphabetically
        assert get_land_names_from_dataset(out) == sorted(DEFAULT_LAND_NAMES)

    def test_missing_landmark_yields_loadable_archive(self, fullres_h5, tmp_path):
        """A projection lacking one gt-landmark name must convert to a
        FINITE out-of-bounds sentinel: the loader asserts isfinite and marks
        OOB itself (regression: np.inf placeholders made the converted
        archive unloadable)."""
        import shutil

        import h5py as h5

        src = str(tmp_path / "fr_missing.h5")
        shutil.copy(fullres_h5, src)
        with h5.File(src, "r+") as f:
            spec = [k for k in f.keys() if k != "proj-params"][0]
            pg = f[spec]["projections"]
            pk = sorted(pg.keys())[1]
            name = sorted(pg[pk]["gt-landmarks"].keys())[0]
            del pg[pk]["gt-landmarks"][name]

        out = str(tmp_path / "pp_missing.h5")
        full_res_to_preprocessed(src, out, ds_factor=2)
        data = load_dataset(out, [1])  # must not trip the finite assertion
        li = sorted(DEFAULT_LAND_NAMES).index(name)
        assert np.all(np.isinf(data.lands[1, :, li]))  # marked out-of-view
        assert not np.any(np.isnan(data.lands))

    def test_bone_is_bright_after_log(self, fullres_h5, tmp_path):
        out = str(tmp_path / "pp2.h5")
        full_res_to_preprocessed(fullres_h5, out, ds_factor=2)
        data = load_dataset(out, [1])
        # synthetic raw frames are exp(-mu) with bone bright in mu; after the
        # log transform bone pixels (seg>0) should be brighter than bg
        for i in range(3):
            bone = data.projs[i][data.segs[i] > 0]
            bg = data.projs[i][data.segs[i] == 0]
            if bone.size and bg.size:
                assert bone.mean() > bg.mean()


class TestExamplesOverlays:
    def test_preproc_overlays(self, tmp_path):
        h5p = write_synthetic_dataset(str(tmp_path / "ds.h5"), num_specimens=2, num_projs=3, img_dim=32)
        from deepfluoro_tpu.viz.examples import make_preproc_overlays

        written = make_preproc_overlays(h5p, str(tmp_path))
        assert len(written) == 2
        import os

        assert all(os.path.getsize(p) > 0 for p in written)

    def test_full_res_overlays(self, fullres_h5, tmp_path):
        from deepfluoro_tpu.viz.examples import make_full_res_overlays

        written = make_full_res_overlays(fullres_h5, str(tmp_path), overlay_ds_factor=0.25)
        assert len(written) == 1


class TestProjectiveGeometry:
    def test_invert_rigid(self, rng):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.random((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        x = np.eye(4)
        x[:3, :3] = q
        x[:3, 3] = rng.random(3) * 10
        np.testing.assert_allclose(invert_rigid(x) @ x, np.eye(4), atol=1e-10)
        np.testing.assert_allclose(invert_rigid(x), np.linalg.inv(x), atol=1e-10)

    def test_focal_len(self):
        intr = np.array([[5000.0, 0, 768], [0, 5000.0, 768], [0, 0, 1]])
        assert focal_len_from_intrinsic(intr, 0.194) == pytest.approx(970.0)

    def test_focal_len_negative_diagonal(self):
        """X-ray intrinsics commonly carry negative focal terms; the signed
        sum is averaged before the magnitude (full_res_3d_viz.py:185)."""
        intr = np.array([[-5000.0, 0, 768], [0, -5000.0, 768], [0, 0, 1]])
        assert focal_len_from_intrinsic(intr, 0.194, 0.194) == pytest.approx(970.0)

    def test_principal_point_maps_to_axis(self):
        intr = np.array([[5000.0, 0, 768], [0, 5000.0, 768], [0, 0, 1]])
        pt = pixel_index_to_detector_pt((768, 768), intr, 0.194, 0.194)
        assert pt[0] == pytest.approx(0.0)
        assert pt[1] == pytest.approx(0.0)
        assert pt[2] == pytest.approx(-970.0)

    def test_detector_pt_matches_reference_formula(self):
        """pixel -> detector point must equal inv(K) @ [u,v,1] * -f
        (full_res_3d_viz.py:169-175), keeping the intrinsic's signs."""
        for fx in (5000.0, -5000.0):
            intr = np.array([[fx, 0, 768.0], [0, fx, 700.0], [0, 0, 1.0]])
            f = focal_len_from_intrinsic(intr, 0.194, 0.194)
            for uv in ((0, 0), (100, 1400), (1535, 1535)):
                expect = np.linalg.inv(intr) @ np.array([uv[0], uv[1], 1.0]) * -f
                got = pixel_index_to_detector_pt(uv, intr, 0.194, 0.194)
                np.testing.assert_allclose(got, expect, atol=1e-9)
        # a projected camera-frame point round-trips onto its detector ray:
        # the detector point, the source (origin) and the 3D point are
        # collinear
        intr = np.array([[-5000.0, 0, 768.0], [0, -5000.0, 700.0], [0, 0, 1.0]])
        p3 = np.array([37.0, -12.0, -600.0])
        proj = intr @ p3
        proj = proj / proj[2]
        det = pixel_index_to_detector_pt(proj[:2], intr, 0.194, 0.194)
        cross = np.cross(det, p3)
        np.testing.assert_allclose(cross / np.linalg.norm(p3), 0.0, atol=1e-9)

    def test_vol_to_camera_is_inverse(self, rng):
        q, _ = np.linalg.qr(rng.random((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        cam_to_vol = np.eye(4)
        cam_to_vol[:3, :3] = q
        cam_to_vol[:3, 3] = rng.random(3)
        np.testing.assert_allclose(
            vol_to_camera_xform(cam_to_vol) @ cam_to_vol, np.eye(4), atol=1e-10
        )

    def test_vol_to_camera_composes_extrinsic(self, rng):
        """Reference composes extrinsic @ inv(cam_to_vol)
        (full_res_3d_viz.py:215-217)."""
        from deepfluoro_tpu.viz.projective import invert_rigid

        def rand_rigid():
            q, _ = np.linalg.qr(rng.random((3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            x = np.eye(4)
            x[:3, :3] = q
            x[:3, 3] = rng.random(3) * 100
            return x

        cam_to_vol, extrinsic = rand_rigid(), rand_rigid()
        np.testing.assert_allclose(
            vol_to_camera_xform(cam_to_vol, extrinsic),
            extrinsic @ invert_rigid(cam_to_vol),
            atol=1e-10,
        )

    def test_index_to_physical_matrix(self):
        """ITK mapping: phys = dir_mat @ (spacing * idx) + origin
        (full_res_3d_viz.py:252-257)."""
        from deepfluoro_tpu.viz.projective import index_to_physical_matrix

        spacing = np.array([0.5, 0.7, 2.0])
        origin = np.array([-100.0, 20.0, 5.0])
        th = 0.3
        dir_mat = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]
        )
        m = index_to_physical_matrix(spacing, dir_mat, origin)
        idx = np.array([10.0, 20.0, 3.0])
        expect = dir_mat @ (spacing * idx) + origin
        np.testing.assert_allclose((m @ np.append(idx, 1.0))[:3], expect, atol=1e-12)

    def test_vtk_gated_error(self, fullres_h5):
        from deepfluoro_tpu.viz.projective import view_3d_scene

        with pytest.raises(ImportError, match="vtk"):
            view_3d_scene(fullres_h5, "17-1882")
