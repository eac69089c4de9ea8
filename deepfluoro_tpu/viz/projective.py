"""Projective-geometry utilities for the full-resolution archive, plus the
(VTK-gated) interactive 3D scene viewer.

Geometry math mirrors the reference example (examples_dataset/
full_res_3d_viz.py): focal length from the intrinsic diagonal scaled by the
pixel spacings (:185), mapping of homogeneous 2D pixel indices to 3D points
on the detector plane through the inverse intrinsic (:169-175), ground-truth
poses composed with the archive extrinsic into volume->camera-projective
transforms (:215-217), the ITK index->physical matrix from the label
volume's spacing/dir-mat/origin (:252-257), and rigid inversion (:130-138).
The camera frame convention is hdf5_layouts/Readme.md:81-93: origin at the
X-ray source, +Z orthogonal to the detector pointing at the source (the
detector plane sits at z = -focal_len).

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


def focal_len_from_intrinsic(
    intrinsic: np.ndarray,
    pixel_row_spacing: float,
    pixel_col_spacing: float | None = None,
) -> float:
    """Source-to-detector distance in mm:
    ``|K[0,0]*col_spacing + K[1,1]*row_spacing| / 2`` (full_res_3d_viz.py:185
    — the diagonal focal terms may legitimately be negative, so the signed
    sum is averaged before taking the magnitude). With one spacing argument
    it is used for both axes."""
    if pixel_col_spacing is None:
        pixel_col_spacing = pixel_row_spacing
    return float(
        abs(intrinsic[0, 0] * pixel_col_spacing + intrinsic[1, 1] * pixel_row_spacing)
        / 2.0
    )


def pixel_index_to_detector_pt(
    idx_xy,
    intrinsic: np.ndarray,
    pixel_row_spacing: float,
    pixel_col_spacing: float,
) -> np.ndarray:
    """Map a 2D pixel index (col, row) to its 3D point on the physical
    detector plane in the camera projective frame:
    ``inv(K) @ [col, row, 1] * -focal_len`` (full_res_3d_viz.py:169-175,
    187-193). This keeps the sign conventions of the stored intrinsic (whose
    focal terms may be negative) instead of assuming a positive-diagonal K."""
    focal = focal_len_from_intrinsic(intrinsic, pixel_row_spacing, pixel_col_spacing)
    h = np.array([float(idx_xy[0]), float(idx_xy[1]), 1.0])
    return np.linalg.inv(np.asarray(intrinsic, np.float64)) @ h * -focal


def vol_to_camera_xform(
    cam_to_vol: np.ndarray, extrinsic: np.ndarray | None = None
) -> np.ndarray:
    """GT poses map camera world frame -> volume frame
    (hdf5_layouts/Readme.md:56-60); points defined in volume coordinates
    move into the camera PROJECTIVE frame with
    ``extrinsic @ invert_rigid(cam_to_vol)`` (full_res_3d_viz.py:215-217).
    ``extrinsic`` is the archive's world->camera-projective rigid transform
    (proj-params/extrinsic); None means identity (world == projective)."""
    out = invert_rigid(cam_to_vol)
    if extrinsic is not None:
        out = np.asarray(extrinsic, np.float64) @ out
    return out


def index_to_physical_matrix(
    spacing: np.ndarray, dir_mat: np.ndarray, origin: np.ndarray
) -> np.ndarray:
    """ITK-style 4x4 mapping voxel indices (x, y, z order) to physical mm
    points: column c of the rotation is ``dir_mat[:, c] * spacing[c]``,
    translation is the origin (full_res_3d_viz.py:252-257; image group
    schema hdf5_layouts/Readme.md:20-28)."""
    m = np.eye(4)
    spacing = np.asarray(spacing, np.float64).ravel()
    dir_mat = np.asarray(dir_mat, np.float64)
    m[:3, :3] = dir_mat * spacing[None, :]
    m[:3, 3] = np.asarray(origin, np.float64).ravel()
    return m


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
    """Interactive VTK scene mirroring full_res_3d_viz.py:141-448: CT surface
    meshes in physical mm coordinates posed per body (hemipelves by the
    pelvis pose; each femur by its own pose), 3D landmarks in the camera
    frame, the X-ray source, in-view 2D landmarks on the detector plane with
    their projection rays, source-to-corner rays, and the textured detector
    plane. Requires the optional ``vtk`` package."""
    try:
        import vtk  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "3D visualization requires the optional 'vtk' package "
            "(pip install vtk); the projective-geometry math in this module "
            "works without it."
        ) from e

    import h5py as h5
    from vtk.util import numpy_support

    # -- read everything ------------------------------------------------
    with h5.File(h5_path, "r") as f:
        pp = f["proj-params"]
        extrinsic = np.asarray(pp["extrinsic"][:])
        intrinsic = np.asarray(pp["intrinsic"][:])
        row_sp = float(np.asarray(pp["pixel-row-spacing"][()]))
        col_sp = float(np.asarray(pp["pixel-col-spacing"][()]))
        num_cols = int(np.asarray(pp["num-cols"][()]))
        num_rows = int(np.asarray(pp["num-rows"][()]))

        sg = f[spec_id]
        seg_img = sg["vol-seg/image"]
        vol_seg = np.asarray(seg_img["pixels"][:])
        idx_to_phys = index_to_physical_matrix(
            np.asarray(seg_img["spacing"][:]),
            np.asarray(seg_img["dir-mat"][:]),
            np.asarray(seg_img["origin"][:]),
        )
        pg = sg["projections/{:03d}".format(proj_index)]
        proj_img = np.asarray(pg["image/pixels"][:], np.float32)
        poses = {
            name: np.asarray(pg["gt-poses/cam-to-{}-vol".format(name)][:])
            for name in ("pelvis", "left-femur", "right-femur")
        }
        lands_3d = {
            k: np.asarray(sg["vol-landmarks"][k][:]).ravel()[:3]
            for k in sg["vol-landmarks"]
        }
        lands_2d = {}
        if "gt-landmarks" in pg:
            for k in pg["gt-landmarks"]:
                l2 = np.asarray(pg["gt-landmarks"][k][:]).ravel()[:2]
                if 0 <= l2[0] < num_cols - 1 and 0 <= l2[1] < num_rows - 1:
                    lands_2d[k] = l2

    body_to_cam = {
        name: vol_to_camera_xform(pose, extrinsic) for name, pose in poses.items()
    }

    renderer = vtk.vtkRenderer()
    renderer.SetBackground(0.1, 0.1, 0.15)

    def as_vtk_mat(m):
        vm = vtk.vtkMatrix4x4()
        for i in range(4):
            for j in range(4):
                vm.SetElement(i, j, float(m[i, j]))
        return vm

    # numpy (z, y, x) raveled buffers enter VTK with a flipped y vertex
    # convention; the reference corrects it with diag(1,-1,1) + (ydim+1)
    # before mapping indices to physical points (full_res_3d_viz.py:70-76)
    y_flip = np.eye(4)
    y_flip[1, 1] = -1.0
    y_flip[1, 3] = vol_seg.shape[1] + 1

    def add_mesh(label, color, vol_to_cam):
        img = vtk.vtkImageData()
        dims = vol_seg.shape  # (z, y, x)
        img.SetDimensions(dims[2], dims[1], dims[0])
        arr = numpy_support.numpy_to_vtk(
            (vol_seg == label).astype(np.uint8).ravel(), deep=True
        )
        img.GetPointData().SetScalars(arr)
        # the reference flips the image along axis 1 BEFORE marching cubes
        # (full_res_3d_viz.py:84-89,120-123); that flip and the y_flip
        # vertex matrix below compose to ~identity (a 2-voxel y offset), so
        # omitting either one would mirror every mesh along y relative to
        # the landmarks/poses/detector in the same scene. NOTE: this path is
        # vtk-gated and has never executed here (vtk not installed); the
        # surrounding geometry is pinned by closed-form tests instead.
        flip = vtk.vtkImageFlip()
        flip.SetInputData(img)
        flip.SetFilteredAxis(1)
        flip.Update()
        mc = vtk.vtkMarchingCubes()
        mc.SetInputData(flip.GetOutput())
        mc.SetValue(0, 0.5)
        mapper = vtk.vtkPolyDataMapper()
        mapper.SetInputConnection(mc.GetOutputPort())
        mapper.ScalarVisibilityOff()
        actor = vtk.vtkActor()
        actor.SetMapper(mapper)
        actor.GetProperty().SetColor(*color)
        # voxel indices -> physical mm -> this body's camera-frame pose
        actor.SetUserMatrix(as_vtk_mat(vol_to_cam @ idx_to_phys @ y_flip))
        renderer.AddActor(actor)

    # reference body/color assignment (full_res_3d_viz.py:262-297): left
    # hemipelvis green, right red, left femur cyan, right femur orange;
    # femur labels carry their OWN ground-truth poses
    add_mesh(1, (0.0, 1.0, 0.0), body_to_cam["pelvis"])
    add_mesh(2, (1.0, 0.0, 0.0), body_to_cam["pelvis"])
    add_mesh(5, (0.0, 1.0, 1.0), body_to_cam["left-femur"])
    add_mesh(6, (1.0, 0.5, 0.0), body_to_cam["right-femur"])

    def add_sphere(pt, color, radius):
        s = vtk.vtkSphereSource()
        s.SetCenter(float(pt[0]), float(pt[1]), float(pt[2]))
        s.SetThetaResolution(20)
        s.SetPhiResolution(20)
        s.SetRadius(radius)
        mapper = vtk.vtkPolyDataMapper()
        mapper.SetInputConnection(s.GetOutputPort())
        a = vtk.vtkActor()
        a.SetMapper(mapper)
        a.GetProperty().SetColor(*color)
        renderer.AddActor(a)

    def add_line(p1, p2, color, width=2):
        line = vtk.vtkLineSource()
        line.SetPoint1(*[float(v) for v in p1])
        line.SetPoint2(*[float(v) for v in p2])
        mapper = vtk.vtkPolyDataMapper()
        mapper.SetInputConnection(line.GetOutputPort())
        a = vtk.vtkActor()
        a.SetMapper(mapper)
        a.GetProperty().SetColor(*color)
        a.GetProperty().SetLineWidth(width)
        renderer.AddActor(a)

    # 3D landmarks live in pelvis-volume coordinates -> camera frame
    lands_3d_cam = {
        k: (body_to_cam["pelvis"] @ np.append(pt, 1.0))[:3]
        for k, pt in lands_3d.items()
    }
    for pt in lands_3d_cam.values():
        add_sphere(pt, (0.5, 0.0, 0.5), 5.0)

    # the X-ray source sits at the camera-frame origin
    add_sphere((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 10.0)

    # in-view 2D landmarks on the detector plane, plus the ray through the
    # corresponding projected 3D landmark (they should align)
    for name, l2 in lands_2d.items():
        det_pt = pixel_index_to_detector_pt(l2, intrinsic, row_sp, col_sp)
        add_sphere(det_pt, (0.0, 1.0, 0.0), 2.5)
        if name in lands_3d_cam:
            proj = intrinsic @ lands_3d_cam[name]
            proj = proj / proj[2]
            add_line(
                (0, 0, 0),
                pixel_index_to_detector_pt(proj[:2], intrinsic, row_sp, col_sp),
                (0.0, 1.0, 0.0),
            )

    corners = [(0, 0), (num_cols - 1, 0), (num_cols - 1, num_rows - 1), (0, num_rows - 1)]
    rays = source_to_detector_rays(corners, intrinsic, row_sp, col_sp)
    for ray in rays:
        add_line(ray[0], ray[1], (0.8, 0.8, 0.8))

    # textured detector plane: the normalized projection draped over the
    # quad spanned by the corner detector points (full_res_3d_viz.py:354-403)
    p01 = proj_img - proj_img.min()
    denom = p01.max() if p01.max() > 0 else 1.0
    tex_pix = (255.0 * p01 / denom).astype(np.uint8)
    tex_img = vtk.vtkImageData()
    tex_img.SetDimensions(tex_pix.shape[1], tex_pix.shape[0], 1)
    tex_img.GetPointData().SetScalars(
        numpy_support.numpy_to_vtk(tex_pix.ravel(), deep=True)
    )
    texture = vtk.vtkTexture()
    texture.SetInputData(tex_img)

    points = vtk.vtkPoints()
    for c in corners:
        points.InsertNextPoint(*pixel_index_to_detector_pt(c, intrinsic, row_sp, col_sp))
    quad = vtk.vtkQuad()
    for i in range(4):
        quad.GetPointIds().SetId(i, i)
    cells = vtk.vtkCellArray()
    cells.InsertNextCell(quad)
    poly = vtk.vtkPolyData()
    poly.SetPoints(points)
    poly.SetPolys(cells)
    tcoords = vtk.vtkFloatArray()
    tcoords.SetNumberOfComponents(2)
    for uv in ((0, 0), (1, 0), (1, 1), (0, 1)):
        tcoords.InsertNextTuple2(*uv)
    poly.GetPointData().SetTCoords(tcoords)
    quad_mapper = vtk.vtkPolyDataMapper()
    quad_mapper.SetInputData(poly)
    quad_actor = vtk.vtkActor()
    quad_actor.SetMapper(quad_mapper)
    quad_actor.SetTexture(texture)
    renderer.AddActor(quad_actor)

    window = vtk.vtkRenderWindow()
    window.AddRenderer(renderer)
    window.SetSize(1024, 768)
    interactor = vtk.vtkRenderWindowInteractor()
    interactor.SetRenderWindow(window)
    window.Render()
    interactor.Start()
