"""COLMAP sparse-reconstruction loader (the standard real-world 3DGS input).

The reference renders pre-trained PLY scenes only (src/main/splat.cpp:132-150
loads a PLY and never sees posed images); the training extension needs the
format real capture pipelines produce: a COLMAP sparse model —
``cameras.bin/.txt`` (intrinsics), ``images.bin/.txt`` (per-view poses),
``points3D.bin/.txt`` (the SfM point cloud used to seed the gaussians).
This is a from-scratch parser of COLMAP's documented on-disk layout; both
the binary and text variants are supported.

COLMAP conventions (which are also the renderer's via
Camera.from_intrinsics): pixel intrinsics with (0, 0) the top-left corner,
camera looks down +z with y down, and the pose is world->camera as
``x_cam = R(q) @ x_world + t`` with quaternion (w, x, y, z).

Layout expected under the dataset root::

    root/sparse/0/{cameras,images,points3D}.{bin|txt}   (or root/sparse/)
    root/images/<image names from images.bin>
    root/images_{K}/...      # optional pre-downscaled copies, used when
                             # downscale=K and the directory exists
"""

from __future__ import annotations

import logging
import os
import struct
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from gaussian_splat_ipu_tpu.io.dataset import (FrameSet, _expand_channels,
                                               _load_image)
from gaussian_splat_ipu_tpu.models.camera import Camera

log = logging.getLogger(__name__)

# COLMAP camera model ids -> (name, num_params). Params always start with
# the pinhole block; trailing entries are distortion coefficients, which
# the pinhole renderer cannot apply (warned about once per load).
_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),   # f, cx, cy
    1: ("PINHOLE", 4),          # fx, fy, cx, cy
    2: ("SIMPLE_RADIAL", 4),    # f, cx, cy, k
    3: ("RADIAL", 5),           # f, cx, cy, k1, k2
    4: ("OPENCV", 8),           # fx, fy, cx, cy, k1, k2, p1, p2
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
_MODEL_IDS = {name: mid for mid, (name, _) in _CAMERA_MODELS.items()}


class ColmapCamera(NamedTuple):
    model: str
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    has_distortion: bool


class ColmapImage(NamedTuple):
    name: str
    qvec: np.ndarray     # (4,) w, x, y, z
    tvec: np.ndarray     # (3,)
    camera_id: int
    # SfM track observations in this view: pixel xy (K, 2) and the
    # point3D id each observes (K,), -1 entries filtered out. Loaded
    # only with with_points2d=True (sparse-depth supervision); empty
    # arrays otherwise.
    xys: np.ndarray = np.zeros((0, 2), np.float64)
    point3d_ids: np.ndarray = np.zeros((0,), np.int64)


def _pinhole(model: str, params: np.ndarray) -> ColmapCamera:
    """Extract the pinhole block from any COLMAP model's param vector."""
    if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
                 "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE"):
        f, cx, cy = params[0], params[1], params[2]
        fx = fy = f
        dist = params[3:]
    else:  # PINHOLE / OPENCV family / FOV: fx fy cx cy [dist...]
        fx, fy, cx, cy = params[0], params[1], params[2], params[3]
        dist = params[4:]
    return ColmapCamera(model, 0, 0, float(fx), float(fy), float(cx),
                        float(cy), bool(np.any(np.abs(dist) > 1e-12)))


# -- binary readers ----------------------------------------------------------
# Record layouts follow COLMAP's documented binary format: little-endian,
# uint64 counts, NUL-terminated names, fixed-width per-record fields.

def _read(f, fmt: str):
    size = struct.calcsize("<" + fmt)     # "<" also disables native padding
    data = f.read(size)
    if len(data) != size:
        raise EOFError("truncated COLMAP binary file")
    return struct.unpack("<" + fmt, data)


def read_cameras_binary(path: str) -> Dict[int, ColmapCamera]:
    cams: Dict[int, ColmapCamera] = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, "iiQQ")
            name, n_params = _CAMERA_MODELS[model_id]
            params = np.array(_read(f, "d" * n_params))
            c = _pinhole(name, params)
            cams[cam_id] = c._replace(width=int(width), height=int(height))
    return cams


def read_images_binary(path: str,
                       with_points2d: bool = False
                       ) -> Dict[int, ColmapImage]:
    images: Dict[int, ColmapImage] = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            vals = _read(f, "idddddddi")
            image_id, camera_id = vals[0], vals[8]
            qvec = np.array(vals[1:5], np.float64)
            tvec = np.array(vals[5:8], np.float64)
            chars = bytearray()
            while True:
                (c,) = _read(f, "c")
                if c == b"\x00":
                    break
                chars += c
            (num_pts,) = _read(f, "Q")
            if with_points2d and num_pts:
                rec = np.frombuffer(f.read(24 * num_pts),
                                    dtype=[("xy", "<f8", 2),
                                           ("pid", "<i8")])
                keep = rec["pid"] >= 0        # -1 = untriangulated
                xys, pids = rec["xy"][keep], rec["pid"][keep]
            else:
                f.seek(24 * num_pts, os.SEEK_CUR)  # (x, y, point3D_id)
                xys = np.zeros((0, 2), np.float64)
                pids = np.zeros((0,), np.int64)
            images[image_id] = ColmapImage(chars.decode("utf-8"), qvec,
                                           tvec, camera_id, xys, pids)
    return images


def read_points3d_binary(path: str
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (xyz (N, 3) f32, rgb (N, 3) f32 in [0, 1], ids (N,) i64)."""
    xyzs, rgbs, ids = [], [], []
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            vals = _read(f, "qdddBBBd")
            ids.append(vals[0])
            xyzs.append(vals[1:4])
            rgbs.append(vals[4:7])
            (track_len,) = _read(f, "Q")
            f.seek(8 * track_len, os.SEEK_CUR)   # (image_id, point2D_idx)
    xyz = np.asarray(xyzs, np.float32).reshape(-1, 3)
    rgb = np.asarray(rgbs, np.float32).reshape(-1, 3) / 255.0
    return xyz, rgb, np.asarray(ids, np.int64)


# -- text readers ------------------------------------------------------------

def _data_lines(path: str):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def read_cameras_text(path: str) -> Dict[int, ColmapCamera]:
    cams: Dict[int, ColmapCamera] = {}
    for line in _data_lines(path):
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        width, height = int(parts[2]), int(parts[3])
        params = np.array([float(p) for p in parts[4:]])
        if model not in _MODEL_IDS:
            raise ValueError(f"{path}: unknown camera model {model!r}")
        c = _pinhole(model, params)
        cams[cam_id] = c._replace(width=width, height=height)
    return cams


def read_images_text(path: str,
                     with_points2d: bool = False) -> Dict[int, ColmapImage]:
    images: Dict[int, ColmapImage] = {}
    pose_line = True
    image_id = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("#"):
                continue            # comments don't consume a slot...
            if pose_line:
                if not line:
                    continue        # ...nor do blanks between records
                parts = line.split()
                image_id = int(parts[0])
                qvec = np.array([float(v) for v in parts[1:5]])
                tvec = np.array([float(v) for v in parts[5:8]])
                images[image_id] = ColmapImage(parts[9], qvec, tvec,
                                               int(parts[8]))
            elif with_points2d and line:
                # Triplets "x y point3D_id"; -1 = untriangulated.
                vals = np.array(line.split(), np.float64).reshape(-1, 3)
                keep = vals[:, 2] >= 0
                images[image_id] = images[image_id]._replace(
                    xys=vals[keep, :2],
                    point3d_ids=vals[keep, 2].astype(np.int64))
            # The 2D-point line (possibly empty) always follows a pose.
            pose_line = not pose_line
    return images


def read_points3d_text(path: str
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    xyzs, rgbs, ids = [], [], []
    for line in _data_lines(path):
        parts = line.split()
        ids.append(int(parts[0]))
        xyzs.append([float(v) for v in parts[1:4]])
        rgbs.append([float(v) for v in parts[4:7]])
    xyz = np.asarray(xyzs, np.float32).reshape(-1, 3)
    rgb = np.asarray(rgbs, np.float32).reshape(-1, 3) / 255.0
    return xyz, rgb, np.asarray(ids, np.int64)


# -- model assembly -----------------------------------------------------------

def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def find_sparse_dir(root: str) -> str:
    """Locate the sparse model dir: root itself, root/sparse/0, root/sparse."""
    for cand in (root, os.path.join(root, "sparse", "0"),
                 os.path.join(root, "sparse")):
        for ext in (".bin", ".txt"):
            if os.path.exists(os.path.join(cand, "cameras" + ext)):
                return cand
    raise FileNotFoundError(f"no COLMAP cameras.bin/.txt under {root}")


def is_colmap_dir(root: str) -> bool:
    try:
        find_sparse_dir(root)
        return True
    except FileNotFoundError:
        return False


def read_model(sparse_dir: str, with_points2d: bool = False):
    """Read (cameras, images, points_xyz, points_rgb, point_ids),
    binary preferred."""
    def pick(stem):
        for ext in (".bin", ".txt"):
            p = os.path.join(sparse_dir, stem + ext)
            if os.path.exists(p):
                return p, ext
        raise FileNotFoundError(f"{sparse_dir}/{stem}.bin|.txt")

    cam_path, cam_ext = pick("cameras")
    img_path, img_ext = pick("images")
    cams = (read_cameras_binary if cam_ext == ".bin"
            else read_cameras_text)(cam_path)
    imgs = (read_images_binary if img_ext == ".bin"
            else read_images_text)(img_path, with_points2d=with_points2d)
    try:
        pts_path, pts_ext = pick("points3D")
        xyz, rgb, pids = (read_points3d_binary if pts_ext == ".bin"
                          else read_points3d_text)(pts_path)
    except FileNotFoundError:
        xyz = np.zeros((0, 3), np.float32)
        rgb = np.zeros((0, 3), np.float32)
        pids = np.zeros((0,), np.int64)
    return cams, imgs, xyz, rgb, pids


def load_colmap(root: str, downscale: int = 1,
                max_frames: Optional[int] = None,
                near: float = 0.01, far: float = 1000.0,
                images_dir: Optional[str] = None,
                with_depth: bool = False):
    """Load a COLMAP dataset -> (FrameSet, sfm_xyz, sfm_rgb).

    `root` is the capture directory (containing sparse/ + images/) or the
    sparse model directory itself. When ``downscale > 1`` and a
    pre-downscaled ``images_{downscale}/`` directory exists it is used
    as-is (the common 3DGS dataset convention); otherwise full-resolution
    images are resized in the loader.

    with_depth=True additionally returns, as a 4th value, one (K_i, 3)
    f32 array per frame of sparse SfM depth observations
    ``[u_px, v_px, z_cam]`` — each triangulated track this view observes,
    at the DECODED image resolution — for depth-supervised training
    (train/depth.py).
    """
    root = os.path.abspath(root)
    sparse = find_sparse_dir(root)
    if sparse == root and not os.path.isdir(os.path.join(root, "images")):
        # root IS the sparse model dir with no images/ of its own; the
        # capture root is its parent, or grandparent for sparse/0.
        parent = os.path.dirname(root)
        capture_root = (os.path.dirname(parent)
                        if os.path.basename(parent) == "sparse" else parent)
    else:
        capture_root = root

    cams, imgs, xyz, rgb, pids = read_model(sparse,
                                            with_points2d=with_depth)
    if with_depth and len(pids) == 0:
        # points3D file missing/empty: no depths to look up even if the
        # images record track ids. Degrade to empty observations.
        log.warning("with_depth: %s has no points3D — depth "
                    "observations will be empty", sparse)
        imgs = {k: im._replace(xys=np.zeros((0, 2)),
                               point3d_ids=np.zeros((0,), np.int64))
                for k, im in imgs.items()}
    if with_depth:
        # point3D id -> row index (ids are sparse and unordered).
        sort_idx = np.argsort(pids)
        pids_sorted = pids[sort_idx]

    resize = downscale
    if images_dir is None:
        images_dir = os.path.join(capture_root, "images")
        if downscale > 1:
            pre = os.path.join(capture_root, f"images_{downscale}")
            if os.path.isdir(pre):
                images_dir, resize = pre, 1
    if not os.path.isdir(images_dir):
        raise FileNotFoundError(f"image directory {images_dir} not found")

    order = sorted(imgs.values(), key=lambda im: im.name)
    if max_frames is not None:
        order = order[:max_frames]

    warned_distortion = False
    paths = [os.path.join(images_dir, im.name) for im in order]

    # Prefetch through the native worker pool when available (same path as
    # io/dataset.py); per-file PIL fallback covers rejects.
    prefetch = jobs = None
    try:
        from gaussian_splat_ipu_tpu.io.native import ImagePrefetcher
        prefetch = ImagePrefetcher()
        jobs = [prefetch.submit(p, resize) for p in paths]
    except (RuntimeError, OSError):
        prefetch = None

    cameras: List[Camera] = []
    images: List[np.ndarray] = []
    depth_obs: List[np.ndarray] = []
    width = height = None
    for k, im in enumerate(order):
        got = prefetch.fetch(jobs[k]) if prefetch is not None else None
        if got is not None:
            arr, _ = got
            arr = _expand_channels(arr)
        else:
            arr, _ = _load_image(paths[k], resize)
        h, w = arr.shape[:2]
        if width is None:
            width, height = w, h
        elif (w, h) != (width, height):
            # Training stacks targets into one (F, H, W, C) array; fail
            # here with a clear message instead of a shape error deep in
            # JAX (multi-camera rigs with mixed resolutions: crop or
            # resize the capture first).
            raise ValueError(
                f"mixed image resolutions in COLMAP capture: {im.name} "
                f"is {w}x{h}, first image was {width}x{height}")

        cam = cams[im.camera_id]
        if cam.has_distortion and not warned_distortion:
            log.warning("COLMAP model %s has distortion coefficients; the "
                        "pinhole renderer ignores them (undistort the "
                        "capture for exact reprojection)", cam.model)
            warned_distortion = True
        # Intrinsics are calibrated at cam.width x cam.height; scale to the
        # decoded resolution (covers both pre-downscaled image dirs and
        # loader resizing).
        sx, sy = w / cam.width, h / cam.height

        w2c = np.eye(4, dtype=np.float64)
        w2c[:3, :3] = qvec_to_rotmat(im.qvec)
        w2c[:3, 3] = im.tvec
        cameras.append(Camera.from_intrinsics(
            cam.fx * sx, cam.fy * sy, cam.cx * sx, cam.cy * sy, w, h,
            w2c.astype(np.float32), near, far))
        images.append(arr)

        if with_depth:
            # Depth of each observed track in this view: z of
            # R @ X + t (OpenCV camera, +z forward). Pixel xy scales
            # with the decoded resolution like the intrinsics.
            rows = np.searchsorted(pids_sorted, im.point3d_ids)
            valid = ((rows < len(pids_sorted))
                     & (pids_sorted[np.minimum(rows,
                                               len(pids_sorted) - 1)]
                        == im.point3d_ids))
            rows = sort_idx[rows[valid]]
            pts = xyz[rows].astype(np.float64)
            z = (pts @ w2c[2, :3]) + w2c[2, 3]
            uv = im.xys[valid] * np.array([sx, sy])
            infront = z > near
            depth_obs.append(np.concatenate(
                [uv[infront], z[infront, None]],
                axis=1).astype(np.float32))

    if prefetch is not None:
        prefetch.close()
    if not cameras:
        raise ValueError(f"{root}: COLMAP model contains no images")
    fs = FrameSet(cameras=cameras, images=images, width=width,
                  height=height)
    if with_depth:
        return fs, xyz, rgb, depth_obs
    return fs, xyz, rgb
