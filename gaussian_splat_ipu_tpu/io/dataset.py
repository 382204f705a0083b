"""Multi-view training datasets: NeRF-synthetic / nerfstudio transforms.json.

The reference renders pre-trained PLY scenes and has no dataset concept at
all; the training extension (train/) needs posed images. This loader reads
the de-facto standard `transforms.json` layouts:

  * Blender / NeRF-synthetic: `camera_angle_x` + per-frame
    `transform_matrix` (a camera-to-world in the OpenGL convention:
    camera looks down -z, y up), images alongside the json.
  * nerfstudio: per-file `fl_x/fl_y/cx/cy/w/h` intrinsics (OpenCV pixels)
    + the same OpenGL c2w `transform_matrix`.

Cameras are converted once to the renderer's convention via
Camera.from_intrinsics (models/camera.py): flip the y/z axes of the c2w
(OpenGL cam axes -> OpenCV cam axes), invert, and hand over with pixel
intrinsics. Images load top-row-first (PIL order), matching the rendered
array orientation, as float32 in [0, 1].
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera

# OpenGL camera axes (x right, y up, z backward) -> OpenCV camera axes
# (x right, y down, z forward): negate the y and z basis vectors.
_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


@dataclasses.dataclass
class FrameSet:
    """Posed images ready for train/ (lists indexed by frame)."""

    cameras: List[Camera]
    images: List[np.ndarray]          # (H, W, C) f32 in [0, 1], C in {3, 4}
    width: int
    height: int

    def __len__(self) -> int:
        return len(self.cameras)

    def stacked(self):
        """(cams_pytree_stacked, images (F, H, W, C)) for view-batch
        training (parallel/distributed.py::make_view_batch_train_step)."""
        import jax
        import jax.numpy as jnp
        cams = jax.tree.map(lambda *xs: jnp.stack(xs), *self.cameras)
        return cams, jnp.stack([jnp.asarray(im) for im in self.images])


def _load_image(path: str, downscale: int):
    """Returns (array f32 [0,1], original (W0, H0) before any resize)."""
    from PIL import Image

    img = Image.open(path)
    orig = (img.width, img.height)
    if downscale > 1:
        img = img.resize((img.width // downscale, img.height // downscale),
                         Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    arr = _expand_channels(arr)
    return arr, orig


def _expand_channels(arr: np.ndarray) -> np.ndarray:
    """Normalise decoded channel counts to the FrameSet contract
    C in {3, 4}: grayscale -> RGB, gray+alpha (PNG color type 4) ->
    RGBA."""
    c = arr.shape[-1]
    if c == 1:
        return np.repeat(arr, 3, axis=-1)
    if c == 2:
        return np.concatenate(
            [np.repeat(arr[..., :1], 3, axis=-1), arr[..., 1:]], axis=-1)
    return arr


def load_transforms(path: str, downscale: int = 1,
                    max_frames: Optional[int] = None,
                    near: float = 0.01, far: float = 1000.0) -> FrameSet:
    """Load a transforms.json dataset (file path or its directory)."""
    if os.path.isdir(path):
        for name in ("transforms.json", "transforms_train.json"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no transforms*.json under {path}")
    root = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        meta = json.load(f)

    frames = meta["frames"]
    if max_frames is not None:
        frames = frames[:max_frames]
    if not frames:
        raise ValueError(f"{path}: no frames")

    paths = []
    for fr in frames:
        img_path = os.path.join(root, fr["file_path"])
        if not os.path.splitext(img_path)[1]:
            img_path += ".png"              # blender style bare stems
        paths.append(img_path)

    # Prefetch: the native worker pool (csrc/dataloader.cpp) decodes PNGs
    # concurrently while this loop consumes them in order; per-file
    # fallback to PIL covers anything the native decoder rejects.
    prefetch = None
    jobs = None
    try:
        from gaussian_splat_ipu_tpu.io.native import ImagePrefetcher
        prefetch = ImagePrefetcher()
        jobs = [prefetch.submit(p, downscale) for p in paths]
    except (RuntimeError, OSError):
        prefetch = None

    cameras, images = [], []
    width = height = None
    for k, fr in enumerate(frames):
        img_path = paths[k]
        got = prefetch.fetch(jobs[k]) if prefetch is not None else None
        if got is not None:
            img, (w0, h0) = got
            img = _expand_channels(img)
        else:
            img, (w0, h0) = _load_image(img_path, downscale)
        h, w = img.shape[:2]
        if width is None:
            width, height = w, h

        # Intrinsics: nerfstudio per-file/per-frame fields, else the
        # blender camera_angle_x (horizontal fov, square pixels).
        def field(name, default=None):
            return fr.get(name, meta.get(name, default))

        if field("fl_x") is not None:
            # Scale by the ACTUAL resize ratio, not 1/downscale: the
            # resize floors dimensions, and for non-divisible sizes the
            # exact ratio differs by up to half a pixel of calibration.
            sx, sy = w / w0, h / h0
            fx = field("fl_x") * sx
            fy = field("fl_y", field("fl_x")) * sy
            cx = field("cx", w0 * 0.5) * sx
            cy = field("cy", h0 * 0.5) * sy
        else:
            cax = float(meta["camera_angle_x"])
            fx = fy = 0.5 * w / np.tan(0.5 * cax)
            cx, cy = w * 0.5, h * 0.5

        c2w = np.asarray(fr["transform_matrix"], np.float32)
        w2c_cv = np.linalg.inv(c2w @ _GL_TO_CV)
        cameras.append(Camera.from_intrinsics(fx, fy, cx, cy, w, h,
                                              w2c_cv, near, far))
        images.append(img)

    if prefetch is not None:
        prefetch.close()
    return FrameSet(cameras=cameras, images=images, width=width,
                    height=height)
