"""Camera and ray math.

Behavioral parity with the reference camera utilities (reference:
code/utils/rend_util.py:55-168 and the sign-safe projection at
code/model/networks/neat_wfr_rend_a.py:317-331), re-expressed as pure,
vmappable jnp functions with no device-placement side effects.

Conventions (inherited from the data contract):
  * ``uv`` is (x, y) pixel coordinates — x along image width (columns),
    y along height (rows);
  * ``pose`` is camera-to-world, either a 4x4 matrix or a 7-vector
    [quat(wxyz), translation];
  * ``intrinsics`` is a 3x3 (or 4x4, top-left used) pinhole K with optional
    skew K[0,1].
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixel coords at depth ``z`` to homogeneous camera coords.

    Skew-aware inverse of the pinhole projection (reference rend_util.py:95-108).
    x, y, z: (..., N); intrinsics: (..., 3+, 3+). Returns (..., N, 4).
    """
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    sk = intrinsics[..., 0, 1][..., None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalized quaternion (w, i, j, k) -> rotation matrix.

    q: (..., 4) -> (..., 3, 3). (reference rend_util.py:111-128)
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (qj**2 + qk**2),
            2 * (qj * qi - qk * qr),
            2 * (qi * qk + qr * qj),
            2 * (qj * qi + qk * qr),
            1 - 2 * (qi**2 + qk**2),
            2 * (qj * qk - qi * qr),
            2 * (qk * qi - qj * qr),
            2 * (qj * qk + qi * qr),
            1 - 2 * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def rot_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, i, j, k), w>0 branch.

    r: (..., 3, 3) -> (..., 4). (reference rend_util.py:131-149)
    """
    w = jnp.sqrt(1.0 + r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]) / 2.0
    x = (r[..., 2, 1] - r[..., 1, 2]) / (4 * w)
    y = (r[..., 0, 2] - r[..., 2, 0]) / (4 * w)
    z = (r[..., 1, 0] - r[..., 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)


def pose_to_matrix(pose: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize pose to (cam2world 4x4, cam_loc).

    Accepts a (..., 4, 4) matrix or a (..., 7) [quat, loc] vector
    (reference rend_util.py:56-64).
    """
    if pose.shape[-1] == 7:
        cam_loc = pose[..., 4:]
        rot = quat_to_rot(pose[..., :4])
        p = jnp.zeros((*pose.shape[:-1], 4, 4), dtype=pose.dtype)
        p = p.at[..., :3, :3].set(rot)
        p = p.at[..., :3, 3].set(cam_loc)
        p = p.at[..., 3, 3].set(1.0)
        return p, cam_loc
    return pose, pose[..., :3, 3]


def get_camera_params(
    uv: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coords -> world-space ray directions + camera origin.

    uv: (..., N, 2); pose: (..., 4, 4) or (..., 7); intrinsics (..., 3+, 3+).
    Returns (ray_dirs (..., N, 3), cam_loc (..., 3)).
    (reference rend_util.py:55-81)
    """
    p, cam_loc = pose_to_matrix(pose)
    x_cam = uv[..., 0]
    y_cam = uv[..., 1]
    z_cam = jnp.ones_like(x_cam)
    pix_cam = lift(x_cam, y_cam, z_cam, intrinsics)  # (..., N, 4)
    world = jnp.einsum("...ij,...nj->...ni", p, pix_cam)[..., :3]
    ray_dirs = world - cam_loc[..., None, :]
    if normalize:
        ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    return ray_dirs, cam_loc


def project2d(
    k: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray, points3d: jnp.ndarray
) -> jnp.ndarray:
    """Project world points to 2D with a sign-safe perspective division.

    k: (3, 3); r: (3, 3); t: (3, 1) or (3,); points3d: (..., 3) -> (..., 2).
    Zero-or-near-zero depths are nudged by +/-1e-8 with the sign of the
    denominator, matching reference neat_wfr_rend_a.py:317-331.
    """
    pts = points3d.reshape(-1, 3)
    t = t.reshape(3)
    x = (k @ (r @ pts.T + t[:, None])).T  # (M, 3)
    denom = x[:, -1:]
    sign = jnp.where(denom >= 0, 1.0, -1.0)
    eps = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, 0.0)
    x = x / (denom + eps * sign)
    return x[:, :2].reshape(*points3d.shape[:-1], 2)


def get_sphere_intersections(
    cam_loc: jnp.ndarray, ray_dirs: jnp.ndarray, radius: float = 1.0
) -> jnp.ndarray:
    """Near/far intersections of rays with the bounding sphere.

    cam_loc, ray_dirs: (N, 3). Returns (N, 2) clamped to >= 0.

    The reference hard-exits when a ray misses the sphere
    (rend_util.py:161-163); under jit we instead clamp the discriminant to 0,
    which collapses the interval to a point — callers relying on the miss
    behaviour should validate camera setups offline.
    """
    ray_cam_dot = jnp.sum(ray_dirs * cam_loc, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot**2 - (
        jnp.sum(cam_loc**2, axis=-1, keepdims=True) - radius**2
    )
    root = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    out = root * jnp.asarray([-1.0, 1.0], dtype=ray_dirs.dtype) - ray_cam_dot
    return jnp.maximum(out, 0.0)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, normalize_rgb: bool = False) -> jnp.ndarray:
    """Peak signal-to-noise ratio (reference rend_util.py:9-17)."""
    if normalize_rgb:
        img1 = (img1 + 1.0) / 2.0
        img2 = (img2 + 1.0) / 2.0
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def load_k_rt_from_p(p):
    """Decompose a 3x4 projection matrix P = K [R | t] -> (intrinsics 4x4, cam2world 4x4).

    numpy-level helper used at dataset-construction time (reference
    rend_util.py:31-52 via cv2.decomposeProjectionMatrix). Uses an RQ
    decomposition with positive-diagonal K.
    """
    import numpy as np

    p = np.asarray(p, dtype=np.float64)[:3, :4]
    k, r = _rq3(p[:, :3])
    # enforce positive diagonal of K
    sgn = np.diag(np.sign(np.diag(k)))
    k = k @ sgn
    r = sgn @ r
    if np.linalg.det(r) < 0:
        r = -r
        # camera centre from P: c = -M^-1 p4 is sign-invariant
    c = -np.linalg.solve(p[:, :3], p[:, 3])
    k = k / k[2, 2]

    intrinsics = np.eye(4)
    intrinsics[:3, :3] = k
    pose = np.eye(4)
    pose[:3, :3] = r.T
    pose[:3, 3] = c
    return intrinsics.astype(np.float32), pose.astype(np.float32)


def _rq3(a):
    """RQ decomposition of a 3x3 matrix via flipped QR."""
    import numpy as np

    # reverse rows, transpose -> QR -> undo
    a_flip = np.flipud(a).T
    q, r = np.linalg.qr(a_flip)
    r = np.flipud(r.T)
    r = r[:, ::-1]
    q = q.T
    q = np.flipud(q)
    return r, q
