"""Ground-truth optical flow from camera matrices + depth, on device.

The exact-geometry flow synthesis the reference performs per-pixel in numpy
(``/root/reference/src/airsim_optical_flow.py:12-107``): unproject each pixel
of frame i+1 to world space along the camera ray scaled by depth, subtract the
moving target's world displacement inside its segmentation mask, reproject
into frame i, and take the screen-space difference.

Implemented as batched 4x4 homogeneous transforms (einsum -> MXU) over the
whole image at once.

Indexing/sampling notes (differences from the reference, by design):
* The reference writes ``image_%05d.flo`` for pair (states[i-1], states[i])
  starting at i=0, which wraps to the LAST state for the first file — we
  write pair (i, i+1) at index i instead, matching how the flow is actually
  consumed (frame pair (i, i+1) drives detection of frame i).
* The reference samples the flow at the SECOND frame's pixels (it unprojects
  frame-2 pixels and walks the moving target backwards); our kernels
  (Farneback/RAFT) report flow at the FIRST frame's pixels, so this module
  unprojects frame i's pixels with frame i's depth, advances the moving
  target forward by its displacement, and reprojects into camera i+1 — the
  forward-sampled field the rest of the pipeline expects.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _apply_mat4(mat: jax.Array, vec4: jax.Array) -> jax.Array:
    """(4,4) x (..., 4) homogeneous transform."""
    return jnp.einsum("ij,...j->...i", mat, vec4)


def world_to_screen(view_proj: jax.Array, screen_res: Tuple[int, int],
                    world_pos: jax.Array) -> jax.Array:
    """World (..., 3) -> screen pixels (..., 2) through a UE4-style VP matrix."""
    ones = jnp.ones(world_pos.shape[:-1] + (1,), world_pos.dtype)
    pos = _apply_mat4(view_proj, jnp.concatenate([world_pos, ones], axis=-1))
    rhw = 1.0 / pos[..., 3]
    ndc_x = pos[..., 0] * rhw
    ndc_y = pos[..., 1] * rhw
    sx = (ndc_x * 0.5 + 0.5) * screen_res[0]
    sy = (-ndc_y * 0.5 + 0.5) * screen_res[1]
    return jnp.stack([sx, sy], axis=-1)


def screen_to_world(view_proj_inv: jax.Array, screen_res: Tuple[int, int],
                    screen_pos: jax.Array, depth: jax.Array) -> jax.Array:
    """Screen pixels + metric depth -> world positions via two unprojected
    points per pixel defining the camera ray (UE4 deprojection scheme)."""
    nx = screen_pos[..., 0] / screen_res[0]
    ny = screen_pos[..., 1] / screen_res[1]
    sx = 2.0 * (nx - 0.5)
    sy = 2.0 * ((1.0 - ny) - 0.5)

    def unproject(z: float) -> jax.Array:
        p = jnp.stack([sx, sy, jnp.full_like(sx, z), jnp.ones_like(sx)], axis=-1)
        h = _apply_mat4(view_proj_inv, p)
        return h[..., :3] / h[..., 3:4]

    ray_start = unproject(1.0)
    ray_end = unproject(0.5)
    direction = ray_end - ray_start
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return ray_start + direction * depth[..., None]


@jax.jit
def calculate_flow(view_proj1: jax.Array, view_proj2: jax.Array,
                   screen_res: Tuple[int, int], depth: jax.Array,
                   drone_displacement: jax.Array,
                   segmentation: jax.Array) -> jax.Array:
    """Flow (h, w, 2) for pair (frame1, frame2), sampled at frame1's pixels.

    Unprojects every frame-1 pixel through ``view_proj1`` scaled by frame-1
    ``depth`` (Euclidean, same units as world space — the caller pre-scales
    AirSim meters to UE4 centimeters), advances the moving target's world
    points by ``drone_displacement`` where ``segmentation`` > 0, reprojects
    through ``view_proj2``, and differences in screen space.
    """
    h, w = depth.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    pixels = jnp.stack([xs, ys], axis=-1)

    world = screen_to_world(jnp.linalg.inv(view_proj1), screen_res, pixels, depth)
    moving = (segmentation > 0)[..., None]
    world = world + moving * drone_displacement[None, None, :]
    screen2 = world_to_screen(view_proj2, screen_res, world)
    return screen2 - pixels


def parse_view_proj(state: Dict[str, Any]) -> np.ndarray:
    """UE4 dumps the matrix as a bracketed row-major string of the TRANSPOSED
    (row-vector convention) matrix; whitespace-split (robust to the double
    spaces bracket removal leaves behind) and transpose back."""
    s = state["Drone1"]["ue4"]["viewProjectionMatrix"]
    values = [float(x) for x in s.replace("[", " ").replace("]", " ").split()]
    return np.array(values).reshape(4, 4).T


def pinhole_view_proj(position: np.ndarray, yaw: float, focal: float,
                      screen_res: Tuple[int, int],
                      near: float = 1.0) -> np.ndarray:
    """UE4-style view-projection matrix for a yaw-only NED pinhole camera.

    The camera looks along body +x (world heading ``yaw``), +z down; the
    matrix maps world homogeneous points to clip space such that
    ``world_to_screen`` reproduces ``px = W/2 + f*right/fwd``,
    ``py = H/2 - f*up/fwd`` — the same projection ``MockSimClient`` renders
    with, so mock captures, depths, and matrices are mutually consistent.
    Reversed-Z row (clip_z = near, clip_w = fwd) keeps the matrix invertible
    and puts ``screen_to_world``'s z=1.0 unprojection ~``near`` units from
    the camera (UE4's deprojection scheme, reference
    ``airsim_optical_flow.py:41-75``).
    """
    w, h = screen_res
    cy, sy = np.cos(yaw), np.sin(yaw)
    fwd = np.array([cy, sy, 0.0])
    right = np.array([-sy, cy, 0.0])
    up = np.array([0.0, 0.0, -1.0])
    view = np.eye(4)
    for row, axis in enumerate((right, up, fwd)):
        view[row, :3] = axis
        view[row, 3] = -float(axis @ position)
    proj = np.array([
        [2.0 * focal / w, 0.0, 0.0, 0.0],
        [0.0, 2.0 * focal / h, 0.0, 0.0],
        [0.0, 0.0, 0.0, near],
        [0.0, 0.0, 1.0, 0.0],
    ])
    return proj @ view


def format_view_proj(vp: np.ndarray) -> str:
    """Serialize to the UE4 string format ``parse_view_proj`` reads (the
    transpose, bracketed rows)."""
    rows = [" ".join(f"{v:.9g}" for v in row) for row in np.asarray(vp).T]
    return " ".join(f"[{r}]" for r in rows)


def write_sequence_gt_flow(dataset) -> None:
    """Generate GT flow files for every consecutive state pair of a SimDataset."""
    from mav_detection_tpu.core.flo import write_flow
    from mav_detection_tpu.data.dataset import imread, imwrite, read_pfm
    from mav_detection_tpu.ops.image import flow_to_color

    states = dataset.get_state_filenames()
    res = dataset.capture_size

    for i in range(len(states) - 1):
        with open(states[i]) as f:
            s1 = json.load(f)
        with open(states[i + 1]) as f:
            s2 = json.load(f)
        vp1 = parse_view_proj(s1)
        vp2 = parse_view_proj(s2)
        dt = dataset.get_delta_time(i + 1)
        vel = s1["Drone2"]["ue4"]["linearVelocity"]
        disp = np.array([vel["X"], vel["Y"], vel["Z"]]) * dt * 100.0
        if not np.isfinite(disp).all():
            disp = np.zeros(3)
        depth = read_pfm(f"{dataset.depth_path}/image_{i:05d}.pfm") * 100.0
        seg = imread(f"{dataset.seg_path}/image_{i:05d}.png")
        if seg.ndim == 3:
            seg = seg[..., 0]
        flow = np.asarray(calculate_flow(
            jnp.asarray(vp1, jnp.float32), jnp.asarray(vp2, jnp.float32),
            res, jnp.asarray(depth, jnp.float32),
            jnp.asarray(disp, jnp.float32), jnp.asarray(seg)))
        write_flow(f"{dataset.gt_of_path}/image_{i:05d}.flo", flow)
        imwrite(f"{dataset.gt_of_vis_path}/image_{i:05d}.png", flow_to_color(flow))
        if i % max(len(states) // 10, 1) == 0:
            dataset.logger.info(f"GT flow {i / max(len(states) - 1, 1) * 100:.1f}%")
