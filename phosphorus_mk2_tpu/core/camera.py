"""Pinhole / thin-lens perspective camera and ray generation.

Counterpart of the reference camera model (reference
src/entities/camera.hpp:10) and the SIMD raygen kernel (reference
src/kernels/cpu/camera.hpp:78-160). Ray generation here is a single dense
jnp computation over the whole wavefront — XLA maps it onto VPU lanes, so
there is no per-8-pixel packet loop.

Conventions replicated exactly from the reference kernel:
  * zoom = 1.12 * tan(fov / 2)             (camera.hpp:113)
  * ndcx = (px - 0.5) * stepx - 0.5
  * ndcy = 0.5 - (py - 0.5) * stepy
  * direction z component = -1 (camera looks down -z pre-transform)
  * thin lens: ft = |focal_distance / d.z| after first normalize,
    p = (lens.x, lens.y, 0), d = d * ft - p, renormalize
  * fov = 2 * atan2(sensor_width / 2, focal_length)  (alembic.hpp:69)
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.math.sampling import concentric_disc
from phosphorus_mk2_tpu.math.vec import normalize


@dataclasses.dataclass
class Camera:
    to_world: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    focal_length: float = 35.0
    focal_distance: float = 1.0
    sensor_width: float = 36.0
    sensor_height: float = 24.0
    aperture_radius: float = 0.0
    width: int = 1280
    height: int = 720
    fov: float | None = None  # radians; derived from sensor if None

    def resolved_fov(self) -> float:
        if self.fov is not None:
            return float(self.fov)
        return 2.0 * float(np.arctan2(self.sensor_width * 0.5, self.focal_length))

    @property
    def is_pinhole(self) -> bool:
        return self.aperture_radius == 0.0

    @staticmethod
    def look_at(
        position,
        target,
        up=(0.0, 1.0, 0.0),
        **kwargs,
    ) -> "Camera":
        """Build a camera from position/target/up. The camera space looks
        down -z (matching the raygen kernel's z = -1), x right, y up."""
        position = np.asarray(position, np.float32)
        target = np.asarray(target, np.float32)
        up = np.asarray(up, np.float32)
        fwd = target - position
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        m = np.eye(4, dtype=np.float32)
        # Row-vector convention (Imath M44f): world = local @ m.
        m[0, :3] = right
        m[1, :3] = true_up
        m[2, :3] = -fwd
        m[3, :3] = position
        return Camera(to_world=m, **kwargs)


def generate_rays(
    camera_params: dict,
    pixel_x: jnp.ndarray,
    pixel_y: jnp.ndarray,
    film_sample: jnp.ndarray,
    lens_sample: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate world-space camera rays for a wavefront of pixels.

    camera_params: dict with jnp leaves (from ``camera_to_params``) so the
    function stays jittable and differentiable in camera parameters.
    pixel_x/pixel_y: (N,) integer pixel coordinates.
    film_sample: (N, 2) uniforms in [0,1).
    lens_sample: (N, 2) uniforms for the thin lens (ignored for pinhole).

    Returns (origins (N,3), directions (N,3)).
    """
    width = camera_params["width"]
    height = camera_params["height"]
    zoom = 1.12 * jnp.tan(camera_params["fov"] * 0.5)
    ratio = width / height
    stepx = 1.0 / width
    stepy = 1.0 / height

    px = pixel_x.astype(jnp.float32)
    py = pixel_y.astype(jnp.float32)

    ndcx = (px - 0.5) * stepx - 0.5
    ndcy = 0.5 - (py - 0.5) * stepy

    dx = (ndcx + film_sample[..., 0] * stepx) * ratio * zoom
    dy = (ndcy + film_sample[..., 1] * stepy) * zoom
    dz = jnp.full_like(dx, -1.0)
    d = normalize(jnp.stack([dx, dy, dz], axis=-1))
    p = jnp.zeros_like(d)

    aperture = camera_params["aperture_radius"]
    if lens_sample is not None:
        lens = concentric_disc(lens_sample) * aperture
        ft = jnp.abs(camera_params["focal_distance"] / d[..., 2])
        p_lens = jnp.stack(
            [lens[..., 0], lens[..., 1], jnp.zeros_like(lens[..., 0])], axis=-1
        )
        d_lens = normalize(d * ft[..., None] - p_lens)
        use_lens = aperture > 0.0
        p = jnp.where(use_lens, p_lens, p)
        d = jnp.where(use_lens, d_lens, d)

    m = camera_params["to_world"]
    # Imath row-vector convention: p' = p @ m (+ translation row 3).
    rot = m[:3, :3]
    p = p @ rot + m[3, :3]
    d = normalize(d @ rot)
    return p, d


def camera_to_params(camera: Camera) -> dict:
    """Device pytree of camera parameters (differentiable leaves)."""
    return {
        "to_world": jnp.asarray(camera.to_world, jnp.float32),
        "fov": jnp.float32(camera.resolved_fov()),
        "focal_distance": jnp.float32(camera.focal_distance),
        "aperture_radius": jnp.float32(camera.aperture_radius),
        "width": float(camera.width),
        "height": float(camera.height),
    }
