"""Radiometric correctness: analytic cases + golden statistics.

The analytic plane-under-environment case pins the whole pipeline
(camera -> hit -> bounce -> env emission): one diffuse bounce off a
plane lit only by a uniform environment converges to albedo * L exactly.
Golden statistics catch silent numeric drift in the full integrator.
"""
import numpy as np

from phosphorus_mk2_tpu.core.camera import Camera
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.core.mesh import Mesh
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.integrator.path import render_aovs
from phosphorus_mk2_tpu.scenes import sphere_in_box


def test_plane_under_env_is_albedo_times_L():
    albedo = (0.8, 0.6, 0.4)
    L = (1.0, 1.0, 1.0)
    scene = Scene()
    m = scene.add_material(Material.diffuse(albedo, name="p"))
    scene.set_environment(Material.background(L, name="sky"))
    # big ground plane facing +y, camera above looking straight down
    scene.add_mesh(
        Mesh(
            vertices=np.array(
                [[-50, 0, 50], [50, 0, 50], [50, 0, -50], [-50, 0, -50]], np.float32
            ),
            faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
            material=m,
            smooth=False,
        )
    )
    scene.camera = Camera.look_at((0, 5, 0), (0, 0, 0), up=(0, 0, -1), width=8, height=8)
    img = np.asarray(
        render_aovs(
            scene.build(),
            scene.camera,
            spp=64,
            max_depth=2,
            options=Options(use_bvh=False, samples_per_pass=32),
        )["color"]
    )
    # cosine-importance-sampled diffuse bounce into a uniform env:
    # every sample contributes exactly albedo * L (zero variance)
    np.testing.assert_allclose(img.mean(axis=(0, 1)), albedo, rtol=1e-3)


def test_golden_statistics_sphere_in_box():
    """Mean/percentile stats of the standard scene at a fixed seed —
    catches any unintended change to the light transport math. Update
    deliberately when semantics change on purpose."""
    scene = sphere_in_box(width=32, height=32)
    img = np.asarray(
        render_aovs(
            scene.build(),
            scene.camera,
            spp=8,
            max_depth=4,
            options=Options(use_bvh=False, samples_per_pass=8, seed=0),
        )["color"]
    )
    assert np.isfinite(img).all()
    mean = img.mean()
    # recorded 2026-08-17 (PCG4D RNG, stratified film, reference
    # integrator semantics); MC mean at 8 spp is stable to a few percent
    assert 1.2 < mean < 1.9, mean
    # energy ordering: ceiling region (lamp) brightest, floor mid, box dim
    top = img[:6].mean()
    mid = img[18:26].mean()
    assert top > mid, (top, mid)
