"""End-to-end integrator tests on the built-in scenes (oracle tracer)."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.integrator.path import render_aovs
from phosphorus_mk2_tpu.scenes import sphere_in_box


def small_scene(res=32):
    scene = sphere_in_box(width=res, height=res)
    return scene, scene.build()


def test_render_smoke():
    scene, data = small_scene()
    opts = Options(use_bvh=False, samples_per_pass=2)
    out = render_aovs(data, scene.camera, spp=2, max_depth=3, options=opts)
    img = np.asarray(out["color"])
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    # the ceiling light should be the brightest region (top rows)
    top = img[: 8].mean()
    bottom = img[-8:].mean()
    assert top > bottom
    # alpha: all rays hit the box interior
    assert np.asarray(out["alpha"]).min() > 0.99
    # normals AOV is populated and unit-ish where hit
    nrm = np.asarray(out["normal"])
    lens = np.linalg.norm(nrm, axis=-1)
    assert (lens > 0.9).mean() > 0.95


def test_render_deterministic():
    scene, data = small_scene()
    opts = Options(use_bvh=False, samples_per_pass=2)
    a = render_aovs(data, scene.camera, spp=2, max_depth=2, options=opts)["color"]
    b = render_aovs(data, scene.camera, spp=2, max_depth=2, options=opts)["color"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_direct_vs_more_bounces_monotone():
    """Adding bounces only adds energy (all terms are nonnegative)."""
    scene, data = small_scene()
    opts = Options(use_bvh=False, samples_per_pass=2)
    d1 = np.asarray(
        render_aovs(data, scene.camera, spp=2, max_depth=1, options=opts)["color"]
    )
    d3 = np.asarray(
        render_aovs(data, scene.camera, spp=2, max_depth=3, options=opts)["color"]
    )
    assert d3.mean() >= d1.mean() - 1e-6


def test_emissive_pixels_match_lamp_radiance():
    """Pixels seeing the lamp directly return ~beta * emission at depth 0."""
    scene, data = small_scene()
    opts = Options(use_bvh=False, samples_per_pass=1)
    img = np.asarray(
        render_aovs(data, scene.camera, spp=1, max_depth=1, options=opts)["color"]
    )
    lamp_e = 40.0 / np.pi  # emitter power/pi (diffuse_emitter_node semantics)
    assert img.max() <= lamp_e * 1.3 + 1e-3


def test_spp_batch_equivalent():
    """spp_batch tiles samples into the wavefront; same per-(pixel,
    sample) RNG counters, so results match up to fp reassociation."""
    import functools

    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    scene, data = small_scene(16)
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(3)
    outs = {}
    for sb in (1, 4):
        fn = jax.jit(
            functools.partial(
                render_pass, width=16, height=16, max_depth=3,
                tracer=tracer, film_strata=2, spp_batch=sb,
            ),
            static_argnames=("n_samples",),
        )
        outs[sb] = np.asarray(fn(data, cam, key, 0, 8)["color"])
    np.testing.assert_allclose(outs[4], outs[1], rtol=1e-4, atol=1e-5)

    # non-divisor batch falls back to 1 (still correct)
    fn = jax.jit(
        functools.partial(
            render_pass, width=16, height=16, max_depth=3,
            tracer=tracer, spp_batch=3,
        ),
        static_argnames=("n_samples",),
    )
    out = np.asarray(fn(data, cam, key, 0, 8)["color"])
    assert np.isfinite(out).all()


def test_pipeline_shadow_equivalent():
    """Pipelined NEE (shadow rays merged into the next bounce's trace)
    produces the same image as the immediate-occlusion form up to fp
    summation order."""
    import functools

    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    scene, data = small_scene(24)
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)
    outs = {}
    for pipe in (True, False):
        fn = jax.jit(
            functools.partial(
                render_pass, width=24, height=24, max_depth=3,
                tracer=tracer, pipeline_shadow=pipe,
            ),
            static_argnames=("n_samples",),
        )
        outs[pipe] = np.asarray(fn(data, cam, key, 0, 4)["color"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-5)
    assert outs[True].max() > 0


def test_consolidated_hit_rows_equivalent():
    """The per-tri fat-row tables must not change values: force them off
    via the size gate and compare."""
    import functools

    import phosphorus_mk2_tpu.integrator.path as path_mod
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    scene, data = small_scene(24)
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(1)

    def render():
        fn = jax.jit(
            functools.partial(
                render_pass, width=24, height=24, max_depth=3, tracer=tracer,
            ),
            static_argnames=("n_samples",),
        )
        return np.asarray(fn(data, cam, key, 0, 4)["color"])

    with_rows = render()
    old = path_mod.HIT_ROW_MAX_TRIS
    try:
        path_mod.HIT_ROW_MAX_TRIS = 0  # force the un-consolidated path
        without_rows = render()
    finally:
        path_mod.HIT_ROW_MAX_TRIS = old
    np.testing.assert_array_equal(with_rows, without_rows)
