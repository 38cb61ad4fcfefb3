"""MIS (NEE/BSDF multiple importance sampling) integrator tests.

The reference has no MIS (emission is dropped at non-first/non-specular
vertices, spt.hpp:177-179, and NEE carries an (e*4) factor,
spt.hpp:254). Our mis=True flag is a documented deviation: balance
heuristic between NEE and BSDF sampling with the 4x quirk dropped.

Validation strategy:
  * bsdf_pdf unit checks against the analytic cosine-hemisphere pdf;
  * consistency: on a scene whose light is invisible to the camera,
    every parity-mode (mis=False) radiance contribution carries exactly
    one NEE event and hence one 4x factor, so parity/4 equals standard
    NEE path tracing — mis=True must converge to the same mean;
  * absolute correctness: analytic quadrature of the direct-lighting
    integral at the image center must match the MIS render (catches
    weight double-counting, which internal consistency alone would not).
"""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.bsdf.bsdf import bsdf_pdf, gather_lobes
from phosphorus_mk2_tpu.core.camera import Camera
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.core.scene import Scene
from phosphorus_mk2_tpu.integrator.path import render_aovs
from phosphorus_mk2_tpu.scenes.builders import make_quad

ALBEDO = (0.73, 0.73, 0.73)
LIGHT_Y = 1.5
LIGHT_HALF = 0.5
POWER = 8.0


def hidden_light_scene(res=32, walls=False):
    """Diffuse floor lit by a downward-facing quad light above the
    camera's view frustum (the camera looks straight down, so no camera
    ray can hit the emitter: the parity/4 identity holds per-pixel)."""
    scene = Scene()
    white = scene.add_material(Material.diffuse(ALBEDO, name="white"))
    emit = scene.add_material(Material.emitter((1.0, 1.0, 1.0), power=POWER, name="lamp"))
    scene.add_mesh(
        make_quad([-2, 0, 2], [2, 0, 2], [2, 0, -2], [-2, 0, -2], white, "floor")
    )
    h = LIGHT_HALF
    scene.add_mesh(
        make_quad(
            [-h, LIGHT_Y, -h], [h, LIGHT_Y, -h], [h, LIGHT_Y, h], [-h, LIGHT_Y, h],
            emit, "light",
        )
    )
    if walls:
        scene.add_mesh(
            make_quad([-2, 0, -2], [2, 0, -2], [2, 2, -2], [-2, 2, -2], white, "back")
        )
        scene.add_mesh(
            make_quad([-2, 0, 2], [-2, 0, -2], [-2, 2, -2], [-2, 2, 2], white, "left")
        )
    scene.camera = Camera.look_at(
        position=(0.0, 1.2, 0.0),
        target=(0.0, 0.0, 0.0),
        up=(0.0, 0.0, 1.0),
        width=res,
        height=res,
    )
    return scene


def test_bsdf_pdf_diffuse_cosine():
    scene = hidden_light_scene()
    data = scene.build()
    n = 64
    mat = jnp.zeros((n,), jnp.int32)  # "white" diffuse
    lobes = gather_lobes(data, mat)
    nrm = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    # random upper-hemisphere directions
    k = jax.random.split(jax.random.key(1), 2)
    wi = jax.random.normal(k[0], (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wi = wi * jnp.where(wi[:, 1:2] < 0, -1.0, 1.0)
    wo = jnp.tile(jnp.array([[0.0, 0.8, 0.6]]), (n, 1))
    pdf = np.asarray(bsdf_pdf(lobes, nrm, wi, wo))
    expect = np.asarray(wi[:, 1]) / np.pi  # cosine-hemisphere pdf
    np.testing.assert_allclose(pdf, expect, rtol=1e-5, atol=1e-6)


def test_bsdf_pdf_mixture_two_lobes():
    # diffuse + glossy(rough) material: mixture pdf = (pdf_d + pdf_g)/2
    scene = Scene()
    m = Material.diffuse(ALBEDO, name="two")
    g = Material.glossy(roughness=0.5, name="g")
    m.lobes = list(m.lobes) + list(g.lobes)
    scene.add_material(m)
    scene.add_mesh(
        make_quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1], 0, "floor")
    )
    data = scene.build()
    n = 8
    lobes = gather_lobes(data, jnp.zeros((n,), jnp.int32))
    nrm = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    wi = jnp.tile(jnp.array([[0.0, 0.9, 0.435889894]]), (n, 1))
    wo = jnp.tile(jnp.array([[0.0, 0.8, -0.6]]), (n, 1))
    pdf = np.asarray(bsdf_pdf(lobes, nrm, wi, wo))
    assert (pdf > 0).all()
    # the diffuse share alone is cos/pi / 2 lobes; glossy adds more
    assert (pdf > 0.9 / np.pi / 2).all()


def _render(scene, data, spp, depth, mis, res):
    opts = Options(use_bvh=False, samples_per_pass=min(spp, 64), mis=mis)
    out = render_aovs(data, scene.camera, spp=spp, max_depth=depth, options=opts)
    return np.asarray(out["color"])


def test_mis_matches_nee_direct():
    """Direct lighting: mis=True mean equals parity/4 per-pixel, and the
    image center matches analytic quadrature of the light integral."""
    res = 24
    scene = hidden_light_scene(res=res)
    data = scene.build()

    parity = _render(scene, data, spp=192, depth=2, mis=False, res=res)
    with_mis = _render(scene, data, spp=192, depth=2, mis=True, res=res)

    # no camera ray sees the emitter: parity radiance is pure NEE (=4x)
    rel = np.abs(with_mis.mean() - parity.mean() / 4.0) / (parity.mean() / 4.0)
    assert rel < 0.03, rel

    # analytic direct radiance at the floor point under the center:
    # L = (albedo/pi) * e * Int over light of cos^2 / d^4 * y_l^2 dA
    e = np.asarray(data.emission[1])  # lamp material id 1
    xs = np.linspace(-LIGHT_HALF, LIGHT_HALF, 256)
    zs = np.linspace(-LIGHT_HALF, LIGHT_HALF, 256)
    X, Z = np.meshgrid(xs, zs)
    d2 = X * X + Z * Z + LIGHT_Y * LIGHT_Y
    integrand = LIGHT_Y * LIGHT_Y / (d2 * d2)
    dA = (xs[1] - xs[0]) * (zs[1] - zs[0])
    geom = integrand.sum() * dA
    expect = np.array(ALBEDO) / np.pi * e * geom

    c = res // 2
    center = with_mis[c - 2 : c + 2, c - 2 : c + 2].mean(axis=(0, 1))
    np.testing.assert_allclose(center, expect, rtol=0.05)


def test_mis_matches_nee_global_illumination():
    """Multi-bounce with walls + RR: means still agree (every parity
    contribution carries exactly one 4x NEE factor, so parity/4 is the
    standard NEE estimate at every depth)."""
    res = 16
    scene = hidden_light_scene(res=res, walls=True)
    data = scene.build()

    parity = _render(scene, data, spp=256, depth=4, mis=False, res=res)
    with_mis = _render(scene, data, spp=256, depth=4, mis=True, res=res)

    rel = np.abs(with_mis.mean() - parity.mean() / 4.0) / (parity.mean() / 4.0)
    assert rel < 0.04, rel


def test_mis_off_bit_identical():
    """mis=False must stay bit-identical to the pre-MIS integrator (the
    MIS code is Python-gated, not traced): compared against a stored
    golden frozen when the non-MIS path was validated — a true
    regression anchor, not just run-to-run determinism."""
    import os

    res = 16
    scene = hidden_light_scene(res=res)
    data = scene.build()
    a = _render(scene, data, spp=4, depth=3, mis=False, res=res)
    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "mis_off_hidden_light_16.npz"
    )
    golden = np.load(golden_path)["color"]
    np.testing.assert_array_equal(np.asarray(a), golden)
    assert np.isfinite(a).all() and a.max() > 0.0


def test_mis_gradients_finite():
    """Gradients through the MIS path stay finite (stop-gradient on the
    weights keeps the pdf ratios out of the backward graph)."""
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass

    res = 8
    scene = hidden_light_scene(res=res)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)

    def loss(emission):
        d2 = jax.tree_util.tree_map(lambda x: x, data)
        d2.emission = emission
        out = render_pass(
            d2, cam, jax.random.key(0), 0, 2,
            width=res, height=res, max_depth=3, tracer=tracer, mis=True,
        )
        return out["color"].sum()

    g = jax.grad(loss)(data.emission)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0
