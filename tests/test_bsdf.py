"""BSDF lobe tests: hemisphere correctness, pdf consistency, energy."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.bsdf.bsdf import bsdf_f, bsdf_sample, gather_lobes
from phosphorus_mk2_tpu.core.material import (
    Material,
    pack_materials,
)
from phosphorus_mk2_tpu.core.scene import SceneData
from phosphorus_mk2_tpu.math.vec import dot, normalize


def scene_with(materials):
    """Minimal SceneData carrying only material tables."""
    m = pack_materials(materials)
    z3 = jnp.zeros((1, 3), jnp.float32)
    return SceneData(
        vertices=z3,
        faces=jnp.zeros((1, 3), jnp.int32),
        normals=z3,
        uvs=jnp.zeros((1, 2), jnp.float32),
        smooth=jnp.zeros((1,), bool),
        tri_mat=jnp.zeros((1,), jnp.int32),
        tri_mesh=jnp.zeros((1,), jnp.int32),
        lobe_type=jnp.asarray(m["lobe_type"]),
        lobe_weight=jnp.asarray(m["lobe_weight"]),
        lobe_param=jnp.asarray(m["lobe_param"]),
        lobe_flags=jnp.asarray(m["lobe_flags"]),
        n_lobes=jnp.asarray(m["n_lobes"]),
        emission=jnp.asarray(m["emission"]),
        light_type=jnp.zeros((1,), jnp.int32),
        light_mat=jnp.zeros((1,), jnp.int32),
        light_offset=jnp.zeros((1,), jnp.int32),
        light_count=jnp.zeros((1,), jnp.int32),
        light_area=jnp.zeros((1,), jnp.float32),
        light_tris=jnp.zeros((1,), jnp.int32),
        num_lights=0,
    )


N = 4096


def fixed_wavefront(mat_id=0, seed=0):
    key = jax.random.key(seed)
    n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    # viewer direction in the upper hemisphere
    wi = normalize(
        jnp.abs(jax.random.normal(key, (N, 3))) * jnp.array([1.0, 1.0, 1.0])
    )
    wi = wi * jnp.array([1.0, 1.0, 1.0])
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (N, 2))
    return n, wi, u2


def test_diffuse_energy_conservation():
    albedo = (0.6, 0.4, 0.2)
    sc = scene_with([Material.diffuse(albedo)])
    n, wi, u2 = fixed_wavefront()
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f, wo, pdf, flags = bsdf_sample(lobes, n, wi, u2)
    # E[f * |cos| / pdf] = albedo for a Lambert lobe
    w = f * (jnp.abs(dot(n, wo)) / pdf)[:, None]
    est = np.asarray(w.mean(axis=0))
    np.testing.assert_allclose(est, albedo, rtol=0.05)
    # all sampled dirs in the upper hemisphere
    assert (np.asarray(dot(n, wo)) >= 0).all()
    # pdf is the cosine warp pdf
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(dot(n, wo)) / np.pi, atol=1e-5
    )


def test_diffuse_eval_matches_reference_form():
    albedo = (1.0, 1.0, 1.0)
    sc = scene_with([Material.diffuse(albedo)])
    n, wi, _ = fixed_wavefront()
    wo = normalize(jnp.abs(jax.random.normal(jax.random.key(7), (N, 3))))
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f = bsdf_f(lobes, n, wi, wo)
    # reference f = (1/pi) * weight * dot(n, wi) for reflective geometry
    want = (1.0 / np.pi) * np.asarray(dot(n, wi))
    np.testing.assert_allclose(np.asarray(f[:, 0]), want, atol=1e-5)


def test_mirror_reflection_direction():
    sc = scene_with([Material.glossy((1.0, 1.0, 1.0), roughness=0.0)])
    n, wi, u2 = fixed_wavefront()
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f, wo, pdf, flags = bsdf_sample(lobes, n, wi, u2)
    want = -wi + 2.0 * dot(n, wi)[:, None] * n
    np.testing.assert_allclose(np.asarray(wo), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)
    # specular flag set
    assert (np.asarray(flags) & 4).all()


def test_refraction_snell():
    ior = 1.5
    sc = scene_with([Material.refraction((1.0, 1.0, 1.0), ior=ior, roughness=0.0)])
    n, wi, u2 = fixed_wavefront()
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f, wo, pdf, _ = bsdf_sample(lobes, n, wi, u2)
    # entering: sin(theta_t) = sin(theta_i) / ior
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - dot(n, wi) ** 2))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - dot(n, wo) ** 2))
    ok = np.asarray(f[:, 0]) > 0
    np.testing.assert_allclose(
        np.asarray(sin_t)[ok], np.asarray(sin_i)[ok] / ior, atol=1e-4
    )
    # transmitted side
    assert (np.asarray(dot(n, wo))[ok] <= 0).all()


def test_ggx_energy_bounded_and_hemisphere():
    sc = scene_with([Material.glossy((1.0, 1.0, 1.0), roughness=0.4)])
    n, wi, u2 = fixed_wavefront()
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f, wo, pdf, _ = bsdf_sample(lobes, n, wi, u2)
    valid = np.asarray(pdf) > 0
    w = np.asarray(f[:, 0] * jnp.abs(dot(n, wo)) / jnp.where(pdf == 0, 1.0, pdf))
    assert np.isfinite(w[valid]).all()
    # directional albedo <= ~1 (energy conservation up to fresnel quirk)
    assert w[valid].mean() <= 1.05
    # reflected hemisphere only
    assert (np.asarray(dot(n, wo))[valid] >= 0).all()


def test_two_lobe_glass_samples_both():
    sc = scene_with([Material.glass(ior=1.45, roughness=0.0)])
    n, wi, u2 = fixed_wavefront()
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f, wo, pdf, _ = bsdf_sample(lobes, n, wi, u2)
    side = np.asarray(dot(n, wo))
    valid = np.asarray(pdf) > 0
    # both reflection and transmission events occur
    assert (side[valid] > 0).any() and (side[valid] < 0).any()


def test_oren_nayar_reduces_to_lambert_at_zero():
    sc0 = scene_with([Material.diffuse((1.0, 1.0, 1.0), roughness=1e-6)])
    n, wi, _ = fixed_wavefront()
    wo = normalize(jnp.abs(jax.random.normal(jax.random.key(9), (N, 3))))
    lobes = gather_lobes(sc0, jnp.zeros((N,), jnp.int32))
    f = bsdf_f(lobes, n, wi, wo)
    want = (1.0 / np.pi) * np.asarray(dot(n, wi))
    np.testing.assert_allclose(np.asarray(f[:, 0]), want, rtol=1e-3, atol=1e-5)


def test_transparent_passthrough():
    sc = scene_with([Material.transparent((1.0, 1.0, 1.0))])
    n, wi, u2 = fixed_wavefront()
    lobes = gather_lobes(sc, jnp.zeros((N,), jnp.int32))
    f, wo, pdf, flags = bsdf_sample(lobes, n, wi, u2)
    np.testing.assert_allclose(np.asarray(wo), np.asarray(-wi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)


def test_sorted_dispatch_matches_dense():
    """Type-sorted sampling routes identically to the dense dispatch
    (tiny GGX fp-reassociation differences allowed)."""
    import jax

    from phosphorus_mk2_tpu.bsdf.lobes import (
        ALL_TYPES,
        sample_lobe,
        sample_lobe_sorted,
    )

    n_rays = 8192
    key = jax.random.key(0)
    types = jax.random.randint(key, (n_rays,), 1, 9).astype(jnp.int32)
    params = jax.random.uniform(
        jax.random.fold_in(key, 1), (n_rays, 6), minval=0.1, maxval=1.5
    )
    nrm = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n_rays, 1))
    wi = normalize(jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (n_rays, 3))))
    u2 = jax.random.uniform(jax.random.fold_in(key, 3), (n_rays, 2))

    f1, wo1, p1 = sample_lobe(types, params, nrm, wi, u2, present=ALL_TYPES)
    f2, wo2, p2 = sample_lobe_sorted(types, params, nrm, wi, u2, ALL_TYPES)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wo1), np.asarray(wo2), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-2, atol=1e-4)


def test_eight_lobe_material_packs_and_renders():
    """MAX_LOBES matches the reference's 8-lobe container (src/bsdf.hpp):
    two Glass expansions (2+2 lobes) plus a diffuse pack and render —
    the exact case that overflowed the round-1 4-lobe cap."""
    import jax
    import numpy as np

    from phosphorus_mk2_tpu.core.material import DIFFUSE, Lobe, Material
    from phosphorus_mk2_tpu.core.camera import camera_to_params
    from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=8, height=8)
    g1 = Material.glass(ior=1.45, roughness=0.2)
    g2 = Material.glass(color=(0.9, 0.8, 0.7), ior=1.1, roughness=0.4)
    mat = Material(
        name="stack",
        lobes=g1.lobes + g2.lobes + [Lobe(DIFFUSE, (0.2, 0.2, 0.2))],
    )
    assert len(mat.lobes) == 5
    sid = scene.add_material(mat)
    # reassign the sphere (mesh 0) to the 5-lobe stack
    scene.meshes[0].material = sid
    data = scene.build()
    assert data.max_lobes_used == 5

    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    out = render_pass(
        data, cam, jax.random.key(0), 0, 2,
        width=8, height=8, max_depth=3, tracer=tracer,
    )
    img = np.asarray(out["color"])
    assert np.isfinite(img).all()
    assert img.max() > 0.0
