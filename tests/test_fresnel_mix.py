"""Per-hit fresnel lobe weighting (Glass expansion)."""
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.bsdf.bsdf import apply_fresnel, gather_lobes
from phosphorus_mk2_tpu.core.material import Material
from phosphorus_mk2_tpu.math.fresnel import dielectric
from phosphorus_mk2_tpu.math.vec import normalize

from test_bsdf import scene_with  # reuse the minimal SceneData helper


def test_fresnel_weights_match_dielectric():
    import dataclasses

    ior = 1.5
    sc = scene_with([Material.glass(ior=ior, roughness=0.0)])
    sc = dataclasses.replace(sc, has_fresnel=True, max_lobes_used=2)

    n = 8
    nrm = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    wi = normalize(jnp.tile(jnp.array([[0.3, 0.8, 0.1]]), (n, 1)))
    mats = jnp.zeros((n,), jnp.int32)
    lobes = apply_fresnel(sc, gather_lobes(sc, mats), nrm, wi)

    cosi = float((nrm[0] * wi[0]).sum())
    F = float(dielectric(jnp.float32(cosi), ior))
    # lobe 0 = reflection (weight F), lobe 1 = refraction (weight 1-F)
    np.testing.assert_allclose(np.asarray(lobes["weight"][0, 0]), F, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lobes["weight"][0, 1]), 1.0 - F, rtol=1e-5
    )


def test_glass_render_is_finite():
    import dataclasses

    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=16, height=16)
    # swap the sphere's material for fresnel glass
    glass = scene.add_material(Material.glass(ior=1.45, name="fglass"))
    scene.meshes[-1].material = glass
    data = scene.build()
    assert data.has_fresnel
    img = np.asarray(
        render_aovs(
            data,
            scene.camera,
            spp=2,
            max_depth=4,
            options=Options(use_bvh=False, samples_per_pass=2),
        )["color"]
    )
    assert np.isfinite(img).all()
    assert img.max() > 0
