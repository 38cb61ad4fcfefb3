"""Differentiability: pixel-loss gradients vs finite differences.

BASELINE.json acceptance: gradients allclose vs finite differences on
matched scenes (emission, BSDF albedo, vertex positions).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.bvh_builder import attach_bvh
from phosphorus_mk2_tpu.core.camera import camera_to_params
from phosphorus_mk2_tpu.core.options import Options
from phosphorus_mk2_tpu.integrator.path import make_tracer, render_pass
from phosphorus_mk2_tpu.scenes import sphere_in_box

RES = 16


def setup():
    scene = sphere_in_box(width=RES, height=RES)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(0)

    @jax.jit
    def render_mean(d):
        out = render_pass(
            d, cam, key, 0, 2, width=RES, height=RES, max_depth=2, tracer=tracer
        )
        return out["color"].mean() / 2.0

    grad_fn = jax.jit(jax.grad(render_mean, allow_int=True))
    return data, render_mean, grad_fn


def fd_entry(data, render_mean, field, idx, eps):
    """Central finite difference on one scalar entry of a scene field."""
    arr = getattr(data, field)
    x0 = arr[idx]

    def with_val(x):
        return dataclasses.replace(data, **{field: arr.at[idx].set(x)})

    f_p = render_mean(with_val(x0 + eps))
    f_m = render_mean(with_val(x0 - eps))
    return (float(f_p) - float(f_m)) / (2 * eps)


def test_gradients_match_finite_differences():
    data, render_mean, grad_fn = setup()
    grads = grad_fn(data)

    # emission: lamp material id 3, green channel
    g = float(grads.emission[3, 1])
    fd = fd_entry(data, render_mean, "emission", (3, 1), 1e-2)
    np.testing.assert_allclose(g, fd, rtol=5e-3, atol=1e-6)
    assert g > 0.0  # more emission -> brighter image

    # albedo: white material diffuse lobe weight, red channel
    g = float(grads.lobe_weight[0, 0, 0])
    fd = fd_entry(data, render_mean, "lobe_weight", (0, 0, 0), 1e-3)
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=1e-6)
    assert g > 0.0

    # vertex position: a lamp vertex's height (flows through hit points,
    # normals and light sampling). Interior gradients only: epsilon must
    # be small enough that no sampled path crosses a visibility edge
    # (larger eps flips ray hits and FD then measures the edge term the
    # interior gradient intentionally excludes).
    v_idx = int(np.asarray(data.faces)[np.asarray(data.tri_mat) == 3][0, 0])
    g = float(grads.vertices[v_idx, 1])
    fd = fd_entry(data, render_mean, "vertices", (v_idx, 1), 3e-4)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=0.05, atol=1e-3)

    # everything finite, key fields nonzero
    for name in ("vertices", "normals", "lobe_weight", "lobe_param", "emission"):
        arr = np.asarray(getattr(grads, name))
        assert np.isfinite(arr).all(), name
    assert np.abs(np.asarray(grads.emission)).sum() > 0
    assert np.abs(np.asarray(grads.lobe_weight)).sum() > 0
    assert np.abs(np.asarray(grads.vertices)).sum() > 0


def test_grad_multi_type_scene_dense_dispatch():
    """Scenes with >2 lobe types at >=4096-wavefronts route the lobe
    eval through the type-sorted dispatch, whose dynamic fori_loop has
    no reverse rule. sorted_dispatch=False must take the dense
    (differentiable) eval and produce finite nonzero gradients; tmax
    reaching the cluster tracer must stay severed (regression:
    tangent-carrying shadow tmax via the consolidated light rows)."""
    from phosphorus_mk2_tpu.scenes import multi_bsdf_scene

    scene = multi_bsdf_scene(width=72, height=60)  # 4320 >= 4096 rays
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    assert len(data.lobe_types_present) > 2
    key = jax.random.key(2)

    def loss(emission, lobe_weight):
        d2 = dataclasses.replace(
            data, emission=emission, lobe_weight=lobe_weight
        )
        out = render_pass(
            d2, cam, key, 0, 1, width=72, height=60, max_depth=2,
            tracer=tracer, sorted_dispatch=False,
        )
        return out["color"].mean()

    g_e, g_w = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        data.emission, data.lobe_weight
    )
    assert np.isfinite(np.asarray(g_e)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    assert np.abs(np.asarray(g_e)).max() > 0
    assert np.abs(np.asarray(g_w)).max() > 0


def test_vertex_grads_finite_with_environment_light():
    """Regression (round 4): scenes with an INFINITE (environment)
    light poisoned VERTEX gradients with NaN — the env lane's
    light_area is 0, and the vjp of 1/max(area, 1e-20) is -1/eps^2
    whose (1e-20)^2 underflows f32 to 0 -> -inf, so the masked lane's
    zero cotangent became 0*inf = NaN inside the light-area sum chain
    (core/lights.pdf_area). Cornell never triggers it (no env light);
    the BMW asset did on every wavefront."""
    from phosphorus_mk2_tpu.core.material import Material
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=RES, height=RES)
    scene.set_environment(
        Material.background((0.4, 0.5, 0.6), power=0.5, name="sky")
    )
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(3)

    def loss(verts):
        d2 = dataclasses.replace(data, vertices=verts)
        out = render_pass(
            d2, cam, key, 0, 2, width=RES, height=RES, max_depth=2,
            tracer=tracer, sorted_dispatch=False,
        )
        return out["color"].sum()

    g = np.asarray(jax.jit(jax.grad(loss))(data.vertices))
    assert np.isfinite(g).all(), f"{(~np.isfinite(g)).sum()} NaN rows"
    assert np.abs(g).max() > 0


def test_trainable_scoping_grads_identical(monkeypatch):
    """Gradient scoping (trainable=...) severs only NON-trainable
    chains: grads for the requested fields must be bit-close to the
    fully-differentiable graph, on BOTH hit-row branches (consolidated
    fat rows and the big-scene per-table path)."""
    import phosphorus_mk2_tpu.integrator.path as path_mod
    from phosphorus_mk2_tpu.scenes import sphere_in_box

    scene = sphere_in_box(width=RES, height=RES)
    data = scene.build()
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=False)
    key = jax.random.key(1)

    def make_loss(trainable):
        def loss(params):
            d2 = dataclasses.replace(data, **params)
            out = render_pass(
                d2, cam, key, 0, 2, width=RES, height=RES, max_depth=3,
                tracer=tracer, sorted_dispatch=False, trainable=trainable,
            )
            return out["color"].sum()

        return jax.jit(jax.grad(loss))

    params = {"emission": data.emission, "lobe_weight": data.lobe_weight}
    for use_hit_rows in (True, False):
        if not use_hit_rows:
            monkeypatch.setattr(path_mod, "HIT_ROW_MAX_TRIS", 0)
        g_full = make_loss(None)(params)
        g_scoped = make_loss(("emission", "lobe_weight"))(params)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(g_scoped[k]), np.asarray(g_full[k]),
                rtol=1e-5, atol=1e-7, err_msg=f"{k} hit_rows={use_hit_rows}",
            )
            assert np.abs(np.asarray(g_scoped[k])).max() > 0

    # vertices-trainable scoping (the attr-block diff path)
    monkeypatch.undo()
    pv = {"vertices": data.vertices}
    gv_full = make_loss(None)(pv)
    gv_scoped = make_loss(("vertices",))(pv)
    np.testing.assert_allclose(
        np.asarray(gv_scoped["vertices"]), np.asarray(gv_full["vertices"]),
        rtol=1e-5, atol=1e-7,
    )


def test_sorted_dispatch_grads_match_dense():
    """Round 5: the type-sorted lobe dispatch has a custom_vjp (the
    sorted sweep rerun with per-type vjps), so gradient paths keep the
    multi-BSDF dispatch win. Grads must match the dense eval's."""
    from phosphorus_mk2_tpu.scenes import multi_bsdf_scene

    scene = multi_bsdf_scene(width=72, height=60)  # 4320 >= 4096 rays
    data = attach_bvh(scene.build())
    cam = camera_to_params(scene.camera)
    tracer = make_tracer(data, use_bvh=True)
    assert len(data.lobe_types_present) > 2
    key = jax.random.key(2)

    def make_grad(sorted_dispatch):
        def loss(emission, lobe_weight, lobe_param):
            d2 = dataclasses.replace(
                data, emission=emission, lobe_weight=lobe_weight,
                lobe_param=lobe_param,
            )
            out = render_pass(
                d2, cam, key, 0, 1, width=72, height=60, max_depth=2,
                tracer=tracer, sorted_dispatch=sorted_dispatch,
            )
            return out["color"].mean()

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    args = (data.emission, data.lobe_weight, data.lobe_param)
    g_dense = make_grad(False)(*args)
    g_sorted = make_grad(True)(*args)
    for gd, gs, name in zip(g_dense, g_sorted,
                            ("emission", "lobe_weight", "lobe_param")):
        gd, gs = np.asarray(gd), np.asarray(gs)
        assert np.isfinite(gs).all(), name
        np.testing.assert_allclose(gs, gd, rtol=2e-4, atol=1e-7,
                                   err_msg=name)
    assert np.abs(np.asarray(g_sorted[1])).max() > 0
