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
