"""Moller-Trumbore and brute-force tracer tests."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.accel.intersect import (
    intersect_brute,
    mt_intersect,
    occluded_brute,
    reintersect,
)
from phosphorus_mk2_tpu.scenes import sphere_in_box


def test_mt_single_triangle():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    p = jnp.array([0.25, 0.25, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, u, v, ok = mt_intersect(p, d, a, b, c)
    assert bool(ok)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-6)
    # P = (1-u-v)a + u*b + v*c => u = x, v = y at z=0
    np.testing.assert_allclose([float(u), float(v)], [0.25, 0.25], atol=1e-6)


def test_mt_miss_and_backface_hit():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    # outside the triangle
    p = jnp.array([0.9, 0.9, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    _, _, _, ok = mt_intersect(p, d, a, b, c)
    assert not bool(ok)
    # from behind: the reference intersector is double-sided
    p2 = jnp.array([0.2, 0.2, -1.0])
    d2 = jnp.array([0.0, 0.0, 1.0])
    _, _, _, ok2 = mt_intersect(p2, d2, a, b, c)
    assert bool(ok2)


def test_brute_force_vs_numpy_oracle():
    scene = sphere_in_box().build()
    key = jax.random.key(0)
    n = 128
    p = jax.random.uniform(key, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    res = intersect_brute(scene, p, d)

    # numpy reference
    verts = np.asarray(scene.vertices)
    faces = np.asarray(scene.faces)
    pn, dn = np.asarray(p), np.asarray(d)
    a = verts[faces[:, 0]]
    e0 = verts[faces[:, 1]] - a
    e1 = verts[faces[:, 2]] - a
    for i in range(n):
        pvec = np.cross(dn[i], e1)
        det = (e0 * pvec).sum(-1)
        ood = np.where(np.abs(det) < 1e-8, np.inf, 1.0 / det)
        tvec = pn[i] - a
        u = (tvec * pvec).sum(-1) * ood
        qvec = np.cross(tvec, e0)
        v = (dn[i] * qvec).sum(-1) * ood
        t = (e1 * qvec).sum(-1) * ood
        ok = (
            (np.abs(det) >= 1e-8)
            & (u >= 0)
            & (u <= 1)
            & (v >= 0)
            & (u + v <= 1)
            & (t >= 0)
        )
        if ok.any():
            tbest = t[ok].min()
            assert bool(res["hit"][i])
            np.testing.assert_allclose(float(res["t"][i]), tbest, rtol=1e-4)
        else:
            assert not bool(res["hit"][i])


def test_occlusion_respects_tmax():
    scene = sphere_in_box().build()
    # ray from center toward +x wall (wall at x=1, distance 1)
    p = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    assert bool(occluded_brute(scene, p, d, jnp.array([2.0]))[0])
    assert not bool(occluded_brute(scene, p, d, jnp.array([0.5]))[0])


def test_reintersect_gradients_flow():
    scene = sphere_in_box().build()
    p = jnp.array([[0.0, 0.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = intersect_brute(scene, p, d)
    assert bool(res["hit"][0])

    def loss(verts):
        s2 = scene.replace_vertices(verts) if hasattr(scene, "replace_vertices") else None
        import dataclasses

        s2 = dataclasses.replace(scene, vertices=verts)
        t, u, v = reintersect(s2, res["tri"], p, d)
        return t.sum()

    g = jax.grad(loss)(scene.vertices)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_packed_key_near_coplanar_ties():
    """The packed-key closest tracker quantizes t to its cleared low
    mantissa bits (2^-15 relative at 512-wide chunks): for two hits
    separated by more than that, the strictly closer one must win; at
    exact ties the pick is deterministic (lowest lane)."""
    import jax.numpy as jnp

    from phosphorus_mk2_tpu.accel.intersect import intersect_brute

    class Soup:
        pass

    # two parallel unit triangles along +z at t=1.0 and t=1.001 (well
    # above the quantization), plus an exact-tie duplicate of the first
    verts = []
    faces = []
    for i, z in enumerate((1.0, 1.001, 1.0)):
        verts += [[-1, -1, z], [3, -1, z], [-1, 3, z]]
        faces.append([3 * i, 3 * i + 1, 3 * i + 2])
    scene = Soup()
    scene.vertices = jnp.asarray(verts, jnp.float32)
    scene.faces = jnp.asarray(faces, jnp.int32)

    p = jnp.zeros((8, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8, 1))
    out = intersect_brute(scene, p, d)
    # closer plane wins; the t=1.0 exact tie resolves to the lowest id
    assert int(out["tri"][0]) == 0
    np.testing.assert_allclose(np.asarray(out["t"]), 1.0, rtol=1e-6)
    assert bool(out["hit"].all())

    # tmax below the hit excludes it
    out2 = intersect_brute(scene, p, d, tmax=jnp.full((8,), 0.5))
    assert not bool(out2["hit"].any())
