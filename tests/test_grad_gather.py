"""gather_rows: primal bit-equal to table[idx]; gradients equal the
scatter-add transpose (reassociated sums -> allclose, and exactly equal
where every target row receives at most one contribution)."""
import jax
import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.math.grad_gather import gather_rows


def test_primal_and_grad_match_scatter():
    rng = np.random.default_rng(3)
    F, W, N = 50, 7, 400
    table = jnp.asarray(rng.random((F, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, F, size=(N,)), jnp.int32)
    w = jnp.asarray(rng.random((N, W)), jnp.float32)

    def loss_seg(t):
        return (gather_rows(t, idx, "segsum") * w).sum()

    def loss_ref(t):
        return (t[idx] * w).sum()

    np.testing.assert_array_equal(
        np.asarray(gather_rows(table, idx, "segsum")),
        np.asarray(table[idx]),
    )
    g_seg = np.asarray(jax.grad(loss_seg)(table))
    g_ref = np.asarray(jax.grad(loss_ref)(table))
    np.testing.assert_allclose(g_seg, g_ref, rtol=1e-5, atol=1e-6)

    # untouched rows get exactly zero
    touched = np.zeros(F, bool)
    touched[np.asarray(idx)] = True
    assert (g_seg[~touched] == 0).all()


def test_unique_indices_exact():
    rng = np.random.default_rng(4)
    F, W = 64, 3
    table = jnp.asarray(rng.random((F, W)), jnp.float32)
    idx = jnp.asarray(rng.permutation(F)[:32], jnp.int32)
    w = jnp.asarray(rng.random((32, W)), jnp.float32)
    g_seg = jax.grad(lambda t: (gather_rows(t, idx) * w).sum())(table)
    g_ref = jax.grad(lambda t: (t[idx] * w).sum())(table)
    np.testing.assert_array_equal(np.asarray(g_seg), np.asarray(g_ref))


def test_scatter_mode_passthrough():
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.random((10, 4)), jnp.float32)
    idx = jnp.asarray([1, 1, 3], jnp.int32)
    g = jax.grad(
        lambda t: gather_rows(t, idx, "scatter").sum()
    )(table)
    assert np.asarray(g)[1, 0] == 2.0 and np.asarray(g)[3, 0] == 1.0


def test_under_jit_and_scan():
    """The integrator uses gathers inside scans — the vjp must survive
    scan transposition."""
    rng = np.random.default_rng(6)
    F, W, N = 20, 5, 64
    table = jnp.asarray(rng.random((F, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, F, size=(3, N)), jnp.int32)

    @jax.jit
    def loss(t):
        def body(acc, i):
            return acc + gather_rows(t, i).sum(), None
        out, _ = jax.lax.scan(body, 0.0, idx)
        return out

    def loss_ref(t):
        return sum(t[idx[i]].sum() for i in range(3))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(table)),
        np.asarray(jax.grad(loss_ref)(table)), rtol=1e-6)
