"""Cost of per-row selection primitives at (65536, 512) on TPU."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import jax
import jax.numpy as jnp

N, C, K = 65536, 512, 64

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/5*1e3:8.2f} ms", flush=True)

def main():
    print(jax.devices(), flush=True)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (N, C))

    timed("top_k 512->64", jax.jit(lambda x: jax.lax.top_k(-x, K)), x)
    timed("sort (N,512)", jax.jit(lambda x: jnp.sort(x, axis=1)), x)
    timed("argsort (N,512)", jax.jit(lambda x: jnp.argsort(x, axis=1)), x)

    def iter_argmin(x):
        col = jnp.arange(C)[None, :]
        def body(i, carry):
            xm, tt, cc = carry
            j = jnp.argmin(xm, axis=1)
            rows = jnp.arange(N)
            tt = tt.at[:, i].set(xm[rows, j])
            cc = cc.at[:, i].set(j)
            xm = jnp.where(col == j[:, None], 3.4e38, xm)
            return xm, tt, cc
        tt0 = jnp.zeros((N, K)); cc0 = jnp.zeros((N, K), jnp.int32)
        _, tt, cc = jax.lax.fori_loop(0, K, body, (x, tt0, cc0))
        return tt, cc
    timed("iter argmin x64", jax.jit(iter_argmin), x)

    timed("top_k 620->32", jax.jit(lambda x: jax.lax.top_k(-x[:, :620//512*512+108], 32)),
          jax.random.uniform(key, (N, 620)))

if __name__ == "__main__":
    main()
