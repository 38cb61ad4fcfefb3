"""Round-4 TPU batch K: pallas_full remote-compile failure triage.

r4i: every front_all_pallas compile died with HTTP 500 "tpu_compile_helper
subprocess exit code 1" (truncated). This prints the FULL exception for
a tiny-shape compile and for ablated kernel variants to localize the
offending construct (non-128-aligned lane slices vs in-kernel
dot_general vs resource limits). Each variant runs in its own
subprocess: a failed pallas compile poisons the parent process
(CLAUDE.md).

    python tools/tpu_r4k_pfull_debug.py 2>&1 | tee /tmp/tpu_r4k.log
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, traceback
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp
import numpy as np

variant = {variant!r}
K2, sc, N = {k2}, 16, {n}

rng = np.random.default_rng(0)
lo = rng.random((K2, 3), np.float32) * 10
b6 = np.concatenate([lo, lo + rng.random((K2, 3), np.float32)], 1)
mlo = rng.random((K2, sc, 3), np.float32) * 10
mbmin = mlo
mbmax = mlo + rng.random((K2, sc, 3), np.float32)
p = rng.random((N, 3), np.float32)
d = rng.standard_normal((N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
tl = np.full((N,), 1e30, np.float32)

from phosphorus_mk2_tpu.accel import pallas_front as pf

try:
    if variant == "slab_extract":
        out = pf.slab_extract_pallas(jnp.asarray(b6), jnp.asarray(p),
                                     jnp.asarray(d), jnp.asarray(tl), jj=16)
    else:
        out = pf.front_all_pallas(
            jnp.asarray(b6), jnp.asarray(mbmin), jnp.asarray(mbmax),
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(tl),
            jj=16, kk=32)
    jax.block_until_ready(out)
    print("OK", variant, flush=True)
except Exception:
    print("FAIL", variant, flush=True)
    traceback.print_exc()
"""


def run(variant, k2, n):
    code = CHILD.format(repo=REPO, variant=variant, k2=k2, n=n)
    print(f"=== {variant} K2={k2} N={n} ===", flush=True)
    subprocess.run([sys.executable, "-c", code], timeout=1800)


if __name__ == "__main__":
    run("slab_extract", 434, 1 << 12)   # control: known-good kernel
    run("full", 100, 1 << 10)           # tiny shapes
    run("full", 434, 1 << 12)           # BMW-class K2
