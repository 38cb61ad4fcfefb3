"""Custom shader-node escape hatch.

The reference renderer executes arbitrary user OSL: drop a new .osl
next to the shipped nodes and the ShadingSystem JITs it
(reference src/material.cpp:117-181). The TPU framework's node
vocabulary is compiled instead of interpreted — this example shows the
equivalent extension point: register a Python function under a node
type name and use it from YAML like any shipped node. The function can

  * BAKE a jnp uv-function into an atlas texture (``ctx.bake``) — XLA
    then samples it like any image texture, mips and all;
  * or compose a custom closure from the lobe vocabulary directly.

Run:  python examples/custom_shader_node.py  (CPU, ~30 s)
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # utility script: never
# touch the (single-client) TPU from an example

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from phosphorus_mk2_tpu.io.yaml_scene import import_scene, register_shader_node


@register_shader_node("swirl_texture_node")
def swirl(params, ctx):
    """A procedural swirl, written as plain jnp — the searchpath-OSL
    analogue. Baked once at import into the scene's texture atlas."""
    freq = float(params.get("frequency", 6.0))

    def f(uv):
        c = uv - 0.5
        r = jnp.sqrt((c * c).sum(axis=1, keepdims=True))
        a = jnp.arctan2(c[:, 1:2], c[:, 0:1])
        s = 0.5 + 0.5 * jnp.sin(freq * 2 * jnp.pi * r + 3.0 * a)
        return jnp.concatenate([s, 0.3 + 0.5 * s, 1.0 - s], axis=1)

    return ctx.texture_ref(ctx.bake(f, res=256))


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    scene = import_scene(os.path.join(here, "cornell.yaml"))

    # also demonstrate using the node DIRECTLY via compile_material
    from phosphorus_mk2_tpu.io.yaml_scene import compile_material

    spec = {
        "shaders": [
            {"name": "swirl_texture_node", "layer": "t",
             "parameters": [
                 {"name": "frequency", "type": "float", "value": 8.0}]},
            {"name": "diffuse_bsdf_node", "layer": "d"},
            {"name": "material_node", "layer": "root"},
        ],
        "connect": [
            {"from": {"layer": "t", "slot": "Cout"},
             "to": {"layer": "d", "slot": "Cs"}},
            {"from": {"layer": "d", "slot": "Cout"},
             "to": {"layer": "root", "slot": "Cs"}},
        ],
    }

    def loader(img):
        return scene.add_texture(img)

    mat = compile_material("swirl_floor", spec, loader)
    # replace the first wall material with the swirled one
    scene.materials[0] = mat

    data = scene.build()
    from phosphorus_mk2_tpu.core.options import Options
    from phosphorus_mk2_tpu.integrator.path import render_aovs
    from phosphorus_mk2_tpu.io.exr import write_png

    img = render_aovs(data, scene.camera, spp=8, max_depth=3,
                      options=Options(use_bvh=False, samples_per_pass=4))
    out = os.path.join(here, "renders", "custom_node.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_png(out, np.asarray(img["color"]))
    print("wrote", out)


if __name__ == "__main__":
    main()
