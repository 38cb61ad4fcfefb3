"""Material model: a fixed lobe-array data model compiled ahead of time.

The reference drives materials through a runtime OSL JIT (reference
src/material.cpp:89-306): shader groups execute per hit and emit a closure
tree that is flattened into a ``bsdf_t`` lobe container (<= 8 lobes of
{type, rgb weight, params}). A runtime JIT is the wrong design for TPU —
XLA is our shader compiler. Instead, materials are compiled host-side into
dense per-material lobe arrays which the integrator gathers per hit; every
lobe type is evaluated branch-free with masks (see bsdf/lobes.py).

Node semantics match the reference's OSL shader library
(reference src/shaders/*.osl), e.g.:
  * diffuse(Cs, roughness): roughness == 0 -> Lambert else Oren-Nayar
    (diffuse_bsdf_node.osl)
  * glossy(Cs, roughness): sharp/0 -> mirror Reflection else GGX
    microfacet with alpha = roughness^2 (glossy_bsdf_node.osl)
  * refraction(Cs, ior, roughness): sharp/0 -> Refraction else refractive
    GGX with alpha = roughness (refraction_bsdf_node.osl — not squared)
  * emitter(Cs, power): emission = (power / pi) * Cs
    (diffuse_emitter_node.osl)
  * background(Cs, power): emission = Cs * power (background_node.osl)
"""
from __future__ import annotations

import dataclasses

import numpy as np

# Lobe type codes (reference src/bsdf.hpp:14-24 uses bit flags; we use
# dense codes since dispatch is by masked select, not bit tests).
EMISSIVE = 0
DIFFUSE = 1
OREN_NAYAR = 2
REFLECTION = 3
REFRACTION = 4
MICROFACET = 5          # GGX reflect
MICROFACET_REFRACT = 6  # GGX refract
SHEEN = 7
TRANSPARENT = 8
NUM_LOBE_TYPES = 9

# Lobe property flags (reference src/bsdf/params.hpp:12-16).
FLAG_DIFFUSE = 1
FLAG_GLOSSY = 2
FLAG_SPECULAR = 4
FLAG_REFLECT = 8
FLAG_TRANSMIT = 16

LOBE_FLAGS = {
    DIFFUSE: FLAG_REFLECT | FLAG_DIFFUSE,
    OREN_NAYAR: FLAG_REFLECT | FLAG_DIFFUSE,
    REFLECTION: FLAG_REFLECT | FLAG_SPECULAR,
    REFRACTION: FLAG_TRANSMIT | FLAG_SPECULAR,
    MICROFACET: FLAG_GLOSSY | FLAG_REFLECT,
    MICROFACET_REFRACT: FLAG_GLOSSY | FLAG_TRANSMIT,
    SHEEN: FLAG_REFLECT | FLAG_GLOSSY,
    TRANSPARENT: FLAG_TRANSMIT | FLAG_SPECULAR,
}

MAX_LOBES = 8   # matches the reference's 8-lobe container (src/bsdf.hpp:9);
                # eval cost does NOT scale with this: gather_lobes slices
                # to the scene's max_lobes_used (bsdf/bsdf.py:92), so a
                # two-Glass add_node (2+2 lobes) plus extras packs fine
                # while all-diffuse scenes still eval one slot
NUM_PARAMS = 6  # per-lobe parameter slots; [4] = fresnel mode
                # (0 none, 1 weight by F, 2 weight by 1-F), [5] = fresnel
                # ior — realizes the reference Glass expansion's
                # fresnel-driven closure mix per hit
                # (plugins/blender/blender/shader.hpp:306-361)
FRESNEL_NONE = 0.0
FRESNEL_F = 1.0
FRESNEL_ONE_MINUS_F = 2.0


def roughness_to_alpha(roughness: float) -> float:
    """Reference polynomial (src/bsdf/params.hpp:91-99) + clamp (:86-88)."""
    r = max(float(roughness), 1e-5)
    x = np.log(r)
    alpha = (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x**3
        + 0.000640711 * x**4
    )
    return float(min(1.0, max(1e-4, alpha)))


def oren_nayar_ab(alpha_deg: float) -> tuple[float, float]:
    """Precompute Oren-Nayar A/B terms. The reference converts the
    roughness to radians first (src/bsdf/params.hpp:37-42)."""
    s = np.deg2rad(alpha_deg)
    s2 = s * s
    a = 1.0 - (s2 / (2.0 * (s2 + 0.33)))
    b = 0.45 * s2 / (s2 + 0.09)
    return float(a), float(b)


@dataclasses.dataclass
class Lobe:
    type: int
    weight: tuple  # rgb
    params: tuple = (0.0, 0.0, 0.0, 0.0)  # padded to NUM_PARAMS
    texture: int = -1  # scene texture id multiplying the weight, or -1

    def padded_params(self) -> list[float]:
        p = list(self.params)[:NUM_PARAMS]
        return p + [0.0] * (NUM_PARAMS - len(p))


@dataclasses.dataclass
class Material:
    """Host-side material: a list of lobes plus an emission color."""

    name: str = ""
    lobes: list = dataclasses.field(default_factory=list)
    emission: tuple = (0.0, 0.0, 0.0)
    emission_texture: int = -1  # modulates emission (env maps, lit panels)
    normal_texture: int = -1    # tangent-space normal map

    @property
    def is_emitter(self) -> bool:
        return any(e != 0.0 for e in self.emission)

    # --- node-style constructors (reference OSL shader library) ---

    @staticmethod
    def diffuse(color=(0.8, 0.8, 0.8), roughness: float = 0.0, name="diffuse"):
        if roughness == 0.0:
            lobe = Lobe(DIFFUSE, tuple(color))
        else:
            a, b = oren_nayar_ab(roughness)
            lobe = Lobe(OREN_NAYAR, tuple(color), (roughness, a, b))
        return Material(name=name, lobes=[lobe])

    @staticmethod
    def glossy(color=(1.0, 1.0, 1.0), roughness: float = 0.0, name="glossy"):
        if roughness == 0.0:
            lobe = Lobe(REFLECTION, tuple(color), (0.0,))  # eta = 0
        else:
            alpha = roughness_to_alpha(roughness * roughness)
            lobe = Lobe(MICROFACET, tuple(color), (alpha, alpha, 0.0))
        return Material(name=name, lobes=[lobe])

    @staticmethod
    def refraction(
        color=(1.0, 1.0, 1.0), ior: float = 1.45, roughness: float = 0.0,
        name="refraction",
    ):
        if roughness == 0.0:
            lobe = Lobe(REFRACTION, tuple(color), (ior,))
        else:
            alpha = roughness_to_alpha(roughness)
            lobe = Lobe(MICROFACET_REFRACT, tuple(color), (alpha, alpha, ior))
        return Material(name=name, lobes=[lobe])

    @staticmethod
    def sheen(color=(1.0, 1.0, 1.0), roughness: float = 0.5, name="sheen"):
        return Material(name=name, lobes=[Lobe(SHEEN, tuple(color), (roughness,))])

    @staticmethod
    def transparent(color=(1.0, 1.0, 1.0), name="transparent"):
        return Material(name=name, lobes=[Lobe(TRANSPARENT, tuple(color))])

    @staticmethod
    def emitter(color=(1.0, 1.0, 1.0), power: float = 1.0, name="emitter"):
        e = tuple(float(c) * power / np.pi for c in color)
        return Material(name=name, emission=e)

    @staticmethod
    def background(color=(0.0, 0.0, 0.0), power: float = 1.0, name="background"):
        e = tuple(float(c) * power for c in color)
        return Material(name=name, emission=e)

    @staticmethod
    def glass(
        color=(1.0, 1.0, 1.0), ior: float = 1.45, roughness: float = 0.0,
        name="glass", fresnel: bool = True,
    ):
        """Two-lobe glass: glossy reflection + refraction with the
        reflection weighted by the per-hit dielectric fresnel and the
        refraction by its complement — the Blender-importer Glass
        expansion (reference plugins/blender/blender/shader.hpp:306-361:
        glossy + refraction + fresnel + mix subgraph)."""
        g = Material.glossy(color, roughness).lobes[0]
        r = Material.refraction(color, ior, roughness).lobes[0]
        if fresnel:
            g = Lobe(g.type, g.weight, _with_fresnel(g, FRESNEL_F, ior), g.texture)
            r = Lobe(
                r.type, r.weight, _with_fresnel(r, FRESNEL_ONE_MINUS_F, ior), r.texture
            )
        return Material(name=name, lobes=[g, r])


def _with_fresnel(lobe: "Lobe", mode: float, ior: float) -> tuple:
    p = lobe.padded_params()
    p[4] = mode
    p[5] = float(ior)
    return tuple(p)


def pack_materials(materials: list) -> dict:
    """Pack a material list into dense arrays indexed by material id.

    Returns numpy arrays; Scene.build() converts to jnp.
    """
    m = len(materials)
    lobe_type = np.zeros((m, MAX_LOBES), np.int32)
    lobe_weight = np.zeros((m, MAX_LOBES, 3), np.float32)
    lobe_param = np.zeros((m, MAX_LOBES, NUM_PARAMS), np.float32)
    lobe_flags = np.zeros((m, MAX_LOBES), np.int32)
    lobe_tex = np.full((m, MAX_LOBES), -1, np.int32)
    n_lobes = np.zeros((m,), np.int32)
    emission = np.zeros((m, 3), np.float32)
    emission_tex = np.full((m,), -1, np.int32)
    normal_tex = np.full((m,), -1, np.int32)
    for i, mat in enumerate(materials):
        if len(mat.lobes) > MAX_LOBES:
            raise ValueError(
                f"material {mat.name!r} has {len(mat.lobes)} lobes; max {MAX_LOBES}"
            )
        n_lobes[i] = len(mat.lobes)
        emission[i] = mat.emission
        emission_tex[i] = mat.emission_texture
        normal_tex[i] = mat.normal_texture
        for j, lobe in enumerate(mat.lobes):
            lobe_type[i, j] = lobe.type
            lobe_weight[i, j] = lobe.weight
            lobe_param[i, j] = lobe.padded_params()
            lobe_flags[i, j] = LOBE_FLAGS.get(lobe.type, 0)
            lobe_tex[i, j] = lobe.texture
    return {
        "lobe_type": lobe_type,
        "lobe_weight": lobe_weight,
        "lobe_param": lobe_param,
        "lobe_flags": lobe_flags,
        "lobe_tex": lobe_tex,
        "n_lobes": n_lobes,
        "emission": emission,
        "emission_tex": emission_tex,
        "normal_tex": normal_tex,
    }
