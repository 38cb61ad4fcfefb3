"""Math substrate: sampling warps, tangent frames, fresnel, vector helpers.

TPU-native replacement for the reference's AVX2 SIMD substrate
(reference ``src/math/``): everything here is plain jnp over batched
``(..., 3)`` arrays — XLA vectorizes onto VPU lanes, so there is no
hand-rolled packet type.
"""
