"""Turbo colormap for scalar-field (depth/shadow/AO) debug views.

Capability parity with the reference's 256-entry turbo LUT
(``/root/reference/Code/kernel/utilities.cl:7-284`` — dead code there, alive
here), implemented independently via the published polynomial approximation
of Turbo (Google AI blog, 2019; 5th-order fit per channel) rather than a
baked table — exact to ~1e-3 against the original LUT and fully
differentiable/vectorizable on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

# Polynomial coefficients of the public Turbo approximation (per channel:
# degree-5 in x, split as a degree-3 block + x⁴/x⁵ block).
_R4 = jnp.array([0.13572138, 4.61539260, -42.66032258, 132.13108234])
_G4 = jnp.array([0.09140261, 2.19418839, 4.84296658, -14.18503333])
_B4 = jnp.array([0.10667330, 12.64194608, -60.58204836, 110.36276771])
_R2 = jnp.array([-152.94239396, 59.28637943])
_G2 = jnp.array([4.27729857, 2.82956604])
_B2 = jnp.array([-89.90310912, 27.34824973])


def turbo(x: jnp.ndarray) -> jnp.ndarray:
    """Map intensities ``x`` in [0, 1] to Turbo RGB; shape ``x.shape + (3,)``."""
    x = jnp.clip(jnp.asarray(x, jnp.float32), 0.0, 1.0)
    x2 = x * x
    x3 = x2 * x
    x4 = x2 * x2
    x5 = x4 * x

    def channel(c4, c2):
        return c4[0] + c4[1] * x + c4[2] * x2 + c4[3] * x3 + c2[0] * x4 + c2[1] * x5

    rgb = jnp.stack([channel(_R4, _R2), channel(_G4, _G2), channel(_B4, _B2)], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0)


def turbo_lut(n: int = 256) -> jnp.ndarray:
    """(n, 3) lookup table — the reference's representation, derived here."""
    return turbo(jnp.linspace(0.0, 1.0, n))


def apply_colormap(intensity: jnp.ndarray, lut: jnp.ndarray | None = None) -> jnp.ndarray:
    """LUT-based mapping, mirroring the reference's indexing
    (``utilities.cl:269-281``: ``i = round(255·intensity)`` clamped): a
    ``jnp.take`` — useful when the polynomial should be evaluated once."""
    lut = turbo_lut() if lut is None else lut
    n = lut.shape[0]
    idx = jnp.clip(jnp.round(intensity * (n - 1)).astype(jnp.int32), 0, n - 1)
    return jnp.take(lut, idx, axis=0)
