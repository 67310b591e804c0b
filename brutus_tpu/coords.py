"""
Closed-form Galactic -> Galactocentric coordinate transform.

The reference builds this transform through `astropy.SkyCoord`
(`brutus/pdf.py:630-635`), which is host-only and unusably slow inside
a jitted TPU program.  Here the full chain

    galactic (l, b, d) -> galactic cartesian -> ICRS cartesian
                       -> galactocentric cartesian -> cylindrical (R, Z)

is collapsed into a single affine map `x_gc = M @ x_gal + t`, with `M`
and `t` precomputed in float64 numpy at import time from the published
frame constants that astropy v4+ uses:

  * Galactic frame (J2000/FK5): NGP at (ra, dec) =
    (192.8594812065348, 27.12825118085622) deg, node longitude
    l0 = 122.9319185680026 deg.
  * Galactocentric frame: galactic center (Sgr A*) at ICRS
    (266.4051, -28.936175) deg, R_sun = 8.122 kpc (Gravity Collab. 2018),
    z_sun = 20.8 pc (Bennett & Bovy 2019), roll0 = 58.5986320306 deg.

The ~25 mas ICRS/FK5 frame bias is neglected (<< 1e-6 kpc at any
distance), so the device-side transform is one 3x3 matmul + add.
"""

import numpy as np
import jax.numpy as jnp

# --- frame constants (degrees / kpc) ---
NGP_RA = 192.8594812065348
NGP_DEC = 27.12825118085622
LON0 = 122.9319185680026

GALCEN_RA = 266.4051
GALCEN_DEC = -28.936175
GALCEN_DISTANCE = 8.122          # kpc
Z_SUN = 20.8e-3                  # kpc
ROLL0 = 58.5986320306


def _rot(angle_deg, axis):
    """Passive rotation matrix about `axis` by `angle_deg` (astropy
    `rotation_matrix` convention: rotates the coordinate frame)."""
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, s], [0, -s, c]])
    if axis == "y":
        return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    if axis == "z":
        return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
    raise ValueError(axis)


def _build_affine():
    # ICRS -> Galactic (J2000 pole + node).
    R_icrs_to_gal = (_rot(180.0 - LON0, "z")
                     @ _rot(90.0 - NGP_DEC, "y")
                     @ _rot(NGP_RA, "z"))
    R_gal_to_icrs = R_icrs_to_gal.T

    # ICRS -> Galactocentric: align x with the GC direction, roll into
    # the galactic plane, then tilt for the Sun's height and translate.
    R = (_rot(ROLL0, "x")
         @ _rot(-GALCEN_DEC, "y")
         @ _rot(GALCEN_RA, "z"))
    tilt = -np.arcsin(Z_SUN / GALCEN_DISTANCE)
    H = _rot(np.rad2deg(tilt), "y")
    offset = -H @ np.array([GALCEN_DISTANCE, 0.0, 0.0])

    M = H @ R @ R_gal_to_icrs
    return M, offset


_M, _T = _build_affine()


def galactic_to_galactocentric(l_deg, b_deg, dist_kpc):
    """Map galactic `(l, b, d)` to galactocentric cartesian `(x, y, z)`.

    All inputs broadcast; distances in kpc.  Parity target: astropy's
    `SkyCoord(..., frame='galactic').galactocentric` with default
    (v4.0+) frame parameters, as used at reference `brutus/pdf.py:630-635`.
    """
    l = jnp.deg2rad(l_deg)
    b = jnp.deg2rad(b_deg)
    cb = jnp.cos(b)
    x = dist_kpc * cb * jnp.cos(l)
    y = dist_kpc * cb * jnp.sin(l)
    z = dist_kpc * jnp.sin(b)
    M = jnp.asarray(_M, dtype=jnp.result_type(x))
    t = jnp.asarray(_T, dtype=jnp.result_type(x))
    xyz = jnp.stack([x, y, z], axis=-1)
    out = xyz @ M.T + t
    return out[..., 0], out[..., 1], out[..., 2]


def galactic_to_cylindrical(l_deg, b_deg, dist_kpc):
    """Galactocentric cylindrical `(R, Z)` — the inputs of the Galactic
    number-density prior (reference `brutus/pdf.py:634-635`)."""
    x, y, z = galactic_to_galactocentric(l_deg, b_deg, dist_kpc)
    return jnp.hypot(x, y), z


__all__ = ["galactic_to_galactocentric", "galactic_to_cylindrical",
           "GALCEN_DISTANCE", "Z_SUN"]
