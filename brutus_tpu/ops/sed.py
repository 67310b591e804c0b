"""
Reddened-SED expansion from per-band magnitude coefficients.

The model grid stores, per (model, band), three coefficients
`(mag, r0, dr)`:  the unreddened magnitude, the A(V) reddening vector at
R(V)=0, and its derivative with respect to R(V).  The reddened magnitude
is the bilinear form

    sed_mag = mag + av * (r0 + rv * dr)

Parity: reference `brutus/utils.py:286-347` (`_get_seds`, the numba
kernel) — here a fused elementwise XLA program batched over arbitrary
leading dimensions instead of a per-model Python loop.
"""

import math

import jax.numpy as jnp

# Plain-python constant: importing this module must never touch a device
# backend (the multi-chip dryrun configures a CPU mesh *after* import).
FLUX_FAC = -0.4 * math.log(10.0)


def get_seds_mag(mag_coeffs, av, rv):
    """Reddened SEDs in magnitudes.

    Parameters
    ----------
    mag_coeffs : (..., Nbands, 3)
    av, rv : (...,) broadcastable against the model axes.

    Returns
    -------
    seds, rvecs, drvecs : (..., Nbands)
    """
    mags = mag_coeffs[..., 0]
    r0 = mag_coeffs[..., 1]
    dr = mag_coeffs[..., 2]
    rvecs = r0 + rv[..., None] * dr
    seds = mags + av[..., None] * rvecs
    return seds, rvecs, dr


def get_seds_flux(mag_coeffs, av, rv):
    """Reddened SEDs in flux densities, with flux-space reddening vectors.

    Matches the `return_flux=True` path of the reference kernel
    (`brutus/utils.py:341-345`): `flux = 10**(-0.4 sed)` and the
    reddening vectors become derivatives of flux w.r.t. (Av, Rv·Av).
    """
    seds, rvecs, drvecs = get_seds_mag(mag_coeffs, av, rv)
    flux = 10.0 ** (-0.4 * seds)
    rvecs_f = FLUX_FAC * flux * rvecs
    drvecs_f = FLUX_FAC * flux * jnp.broadcast_to(drvecs, flux.shape)
    return flux, rvecs_f, drvecs_f


def get_seds(mag_coeffs, av=None, rv=None, return_flux=False,
             return_rvec=False, return_drvec=False):
    """API-compatible wrapper (reference `brutus/utils.py:1089-1159`)."""
    av = jnp.zeros(mag_coeffs.shape[:-2]) if av is None else jnp.asarray(av)
    rv = (jnp.full(mag_coeffs.shape[:-2], 3.3) if rv is None
          else jnp.asarray(rv))
    av = jnp.broadcast_to(av, mag_coeffs.shape[:-2])
    rv = jnp.broadcast_to(rv, mag_coeffs.shape[:-2])
    if return_flux:
        seds, rvecs, drvecs = get_seds_flux(mag_coeffs, av, rv)
    else:
        seds, rvecs, drvecs = get_seds_mag(mag_coeffs, av, rv)
        drvecs = jnp.broadcast_to(drvecs, seds.shape)
    if return_rvec and return_drvec:
        return seds, rvecs, drvecs
    if return_rvec:
        return seds, rvecs
    if return_drvec:
        return seds, drvecs
    return seds


__all__ = ["get_seds", "get_seds_mag", "get_seds_flux", "FLUX_FAC"]
