"""Native C++ tier: build + parity with the numpy implementations."""

import numpy as np
import pytest

from brutus_tpu import healpix, native

rng = np.random.default_rng(13)


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_lb2pix_matches_numpy(lib):
    n = 5000
    l = rng.uniform(0, 360, n)
    b = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    b[::97] = 95.0  # invalid
    for nside in [1, 16, 64, 1024]:
        got = native.lb2pix_nest(nside, l, b)
        expect = healpix.lb2pix(nside, l, b, use_native=False)
        np.testing.assert_array_equal(got, expect)


def test_native_dustmap_lookup(lib, tmp_path):
    from brutus_tpu.dustmap import Bayestar, write_bayestar_file
    nside = 64
    l = rng.uniform(0, 360, 20)
    b = rng.uniform(-60, 60, 20)
    pix = np.unique(healpix.lb2pix(nside, l, b, use_native=False))
    dists = np.linspace(0.1, 5, 8)
    write_bayestar_file(str(tmp_path / "d.h5"), np.full(len(pix), nside),
                        pix, dists, rng.uniform(0, 1, (len(pix), 8)),
                        rng.uniform(.1, .2, (len(pix), 8)))
    bs = Bayestar(str(tmp_path / "d.h5"))
    # Native vs reference-lookup parity over covered + uncovered points.
    l2 = np.concatenate([l, rng.uniform(0, 360, 30)])
    b2 = np.concatenate([b, rng.uniform(-90, 90, 30)])
    got = bs._find_data_idx(l2, b2)
    # numpy fallback path
    import brutus_tpu.native as nat
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        expect = bs._find_data_idx(l2, b2)
    finally:
        nat._lib, nat._tried = saved
    np.testing.assert_array_equal(got, expect)
    assert (got[:20] >= 0).all()
