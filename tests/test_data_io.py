"""HDF5 loader tests against the reference (Zenodo) file schema —
the compatibility contract that lets reference datasets run unmodified
(reference data.py:70-233)."""

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.data.io import (
    load_galaxy_catalog,
    load_gw_pe_samples,
    load_injection_data,
    load_pixelated_gw_catalog,
    save_pixelated_gw_catalog,
)


@pytest.fixture()
def pe_file(tmp_path):
    rng = np.random.default_rng(0)
    nev, ns = 6, 50
    path = tmp_path / "pe.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("posteriors")
        g.create_dataset("dL", data=rng.uniform(0.5, 3.0, (nev, ns)))
        g.create_dataset("m1det", data=rng.uniform(20, 80, (nev, ns)))
        g.create_dataset("m2det", data=rng.uniform(10, 20, (nev, ns)))
        g.create_dataset("theta", data=rng.uniform(0.1, 3.0, (nev, ns)))
        g.create_dataset("phi", data=rng.uniform(0, 6.28, (nev, ns)))
        g.create_dataset("pe_prior", data=rng.uniform(0.5, 2.0, (nev, ns)))
    return str(path), nev, ns


def test_load_gw_pe_samples(pe_file):
    path, nev, ns = pe_file
    theta = load_gw_pe_samples(path, parameters=("dL", "m1det", "m2det",
                                                 "phi", "theta", "pe_prior"))
    assert theta.n_events == nev and theta.n_samples == ns
    # angle conversion: ra = phi, dec = pi/2 - theta (reference convention)
    np.testing.assert_allclose(np.asarray(theta.dec),
                               np.pi / 2 - np.asarray(theta.theta))
    np.testing.assert_allclose(np.asarray(theta.ra), np.asarray(theta.phi))
    # subselection with fixed rng is reproducible and shaped right
    rng = np.random.default_rng(1)
    sub = load_gw_pe_samples(path, parameters=("dL", "m1det", "m2det",
                                               "phi", "theta"),
                             nevents=3, nsamples=10, rng=rng)
    assert sub.n_events == 3 and sub.n_samples == 10


def test_load_injection_data(tmp_path):
    rng = np.random.default_rng(2)
    n = 500
    z = rng.uniform(0.05, 2.0, n)
    m1s = rng.uniform(20, 80, n)
    m2s = m1s * rng.uniform(0.3, 1.0, n)
    path = tmp_path / "inj.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("m1src", data=m1s)
        f.create_dataset("m2src", data=m2s)
        f.create_dataset("z", data=z)
        f.create_dataset("dL", data=(1 + z) * rng.uniform(1, 5, n))
        f.create_dataset("SNR_net", data=rng.uniform(5, 40, n))
        f.create_dataset("log_p_draw_nospin", data=rng.normal(-10, 1, n))
    theta, n_det = load_injection_data(
        str(path), snr_cut=20,
        key_mapping={"m1s": "m1src", "m2s": "m2src"})
    assert n_det == theta.m1det.shape[0] > 0
    # src -> det conversion applied
    with h5py.File(path) as f:
        keep = f["SNR_net"][...] > 20
        expect_m1d = (f["m1src"][...] * (1 + f["z"][...]))[keep]
    np.testing.assert_allclose(np.asarray(theta.m1det), expect_m1d, rtol=1e-6)
    assert (np.asarray(theta.p_draw) > 0).all()


def test_load_injection_rejects_bad_masses(tmp_path):
    path = tmp_path / "bad.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("m1det", data=np.array([10.0, 5.0]))
        f.create_dataset("m2det", data=np.array([12.0, 2.0]))  # m2 > m1
        f.create_dataset("dL", data=np.array([1.0, 1.0]))
        f.create_dataset("SNR_net", data=np.array([30.0, 30.0]))
        f.create_dataset("log_p_draw_nospin", data=np.array([-5.0, -5.0]))
    with pytest.raises(AssertionError):
        load_injection_data(str(path), snr_cut=10,
                            key_mapping={"m1d": "m1det", "m2d": "m2det"})


def test_load_galaxy_catalog(tmp_path):
    rng = np.random.default_rng(3)
    path = tmp_path / "gal.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("ra_gal", data=rng.uniform(0, 360, 100))
        f.create_dataset("dec_gal", data=rng.uniform(-90, 90, 100))
        f.create_dataset("z_cgal", data=rng.uniform(0, 2, 100))
    gal = load_galaxy_catalog(str(path))
    assert set(gal) == {"ra", "dec", "z"}
    assert np.asarray(gal["ra"]).max() < 2 * np.pi + 1e-9
    assert np.abs(np.asarray(gal["dec"])).max() < np.pi / 2 + 1e-9


def test_pixelated_catalog_roundtrip(tmp_path, fiducial_population):
    import jax

    from chimera_tpu.data.mock import make_mock_catalog
    from chimera_tpu.data.pixelize import pixelize_gw_catalog

    theta = make_mock_catalog(jax.random.PRNGKey(9), fiducial_population,
                              n_events=4, n_samples=64, sigma_sky_rad=0.05,
                              oversample=400)
    theta = pixelize_gw_catalog(theta, nside_list=[8, 16],
                                mean_npixels_event=5)
    path = str(tmp_path / "pix.h5")
    save_pixelated_gw_catalog(theta, path)
    back = load_pixelated_gw_catalog(path)
    np.testing.assert_array_equal(np.asarray(back.pixel_mask),
                                  np.asarray(theta.pixel_mask))
    np.testing.assert_allclose(np.asarray(back.gw_loc2d_pdf),
                               np.asarray(theta.gw_loc2d_pdf))
    np.testing.assert_array_equal(np.asarray(back.pixels_pe_opt_nside),
                                  np.asarray(theta.pixels_pe_opt_nside))
