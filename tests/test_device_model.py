"""Device-side model math (models/device_model.py) against the host
implementations used by the parity-grade f64 path."""
import numpy as np
import pytest

from examl_tpu.datatypes import DataType, info_for
from examl_tpu.models.device_model import gamma_cats_dev, make_eigen_dev
from examl_tpu.models.eigen import make_eigen
from examl_tpu.models.gamma import make_gamma_cats


@pytest.mark.parametrize('alpha', [0.02, 0.11, 0.5, 1.0, 3.7, 42.0, 300.0])
@pytest.mark.parametrize('median', [False, True])
def test_gamma_cats_dev(alpha, median):
    host = make_gamma_cats(alpha, 4, median)
    dev = np.asarray(gamma_cats_dev(alpha, 4, median))
    assert np.allclose(dev, host, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_make_eigen_dev_dna(seed):
    rng = np.random.default_rng(seed)
    rates = rng.uniform(0.05, 5.0, 6)
    rates[-1] = 1.0
    f = rng.uniform(0.1, 1.0, 4)
    f /= f.sum()
    bits = info_for(DataType.DNA).bit_vectors
    bmat = np.array([[(int(v) >> s) & 1 for s in range(4)] for v in bits],
                    dtype=np.float64)

    es = make_eigen(rates, f, bits)
    EIGN, EV, EI, tv = (np.asarray(x) for x in
                        make_eigen_dev(rates, f, bmat))

    assert np.allclose(EIGN, es.EIGN, rtol=1e-9, atol=1e-11)
    # eigenvector signs are arbitrary per mode; compare up to sign
    sign = np.sign(np.sum(EV * es.EV, axis=0))
    assert np.allclose(EV * sign[None, :], es.EV, rtol=1e-7, atol=1e-9)
    assert np.allclose(EI * sign[None, :], es.EI, rtol=1e-7, atol=1e-9)
    # tip rows flip with the same signs (mode axis is the column)
    assert np.allclose(tv * sign[None, :], es.tip_vector,
                       rtol=1e-7, atol=1e-9)


def test_make_eigen_dev_protein():
    from examl_tpu.models.protein import prot_rates_freqs
    from examl_tpu.datatypes import ProtModel
    rates, f = prot_rates_freqs(ProtModel.LG)
    bits = info_for(DataType.AA).bit_vectors
    bmat = np.array([[(int(v) >> s) & 1 for s in range(20)] for v in bits],
                    dtype=np.float64)
    es = make_eigen(rates, f, bits)
    EIGN, EV, EI, tv = (np.asarray(x) for x in
                        make_eigen_dev(np.asarray(rates), np.asarray(f),
                                       bmat))
    assert np.allclose(EIGN, es.EIGN, rtol=1e-8, atol=1e-10)
    sign = np.sign(np.sum(EV * es.EV, axis=0))
    assert np.allclose(EV * sign[None, :], es.EV, rtol=5e-6, atol=1e-8)
    assert np.allclose(tv * sign[None, :], es.tip_vector,
                       rtol=5e-6, atol=1e-8)
