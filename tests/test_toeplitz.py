"""Gather-free Toeplitz builds (ops/toeplitz.py) vs the index-matrix
construction they replaced (the gather measured ~1.7 ms on v5e — 10x the
Cholesky it feeds)."""

import numpy as np
import jax.numpy as jnp

from blah2_tpu.ops.toeplitz import hermitian_toeplitz, toeplitz_ij, toeplitz_kj


def _rand_c(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_hermitian_toeplitz_matches_index_matrix():
    rng = np.random.default_rng(0)
    for nb in (2, 3, 16, 411):
        a = _rand_c(rng, nb)
        i = np.arange(nb)[:, None]
        j = np.arange(nb)[None, :]
        av = a[np.abs(i - j)]
        ref = np.where(i > j, np.conj(av), av)
        np.testing.assert_array_equal(
            np.asarray(hermitian_toeplitz(jnp.asarray(a))), ref)


def test_toeplitz_ij_and_kj():
    rng = np.random.default_rng(1)
    for nb in (2, 5, 33):
        c = _rand_c(rng, 2 * nb - 1)
        i = np.arange(nb)[:, None]
        j = np.arange(nb)[None, :]
        np.testing.assert_array_equal(
            np.asarray(toeplitz_ij(jnp.asarray(c))), c[i - j + nb - 1])
        np.testing.assert_array_equal(
            np.asarray(toeplitz_kj(jnp.asarray(c))), c[j - i + nb - 1])


def test_batched():
    rng = np.random.default_rng(2)
    nb = 7
    cb = _rand_c(rng, 3, 2 * nb - 1)
    i = np.arange(nb)[:, None]
    j = np.arange(nb)[None, :]
    ref = np.stack([c[j - i + nb - 1] for c in cb])
    np.testing.assert_array_equal(np.asarray(toeplitz_kj(jnp.asarray(cb))),
                                  ref)
