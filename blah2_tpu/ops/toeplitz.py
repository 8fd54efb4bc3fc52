"""Gather-free Toeplitz materialisation.

The clutter cancellers build small (nb × nb ≈ 411²) Toeplitz/Hermitian-
Toeplitz normal matrices from a lag vector every CPI. The obvious
``c[index_matrix]`` is a 169k-element gather that XLA lowers to a ~1.7 ms
dynamic-gather on v5e — an order of magnitude more than the Cholesky solve
it feeds. This builds the same matrix with tile + reshape + slice only
(static strides, fused by XLA; measured ~0.1 ms):

    cpad = [c, 0]                      # length 2·nb
    big  = tile(cpad, nb)[: nb·(2nb−1)]
    W    = big.reshape(nb, 2nb−1)      # W[i, k] = cpad[(k − i) mod 2nb]

Row i of ``W`` is ``cpad`` rotated left by −i, so for k ≥ i it holds
``c[k−i]``; the slice ``W[:, nb−1 : 2nb−1]`` therefore satisfies
``W[j, nb−1+i] = c[nb−1+i−j]`` — exactly the Toeplitz with center-indexed
generator ``c`` (length 2nb−1, ``c[nb−1+d]`` the value at diagonal offset
d), transposed. No reference analog: the reference materialises its
Toeplitz element-wise on the CPU (`WienerHopf.cpp:85-97`).
"""

from __future__ import annotations

import jax.numpy as jnp


def toeplitz_kj(c: jnp.ndarray) -> jnp.ndarray:
    """``T[..., j, k] = c[..., nb−1 + k − j]`` from center-indexed
    ``c`` of length ``2·nb − 1`` (batch dims lead)."""
    nb = (c.shape[-1] + 1) // 2
    lead = c.shape[:-1]
    cpad = jnp.concatenate(
        [c, jnp.zeros(lead + (1,), c.dtype)], axis=-1)       # (..., 2nb)
    big = jnp.tile(cpad, (1,) * len(lead) + (nb,))
    big = big[..., : nb * (2 * nb - 1)]
    return big.reshape(lead + (nb, 2 * nb - 1))[..., nb - 1: 2 * nb - 1]


def toeplitz_ij(c: jnp.ndarray) -> jnp.ndarray:
    """``T[..., i, j] = c[..., nb−1 + i − j]`` (transpose of
    :func:`toeplitz_kj`; one cheap static transpose)."""
    return jnp.swapaxes(toeplitz_kj(c), -1, -2)


def hermitian_toeplitz(a: jnp.ndarray) -> jnp.ndarray:
    """``A[i, j] = conj(a[i−j])`` for i>j else ``a[j−i]`` from the lag
    vector ``a`` of length nb — the Wiener-Hopf normal matrix
    (`WienerHopf.cpp:85-97`), without the index-matrix gather."""
    c = jnp.concatenate([a[::-1], jnp.conj(a[1:])])
    return toeplitz_ij(c)
