"""Neighbour halo exchange for the CPI/pulse-axis sharded pipeline.

Two interchangeable backends behind one interface (SURVEY §2.5: the
distributed communication layer is "jax.lax collectives / Pallas RDMA over
ICI"):

  - ``ppermute``: `jax.lax.ppermute` with open-chain (non-circular) pairs —
    XLA lowers it to an ICI collective-permute and fills absent sources with
    zeros, which is exactly the linear (zero-extended) boundary the
    overlap-save decomposition needs.
  - ``pallas``: an explicit inter-chip RDMA kernel
    (`pltpu.make_async_remote_copy`, the right/left-permute pattern from the
    Pallas distributed guide). The copy is circular on the device ring; the
    wrap-around edge is masked to zero outside the kernel to recover the
    open-chain semantics. Data crosses as float32 real/imag planes — remote
    DMA moves raw bytes, complex is re-formed locally.

Both run under `jax.shard_map`; both are validated against each other on the
virtual CPU mesh (tests/test_halo.py) — the pallas backend under the TPU
interpret mode (`pltpu.InterpretParams`, which simulates the inter-chip DMAs
and semaphores faithfully, including on multi-axis meshes — the production
(cpi, pulse) shape), compiled Mosaic on real TPU slices. Note the compiled
RDMA path needs an ICI-connected slice: single-chip tunnels cannot execute
it, so ``ppermute`` is the default everywhere and the RDMA backend is opt-in
for pod deployments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ppermute_from_next(head: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    n_dev = lax.axis_size(axis_name)
    return lax.ppermute(head, axis_name,
                        [(d, d - 1) for d in range(1, n_dev)])


def _ppermute_from_prev(tail: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    n_dev = lax.axis_size(axis_name)
    return lax.ppermute(tail, axis_name,
                        [(d, d + 1) for d in range(n_dev - 1)])


def _rdma_permute(v: jnp.ndarray, axis_name: str, to_left: bool,
                  interpret: bool, n_mesh_axes: int = 1,
                  collective_id: int = 0) -> jnp.ndarray:
    """Send ``v`` (any small f32 array) to the left (d→d−1) or right (d→d+1)
    ring neighbour via an explicit remote DMA; returns the received buffer.
    Circular — caller masks the wrap-around edge.

    ``interpret`` runs the kernel under the TPU interpret mode
    (`pltpu.InterpretParams`), which simulates the remote DMAs and
    semaphores across the virtual device set — including multi-axis meshes,
    so the production (cpi, pulse) shape is testable off-TPU."""

    def kernel(in_ref, out_ref, send_sem, recv_sem):
        my_id = lax.axis_index(axis_name)
        n_dev = lax.axis_size(axis_name)
        idt = my_id.dtype
        fwd = lax.rem(my_id + jnp.asarray(1, idt), jnp.asarray(n_dev, idt))
        bwd = lax.rem(my_id + jnp.asarray(n_dev - 1, idt),
                      jnp.asarray(n_dev, idt))
        neighbor = bwd if to_left else fwd

        def did(coord):
            # Mesh coordinates only for the exchanged axis; other axes keep
            # this device's own coordinate (dict form). 1-D meshes accept
            # the bare scalar.
            return coord if n_mesh_axes == 1 else {axis_name: coord}

        if not interpret:
            # Neighbour barrier before the RDMA (Pallas distributed guide):
            # without it a fast device can write into a neighbour's output
            # buffer while the neighbour still uses it from the previous
            # invocation, or signal recv_sem before the neighbour enters
            # the kernel. (The TPU interpret mode simulates DMA/semaphore
            # completion deterministically and needs no barrier.)
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=did(fwd),
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=did(bwd),
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_wait(barrier, 2)

        op = pltpu.make_async_remote_copy(
            src_ref=in_ref,
            dst_ref=out_ref,
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=did(neighbor),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        op.start()
        op.wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 2,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Kernels that XLA may schedule concurrently MUST NOT share a
            # collective_id (they would share one barrier semaphore and the
            # neighbour barrier stops meaning "same kernel instance") —
            # callers assign a distinct id per data-independent call site.
            **({} if interpret else {"collective_id": int(collective_id)}),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(v)


def _as_planes(v: jnp.ndarray):
    if jnp.issubdtype(v.dtype, jnp.complexfloating):
        real = jnp.float64 if v.dtype == jnp.complex128 else jnp.float32
        return jnp.stack([jnp.real(v), jnp.imag(v)], axis=-1).astype(real), v.dtype
    return v, None


def _from_planes(p: jnp.ndarray, cdtype):
    if cdtype is None:
        return p
    return lax.complex(p[..., 0], p[..., 1]).astype(cdtype)


def shift_from_next(v: jnp.ndarray, count: int, axis_name: str,
                    backend: str = "ppermute",
                    interpret: bool = False,
                    n_mesh_axes: int = 1,
                    collective_id: int = 0) -> jnp.ndarray:
    """First ``count`` samples of the *next* device's block (d ← d+1);
    zeros on the last device (linear/zero-extended boundary)."""
    head = v[..., :count]
    if backend == "ppermute":
        return _ppermute_from_next(head, axis_name)
    p, cdtype = _as_planes(head)
    got = _rdma_permute(p, axis_name, to_left=True, interpret=interpret,
                        n_mesh_axes=n_mesh_axes, collective_id=collective_id)
    got = _from_planes(got, cdtype)
    my_id = lax.axis_index(axis_name)
    last = lax.axis_size(axis_name) - 1
    return jnp.where(my_id == last, jnp.zeros_like(got), got)


def shift_from_prev(v: jnp.ndarray, count: int, axis_name: str,
                    backend: str = "ppermute",
                    interpret: bool = False,
                    n_mesh_axes: int = 1,
                    collective_id: int = 0) -> jnp.ndarray:
    """Last ``count`` samples of the *previous* device's block (d ← d−1);
    zeros on device 0."""
    tail = v[..., -count:]
    if backend == "ppermute":
        return _ppermute_from_prev(tail, axis_name)
    p, cdtype = _as_planes(tail)
    got = _rdma_permute(p, axis_name, to_left=False, interpret=interpret,
                        n_mesh_axes=n_mesh_axes, collective_id=collective_id)
    got = _from_planes(got, cdtype)
    my_id = lax.axis_index(axis_name)
    return jnp.where(my_id == 0, jnp.zeros_like(got), got)
