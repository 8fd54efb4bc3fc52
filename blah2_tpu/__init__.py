"""blah2_tpu — a TPU-native passive-radar signal-processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of 30hours/blah2
(reference: /root/reference): 2-channel (reference + surveillance) IQ ingest,
Wiener-Hopf clutter cancellation, batched-FFT cross-ambiguity (delay-Doppler)
processing, CA-CFAR detection with centroiding and quadratic interpolation,
an M-of-N delay-Doppler tracker, JSON/TCP egress, a REST API and web display
layer, and multi-chip sharding over a `jax.sharding.Mesh`.

The compute path is functional and jit-compiled: each CPI is processed by a
single fused XLA program (see `blah2_tpu.dsp.pipeline`). The runtime around it
(capture, ring buffers, sockets, API) lives on the host.
"""

__version__ = "0.1.0"

from blah2_tpu.constants import SPEED_OF_LIGHT  # noqa: F401
