"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY §4: multi-host behaviour is
validated on faked devices via --xla_force_host_platform_device_count) with
x64 enabled so parity tests can instantiate float64 pipelines against the
float64 reference-semantics implementations in `tests/reference_impl.py`.
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS to the tunneled TPU,
# which would make every test compile remotely.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The host image's sitecustomize registers the tunneled-TPU ("axon") PJRT
# plugin and programmatically sets jax_platforms="axon,cpu"; force it back to
# CPU so tests never initialize the remote backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
