"""Test configuration: force a virtual 8-device CPU mesh.

The ambient environment sets ``JAX_PLATFORMS=axon`` (a tunneled TPU chip);
tests must NOT run through the tunnel — they force the CPU backend and spoof
8 host devices so the multi-chip sharding paths compile and execute.
bench.py is the only entry point that talks to the real chip.
"""
import os

# The axon sitecustomize hook imports jax at interpreter start, so
# JAX_PLATFORMS set here via os.environ is too late — update the live
# config instead.  XLA_FLAGS still works because the CPU client is
# created lazily, on first use after this runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# f32 math everywhere in tests: keep matmuls in true f32 (the TPU MXU would
# otherwise use bf16 passes; CPU is exact anyway, this is for parity).
jax.config.update("jax_default_matmul_precision", "highest")
