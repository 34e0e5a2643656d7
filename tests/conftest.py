"""Test environment: force CPU backend with 8 virtual devices.

SURVEY.md §4 test plan: multi-device code paths are exercised without a TPU
slice via `--xla_force_host_platform_device_count=8`; kernel tests run Pallas
in interpret mode; only perf numbers need real chips (bench.py handles that).
This must run before the first `import jax` in any test module.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel), and the
# axon plugin re-injects itself into jax.config at import time, so the env
# var alone is not enough — force the config after importing jax too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
