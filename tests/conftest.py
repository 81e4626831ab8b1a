import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
# on host devices; real-TPU runs go through bench.py).  The axon TPU plugin
# is registered by sitecustomize before conftest runs, so the platform must
# be forced back to cpu via jax.config (env vars are too late here) — this
# also avoids claiming the single TPU tunnel from test processes.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
