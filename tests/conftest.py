import os

# Hermetic CPU testing with a virtual 8-device mesh (the analog of the
# reference's single-process test strategy, SURVEY.md §4). jax may already
# be imported by the environment's sitecustomize, so plain env vars are too
# late — use config.update, which takes effect until backends initialize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
