import os

# Configure JAX for hermetic CPU testing with a virtual 8-device mesh
# BEFORE jax is imported anywhere. Multi-chip sharding logic is exercised
# on these virtual devices (the analog of the reference's single-process
# test strategy, SURVEY.md §4).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
