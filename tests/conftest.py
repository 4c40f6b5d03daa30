"""Test configuration: force the CPU backend with 8 virtual devices.

Tests never touch the real TPU: they run on an 8-device virtual CPU mesh so
sharding tests exercise real collectives (the driver separately dry-runs the
multi-chip path; see ``__graft_entry__.py``). The environment's axon
sitecustomize registers the TPU backend at interpreter start, so we both set
the env vars and override ``jax_platforms`` in-process.
"""

import os

# The full suite compiles thousands of XLA programs; each leaves JIT code
# mappings behind, and the kernel default vm.max_map_count=65530 is hit at
# ~85% of the run (the process then segfaults inside LLVM). Raise the limit
# when we can (root in this microVM); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _fh:
        if int(_fh.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _out:
                _out.write("1048576")
except (OSError, ValueError):
    pass

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

jax.config.update("jax_platforms", "cpu")
