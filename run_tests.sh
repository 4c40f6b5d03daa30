#!/bin/bash
# CPU test runner: disables the axon TPU plugin so tests never touch (or
# block) the single tunneled chip. conftest.py additionally forces
# jax_platforms=cpu and 8 virtual devices.
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "${@:-tests/ -q}"
