#!/bin/bash
# Fast test runner: skip the axon TPU tunnel registration (~3 min/process)
# and run the suite on CPU with 8 virtual devices (conftest.py enforces both).
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest "${@:-tests/}" -q
