#!/bin/bash
# Fast test runner: skip the axon TPU tunnel registration (~3 min/process)
# and run the suite on CPU with 8 virtual devices (conftest.py enforces both).
# xdist workers (-n 2) both parallelize and isolate the sporadic XLA:CPU
# compile segfaults of this host's jaxlib (see CLAUDE.md) — a crashed worker
# is reported and replaced instead of killing the whole run.
if [ $# -eq 0 ]; then
    set -- tests/ -n 2
fi
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest "$@" -q
