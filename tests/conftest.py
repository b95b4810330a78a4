import os
import sys

# Tests run on a virtual 8-device CPU mesh (deterministic f64); the real TPU
# is exercised by bench.py / __graft_entry__.py.  Set QUEMB_TPU_TESTS=1 to
# run the suite on the real chip instead (enables the on-chip Pallas tests).
ON_TPU = os.environ.get("QUEMB_TPU_TESTS") == "1"
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax may already be imported by the environment's site hook, in which case
# JAX_PLATFORMS was read before we set it -> force via the config API too.
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
