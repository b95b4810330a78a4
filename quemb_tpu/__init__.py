"""quemb_tpu: TPU-native bootstrap-embedding quantum chemistry framework.

From-scratch reimplementation of the capabilities of quemb
(github.com/troyvvgroup/quemb) designed for TPUs: JAX/XLA for all dense
linear algebra, batched/vmapped fragment pipelines instead of process pools,
and a self-contained Gaussian-integral + HF ingestion layer (no PySCF).
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# Keep a host CPU backend available even when JAX_PLATFORMS pins a single
# accelerator platform (e.g. a remote-tunneled TPU): initialization-phase
# programs route to the host via utils.helper.host_init_context, which
# needs jax.local_devices(backend="cpu") to exist.  No-op once backends
# are initialized (then the env/default already decided).
_plat = _os.environ.get("JAX_PLATFORMS", "")
if _plat:
    # Re-assert the user's env choice in the config: a site-registered
    # accelerator plugin may have rewritten jax_platforms at import time
    # to keep itself registered (observed: axon sets "axon,cpu" under
    # JAX_PLATFORMS=cpu, which then blocks every cpu-pinned run on its
    # tunnel), and jax reads the CONFIG value when both are set.
    _want = _plat
    if "cpu" not in _plat.replace(" ", "").split(","):
        _want = _plat + ",cpu"
    try:
        if (_jax.config.jax_platforms or "") != _want:
            _jax.config.update("jax_platforms", _want)
    except Exception:
        pass
# Persistent XLA compilation cache: TPU compiles go through a remote tunnel
# here and are expensive; cache them across processes.  Scoped per host:
# XLA:CPU AOT results bake in machine features (avx512 etc.) that the
# cache key does NOT cover, so reusing a cache written on another machine
# risks SIGILL (the loader warns exactly that).
_cache_dir = _os.environ.get("QUEMB_TPU_XLA_CACHE")
if not _cache_dir:
    # Hostname is not a stable proxy for the microarchitecture here
    # (containers keep their node name across heterogeneous hosts), so
    # key by a digest of the actual CPU feature flags: AOT entries
    # compiled for a different feature set are then never even visible.
    import hashlib as _hashlib
    import platform as _platform

    _feats = ""
    try:
        with open("/proc/cpuinfo") as _f:
            for _line in _f:
                if _line.startswith("flags"):
                    _feats = " ".join(sorted(_line.split(":", 1)[1].split()))
                    break
    except OSError:
        _feats = _platform.node() or "default"
    _cache_dir = _os.path.expanduser(
        "~/.cache/quemb_tpu_xla/"
        + _hashlib.sha1(_feats.encode()).hexdigest()[:12]
    )
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # cache even sub-second compiles: BE construction is ~40 small
    # programs whose compiles are individually cheap but sum to seconds
    # per process when not persisted
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:  # older jax without the option
    pass

from quemb_tpu.api import BE, fragmentate
from quemb_tpu.fragment.chemgen import ChemGenArgs

__all__ = ["BE", "fragmentate", "ChemGenArgs"]
__version__ = "0.1.0"
