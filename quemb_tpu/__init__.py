"""quemb_tpu: TPU-native bootstrap-embedding quantum chemistry framework.

From-scratch reimplementation of the capabilities of quemb
(github.com/troyvvgroup/quemb) designed for TPUs: JAX/XLA for all dense
linear algebra, batched/vmapped fragment pipelines instead of process pools,
and a self-contained Gaussian-integral + HF ingestion layer (no PySCF).
"""

from quemb_tpu.api import BE, fragmentate
from quemb_tpu.fragment.chemgen import ChemGenArgs

__all__ = ["BE", "fragmentate", "ChemGenArgs"]
__version__ = "0.1.0"
