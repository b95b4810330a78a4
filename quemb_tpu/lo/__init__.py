from quemb_tpu.lo.lowdin import lowdin_orth, lowdin_localize

__all__ = ["lowdin_orth", "lowdin_localize"]
