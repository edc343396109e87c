from ccve_tpu.exec.oracle import oracle_join, oracle_pipeline

__all__ = ["oracle_join", "oracle_pipeline"]
