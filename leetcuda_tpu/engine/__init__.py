from leetcuda_tpu.engine.engine import Engine, EngineConfig, Request, generate_scan

__all__ = ["Engine", "EngineConfig", "Request", "generate_scan"]
