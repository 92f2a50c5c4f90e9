from leetcuda_tpu.bench.harness import run_benchmark, BenchResult, Session  # noqa: F401
