from .benchmark import (BenchmarkResult, DataLoaderBenchmark,
                        DatasetBenchmark, InferenceBenchmark)
from .profiling import StepTimer, profile_time, xla_trace

__all__ = [
    'profile_time', 'xla_trace', 'StepTimer', 'InferenceBenchmark',
    'DataLoaderBenchmark', 'DatasetBenchmark', 'BenchmarkResult',
]
