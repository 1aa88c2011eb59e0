from fastdet.utils.profiling import StepTimer, summarize_model, trace
from fastdet.utils.logging import MetricsLogger

__all__ = ["StepTimer", "summarize_model", "trace", "MetricsLogger"]
